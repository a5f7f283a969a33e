from .datagen import generate_base_docs, generate_wal_epoch, write_wal
from .wal import WalSource

__all__ = ["generate_base_docs", "generate_wal_epoch", "write_wal", "WalSource"]

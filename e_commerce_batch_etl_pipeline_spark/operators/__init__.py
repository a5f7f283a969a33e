from .lww import lww_dedup, lww_dedup_salted
from .merge import merge_upsert

__all__ = ["lww_dedup", "lww_dedup_salted", "merge_upsert"]

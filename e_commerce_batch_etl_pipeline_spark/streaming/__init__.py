from .microbatch import CdcEngine, EpochResult

__all__ = ["CdcEngine", "EpochResult"]

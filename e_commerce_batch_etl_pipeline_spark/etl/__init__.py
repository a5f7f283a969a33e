from .quality import DQCheck, run_checks, write_report
from .transforms import run_all_transforms

__all__ = ["run_all_transforms", "DQCheck", "run_checks", "write_report"]

from .format import LakeTable, Snapshot, TableSchema

__all__ = ["LakeTable", "Snapshot", "TableSchema"]

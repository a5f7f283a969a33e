"""Bootstrap: initial load of a base docs table into the lake format.

Reference analog: the reference's full-load write path
(``src/load.py:8-43`` — repartition for file-count control + partitioned
overwrite), upgraded to a snapshot commit: stage hash-bucketed files, then
publish snapshot v1 atomically. Epoch -1 is reserved for the bootstrap
fence so replaying the bootstrap is also idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# BOOTSTRAP_EPOCH re-exported: the table format pins the bootstrap epoch
# so fence pruning can retain it forever (tables/format.py FENCE_KEEP_EPOCHS)
from ..tables.format import BOOTSTRAP_EPOCH, LakeTable, TableSchema  # noqa: F401

DOCS_SCHEMA = TableSchema(
    fields=[
        ("doc_id", "string", False),
        ("tokens", "array<int>", True),
        ("n_tok", "int", True),
        ("source", "string", True),
    ]
)


def bootstrap_table(
    root: str,
    base: DataFrame,
    schema: TableSchema = DOCS_SCHEMA,
    key_column: str = "doc_id",
    num_buckets: int = 16,
) -> LakeTable:
    """Create the table and commit the initial snapshot from ``base``."""
    table = (
        LakeTable(root) if LakeTable.exists(root)
        else LakeTable.create(root, schema, key_column=key_column,
                              num_buckets=num_buckets)
    )
    snap = table.current()
    if snap.epoch_fenced(BOOTSTRAP_EPOCH):
        return table  # already bootstrapped — idempotent
    staged = base.select(*snap.schema.names())
    buckets = list(range(snap.num_buckets))
    files = table.write_data_files(staged, buckets)
    table.commit(
        epoch=BOOTSTRAP_EPOCH,
        replaced_buckets=buckets,
        new_files=files,
        bucket_max_lsn={b: -1 for b in buckets},
        props={"bootstrap": True},
    )
    return table

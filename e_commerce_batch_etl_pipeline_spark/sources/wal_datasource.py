"""Custom PySpark (4.x) Python Data Source for the WAL.

Registers a ``wal`` format so the change log reads like any other source:

    spark.dataSource.register(WalDataSource)
    df = (spark.read.format("wal")
          .option("root", wal_root)
          .option("after_epoch", "3")       # incremental tail
          .option("min_lsn", "1000")        # watermark pushdown
          .load())

Spark-first properties:
- one ``InputPartition`` per (segment file) → parallelism follows the
  physical layout; executors read their own files via pyarrow (Arrow
  batches, no row-level Python objects).
- **filter pushdown** (DataSourceReader.pushFilters): ``epoch > N`` and
  ``lsn > W`` predicates are consumed by the source — segment directories
  are skipped entirely for epoch predicates, and lsn predicates prune
  parquet row groups via footer statistics before reading.

This is the idiomatic-Spark packaging of ``sources/wal.py``'s incremental
scan; the engine keeps using the direct path (no extra hop), while this
format is for ad-hoc analytics over the WAL.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
)
from pyspark.sql.types import StructType

ENVELOPE_DDL = (
    "lsn long, epoch int, op string, doc_id string, "
    "tokens array<int>, n_tok int, source string, ts timestamp"
)
_SEG_RE = re.compile(r"^epoch-(\d+)$")


class _FilePartition(InputPartition):
    def __init__(self, path: str, min_lsn: int | None):
        self.path = path
        self.min_lsn = min_lsn


class WalReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        self.after_epoch = int(options.get("after_epoch", "-1"))
        self.min_lsn = (
            int(options["min_lsn"]) if "min_lsn" in options else None
        )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)) and f.attribute == (
                "epoch",
            ):
                bound = int(f.value) if isinstance(f, GreaterThan) else int(f.value) - 1
                self.after_epoch = max(self.after_epoch, bound)
                # fully handled: whole segment dirs are skipped
                continue
            if isinstance(f, GreaterThan) and f.attribute == ("lsn",):
                v = int(f.value)
                self.min_lsn = v if self.min_lsn is None else max(self.min_lsn, v)
                # row-group pruning is approximate → Spark re-checks
                yield f
                continue
            yield f

    def partitions(self) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for fn in sorted(os.listdir(self.root)):
            m = _SEG_RE.match(fn)
            if not m or int(m.group(1)) <= self.after_epoch:
                continue
            seg = os.path.join(self.root, fn)
            for f in sorted(os.listdir(seg)):
                if f.endswith(".parquet"):
                    parts.append(
                        _FilePartition(os.path.join(seg, f), self.min_lsn)
                    )
        return parts or [_FilePartition("", None)]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        lsn_idx = {
            pf.metadata.schema.column(i).name: i
            for i in range(pf.metadata.num_columns)
        }["lsn"]
        groups = []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(lsn_idx).statistics
            if (
                partition.min_lsn is not None
                and st is not None
                and st.has_min_max
                and int(st.max) <= partition.min_lsn
            ):
                continue  # row group entirely below the watermark
            groups.append(rg)
        if not groups:
            return
        import pyarrow as pa

        # Spark's Arrow interchange takes microsecond timestamps; parquet
        # may surface nanoseconds — cast batch-level (still columnar)
        fields = [
            pa.field(f.name, pa.timestamp("us"))
            if pa.types.is_timestamp(f.type)
            else f
            for f in pf.schema_arrow
        ]
        target = pa.schema(fields)
        for batch in pf.iter_batches(row_groups=groups):
            yield batch.cast(target)  # arrow RecordBatch — no row Python


class WalDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wal"

    def schema(self) -> str | StructType:
        return ENVELOPE_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return WalReader(self.options)

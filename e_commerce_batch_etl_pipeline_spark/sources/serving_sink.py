"""Serving-database sink: the reference's JDBC load path (K2) as a
custom PySpark Python DataSource WRITER, testable without an RDBMS.

Reference analog: ``src/load.py:46-92`` (``write_mysql``) — batchsize
5000 per round-trip, ``rewriteBatchedStatements`` multi-row inserts,
``truncate=true`` + append mode to keep indexes, parallel per-partition
JDBC connections — and the read-back verify in
``notebooks/05_mysql_load.py:288-303``. No RDBMS/driver jar ships in
this environment, so the sink targets an embedded DuckDB database file
with the SAME write semantics:

- each Spark task is one "connection": it streams its partition as
  Arrow batches re-chunked to ``batchsize`` rows (one row group per
  chunk = one ``executeBatch`` round-trip analog, counted and reported);
- the driver-side ``commit`` applies all staged parts in ONE
  transaction — truncate-then-insert or append — so readers never see a
  half-loaded table (stronger than raw JDBC, same surface);
- ``abort`` removes the staging area, leaving the serving table intact.

Usage::

    spark.dataSource.register(ServingSinkDataSource)
    (df.write.format("serving")
       .option("path", "/path/serve.duckdb").option("table", "curated")
       .option("batchsize", "5000").option("truncate", "true")
       .mode("append").save())

At cluster scale the staged-parts + transactional-apply shape is exactly
how a JDBC sink with a staging table works (load per-connection batches,
then one ``INSERT INTO target SELECT * FROM staging``), so swapping
DuckDB for a real warehouse keeps the protocol.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class StagedPart(WriterCommitMessage):
    path: str
    rows: int
    batches: int  # round-trips a JDBC connection would have made


class ServingSinkWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.db_path = options["path"]
        self.table = options.get("table", "serving")
        self.batchsize = int(options.get("batchsize", "5000"))
        self.truncate = str(options.get("truncate", "false")).lower() == "true"
        self.overwrite = overwrite
        # created on the driver so every task stages into the same attempt
        self.staging = f"{self.db_path}.staging-{uuid.uuid4().hex[:12]}"
        os.makedirs(self.staging, exist_ok=True)

    # executor-side: one call per partition ("one JDBC connection")
    def write(self, iterator: Iterator) -> StagedPart:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        tc = TaskContext.get()
        part_id = tc.partitionId() if tc is not None else 0
        out = os.path.join(
            self.staging, f"part-{part_id:05d}-{uuid.uuid4().hex[:8]}.parquet"
        )
        rows = 0
        batches = 0
        writer = None
        pending: list[pa.RecordBatch] = []
        pending_rows = 0

        def _flush(batch_tbl: pa.Table):
            nonlocal writer, batches
            if writer is None:
                writer = pq.ParquetWriter(out, batch_tbl.schema)
            # one row group per flush — the executeBatch round-trip analog
            writer.write_table(batch_tbl)
            batches += 1

        for rb in iterator:
            pending.append(rb)
            pending_rows += rb.num_rows
            rows += rb.num_rows
            while pending_rows >= self.batchsize:
                tbl = pa.Table.from_batches(pending)
                head = tbl.slice(0, self.batchsize)
                rest = tbl.slice(self.batchsize)
                _flush(head)
                pending = rest.to_batches() if rest.num_rows else []
                pending_rows = rest.num_rows
        if pending_rows:
            _flush(pa.Table.from_batches(pending))
        if writer is not None:
            writer.close()
            return StagedPart(path=out, rows=rows, batches=batches)
        return StagedPart(path="", rows=0, batches=0)

    # driver-side: single transactional apply (the staging-table pattern)
    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        import duckdb

        files = [m.path for m in messages if m is not None and m.rows > 0]
        try:
            if files:
                con = duckdb.connect(self.db_path)
                try:
                    q = ", ".join(f"'{f}'" for f in files)
                    src = f"read_parquet([{q}])"
                    con.execute("BEGIN")
                    if self.overwrite:
                        con.execute(
                            f"CREATE OR REPLACE TABLE {self.table} AS "
                            f"SELECT * FROM {src}"
                        )
                    else:
                        con.execute(
                            f"CREATE TABLE IF NOT EXISTS {self.table} AS "
                            f"SELECT * FROM {src} LIMIT 0"
                        )
                        if self.truncate:
                            # truncate-not-drop keeps indexes/constraints
                            # (reference: truncate=true + append mode)
                            con.execute(f"DELETE FROM {self.table}")
                        con.execute(
                            f"INSERT INTO {self.table} SELECT * FROM {src}"
                        )
                    con.execute("COMMIT")
                finally:
                    con.close()
        finally:
            shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class ServingSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "serving"

    def writer(self, schema: StructType, overwrite: bool):
        return ServingSinkWriter(self.options, schema, overwrite)


def read_serving_table(db_path: str, table: str):
    """Read-back verify helper (reference
    ``notebooks/05_mysql_load.py:288-303``): returns (row_count,
    column names) straight from the serving database, Spark-free."""
    import duckdb

    con = duckdb.connect(db_path, read_only=True)
    try:
        n = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
        cols = [
            d[0]
            for d in con.execute(f"SELECT * FROM {table} LIMIT 0").description
        ]
        return int(n), cols
    finally:
        con.close()

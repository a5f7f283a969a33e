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
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
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
        self.schema = schema
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
        if not files and (self.overwrite or self.truncate):
            # JDBC overwrite/truncate semantics apply even for zero input
            # rows: stage one EMPTY typed parquet so the transaction
            # below still replaces/empties the table
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_schema

            empty = os.path.join(self.staging, "part-empty.parquet")
            tbl = pa.schema(to_arrow_schema(self.schema)).empty_table()
            pq.write_table(tbl, empty)
            files = [empty]
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


def _sql_lit(v) -> str | None:
    """SQL literal for a pushed filter value; None = not pushable (the
    filter is yielded back to Spark instead — e.g. date/timestamp/binary,
    where a bare str() would parse as integer arithmetic in SQL)."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (int, float)):
        return str(v)
    return None


class ServingScanReader(DataSourceReader):
    """JDBC-scan stand-in (reference S4,
    ``notebooks/05_mysql_load.py:288-303``): read the serving table back
    with PREDICATE PUSHDOWN — supported comparison/null filters compile
    into the WHERE clause executed inside the database, exactly like
    Spark's JDBC reader pushes filters into the remote SQL. Optionally
    splits the scan into ``num_partitions`` ranges of a numeric
    ``partition_column`` (the JDBC partitioned-read surface:
    lower/upper bound taken from the data)."""

    def __init__(self, options: dict, schema: StructType):
        self.db_path = options["path"]
        self.table = options.get("table", "serving")
        self.num_partitions = int(options.get("num_partitions", "1"))
        self.partition_column = options.get("partition_column")
        self.columns = [f.name for f in schema.fields]
        self.where: list[str] = []

    def pushFilters(self, filters: list[Filter]):
        # NOTE (Spark 4.1 Python DataSource quirk): after a plan with
        # pushed filters executes, the JVM memoizes the narrowed scan on
        # the shared relation — further queries on the SAME loaded
        # DataFrame reuse it (observed: df.filter(x).count() then
        # df.count() returns the filtered count). Re-load per query
        # pattern (spark.read.format("serving")...load().filter(...)),
        # which is the normal usage shape. Fresh reader per plan, so
        # no reset is needed here.
        ops = {
            EqualTo: "=", GreaterThan: ">", GreaterThanOrEqual: ">=",
            LessThan: "<", LessThanOrEqual: "<=",
        }
        for f in filters:
            t = type(f)
            if t in ops and len(f.attribute) == 1:
                lit = _sql_lit(f.value)
                if lit is None:
                    yield f  # unpushable literal type → Spark evaluates
                    continue
                self.where.append(f'"{f.attribute[0]}" {ops[t]} {lit}')
            elif t is IsNull and len(f.attribute) == 1:
                self.where.append(f'"{f.attribute[0]}" IS NULL')
            elif t is IsNotNull and len(f.attribute) == 1:
                self.where.append(f'"{f.attribute[0]}" IS NOT NULL')
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    def _query(self, extra: str | None = None) -> str:
        cols = ", ".join(f'"{c}"' for c in self.columns)
        preds = list(self.where) + ([extra] if extra else [])
        w = f" WHERE {' AND '.join(preds)}" if preds else ""
        return f"SELECT {cols} FROM {self.table}{w}"

    def partitions(self):
        if self.num_partitions <= 1 or not self.partition_column:
            return [InputPartition(None)]
        import duckdb

        con = duckdb.connect(self.db_path, read_only=True)
        try:
            lo, hi = con.execute(
                f'SELECT min("{self.partition_column}"), '
                f'max("{self.partition_column}") FROM {self.table}'
            ).fetchone()
        finally:
            con.close()
        if lo is None:
            return [InputPartition(None)]
        lo, hi = int(lo), int(hi)
        step = max(1, (hi - lo + 1) // self.num_partitions)
        parts = []
        for i in range(self.num_partitions):
            a = lo + i * step
            b = hi + 1 if i == self.num_partitions - 1 else a + step
            pred = (
                f'"{self.partition_column}" >= {a} '
                f'AND "{self.partition_column}" < {b}'
            )
            if i == 0:
                # rows with a NULL partition column fail EVERY range
                # predicate (NULL comparisons) and would silently vanish
                # from the scan; fold them into the first partition —
                # the same rule as Spark's JDBC partitioned reader.
                pred = f'({pred} OR "{self.partition_column}" IS NULL)'
            parts.append(InputPartition(pred))
        return parts

    def read(self, partition: InputPartition):
        import duckdb

        con = duckdb.connect(self.db_path, read_only=True)
        try:
            reader = con.execute(
                self._query(partition.value)
            ).fetch_record_batch(10_000)
            for batch in reader:
                yield batch  # Arrow RecordBatches — no row-level Python
        finally:
            con.close()


class ServingSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "serving"

    def schema(self) -> str | StructType:
        # infer from the serving table (reader path only; the writer gets
        # its schema from the DataFrame being written)
        import duckdb

        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema

        con = duckdb.connect(self.options["path"], read_only=True)
        try:
            tbl = self.options.get("table", "serving")
            empty = con.execute(f"SELECT * FROM {tbl} LIMIT 0").arrow()
            return from_arrow_schema(pa.schema(empty.schema))
        finally:
            con.close()

    def reader(self, schema: StructType) -> DataSourceReader:
        return ServingScanReader(self.options, schema)

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

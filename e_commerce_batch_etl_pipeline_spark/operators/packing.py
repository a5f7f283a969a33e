"""Sequence packing for pretraining batches (training-data pipeline op).

GPT-style packing concatenates documents in a fixed order and chunks the
token stream into fixed-size context windows; each document's placement
is its EXCLUSIVE running-sum offset in that stream. The offset is a
global prefix sum — the canonical "order-dependent operator at scale"
problem: a naive ``Window.orderBy(key)`` with no partition collapses the
whole table into ONE task. This implements the two-pass distributed
prefix sum instead:

1. range-partition by the sort key (``repartitionByRange`` — partitions
   are contiguous key ranges, so ``spark_partition_id()`` is an ordered
   chunk index); per-partition exclusive cumsum via a window
   PARTITIONED by that chunk id (parallel);
2. per-chunk totals (P rows) come to the driver, their exclusive cumsum
   is broadcast back, and each row's global offset = chunk base + local
   offset.

The result is a pure function of (key order, weights) — independent of
partition count, sampling, or cluster size — so it oracle-checks against
a plain window cumsum in SQL while executing with no single-task stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    key: str = "doc_id",
    weight: str = "n_tok",
    context: int = 2048,
    num_chunks: int | None = None,
) -> DataFrame:
    """Assign each doc its offset in the concatenated token stream and
    derive bin placement for ``context``-sized windows.

    Returns (key, weight, offset, first_bin, last_bin, spans) where
    offset is the exclusive prefix sum of ``weight`` in ``key`` order,
    first_bin/last_bin = offset // context and (offset+weight-1) //
    context, and spans counts straddled windows.
    """
    spark = df.sparkSession
    if num_chunks is None:
        num_chunks = spark.sparkContext.defaultParallelism * 2
    d = (
        df.select(F.col(key), F.col(weight).cast("long").alias("_w"))
        .repartitionByRange(num_chunks, F.col(key))
        .withColumn("_chunk", F.spark_partition_id())
        # pin the chunk assignment: the totals collect (pass 2) and the
        # final consumer are two jobs — without materialization each one
        # would re-run the range-partitioning sample, and on a real
        # cluster a retry could draw different boundaries, pairing chunk
        # bases with the wrong rows
        .localCheckpoint()
    )
    # pass 1: parallel within-chunk exclusive cumsum
    w_local = (
        W.partitionBy("_chunk")
        .orderBy(key)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "_local", F.coalesce(F.sum("_w").over(w_local), F.lit(0))
    )
    # pass 2: chunk bases — P rows on the driver (P ~ parallelism, not data)
    totals = (
        d.groupBy("_chunk").agg(F.sum("_w").alias("_t")).collect()
    )
    base, bases = 0, {}
    for r in sorted(totals, key=lambda r: r["_chunk"]):
        bases[r["_chunk"]] = base
        base += int(r["_t"])
    base_df = spark.createDataFrame(
        [(c, b) for c, b in bases.items()], "_chunk int, _base long"
    )
    out = (
        d.join(F.broadcast(base_df), "_chunk")
        .withColumn("offset", F.col("_base") + F.col("_local"))
        .withColumn("first_bin", (F.col("offset") / context).cast("long"))
        .withColumn(
            "last_bin",
            ((F.col("offset") + F.col("_w") - 1) / context).cast("long"),
        )
        .withColumn("spans", F.col("last_bin") - F.col("first_bin") + 1)
        .select(
            key,
            F.col("_w").alias(weight),
            "offset", "first_bin", "last_bin", "spans",
        )
    )
    return out

"""Structured Streaming front-end for the WAL (SURVEY.md §2.10).

The engine's primary loop is the checkpointed microbatch driver
(microbatch.py) because exactly-once is fenced on our own snapshot
commits. This module provides the Structured-Streaming-native front-end
for deployments that want Spark to do the segment discovery and trigger
scheduling:

- ``stream_wal``: ``readStream`` over the WAL directory with the pinned
  envelope schema (maxFilesPerTrigger bounds a microbatch).
- ``stream_apply``: ``foreachBatch`` bridging each streaming microbatch
  into the same validate→LWW→MERGE→commit body, fenced by stream epoch id
  — the recommended exactly-once sink pattern for custom stores.
- ``windowed_change_rates``: watermarked tumbling-window aggregation over
  the change stream (late envelopes beyond the watermark are dropped from
  the windowed metrics; they are still APPLIED by the engine, whose
  correctness keys on lsn, not event time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("epoch", T.IntegerType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def stream_wal(
    spark: SparkSession,
    wal_glob: str,
    max_files_per_trigger: int = 64,
    schema: T.StructType = ENVELOPE_SCHEMA,
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(wal_glob)
    )


def windowed_change_rates(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Ops/sec style metrics with event-time windows + late-data bound."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("lsn_min"),
            F.max("lsn").alias("lsn_max"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "op",
            "n",
            "lsn_min",
            "lsn_max",
        )
    )


def stream_apply(
    spark: SparkSession,
    wal_glob: str,
    table_root: str,
    checkpoint_dir: str,
    stream_checkpoint_dir: str,
    max_files_per_trigger: int = 64,
):
    """readStream → foreachBatch(engine epoch apply) → exactly-once.

    Each streaming microbatch id becomes the engine epoch; the table's
    (epoch, bucket) fence set makes redelivered batches no-ops, which is
    exactly the idempotent-foreachBatch contract Structured Streaming
    requires of custom sinks.
    """
    from ..sources.wal import WalSource
    from ..streaming.microbatch import CdcEngine
    from ..tables.format import LakeTable

    engine = CdcEngine(
        spark, LakeTable(table_root), WalSource("/nonexistent"),
        checkpoint_dir,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        engine.apply_changes_df(batch_df, epoch=int(batch_id))

    stream = stream_wal(spark, wal_glob, max_files_per_trigger)
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", stream_checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

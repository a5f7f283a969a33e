"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the driver's CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC engine replay (WAL → LWW → MERGE → snapshot
    commits) of a change stream derived from the sf0.001 events table,
    returning the committed final table state."""
    from e_commerce_batch_etl_pipeline_spark.queries import cdc_replay_engine

    return cdc_replay_engine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from e_commerce_batch_etl_pipeline_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from e_commerce_batch_etl_pipeline_spark.queries import ORACLES

    return dict(ORACLES)

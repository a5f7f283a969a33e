"""SparkSession factory.

Reference analog: ``src/pipeline.py:40-58`` + ``src/config.py:7-14`` build a
``local[*]`` session with Kryo and shuffle.partitions=8. We drop Kryo (the
DataFrame path uses Tungsten encoders), pin UTC (oracle comparison), enable
AQE + Arrow, and size shuffle partitions to the core count instead of a
hard-coded 8 so the same code scales from local[8] to a 1000-executor
cluster (where ``spark.sql.shuffle.partitions`` should be set to 2-3x total
cores by the submitter; AQE coalescing fixes over-partitioning at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "cdc_ingest_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a session tuned for the CDC replay workload.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` and launch via spark-submit
    --py-files; the builder then respects the submitted master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        # match parallelism; AQE coalesces small post-shuffle partitions
        try:
            n = int(master.split("[")[1].rstrip("]")) if "[" in master else 0
        except ValueError:
            n = 0
        shuffle_partitions = n if n > 0 else (os.cpu_count() or 8)
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.default.parallelism": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # custom Python DataSources (sources/wal_datasource.py) push
        # epoch/lsn predicates down; off by default in Spark 4.1
        "spark.sql.python.filterPushdown.enabled": "true",
        "spark.sql.parquet.compression.codec": "snappy",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        # deterministic timestamp behavior for oracle comparison
        "spark.sql.datetime.java8API.enabled": "true",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

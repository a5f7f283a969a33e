"""Driver-facing query inventory: every operator from SURVEY.md §2 as a
(spark_query, oracle_sql) pair over the /root/testdata parquet tables.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names + values match the DuckDB oracle exactly (aliases identical on
both sides; doubles rounded; timestamps exported as epoch seconds so
Spark's UTC session and DuckDB's naive timestamps agree).

Portability rules used throughout:
- money/double aggregates rounded to 2dp on both sides
- timestamps → ``unix_timestamp`` (Spark) vs ``epoch(...)::BIGINT`` (DuckDB)
- deterministic ordering: every ORDER BY ends in a unique key
- md5-derived integers for hashing: Spark ``conv(substring(md5(x),1,15),16,10)``
  == DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .operators.lww import lww_dedup
from .operators.merge import merge_upsert


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin UTC on whatever session the driver hands us: year()/month()/
    # window() are session-TZ dependent and the DuckDB oracle compares
    # against naive-UTC timestamps. Runtime-settable, idempotent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _footer_max_long(sf_dir: str, table: str, col: str):
    """Exact MAX of an integer column from parquet row-group statistics —
    the answer aggregate pushdown would give, read driver-side in O(row
    groups) footer metadata instead of a full-scan Spark job (numeric
    parquet stats are exact; only binary stats truncate). Returns None
    when any row group lacks usable stats — callers fall back to the
    Spark aggregate, so results never depend on stats being present
    (r6; guide §1.2 step 1: don't run a distributed pass for a value
    the storage footer already carries)."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path) else [path]
    )
    if not files:
        return None
    mx = None
    for f in files:
        try:
            md = pq.ParquetFile(f).metadata
        except Exception:
            return None
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col not in idx:
            return None
        ci = idx[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            v = int(st.max)
            mx = v if mx is None else max(mx, v)
    return mx


def _enable_python_pushdown(spark: SparkSession) -> None:
    # Spark 4.1 ships spark.sql.python.filterPushdown.enabled=false; a
    # Python DataSource that implements pushFilters() then fails planning
    # with DATA_SOURCE_PUSHDOWN_DISABLED. The repo's session factory
    # (session.py) enables it, but the driver's session does not — the
    # engine's queries must not depend on the caller's session factory,
    # so set it here at runtime (runtime-settable, idempotent), exactly
    # like the session-timezone defense in _t above.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


# =====================================================================
# Reference-ETL analogs (SURVEY.md §2.3/2.6/2.8 — transform semantics of
# src/transform.py + notebooks/06 re-expressed over the TPC-H-ish tables)
# =====================================================================


def q1_pricing_summary(spark, sf_dir):
    """A2 hash-aggregate w/ multiple functions (notebooks/06:276-287)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # integer cents everywhere — double SUM is order-dependent and
            # DuckDB returns HUGEINT for integer SUM, so both sides cast
            F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long"))
            .alias("sum_qty_cents"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .alias("sum_base_price_cents"),
            # exact integer arithmetic: cents * (100 - pct) — no float
            # rounding of derived products (engines disagree at half-cent)
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
            ).alias("sum_disc_price_milli"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # avg from exact ints: bigint/bigint is the same IEEE divide in
        # both engines; *10 lifts cents→milli-qty before floor-quantize
        .withColumn(
            "avg_qty_milli",
            F.floor(
                F.col("sum_qty_cents") / F.col("count_order") * 10 + F.lit(0.5)
            ).cast("long"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty_cents",
            "sum_base_price_cents", "sum_disc_price_milli", "avg_qty_milli",
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(round(l_quantity * 100, 0)::BIGINT)::BIGINT   AS sum_qty_cents,
       sum(round(l_extendedprice * 100, 0)::BIGINT)::BIGINT AS sum_base_price_cents,
       sum(round(l_extendedprice * 100, 0)::BIGINT
           * (100 - round(l_discount * 100, 0)::BIGINT))::BIGINT AS sum_disc_price_milli,
       floor(sum(round(l_quantity * 100, 0)::BIGINT)::BIGINT
             / count(*) * 10 + 0.5)::BIGINT              AS avg_qty_milli,
       count(*)                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def etl_clean_filter(spark, sf_dir):
    """P6 compound business-rule filter + P3 derived col + P9 CASE bucket
    (src/transform.py:90-141)."""
    li = _t(spark, sf_dir, "lineitem")
    # exact integer money: qty * price_cents * (100 - disc_pct) in
    # 1/10000-dollar units — float-free, so Spark and any oracle agree
    total_milli = (
        F.col("l_quantity").cast("long")
        * F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
    )
    bucket = (
        F.when(total_milli < 1000 * 10000, "low")
        .when(total_milli < 10000 * 10000, "mid")
        .when(total_milli < 100000 * 10000, "high")
        .otherwise("very_high")
    )
    return (
        li.filter(
            (F.col("l_quantity") > 0)
            & (F.col("l_extendedprice") > 0)
            & F.col("l_returnflag").isNotNull()
        )
        .withColumn("total_milli", total_milli)
        .withColumn("amount_bucket", bucket)
        .groupBy("amount_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("total_milli").alias("sum_total_milli"),
        )
        .orderBy("amount_bucket")
    )


ORACLE_CLEAN_FILTER = """
WITH c AS (
  SELECT l_quantity::BIGINT
         * round(l_extendedprice * 100, 0)::BIGINT
         * (100 - round(l_discount * 100, 0)::BIGINT) AS total_milli
  FROM lineitem
  WHERE l_quantity > 0 AND l_extendedprice > 0 AND l_returnflag IS NOT NULL
)
SELECT CASE WHEN total_milli < 1000 * 10000 THEN 'low'
            WHEN total_milli < 10000 * 10000 THEN 'mid'
            WHEN total_milli < 100000 * 10000 THEN 'high'
            ELSE 'very_high' END AS amount_bucket,
       count(*) AS n,
       sum(total_milli)::BIGINT AS sum_total_milli
FROM c GROUP BY 1 ORDER BY amount_bucket
"""


def etl_dedup_lww(spark, sf_dir):
    """D1 dedup made deterministic: latest lineitem per order by
    (shipdate, linenumber) via max_by — the reference's dropDuplicates
    (src/transform.py:73-87) with a defined winner."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    # total order: testdata carries duplicate (orderkey, linenumber)
    # rows, so the tiebreak must extend through the whole payload
    w = li.groupBy("l_orderkey").agg(
        F.max_by(
            F.struct("l_partkey", "l_linenumber", "l_quantity"),
            F.struct("l_shipdate", "l_linenumber", "l_partkey", "l_quantity"),
        ).alias("_w"),
        F.max(F.unix_timestamp("l_shipdate")).alias("last_ship_epoch"),
    )
    return w.select(
        "l_orderkey",
        F.col("_w.l_partkey").alias("l_partkey"),
        F.col("_w.l_linenumber").alias("l_linenumber"),
        F.col("_w.l_quantity").alias("l_quantity"),
        "last_ship_epoch",
    ).orderBy("l_orderkey")


ORACLE_DEDUP_LWW = """
WITH r AS (
  SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_shipdate DESC, l_linenumber DESC,
                                     l_partkey DESC, l_quantity DESC) AS rn,
         max(floor(epoch(l_shipdate))::BIGINT) OVER (PARTITION BY l_orderkey) AS last_ship_epoch
  FROM lineitem
)
SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, last_ship_epoch
FROM r WHERE rn = 1 ORDER BY l_orderkey
"""


def etl_broadcast_enrich(spark, sf_dir):
    """J1 broadcast left join enrich (src/pipeline.py:61-99): revenue per
    region through customer→nation→region dims, dims broadcast."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    # chained LEFT broadcast joins — the oracle's own join shape. The
    # previous form materialized an inner-joined dim THEN broadcast it,
    # which serialized two nested broadcast builds inside a third's build
    # job; chaining lets the three (column-pruned) dim builds proceed
    # independently while orders stream through all three hash probes in
    # one stage. Result-identical: a missing dim row yields NULL r_name
    # → 'Other' under either shape (r6; guide §3.1).
    return (
        orders.join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation),
              cust.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region),
              nation.n_regionkey == region.r_regionkey, "left")
        .na.fill({"r_name": "Other"})
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .alias("revenue_cents"),
        )
        .orderBy("r_name")
    )


ORACLE_BROADCAST_ENRICH = """
SELECT coalesce(r_name, 'Other') AS r_name,
       count(*) AS n_orders,
       sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS revenue_cents
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation   ON c_nationkey = n_nationkey
LEFT JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1 ORDER BY r_name
"""


def etl_price_bucket(spark, sf_dir):
    """P9 5-way CASE bucket (src/transform.py:133-140 price_bucket)."""
    part = _t(spark, sf_dir, "part")
    b = (
        F.when(F.col("p_retailprice") < 500, "budget")
        .when(F.col("p_retailprice") < 1000, "standard")
        .when(F.col("p_retailprice") < 1500, "premium")
        .when(F.col("p_retailprice") < 2000, "luxury")
        .otherwise("ultra")
    )
    return (
        part.withColumn("price_bucket", b)
        .groupBy("price_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
        )
        .orderBy("price_bucket")
    )


ORACLE_PRICE_BUCKET = """
SELECT CASE WHEN p_retailprice < 500 THEN 'budget'
            WHEN p_retailprice < 1000 THEN 'standard'
            WHEN p_retailprice < 1500 THEN 'premium'
            WHEN p_retailprice < 2000 THEN 'luxury'
            ELSE 'ultra' END AS price_bucket,
       count(*) AS n,
       round(min(p_retailprice), 2) AS min_price,
       round(max(p_retailprice), 2) AS max_price
FROM part GROUP BY 1 ORDER BY price_bucket
"""


def etl_null_handling(spark, sf_dir):
    """P8 fillna/coalesce defaults (src/transform.py:62-65 GUEST fill,
    src/pipeline.py:96 region fill)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.na.fill({"lang": "unknown", "source": "unknown"})
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("null_texts"),
        )
        .orderBy("lang", "source")
    )


ORACLE_NULL_HANDLING = """
SELECT coalesce(lang, 'unknown') AS lang,
       coalesce(source, 'unknown') AS source,
       count(*) AS n,
       sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_texts
FROM documents GROUP BY 1, 2 ORDER BY lang, source
"""


def etl_date_derived(spark, sf_dir):
    """§2.9 date extraction (src/transform.py:128-130 year/month/day)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .groupBy("order_year", "order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .alias("revenue_cents"),
        )
        .orderBy("order_year", "order_month")
    )


ORACLE_DATE_DERIVED = """
SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
       count(*) AS n_orders,
       sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS revenue_cents
FROM orders GROUP BY 1, 2 ORDER BY order_year, order_month
"""


def etl_conditional_agg(spark, sf_dir):
    """A3 SUM(CASE WHEN …) pivot-style (notebooks/03:493-502)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("n_high"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .alias("sum_value_cents"),
        )
        .orderBy("event_type")
    )


ORACLE_CONDITIONAL_AGG = """
SELECT event_type, count(*) AS n,
       sum(CASE WHEN value > 50 THEN 1 ELSE 0 END)::BIGINT AS n_high,
       sum(round(value * 100, 0)::BIGINT)::BIGINT AS sum_value_cents
FROM events GROUP BY 1 ORDER BY event_type
"""


def etl_topk(spark, sf_dir):
    """O1/O2 multi-key sort + limit (notebooks/06:287): top-10 customers
    by revenue, deterministic tiebreak on key."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_custkey", "c_name", "revenue_cents", "n_orders")
        .orderBy(F.col("revenue_cents").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


ORACLE_TOPK = """
SELECT o_custkey, c_name,
       sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS revenue_cents,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY revenue_cents DESC, o_custkey ASC
LIMIT 10
"""


def etl_dq_null_counts(spark, sf_dir):
    """A4 single-pass multi-column null count (notebooks/02:52-56) — the
    efficient 1-job pattern vs the reference's N-job loop
    (src/quality_checks.py:45-46)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.count(F.lit(1)).alias("total_rows"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
            for c in ["doc_id", "text", "lang", "source", "n_chars"]
        ],
    )


ORACLE_DQ_NULL_COUNTS = """
SELECT count(*) AS total_rows,
       sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls_doc_id,
       sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls_text,
       sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls_lang,
       sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls_source,
       sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls_n_chars
FROM documents
"""


def etl_cast_rename_project(spark, sf_dir):
    """P1/P2/P5 rename + schema-pinning select + casts
    (src/transform.py:10-47, src/load.py:60-67)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumnRenamed("event_id", "id")
        .withColumn("value_cents", F.round(F.col("value") * 100, 0).cast("long"))
        .withColumn("kind", F.upper(F.col("event_type")))
        .withColumn("ts_epoch", F.unix_timestamp("ts"))
        .select("id", "user_id", "kind", "value_cents", "ts_epoch")
        .orderBy("id")
    )


ORACLE_CAST_RENAME = """
SELECT event_id AS id, user_id, upper(event_type) AS kind,
       round(value * 100, 0)::BIGINT AS value_cents,
       floor(epoch(ts))::BIGINT AS ts_epoch
FROM events ORDER BY id
"""


# =====================================================================
# CDC operators over the events table (lsn := event_id, key := user_id,
# op := signup→I / error→D / else U) — SQL-checkable LWW + MERGE
# =====================================================================

_OP_MAP = {"signup": "I", "error": "D"}


def _events_as_envelopes(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    return ev.select(
        F.col("event_id").alias("lsn"),
        op.alias("op"),
        F.col("user_id").alias("doc_id"),
        F.col("event_type"),
        F.round(F.col("value"), 2).alias("value"),
    )


_ENV_SQL = """
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op,
         user_id AS doc_id, event_type, round(value, 2) AS value
  FROM events
"""


def cdc_lww_latest(spark, sf_dir):
    """The engine's LWW dedup (operators/lww.py) over a real change
    stream: final state per key = max-lsn envelope; deletes drop the key."""
    env = _events_as_envelopes(spark, sf_dir)
    latest = lww_dedup(env, key="doc_id", order="lsn")
    return (
        latest.filter(F.col("op") != "D")
        .select("doc_id", "lsn", "op", "event_type", "value")
        .orderBy("doc_id")
    )


ORACLE_CDC_LWW = f"""
WITH env AS ({_ENV_SQL}),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM env
)
SELECT doc_id, lsn, op, event_type, value
FROM r WHERE rn = 1 AND op <> 'D' ORDER BY doc_id
"""


def cdc_merge_upsert(spark, sf_dir):
    """The engine's MERGE operator (operators/merge.py): base = LWW state
    of the stream's first half, changes = LWW of the second half, merged
    via anti-join+union. Must equal the global LWW state — which is what
    the oracle computes (an algebraic identity that pins the operator's
    semantics)."""
    env = _events_as_envelopes(spark, sf_dir)
    mx = _footer_max_long(sf_dir, "events", "event_id")
    if mx is None:  # stats missing: fall back to the distributed agg
        mx = env.agg(F.max("lsn")).collect()[0][0]
    n = mx + 1
    half = n // 2
    first = env.filter(F.col("lsn") < half)
    second = env.filter(F.col("lsn") >= half)
    base = (
        lww_dedup(first, key="doc_id", order="lsn")
        .filter(F.col("op") != "D")
        .select("doc_id", "event_type", "value")
    )
    changes = lww_dedup(second, key="doc_id", order="lsn")
    merged = merge_upsert(base, changes, key="doc_id")
    return merged.select("doc_id", "event_type", "value").orderBy("doc_id")


ORACLE_CDC_MERGE = f"""
WITH env AS ({_ENV_SQL}),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM env
)
SELECT doc_id, event_type, value
FROM r WHERE rn = 1 AND op <> 'D' ORDER BY doc_id
"""


def cdc_replay_engine(spark, sf_dir):
    """FLAGSHIP: the full engine (table format + epoch loop + fences)
    replaying a 4-epoch WAL derived from the events table into a fresh
    lake table; returns the committed final state. The oracle computes
    the same final state as one SQL LWW — so the whole
    validate→dedup→merge→commit stack is oracle-checked."""
    import tempfile

    from .sources.wal import WalSource
    from .streaming.bootstrap import bootstrap_table
    from .streaming.microbatch import CdcEngine
    from .tables.format import TableSchema

    env = _events_as_envelopes(spark, sf_dir)
    mx = _footer_max_long(sf_dir, "events", "event_id")
    if mx is None:  # stats missing: fall back to the distributed agg
        mx = env.agg(F.max("lsn")).collect()[0][0]
    n = mx + 1
    seg = max(1, (n + 3) // 4)
    envelopes = env.select(
        "lsn",
        (F.col("lsn") / seg).cast("int").alias("epoch"),
        "op",
        F.format_string("u%09d", F.col("doc_id")).alias("doc_id"),
        F.when(F.col("op") == "D", F.lit(None))
        .otherwise(F.array(F.pmod(F.col("lsn"), F.lit(50257)).cast("int")))
        .alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),  # engine recomputes
        F.when(F.col("op") == "D", F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("source"),
        F.timestamp_seconds(F.col("lsn")).alias("ts"),
    )
    root = tempfile.mkdtemp(prefix="cdc_replay_q_")
    wal_root = os.path.join(root, "wal")
    for e in range(4):
        envelopes.filter(F.col("epoch") == e).write.mode("overwrite").parquet(
            os.path.join(wal_root, f"epoch-{e:05d}")
        )
    schema = TableSchema(
        fields=[
            ("doc_id", "string", False),
            ("tokens", "array<int>", True),
            ("n_tok", "int", True),
            ("source", "string", True),
        ]
    )
    empty = spark.createDataFrame([], schema.to_struct())
    table = bootstrap_table(os.path.join(root, "table"), empty, num_buckets=8)
    engine = CdcEngine(
        spark, table, WalSource(wal_root), os.path.join(root, "ckpt")
    )
    engine.run()
    final = table.read(spark)
    return final.select(
        "doc_id",
        "n_tok",
        F.element_at("tokens", 1).alias("tok0"),
        "source",
    ).orderBy("doc_id")


ORACLE_CDC_REPLAY = f"""
WITH env AS ({_ENV_SQL}),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM env
)
SELECT printf('u%09d', doc_id) AS doc_id,
       1 AS n_tok,
       (lsn % 50257)::INT AS tok0,
       event_type AS source
FROM r WHERE rn = 1 AND op <> 'D' ORDER BY doc_id
"""


# =====================================================================
# Table-format surface under the DuckDB gate: change feed
# (tables/format.py:changes_between), incremental materialized rollup
# (tables/rollup.py) and point lookup (tables/format.py:lookup) — the
# engine's incremental layer checked the same way as the query corpus.
# Reference analog for the serving reads: sql/create_tables.sql:110-129.
# =====================================================================

_TF_ENV_SQL = """
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op,
         printf('u%09d', user_id) AS doc_id,
         event_type AS source
  FROM events
"""

# State projections shared by the three oracles. The fixture's payload is
# FULLY determined by (lsn, source): tokens = slice([t0, t0+1, t0+2], 1,
# 1 + lsn % 3) with t0 = lsn % 50257 — so comparing (tok0, n_tok, source)
# in SQL is exactly the engine's full-payload struct comparison (no
# collision can make the engine see a change the oracle misses).
# cut = 2 * seg mirrors the Spark fixture's epoch split (epochs 0-1).
_TF_STATES_SQL = f"""
env AS ({_TF_ENV_SQL}),
cut AS (SELECT 2 * ((max(lsn) + 4) // 4) AS c FROM env),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM env WHERE lsn < (SELECT c FROM cut)
),
s1 AS (
  SELECT doc_id, (1 + lsn % 3)::INT AS n_tok,
         (lsn % 50257)::INT AS tok0, source
  FROM r1 WHERE rn = 1 AND op <> 'D'
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM env
),
s2 AS (
  SELECT doc_id, (1 + lsn % 3)::INT AS n_tok,
         (lsn % 50257)::INT AS tok0, source
  FROM r2 WHERE rn = 1 AND op <> 'D'
)
"""

_TF_FIXTURE: dict = {}


def _table_fixture(spark, sf_dir):
    """Replay the events-derived WAL into a REAL lake table, once per
    process per sf_dir (the three table-format queries share it):
    v1 = committed state after epochs 0-1 (changes with lsn < 2*seg),
    v2 = final state after all 4 epochs. Deterministic: the same WAL
    replays to the same logical state regardless of physical layout."""
    import tempfile

    from .sources.wal import WalSource
    from .streaming.bootstrap import bootstrap_table
    from .streaming.microbatch import CdcEngine
    from .tables.format import LakeTable, TableSchema

    key = os.path.abspath(sf_dir)
    if key in _TF_FIXTURE:
        return _TF_FIXTURE[key]
    env = _events_as_envelopes(spark, sf_dir)
    mx = _footer_max_long(sf_dir, "events", "event_id")
    if mx is None:  # stats missing: fall back to the distributed agg
        mx = env.agg(F.max("lsn")).collect()[0][0]
    n = mx + 1
    seg = max(1, (n + 3) // 4)
    t0 = F.pmod(F.col("lsn"), F.lit(50257)).cast("int")
    toks = F.slice(
        F.array(t0, t0 + F.lit(1), t0 + F.lit(2)),
        F.lit(1),
        (F.lit(1) + F.pmod(F.col("lsn"), F.lit(3))).cast("int"),
    )
    envelopes = env.select(
        "lsn",
        (F.col("lsn") / seg).cast("int").alias("epoch"),
        "op",
        F.format_string("u%09d", F.col("doc_id")).alias("doc_id"),
        F.when(F.col("op") == "D", F.lit(None)).otherwise(toks).alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),  # engine recomputes
        F.when(F.col("op") == "D", F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("source"),
        F.timestamp_seconds(F.col("lsn")).alias("ts"),
    )
    root = tempfile.mkdtemp(prefix="tf_fixture_")
    wal_root = os.path.join(root, "wal")
    for e in range(4):
        envelopes.filter(F.col("epoch") == e).write.mode("overwrite").parquet(
            os.path.join(wal_root, f"epoch-{e:05d}")
        )
    schema = TableSchema(
        fields=[
            ("doc_id", "string", False),
            ("tokens", "array<int>", True),
            ("n_tok", "int", True),
            ("source", "string", True),
        ]
    )
    empty = spark.createDataFrame([], schema.to_struct())
    table = bootstrap_table(os.path.join(root, "table"), empty, num_buckets=8)
    engine = CdcEngine(
        spark, table, WalSource(wal_root), os.path.join(root, "ckpt")
    )
    engine.run(max_epochs=2)  # epochs 0-1 → v1
    v1 = table.current().version
    engine.run()  # epochs 2-3 → v2
    v2 = table.current().version
    _TF_FIXTURE[key] = {
        "table": table, "v1": v1, "v2": v2,
        "wal_root": wal_root, "seg": seg, "n": n,
    }
    return _TF_FIXTURE[key]


def table_changes_between(spark, sf_dir):
    """Incremental change feed (Delta-CDF / Iceberg-CDC shape): NET
    row-level I/U/D between two committed snapshot versions, file-pruned
    to the buckets whose file sets differ (tables/format.py:changes_between).
    The oracle recomputes the diff as a full-outer join of the two states
    expressed in SQL."""
    fx = _table_fixture(spark, sf_dir)
    feed = fx["table"].changes_between(spark, fx["v1"], fx["v2"])
    return feed.select(
        "_change_op",
        "doc_id",
        "n_tok",
        F.element_at("tokens", 1).alias("tok0"),
        "source",
    ).orderBy("doc_id")


ORACLE_TABLE_CHANGES = f"""
WITH {_TF_STATES_SQL},
d AS (
  SELECT coalesce(s2.doc_id, s1.doc_id) AS doc_id,
         CASE WHEN s1.doc_id IS NULL THEN 'I'
              WHEN s2.doc_id IS NULL THEN 'D'
              WHEN s1.tok0 <> s2.tok0 OR s1.n_tok <> s2.n_tok
                   OR s1.source <> s2.source THEN 'U'
         END AS "_change_op",
         -- D rows surface the PRE-image; I/U the post-image
         CASE WHEN s2.doc_id IS NULL THEN s1.n_tok ELSE s2.n_tok END AS n_tok,
         CASE WHEN s2.doc_id IS NULL THEN s1.tok0 ELSE s2.tok0 END AS tok0,
         CASE WHEN s2.doc_id IS NULL THEN s1.source ELSE s2.source END AS source
  FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id
)
SELECT "_change_op", doc_id, n_tok, tok0, source
FROM d WHERE "_change_op" IS NOT NULL ORDER BY doc_id
"""


def table_incremental_rollup(spark, sf_dir):
    """Incremental materialized rollup (tables/rollup.py): the per-source
    (count, sum(n_tok)) aggregate maintained v1→v2 from the change feed
    ALONE (I adds, D retracts, U handles group moves) — cost O(changes),
    never O(table). The oracle recomputes the same aggregate from the
    final state, so any broken retraction algebra hash-mismatches."""
    from .tables.rollup import incremental_rollup

    fx = _table_fixture(spark, sf_dir)
    table = fx["table"]
    state_v1 = (
        table.read(spark, snapshot=table.snapshot_at(fx["v1"]))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_tok").cast("long").alias("total"),
        )
    )
    out = incremental_rollup(
        table, spark, fx["v1"], fx["v2"], state_v1, "source", "n_tok"
    )
    return out.select("source", "n", "total").orderBy("source")


ORACLE_TABLE_ROLLUP = f"""
WITH {_TF_STATES_SQL}
SELECT source, count(*)::BIGINT AS n, sum(n_tok)::BIGINT AS total
FROM s2 GROUP BY source ORDER BY source
"""

_TF_LOOKUP_KEYS = [f"u{i:09d}" for i in range(25)]


def table_point_lookup(spark, sf_dir):
    """Point lookup (tables/format.py:lookup — the serving-read path):
    scan ONLY the buckets the keys hash to (murmur3 bucket route + In
    pushdown). Oracle: plain WHERE doc_id IN (...) over the final state."""
    fx = _table_fixture(spark, sf_dir)
    table = fx["table"]
    rows = table.lookup(spark, _TF_LOOKUP_KEYS)
    return rows.select(
        "doc_id",
        "n_tok",
        F.element_at("tokens", 1).alias("tok0"),
        "source",
    ).orderBy("doc_id")


ORACLE_TABLE_LOOKUP = f"""
WITH {_TF_STATES_SQL}
SELECT doc_id, n_tok, tok0, source
FROM s2
WHERE doc_id IN ({", ".join(repr(k) for k in _TF_LOOKUP_KEYS)})
ORDER BY doc_id
"""


# =====================================================================
# Window / sessionization / streaming-shaped aggregation (§2.7, §2.10 —
# absent in the reference, required by the engine's test surface)
# =====================================================================


def window_running_sum(spark, sf_dir):
    """Running per-user sum (window frame) — the §2.7 gap made real."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        ev.withColumn("running_cents", F.sum(cents).over(w))
        .select("event_id", "user_id", "running_cents")
        .orderBy("event_id")
    )


ORACLE_RUNNING_SUM = """
SELECT event_id, user_id,
       (sum(round(value * 100, 0)::BIGINT)
         OVER (PARTITION BY user_id ORDER BY event_id))::BIGINT AS running_cents
FROM events ORDER BY event_id
"""


def sessionize(spark, sf_dir):
    """Sessionization: gap > 30 min starts a new session (lag + cumsum)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    gap = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts"), 1).over(w)
    flagged = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id,
         floor(epoch(ts)) - lag(floor(epoch(ts))) OVER (PARTITION BY user_id ORDER BY event_id) AS gap
  FROM events
)
SELECT user_id,
       sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id ORDER BY user_id
"""


def tumbling_window_agg(spark, sf_dir):
    """Tumbling 1-hour event-time windows (Structured-Streaming-shaped agg
    run on the batch table; window start exported as epoch seconds)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value_cents",
        )
        .orderBy("window_start", "event_type")
    )


ORACLE_TUMBLING = """
SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS window_start,
       event_type, count(*) AS n,
       sum(round(value * 100, 0)::BIGINT)::BIGINT AS sum_value_cents
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


# =====================================================================
# registry
# =====================================================================

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "etl_clean_filter": etl_clean_filter,
    "etl_dedup_lww": etl_dedup_lww,
    "etl_broadcast_enrich": etl_broadcast_enrich,
    "etl_price_bucket": etl_price_bucket,
    "etl_null_handling": etl_null_handling,
    "etl_date_derived": etl_date_derived,
    "etl_conditional_agg": etl_conditional_agg,
    "etl_topk": etl_topk,
    "etl_dq_null_counts": etl_dq_null_counts,
    "etl_cast_rename_project": etl_cast_rename_project,
    "cdc_lww_latest": cdc_lww_latest,
    "cdc_merge_upsert": cdc_merge_upsert,
    "cdc_replay_engine": cdc_replay_engine,
    "table_changes_between": table_changes_between,
    "table_incremental_rollup": table_incremental_rollup,
    "table_point_lookup": table_point_lookup,
    "window_running_sum": window_running_sum,
    "sessionize": sessionize,
    "tumbling_window_agg": tumbling_window_agg,
}

ORACLES = {
    "q1_pricing_summary": ORACLE_Q1,
    "etl_clean_filter": ORACLE_CLEAN_FILTER,
    "etl_dedup_lww": ORACLE_DEDUP_LWW,
    "etl_broadcast_enrich": ORACLE_BROADCAST_ENRICH,
    "etl_price_bucket": ORACLE_PRICE_BUCKET,
    "etl_null_handling": ORACLE_NULL_HANDLING,
    "etl_date_derived": ORACLE_DATE_DERIVED,
    "etl_conditional_agg": ORACLE_CONDITIONAL_AGG,
    "etl_topk": ORACLE_TOPK,
    "etl_dq_null_counts": ORACLE_DQ_NULL_COUNTS,
    "etl_cast_rename_project": ORACLE_CAST_RENAME,
    "cdc_lww_latest": ORACLE_CDC_LWW,
    "cdc_merge_upsert": ORACLE_CDC_MERGE,
    "cdc_replay_engine": ORACLE_CDC_REPLAY,
    "table_changes_between": ORACLE_TABLE_CHANGES,
    "table_incremental_rollup": ORACLE_TABLE_ROLLUP,
    "table_point_lookup": ORACLE_TABLE_LOOKUP,
    "window_running_sum": ORACLE_RUNNING_SUM,
    "sessionize": ORACLE_SESSIONIZE,
    "tumbling_window_agg": ORACLE_TUMBLING,
}


# =====================================================================
# Training-data pipeline ops: text analysis, dedup family, similarity
# search, multimodal plumbing (SURVEY.md build-plan extensions)
# =====================================================================


def text_metrics(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex), distinct words,
    content fingerprint — pure Catalyst, map-only at scale."""
    from .functions.text import (
        bpe_token_count,
        distinct_word_count,
        doc_fingerprint,
        ws_token_count,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars_calc"),
        ws_token_count(t).alias("n_ws_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        distinct_word_count(t).alias("n_distinct_words"),
        doc_fingerprint(t).alias("fingerprint"),
    ).orderBy("doc_id")


ORACLE_TEXT_METRICS = r"""
SELECT doc_id,
       length(text) AS n_chars_calc,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
       len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct_words,
       md5(lower(trim(text))) AS fingerprint
FROM documents ORDER BY doc_id
"""


def text_token_frequency(spark, sf_dir):
    """Vocab-frequency heavy hitters over the corpus: top-50 words by
    document frequency (training-data vocab stats). Scale shape:
    explode → hash-agg with MAP-SIDE partial combine (one shuffle of
    ≤ distinct-words rows per mapper, never the token stream) → top-k
    via TakeOrdered. Deterministic tiebreak on the word itself."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(50)
    )


ORACLE_TOKEN_FREQ = r"""
SELECT word, count(*)::BIGINT AS n
FROM (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT 50
"""


def text_lang_id(spark, sf_dir):
    """Stopword-majority language ID heuristic; exports the per-language
    stopword counts (exact ints) plus the argmax guess."""
    from .functions.text import lang_guess, stopword_count

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        stopword_count(t, "de").alias("c_de"),
        stopword_count(t, "en").alias("c_en"),
        stopword_count(t, "es").alias("c_es"),
        stopword_count(t, "fr").alias("c_fr"),
        lang_guess(t).alias("lang_guess"),
    ).orderBy("doc_id")


ORACLE_LANG_ID = r"""
WITH c AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        w -> w IN ('der','die','und','ein'))) AS c_de,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        w -> w IN ('the','a','of','and'))) AS c_en,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        w -> w IN ('el','la','y','un'))) AS c_es,
    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        w -> w IN ('le','la','et','un'))) AS c_fr
  FROM documents
)
SELECT doc_id, c_de, c_en, c_es, c_fr,
       CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
            WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
            WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
            WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
            ELSE 'fr' END AS lang_guess
FROM c ORDER BY doc_id
"""


def dedup_exact_stats(spark, sf_dir):
    """Exact dedup: per source, docs vs distinct normalized fingerprints
    (hash-groupBy; one partial-aggregated pass at scale)."""
    from .functions.text import doc_fingerprint

    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", doc_fingerprint(F.col("text")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("fp")).alias("n_unique"),
        )
        .orderBy("source")
    )


ORACLE_DEDUP_EXACT = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(lower(trim(text)))) AS n_unique
FROM documents GROUP BY 1 ORDER BY source
"""


def dedup_jaccard_nearest(spark, sf_dir):
    """n-gram (word-set) Jaccard nearest neighbor per doc — the exact
    verify step of the dedup pipeline (runs on LSH candidates at scale)."""
    from .operators.dedup import jaccard_nearest

    d = _t(spark, sf_dir, "documents")
    return jaccard_nearest(d).orderBy("doc_id")


ORACLE_JACCARD_NEAREST = r"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS word
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n_words FROM w GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM w a JOIN w b USING (word)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, inter,
         sa.n_words + sb.n_words - inter AS uni,
         inter::DOUBLE / (sa.n_words + sb.n_words - inter) AS jac
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_a AS doc_id, id_b AS nn_id, inter, uni
FROM (SELECT *, row_number() OVER (PARTITION BY id_a
                                   ORDER BY jac DESC, id_b ASC) AS rn
      FROM scored)
WHERE rn = 1 ORDER BY doc_id
"""


def dedup_minhash_signatures(spark, sf_dir):
    """MinHash signatures (k=8) over distinct word shingles — md5-derived,
    portable; map-only at scale."""
    from .operators.dedup import minhash_signatures

    d = _t(spark, sf_dir, "documents")
    return minhash_signatures(d, k=8).orderBy("doc_id")


def _mh_sql(j):
    return (
        "list_min(list_transform("
        "list_distinct(regexp_split_to_array(trim(text), '\\s+')), "
        f"w -> ('0x'||substr(md5('{j}:' || w),1,15))::BIGINT)) AS mh_{j}"
    )


ORACLE_MINHASH_SIG = (
    "SELECT doc_id, "
    + ", ".join(_mh_sql(j) for j in range(8))
    + " FROM documents ORDER BY doc_id"
)


def dedup_minhash_lsh(spark, sf_dir):
    """LSH banding stats: bucket-size histogram per band — the shuffle
    that replaces the O(n^2) pair scan at 10^10 docs."""
    from .operators.dedup import minhash_lsh_buckets

    d = _t(spark, sf_dir, "documents")
    bk = minhash_lsh_buckets(d, k=8, bands=4)
    return (
        bk.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket"),
            F.sum(F.when(F.col("bucket_size") > 1, 1).otherwise(0)).alias(
                "n_collision_buckets"
            ),
        )
        .orderBy("band_id")
    )


def _band_sql():
    parts = []
    split = "list_distinct(regexp_split_to_array(trim(text), '\\s+'))"
    for b in range(4):
        mhs = []
        for r in range(2):
            j = b * 2 + r
            mhs.append(
                "(list_min(list_transform(" + split + ", "
                + f"w -> ('0x'||substr(md5('{j}:' || w),1,15))::BIGINT)))::VARCHAR"
            )
        parts.append(
            f"SELECT doc_id, {b} AS band_id, "
            + "md5(" + " || '_' || ".join(mhs) + ") AS band_hash FROM documents"
        )
    return " UNION ALL ".join(parts)


_BAND_SQL = _band_sql()

ORACLE_MINHASH_LSH = f"""
WITH bands AS ({_BAND_SQL}),
buckets AS (
  SELECT band_id, band_hash, count(*) AS bucket_size
  FROM bands GROUP BY 1, 2
)
SELECT band_id, count(*) AS n_buckets, max(bucket_size) AS max_bucket,
       sum(CASE WHEN bucket_size > 1 THEN 1 ELSE 0 END)::BIGINT AS n_collision_buckets
FROM buckets GROUP BY 1 ORDER BY band_id
"""


def dedup_simhash(spark, sf_dir):
    """16-bit SimHash per doc (md5-derived bit votes over words)."""
    from .operators.dedup import simhash

    d = _t(spark, sf_dir, "documents")
    return simhash(d, bits=16).orderBy("doc_id")


ORACLE_SIMHASH = r"""
WITH w AS (
  SELECT doc_id,
         ('0x'||substr(md5(unnest(list_distinct(
             regexp_split_to_array(trim(text), '\s+')))),1,15))::BIGINT AS h
  FROM documents
),
per_bit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM w CROSS JOIN (SELECT i::INT AS bit FROM range(16) r(i)) bits
  GROUP BY 1, 2
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM per_bit GROUP BY 1 ORDER BY doc_id
"""


def embed_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for every 50th vector as query. Exact
    int64 dot products on floor-quantized embeddings (portable); cosine
    double used only for ordering."""
    from .operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(e, q, k=5).orderBy("query_id", "rank")


ORACLE_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qq
  FROM embeddings WHERE vec_id % 50 = 0
),
c AS (
  SELECT vec_id AS nn_id,
         list_transform(embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qv
  FROM embeddings
),
scored AS (
  SELECT query_id, nn_id,
         list_sum(list_transform(list_zip(qv, qq), p -> p[1] * p[2]))::BIGINT AS dot,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS n2,
         list_sum(list_transform(qq, x -> x * x))::BIGINT AS qn2
  FROM c CROSS JOIN q WHERE nn_id <> query_id
)
SELECT query_id, rank, nn_id, dot, n2 FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id
    ORDER BY (dot / sqrt(n2::DOUBLE * qn2::DOUBLE)) DESC, nn_id ASC) AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
"""


def embed_lsh_signature(spark, sf_dir):
    """Random-hyperplane LSH bucket id per vector (16 planes, md5-derived
    ±1 weights, exact int arithmetic) — the ANN scale path's partitioner."""
    from .operators.similarity import hyperplane_signature

    e = _t(spark, sf_dir, "embeddings")
    return hyperplane_signature(e, planes=16, dim=64).orderBy("vec_id")


ORACLE_LSH_SIG = """
WITH v AS (
  SELECT vec_id, i::INT AS i,
         floor(embedding[i::INT + 1]::DOUBLE * 10000 + 0.5)::BIGINT AS x
  FROM embeddings CROSS JOIN range(64) r(i)
),
wt AS (
  SELECT p::INT AS plane, i::INT AS i,
         CASE WHEN ('0x'||substr(md5(p::INT::VARCHAR || ':' || i::INT::VARCHAR),1,15))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS w
  FROM range(16) a(p) CROSS JOIN range(64) b(i)
),
proj AS (
  SELECT vec_id, plane, sum(w * x) AS s
  FROM v JOIN wt USING (i) GROUP BY 1, 2
)
SELECT vec_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << plane) ELSE 0 END)::BIGINT AS bucket
FROM proj GROUP BY 1 ORDER BY vec_id
"""


def embed_ann_lsh_topk(spark, sf_dir):
    """Approximate NN: exact cosine only within the query's LSH bucket
    (8 planes); recall vs brute force asserted in tests/test_similarity.py,
    value parity against the full SQL re-derivation below."""
    from .operators.similarity import ann_lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_lsh_topk(e, q, k=5, planes=8, dim=64).orderBy(
        "query_id", "rank"
    )


def multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary payloads processed by an
    Arrow-batched mapInPandas 'decoder' (deterministic fake — real decode
    stubbed, see functions/multimodal.py). Metadata is oracle-checkable:
    byte length / header byte / md5 checksum of the payload."""
    from .functions.multimodal import attach_binary_payload, extract_features

    d = _t(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(d))
    return feats.select("doc_id", "n_bytes", "header", "checksum").orderBy(
        F.col("doc_id").cast("long")
    )


ORACLE_MULTIMODAL_META = """
SELECT doc_id::VARCHAR AS doc_id,
       octet_length(encode(text)) AS n_bytes,
       CASE WHEN length(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS header,
       md5(text) AS checksum
FROM documents ORDER BY doc_id::BIGINT
"""


QUERIES.update({
    "text_metrics": text_metrics,
    "text_token_frequency": text_token_frequency,
    "text_lang_id": text_lang_id,
    "dedup_exact_stats": dedup_exact_stats,
    "dedup_jaccard_nearest": dedup_jaccard_nearest,
    "dedup_minhash_signatures": dedup_minhash_signatures,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "embed_cosine_topk": embed_cosine_topk,
    "embed_lsh_signature": embed_lsh_signature,
    "embed_ann_lsh_topk": embed_ann_lsh_topk,
    "multimodal_meta": multimodal_meta,
})

ORACLES.update({
    "text_metrics": ORACLE_TEXT_METRICS,
    "text_token_frequency": ORACLE_TOKEN_FREQ,
    "text_lang_id": ORACLE_LANG_ID,
    "dedup_exact_stats": ORACLE_DEDUP_EXACT,
    "dedup_jaccard_nearest": ORACLE_JACCARD_NEAREST,
    "dedup_minhash_signatures": ORACLE_MINHASH_SIG,
    "dedup_minhash_lsh": ORACLE_MINHASH_LSH,
    "dedup_simhash": ORACLE_SIMHASH,
    "embed_cosine_topk": ORACLE_COSINE_TOPK,
    "embed_lsh_signature": ORACLE_LSH_SIG,
    # embed_ann_lsh_topk: intentionally no oracle (rows-only; recall
    # asserted in tests/test_similarity.py against the brute-force top-k)
    "multimodal_meta": ORACLE_MULTIMODAL_META,
})


# =====================================================================
# §2 coverage closers: SQL-over-files (S3), temp views (S6), full date
# function family (§2.9), pivot / rollup / set ops (§2.6, §2.8)
# =====================================================================


def sql_over_files(spark, sf_dir):
    """S3: spark.sql over a parquet path literal
    (notebooks/04_write_parquet.py:134-139)."""
    path = os.path.join(sf_dir, "orders.parquet")
    return spark.sql(
        f"""SELECT o_orderpriority,
                   count(*) AS n,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS revenue_cents
            FROM parquet.`{path}`
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    )


ORACLE_SQL_OVER_FILES = """
SELECT o_orderpriority, count(*) AS n,
       sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS revenue_cents
FROM orders GROUP BY 1 ORDER BY o_orderpriority
"""


def temp_view_pipeline(spark, sf_dir):
    """S6: temp-view handoff between pipeline stages
    (notebooks/01:268 → 02:25 pattern) + SQL stage on the view."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_stage")
    spark.sql(
        """SELECT l_orderkey, l_returnflag,
                  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
           FROM lineitem_stage WHERE l_quantity > 0"""
    ).createOrReplaceTempView("lineitem_clean")
    return spark.sql(
        """SELECT l_returnflag, count(*) AS n, sum(price_cents) AS sum_cents
           FROM lineitem_clean GROUP BY 1 ORDER BY l_returnflag"""
    )


ORACLE_TEMP_VIEW = """
SELECT l_returnflag, count(*) AS n,
       sum(round(l_extendedprice * 100, 0)::BIGINT)::BIGINT AS sum_cents
FROM lineitem WHERE l_quantity > 0
GROUP BY 1 ORDER BY l_returnflag
"""


def etl_date_functions(spark, sf_dir):
    """§2.9 full date family: quarter, dayofweek, month name, datediff
    (notebooks/02:170-179). dayofweek aligned: Spark is 1=Sunday,
    DuckDB dayofweek is 0=Sunday → oracle adds 1."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "inner")
    return j.select(
        F.col("o_orderkey"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_format("o_orderdate", "MMMM").alias("order_month_name"),
        F.datediff(F.col("last_ship"), F.col("o_orderdate")).alias(
            "days_to_last_ship"
        ),
    ).orderBy("o_orderkey")


ORACLE_DATE_FUNCTIONS = """
SELECT o_orderkey,
       quarter(o_orderdate) AS order_quarter,
       (dayofweek(o_orderdate) + 1)::INT AS order_dow,
       monthname(o_orderdate) AS order_month_name,
       date_diff('day', o_orderdate::DATE, last_ship::DATE)::INT
         AS days_to_last_ship
FROM orders
JOIN (SELECT l_orderkey, max(l_shipdate) AS last_ship
      FROM lineitem GROUP BY 1) li ON o_orderkey = l_orderkey
ORDER BY o_orderkey
"""


def pivot_status_by_priority(spark, sf_dir):
    """Pivot (§2.6-absent in the reference, standard OLAP reshape):
    order counts by priority × status."""
    o = _t(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .count()
        .na.fill(0)
        .withColumnsRenamed({s: f"n_{s}" for s in statuses})
        .orderBy("o_orderpriority")
    )


ORACLE_PIVOT = """
SELECT o_orderpriority,
       sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_F,
       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_O,
       sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_P
FROM orders GROUP BY 1 ORDER BY o_orderpriority
"""


def rollup_revenue(spark, sf_dir):
    """ROLLUP hierarchy totals (§2.6-absent; grouping-set coverage)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .alias("revenue_cents"),
        )
        .orderBy("order_year", "o_orderstatus")
    )


ORACLE_ROLLUP = """
SELECT year(o_orderdate) AS order_year, o_orderstatus,
       count(*) AS n,
       sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS revenue_cents
FROM orders GROUP BY ROLLUP (order_year, o_orderstatus)
ORDER BY order_year, o_orderstatus
"""


def set_ops_except(spark, sf_dir):
    """Set ops (§2.8-absent: exceptAll/intersect): customers with orders
    but no high-priority orders."""
    o = _t(spark, sf_dir, "orders")
    all_c = o.select("o_custkey")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        all_c.distinct()
        .exceptAll(hi.distinct())
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    )


ORACLE_SET_OPS = """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT DISTINCT o_custkey AS custkey FROM orders
WHERE o_orderpriority = '1-URGENT'
ORDER BY custkey
"""


QUERIES.update({
    "sql_over_files": sql_over_files,
    "temp_view_pipeline": temp_view_pipeline,
    "etl_date_functions": etl_date_functions,
    "pivot_status_by_priority": pivot_status_by_priority,
    "rollup_revenue": rollup_revenue,
    "set_ops_except": set_ops_except,
})

ORACLES.update({
    "sql_over_files": ORACLE_SQL_OVER_FILES,
    "temp_view_pipeline": ORACLE_TEMP_VIEW,
    "etl_date_functions": ORACLE_DATE_FUNCTIONS,
    "pivot_status_by_priority": ORACLE_PIVOT,
    "rollup_revenue": ORACLE_ROLLUP,
    "set_ops_except": ORACLE_SET_OPS,
})


# =====================================================================
# Bridge + remaining coverage: text→tokens bridge, embedding near-dup,
# union expansion (O3)
# =====================================================================


def tokenize_documents(spark, sf_dir):
    """Text → token-id arrays (the bridge from a raw documents table to
    the engine's pre-tokenized input shape): whitespace words hashed into
    a vocab of 50257 via the portable md5 hash. Arrays are summarized to
    scalars for the comparison (n_tok, first/last id, checksum-sum)."""
    from .operators.dedup import md5int

    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    toks = F.transform(words, lambda w: F.pmod(md5int(w), F.lit(50257)).cast("long"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.element_at(toks, 1).alias("tok_first"),
        F.element_at(toks, -1).alias("tok_last"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "tok_sum"
        ),
    ).orderBy("doc_id")


ORACLE_TOKENIZE = r"""
WITH t AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(trim(text), '\s+'),
            w -> ('0x'||substr(md5(w),1,15))::BIGINT % 50257) AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tok,
       toks[1] AS tok_first,
       toks[-1] AS tok_last,
       list_sum(toks)::BIGINT AS tok_sum
FROM t ORDER BY doc_id
"""


def dedup_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: all pairs with cosine >=
    0.35, exact int64 arithmetic (threshold compare done on
    400*dot^2 vs 49*n2a*n2b — fully integer, no float compare at the
    boundary). Threshold chosen below the synthetic corpus's max pair
    cosine (~0.48) so the result is NON-vacuous at every test scale — a
    0.5 threshold hash-matched trivially on empty output."""
    from .operators.similarity import dot_q, norm2_q, quantize

    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        F.col("vec_id"), quantize(F.col("embedding")).alias("qv")
    ).withColumn("n2", norm2_q(F.col("qv")))
    a = q.alias("a")
    b = q.alias("b")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("dot", dot_q(F.col("a.qv"), F.col("b.qv")))
        # cos >= 0.35 ⇔ dot > 0 AND 400*dot^2 >= 49*n2a*n2b (exact ints)
        .filter(
            (F.col("dot") > 0)
            & (400 * F.col("dot") * F.col("dot")
               >= 49 * F.col("a.n2") * F.col("b.n2"))
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("dot"),
        )
        .orderBy("id_a", "id_b")
    )
    return pairs


ORACLE_EMBED_NEARDUP = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS n2
  FROM q
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2]))::BIGINT AS dot
FROM n a CROSS JOIN n b
WHERE a.vec_id < b.vec_id
  AND list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2]))::BIGINT > 0
  AND 400 * list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2]))::BIGINT
        * list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2]))::BIGINT
      >= 49 * a.n2 * b.n2
ORDER BY id_a, id_b
"""


def union_expand(spark, sf_dir):
    """O3 union-by-position/name (src/extract.py:72-91's amplification
    pattern, minus the O(n²) count loop): stack two filtered projections
    and aggregate."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.lit("c").alias("kind")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.lit("v").alias("kind")
    )
    return (
        clicks.unionByName(views)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("kind") == "c", 1).otherwise(0)).alias("n_clicks"),
        )
        .orderBy("user_id")
    )


ORACLE_UNION_EXPAND = """
WITH u AS (
  SELECT user_id, 'c' AS kind FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, 'v' AS kind FROM events WHERE event_type = 'view'
)
SELECT user_id, count(*) AS n,
       sum(CASE WHEN kind = 'c' THEN 1 ELSE 0 END)::BIGINT AS n_clicks
FROM u GROUP BY 1 ORDER BY user_id
"""


QUERIES.update({
    "tokenize_documents": tokenize_documents,
    "dedup_embedding_neardup": dedup_embedding_neardup,
    "union_expand": union_expand,
})
ORACLES.update({
    "tokenize_documents": ORACLE_TOKENIZE,
    "dedup_embedding_neardup": ORACLE_EMBED_NEARDUP,
    "union_expand": ORACLE_UNION_EXPAND,
})


ORACLE_ANN_LSH = """
WITH v AS (
  SELECT vec_id, i::INT AS i,
         floor(embedding[i::INT + 1]::DOUBLE * 10000 + 0.5)::BIGINT AS x
  FROM embeddings CROSS JOIN range(64) r(i)
),
wt AS (
  SELECT p::INT AS plane, i::INT AS i,
         CASE WHEN ('0x'||substr(md5(p::INT::VARCHAR || ':' || i::INT::VARCHAR),1,15))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS w
  FROM range(8) a(p) CROSS JOIN range(64) b(i)
),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << plane) ELSE 0 END)::BIGINT AS bucket
  FROM (SELECT vec_id, plane, sum(w * x) AS s
        FROM v JOIN wt USING (i) GROUP BY 1, 2)
  GROUP BY 1
),
q AS (
  SELECT e.vec_id AS query_id,
         list_transform(e.embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qq,
         s.bucket
  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
  WHERE e.vec_id % 50 = 0
),
c AS (
  SELECT e.vec_id AS nn_id,
         list_transform(e.embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qv,
         s.bucket
  FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
),
scored AS (
  SELECT query_id, nn_id,
         list_sum(list_transform(list_zip(qv, qq), p -> p[1] * p[2]))::BIGINT AS dot,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS n2,
         list_sum(list_transform(qq, x -> x * x))::BIGINT AS qn2
  FROM c JOIN q USING (bucket)
  WHERE nn_id <> query_id
)
SELECT query_id, rank, nn_id, dot FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id
    ORDER BY (dot / sqrt(n2::DOUBLE * qn2::DOUBLE)) DESC, nn_id ASC) AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
"""

ORACLES["embed_ann_lsh_topk"] = ORACLE_ANN_LSH


def embed_ann_ivf_topk(spark, sf_dir):
    """IVF ANN (nprobe=1): centroids = every 25th vector (deterministic
    coarse quantizer stand-in for trained centroids); exact cosine within
    the query's cell. Completes the IVF-or-LSH scale-path pair."""
    from .operators.similarity import ann_ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_ivf_topk(e, q, cents, k=5).orderBy("query_id", "rank")


ORACLE_ANN_IVF = """
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS n2
  FROM qz
),
cents AS (SELECT vec_id AS centroid_id, qv AS cv, n2 AS cn2 FROM n
          WHERE vec_id % 25 = 0),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY (list_sum(list_transform(list_zip(a.qv, c.cv), p -> p[1]*p[2]))::BIGINT
                       / sqrt(a.n2::DOUBLE * c.cn2::DOUBLE)) DESC,
                      c.centroid_id ASC) AS rn
    FROM n a CROSS JOIN cents c
  ) WHERE rn = 1
),
corpus AS (
  SELECT n.vec_id AS nn_id, n.qv, n.n2, assign.centroid_id
  FROM n JOIN assign USING (vec_id)
),
qs AS (
  SELECT n.vec_id AS query_id, n.qv AS qq, n.n2 AS qn2, assign.centroid_id
  FROM n JOIN assign USING (vec_id)
  WHERE n.vec_id % 50 = 0
),
scored AS (
  SELECT query_id, nn_id,
         list_sum(list_transform(list_zip(qv, qq), p -> p[1] * p[2]))::BIGINT AS dot,
         n2, qn2
  FROM corpus JOIN qs USING (centroid_id)
  WHERE nn_id <> query_id
)
SELECT query_id, rank, nn_id, dot FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id
    ORDER BY (dot / sqrt(n2::DOUBLE * qn2::DOUBLE)) DESC, nn_id ASC) AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
"""

QUERIES["embed_ann_ivf_topk"] = embed_ann_ivf_topk
ORACLES["embed_ann_ivf_topk"] = ORACLE_ANN_IVF


def text_zscore_by_source(spark, sf_dir):
    """groupBy().applyInPandas grouped-map: per-source z-score of doc
    length, floor-quantized from exact integer sums (formula-pinned so
    the SQL oracle reproduces identical doubles)."""
    from .functions.text import zscore_by_group

    d = _t(spark, sf_dir, "documents")
    return zscore_by_group(d).orderBy("doc_id")


ORACLE_ZSCORE = """
WITH stats AS (
  SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS s,
         sum(n_chars::BIGINT * n_chars::BIGINT)::BIGINT AS ss
  FROM documents GROUP BY 1
)
SELECT d.doc_id, d.source, d.n_chars::BIGINT AS n_chars,
       CASE WHEN (ss - s*s/n)/n <= 0 THEN 0
            ELSE floor((d.n_chars - s/n) / sqrt((ss - s*s/n)/n) * 10000 + 0.5)::BIGINT
       END AS z_q
FROM documents d JOIN stats USING (source)
ORDER BY doc_id
"""

QUERIES["text_zscore_by_source"] = text_zscore_by_source
ORACLES["text_zscore_by_source"] = ORACLE_ZSCORE


def etl_dq_report(spark, sf_dir):
    """The DQ report as data (X5/quality surface): 5 checks over lineitem
    in ONE aggregation pass, statuses PASS/WARN/FAIL
    (src/quality_checks.py:171-196 semantics, A4 efficiency)."""
    li = _t(spark, sf_dir, "lineitem")
    row = li.agg(
        F.count(F.lit(1)).alias("m_rows"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias("m_nullkey"),
        (F.count(F.lit(1)) - F.count_distinct("l_orderkey", "l_linenumber")).alias("m_dups"),
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0)).alias("m_neg"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("m_badqty"),
    ).collect()[0]
    recs = [
        ("row_count", "Volume", "PASS" if row["m_rows"] >= 1 else "FAIL",
         int(row["m_rows"])),
        ("null_keys", "Completeness",
         "PASS" if row["m_nullkey"] == 0 else "FAIL", int(row["m_nullkey"])),
        ("duplicate_keys", "Uniqueness",
         "PASS" if row["m_dups"] == 0 else "FAIL", int(row["m_dups"])),
        ("negative_price", "BusinessRule",
         "PASS" if row["m_neg"] == 0 else "FAIL", int(row["m_neg"])),
        ("nonpositive_qty", "BusinessRule",
         "PASS" if row["m_badqty"] == 0 else "FAIL", int(row["m_badqty"])),
    ]
    return spark.createDataFrame(
        recs, "check string, category string, status string, metric long"
    ).orderBy("check")


ORACLE_DQ_REPORT = """
WITH m AS (
  SELECT count(*) AS m_rows,
         sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS m_nullkey,
         count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS m_dups,
         sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS m_neg,
         sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS m_badqty
  FROM lineitem
)
SELECT * FROM (
  SELECT 'row_count' AS "check", 'Volume' AS category,
         CASE WHEN m_rows >= 1 THEN 'PASS' ELSE 'FAIL' END AS status,
         m_rows::BIGINT AS metric FROM m
  UNION ALL
  SELECT 'null_keys', 'Completeness',
         CASE WHEN m_nullkey = 0 THEN 'PASS' ELSE 'FAIL' END,
         m_nullkey::BIGINT FROM m
  UNION ALL
  SELECT 'duplicate_keys', 'Uniqueness',
         CASE WHEN m_dups = 0 THEN 'PASS' ELSE 'FAIL' END,
         m_dups::BIGINT FROM m
  UNION ALL
  SELECT 'negative_price', 'BusinessRule',
         CASE WHEN m_neg = 0 THEN 'PASS' ELSE 'FAIL' END,
         m_neg::BIGINT FROM m
  UNION ALL
  SELECT 'nonpositive_qty', 'BusinessRule',
         CASE WHEN m_badqty = 0 THEN 'PASS' ELSE 'FAIL' END,
         m_badqty::BIGINT FROM m
) ORDER BY "check"
"""

QUERIES["etl_dq_report"] = etl_dq_report
ORACLES["etl_dq_report"] = ORACLE_DQ_REPORT


def json_extract_props(spark, sf_dir):
    """JSON functions (§2.9-absent in the reference): get_json_object /
    from_json over the events props column; k-value histogram."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .withColumn("k_bucket", (F.col("k") / 10).cast("int"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("k_bucket")
    )


ORACLE_JSON_PROPS = """
WITH j AS (
  SELECT json_extract_string(props, '$.k')::INT AS k FROM events
)
SELECT (k // 10)::INT AS k_bucket, count(*) AS n,
       min(k) AS k_min, max(k) AS k_max
FROM j GROUP BY 1 ORDER BY k_bucket
"""


def etl_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (§2.6-absent: percentile family):
    median/p95 of order totals per status, floor-quantized to cents
    (identical interpolation formula both engines)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.floor(F.expr("percentile(o_totalprice, 0.5)") * 100 + F.lit(0.5))
            .cast("long").alias("p50_cents"),
            F.floor(F.expr("percentile(o_totalprice, 0.95)") * 100 + F.lit(0.5))
            .cast("long").alias("p95_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


ORACLE_PERCENTILES = """
SELECT o_orderstatus,
       floor(quantile_cont(o_totalprice, 0.5) * 100 + 0.5)::BIGINT AS p50_cents,
       floor(quantile_cont(o_totalprice, 0.95) * 100 + 0.5)::BIGINT AS p95_cents,
       count(*) AS n
FROM orders GROUP BY 1 ORDER BY o_orderstatus
"""

QUERIES["json_extract_props"] = json_extract_props
ORACLES["json_extract_props"] = ORACLE_JSON_PROPS
QUERIES["etl_percentiles"] = etl_percentiles
ORACLES["etl_percentiles"] = ORACLE_PERCENTILES


def dedup_lsh_jaccard_verify(spark, sf_dir):
    """The dedup pipeline's SCALE shape: LSH banding proposes candidate
    pairs (bucket-local join, no all-pairs), exact word-set Jaccard
    verifies ONLY those pairs (shuffled equi-joins, nothing broadcast).
    This is the composition a 100 TB corpus runs; the all-pairs
    jaccard_nearest query remains as the small-table exactness check."""
    from .operators.dedup import jaccard_verify_candidates, lsh_candidate_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(d, k=8, bands=4)
    return jaccard_verify_candidates(d, pairs).orderBy("id_a", "id_b")


ORACLE_LSH_JACCARD_VERIFY = rf"""
WITH bands AS ({_BAND_SQL}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id
),
w AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS word
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n_words FROM w GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS inter
  FROM pairs p
  JOIN w wa ON wa.doc_id = p.id_a
  JOIN w wb ON wb.doc_id = p.id_b AND wb.word = wa.word
  GROUP BY 1, 2
)
SELECT p.id_a AS id_a, p.id_b AS id_b,
       coalesce(i.inter, 0)::BIGINT AS inter,
       (sa.n_words + sb.n_words - coalesce(i.inter, 0))::BIGINT AS uni
FROM pairs p
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN sizes sa ON sa.doc_id = p.id_a
JOIN sizes sb ON sb.doc_id = p.id_b
ORDER BY p.id_a, p.id_b
"""


def ann_recall_at_k(spark, sf_dir):
    """ANN quality as data: per query, how many of the brute-force top-5
    the LSH-bucketed and IVF-cell searches recover (hits/k as exact
    ints). Makes the baseline role of embed_cosine_topk explicit and the
    recall/cost trade of the two scale paths measurable in CI."""
    from .operators.similarity import ann_ivf_topk, ann_lsh_topk, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    truth = cosine_topk(e, q, k=5).select("query_id", "nn_id")
    lsh = ann_lsh_topk(e, q, k=5, planes=8, dim=64).select(
        "query_id", F.col("nn_id").alias("nn_id"), F.lit(1).alias("in_lsh")
    )
    ivf = ann_ivf_topk(e, q, cents, k=5).select(
        "query_id", F.col("nn_id").alias("nn_id"), F.lit(1).alias("in_ivf")
    )
    return (
        truth.join(lsh, ["query_id", "nn_id"], "left")
        .join(ivf, ["query_id", "nn_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.coalesce(F.col("in_lsh"), F.lit(0))).alias("hits_lsh"),
            F.sum(F.coalesce(F.col("in_ivf"), F.lit(0))).alias("hits_ivf"),
        )
        .orderBy("query_id")
    )


_ANN_RECALL_SCORE = (
    "(list_sum(list_transform(list_zip(c.qv, q.qv), p -> p[1] * p[2]))::BIGINT"
    " / sqrt(c.n2::DOUBLE * q.n2::DOUBLE))"
)

ORACLE_ANN_RECALL = f"""
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS n2
  FROM qz
),
truth AS (
  SELECT query_id, nn_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_ANN_RECALL_SCORE} DESC, c.vec_id ASC) AS rank
    FROM n c CROSS JOIN n q
    WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id
  ) WHERE rank <= 5
),
v AS (
  SELECT vec_id, i::INT AS i,
         floor(embedding[i::INT + 1]::DOUBLE * 10000 + 0.5)::BIGINT AS x
  FROM embeddings CROSS JOIN range(64) r(i)
),
wt AS (
  SELECT p::INT AS plane, i::INT AS i,
         CASE WHEN ('0x'||substr(md5(p::INT::VARCHAR || ':' || i::INT::VARCHAR),1,15))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS w
  FROM range(8) a(p) CROSS JOIN range(64) b(i)
),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << plane) ELSE 0 END)::BIGINT AS bucket
  FROM (SELECT vec_id, plane, sum(w * x) AS s
        FROM v JOIN wt USING (i) GROUP BY 1, 2)
  GROUP BY 1
),
lsh AS (
  SELECT query_id, nn_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_ANN_RECALL_SCORE} DESC, c.vec_id ASC) AS rank
    FROM (SELECT n.*, s.bucket FROM n JOIN sig s USING (vec_id)) c
    JOIN (SELECT n.*, s.bucket FROM n JOIN sig s USING (vec_id)
          WHERE n.vec_id % 50 = 0) q USING (bucket)
    WHERE c.vec_id <> q.vec_id
  ) WHERE rank <= 5
),
cents AS (SELECT vec_id AS centroid_id, qv AS cv, n2 AS cn2 FROM n
          WHERE vec_id % 25 = 0),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY (list_sum(list_transform(list_zip(a.qv, c.cv), p -> p[1]*p[2]))::BIGINT
                       / sqrt(a.n2::DOUBLE * c.cn2::DOUBLE)) DESC,
                      c.centroid_id ASC) AS rn
    FROM n a CROSS JOIN cents c
  ) WHERE rn = 1
),
ivf AS (
  SELECT query_id, nn_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_ANN_RECALL_SCORE} DESC, c.vec_id ASC) AS rank
    FROM (SELECT n.*, a.centroid_id FROM n JOIN assign a USING (vec_id)) c
    JOIN (SELECT n.*, a.centroid_id FROM n JOIN assign a USING (vec_id)
          WHERE n.vec_id % 50 = 0) q USING (centroid_id)
    WHERE c.vec_id <> q.vec_id
  ) WHERE rank <= 5
)
SELECT t.query_id AS query_id,
       count(*) AS k,
       sum(CASE WHEN l.nn_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS hits_lsh,
       sum(CASE WHEN i.nn_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS hits_ivf
FROM truth t
LEFT JOIN lsh l ON l.query_id = t.query_id AND l.nn_id = t.nn_id
LEFT JOIN ivf i ON i.query_id = t.query_id AND i.nn_id = t.nn_id
GROUP BY 1 ORDER BY t.query_id
"""

def ann_recall_multiprobe(spark, sf_dir):
    """Multi-probe ANN recall as data: per query, how many of the
    brute-force top-5 the MULTI-PROBE searches recover — LSH probing all
    buckets within Hamming distance 1 of the query's signature
    (operators/similarity.py:ann_lsh_topk hamming_radius=1) and IVF
    probing the 2 nearest centroid cells (ann_ivf_topk nprobe=2).
    Compare with ann_recall_at_k (radius 0 / nprobe 1) to read the
    recall/cost trade directly from CI data."""
    from .operators.similarity import ann_ivf_topk, ann_lsh_topk, cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    truth = cosine_topk(e, q, k=5).select("query_id", "nn_id")
    lsh = ann_lsh_topk(
        e, q, k=5, planes=8, dim=64, hamming_radius=1
    ).select("query_id", "nn_id", F.lit(1).alias("in_lsh"))
    ivf = ann_ivf_topk(e, q, cents, k=5, nprobe=2).select(
        "query_id", "nn_id", F.lit(1).alias("in_ivf")
    )
    return (
        truth.join(lsh, ["query_id", "nn_id"], "left")
        .join(ivf, ["query_id", "nn_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.coalesce(F.col("in_lsh"), F.lit(0))).alias("hits_lsh_r1"),
            F.sum(F.coalesce(F.col("in_ivf"), F.lit(0))).alias("hits_ivf_p2"),
        )
        .orderBy("query_id")
    )


ORACLE_ANN_MULTIPROBE = f"""
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS n2
  FROM qz
),
truth AS (
  SELECT query_id, nn_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_ANN_RECALL_SCORE} DESC, c.vec_id ASC) AS rank
    FROM n c CROSS JOIN n q
    WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id
  ) WHERE rank <= 5
),
v AS (
  SELECT vec_id, i::INT AS i,
         floor(embedding[i::INT + 1]::DOUBLE * 10000 + 0.5)::BIGINT AS x
  FROM embeddings CROSS JOIN range(64) r(i)
),
wt AS (
  SELECT p::INT AS plane, i::INT AS i,
         CASE WHEN ('0x'||substr(md5(p::INT::VARCHAR || ':' || i::INT::VARCHAR),1,15))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS w
  FROM range(8) a(p) CROSS JOIN range(64) b(i)
),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << plane) ELSE 0 END)::BIGINT AS bucket
  FROM (SELECT vec_id, plane, sum(w * x) AS s
        FROM v JOIN wt USING (i) GROUP BY 1, 2)
  GROUP BY 1
),
-- multi-probe radius 1: candidate buckets within Hamming distance 1
lsh AS (
  SELECT query_id, nn_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_ANN_RECALL_SCORE} DESC, c.vec_id ASC) AS rank
    FROM (SELECT n.*, s.bucket FROM n JOIN sig s USING (vec_id)) c
    JOIN (SELECT n.*, s.bucket FROM n JOIN sig s USING (vec_id)
          WHERE n.vec_id % 50 = 0) q
      ON bit_count(xor(c.bucket, q.bucket)) <= 1
    WHERE c.vec_id <> q.vec_id
  ) WHERE rank <= 5
),
cents AS (SELECT vec_id AS centroid_id, qv AS cv, n2 AS cn2 FROM n
          WHERE vec_id % 25 = 0),
assign_c AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY (list_sum(list_transform(list_zip(a.qv, c.cv), p -> p[1]*p[2]))::BIGINT
                       / sqrt(a.n2::DOUBLE * c.cn2::DOUBLE)) DESC,
                      c.centroid_id ASC) AS rn
    FROM n a CROSS JOIN cents c
  ) WHERE rn = 1
),
-- nprobe=2: queries search their TWO nearest cells
assign_q AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY (list_sum(list_transform(list_zip(a.qv, c.cv), p -> p[1]*p[2]))::BIGINT
                       / sqrt(a.n2::DOUBLE * c.cn2::DOUBLE)) DESC,
                      c.centroid_id ASC) AS rn
    FROM n a CROSS JOIN cents c
    WHERE a.vec_id % 50 = 0
  ) WHERE rn <= 2
),
ivf AS (
  SELECT query_id, nn_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {_ANN_RECALL_SCORE} DESC, c.vec_id ASC) AS rank
    FROM (SELECT n.*, a.centroid_id FROM n JOIN assign_c a USING (vec_id)) c
    JOIN (SELECT n.*, a.centroid_id FROM n JOIN assign_q a USING (vec_id)) q
      USING (centroid_id)
    WHERE c.vec_id <> q.vec_id
  ) WHERE rank <= 5
)
SELECT t.query_id AS query_id,
       count(*) AS k,
       sum(CASE WHEN l.nn_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS hits_lsh_r1,
       sum(CASE WHEN i.nn_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS hits_ivf_p2
FROM truth t
LEFT JOIN lsh l ON l.query_id = t.query_id AND l.nn_id = t.nn_id
LEFT JOIN ivf i ON i.query_id = t.query_id AND i.nn_id = t.nn_id
GROUP BY 1 ORDER BY t.query_id
"""


def embed_kmeans_refine(spark, sf_dir):
    """IVF centroid training (operators/similarity.py:kmeans_refine_q):
    2 Lloyd iterations from the vec_id%25 seed, centroids kept as
    un-normalized integer coordinate sums (cosine is scale-invariant,
    so the engine- and order-dependent float mean is never computed).
    Output = exact rows (centroid_id, i, s, n); the oracle replays both
    iterations in SQL with identical integer arithmetic."""
    from .operators.similarity import kmeans_refine_q

    e = _t(spark, sf_dir, "embeddings")
    seed = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return kmeans_refine_q(e, seed, iters=2)


_KM_SCORE0 = (
    "(list_sum(list_transform(list_zip(a.qv, c.cv), p -> p[1]*p[2]))::BIGINT"
    " / sqrt(a.n2::DOUBLE * c.cn2::DOUBLE))"
)

ORACLE_KMEANS_REFINE = f"""
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS n2
  FROM qz
),
v AS (
  SELECT vec_id, i::INT AS i, qv[i::INT + 1] AS x
  FROM qz CROSS JOIN range(64) r(i)
),
c0 AS (
  SELECT vec_id AS centroid_id, qv AS cv,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS cn2
  FROM qz WHERE vec_id % 25 = 0
),
a1 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT a.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY {_KM_SCORE0} DESC, c.centroid_id ASC) AS rn
    FROM n a CROSS JOIN c0 c
  ) WHERE rn = 1
),
s1 AS (
  SELECT a1.centroid_id, v.i, sum(v.x)::BIGINT AS s
  FROM a1 JOIN v USING (vec_id) GROUP BY 1, 2
),
c1n2 AS (
  SELECT centroid_id, sum(s * s)::BIGINT AS cn2 FROM s1 GROUP BY 1
),
a2 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT d.vec_id, d.centroid_id,
           row_number() OVER (PARTITION BY d.vec_id
             ORDER BY (d.dot / sqrt(d.n2::DOUBLE * d.cn2::DOUBLE)) DESC,
                      d.centroid_id ASC) AS rn
    FROM (
      SELECT v.vec_id, s1.centroid_id,
             sum(v.x * s1.s)::BIGINT AS dot,
             any_value(n.n2) AS n2, any_value(c1n2.cn2) AS cn2
      FROM v
      JOIN s1 USING (i)
      JOIN n ON n.vec_id = v.vec_id
      JOIN c1n2 ON c1n2.centroid_id = s1.centroid_id
      GROUP BY 1, 2
    ) d
  ) WHERE rn = 1
),
s2 AS (
  SELECT a2.centroid_id, v.i, sum(v.x)::BIGINT AS s
  FROM a2 JOIN v USING (vec_id) GROUP BY 1, 2
),
cnt AS (SELECT centroid_id, count(*)::BIGINT AS n FROM a2 GROUP BY 1)
SELECT s2.centroid_id, s2.i, s2.s, cnt.n
FROM s2 JOIN cnt USING (centroid_id)
ORDER BY s2.centroid_id, s2.i
"""


QUERIES.update({
    "dedup_lsh_jaccard_verify": dedup_lsh_jaccard_verify,
    "ann_recall_at_k": ann_recall_at_k,
    "ann_recall_multiprobe": ann_recall_multiprobe,
    "embed_kmeans_refine": embed_kmeans_refine,
})
ORACLES.update({
    "dedup_lsh_jaccard_verify": ORACLE_LSH_JACCARD_VERIFY,
    "ann_recall_at_k": ORACLE_ANN_RECALL,
    "ann_recall_multiprobe": ORACLE_ANN_MULTIPROBE,
    "embed_kmeans_refine": ORACLE_KMEANS_REFINE,
})


def dedup_cluster_assignment(spark, sf_dir):
    """End of the dedup pipeline: LSH candidates → exact-Jaccard verify
    (>= 0.9, exact int compare 10*inter >= 9*uni) → connected components
    → every doc labeled with its cluster's min doc id (singletons label
    themselves). Iterative min-label propagation on the Spark side; the
    oracle reproduces it with a recursive CTE fixpoint."""
    from .operators.dedup import (
        jaccard_verify_candidates,
        lsh_candidate_pairs,
        neardup_clusters,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(d, k=8, bands=4)
    verified = jaccard_verify_candidates(d, pairs)
    edges = verified.filter(
        10 * F.col("inter") >= 9 * F.col("uni")
    ).select("id_a", "id_b")
    return neardup_clusters(d.select("doc_id"), edges).orderBy("doc_id")


ORACLE_CLUSTER_ASSIGNMENT = rf"""
WITH RECURSIVE
verified AS (
  WITH bands AS ({_BAND_SQL}),
  pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b USING (band_id, band_hash)
    WHERE a.doc_id < b.doc_id
  ),
  w AS (
    SELECT doc_id,
           unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS word
    FROM documents
  ),
  sizes AS (SELECT doc_id, count(*) AS n_words FROM w GROUP BY 1),
  inter AS (
    SELECT p.id_a, p.id_b, count(*) AS inter
    FROM pairs p
    JOIN w wa ON wa.doc_id = p.id_a
    JOIN w wb ON wb.doc_id = p.id_b AND wb.word = wa.word
    GROUP BY 1, 2
  )
  SELECT p.id_a AS id_a, p.id_b AS id_b,
         coalesce(i.inter, 0)::BIGINT AS inter,
         (sa.n_words + sb.n_words - coalesce(i.inter, 0))::BIGINT AS uni
  FROM pairs p
  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
  JOIN sizes sa ON sa.doc_id = p.id_a
  JOIN sizes sb ON sb.doc_id = p.id_b
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM verified WHERE 10 * inter >= 9 * uni
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM verified WHERE 10 * inter >= 9 * uni
),
reach(id, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(root)::BIGINT AS cluster_id
FROM reach GROUP BY id ORDER BY doc_id
"""

QUERIES["dedup_cluster_assignment"] = dedup_cluster_assignment
ORACLES["dedup_cluster_assignment"] = ORACLE_CLUSTER_ASSIGNMENT


def dedup_cluster_assignment_star(spark, sf_dir):
    """Same pipeline and labeling as dedup_cluster_assignment, computed
    with the alternating large-star/small-star algorithm (Kiveris et
    al.) — O(log^2 n) rounds independent of component diameter, the
    10^10-node path. Checked against the SAME recursive-CTE fixpoint
    oracle, so both physical strategies are pinned to one semantics."""
    from .operators.dedup import (
        jaccard_verify_candidates,
        lsh_candidate_pairs,
        neardup_clusters_star,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(d, k=8, bands=4)
    verified = jaccard_verify_candidates(d, pairs)
    edges = verified.filter(
        10 * F.col("inter") >= 9 * F.col("uni")
    ).select("id_a", "id_b")
    return neardup_clusters_star(d.select("doc_id"), edges).orderBy("doc_id")


QUERIES["dedup_cluster_assignment_star"] = dedup_cluster_assignment_star
ORACLES["dedup_cluster_assignment_star"] = ORACLE_CLUSTER_ASSIGNMENT


def sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling for training-data mixing: each
    source gets its own keep-rate (domain re-weighting, the 'data
    mixture' step of a pretraining pipeline), decided by a portable
    md5-derived hash of the doc id — reproducible on any engine or
    cluster size, no RNG state. Output: per-source kept/total counts."""
    from .operators.dedup import md5int

    d = _t(spark, sf_dir, "documents")
    rates = {"src0": 100, "src1": 50, "src2": 25, "src3": 10}  # percent
    rate = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(r)) for s, r in rates.items()],
        F.lit(0),
    )
    keep = F.pmod(md5int(F.col("doc_id").cast("string")), F.lit(100)) < rate
    return (
        d.withColumn("keep", keep.cast("int"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_kept"),
        )
        .orderBy("source")
    )


ORACLE_SAMPLE_STRATIFIED = """
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 100
                     < CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                                   WHEN 'src2' THEN 25 WHEN 'src3' THEN 10
                                   ELSE 0 END
                THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM documents GROUP BY 1 ORDER BY source
"""


def quality_filter_pipeline(spark, sf_dir):
    """Composite document-quality filter (Gopher/CCNet-style rule stack
    over the text metrics already implemented): min/max length, mean
    word length band, max single-word repetition ratio. Returns each
    rule's kill count plus survivors — the funnel a curation pipeline
    reports. Exact integer metrics only (counts and 100x ratios)."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(words))
    n_chars = F.length(F.col("text"))
    # top word frequency: max count of any single word (repetition)
    distinct_words = F.array_distinct(words)
    top_freq = F.array_max(
        F.transform(
            distinct_words,
            lambda w: F.size(F.filter(words, lambda x: x == w)),
        )
    )
    m = d.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        top_freq.alias("top_freq"),
    ).withColumn(
        # mean word length x100, integer floor (portable)
        "mwl_100",
        F.when(F.col("n_words") == 0, F.lit(0)).otherwise(
            ((F.col("n_chars_m") - (F.col("n_words") - 1)) * 100
             / F.col("n_words")).cast("long")
        ),
    ).withColumn(
        # repetition ratio x100: share of tokens that are the single
        # most frequent word
        "rep_100",
        F.when(F.col("n_words") == 0, F.lit(0)).otherwise(
            (F.col("top_freq") * 100 / F.col("n_words")).cast("long")
        ),
    )
    r_len = (F.col("n_chars_m") >= 40) & (F.col("n_chars_m") <= 10000)
    r_mwl = (F.col("mwl_100") >= 250) & (F.col("mwl_100") <= 1200)
    r_rep = F.col("rep_100") <= 20
    return m.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((~r_len).cast("int")).alias("kill_len"),
        F.sum((~r_mwl).cast("int")).alias("kill_mwl"),
        F.sum((~r_rep).cast("int")).alias("kill_rep"),
        F.sum((r_len & r_mwl & r_rep).cast("int")).alias("survivors"),
    )


ORACLE_QUALITY_FILTER = r"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars_m,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE (SELECT max(c) FROM (
                     SELECT count(*) AS c
                     FROM unnest(regexp_split_to_array(trim(text), '\s+')) AS t(w)
                     GROUP BY w)) END AS top_freq
  FROM documents
),
x AS (
  SELECT doc_id, n_chars_m, n_words, top_freq,
         CASE WHEN n_words = 0 THEN 0
              ELSE ((n_chars_m - (n_words - 1)) * 100 // n_words) END AS mwl_100,
         CASE WHEN n_words = 0 THEN 0
              ELSE (top_freq * 100 // n_words) END AS rep_100
  FROM m
)
SELECT count(*) AS total,
       sum(CASE WHEN NOT (n_chars_m >= 40 AND n_chars_m <= 10000) THEN 1 ELSE 0 END)::BIGINT AS kill_len,
       sum(CASE WHEN NOT (mwl_100 >= 250 AND mwl_100 <= 1200) THEN 1 ELSE 0 END)::BIGINT AS kill_mwl,
       sum(CASE WHEN rep_100 > 20 THEN 1 ELSE 0 END)::BIGINT AS kill_rep,
       sum(CASE WHEN n_chars_m >= 40 AND n_chars_m <= 10000
                 AND mwl_100 >= 250 AND mwl_100 <= 1200
                 AND rep_100 <= 20 THEN 1 ELSE 0 END)::BIGINT AS survivors
FROM x
"""

QUERIES.update({
    "sample_stratified": sample_stratified,
    "quality_filter_pipeline": quality_filter_pipeline,
})
ORACLES.update({
    "sample_stratified": ORACLE_SAMPLE_STRATIFIED,
    "quality_filter_pipeline": ORACLE_QUALITY_FILTER,
})


def pack_sequences_2048(spark, sf_dir):
    """Sequence packing (GPT-style concatenate-and-chunk): each doc's
    exclusive prefix-sum offset in the doc_id-ordered token stream and
    its 2048-token window placement. Executes as a two-pass distributed
    prefix sum (operators/packing.py) — no single-task global window —
    while the oracle states the semantics as a plain window cumsum."""
    from .functions.text import ws_token_count
    from .operators.packing import pack_sequences

    d = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            ws_token_count(F.col("text")).cast("long").alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
    )
    return (
        pack_sequences(d, key="doc_id", weight="n_tok", context=2048)
        .withColumnRenamed("offset", "tok_offset")
        .orderBy("doc_id")
    )


ORACLE_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok
  FROM documents
),
f AS (SELECT doc_id, n_tok::BIGINT AS n_tok FROM t WHERE n_tok > 0),
o AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS tok_offset
  FROM f
)
SELECT doc_id, n_tok, tok_offset,
       (tok_offset // 2048)::BIGINT AS first_bin,
       ((tok_offset + n_tok - 1) // 2048)::BIGINT AS last_bin,
       ((tok_offset + n_tok - 1) // 2048 - tok_offset // 2048 + 1)::BIGINT
         AS spans
FROM o ORDER BY doc_id
"""

QUERIES["pack_sequences_2048"] = pack_sequences_2048
ORACLES["pack_sequences_2048"] = ORACLE_PACK_SEQUENCES


def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: flag corpus docs sharing any 5-word
    shingle with an eval set (docs with doc_id % 100 == 0 stand in for
    the benchmark). The shingle join is a shuffled equi-join on the
    md5-hashed shingle — no all-pairs product; at 100 TB the eval-set
    shingles are tiny and broadcast, here left to AQE. Output: per
    contaminated corpus doc, how many eval docs and distinct shingles it
    collides with."""
    from .operators.dedup import md5int

    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = 5
    sh = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: md5int(F.concat_ws(" ", F.slice(words, i + 1, n))),
    )
    # guard: Spark's sequence(0, negative) DESCENDS (DuckDB range() is
    # empty) — docs shorter than n words contribute no shingles
    sh = F.when(F.size(words) >= n, sh).otherwise(
        F.array().cast("array<long>")
    )
    shingled = d.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )
    evalset = shingled.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    corpus = shingled.filter(F.col("doc_id") % 100 != 0)
    return (
        corpus.join(evalset, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("eval_id").alias("n_eval_docs"),
            F.count_distinct("shingle").alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


ORACLE_DECONTAMINATE = r"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM (
    SELECT doc_id,
           list_transform(
             range(0, len(regexp_split_to_array(trim(text), '\s+')) - 4),
             i -> ('0x'||substr(md5(array_to_string(
                    regexp_split_to_array(trim(text), '\s+')[i+1:i+5],
                    ' ')),1,15))::BIGINT
           ) AS sh
    FROM documents
  )
),
ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 100 = 0),
corpus AS (SELECT * FROM sh WHERE doc_id % 100 <> 0)
SELECT c.doc_id AS doc_id,
       count(DISTINCT e.eval_id) AS n_eval_docs,
       count(DISTINCT c.shingle) AS n_shingles
FROM corpus c JOIN ev e USING (shingle)
GROUP BY 1 ORDER BY doc_id
"""

QUERIES["decontaminate_ngram_overlap"] = decontaminate_ngram_overlap
ORACLES["decontaminate_ngram_overlap"] = ORACLE_DECONTAMINATE


def asof_click_to_view(spark, sf_dir):
    """As-of join (operator Spark lacks; operators/asof.py): every click
    event enriched with the user's most recent view at-or-before it —
    union + window-carry, one shuffle, no range-join product. Oracle:
    DuckDB LATERAL top-1 subquery with identical (ts DESC, event_id
    DESC) tie-breaking."""
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.col("ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("view_cents"),
    )
    out = asof_join(
        clicks, views, on=["user_id"], ts="ts",
        payload=["view_id", "view_cents"], tiebreak="view_id",
    )
    return out.select(
        "event_id", "user_id", "ts_epoch", "asof_view_id", "asof_view_cents"
    ).orderBy("event_id")


ORACLE_ASOF = """
WITH clicks AS (
  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS ts_epoch, ts
  FROM events WHERE event_type = 'click'
),
views AS (
  SELECT event_id AS view_id, user_id, ts,
         round(value * 100, 0)::BIGINT AS view_cents
  FROM events WHERE event_type = 'view'
)
SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts_epoch AS ts_epoch,
       v.view_id AS asof_view_id, v.view_cents AS asof_view_cents
FROM clicks c LEFT JOIN LATERAL (
  SELECT view_id, view_cents
  FROM views v
  WHERE v.user_id = c.user_id AND v.ts <= c.ts
  ORDER BY v.ts DESC, v.view_id DESC LIMIT 1
) v ON true
ORDER BY event_id
"""

QUERIES["asof_click_to_view"] = asof_click_to_view
ORACLES["asof_click_to_view"] = ORACLE_ASOF


def range_join_views_1h(spark, sf_dir):
    """Range join (operators/rangejoin.py — time-bucket decomposition,
    no inequality-join product): per click, how many views the same user
    made in the preceding hour (inclusive) and their total cents."""
    from .operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_timestamp("ts").alias("vts_s"),
        F.round(F.col("value") * 100, 0).cast("long").alias("view_cents"),
    )
    j = range_join(
        clicks, views, on=["user_id"], left_ts="ts_s", right_ts="vts_s",
        window=3600, how="left",
    )
    return (
        j.groupBy("event_id", "user_id", "ts_s")
        .agg(
            F.count(F.col("view_cents")).alias("n_views_1h"),
            F.coalesce(F.sum("view_cents"), F.lit(0)).cast("long")
            .alias("cents_1h"),
        )
        .orderBy("event_id")
    )


ORACLE_RANGE_JOIN = """
WITH clicks AS (
  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS ts_s
  FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS vts_s,
         round(value * 100, 0)::BIGINT AS view_cents
  FROM events WHERE event_type = 'view'
)
SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts_s AS ts_s,
       count(v.view_cents) AS n_views_1h,
       coalesce(sum(v.view_cents), 0)::BIGINT AS cents_1h
FROM clicks c
LEFT JOIN views v
  ON v.user_id = c.user_id
 AND v.vts_s >= c.ts_s - 3600 AND v.vts_s <= c.ts_s
GROUP BY 1, 2, 3 ORDER BY event_id
"""

QUERIES["range_join_views_1h"] = range_join_views_1h
ORACLES["range_join_views_1h"] = ORACLE_RANGE_JOIN


def dedup_embedding_neardup_lsh(spark, sf_dir):
    """Embedding near-dup SCALE path (operators/similarity.py:
    embedding_neardup_lsh): hyperplane-bit banding proposes candidate
    pairs (8 bands × 2 bits over a 16-plane map-only signature), exact
    int cosine ≥ 0.35 verifies — same predicate as the all-pairs
    dedup_embedding_neardup baseline, O(collisions) instead of O(N²).
    Shuffled equi-joins only; no broadcast of the corpus (plan-asserted
    in tests/test_similarity.py)."""
    from .operators.similarity import embedding_neardup_lsh

    e = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_lsh(
        e, planes=16, dim=64, bands=8
    ).orderBy("id_a", "id_b")


ORACLE_EMBED_NEARDUP_LSH = """
WITH v AS (
  SELECT vec_id, i::INT AS i,
         floor(embedding[i::INT + 1]::DOUBLE * 10000 + 0.5)::BIGINT AS x
  FROM embeddings CROSS JOIN range(64) r(i)
),
wt AS (
  SELECT p::INT AS plane, i::INT AS i,
         CASE WHEN ('0x'||substr(md5(p::INT::VARCHAR || ':' || i::INT::VARCHAR),1,15))::BIGINT & 1 = 1
              THEN 1 ELSE -1 END AS w
  FROM range(16) a(p) CROSS JOIN range(64) b(i)
),
proj AS (
  SELECT vec_id, plane, sum(w * x) AS s
  FROM v JOIN wt USING (i) GROUP BY 1, 2
),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << plane) ELSE 0 END)::BIGINT AS bucket
  FROM proj GROUP BY 1
),
bands AS (
  SELECT vec_id, b::INT AS band, (bucket >> (b::INT * 2)) & 3 AS val
  FROM sig CROSS JOIN range(8) r(b)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
  WHERE a.vec_id < b.vec_id
),
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE*10000 + 0.5)::BIGINT) AS qv
  FROM embeddings
),
n AS (
  SELECT vec_id, qv,
         list_sum(list_transform(qv, x -> x * x))::BIGINT AS n2
  FROM q
),
scored AS (
  SELECT c.id_a, c.id_b,
         list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2]))::BIGINT AS dot,
         a.n2 AS n2a, b.n2 AS n2b
  FROM cand c
  JOIN n a ON a.vec_id = c.id_a
  JOIN n b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, dot
FROM scored
WHERE dot > 0 AND 400 * dot * dot >= 49 * n2a * n2b
ORDER BY id_a, id_b
"""

QUERIES["dedup_embedding_neardup_lsh"] = dedup_embedding_neardup_lsh
ORACLES["dedup_embedding_neardup_lsh"] = ORACLE_EMBED_NEARDUP_LSH


def wal_datasource_scan(spark, sf_dir):
    """The custom Python DataSource WAL reader
    (sources/wal_datasource.py) driven through the public
    ``spark.read.format("wal")`` surface with BOTH pushdowns live:
    ``epoch > 1`` is consumed by the source (whole segment directories
    never listed), ``lsn > wm`` prunes parquet row groups via footer
    stats. Reads the same deterministic 4-epoch WAL the table-format
    fixture lays down from the events table; the oracle re-derives the
    envelopes and both predicates in SQL."""
    from .sources.wal_datasource import WalDataSource

    _enable_python_pushdown(spark)
    fx = _table_fixture(spark, sf_dir)
    spark.dataSource.register(WalDataSource)
    seg = fx["seg"]
    wm = 2 * seg + seg // 2  # mid-epoch-2 watermark
    df = (
        spark.read.format("wal")
        .option("root", fx["wal_root"])
        .load()
        .filter((F.col("epoch") > 1) & (F.col("lsn") > wm))
    )
    return df.select(
        "lsn", "epoch", "op", "doc_id",
        F.element_at("tokens", 1).alias("tok0"),
        "source",
    ).orderBy("lsn")


ORACLE_WAL_SCAN = f"""
WITH env AS ({_TF_ENV_SQL}),
seg AS (SELECT (max(lsn) + 4) // 4 AS s FROM env),
wal AS (
  SELECT lsn, (lsn // (SELECT s FROM seg))::INT AS epoch, op, doc_id,
         CASE WHEN op = 'D' THEN NULL
              ELSE (lsn % 50257)::INT END AS tok0,
         CASE WHEN op = 'D' THEN NULL ELSE source END AS source
  FROM env
)
SELECT lsn, epoch, op, doc_id, tok0, source
FROM wal
WHERE epoch > 1 AND lsn > (SELECT 2 * s + s // 2 FROM seg)
ORDER BY lsn
"""

QUERIES["wal_datasource_scan"] = wal_datasource_scan
ORACLES["wal_datasource_scan"] = ORACLE_WAL_SCAN


_SERVING_FIXTURE: dict = {}


def serving_sink_roundtrip(spark, sf_dir):
    """The serving sink + scan (sources/serving_sink.py — the
    reference's JDBC load path, src/load.py:46-92) exercised through the
    public DataFrame writer/reader: a curated per-customer aggregate is
    written to the serving database via the Arrow-batched transactional
    writer, then read BACK through ``spark.read.format("serving")`` with
    a WHERE that pushes down into the database-side SQL. The oracle
    computes the same aggregate + filter straight from orders — any
    write-path row loss, type drift, or pushdown corruption mismatches."""
    import tempfile

    from .sources.serving_sink import ServingSinkDataSource

    _enable_python_pushdown(spark)
    spark.dataSource.register(ServingSinkDataSource)
    key = os.path.abspath(sf_dir)
    if key not in _SERVING_FIXTURE:
        o = _t(spark, sf_dir, "orders")
        curated = (
            o.groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("long")
                ).alias("total_cents"),
            )
        )
        db = os.path.join(
            tempfile.mkdtemp(prefix="serving_fx_"), "serve.duckdb"
        )
        (
            curated.write.format("serving")
            .option("path", db).option("table", "curated")
            .option("batchsize", "5000")
            .mode("overwrite").save()
        )
        _SERVING_FIXTURE[key] = db
    db = _SERVING_FIXTURE[key]
    back = (
        spark.read.format("serving")
        .option("path", db).option("table", "curated")
        .load()
        .filter(F.col("total_cents") > 50_000_000)  # DB-side WHERE
    )
    return back.select("custkey", "n_orders", "total_cents").orderBy(
        "custkey"
    )


ORACLE_SERVING_ROUNDTRIP = """
SELECT o_custkey AS custkey,
       count(*)::BIGINT AS n_orders,
       sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT AS total_cents
FROM orders
GROUP BY 1
HAVING sum(round(o_totalprice * 100, 0)::BIGINT)::BIGINT > 50000000
ORDER BY custkey
"""

QUERIES["serving_sink_roundtrip"] = serving_sink_roundtrip
ORACLES["serving_sink_roundtrip"] = ORACLE_SERVING_ROUNDTRIP


_STREAM_FIXTURE: dict = {}


def streaming_stateful_compact(spark, sf_dir):
    """ST3 made oracle-checkable: the applyInPandasWithState change
    compactor (streaming/stateful.py — per-key cross-batch LWW state,
    emits only when state advances) run over the fixture WAL as a REAL
    bounded file stream (Trigger.AvailableNow, 2 files per microbatch,
    memory sink). Per-batch emissions depend on batching, but the
    per-key FINAL state does not — aggregating the update feed to each
    key's max-lsn row is batching-invariant and equals the batch LWW,
    which is exactly what the SQL oracle computes. Green parity = the
    streaming stateful operator implements the same semantics as the
    batch engine."""
    from pyspark.sql import types as T

    from .streaming.stateful import compact_change_stream

    fx = _table_fixture(spark, sf_dir)
    # memory-sink views are SESSION-scoped, so the cache key carries the
    # session too: keying by sf_dir alone would make ALTERNATING sessions
    # (oracle suite vs the default-conf parity harness) evict each
    # other's entry and re-run the full stream on every switch. The
    # tableExists check stays as the correctness guard (id() reuse after
    # a session is GC'd just costs one rebuild).
    key = (id(spark), os.path.abspath(sf_dir))
    cached = _STREAM_FIXTURE.get(key)
    if cached is None or not spark.catalog.tableExists(cached):
        sink = f"stateful_feed_{uuid.uuid4().hex[:12]}"
        schema = T.StructType([
            T.StructField("lsn", T.LongType()),
            T.StructField("epoch", T.IntegerType()),
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ])
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(os.path.join(fx["wal_root"], "epoch-*"))
        )
        q = (
            compact_change_stream(stream)
            .writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _STREAM_FIXTURE[key] = sink
    feed = spark.table(_STREAM_FIXTURE[key])
    return (
        feed.groupBy("doc_id")
        .agg(
            F.max("lsn").alias("lsn"),
            F.max_by("op", "lsn").alias("op"),
            F.max_by("n_tok", "lsn").alias("n_tok"),
        )
        .orderBy("doc_id")
    )


ORACLE_STREAM_STATEFUL = f"""
WITH env AS ({_TF_ENV_SQL}),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM env
)
SELECT doc_id, lsn, op,
       CASE WHEN op = 'D' THEN NULL ELSE (1 + lsn % 3)::INT END AS n_tok
FROM r WHERE rn = 1 ORDER BY doc_id
"""

QUERIES["streaming_stateful_compact"] = streaming_stateful_compact
ORACLES["streaming_stateful_compact"] = ORACLE_STREAM_STATEFUL


_CSV_FIXTURE: dict = {}


def csv_scan_agg(spark, sf_dir):
    """S1 CSV scan made oracle-checkable (sources/readers.py:22 —
    reference src/extract.py:40-69 semantics): the events table is
    exported to CSV once per process, ONE malformed line is injected by
    hand, and the files are re-read with a pinned schema in
    DROPMALFORMED mode, then aggregated. The oracle computes the same
    aggregate from the parquet events table — equality proves the CSV
    round-trip is lossless (values pre-quantized to integer cents) AND
    the malformed row was dropped, not silently nulled in."""
    import glob as _glob
    import tempfile

    from pyspark.sql import types as T

    from .sources.readers import read_csv

    key = os.path.abspath(sf_dir)
    if key not in _CSV_FIXTURE:
        d = tempfile.mkdtemp(prefix="csv_fx_")
        path = os.path.join(d, "events_csv")
        ev = _t(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        (ev.coalesce(2).write.mode("overwrite")
         .option("header", "true").csv(path))
        part = sorted(_glob.glob(os.path.join(path, "part-*.csv")))[0]
        with open(part, "a") as f:
            f.write("oops,phantom_type,not_a_number\n")
        # the append invalidates Hadoop's sidecar checksum — drop it or
        # the re-read fails with ChecksumException instead of parsing
        crc = os.path.join(
            os.path.dirname(part), f".{os.path.basename(part)}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        _CSV_FIXTURE[key] = path
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("cents", T.LongType()),
    ])
    df = read_csv(spark, _CSV_FIXTURE[key], schema, mode="DROPMALFORMED")
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("event_type")
    )


ORACLE_CSV_SCAN = """
SELECT event_type, count(*)::BIGINT AS n,
       sum(round(value * 100, 0)::BIGINT)::BIGINT AS total_cents
FROM events GROUP BY 1 ORDER BY event_type
"""

QUERIES["csv_scan_agg"] = csv_scan_agg
ORACLES["csv_scan_agg"] = ORACLE_CSV_SCAN


_WINDOWED_STREAM_FIXTURE: dict = {}


def streaming_windowed_rates(spark, sf_dir):
    """ST2 made oracle-checkable: the Structured Streaming front-end's
    watermarked tumbling-window aggregation
    (streaming/structured.py:windowed_change_rates) driven over the
    fixture WAL as a REAL bounded file stream (readStream → watermark →
    window → memory sink, append mode, Trigger.AvailableNow, 3 files
    per microbatch — the streaming_stateful_compact pattern).

    Determinism under arbitrary file batching:
    - the watermark delay is seg + 60 s, strictly wider than one epoch's
      event-time span, so no envelope can ever arrive below the current
      watermark (epoch directories stream in commit order; only files
      WITHIN one epoch are unordered) — zero late drops, any batching;
    - append mode only emits a window once the watermark passes its end,
      and Spark's final no-data microbatch flushes state up to
      final_wm = max_ts - delay. Whether the boundary rule is < or <=,
      every window ending <= final_wm - 1 is emitted — so BOTH sides
      filter to window_end <= max_lsn - delay - 1 and the emitted set
      is exact, not batching- or boundary-dependent.
    Green parity = the streaming windowed aggregate equals the same
    event-time windows computed in batch SQL."""
    from .streaming.structured import stream_wal, windowed_change_rates

    fx = _table_fixture(spark, sf_dir)
    # session-qualified cache key — see streaming_stateful_compact
    key = (id(spark), os.path.abspath(sf_dir))
    delay = fx["seg"] + 60
    cached = _WINDOWED_STREAM_FIXTURE.get(key)
    if cached is None or not spark.catalog.tableExists(cached):
        sink = f"windowed_rates_{uuid.uuid4().hex[:12]}"
        stream = stream_wal(
            spark,
            os.path.join(fx["wal_root"], "epoch-*"),
            max_files_per_trigger=3,
        )
        q = (
            windowed_change_rates(
                stream, window="120 seconds",
                watermark=f"{delay} seconds",
            )
            .writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _WINDOWED_STREAM_FIXTURE[key] = sink
    feed = spark.table(_WINDOWED_STREAM_FIXTURE[key])
    cutoff = (fx["n"] - 1) - delay - 1  # max_lsn - delay - 1
    return (
        feed.select(
            F.unix_timestamp("window_start").alias("window_start_s"),
            "op", "n", "lsn_min", "lsn_max",
        )
        .filter(F.col("window_start_s") + 120 <= F.lit(cutoff))
        .orderBy("window_start_s", "op")
    )


ORACLE_STREAM_WINDOWED = f"""
WITH env AS ({_TF_ENV_SQL}),
m AS (SELECT max(lsn) AS mx, (max(lsn) + 4) // 4 AS s FROM env),
agg AS (
  SELECT (lsn // 120) * 120 AS ws, op, count(*)::BIGINT AS n,
         min(lsn)::BIGINT AS lsn_min, max(lsn)::BIGINT AS lsn_max
  FROM env GROUP BY 1, 2
)
SELECT ws::BIGINT AS window_start_s, op, n, lsn_min, lsn_max
FROM agg
WHERE ws + 120 <= (SELECT mx - (s + 60) - 1 FROM m)
ORDER BY window_start_s, op
"""

QUERIES["streaming_windowed_rates"] = streaming_windowed_rates
ORACLES["streaming_windowed_rates"] = ORACLE_STREAM_WINDOWED


_REBUCKET_FIXTURE: dict = {}


def table_rebucket_replay(spark, sf_dir):
    """Bucket-count evolution under the DuckDB gate
    (tables/maintenance.py:rebucket): replay the fixture WAL's first two
    epochs into a 4-bucket table, rebucket it to 8 buckets MID-STREAM
    (atomic layout-swap snapshot; per-bucket watermarks conservatively
    reset, (epoch,bucket) fences dropped), then replay the remaining
    epochs against the new layout and read back the final state. The
    oracle is the layout-independent full-replay LWW state — equality
    proves the rebucket preserved every row, the conservative watermark
    reset re-applied idempotently, and post-rebucket ingest routed to
    the new buckets correctly."""
    import tempfile

    from .sources.wal import WalSource
    from .streaming.bootstrap import bootstrap_table
    from .streaming.microbatch import CdcEngine
    from .tables.format import TableSchema
    from .tables.maintenance import rebucket

    key = os.path.abspath(sf_dir)
    if key not in _REBUCKET_FIXTURE:
        fx = _table_fixture(spark, sf_dir)  # reuse its deterministic WAL
        root = tempfile.mkdtemp(prefix="rebucket_fx_")
        schema = TableSchema(
            fields=[
                ("doc_id", "string", False),
                ("tokens", "array<int>", True),
                ("n_tok", "int", True),
                ("source", "string", True),
            ]
        )
        empty = spark.createDataFrame([], schema.to_struct())
        table = bootstrap_table(
            os.path.join(root, "table"), empty, num_buckets=4
        )
        engine = CdcEngine(
            spark, table, WalSource(fx["wal_root"]),
            os.path.join(root, "ckpt"),
        )
        engine.run(max_epochs=2)   # epochs 0-1 on the 4-bucket layout
        rebucket(table, spark, 8)  # atomic mid-stream layout change
        engine.run()               # epochs 2-3 on the 8-bucket layout
        _REBUCKET_FIXTURE[key] = table
    final = _REBUCKET_FIXTURE[key].read(spark)
    return final.select(
        "doc_id",
        "n_tok",
        F.element_at("tokens", 1).alias("tok0"),
        "source",
    ).orderBy("doc_id")


ORACLE_REBUCKET_REPLAY = f"""
WITH {_TF_STATES_SQL}
SELECT doc_id, n_tok, tok0, source FROM s2 ORDER BY doc_id
"""

QUERIES["table_rebucket_replay"] = table_rebucket_replay
ORACLES["table_rebucket_replay"] = ORACLE_REBUCKET_REPLAY


_KEY_RANGE_LO, _KEY_RANGE_HI = "u000000010", "u000000099"


def table_key_range_scan(spark, sf_dir):
    """Key-range scan (tables/format.py:read(key_range=...)): the
    range-scan analog of the point lookup — per-file manifest
    [min_key, max_key] stats prune files whose range provably misses the
    inclusive [lo, hi] window before the scan is planned, and under
    merge-on-read the pruned delta files never enter the LWW union
    (Iceberg manifest range-filtering shape). Runs against the shared
    replayed lake-table fixture, deltas pending. Oracle: plain BETWEEN
    over the layout-independent final replay state."""
    fx = _table_fixture(spark, sf_dir)
    rows = fx["table"].read(
        spark, key_range=(_KEY_RANGE_LO, _KEY_RANGE_HI)
    )
    return rows.select(
        "doc_id",
        "n_tok",
        F.element_at("tokens", 1).alias("tok0"),
        "source",
    ).orderBy("doc_id")


ORACLE_KEY_RANGE_SCAN = f"""
WITH {_TF_STATES_SQL}
SELECT doc_id, n_tok, tok0, source
FROM s2
WHERE doc_id BETWEEN '{_KEY_RANGE_LO}' AND '{_KEY_RANGE_HI}'
ORDER BY doc_id
"""

QUERIES["table_key_range_scan"] = table_key_range_scan
ORACLES["table_key_range_scan"] = ORACLE_KEY_RANGE_SCAN


def table_time_travel(spark, sf_dir):
    """Time travel (tables/format.py:snapshot_at + read(snapshot=...)):
    read the table AS OF the mid-stream committed version v1 — the
    Delta ``VERSION AS OF`` / Iceberg ``snapshot-id`` surface. Old
    snapshots stay readable because compaction/ingest only dereference
    files, never delete them (until expire+GC). Oracle: the replay
    truncated to the epochs committed at v1 (lsn < cut), layout- and
    history-independent — a read that leaked post-v1 rows, lost
    pre-compaction files, or resolved LWW against the wrong snapshot's
    delta set hash-mismatches."""
    fx = _table_fixture(spark, sf_dir)
    table = fx["table"]
    asof = table.read(spark, snapshot=table.snapshot_at(fx["v1"]))
    return asof.select(
        "doc_id",
        "n_tok",
        F.element_at("tokens", 1).alias("tok0"),
        "source",
    ).orderBy("doc_id")


ORACLE_TIME_TRAVEL = f"""
WITH {_TF_STATES_SQL}
SELECT doc_id, n_tok, tok0, source
FROM s1
ORDER BY doc_id
"""

QUERIES["table_time_travel"] = table_time_travel
ORACLES["table_time_travel"] = ORACLE_TIME_TRAVEL


_BLOOM_FIXTURE: dict = {}
# present-candidate keys + absent keys that SORT inside the live range —
# min/max stats cannot prune the absent ones; only the per-file Bloom
# filters can (and a false negative on a present key would drop its row
# and hash-mismatch)
_BLOOM_LOOKUP_KEYS = [f"u{i:09d}" for i in range(15)] + [
    f"u{i:09d}x" for i in range(10)
]


def _mor_fixture(spark, sf_dir):
    """Replay the fixture WAL into a merge-on-read table ONCE per process
    per sf_dir (deferred compaction, per-delta bloom sidecars) — shared
    by the bloom-lookup and changelog-stream queries: its pending delta
    files are both the bloom-pruning target and the lakefeed source's
    changelog content."""
    import tempfile

    from .sources.wal import WalSource
    from .streaming.bootstrap import bootstrap_table
    from .streaming.microbatch import CdcEngine
    from .tables.format import TableSchema

    key = os.path.abspath(sf_dir)
    if key not in _BLOOM_FIXTURE:
        fx = _table_fixture(spark, sf_dir)  # reuse its deterministic WAL
        root = tempfile.mkdtemp(prefix="bloom_fx_")
        schema = TableSchema(
            fields=[
                ("doc_id", "string", False),
                ("tokens", "array<int>", True),
                ("n_tok", "int", True),
                ("source", "string", True),
            ]
        )
        empty = spark.createDataFrame([], schema.to_struct())
        table = bootstrap_table(
            os.path.join(root, "table"), empty, num_buckets=8
        )
        engine = CdcEngine(
            spark, table, WalSource(fx["wal_root"]),
            os.path.join(root, "ckpt"),
            merge_mode="mor", mor_compact_files=None, delta_blooms=True,
        )
        engine.run()
        _BLOOM_FIXTURE[key] = table
    return _BLOOM_FIXTURE[key]


def table_bloom_lookup(spark, sf_dir):
    """Point lookup through per-file key Bloom filters (tables/bloom.py):
    replay the fixture WAL into a merge-on-read table with DEFERRED
    compaction and ``delta_blooms=True``, so every pending delta file
    carries a content-addressed bloom sidecar, then look up a key set of
    present + in-range-but-absent keys. The read path prunes delta files
    whose filter proves the key absent BEFORE the LWW union is planned;
    the probe hashes come from the pure-Python XXH64 that must equal
    Spark's xxhash64 bit-for-bit. Oracle: plain WHERE doc_id IN (...)
    over the layout-independent full-replay state — a false negative
    anywhere in the hash/bit contract drops a live row and
    hash-mismatches."""
    rows = _mor_fixture(spark, sf_dir).lookup(spark, _BLOOM_LOOKUP_KEYS)
    return rows.select(
        "doc_id",
        "n_tok",
        F.element_at("tokens", 1).alias("tok0"),
        "source",
    ).orderBy("doc_id")


ORACLE_BLOOM_LOOKUP = f"""
WITH {_TF_STATES_SQL}
SELECT doc_id, n_tok, tok0, source
FROM s2
WHERE doc_id IN ({", ".join(repr(k) for k in _BLOOM_LOOKUP_KEYS)})
ORDER BY doc_id
"""

QUERIES["table_bloom_lookup"] = table_bloom_lookup
ORACLES["table_bloom_lookup"] = ORACLE_BLOOM_LOOKUP


_EVO_FIXTURE: dict = {}


def table_schema_evolution(spark, sf_dir):
    """Mid-stream schema evolution under the DuckDB gate — the north
    rule's metadata-only-DDL pillar driver-checked end-to-end: epochs
    0-1 carry the original envelope shape; from epoch 2 the envelopes
    ADD a payload column (``rank:int``) and WIDEN ``n_tok`` to bigint.
    The engine reacts per its envelope-shape rule
    (streaming/microbatch.py step 3): additive column + type widening
    as metadata-only snapshot DDL, no file rewrite — old files
    reconcile at read time (missing column → typed NULL, int32 n_tok →
    upcast). Final state: rows last written before the evolution read
    rank=NULL; rows won by an evolved envelope carry rank=lsn%7. The
    oracle derives exactly that from the replay, with n_tok::BIGINT —
    so a wrong widening path fails the SCHEMA match and a wrong
    NULL-backfill fails the value hash."""
    import tempfile

    from .sources.wal import WalSource
    from .streaming.bootstrap import bootstrap_table
    from .streaming.microbatch import CdcEngine
    from .tables.format import TableSchema

    key = os.path.abspath(sf_dir)
    if key not in _EVO_FIXTURE:
        env = _events_as_envelopes(spark, sf_dir)
        mx = _footer_max_long(sf_dir, "events", "event_id")
        if mx is None:  # stats missing: fall back to the distributed agg
            mx = env.agg(F.max("lsn")).collect()[0][0]
        n = mx + 1
        seg = max(1, (n + 3) // 4)
        # Block keys (doc_id = lsn // Q): each key receives Q consecutive
        # writes then NEVER again — so keys whose block ends before the
        # evolution cut keep their LAST pre-evolution row and must read
        # rank=NULL from old files (the metadata-only backfill), while
        # later blocks' winners carry the new column. Dense per-user keys
        # would make the NULL branch vacuous (every user's max lsn lands
        # in the final epoch).
        q = max(1, seg // 8)
        t0 = F.pmod(F.col("lsn"), F.lit(50257)).cast("int")
        toks = F.slice(
            F.array(t0, t0 + F.lit(1), t0 + F.lit(2)),
            F.lit(1),
            (F.lit(1) + F.pmod(F.col("lsn"), F.lit(3))).cast("int"),
        )
        base_cols = [
            F.col("lsn"),
            (F.col("lsn") / seg).cast("int").alias("epoch"),
            F.col("op"),
            F.format_string(
                "u%09d", (F.col("lsn") / q).cast("int")
            ).alias("doc_id"),
            F.when(F.col("op") == "D", F.lit(None)).otherwise(toks)
            .alias("tokens"),
            F.when(F.col("op") == "D", F.lit(None))
            .otherwise(F.col("event_type")).alias("source"),
            F.timestamp_seconds(F.col("lsn")).alias("ts"),
        ]
        envelopes = env.select(*base_cols)
        root = tempfile.mkdtemp(prefix="evo_fixture_")
        wal_root = os.path.join(root, "wal")
        for e in range(4):
            part = envelopes.filter(F.col("epoch") == e)
            if e < 2:  # original shape: n_tok:int, no rank
                part = part.withColumn(
                    "n_tok", F.lit(None).cast("int")
                )
            else:      # evolved shape: n_tok widened, rank added
                part = part.withColumn(
                    "n_tok", F.lit(None).cast("bigint")
                ).withColumn(
                    "rank",
                    F.when(F.col("op") == "D", F.lit(None)).otherwise(
                        F.pmod(F.col("lsn"), F.lit(7))
                    ).cast("int"),
                )
            part.write.mode("overwrite").parquet(
                os.path.join(wal_root, f"epoch-{e:05d}")
            )
        schema = TableSchema(
            fields=[
                ("doc_id", "string", False),
                ("tokens", "array<int>", True),
                ("n_tok", "int", True),
                ("source", "string", True),
            ]
        )
        empty = spark.createDataFrame([], schema.to_struct())
        table = bootstrap_table(
            os.path.join(root, "table"), empty, num_buckets=8
        )
        CdcEngine(
            spark, table, WalSource(wal_root), os.path.join(root, "ckpt")
        ).run()
        _EVO_FIXTURE[key] = table
    final = _EVO_FIXTURE[key].read(spark)
    return final.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.element_at("tokens", 1).alias("tok0"),
        "source",
        "rank",
    ).orderBy("doc_id")


ORACLE_SCHEMA_EVOLUTION = f"""
WITH env0 AS ({_TF_ENV_SQL}),
seg AS (SELECT (max(lsn) + 4) // 4 AS s FROM env0),
env AS (
  SELECT lsn, op,
         printf('u%09d', lsn // greatest(1, (SELECT s FROM seg) // 8))
           AS doc_id,
         source
  FROM env0
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM env
)
SELECT doc_id, (1 + lsn % 3)::BIGINT AS n_tok,
       (lsn % 50257)::INT AS tok0, source,
       CASE WHEN lsn >= 2 * (SELECT s FROM seg)
            THEN (lsn % 7)::INT END AS rank
FROM r2 WHERE rn = 1 AND op <> 'D' ORDER BY doc_id
"""

QUERIES["table_schema_evolution"] = table_schema_evolution
ORACLES["table_schema_evolution"] = ORACLE_SCHEMA_EVOLUTION


_FEED_STREAM_FIXTURE: dict = {}


def streaming_table_feed(spark, sf_dir):
    """The table's committed changelog as a Structured Streaming SOURCE
    (sources/feed_datasource.py — the Delta ``readStream.format("delta")``
    / CDF surface for this format): subscribe to the merge-on-read
    fixture table via ``spark.readStream.format("lakefeed")`` with
    version-number offsets, Trigger.AvailableNow, memory sink. Each MOR
    commit's delta files ARE its changelog — the stream emits the
    per-(epoch, key) LWW winner rows with their op, lsn, and publishing
    snapshot version; fold/rebucket/metadata commits emit nothing. The
    oracle re-derives exactly that in SQL: per-epoch row_number windows
    over the envelope stream, plus the version mapping (bootstrap = v1,
    the e-th non-empty epoch commits v = e + 2 via dense_rank). A
    dropped file partition, a double-emitted microbatch, a fold
    misclassified as data, or a wrong version stamp all hash-mismatch."""
    from .sources.feed_datasource import LakeFeedDataSource

    table = _mor_fixture(spark, sf_dir)
    spark.dataSource.register(LakeFeedDataSource)
    # session-qualified cache key — see streaming_stateful_compact
    key = (id(spark), os.path.abspath(sf_dir))
    cached = _FEED_STREAM_FIXTURE.get(key)
    if cached is None or not spark.catalog.tableExists(cached):
        sink = f"table_feed_{uuid.uuid4().hex[:12]}"
        q = (
            spark.readStream.format("lakefeed")
            .option("root", table.root)
            .option("startingVersion", 0).load()
            .writeStream.format("memory").queryName(sink)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        _FEED_STREAM_FIXTURE[key] = sink
    feed = spark.table(_FEED_STREAM_FIXTURE[key])
    return (
        feed.select(
            "doc_id",
            F.col("_change_op").alias("op"),
            F.col("_lsn").alias("lsn"),
            F.col("_commit_version").alias("commit_version"),
            "n_tok",
            F.element_at("tokens", 1).alias("tok0"),
            "source",
        )
        .orderBy("doc_id", "lsn")
    )


ORACLE_TABLE_FEED = f"""
WITH env AS ({_TF_ENV_SQL}),
seg AS (SELECT (max(lsn) + 4) // 4 AS s FROM env),
r AS (
  SELECT *, lsn // (SELECT s FROM seg) AS ep,
         row_number() OVER (
           PARTITION BY lsn // (SELECT s FROM seg), doc_id
           ORDER BY lsn DESC) AS rn
  FROM env
),
w AS (
  SELECT *, (1 + dense_rank() OVER (ORDER BY ep))::BIGINT AS commit_version
  FROM r WHERE rn = 1
)
SELECT doc_id, op, lsn, commit_version,
       CASE WHEN op = 'D' THEN NULL ELSE (1 + lsn % 3)::INT END AS n_tok,
       CASE WHEN op = 'D' THEN NULL ELSE (lsn % 50257)::INT END AS tok0,
       CASE WHEN op = 'D' THEN NULL ELSE source END AS source
FROM w ORDER BY doc_id, lsn
"""

QUERIES["streaming_table_feed"] = streaming_table_feed
ORACLES["streaming_table_feed"] = ORACLE_TABLE_FEED


def table_wap_publish(spark, sf_dir):
    """Write-audit-publish under the DuckDB gate
    (tables/maintenance.py:publish): audit snapshot v1 of the fixture
    table (file existence + a DQ predicate over everything being
    published + the pinned invariant read-back) and fast-forward the
    serving ref to it, read the SERVED state, then publish the head —
    the second audit runs the predicate over changes_between(v1, head),
    the O(changes) shape — and read again. Both reads go through the
    ref (snapshot_at("wap_gate")), so the oracle checks the ceremony
    end-to-end: a publish that moved the ref without passing audit, or
    served anything but the exact audited snapshot, hash-mismatches
    against the two replay states."""
    from .tables.maintenance import publish

    fx = _table_fixture(spark, sf_dir)
    table = fx["table"]

    def _served(phase):
        snap = table.snapshot_at("wap_gate")
        return table.read(spark, snapshot=snap).select(
            F.lit(phase).alias("phase"),
            "doc_id",
            "n_tok",
            F.element_at("tokens", 1).alias("tok0"),
            "source",
        )

    # allow_rollback: the shared fixture's ref survives across parity
    # runs in one process — re-publishing v1 after the head was
    # published is exactly the explicit-rollback surface
    r1 = publish(
        table, spark, ref="wap_gate", version=fx["v1"],
        audit_predicate="doc_id IS NOT NULL", allow_rollback=True,
    )
    served_v1 = _served("audited_v1")
    r2 = publish(
        table, spark, ref="wap_gate",
        audit_predicate="doc_id IS NOT NULL",
    )
    if not (r1["ok"] and r1["published"] and r2["ok"] and r2["published"]):
        raise RuntimeError(f"publish audit failed: {r1} / {r2}")
    served_head = _served("audited_head")
    return served_v1.unionAll(served_head).orderBy("phase", "doc_id")


ORACLE_WAP_PUBLISH = f"""
WITH {_TF_STATES_SQL}
SELECT * FROM (
  SELECT 'audited_v1' AS phase, doc_id, n_tok, tok0, source FROM s1
  UNION ALL
  SELECT 'audited_head' AS phase, doc_id, n_tok, tok0, source FROM s2
)
ORDER BY phase, doc_id
"""

QUERIES["table_wap_publish"] = table_wap_publish
ORACLES["table_wap_publish"] = ORACLE_WAP_PUBLISH


# =====================================================================
# Driver-correctness-window ordering.
#
# The driver's correctness gate checks only the FIRST 50 entries of the
# queries() dict (insertion order); the registry holds more (71 as of
# round 5, so exactly len(QUERIES)-50 must spill — asserted below so a
# new registration that silently pushes an unlisted query past the cap
# fails this module's import instead of going unnoticed). Rotation
# invariant (VERDICT r4 #3): over any two consecutive rounds every
# registered query gets a driver row — never/seldom-driver-checked
# queries first, multiply-verified queries (green in r02 AND r03 AND
# r04) last. New queries must be registered ABOVE this block so they
# land inside the window, and the spill list extended to match.
# =====================================================================

_DRIVER_HEAD = [
    # round-4 spill (green r02+r03, rotated OUT of the r04 window —
    # due a row this round to keep the two-consecutive-rounds invariant)
    "etl_null_handling",
    "etl_date_derived",
    "etl_conditional_agg",
    "etl_topk",
    "etl_dq_null_counts",
    "etl_cast_rename_project",
    "etl_date_functions",
    "pivot_status_by_priority",
    "rollup_revenue",
    "set_ops_except",
    "union_expand",
    "etl_percentiles",
    "json_extract_props",
    # never driver-green in any round (r04 rows errored on session conf,
    # fixed this round) — must be in-window
    "wal_datasource_scan",
    "serving_sink_roundtrip",
    # brand-new round-5 queries
    "streaming_windowed_rates",
    "table_rebucket_replay",
    "table_key_range_scan",
]
_DRIVER_TAIL = [
    # triple-verified (green driver rows in r02, r03 AND r04) — the 15
    # most-checked classic-analytics/text queries spill past the cap
    "q1_pricing_summary",
    "etl_clean_filter",
    "etl_dedup_lww",
    "etl_broadcast_enrich",
    "etl_dq_report",
    "etl_price_bucket",
    "sessionize",
    "window_running_sum",
    "tumbling_window_agg",
    "text_metrics",
    "text_lang_id",
    "text_zscore_by_source",
    "tokenize_documents",
    "sql_over_files",
    "temp_view_pipeline",
    # 16th spill (round 5): the labeled all-pairs exactness BASELINE —
    # green in r03+r04, and its production-path sibling
    # dedup_lsh_jaccard_verify stays in-window. Due a row in r06.
    "dedup_jaccard_nearest",
    # 17th spill (round 5, makes room for table_time_travel): green in
    # r02, r03 AND r04; its banding sibling dedup_minhash_lsh and the
    # scale-path verify dedup_lsh_jaccard_verify stay in-window. Due a
    # row in r06.
    "dedup_minhash_signatures",
    # 18th spill (round 5, makes room for table_bloom_lookup): green in
    # r02, r03 AND r04; map-only and plan-shape-tested
    # (test_similarity.py). Due a row in r06.
    "dedup_simhash",
    # 19th spill (round 5, makes room for table_schema_evolution): green
    # in r02, r03 AND r04; the deliberate brute-force BASELINE — its ANN
    # siblings and both recall queries stay in-window. Due a row in r06.
    "embed_cosine_topk",
    # 20th spill (round 5, makes room for streaming_table_feed): green in
    # r02, r03 AND r04; its end-to-end scale sibling
    # dedup_lsh_jaccard_verify (banding → candidate pairs → verify)
    # stays in-window. Due a row in r06.
    "dedup_minhash_lsh",
    # 21st spill (round 5, makes room for table_wap_publish): green in
    # r02, r03 AND r04; LWW stays in-window via the flagship
    # cdc_replay_engine and cdc_merge_upsert. Due a row in r06.
    "cdc_lww_latest",
]

QUERIES = {
    **{k: QUERIES[k] for k in _DRIVER_HEAD},
    **{k: v for k, v in QUERIES.items()
       if k not in _DRIVER_HEAD and k not in _DRIVER_TAIL},
    **{k: QUERIES[k] for k in _DRIVER_TAIL},
}

_DRIVER_WINDOW = 50
assert len(QUERIES) - len(_DRIVER_TAIL) == _DRIVER_WINDOW, (
    f"{len(QUERIES)} queries registered but only {len(_DRIVER_TAIL)} "
    f"spilled past the driver's {_DRIVER_WINDOW}-row correctness window "
    "— extend _DRIVER_TAIL with a deliberately-chosen multiply-verified "
    "query (and note which round owes it a row) so nothing spills "
    "silently."
)

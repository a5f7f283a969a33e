"""Driver-shaped session gate (VERDICT r4 "What's wrong" #2).

Round-4 lesson: the oracle-parity suite ran every query under the repo's
own ``build_session`` (session.py), which enables
``spark.sql.python.filterPushdown.enabled`` — so two queries that
silently depended on that conf passed locally and then hard-errored
under the driver's default-conf session (CORRECTNESS_r04:
DATA_SOURCE_PUSHDOWN_DISABLED). This module replays the FULL arrow-layer
oracle comparison under a session stripped back to Spark defaults:
``newSession()`` shares the JVM but gets its own SQLConf, and
``conf.unset`` resets each key to the Spark DEFAULT (not the context
conf), which a sanity test below proves. Any query that depends on a
session-factory conf fails here before it fails at the driver.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

from .test_entry_oracle import SF_DIR, TABLES, _canon_arrow

# Every session-level conf build_session() (session.py) sets beyond
# master/memory. Unset → Spark default. Queries must survive defaults.
REPO_SESSION_EXTRAS = [
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.python.filterPushdown.enabled",
    "spark.sql.parquet.compression.codec",
    "spark.sql.datetime.java8API.enabled",
]


@pytest.fixture(scope="module")
def driver_spark(spark):
    s = spark.newSession()
    for k in REPO_SESSION_EXTRAS:
        try:
            s.conf.unset(k)
        except Exception:
            pass
    # The driver's session is the process's ACTIVE session; newSession()
    # is not, and Python DataSource registration/lookup resolves through
    # the JVM-side active session (probed: register+write on a
    # non-active newSession → DATA_SOURCE_NOT_FOUND). Make the stripped
    # session active so the harness quirk doesn't mask/invent failures,
    # and restore the parent for later test modules.
    jss = spark._jvm.org.apache.spark.sql.classic.SparkSession
    jss.setActiveSession(s._jsparkSession)
    yield s
    jss.setActiveSession(spark._jsparkSession)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_driver_session_is_really_default_conf(driver_spark):
    """Prove unset falls back to the Spark DEFAULT, not the context conf
    (the parent session's builder put these into the SparkContext conf).
    If this assertion ever fails, the whole module is vacuous — fix the
    fixture before trusting any green below."""
    assert (
        driver_spark.conf.get("spark.sql.python.filterPushdown.enabled")
        == "false"
    )


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle_under_default_conf(driver_spark, ddb, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(driver_spark, SF_DIR)
    spark_tbl = df.toArrow()
    if name not in oracles:
        assert spark_tbl.num_rows >= 0  # rows-only check
        return
    ddb_tbl = ddb.execute(oracles[name]).arrow()
    s_cols, s_types, s_rows = _canon_arrow(spark_tbl)
    d_cols, d_types, d_rows = _canon_arrow(ddb_tbl)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert s_types == d_types, (
        f"{name}: arrow types differ under default conf: "
        f"spark={dict(zip(s_cols, s_types))} "
        f"oracle={dict(zip(d_cols, d_types))}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: {len(s_rows)} rows vs oracle {len(d_rows)}"
    )
    mismatches = [
        i for i, (a, b) in enumerate(zip(s_rows, d_rows))
        if a != b or any(type(x) is not type(y) for x, y in zip(a, b))
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows under default conf; "
        f"first: spark={s_rows[mismatches[0]]} oracle={d_rows[mismatches[0]]}"
    )

"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its DuckDB oracle — row count,
column names, and exact values (rows sorted, columns sorted by name)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(rows, cols):
    """Sort columns by name, then rows; normalize numerics."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            if isinstance(v, bool):
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        return
    cur = ddb.execute(oracles[name])
    ddb_cols = [d[0] for d in cur.description]
    ddb_rows = cur.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: columns {sorted(spark_cols)} != {sorted(ddb_cols)}"
    )
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: {len(spark_rows)} rows vs oracle {len(ddb_rows)}"
    )
    _, s = _canon(spark_rows, spark_cols)
    _, d = _canon(ddb_rows, ddb_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={s[mismatches[0]]} oracle={d[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

"""The ``lakefeed`` DataSource (sources/feed_datasource.py): the table's
committed changelog as a Spark batch/stream read — version-offset
exactly-once, fold/rebucket skipping, CoW fail-closed, evolution
reconciliation."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e_commerce_batch_etl_pipeline_spark.sources.feed_datasource import (
    FeedUnsupportedCommit,
    LakeFeedDataSource,
    _plan_versions,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
    bootstrap_table,
)
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine
from e_commerce_batch_etl_pipeline_spark.tables.format import TableSchema

ENV_SCHEMA = T.StructType([
    T.StructField("lsn", T.LongType()),
    T.StructField("epoch", T.IntegerType()),
    T.StructField("op", T.StringType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])

DOC_SCHEMA = TableSchema(fields=[
    ("doc_id", "string", False),
    ("tokens", "array<int>", True),
    ("n_tok", "int", True),
    ("source", "string", True),
])


def _write_wal(spark, wal_root, epochs=3, keys=8):
    rows = []
    for e in range(epochs):
        for k in range(keys):
            lsn = e * keys + k
            op = "D" if (e == 2 and k < 3) else ("I" if e == 0 else "U")
            rows.append((lsn, e, op, f"k{k:03d}",
                         None if op == "D" else [lsn], None,
                         None if op == "D" else "s"))
    df = spark.createDataFrame(rows, ENV_SCHEMA).withColumn(
        "ts", F.timestamp_seconds("lsn")
    )
    for e in range(epochs):
        df.filter(F.col("epoch") == e).write.mode("overwrite").parquet(
            os.path.join(wal_root, f"epoch-{e:05d}")
        )
    return epochs * keys


def _mor_table(spark, root, wal_root, **engine_kw):
    empty = spark.createDataFrame([], DOC_SCHEMA.to_struct())
    table = bootstrap_table(os.path.join(root, "table"), empty, num_buckets=4)
    eng = CdcEngine(
        spark, table, WalSource(wal_root), os.path.join(root, "ckpt"),
        merge_mode="mor", mor_compact_files=None, **engine_kw,
    )
    eng.run()
    return table


@pytest.fixture(scope="module")
def feed_fx(spark):
    root = tempfile.mkdtemp(prefix="feed_fx_")
    wal_root = os.path.join(root, "wal")
    n = _write_wal(spark, wal_root)
    table = _mor_table(spark, root, wal_root)
    spark.dataSource.register(LakeFeedDataSource)
    yield {"table": table, "wal_root": wal_root, "root": root, "n": n}
    shutil.rmtree(root, ignore_errors=True)


def _batch(spark, table, **opts):
    r = spark.read.format("lakefeed").option("root", table.root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_full_changelog(spark, feed_fx):
    rows = _batch(spark, feed_fx["table"]).orderBy("_lsn").collect()
    assert len(rows) == feed_fx["n"]
    # lsn is dense 0..n-1 (one winner per (epoch,key) — all keys distinct
    # per epoch here), ops as committed, versions = epoch + 2
    assert [r["_lsn"] for r in rows] == list(range(feed_fx["n"]))
    assert rows[0]["_change_op"] == "I" and rows[0]["_commit_version"] == 2
    assert rows[8]["_change_op"] == "U" and rows[8]["_commit_version"] == 3
    d = [r for r in rows if r["_change_op"] == "D"]
    assert len(d) == 3
    assert all(r["tokens"] is None and r["n_tok"] is None for r in d)


def test_batch_version_range(spark, feed_fx):
    # (v2, v3]: exactly epoch 1's 8 updates
    part = _batch(
        spark, feed_fx["table"], startingVersion=2, endingVersion=3
    ).collect()
    assert len(part) == 8
    assert {r["_change_op"] for r in part} == {"U"}
    assert {r["_commit_version"] for r in part} == {3}


def test_batch_ending_version_beyond_head_rejected(spark, feed_fx):
    with pytest.raises(Exception, match="beyond current"):
        _batch(spark, feed_fx["table"], endingVersion=99).collect()


def test_stream_availablenow_equals_batch(spark, feed_fx):
    sink = "lakefeed_t1"
    q = (
        spark.readStream.format("lakefeed")
        .option("root", feed_fx["table"].root)
        .option("startingVersion", 0).load()
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["doc_id"], r["_lsn"], r["_change_op"], r["_commit_version"])
        for r in spark.table(sink).collect()
    }
    want = {
        (r["doc_id"], r["_lsn"], r["_change_op"], r["_commit_version"])
        for r in _batch(spark, feed_fx["table"]).collect()
    }
    assert got == want


def test_stream_checkpoint_resume_exactly_once(spark, feed_fx, tmpdir_clean):
    """Kill-and-resume: a second availableNow run against the SAME
    checkpoint after new commits must emit ONLY the new versions'
    changes — no replays, no gaps."""
    table = feed_fx["table"]
    ckpt = os.path.join(tmpdir_clean, "ckpt")
    out = os.path.join(tmpdir_clean, "out")

    def run_once():
        q = (
            spark.readStream.format("lakefeed")
            .option("root", table.root)
            .option("startingVersion", 0).load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).count()
    assert first == feed_fx["n"]
    # commit one more epoch (8 more updates), then resume the stream
    extra = [(100 + k, 9, "U", f"k{k:03d}", [100 + k], None, "s2")
             for k in range(8)]
    df = spark.createDataFrame(extra, ENV_SCHEMA).withColumn(
        "ts", F.timestamp_seconds("lsn")
    )
    df.write.mode("overwrite").parquet(
        os.path.join(feed_fx["wal_root"], "epoch-00009")
    )
    eng = CdcEngine(
        spark, table, WalSource(feed_fx["wal_root"]),
        os.path.join(feed_fx["root"], "ckpt"),
        merge_mode="mor", mor_compact_files=None,
    )
    eng.run()
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == feed_fx["n"] + 8
    new = [r for r in rows if r["_lsn"] >= 100]
    assert len(new) == 8 and {r["source"] for r in new} == {"s2"}
    # no duplicates anywhere
    assert len({(r["doc_id"], r["_lsn"]) for r in rows}) == len(rows)


def test_compaction_fold_is_skipped(spark, feed_fx):
    """A fold rewrites files without changing state: the planner must
    emit nothing for it, and re-reads spanning it stay identical."""
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        compact,
    )

    table = feed_fx["table"]
    before = {
        (r["doc_id"], r["_lsn"]) for r in _batch(spark, table).collect()
    }
    v_pre = table.current().version
    compact(table, spark, max_files_per_bucket=1)
    v_post = table.current().version
    assert v_post > v_pre  # a fold actually committed
    after = {
        (r["doc_id"], r["_lsn"]) for r in _batch(spark, table).collect()
    }
    assert after == before
    assert _plan_versions(table.root, v_pre, v_post) == []


def test_cow_replacement_fails_closed(spark, tmpdir_clean):
    wal_root = os.path.join(tmpdir_clean, "wal")
    _write_wal(spark, wal_root)
    empty = spark.createDataFrame([], DOC_SCHEMA.to_struct())
    table = bootstrap_table(
        os.path.join(tmpdir_clean, "table"), empty, num_buckets=4
    )
    CdcEngine(
        spark, table, WalSource(wal_root),
        os.path.join(tmpdir_clean, "ckpt"),
    ).run()
    spark.dataSource.register(LakeFeedDataSource)
    with pytest.raises(Exception, match="merge-mode mor"):
        _batch(spark, table).collect()


def test_bootstrap_base_rows_emitted_as_inserts(spark, tmpdir_clean):
    """A non-empty bootstrap is the stream's initial snapshot: its rows
    surface once as I with _lsn=-1 (base files carry no lsn)."""
    base = spark.createDataFrame(
        [(f"b{i}", [i], 1, "boot") for i in range(6)],
        DOC_SCHEMA.to_struct(),
    )
    table = bootstrap_table(
        os.path.join(tmpdir_clean, "table"), base, num_buckets=4
    )
    spark.dataSource.register(LakeFeedDataSource)
    rows = _batch(spark, table).collect()
    assert len(rows) == 6
    assert {r["_change_op"] for r in rows} == {"I"}
    assert {r["_lsn"] for r in rows} == {-1}
    assert {r["_commit_version"] for r in rows} == {1}


def test_evolution_reconciled_per_file(spark, tmpdir_clean):
    """Delta files written before a column was added read as typed NULL;
    the feed's schema is the table's CURRENT schema."""
    wal_root = os.path.join(tmpdir_clean, "wal")
    _write_wal(spark, wal_root, epochs=2)
    table = _mor_table(spark, tmpdir_clean, wal_root)
    table.evolve_schema(add_columns=[("rank", "int")])
    # one more epoch whose envelopes carry the new column
    extra = [(200 + k, 5, "U", f"k{k:03d}", [k], None, "s3", k * 10)
             for k in range(4)]
    schema = T.StructType(
        ENV_SCHEMA.fields + [T.StructField("rank", T.IntegerType())]
    )
    df = spark.createDataFrame(extra, schema).withColumn(
        "ts", F.timestamp_seconds("lsn")
    )
    df.write.mode("overwrite").parquet(
        os.path.join(wal_root, "epoch-00005")
    )
    CdcEngine(
        spark, table, WalSource(wal_root),
        os.path.join(tmpdir_clean, "ckpt"),
        merge_mode="mor", mor_compact_files=None,
    ).run()
    spark.dataSource.register(LakeFeedDataSource)
    rows = _batch(spark, table).collect()
    old = [r for r in rows if r["_lsn"] < 200]
    new = [r for r in rows if r["_lsn"] >= 200]
    assert len(old) == 16 and all(r["rank"] is None for r in old)
    assert len(new) == 4
    assert {r["rank"] for r in new} == {0, 10, 20, 30}


def test_metadata_column_collision_rejected(spark, tmpdir_clean):
    from e_commerce_batch_etl_pipeline_spark.tables.format import LakeTable

    bad = TableSchema(fields=[
        ("doc_id", "string", False), ("_lsn", "bigint", True),
    ])
    LakeTable.create(
        os.path.join(tmpdir_clean, "t"), bad, key_column="doc_id",
        num_buckets=2,
    )
    spark.dataSource.register(LakeFeedDataSource)
    with pytest.raises(Exception, match="collide"):
        (spark.read.format("lakefeed")
         .option("root", os.path.join(tmpdir_clean, "t")).load())


def test_cli_feed_incremental_export(spark, tmpdir_clean, capsys):
    """`feed` CLI: each invocation appends exactly the commits the
    checkpoint hasn't seen — a cron-able exactly-once CDC export."""
    import json as _json

    from e_commerce_batch_etl_pipeline_spark.cli import main

    wal_root = os.path.join(tmpdir_clean, "wal")
    _write_wal(spark, wal_root, epochs=2)
    table = _mor_table(spark, tmpdir_clean, wal_root)
    out = os.path.join(tmpdir_clean, "export")
    ckpt = os.path.join(tmpdir_clean, "feed_ckpt")

    rc = main(["feed", "--table", table.root, "--out", out,
               "--checkpoint", ckpt])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["rows_exported"] == 16

    extra = [(300 + k, 7, "U", f"k{k:03d}", [300 + k], None, "s7")
             for k in range(5)]
    df = spark.createDataFrame(extra, ENV_SCHEMA).withColumn(
        "ts", F.timestamp_seconds("lsn")
    )
    df.write.mode("overwrite").parquet(os.path.join(wal_root, "epoch-00007"))
    CdcEngine(
        spark, table, WalSource(wal_root), os.path.join(tmpdir_clean, "ckpt"),
        merge_mode="mor", mor_compact_files=None,
    ).run()

    rc = main(["feed", "--table", table.root, "--out", out,
               "--checkpoint", ckpt])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["rows_exported"] == 5
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 21
    assert len({(r["doc_id"], r["_lsn"]) for r in rows}) == 21


def test_batch_starting_timestamp(spark, feed_fx):
    """startingTimestamp resolves to 'every commit at or after ts' from
    the snapshot chain's committed_at — metadata-only, no data read."""
    table = feed_fx["table"]
    ts3 = table.snapshot_at(3).committed_at - 0.0005
    got = {(r["doc_id"], r["_lsn"])
           for r in _batch(spark, table, startingTimestamp=ts3).collect()}
    want = {(r["doc_id"], r["_lsn"])
            for r in _batch(spark, table, startingVersion=2).collect()}
    assert got == want and got
    # a timestamp predating the table includes everything (creation v0
    # is retained, so completeness is provable)
    all_rows = _batch(
        spark, table, startingTimestamp="1970-01-01T00:00:00"
    ).count()
    assert all_rows == _batch(spark, table).count()
    with pytest.raises(Exception, match="exclusive"):
        _batch(spark, table, startingVersion=1,
               startingTimestamp=ts3).collect()


def test_feed_fails_closed_below_retention(spark, tmpdir_clean):
    """A range whose FROM snapshot was expired must error, not silently
    emit a partial changelog."""
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        expire_snapshots,
    )

    wal_root = os.path.join(tmpdir_clean, "wal")
    _write_wal(spark, wal_root, epochs=2)
    table = _mor_table(spark, tmpdir_clean, wal_root)
    expire_snapshots(table, keep_last=1)  # only the head survives
    spark.dataSource.register(LakeFeedDataSource)
    with pytest.raises(Exception, match="not retained"):
        _batch(spark, table, startingVersion=0).collect()


def test_bin_pack_covers_budget_and_determinism():
    """Every file exactly once, in order; groups respect the budget
    except for single oversized files; identical input → identical
    packing (offset replay replans bit-identically)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from e_commerce_batch_etl_pipeline_spark.sources.feed_datasource import (
        _bin_pack,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=2_000_000),
                    max_size=60))
    def check(rows):
        entries = [(f"f{i}", "delta", i, r) for i, r in enumerate(rows)]
        parts = _bin_pack(entries)
        flat = [f for p in parts for f in p.files]
        assert flat == [(f"f{i}", "delta", i) for i in range(len(rows))]
        if rows:
            total = sum(rows)
            budget = min(1_000_000, max(10_000, total // 64))
            by_name = dict(zip([f"f{i}" for i in range(len(rows))], rows))
            for p in parts:
                grp = sum(by_name[f[0]] for f in p.files)
                assert grp <= budget or len(p.files) == 1
        assert [p.files for p in _bin_pack(entries)] == [
            p.files for p in parts
        ]

    check()


def test_starting_timestamp_beyond_head_rejected(spark, feed_fx):
    """A timestamp after the newest commit errors loudly (epoch-ms unit
    mixups would otherwise read as 'no changes')."""
    with pytest.raises(Exception, match="after the newest commit"):
        _batch(spark, feed_fx["table"],
               startingTimestamp=1.0e15).collect()


def test_timestamp_stream_restarts_after_retention(spark, tmpdir_clean):
    """startingTimestamp is resolved lazily: a checkpointed stream must
    RESTART from its offset even after retention expired the snapshots
    around the original timestamp."""
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        expire_snapshots,
    )

    wal_root = os.path.join(tmpdir_clean, "wal")
    _write_wal(spark, wal_root, epochs=2)
    table = _mor_table(spark, tmpdir_clean, wal_root)
    spark.dataSource.register(LakeFeedDataSource)
    ts = table.snapshot_at(2).committed_at - 0.0005
    ckpt = os.path.join(tmpdir_clean, "ck")
    out = os.path.join(tmpdir_clean, "o")

    def run_once():
        q = (
            spark.readStream.format("lakefeed")
            .option("root", table.root)
            .option("startingTimestamp", ts).load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == 16
    # retention expires everything below the head, INCLUDING the
    # snapshots the timestamp resolved through
    expire_snapshots(table, keep_last=1)
    extra = [(500 + k, 8, "U", f"k{k:03d}", [500 + k], None, "s8")
             for k in range(4)]
    df = spark.createDataFrame(extra, ENV_SCHEMA).withColumn(
        "ts", F.timestamp_seconds("lsn")
    )
    df.write.mode("overwrite").parquet(os.path.join(wal_root, "epoch-00008"))
    CdcEngine(
        spark, table, WalSource(wal_root), os.path.join(tmpdir_clean, "ckpt"),
        merge_mode="mor", mor_compact_files=None,
    ).run()
    run_once()  # would raise FeedUnsupportedCommit under eager resolution
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 20
    assert len([r for r in rows if r["_lsn"] >= 500]) == 4


def test_feed_spans_rebucket(spark, tmpdir_clean):
    """A mid-history rebucket (4→8 buckets) is a layout rewrite, not a
    logical change: the feed skips it and the changelog spans it —
    pre-rebucket commits under the old layout, post-rebucket commits
    under the new one, nothing duplicated or lost."""
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        rebucket,
    )

    wal_root = os.path.join(tmpdir_clean, "wal")
    _write_wal(spark, wal_root, epochs=2)           # 16 rows
    table = _mor_table(spark, tmpdir_clean, wal_root)
    rebucket(table, spark, 8)
    extra = [(700 + k, 9, "U", f"k{k:03d}", [700 + k], None, "s9")
             for k in range(6)]
    df = spark.createDataFrame(extra, ENV_SCHEMA).withColumn(
        "ts", F.timestamp_seconds("lsn")
    )
    df.write.mode("overwrite").parquet(os.path.join(wal_root, "epoch-00009"))
    CdcEngine(
        spark, table, WalSource(wal_root), os.path.join(tmpdir_clean, "ckpt"),
        merge_mode="mor", mor_compact_files=None,
    ).run()
    spark.dataSource.register(LakeFeedDataSource)
    rows = _batch(spark, table).collect()
    assert len(rows) == 22
    assert len({(r["doc_id"], r["_lsn"]) for r in rows}) == 22
    assert len([r for r in rows if r["_lsn"] >= 700]) == 6
    # the rebucket's own version emitted nothing
    versions = {r["_commit_version"] for r in rows}
    assert table.current().version - 1 not in versions  # rebucket commit

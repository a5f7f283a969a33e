"""Write-audit-publish (tables/maintenance.py:publish + the lakefeed
``ref`` option): audited serving refs that fast-forward only past
passing snapshots, and subscribers that never see unaudited commits."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from e_commerce_batch_etl_pipeline_spark.sources.feed_datasource import (
    LakeFeedDataSource,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine
from e_commerce_batch_etl_pipeline_spark.tables.maintenance import publish
from tests.test_feed_datasource import (
    DOC_SCHEMA,
    ENV_SCHEMA,
    _mor_table,
    _write_wal,
    bootstrap_table,
)


@pytest.fixture()
def wap(spark, tmpdir_clean):
    """MOR table replayed epoch-by-epoch so versions interleave with
    publishes: v1 bootstrap, v2..v4 = epochs 0..2."""
    wal_root = os.path.join(tmpdir_clean, "wal")
    _write_wal(spark, wal_root)
    empty = spark.createDataFrame([], DOC_SCHEMA.to_struct())
    table = bootstrap_table(
        os.path.join(tmpdir_clean, "table"), empty, num_buckets=4
    )
    eng = CdcEngine(
        spark, table, WalSource(wal_root), os.path.join(tmpdir_clean, "c"),
        merge_mode="mor", mor_compact_files=None,
    )
    return {"table": table, "engine": eng, "wal_root": wal_root,
            "dir": tmpdir_clean}


def test_publish_fast_forwards_and_pins_serving(spark, wap):
    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)          # epochs 0-1 → v3
    rep = publish(table, spark)
    assert rep["ok"] and rep["published"] and rep["to_version"] == 3
    assert table.ref("published") == 3
    eng.run()                      # epoch 2 (3 deletes) → v4, UNpublished
    assert table.current().version == 4
    served = table.read(spark, snapshot=table.snapshot_at("published"))
    head = table.read(spark)
    assert served.count() == 8      # pre-delete state
    assert head.count() == 5        # head already saw the deletes
    # publish the head: serving catches up
    rep = publish(table, spark)
    assert rep["ok"] and rep["from_version"] == 3 and rep["to_version"] == 4
    assert table.read(
        spark, snapshot=table.snapshot_at("published")
    ).count() == 5


def test_audit_predicate_blocks_bad_changes(spark, wap):
    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)
    assert publish(table, spark)["ok"]
    eng.run()  # epoch 2: deletes → _change_op = 'D' rows in the feed
    rep = publish(
        table, spark,
        audit_predicate="_change_op <> 'D'",  # no deletes may publish
    )
    assert not rep["ok"] and rep["violations"] == 3
    assert not rep["published"] and table.ref("published") == 3  # untouched
    # a predicate the changes satisfy lets the same target through
    rep = publish(table, spark, audit_predicate="doc_id IS NOT NULL")
    assert rep["ok"] and table.ref("published") == 4


def test_first_publish_audits_full_state(spark, wap):
    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=1)  # epoch 0: 8 inserts
    rep = publish(table, spark, audit_predicate="n_tok = 999")
    assert not rep["ok"] and rep["violations"] == 8
    with pytest.raises(FileNotFoundError):
        table.ref("published")


def test_rollback_requires_explicit_flag(spark, wap):
    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)
    publish(table, spark, version=2)
    publish(table, spark)  # → v3
    with pytest.raises(ValueError, match="allow_rollback"):
        publish(table, spark, version=2)
    rep = publish(table, spark, version=2, allow_rollback=True)
    assert rep["ok"] and table.ref("published") == 2


def test_published_version_survives_retention(spark, wap):
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        expire_snapshots,
        remove_orphans,
    )

    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)
    publish(table, spark)          # published = v3
    eng.run()                      # head v4
    dropped = expire_snapshots(table, keep_last=1)
    remove_orphans(table, min_age_sec=0.0)
    assert 3 not in dropped
    assert table.read(
        spark, snapshot=table.snapshot_at("published")
    ).count() == 8  # files intact through GC


def test_stream_ref_sees_only_published(spark, wap, tmp_path):
    """A lakefeed subscriber pinned to the published ref receives
    exactly the audited prefix; a later publish releases the rest to
    the SAME checkpointed stream."""
    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)          # v2, v3 committed
    publish(table, spark, version=2)  # only epoch 0 audited
    eng.run()                      # head v4 (epoch 2)
    spark.dataSource.register(LakeFeedDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("lakefeed")
            .option("root", table.root)
            .option("startingVersion", 0)
            .option("ref", "published").load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run_once()
    rows = spark.read.parquet(out).collect()
    assert {r["_commit_version"] for r in rows} == {2}
    assert len(rows) == 8
    publish(table, spark)          # fast-forward to head (v4)
    run_once()
    rows = spark.read.parquet(out).collect()
    assert {r["_commit_version"] for r in rows} == {2, 3, 4}
    assert len(rows) == 24
    assert len({(r["doc_id"], r["_lsn"]) for r in rows}) == 24  # no dupes


def test_cli_publish_subcommand(spark, wap, capsys):
    import json as _json

    from e_commerce_batch_etl_pipeline_spark.cli import main

    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)
    rc = main(["publish", "--table", table.root])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] and out["to_version"] == 3
    eng.run()
    rc = main(["publish", "--table", table.root,
               "--audit-predicate", "_change_op <> 'D'"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 3 and not out["ok"] and out["violations"] == 3
    assert table.ref("published") == 3


def test_first_publish_survives_expired_history(spark, wap):
    """First publish audits the full target state directly — it must
    not need snapshot v0, which retention may have expired."""
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        expire_snapshots,
    )

    table, eng = wap["table"], wap["engine"]
    eng.run()
    expire_snapshots(table, keep_last=1)  # v0..v3 gone, head v4 retained
    rep = publish(table, spark, audit_predicate="doc_id IS NOT NULL")
    assert rep["ok"] and rep["published"] and rep["violations"] == 0
    assert table.ref("published") == 4


def test_rollback_publish_still_runs_audit(spark, wap):
    """A rollback is a publish too: an explicit audit_predicate must be
    evaluated (over the full target state), never silently skipped."""
    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)
    publish(table, spark)  # ref = v3
    rep = publish(table, spark, version=2, allow_rollback=True,
                  audit_predicate="n_tok = 999")
    assert not rep["ok"] and rep["violations"] == 8
    assert table.ref("published") == 3  # rollback blocked by its audit


def test_concurrent_publish_cannot_move_ref_backwards(spark, wap,
                                                      monkeypatch):
    """The ref is re-checked under the commit lock at tag time: a
    publisher whose audit raced a newer publish must not tag an older
    version over it."""
    import e_commerce_batch_etl_pipeline_spark.tables.maintenance as mt
    from e_commerce_batch_etl_pipeline_spark.tables.format import (
        ConcurrentCommitError,
    )

    table, eng = wap["table"], wap["engine"]
    eng.run()
    publish(table, spark, version=2)  # ref = v2

    real_verify = mt.verify

    def race_verify(t, s, snapshot=None):
        rep = real_verify(t, s, snapshot=snapshot)
        t.tag("published", 4)  # a concurrent publisher lands v4 mid-audit
        return rep

    monkeypatch.setattr(mt, "verify", race_verify)
    with pytest.raises(ConcurrentCommitError, match="advanced"):
        publish(table, spark, version=3)
    assert table.ref("published") == 4  # the newer publish stands


def test_stream_missing_ref_exports_nothing(spark, wap, tmp_path):
    """Following a ref that doesn't exist yet means 'nothing published':
    the stream runs and emits zero rows instead of crashing."""
    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)
    spark.dataSource.register(LakeFeedDataSource)
    out = str(tmp_path / "o")
    q = (
        spark.readStream.format("lakefeed")
        .option("root", table.root)
        .option("startingVersion", 0)
        .option("ref", "published").load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "c"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 0


def test_stream_survives_ref_rollback_without_duplicates(
    spark, wap, tmp_path
):
    """Offsets stay monotone through a serving rollback: the subscriber
    pauses while the ref is behind its floor and never re-delivers
    already-exported versions when the ref re-advances."""
    table, eng = wap["table"], wap["engine"]
    eng.run()                       # head v4
    publish(table, spark)           # ref = 4
    spark.dataSource.register(LakeFeedDataSource)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("lakefeed")
            .option("root", table.root)
            .option("startingVersion", 0)
            .option("ref", "published").load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == 24
    publish(table, spark, version=2, allow_rollback=True,
            full_verify=False)
    run_once()                      # ref behind the checkpoint: no-op
    assert spark.read.parquet(out).count() == 24
    publish(table, spark, full_verify=False)  # back to v4
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 24
    assert len({(r["doc_id"], r["_lsn"], r["_commit_version"])
                for r in rows}) == 24


def test_batch_inverted_range_rejected(spark, wap):
    table, eng = wap["table"], wap["engine"]
    eng.run(max_epochs=2)
    spark.dataSource.register(LakeFeedDataSource)
    with pytest.raises(Exception, match="inverted"):
        (spark.read.format("lakefeed").option("root", table.root)
         .option("startingVersion", 3).option("endingVersion", 2)
         .load().collect())

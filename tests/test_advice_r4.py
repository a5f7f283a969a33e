"""Round-4 advisory fixes: crash-safe rollup state swap (atomic
version-marker-inside-data-dir promotion), bounded commit-lock wait under
a flapping lock, LRU-capped manifest cache."""

import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from e_commerce_batch_etl_pipeline_spark.cli import main
from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs,
    write_wal,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import bootstrap_table
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine
from e_commerce_batch_etl_pipeline_spark.tables import format as fmt


def _setup(spark, root):
    base = generate_base_docs(spark, 400, seed=42, max_len=32)
    table = bootstrap_table(os.path.join(root, "table"), base, num_buckets=4)
    wal_root = os.path.join(root, "wal")
    write_wal(spark, wal_root, 4, 300, 400, seed=42, max_len=32)
    eng = CdcEngine(spark, table, WalSource(wal_root),
                    os.path.join(root, "ckpt"))
    return table, eng


def _rollup(state, table, capsys):
    rc = main(["rollup", "--table", table.root, "--state", state])
    assert rc in (0, None)
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _direct_agg(spark, table):
    return {
        (r["source"], r["n"], r["total"])
        for r in table.read(spark).groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_tok").cast("long").alias("total"),
        ).collect()
    }


def _state_rows(spark, state):
    return {
        (r["source"], r["n"], r["total"])
        for r in spark.read.parquet(os.path.join(state, "data")).collect()
    }


def test_rollup_swap_survives_crash_windows(spark, tmpdir_clean, capsys):
    """The state swap must have no destroy-first window: a crash at ANY
    point leaves either the old consistent (rows, version) pair or the
    new one — never _VERSION without data (unrecoverable before the fix)
    and never new rows with the old version (incremental double-apply)."""
    table, eng = _setup(spark, tmpdir_clean)
    state = os.path.join(tmpdir_clean, "rstate")
    data_dir = os.path.join(state, "data")
    marker = os.path.join(data_dir, "_VERSION")

    out = _rollup(state, table, capsys)
    assert out["mode"] == "bootstrap"
    # version marker lives INSIDE the data dir; no external _VERSION
    assert os.path.exists(marker)
    assert not os.path.exists(os.path.join(state, "_VERSION"))
    assert _state_rows(spark, state) == _direct_agg(spark, table)

    # crash window A: data renamed aside, new copy never promoted
    eng.run(max_epochs=1)
    os.replace(data_dir, data_dir + ".old")
    out = _rollup(state, table, capsys)
    assert out["mode"] == "incremental" and out["refreshed"]
    assert not os.path.exists(data_dir + ".old")
    assert _state_rows(spark, state) == _direct_agg(spark, table)

    # total state loss (the pre-fix failure: _VERSION orphaned after
    # rmtree) → bootstrap recompute, not a crash
    eng.run(max_epochs=1)
    shutil.rmtree(data_dir)
    with open(os.path.join(state, "_VERSION"), "w") as f:
        f.write("1")  # stale legacy pointer with no data behind it
    out = _rollup(state, table, capsys)
    assert out["mode"] == "bootstrap" and out["refreshed"]
    assert _state_rows(spark, state) == _direct_agg(spark, table)

    # legacy layout (external _VERSION beside data/, no internal marker)
    # still takes the incremental path and migrates to the marker
    v_now = int(open(marker).read().strip())
    os.remove(marker)
    with open(os.path.join(state, "_VERSION"), "w") as f:
        f.write(str(v_now))
    eng.run(max_epochs=1)
    out = _rollup(state, table, capsys)
    assert out["mode"] == "incremental" and out["refreshed"]
    assert os.path.exists(marker)
    assert not os.path.exists(os.path.join(state, "_VERSION"))
    assert _state_rows(spark, state) == _direct_agg(spark, table)

    # up to date → no-op
    out = _rollup(state, table, capsys)
    assert out["refreshed"] is False


def test_lock_wait_bounded_when_stat_races(spark, tmpdir_clean, monkeypatch):
    """A lock that flaps between exists (O_EXCL fails) and vanished
    (stat fails) must still hit the wait_sec deadline instead of
    spinning the OSError path forever."""
    base = generate_base_docs(spark, 50, seed=1, max_len=8)
    table = bootstrap_table(os.path.join(tmpdir_clean, "t"), base,
                            num_buckets=2)
    lock_path = os.path.join(table.root, "metadata", fmt.LOCK_FILE)
    with open(lock_path, "w") as f:
        f.write("999999:deadbeef 0")

    def flapping_stat(_path):
        raise OSError("stat raced with lock removal")

    monkeypatch.setattr(fmt.os.path, "getmtime", flapping_stat)
    t0 = time.monotonic()
    with pytest.raises(fmt.ConcurrentCommitError):
        with fmt.commit_lock(table.root, wait_sec=0.3):
            pass
    assert time.monotonic() - t0 < 5.0
    monkeypatch.undo()
    os.remove(lock_path)
    # lock released → commits proceed again
    table.evolve_schema(add_columns=[("after_flap", "int")])
    assert ("after_flap", "int", True) in table.current().schema.fields


def test_manifest_cache_bounded(tmpdir_clean, monkeypatch):
    """_MANIFEST_CACHE must not grow without limit in a long-lived
    driver; evicted manifests re-load correctly from disk."""
    monkeypatch.setattr(fmt._MANIFEST_CACHE, "max", 4)
    fmt._MANIFEST_CACHE.clear()
    try:
        names = []
        for i in range(10):
            entries = [{"path": f"b{i}/f{i}.parquet", "rows": i}]
            names.append(fmt._write_manifest(tmpdir_clean, entries))
        assert len(fmt._MANIFEST_CACHE) <= 4
        for i, name in enumerate(names):
            got = fmt._load_manifest(tmpdir_clean, name)
            assert got == [{"path": f"b{i}/f{i}.parquet", "rows": i}]
            assert len(fmt._MANIFEST_CACHE) <= 4
    finally:
        fmt._MANIFEST_CACHE.clear()

"""Compaction, snapshot expiry, orphan GC — state preserved throughout."""

import os

import pytest

from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs,
    write_wal,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import bootstrap_table
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine
from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
    compact,
    expire_snapshots,
    remove_orphans,
)


@pytest.fixture()
def replayed(spark, tmpdir_clean):
    base = generate_base_docs(spark, 400, seed=11, max_len=8)
    table = bootstrap_table(os.path.join(tmpdir_clean, "t"), base, num_buckets=4)
    write_wal(spark, os.path.join(tmpdir_clean, "wal"), 3, 300, 400,
              seed=11, max_len=8)
    CdcEngine(spark, table, WalSource(os.path.join(tmpdir_clean, "wal")),
              os.path.join(tmpdir_clean, "ckpt")).run()
    return table


def _state(spark, table):
    return sorted(
        (r["doc_id"], r["n_tok"], r["source"])
        for r in table.read(spark).collect()
    )


def test_compact_preserves_state(spark, replayed):
    before = _state(spark, replayed)
    snap = compact(replayed, spark, max_files_per_bucket=0)  # force all
    assert snap is not None
    assert _state(spark, replayed) == before
    per_bucket = {}
    for f in replayed.current().files:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert all(n == 1 for n in per_bucket.values())
    # idempotent: nothing left to compact at threshold 1
    assert compact(replayed, spark, max_files_per_bucket=1) is None


def test_expire_and_orphan_gc(spark, replayed):
    before = _state(spark, replayed)
    compact(replayed, spark, max_files_per_bucket=0)
    # stage an orphan (crashed commit attempt)
    orphan_src = generate_base_docs(spark, 20, seed=3, max_len=4)
    replayed.write_data_files(orphan_src, [0, 1, 2, 3])
    dropped = expire_snapshots(replayed, keep_last=1)
    assert dropped
    # default safety age would skip the seconds-old orphan; force for test
    assert remove_orphans(replayed) == []  # age gate protects fresh files
    removed = remove_orphans(replayed, min_age_sec=0)
    assert removed  # old bucket files + the orphan attempt
    assert _state(spark, replayed) == before
    # every remaining manifest file exists on disk
    for f in replayed.current().files:
        assert os.path.exists(os.path.join(replayed.root, f["path"]))


def test_write_verify(spark, replayed):
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import verify

    rep = verify(replayed, spark)
    assert rep["ok"], rep
    assert rep["rows"] == rep["distinct_keys"]
    # sabotage: delete a data file → verify flags it
    import os as _os

    victim = replayed.current().files[0]["path"]
    _os.remove(_os.path.join(replayed.root, victim))
    rep2 = verify(replayed, spark)
    assert not rep2["ok"] and victim in rep2["missing_files"]

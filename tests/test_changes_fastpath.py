"""Delta-only changes-feed fast path (round 5).

For a version range where no file was removed and every added file is a
delta whose min_lsn clears the FROM watermark, ``changes_between``
computes the NET feed from the added delta files + one join against the
FROM state (O(changes)) instead of diffing two fully-materialized
snapshot states. These tests pin: (1) the fast path ENGAGES on such
ranges and its output is row-identical to the endpoint-diff path,
including pre-images and schema evolution inside the range; (2) the
lsn-stats guard fails closed (rebucket, compaction folds, stripped
stats → endpoint diff).
"""

import os

import pytest

from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs, write_wal,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
    bootstrap_table,
)
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine
from e_commerce_batch_etl_pipeline_spark.tables.format import LakeTable


def _mor_table(spark, root, epochs=4, evolve=None):
    base = generate_base_docs(spark, 300, seed=21, max_len=12)
    table = bootstrap_table(os.path.join(root, "t"), base, num_buckets=4)
    write_wal(spark, os.path.join(root, "wal"), epochs, 150, 300, seed=21,
              max_len=12, evolve_from_epoch=evolve)
    eng = CdcEngine(
        spark, table, WalSource(os.path.join(root, "wal")),
        os.path.join(root, "ckpt"), merge_mode="mor",
        mor_compact_files=None,
    )
    eng.run()
    return table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _force_slow(monkeypatch):
    monkeypatch.setattr(
        LakeTable, "_delta_only_range",
        staticmethod(lambda *a, **k: False),
    )


def _spy_fast(monkeypatch):
    calls = []
    orig = LakeTable._changes_from_deltas

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(LakeTable, "_changes_from_deltas", spy)
    return calls


@pytest.mark.parametrize("include_old", [False, True])
def test_fast_path_engages_and_matches_endpoint_diff(
    spark, tmpdir_clean, monkeypatch, include_old
):
    table = _mor_table(spark, tmpdir_clean)
    versions = table.history()
    v1, v2 = versions[1], versions[-1]  # bootstrap→... : span 3 epochs
    calls = _spy_fast(monkeypatch)
    fast = _rows(table.changes_between(spark, v1, v2,
                                       include_old=include_old))
    assert calls, "delta-only range must take the fast path"
    monkeypatch.undo()
    _force_slow(monkeypatch)
    slow = _rows(table.changes_between(spark, v1, v2,
                                       include_old=include_old))
    assert fast == slow
    assert fast, "vacuous: range produced no changes"
    ops = {r[0] for r in fast}
    assert "I" in ops and ("U" in ops or "D" in ops)


def test_fast_path_matches_across_schema_evolution(
    spark, tmpdir_clean, monkeypatch
):
    table = _mor_table(spark, tmpdir_clean, epochs=4, evolve=2)
    versions = table.history()
    v1, v2 = versions[1], versions[-1]  # lang column arrives inside
    assert table.snapshot_at(v2).schema.schema_version > \
        table.snapshot_at(v1).schema.schema_version
    calls = _spy_fast(monkeypatch)
    fast = _rows(table.changes_between(spark, v1, v2, include_old=True))
    assert calls
    monkeypatch.undo()
    _force_slow(monkeypatch)
    slow = _rows(table.changes_between(spark, v1, v2, include_old=True))
    assert fast == slow and fast


def test_compaction_fold_in_range_falls_back(
    spark, tmpdir_clean, monkeypatch
):
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        compact,
    )

    table = _mor_table(spark, tmpdir_clean)
    v1 = table.history()[1]
    v_pre = table.current().version
    # the feed up to the pre-fold endpoint is the ground truth: the fold
    # is logically a no-op, so extending the range across it must yield
    # the SAME net changes — no fold artifact may surface as I/U/D rows
    pre_fold = _rows(table.changes_between(spark, v1, v_pre))
    snap = compact(table, spark, max_files_per_bucket=1)
    assert snap is not None  # fold removed files inside the range
    v2 = table.current().version
    assert v2 > v_pre
    calls = _spy_fast(monkeypatch)
    feed = _rows(table.changes_between(spark, v1, v2))
    assert not calls, "removed files must force the endpoint-diff path"
    assert feed == pre_fold and feed


def test_stripped_lsn_stats_fall_back(spark, tmpdir_clean, monkeypatch):
    """Pre-round-5 manifests (no min_lsn) must use the endpoint diff —
    and produce the same answer."""
    table = _mor_table(spark, tmpdir_clean)
    versions = table.history()
    v1, v2 = versions[1], versions[-1]
    expected = _rows(table.changes_between(spark, v1, v2))

    orig = LakeTable.snapshot_at

    def stripped(self, version):
        snap = orig(self, version)
        snap.files = [
            {k: v for k, v in f.items()
             if k not in ("min_lsn", "max_lsn")}
            for f in snap.files
        ]
        return snap

    monkeypatch.setattr(LakeTable, "snapshot_at", stripped)
    calls = _spy_fast(monkeypatch)
    got = _rows(table.changes_between(spark, v1, v2))
    assert not calls and got == expected

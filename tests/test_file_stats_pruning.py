"""Per-file manifest stats + file-level key pruning (VERDICT r4 #6/#7).

Write paths stamp every manifest entry with rows + min/max of the key
column (+ min/max lsn for delta files); read(keys=...)/lookup() prune
files whose key range provably excludes every requested key. Efficacy is
layout-dependent: uniform-random update keys span the whole range (no
pruning), monotone insert ids cluster (old-epoch deltas prune for new
keys and vice versa) — the tests cover both the crafted-disjoint case
(deterministic pruning assertions) and the realistic datagen mix
(correctness under pruning).
"""

import os

import pytest
from pyspark.sql import functions as F

import e_commerce_batch_etl_pipeline_spark.tables.format as fmt
from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs, write_wal,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
    bootstrap_table,
)
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine


@pytest.fixture(scope="module")
def mor_table(spark, tmp_path_factory):
    """4-bucket table, 3 MOR epochs with deferred compaction → pending
    delta files in every touched bucket."""
    root = str(tmp_path_factory.mktemp("stats_pruning"))
    base = generate_base_docs(spark, 400, seed=11, max_len=16)
    table = bootstrap_table(os.path.join(root, "t"), base, num_buckets=4)
    write_wal(spark, os.path.join(root, "wal"), 3, 200, 400, seed=11,
              max_len=16)
    eng = CdcEngine(
        spark, table, WalSource(os.path.join(root, "wal")),
        os.path.join(root, "ckpt"), merge_mode="mor",
        mor_compact_files=None,
    )
    eng.run()
    return table


def test_manifest_entries_carry_stats(mor_table):
    snap = mor_table.current()
    bases = [f for f in snap.files if f.get("kind", "base") == "base"]
    deltas = [f for f in snap.files if f.get("kind") == "delta"]
    assert bases and deltas
    for f in bases + deltas:
        assert f["rows"] > 0
        assert f["min_key"] <= f["max_key"]
    for f in deltas:
        assert 0 <= f["min_lsn"] <= f["max_lsn"]
    # delta lsn ranges actually reflect the epochs (lsn = epoch*200 + i)
    assert max(f["max_lsn"] for f in deltas) >= 400


def test_lookup_reads_only_range_matching_files(mor_table, spark):
    """inputFiles of a single-key lookup ⊆ the files whose manifest key
    range contains the key — file-level pruning is in the PLAN, not just
    row-group stats at executors."""
    snap = mor_table.current()
    key = "doc_000000007"
    df = mor_table.lookup(spark, [key], snapshot=snap)
    allowed = {
        os.path.realpath(os.path.join(mor_table.root, f["path"]))
        for f in snap.files
        if f["min_key"] <= key <= f["max_key"]
    }
    scanned = {
        os.path.realpath(p.removeprefix("file:")) for p in df.inputFiles()
    }
    assert scanned, "plan reads no files?"
    assert scanned <= allowed, scanned - allowed


def test_lookup_of_fresh_insert_prunes_base(mor_table, spark):
    """A key inserted by the WAL (id above the base range) cannot be in
    the bootstrap base files — their [min_key, max_key] ends at the base
    range, so the lookup must scan ONLY delta files."""
    snap = mor_table.current()
    live = {r[0] for r in mor_table.read(spark).select("doc_id").collect()}
    fresh = sorted(k for k in live if k > "doc_000000399")
    assert fresh, "datagen should have inserted new keys"
    key = fresh[-1]
    df = mor_table.lookup(spark, [key], snapshot=snap)
    delta_paths = {
        os.path.realpath(os.path.join(mor_table.root, f["path"]))
        for f in snap.files if f.get("kind") == "delta"
    }
    scanned = {
        os.path.realpath(p.removeprefix("file:")) for p in df.inputFiles()
    }
    assert scanned and scanned <= delta_paths, (
        "fresh-insert lookup must touch no base file"
    )
    assert df.count() == 1


def test_lookup_matches_full_read_filter(mor_table, spark):
    """Pruned lookup ≡ unpruned full read + filter, for a mix of
    existing, fresh-inserted, deleted and absent keys."""
    full = mor_table.read(spark)
    live = sorted(r[0] for r in full.select("doc_id").collect())
    keys = live[:3] + live[-3:] + ["doc_999999999", "nope"]
    got = {
        tuple(r) for r in
        mor_table.lookup(spark, keys).select("doc_id", "n_tok").collect()
    }
    want = {
        tuple(r) for r in
        full.filter(F.col("doc_id").isin(keys))
        .select("doc_id", "n_tok").collect()
    }
    assert got == want
    assert len(got) == 6


def test_read_keys_large_set_semi_join(mor_table, spark):
    """>1000 keys takes the broadcast-semi-join path; result is exact."""
    full = mor_table.read(spark)
    live = sorted(r[0] for r in full.select("doc_id").collect())
    keys = live[:30] + [f"zz_{i:06d}" for i in range(1200)]
    got = sorted(
        r[0] for r in
        mor_table.lookup(spark, keys).select("doc_id").collect()
    )
    assert got == live[:30]


def test_stats_absent_entries_never_pruned():
    """Backward compat: pre-stats manifest entries (no min/max) are
    always kept; incomparable types never prune."""
    assert fmt._may_contain_keys({"path": "x", "bucket": 0}, ["k"])
    assert fmt._may_contain_keys(
        {"min_key": "a", "max_key": "c"}, ["b"])
    assert not fmt._may_contain_keys(
        {"min_key": "a", "max_key": "c"}, ["d"])
    assert not fmt._may_contain_keys(
        {"min_key": "b", "max_key": "c"}, ["a"])
    # int stats vs str keys → TypeError inside → keep
    assert fmt._may_contain_keys({"min_key": 1, "max_key": 5}, ["a"])


def _crafted_disjoint_table(spark, tmpdir_clean):
    """Single-bucket table: base keys a_000..a_049 (v=i), then two delta
    commits with DISJOINT key ranges — a_000..a_009 (v=100+i, lsn 0..9)
    and z_000..z_009 (v=100+i, lsn 100..109)."""
    from e_commerce_batch_etl_pipeline_spark.tables.format import (
        LakeTable, TableSchema,
    )

    schema = TableSchema(fields=[
        ("doc_id", "string", False), ("v", "int", True),
    ])
    table = LakeTable.create(
        os.path.join(tmpdir_clean, "t"), schema, num_buckets=1
    )
    base = spark.createDataFrame(
        [(f"a_{i:03d}", i) for i in range(50)], "doc_id string, v int"
    )
    files = table.write_data_files(base)
    table.commit(0, [0], files, {0: -1})

    def delta_commit(epoch, prefix, lsn0):
        rows = [
            (f"{prefix}_{i:03d}", 100 + i, "U", lsn0 + i) for i in range(10)
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, v int, op string, lsn long"
        ).repartition(1)
        import tempfile

        stage = tempfile.mkdtemp(dir=tmpdir_clean)
        df.write.mode("overwrite").parquet(stage)
        # rename to the bucket-pure convention part-00000-*
        entries = table.adopt_delta_files(stage)
        table.commit(epoch, [0], entries, {0: lsn0 + 9}, delta=True)

    delta_commit(1, "a", 0)    # keys a_000..a_009
    delta_commit(2, "z", 100)  # keys z_000..z_009 — disjoint range
    return table


def test_crafted_disjoint_delta_ranges_prune_deterministically(
    spark, tmpdir_clean
):
    """Two delta commits with DISJOINT key ranges in the same bucket: a
    lookup for a key in range A must not read the range-B delta file."""
    table = _crafted_disjoint_table(spark, tmpdir_clean)
    snap = table.current()
    deltas = [f for f in snap.files if f.get("kind") == "delta"]
    assert len(deltas) == 2
    z_delta = next(f for f in deltas if f["min_key"].startswith("z"))

    df = table.lookup(spark, ["a_003"], snapshot=snap)
    scanned = {
        os.path.realpath(p.removeprefix("file:")) for p in df.inputFiles()
    }
    z_path = os.path.realpath(os.path.join(table.root, z_delta["path"]))
    assert z_path not in scanned, "disjoint-range delta must be pruned"
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["v"] == 103  # delta won LWW


# ------------------------------------------------------------------
# key_range=(lo, hi) — the range-scan analog of keys= (round 5)
# ------------------------------------------------------------------


def test_key_range_matches_full_read_filter(mor_table, spark):
    """Pruned range scan ≡ unpruned full read + BETWEEN filter, on a
    table with pending deltas; open-ended variants included."""
    full = mor_table.read(spark)
    live = sorted(r[0] for r in full.select("doc_id").collect())
    lo, hi = live[len(live) // 4], live[(3 * len(live)) // 4]

    def rows(df):
        return {tuple(r) for r in df.select("doc_id", "n_tok").collect()}

    got = rows(mor_table.read(spark, key_range=(lo, hi)))
    want = rows(full.filter(F.col("doc_id").between(lo, hi)))
    assert got == want and got
    # open ends
    assert rows(mor_table.read(spark, key_range=(None, lo))) == rows(
        full.filter(F.col("doc_id") <= lo)
    )
    assert rows(mor_table.read(spark, key_range=(hi, None))) == rows(
        full.filter(F.col("doc_id") >= hi)
    )


def test_key_range_prunes_disjoint_files(spark, tmpdir_clean):
    """A range covering only the a_* keys must not plan the z_* delta
    file; a range above every key reads nothing and returns empty."""
    table = _crafted_disjoint_table(spark, tmpdir_clean)
    snap = table.current()
    z_delta = next(
        f for f in snap.files
        if f.get("kind") == "delta" and f["min_key"].startswith("z")
    )
    df = table.read(spark, key_range=("a_000", "a_999"))
    scanned = {
        os.path.realpath(p.removeprefix("file:")) for p in df.inputFiles()
    }
    z_path = os.path.realpath(os.path.join(table.root, z_delta["path"]))
    assert scanned and z_path not in scanned
    assert df.count() == 50  # a_000..a_049, deltas LWW-applied in place
    # provably-empty range: every file pruned, schema-stable empty result
    empty = table.read(spark, key_range=("zz_0", "zz_9"))
    assert empty.inputFiles() == [] and empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["doc_id", "v"]


def test_key_range_rejects_bad_args(mor_table, spark):
    with pytest.raises(ValueError):
        mor_table.read(spark, keys=["k"], key_range=("a", "b"))
    with pytest.raises(ValueError):
        mor_table.read(spark, key_range=(None, None))


def test_may_overlap_range_unit():
    f = fmt._may_overlap_range
    assert f({"min_key": "b", "max_key": "d"}, "a", "c")
    assert f({"min_key": "b", "max_key": "d"}, "c", None)
    assert f({"min_key": "b", "max_key": "d"}, None, "b")
    assert not f({"min_key": "b", "max_key": "d"}, "e", "z")
    assert not f({"min_key": "b", "max_key": "d"}, None, "a")
    assert not f({"min_key": "b", "max_key": "d"}, "e", None)
    # no stats / incomparable types → never prune
    assert f({"path": "x"}, "a", "b")
    assert f({"min_key": 1, "max_key": 5}, "a", "b")


# ------------------------------------------------------------------
# round-5 review regressions: NULL/unsortable keys, adopt entry reuse
# ------------------------------------------------------------------


def test_lookup_tolerates_null_key(mor_table, spark):
    """keys fed from an outer join can carry NULL — NULL matches no key
    (isin/equi-join semantics), so a lookup with a None among the keys
    must return exactly the non-None keys' rows, not raise from
    sorting."""
    live = sorted(
        r[0] for r in mor_table.read(spark).select("doc_id").collect()
    )
    k = live[0]

    def rows(df):
        return {
            tuple(r) for r in df.select("doc_id", "n_tok").collect()
        }

    with_null = rows(mor_table.lookup(spark, [k, None]))
    without = rows(mor_table.lookup(spark, [k]))
    assert with_null == without and with_null
    # all-None key set: provably empty, schema-stable, zero files planned
    empty = mor_table.read(spark, keys=[None])
    assert empty.inputFiles() == [] and empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        f.name for f in mor_table.current().schema.to_struct().fields
    ]


def test_adopt_delta_files_precomputed_entries(spark, tmpdir_clean):
    """adopt_delta_files(entries=...) must reuse the caller's footer
    stats verbatim (no second footer pass), rewrite only the path into
    the new commit dir, respect the wanted-bucket filter, and move the
    files."""
    table = _crafted_disjoint_table(spark, tmpdir_clean)
    # stage two more bucket-pure files through a throwaway dir
    stage = os.path.join(tmpdir_clean, "stage_adopt")
    df = spark.createDataFrame(
        [(f"m_{i:03d}", 500 + i, 200 + i, "U") for i in range(8)],
        "doc_id string, v long, lsn long, op string",
    ).coalesce(1)
    df.write.mode("overwrite").parquet(stage)
    # name the file like the engine's bucket-pure output (bucket 0)
    part = next(
        fn for fn in os.listdir(stage) if fn.endswith(".parquet")
    )
    os.rename(
        os.path.join(stage, part), os.path.join(stage, "part-00000-x.parquet")
    )
    pre = fmt._build_entries(stage, "", "doc_id", None)
    assert len(pre) == 1 and pre[0]["rows"] == 8
    got = table.adopt_delta_files(
        stage, [0], key_column="doc_id", entries=pre
    )
    assert len(got) == 1
    e = got[0]
    # stats carried over verbatim; path rewritten into the commit dir
    assert e["rows"] == 8 and e["min_key"] == "m_000"
    assert e["max_key"] == "m_007" and e["min_lsn"] == 200
    assert e["path"] != pre[0]["path"] and "commit-" in e["path"]
    assert os.path.exists(os.path.join(table.root, e["path"]))
    assert not os.path.exists(
        os.path.join(stage, "part-00000-x.parquet")
    )
    # caller's entries are not mutated
    assert pre[0]["path"] == "part-00000-x.parquet"
    # wanted filter drops entries for untouched buckets
    assert table.adopt_delta_files(
        stage, [3], key_column="doc_id", entries=pre
    ) == []

"""Per-file key Bloom filters (tables/bloom.py): the Spark↔Python hash
contract, no-false-negative lookups, delta-file skipping for keys the
deltas don't contain, CoW/fold coverage, sidecar GC, and fail-open on
missing sidecars."""

import os
import random
import string

import pytest

from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs,
    write_wal,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
    bootstrap_table,
)
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine
from e_commerce_batch_etl_pipeline_spark.tables import bloom as bloom_mod
from e_commerce_batch_etl_pipeline_spark.tables.bloom import (
    _M64,
    key_hash,
    xxh64,
    xxh64_int,
    xxh64_long,
)
from e_commerce_batch_etl_pipeline_spark.tables.format import LakeTable


def test_python_xxh64_matches_spark(spark):
    """The probe-side hash MUST equal F.xxhash64 bit-for-bit — a
    mismatch would make bloom pruning drop live files (false negatives).
    Property-tested over strings (incl. unicode + >32B), longs, ints."""
    from pyspark.sql import functions as F, types as T

    rnd = random.Random(7)
    strs = ["", "a", "doc_000000001", "é漢字🚀", "x" * 31, "y" * 32,
            "z" * 33, "w" * 100] + [
        "".join(rnd.choices(string.printable, k=rnd.randint(0, 64)))
        for _ in range(40)
    ]
    for r in (
        spark.createDataFrame([(s,) for s in strs], "s string")
        .select("s", F.xxhash64("s").alias("h")).collect()
    ):
        assert xxh64(r["s"].encode("utf-8")) == r["h"] & _M64

    longs = [0, 1, -1, 42, 2 ** 62, -(2 ** 62)] + [
        rnd.randint(-(2 ** 63), 2 ** 63 - 1) for _ in range(30)
    ]
    for r in (
        spark.createDataFrame([(v,) for v in longs], "v long")
        .select("v", F.xxhash64("v").alias("h")).collect()
    ):
        assert xxh64_long(int(r["v"])) == r["h"] & _M64

    ints = [0, 1, -1, 2 ** 31 - 1, -(2 ** 31)] + [
        rnd.randint(-(2 ** 31), 2 ** 31 - 1) for _ in range(30)
    ]
    schema = T.StructType([T.StructField("v", T.IntegerType())])
    for r in (
        spark.createDataFrame([(v,) for v in ints], schema)
        .select("v", F.xxhash64("v").alias("h")).collect()
    ):
        assert xxh64_int(int(r["v"])) == r["h"] & _M64


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    """4-bucket table, 3 MOR epochs with delta_blooms=True and deferred
    compaction → every pending delta file carries a bloom sidecar."""
    root = str(tmp_path_factory.mktemp("bloom_mor"))
    base = generate_base_docs(spark, 400, seed=11, max_len=16)
    table = bootstrap_table(os.path.join(root, "t"), base, num_buckets=4)
    write_wal(spark, os.path.join(root, "wal"), 3, 200, 400, seed=11,
              max_len=16)
    eng = CdcEngine(
        spark, table, WalSource(os.path.join(root, "wal")),
        os.path.join(root, "ckpt"), merge_mode="mor",
        mor_compact_files=None, delta_blooms=True,
    )
    eng.run()
    return table


def _rows(df):
    return sorted(
        (r["doc_id"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in df.collect()
    )


def test_delta_entries_carry_bloom_refs(bloom_table):
    snap = bloom_table.current()
    deltas = [f for f in snap.files if f.get("kind") == "delta"]
    assert deltas
    for f in deltas:
        ref = f["bloom"]
        assert ref["m"] >= 1024 and 1 <= ref["k"] <= 8
        sidecar = os.path.join(bloom_table.root, ref["path"])
        assert os.path.getsize(sidecar) == 8 + ref["m"] // 8
    # base files (bootstrap, no collect_blooms) have none — and reads
    # must fail open on them
    assert all(
        "bloom" not in f for f in snap.files if f.get("kind", "base") == "base"
    )


def test_lookup_no_false_negatives(bloom_table, spark):
    """Every live key must survive bloom pruning — lookup() equals the
    unpruned full-read filter for a sample across all buckets."""
    full = bloom_table.read(spark)
    sample = [r["doc_id"] for r in full.limit(60).collect()]
    got = _rows(bloom_table.lookup(spark, sample))
    want = _rows(full.filter(full.doc_id.isin(sample)))
    assert got == want and len(want) == len(sample)


def _stripped(table):
    """The same snapshot with bloom refs removed — the A/B control."""
    from e_commerce_batch_etl_pipeline_spark.tables.format import Snapshot

    snap = table.current()
    return Snapshot(
        version=snap.version, schema=snap.schema,
        key_column=snap.key_column, num_buckets=snap.num_buckets,
        files=[{k: v for k, v in f.items() if k != "bloom"}
               for f in snap.files],
        fences=snap.fences, watermark=snap.watermark,
        min_fenced_epoch=snap.min_fenced_epoch, parent=snap.parent,
    )


def test_absent_key_skips_all_delta_files(bloom_table, spark):
    """A probe key inside the table's key RANGE but absent from every
    file: min/max can't prune it, blooms prune every delta (modulo FPR —
    at this fixture's fill factor the filters are effectively exact)."""
    snap = bloom_table.current()
    probe = "doc_000000100_"  # sorts between live ids — range-unprunable
    with_bloom = set(bloom_table.lookup(spark, [probe]).inputFiles())
    without = set(
        bloom_table.lookup(spark, [probe], snapshot=_stripped(bloom_table))
        .inputFiles()
    )
    delta_paths = {
        os.path.join(bloom_table.root, f["path"])
        for f in snap.files if f.get("kind") == "delta"
    }
    import urllib.parse

    def basenames(paths):
        return {os.path.basename(urllib.parse.urlparse(p).path) for p in paths}

    assert basenames(with_bloom) & basenames(delta_paths) == set()
    # the control kept delta files the bloom run skipped
    assert len(basenames(without) & basenames(delta_paths)) > 0
    assert bloom_table.lookup(spark, [probe]).count() == 0


def test_updated_key_prunes_to_containing_deltas(bloom_table, spark):
    """A key updated in SOME epochs plans only the delta files that can
    contain it — fewer than its bucket's full pending set (the
    deferred-compaction read tax min/max stats cannot cut)."""
    wal = WalSource(os.path.join(os.path.dirname(bloom_table.root), "wal"))
    by_epoch = [
        {r["doc_id"] for r in wal.read_epoch(spark, e)
         .filter("op in ('U','I')").select("doc_id").collect()}
        for e in range(3)
    ]
    live = {
        r["doc_id"]
        for r in bloom_table.read(spark).select("doc_id").collect()
    }
    only_e0 = sorted((by_epoch[0] - by_epoch[1] - by_epoch[2]) & live)
    assert only_e0, "fixture has no live epoch-0-only key"
    key = only_e0[0]
    planned = set(bloom_table.lookup(spark, [key]).inputFiles())
    snap = bloom_table.current()
    import urllib.parse

    planned_base = {
        os.path.basename(urllib.parse.urlparse(p).path) for p in planned
    }
    deltas_hit = [
        f for f in snap.files
        if f.get("kind") == "delta"
        and os.path.basename(f["path"]) in planned_base
    ]
    from e_commerce_batch_etl_pipeline_spark.tables.format import bucket_expr
    from pyspark.sql import functions as F

    b = (
        spark.createDataFrame([(key,)], "doc_id string")
        .select(bucket_expr("doc_id", snap.num_buckets).alias("b"))
        .collect()[0]["b"]
    )
    bucket_deltas = [
        f for f in snap.files
        if f.get("kind") == "delta" and f["bucket"] == b
    ]
    assert len(deltas_hit) < len(bucket_deltas)
    # and the row itself is intact (epoch-0 lsn beat the base)
    assert bloom_table.lookup(spark, [key]).count() == 1


def test_fold_blooms_prune_negative_lookup(spark, tmpdir_clean):
    """compact(collect_blooms=True): folded base files carry filters, so
    a negative point lookup plans ZERO files while present keys read
    exactly as before (CoW/fold coverage of the same machinery)."""
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import compact

    base = generate_base_docs(spark, 200, seed=3, max_len=8)
    table = bootstrap_table(os.path.join(tmpdir_clean, "t"), base,
                            num_buckets=4)
    write_wal(spark, os.path.join(tmpdir_clean, "wal"), 2, 100, 200,
              seed=3, max_len=8)
    eng = CdcEngine(
        spark, table, WalSource(os.path.join(tmpdir_clean, "wal")),
        os.path.join(tmpdir_clean, "ckpt"), merge_mode="mor",
        mor_compact_files=None,
    )
    eng.run()
    snap = compact(table, spark, collect_blooms=True)
    assert snap is not None
    assert all("bloom" in f for f in snap.files)
    before = _rows(table.read(spark))
    assert table.lookup(spark, ["doc_000000042_"]).inputFiles() == []
    present = [r[0] for r in before[:20]]
    assert _rows(table.lookup(spark, present)) == [
        r for r in before if r[0] in set(present)
    ]


def test_orphan_gc_keeps_live_blooms_drops_dead(bloom_table):
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        remove_orphans,
    )

    bdir = os.path.join(bloom_table.root, "metadata", "blooms")
    orphan = os.path.join(bdir, "bloom-deadbeefdeadbeefdead.bin")
    with open(orphan, "wb") as f:
        f.write(b"\x00" * 136)
    os.utime(orphan, (1, 1))
    removed = remove_orphans(bloom_table, min_age_sec=0.0)
    assert os.path.join("metadata", "blooms",
                        os.path.basename(orphan)) in removed
    assert not os.path.exists(orphan)
    for f in bloom_table.current().files:
        if "bloom" in f:
            assert os.path.exists(
                os.path.join(bloom_table.root, f["bloom"]["path"])
            )


def test_missing_sidecar_fails_open(spark, tmpdir_clean):
    """A bloom ref whose sidecar vanished keeps the file (no pruning,
    never a wrong result)."""
    base = generate_base_docs(spark, 100, seed=9, max_len=8)
    table = bootstrap_table(os.path.join(tmpdir_clean, "t"), base,
                            num_buckets=2)
    write_wal(spark, os.path.join(tmpdir_clean, "wal"), 1, 60, 100,
              seed=9, max_len=8)
    eng = CdcEngine(
        spark, table, WalSource(os.path.join(tmpdir_clean, "wal")),
        os.path.join(tmpdir_clean, "ckpt"), merge_mode="mor",
        mor_compact_files=None, delta_blooms=True,
    )
    eng.run()
    want = _rows(table.read(spark))
    for f in table.current().files:
        if "bloom" in f:
            p = os.path.join(table.root, f["bloom"]["path"])
            if os.path.exists(p):
                os.remove(p)
    bloom_mod._BLOOM_CACHE.clear()
    keys = [r[0] for r in want[:10]]
    assert _rows(table.lookup(spark, keys)) == [
        r for r in want if r[0] in set(keys)
    ]


def test_unsupported_key_type_fails_open():
    assert key_hash(1.5, "double") is None
    assert key_hash(None, "string") is None
    assert key_hash("x", "string") is not None
    assert key_hash(7, "bigint") == xxh64_long(7)


def test_python_murmur3_matches_spark_and_bucket_expr(spark):
    """The zero-job lookup route (tables/murmur.py) must equal Spark's
    Murmur3Hash — including its signed-byte tail quirk — and therefore
    bucket_expr. A mismatch would route a lookup to the wrong bucket
    and silently return no rows."""
    from pyspark.sql import functions as F, types as T

    from e_commerce_batch_etl_pipeline_spark.tables.format import bucket_expr
    from e_commerce_batch_etl_pipeline_spark.tables.murmur import (
        key_bucket,
        murmur3_bytes,
        murmur3_int,
        murmur3_long,
    )

    rnd = random.Random(17)
    strs = ["", "a", "doc_000000001", "é漢字🚀", "\x7f\x80úÿ", "x" * 37] + [
        "".join(rnd.choices(string.printable, k=rnd.randint(0, 40)))
        for _ in range(40)
    ]
    rows = (
        spark.createDataFrame([(s,) for s in strs], "s string")
        .select("s", F.hash("s").alias("h"),
                bucket_expr("s", 16).alias("b"),
                bucket_expr("s", 1024).alias("b2"))
        .collect()
    )
    for r in rows:
        assert murmur3_bytes(r["s"].encode("utf-8")) == r["h"]
        assert key_bucket(r["s"], "string", 16) == r["b"]
        assert key_bucket(r["s"], "string", 1024) == r["b2"]

    longs = [0, 1, -1, 42, 2 ** 62, -(2 ** 62)] + [
        rnd.randint(-(2 ** 63), 2 ** 63 - 1) for _ in range(30)
    ]
    for r in (
        spark.createDataFrame([(v,) for v in longs], "v long")
        .select("v", F.hash("v").alias("h"),
                bucket_expr("v", 32).alias("b")).collect()
    ):
        assert murmur3_long(int(r["v"])) == r["h"]
        assert key_bucket(int(r["v"]), "bigint", 32) == r["b"]

    ints = [0, 1, -1, 2 ** 31 - 1, -(2 ** 31)] + [
        rnd.randint(-(2 ** 31), 2 ** 31 - 1) for _ in range(30)
    ]
    schema = T.StructType([T.StructField("v", T.IntegerType())])
    for r in (
        spark.createDataFrame([(v,) for v in ints], schema)
        .select("v", F.hash("v").alias("h")).collect()
    ):
        assert murmur3_int(int(r["v"])) == r["h"]

    assert key_bucket(1.5, "double", 8) is None  # unsupported → fallback
    assert key_bucket(None, "string", 8) is None


def test_bloom_probe_fails_open_on_unhashable_key(bloom_table, spark, monkeypatch):
    """A probe key that cannot coerce to the key column's type must skip
    bloom pruning (fail open) like every other pruning path, not crash
    the read (ADVICE r5)."""
    import e_commerce_batch_etl_pipeline_spark.tables.bloom as bloom_mod

    keys = [r["doc_id"] for r in
            bloom_table.read(spark).select("doc_id").limit(2).collect()]
    expected = _rows(bloom_table.read(spark, keys=keys))

    def boom(k, t):
        raise ValueError("cannot coerce probe key")

    monkeypatch.setattr(bloom_mod, "key_hash", boom)
    assert _rows(bloom_table.read(spark, keys=keys)) == expected

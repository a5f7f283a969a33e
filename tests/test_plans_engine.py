"""Plan-level guarantees of the engine's hot path (SURVEY.md §7.4.6):
no per-row Python anywhere, file pruning on the merge's base read,
broadcast of small change-sets."""

import os

from pyspark.sql import functions as F

from e_commerce_batch_etl_pipeline_spark.functions.tokens import (
    recompute_n_tok,
    validate_envelopes,
)
from e_commerce_batch_etl_pipeline_spark.operators.lww import lww_dedup_salted
from e_commerce_batch_etl_pipeline_spark.operators.merge import merge_upsert
from e_commerce_batch_etl_pipeline_spark.plans import (
    assert_broadcast_join,
    assert_no_python_row_udf,
    physical_plan,
)
from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs,
    generate_wal_epoch,
)
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import bootstrap_table


def test_dedup_pipeline_is_pure_catalyst(spark):
    env = generate_wal_epoch(spark, 0, 500, 400, seed=5, max_len=8)
    valid, _ = validate_envelopes(env)
    dedup = recompute_n_tok(lww_dedup_salted(valid))
    plan = assert_no_python_row_udf(dedup, allow_arrow=False)
    # two-stage salted aggregation shape: (key, salt) then (key)
    assert plan.count("Exchange") >= 2


def test_merge_broadcasts_small_changeset(spark, tmpdir_clean):
    base = generate_base_docs(spark, 500, seed=5, max_len=8)
    table = bootstrap_table(os.path.join(tmpdir_clean, "t"), base, num_buckets=4)
    env = generate_wal_epoch(spark, 0, 100, 500, seed=5, max_len=8)
    valid, _ = validate_envelopes(env)
    changes = recompute_n_tok(lww_dedup_salted(valid))
    merged = merge_upsert(table.read(spark), changes, broadcast_changes=True)
    assert_broadcast_join(merged)
    assert_no_python_row_udf(merged, allow_arrow=False)


def test_base_read_prunes_files(spark, tmpdir_clean):
    base = generate_base_docs(spark, 500, seed=5, max_len=8)
    table = bootstrap_table(os.path.join(tmpdir_clean, "t"), base, num_buckets=4)
    pruned = table.read(spark, buckets=[1])
    plan = physical_plan(pruned)
    # only bucket 1's file is in the scan
    snap = table.current()
    b1 = [f for f in snap.files if f["bucket"] == 1]
    others = [f for f in snap.files if f["bucket"] != 1]
    assert len(b1) == 1 and others
    # the scan's location list contains exactly one file: verify by
    # row counts per bucket instead of parsing paths (plan truncates)
    assert pruned.count() == spark.read.parquet(
        os.path.join(table.root, b1[0]["path"])
    ).count()


def test_quantized_similarity_vectorized_not_row_python(spark):
    """The brute-force cosine baseline runs as ONE MapInArrow numpy
    kernel over the corpus (r6: replaces the interpreted Catalyst HOF
    cross-product — guide §4.2); it must never row-serialize through
    Python, and the kernel's candidate stream must stay tiny (the full
    cross product is never materialized as rows)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from e_commerce_batch_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = cosine_topk(emb, q, k=3)
    plan = assert_no_python_row_udf(topk, allow_arrow=True)
    assert "MapInArrow" in plan, plan


def test_headline_query_plans(spark):
    """Plan quality of headline queries: dims broadcast, filters reach the
    scan, nothing row-serializes through Python."""
    from e_commerce_batch_etl_pipeline_spark.queries import QUERIES
    from e_commerce_batch_etl_pipeline_spark.plans import (
        assert_broadcast_join,
        assert_no_python_row_udf,
        assert_pushed_filters,
        physical_plan,
    )

    sf = "/root/testdata/sf0.001"
    # q1: shipdate filter pushed to parquet scan
    assert_pushed_filters(QUERIES["q1_pricing_summary"](spark, sf), "l_shipdate")
    # broadcast enrich: 3 dim joins all broadcast
    plan = assert_broadcast_join(QUERIES["etl_broadcast_enrich"](spark, sf), expect=3)
    assert "SortMergeJoin" not in plan
    # topk: customer dim broadcast
    assert_broadcast_join(QUERIES["etl_topk"](spark, sf), expect=1)
    # entire inventory (minus the engine-running fixture): no BatchEvalPython
    # anywhere except the sanctioned Arrow path in multimodal_meta
    for name, q in QUERIES.items():
        if name == "cdc_replay_engine":
            continue  # runs the engine (side effects); covered by e2e tests
        df = q(spark, sf)
        # sanctioned Arrow-vectorized paths (never row-at-a-time): the
        # multimodal/zscore pandas surfaces, plus the r6 MapInArrow numpy
        # kernels for hyperplane signatures and brute-force cosine
        # (OPTIMIZATION_r06.md — guide §4.2: batch native compute beats
        # interpreted Catalyst HOF folds; oracle parity pins bit-equality)
        allow_arrow = name in (
            "multimodal_meta", "text_zscore_by_source",
            "embed_cosine_topk", "embed_lsh_signature",
            "embed_ann_lsh_topk", "ann_recall_at_k",
            "ann_recall_multiprobe", "dedup_embedding_neardup_lsh",
        )
        assert_no_python_row_udf(df, allow_arrow=allow_arrow)


def test_mor_single_bucket_read_scans_only_that_bucket(spark, tmp_path):
    """The serving-read plan under merge-on-read: reading ONE bucket of
    a table with pending delta files must scan only that bucket's base +
    delta files (no full-table FileScan) and contain no BatchEvalPython —
    locking the MOR read path the way the merge plan already is."""
    from e_commerce_batch_etl_pipeline_spark.sources.datagen import write_wal
    from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
    from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import (
        CdcEngine,
    )

    root = str(tmp_path)
    base = generate_base_docs(spark, 400, seed=7, max_len=16)
    table = bootstrap_table(os.path.join(root, "t"), base, num_buckets=4)
    write_wal(spark, os.path.join(root, "wal"), 3, 200, 400, seed=7,
              max_len=16)
    eng = CdcEngine(
        spark, table, WalSource(os.path.join(root, "wal")),
        os.path.join(root, "ckpt"), merge_mode="mor",
        mor_compact_files=None,  # deferred compaction → deltas persist
    )
    eng.run()
    snap = table.current()
    assert any(f.get("kind") == "delta" for f in snap.files), \
        "setup must leave pending delta files"

    target_bucket = sorted(
        {f["bucket"] for f in snap.files if f.get("kind") == "delta"}
    )[0]
    df = table.read(spark, buckets=[target_bucket])
    assert_no_python_row_udf(df)

    allowed = {
        os.path.realpath(os.path.join(table.root, f["path"]))
        for f in snap.files if f["bucket"] == target_bucket
    }
    scanned = {
        os.path.realpath(p.removeprefix("file:")) for p in df.inputFiles()
    }
    assert scanned, "plan reads no files?"
    assert scanned <= allowed, scanned - allowed
    # and the merge actually resolves: row count equals the bucket's
    # distinct live keys (LWW winner per key, deletes dropped)
    full = table.read(spark)
    from e_commerce_batch_etl_pipeline_spark.tables.format import bucket_expr
    expected = full.filter(
        bucket_expr(snap.key_column, snap.num_buckets) == target_bucket
    ).count()
    assert df.count() == expected

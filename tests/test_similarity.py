"""Similarity & dedup operators: ANN recall vs brute force, LSH candidate
quality, simhash locality."""

import pytest
from pyspark.sql import functions as F

from e_commerce_batch_etl_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    simhash,
)
from e_commerce_batch_etl_pipeline_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    hyperplane_signature,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_ann_lsh_recall_vs_bruteforce(spark, emb):
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, q, k=5)
    approx = ann_lsh_topk(emb, q, k=5, planes=4)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["nn_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["nn_id"])
    # bucket must contain the query's own neighbors at a sane rate:
    # with 4 planes / random data, same-bucket recall is limited; assert
    # structure (subset relation on scored candidates) + nonzero overlap
    overlaps = [len(ex[k] & ap.get(k, set())) for k in ex]
    assert sum(overlaps) > 0
    # approximate results are always true cosine results within the bucket
    joined = approx.alias("a").join(
        exact.alias("e"),
        (F.col("a.query_id") == F.col("e.query_id"))
        & (F.col("a.nn_id") == F.col("e.nn_id")),
    )
    # dot products agree exactly where both computed the pair
    assert joined.filter(F.col("a.dot") != F.col("e.dot")).count() == 0


def test_hyperplane_signature_deterministic(spark, emb):
    s1 = {r["vec_id"]: r["bucket"] for r in hyperplane_signature(emb, planes=8).collect()}
    s2 = {
        r["vec_id"]: r["bucket"]
        for r in hyperplane_signature(emb.repartition(7), planes=8).collect()
    }
    assert s1 == s2
    assert all(0 <= b < 256 for b in s1.values())


def test_simhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [("a", "the quick brown fox"), ("b", "the quick brown fox"),
         ("c", "completely different words entirely")],
        "doc_id string, text string",
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert sh["a"] == sh["b"]
    assert sh["a"] != sh["c"]


def test_lsh_candidate_pairs_find_exact_dups(spark):
    rows = [(f"d{i}", f"unique words {i} " + "filler " * i) for i in range(10)]
    rows += [("dup1", "same exact content here"), ("dup2", "same exact content here")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(df).collect()}
    assert ("dup1", "dup2") in pairs

"""Text functions, token UDF plumbing, multimodal mapInPandas path."""

import pytest
from pyspark.sql import functions as F

from e_commerce_batch_etl_pipeline_spark.functions.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_features,
    fake_decode_features,
)
from e_commerce_batch_etl_pipeline_spark.functions.text import (
    bpe_token_count,
    lang_guess,
    rolling_fingerprint,
    ws_token_count,
)
from e_commerce_batch_etl_pipeline_spark.functions.tokens import (
    recompute_n_tok,
    token_stats_udf,
)


def test_ws_and_bpe_token_counts(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("hello-world 42",), ("",), ("  x  ",)], "t string"
    )
    out = df.select(
        ws_token_count(F.col("t")).alias("ws"),
        bpe_token_count(F.col("t")).alias("bpe"),
    ).collect()
    assert [r["ws"] for r in out] == [3, 2, 0, 1]
    # "hello-world 42" -> hello, -, world, 42
    assert out[1]["bpe"] == 4


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [("the cat and the dog",), ("der hund und die katze",),
         ("xyz qqq zzz",)],
        "t string",
    )
    got = [r[0] for r in df.select(lang_guess(F.col("t"))).collect()]
    assert got == ["en", "de", "und"]


def test_rolling_fingerprint_local_edit_robust(spark):
    base = "abcdefghijklmnopqrstuvwxyz" * 4
    df = spark.createDataFrame([(base,), (base + "!",)], "t string")
    fps = [r[0] for r in df.select(rolling_fingerprint(F.col("t"))).collect()]
    # appending one char usually keeps the minimum shingle
    assert fps[0] == fps[1]


def test_token_stats_udf_arrow_int32(spark):
    df = spark.createDataFrame(
        [([1, 2, 3],), ([50256],), (None,)], "tokens array<int>"
    )
    out = df.select(token_stats_udf(F.col("tokens")).alias("s")).select(
        "s.valid", "s.n_tok", "s.tok_min", "s.tok_max"
    ).collect()
    assert (out[0]["valid"], out[0]["n_tok"], out[0]["tok_max"]) == (True, 3, 3)
    assert out[1]["valid"] and out[1]["tok_max"] == 50256
    assert not out[2]["valid"]


def test_recompute_n_tok_derive_if_missing(spark):
    df = spark.createDataFrame(
        [([1, 2], None), ([1], 99), (None, 5)],
        "tokens array<int>, n_tok int",
    )
    out = [r["n_tok"] for r in recompute_n_tok(df).collect()]
    assert out == [2, 1, None]


def test_multimodal_features_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    feats = extract_features(attach_binary_payload(docs))
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert len(rows) == 20
    r0 = next(iter(rows.values()))
    assert r0["n_bytes"] > 0 and r0["feat_dim"] == 4
    # deterministic across runs/partitionings
    feats2 = extract_features(attach_binary_payload(docs.repartition(5)))
    rows2 = {r["doc_id"]: r for r in feats2.collect()}
    for k in rows:
        assert rows[k]["checksum"] == rows2[k]["checksum"]
        assert rows[k]["feat_mean"] == rows2[k]["feat_mean"]


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_decoder_stable():
    assert fake_decode_features(b"abc") == fake_decode_features(b"abc")
    assert fake_decode_features(b"") == [0.0, 0.0, 0.0, 0.0]


def test_fake_decoder_vectorized_bit_equal():
    """The numpy batch decoder the mapInPandas path swaps in must be
    bit-identical to the per-byte reference over random blobs."""
    import random

    from e_commerce_batch_etl_pipeline_spark.functions.multimodal import (
        _fake_decode_features_np,
    )

    rng = random.Random(7)
    blobs = [b"", None, b"\x00", bytes(range(256))] + [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2000)))
        for _ in range(50)
    ]
    for blob in blobs:
        ref = fake_decode_features(blob)
        fast = _fake_decode_features_np(blob)
        assert ref == fast
        assert sum(ref) / len(ref) == sum(fast) / len(fast)


def test_pack_sequences_partition_independent(spark):
    """The distributed two-pass prefix sum equals the sequential cumsum
    for ANY chunk count, and bin spans follow the math."""
    from e_commerce_batch_etl_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    rows = [(f"d{i:04d}", (i * 37) % 900 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok long")
    expected = {}
    off = 0
    for k, w in rows:  # already in doc_id order
        expected[k] = (off, off // 1000, (off + w - 1) // 1000)
        off += w
    for chunks in (1, 3, 16):
        got = {
            r["doc_id"]: (r["offset"], r["first_bin"], r["last_bin"])
            for r in pack_sequences(
                df.repartition(7), key="doc_id", weight="n_tok",
                context=1000, num_chunks=chunks,
            ).collect()
        }
        assert got == expected, f"num_chunks={chunks}"


def test_asof_join_semantics(spark):
    """As-of join: inclusive >= matching, equal-ts right rows resolve by
    tiebreak (last wins), no prior right row -> NULLs, and the plan stays
    JVM-side."""
    from e_commerce_batch_etl_pipeline_spark.operators.asof import asof_join
    from e_commerce_batch_etl_pipeline_spark.plans import (
        assert_no_python_row_udf,
    )

    left = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 10, "b"), ("u1", 20, "c"), ("u2", 7, "d")],
        "user string, ts long, tag string",
    )
    right = spark.createDataFrame(
        # two right rows at ts=10 for u1: id 102 must win the tie
        [("u1", 3, 100, 30), ("u1", 10, 101, 40), ("u1", 10, 102, 50),
         ("u3", 1, 103, 60)],
        "user string, ts long, rid int, val int",
    )
    out = asof_join(left, right, on=["user"], ts="ts",
                    payload=["rid", "val"], tiebreak="rid")
    assert_no_python_row_udf(out, allow_arrow=False)
    got = {(r["user"], r["ts"]): (r["asof_rid"], r["asof_val"])
           for r in out.collect()}
    assert got[("u1", 5)] == (100, 30)     # only ts=3 precedes
    assert got[("u1", 10)] == (102, 50)    # inclusive + tiebreak
    assert got[("u1", 20)] == (102, 50)    # carried forward
    assert got[("u2", 7)] == (None, None)  # no right rows for u2
    assert len(got) == 4                   # left rows preserved exactly


def test_range_join_bucket_decomposition(spark):
    """Range join: inclusive window bounds, exactly-once pair emission
    across cell boundaries, left rows preserved with NULLs, and parity
    with a brute-force nested loop."""
    from e_commerce_batch_etl_pipeline_spark.operators.rangejoin import (
        range_join,
    )

    lrows = [("u1", t) for t in (0, 99, 100, 250, 777)] + [("u2", 100)]
    rrows = [("u1", t, t * 10) for t in (0, 1, 99, 100, 101, 200, 300)]
    left = spark.createDataFrame(lrows, "user string, lts long")
    right = spark.createDataFrame(rrows, "user string, rts long, v long")
    W = 100
    got = sorted(
        (r["user"], r["lts"], r["v"])
        for r in range_join(left, right, on=["user"], left_ts="lts",
                            right_ts="rts", window=W).collect()
    )
    expected = sorted(
        (lu, lt, v)
        for lu, lt in lrows
        for ru, rt, v in rrows
        if lu == ru and lt - W <= rt <= lt
    )
    assert got == expected  # exactly-once, inclusive both ends
    # left join preserves unmatched rows
    lj = range_join(left, right, on=["user"], left_ts="lts",
                    right_ts="rts", window=W, how="left")
    rows = [(r["user"], r["lts"], r["v"]) for r in lj.collect()]
    assert ("u2", 100, None) in rows
    matched = [t for t in rows if t[2] is not None]
    assert sorted(matched) == expected

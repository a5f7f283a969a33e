"""Similarity search over embedding columns (array<float>).

Two tiers (SURVEY.md build-plan extension):
- brute-force cosine top-k — the exactness baseline; O(Q×N) dot products,
  all JVM-side (``zip_with`` + ``aggregate`` fold, whole-stage codegen).
- random-hyperplane LSH — the 100 TB path: 16-bit signatures per vector
  (map-only), candidates = same-bucket rows, verified by exact cosine.
  Hamming-adjacent buckets can be probed for recall (multi-probe).

Determinism: embeddings are quantized to integers with
``floor(x*10000 + 0.5)`` (NOT round — decimal-string rounding differs
between engines on floats), so dot products and norms are exact int64
arithmetic, reproducible on any engine/cluster; doubles appear only in
the final ratio, where IEEE division/sqrt of identical ints is
bit-deterministic. Hyperplane weights are md5-derived ±1 per (plane, dim).
CAVEAT: the multiply must run in DOUBLE on every engine — Spark widens
float32 inputs before ``x * 10000``; DuckDB multiplies FLOAT*INT in
float32, which quantizes some coordinates off by one (measured). SQL
oracles therefore cast ``x::DOUBLE`` before the multiply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

QUANT = 10000


def quantize(col):
    """array<float> -> array<long> via floor(x*QUANT + 0.5)."""
    return F.transform(col, lambda x: F.floor(x * QUANT + F.lit(0.5)).cast("long"))


def dot_q(a, b):
    """Exact int64 dot product of two quantized arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_q(a):
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "query_id") -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    corpus vectors (query itself excluded). Queries live in the task
    closure — the corpus never shuffles; at 1000 executors this is a
    map-side loop.

    Physical shape (guide §4.2): one MapInArrow kernel does the whole
    (batch × dim) @ (dim × n_queries) int64 matmul + per-batch top-k in
    numpy, emitting ≤ n_queries × k candidate rows per batch; a final
    tiny window merges candidates globally. The previous Catalyst
    formulation materialized the full |corpus| × |queries| cross product
    through interpreted per-element array folds and shuffled it into the
    window. Arithmetic is bit-identical (same float→double quantize,
    exact int64 dots/norms, same IEEE divide/sqrt, NaN-first descending
    order like Spark's total order on doubles); a top-k selection under
    the same total order commutes with taking the union of per-batch
    top-k's, so results are row-identical (oracle-checked).

    Dense fixed-dim vectors are required — a null/ragged vector or null
    element raises rather than silently diverging from the SQL oracle's
    null algebra (this operator is the labeled exactness baseline; its
    inputs are embedding tables, which are dense by construction).
    """
    import numpy as np

    q_rows = queries.select(F.col(qid_col), F.col(vec_col)).collect()
    id_t = df.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[qid_col].dataType.simpleString()
    cand_schema = (
        f"{qid_col} {qid_t}, nn_id {id_t}, dot long, n2 long, cos double"
    )
    if not q_rows:
        empty = df.sparkSession.createDataFrame([], cand_schema)
        return empty.withColumn("rank", F.lit(1)).select(
            qid_col, "rank", "nn_id", "dot", "n2"
        ).limit(0)
    if any(r[1] is None or any(x is None for x in r[1]) for r in q_rows):
        raise ValueError("cosine_topk requires dense query vectors")
    dims = {len(r[1]) for r in q_rows}
    if len(dims) != 1:
        raise ValueError(f"cosine_topk: mixed query dims {sorted(dims)}")
    d = dims.pop()
    qid_arr = np.array([r[0] for r in q_rows])
    Q = np.floor(
        np.array([r[1] for r in q_rows], dtype=np.float64) * QUANT + 0.5
    ).astype(np.int64)
    qn2 = (Q * Q).sum(axis=1)
    nq = len(qid_arr)

    def score_batches(batches):
        import pyarrow as pa

        for batch in batches:
            n = len(batch)
            if n == 0:
                continue
            ids_arr = batch.column(0)
            lists = batch.column(1)
            offs = np.asarray(lists.offsets)
            lengths = offs[1:] - offs[:-1]
            if lists.null_count or lists.values.null_count or (
                    lengths != d).any():
                raise ValueError(
                    "cosine_topk requires dense fixed-dim corpus vectors"
                )
            ids = np.asarray(ids_arr.to_numpy(zero_copy_only=False))
            fv = np.asarray(
                lists.values.to_numpy(zero_copy_only=False)
            ).reshape(n, d)
            C = np.floor(fv.astype(np.float64) * QUANT + 0.5).astype(
                np.int64
            )
            n2 = (C * C).sum(axis=1)
            dot = C @ Q.T                                   # n × nq int64
            denom = np.sqrt((n2[:, None] * qn2[None, :]).astype(np.float64))
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dot / denom
            out = {c: [] for c in
                   (qid_col, "nn_id", "dot", "n2", "cos")}
            for j in range(nq):
                excl = ids != qid_arr[j]
                cj = cos[:, j]
                # Spark's double total order ranks NaN ABOVE +inf, so a
                # NaN cosine (zero-norm vector) sorts FIRST descending
                key = np.where(np.isnan(cj), -np.inf, -cj)
                order = np.lexsort((ids[excl], key[excl]))[:k]
                sel = np.nonzero(excl)[0][order]
                out[qid_col].append(np.full(len(sel), qid_arr[j]))
                out["nn_id"].append(ids[sel])
                out["dot"].append(dot[sel, j])
                out["n2"].append(n2[sel])
                out["cos"].append(cj[sel])
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate(out[c])) for c in
                 (qid_col, "nn_id", "dot", "n2", "cos")],
                names=[qid_col, "nn_id", "dot", "n2", "cos"],
            )

    cand = df.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        score_batches, cand_schema
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col("nn_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", "nn_id", "dot", "n2")
    )


def _plane_weights(planes: int, dim: int) -> list[list[int]]:
    """±1 weight matrix, w(p,i) = +1 iff md5int(f\"{p}:{i}\") & 1 == 1 —
    computed with hashlib at PLAN time, bit-identical to the SQL oracles'
    ('0x'||substr(md5(p||':'||i),1,15))::BIGINT & 1 derivation."""
    import hashlib

    def bit(p: int, i: int) -> int:
        h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:15], 16)
        return 1 if h & 1 else -1

    return [[bit(p, i) for i in range(dim)] for p in range(planes)]


def hyperplane_signature(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         planes: int = 16, dim: int | None = None) -> DataFrame:
    """Random-hyperplane LSH signature: bit p = (sum_i w(p,i)*x_i) > 0
    where w(p,i) = ±1 from md5(p:i). Deterministic.

    MAP-ONLY: the (planes × dim) weight matrix is known at plan time, so
    it is hoisted into literal arrays and each plane's projection is one
    per-row ``zip_with`` + ``aggregate`` fold — no explode, no weight
    table join, no shuffle at all (the SimHash treatment,
    operators/dedup.py:simhash). The previous posexplode + groupBy
    formulation shuffled N×dim rows (64× inflation at dim=64) into a
    two-level aggregate — at 10^9 vectors that shuffle is the dominant
    cost of signature building; this one scans and emits exactly N rows.
    Rows whose vector is null or whose length differs from ``dim`` are
    EXCLUDED: zip_with null-pads a short vector, the null product
    nullifies the whole fold, and every bit would silently come out 0 —
    collapsing all ragged vectors into one LSH bucket. Excluding them
    matches the fixed-dim contract and keeps ragged input out of the
    candidate stream instead of corrupting it.

    Pass ``dim`` when known (callers usually know it) — the fallback
    probe costs a full aggregation job per invocation. The probe takes
    the MODAL vector size (``mode(size(vec))``), not the first row's:
    with the size==dim filter below, a ragged or null first row would
    otherwise invert the filter and keep exactly the malformed rows."""
    if not 1 <= planes <= 63:
        # the bucket is ONE signed int64; bit 63 would need 1<<63 which
        # overflows (and makes arithmetic shiftright sign-extend in the
        # band extraction). >63 planes ⇒ use multiple signature columns.
        raise ValueError(f"planes must be in [1, 63], got {planes}")
    if dim is None:
        probed = df.select(F.mode(F.size(vec_col)).alias("d")).first()
        dim = probed["d"] if probed else None
        if dim is None:
            raise ValueError(
                f"cannot infer dim: no non-null {vec_col} values"
            )
    weights = _plane_weights(planes, dim)

    # MapInArrow numpy kernel (guide §4.2): the projection is ONE
    # (batch × dim) @ (dim × planes) int64 matmul per Arrow batch — the
    # previous formulation built a (planes × dim)-literal Catalyst tree
    # (~1k py4j calls + interpreted per-element HOF folds per row) whose
    # PLAN CONSTRUCTION alone cost more than this kernel's execution
    # (measured in OPTIMIZATION_r06.md). Still map-only: zero exchanges,
    # weights live in the task closure. Arithmetic is bit-identical:
    # float32 → float64 widening, *10000 + 0.5, floor, int64 — the same
    # IEEE ops Catalyst ran; projections/dots are exact int64.
    import numpy as np

    id_field = df.schema[id_col]
    out_schema = f"{id_col} {id_field.dataType.simpleString()}, bucket long"
    W = np.array(weights, dtype=np.int64).T          # dim × planes
    pows = np.array([1 << p for p in range(planes)], dtype=np.int64)
    d = int(dim)

    def sign_batches(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            lists = batch.column(1)
            n = len(batch)
            if n == 0:
                continue
            offs = np.asarray(lists.offsets)
            lengths = offs[1:] - offs[:-1]
            not_null = ~np.asarray(
                pa.compute.is_null(lists).to_numpy(zero_copy_only=False)
            )
            keep = (lengths == d) & not_null
            if not keep.any():
                continue
            vals = lists.values
            starts = offs[:-1][keep]
            # gather kept rows into an (m × d) matrix
            idx = starts[:, None] + np.arange(d)[None, :]
            fv = np.asarray(vals.to_numpy(zero_copy_only=False))[idx]
            qv = np.floor(fv.astype(np.float64) * QUANT + 0.5).astype(
                np.int64
            )
            s = qv @ W
            bucket = ((s > 0) * pows).sum(axis=1)
            if vals.null_count:
                # a null ELEMENT nullifies every plane's fold in the
                # Catalyst semantics → bucket 0 for that row
                elem_null = np.asarray(
                    pa.compute.is_null(vals).to_numpy(zero_copy_only=False)
                )
                bucket[elem_null[idx].any(axis=1)] = 0
            yield pa.RecordBatch.from_arrays(
                [ids.filter(pa.array(keep)), pa.array(bucket)],
                names=[id_col, "bucket"],
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        sign_batches, out_schema
    )


def embedding_neardup_lsh(df: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding", planes: int = 16,
                          dim: int | None = None,
                          bands: int = 8,
                          thr_num: int = 49, thr_den: int = 400) -> DataFrame:
    """Embedding near-duplicate pairs, LSH-bucketed — the SCALE path
    (the all-pairs crossJoin sibling in queries.py is the labeled
    exactness baseline).

    Candidate generation is hyperplane-bit BANDING, the bit-sampling
    analog of MinHash-LSH banding: the ``planes``-bit signature splits
    into ``bands`` bands of planes/bands bits; a pair is a candidate iff
    it agrees on ALL bits of at least one band. Candidates are then
    verified with the SAME exact-integer cosine predicate as the
    all-pairs baseline: dot > 0 AND thr_den·dot² ≥ thr_num·n2a·n2b
    ⇔ cos ≥ sqrt(thr_num/thr_den) — no float compare at the boundary.
    Defaults: (49, 400) = cos ≥ 0.35 (bit-agree probability
    1 - acos(0.35)/π ≈ 0.61 ⇒ 8 bands × 2 bits recall ≈ 0.98); for a
    true near-duplicate corpus (cos ≥ 0.9, bit-agree ≈ 0.86) widen the
    bands — e.g. planes=56, bands=8 (7-bit bands: recall ≈ 0.97 theory,
    ≥0.8 measured on planted cos≥0.9 dups in CI, random-pair collision
    ≈ 6%; the signature is ONE int64, so planes is capped at 63 — wider
    than that needs the multi-signature-column approach noted in
    hyperplane_signature's guard). Keep thr_num/thr_den a reduced
    fraction, and note the int64 domain: thr_den·dot² must fit — with
    QUANT=10000 that means roughly unit-norm embeddings (n2 ≈ 1e8 ⇒
    dot² ≤ 1e16); scale raw vectors down first if their norm is large.

    Scale shape: signature build is map-only (zero exchanges); banding
    inflates ×bands (≈8), not ×dim; everything downstream is shuffled
    equi-joins on (band, val) / vector id — nothing broadcast, no
    all-pairs product. Cost is O(collisions), not O(N²).
    """
    if planes % bands != 0:
        raise ValueError(f"planes={planes} not divisible by bands={bands}")
    r = planes // bands
    mask = (1 << r) - 1
    sig = hyperplane_signature(df, id_col, vec_col, planes, dim=dim)
    band_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("bucket"), b * r)
            .bitwiseAND(F.lit(mask)).alias("val"),
        )
        for b in range(bands)
    ])
    bb = (
        sig.select(F.col(id_col), F.explode(band_arr).alias("bv"))
        .select(
            F.col(id_col),
            F.col("bv.band").alias("band"),
            F.col("bv.val").alias("val"),
        )
    )
    cand = (
        bb.select(F.col(id_col).alias("id_a"), "band", "val")
        .join(bb.select(F.col(id_col).alias("id_b"), "band", "val"),
              ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    q = df.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("qv")
    ).withColumn("n2", norm2_q(F.col("qv")))
    qa = q.select(F.col(id_col).alias("id_a"), F.col("qv").alias("qa"),
                  F.col("n2").alias("n2a"))
    qb = q.select(F.col(id_col).alias("id_b"), F.col("qv").alias("qb"),
                  F.col("n2").alias("n2b"))
    return (
        cand.join(qa, "id_a").join(qb, "id_b")
        .withColumn("dot", dot_q(F.col("qa"), F.col("qb")))
        .filter(
            (F.col("dot") > 0)
            & (thr_den * F.col("dot") * F.col("dot")
               >= thr_num * F.col("n2a") * F.col("n2b"))
        )
        .select("id_a", "id_b", "dot")
    )


def probe_masks(planes: int, radius: int) -> list[int]:
    """All XOR masks of popcount <= radius over ``planes`` bits (incl. 0:
    the exact bucket). sum_{r<=radius} C(planes, r) masks."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def ann_lsh_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 qid_col: str = "query_id", planes: int = 8,
                 dim: int | None = None,
                 hamming_radius: int = 0) -> DataFrame:
    """Approximate top-k: exact cosine only within the query's LSH bucket.

    The bucket join replaces the cross join — at 10^9 vectors with b
    bits, candidate sets shrink ~2^-b. Recall measured in tests vs the
    brute-force baseline.

    ``hamming_radius`` enables MULTI-PROBE: each query additionally
    probes every bucket within that Hamming distance of its own (radius
    1 ⇒ planes+1 buckets). The query side explodes over the probe masks
    — the CORPUS side is untouched (still one signature per vector, so
    no duplicate candidates) — trading sum C(planes, r) × the per-bucket
    candidate cost for recall; measured as data by ann_recall_multiprobe.
    """
    sig = hyperplane_signature(df, id_col, vec_col, planes, dim=dim)
    qsig = hyperplane_signature(
        queries.withColumnRenamed(qid_col, id_col), id_col, vec_col, planes,
        dim=dim,
    ).withColumnRenamed(id_col, qid_col)
    if hamming_radius > 0:
        masks = probe_masks(planes, hamming_radius)
        qsig = qsig.select(
            qid_col,
            F.explode(
                F.array(*[
                    F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks
                ])
            ).alias("bucket"),
        )
    corpus = df.select(
        F.col(id_col).alias("nn_id"), quantize(F.col(vec_col)).alias("qv")
    ).withColumn("n2", norm2_q(F.col("qv"))).join(
        sig.withColumnRenamed(id_col, "nn_id"), "nn_id"
    )
    qs = queries.select(
        F.col(qid_col), quantize(F.col(vec_col)).alias("qq")
    ).withColumn("qn2", norm2_q(F.col("qq"))).join(F.broadcast(qsig), qid_col)
    scored = (
        corpus.join(F.broadcast(qs), "bucket")
        .filter(F.col("nn_id") != F.col(qid_col))
        .withColumn("dot", dot_q(F.col("qv"), F.col("qq")))
        .withColumn("cos", F.col("dot") / F.sqrt(F.col("n2") * F.col("qn2")))
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", "nn_id", "dot")
    )


def ivf_assign(df: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding",
               cent_id: str = "centroid_id",
               n_assign: int = 1) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its ``n_assign``
    nearest centroids (exact int cosine; deterministic ranking with id
    tiebreak). n_assign=1 is corpus assignment; n_assign>1 is the QUERY
    side of nprobe>1 search.

    Centroids are a small table — broadcast; assignment is a map-side
    loop over the corpus (no shuffle of the corpus). At 10^9 vectors this
    is the partitioner that turns ANN into per-cell local search.
    """
    corpus = df.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("qv")
    ).withColumn("n2", norm2_q(F.col("qv")))
    cents = centroids.select(
        F.col(cent_id), quantize(F.col(vec_col)).alias("cv")
    ).withColumn("cn2", norm2_q(F.col("cv")))
    scored = (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("dot", dot_q(F.col("qv"), F.col("cv")))
        .withColumn("cos", F.col("dot") / F.sqrt(F.col("n2") * F.col("cn2")))
    )
    w = W.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col(cent_id).asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_assign)
        .select(id_col, cent_id)
    )


def ann_ivf_topk(df: DataFrame, queries: DataFrame, centroids: DataFrame,
                 k: int = 5, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 qid_col: str = "query_id",
                 nprobe: int = 1) -> DataFrame:
    """IVF ANN: exact cosine only within the query's ``nprobe`` nearest
    centroid cells. The cell join replaces the cross join — the IVF
    counterpart of ann_lsh_topk; recall/cost trades on centroid count
    and nprobe (corpus vectors live in exactly one cell, so probing more
    query cells never duplicates a candidate). Recall per nprobe is
    measured as data by ann_recall_multiprobe."""
    assign_c = ivf_assign(df, centroids, id_col, vec_col)
    assign_q = ivf_assign(
        queries.withColumnRenamed(qid_col, id_col), centroids, id_col,
        vec_col, n_assign=nprobe,
    ).withColumnRenamed(id_col, qid_col)
    corpus = df.select(
        F.col(id_col).alias("nn_id"), quantize(F.col(vec_col)).alias("qv")
    ).withColumn("n2", norm2_q(F.col("qv"))).join(
        assign_c.withColumnRenamed(id_col, "nn_id"), "nn_id"
    )
    qs = queries.select(
        F.col(qid_col), quantize(F.col(vec_col)).alias("qq")
    ).withColumn("qn2", norm2_q(F.col("qq"))).join(
        F.broadcast(assign_q), qid_col
    )
    scored = (
        corpus.join(F.broadcast(qs), "centroid_id")
        .filter(F.col("nn_id") != F.col(qid_col))
        .withColumn("dot", dot_q(F.col("qv"), F.col("qq")))
        .withColumn("cos", F.col("dot") / F.sqrt(F.col("n2") * F.col("qn2")))
    )
    w = W.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", "nn_id", "dot")
    )


def kmeans_refine_q(df: DataFrame, seed_centroids: DataFrame,
                    iters: int = 2, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    cent_id: str = "centroid_id") -> DataFrame:
    """IVF centroid TRAINING: Lloyd iterations in EXACT integer
    arithmetic. Centroids are represented as the un-normalized
    element-wise SUM of their assigned quantized vectors — cosine is
    scale-invariant, so the mean's division (whose floating-point result
    is engine- and order-dependent) is never taken, and every iteration
    is bit-portable (the SQL oracle reproduces it exactly).

    Scale shape per iteration: assignment is a map-side broadcast argmax
    over the corpus (no corpus shuffle); the update is one explode +
    hash-agg on (centroid, position) — K×d result rows. Empty cells drop
    (their centroid attracted nothing).

    Returns the FINAL iteration's centroids as exact rows
    (centroid_id, i, s, n): element position, int64 coordinate sum, and
    the cell population.
    """
    corpus = df.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("qv")
    ).withColumn("n2", norm2_q(F.col("qv")))
    cents = seed_centroids.select(
        F.col(cent_id), quantize(F.col(vec_col)).alias("cv")
    )
    sums = counts = None
    for _ in range(iters):
        cdf = cents.withColumn("cn2", norm2_q(F.col("cv")))
        scored = (
            corpus.crossJoin(F.broadcast(cdf))
            .withColumn("dot", dot_q(F.col("qv"), F.col("cv")))
            # cast BEFORE multiplying: int64 n2*cn2 overflows for summed
            # centroids; both factors are < 2^53 so the double product
            # is correctly rounded and engine-independent
            .withColumn(
                "cos",
                F.col("dot")
                / F.sqrt(F.col("n2").cast("double") * F.col("cn2").cast("double")),
            )
        )
        w = W.partitionBy(id_col).orderBy(
            F.col("cos").desc(), F.col(cent_id).asc()
        )
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, cent_id, "qv")
        )
        pos = assigned.select(
            F.col(cent_id), F.posexplode("qv").alias("i", "x")
        )
        sums = pos.groupBy(cent_id, "i").agg(F.sum("x").alias("s"))
        counts = assigned.groupBy(cent_id).agg(
            F.count(F.lit(1)).alias("n")
        )
        cents = sums.groupBy(cent_id).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "s"))),
                lambda t: t["s"],
            ).alias("cv")
        )
    return (
        sums.join(counts, cent_id)
        .select(cent_id, "i", "s", "n")
        .orderBy(cent_id, "i")
    )

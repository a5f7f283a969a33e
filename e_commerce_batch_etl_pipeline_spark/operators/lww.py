"""Last-writer-wins dedup — the CDC engine's core operator.

Reference analog: ``src/transform.py:73-87`` uses
``dropDuplicates(["invoice_id","stock_code"])`` which keeps an *arbitrary*
row per key (its docstring claims order-by-date semantics it does not
implement — SURVEY.md §2.4 D1). This module is that operator made
deterministic: the winner per key is the row with the highest ``lsn``
(total order: ``(lsn, op_rank)``; the generator never emits duplicate
``(doc_id, lsn)``, the op_rank tiebreak is defense in depth).

Two physical strategies, same semantics (tested equivalent):

- ``lww_dedup``: single ``max_by`` aggregate — THE DEFAULT, including
  under skew. Called standalone (groupBy straight over the source),
  Spark's partial (map-side) aggregation keeps one winner per key per
  map task, so a hot key reaches the reduce side as at most #map-tasks
  rows: the skew is collapsed *before* the shuffle. Measured on a
  2.4M-event epoch with ONE key receiving 50% of all changes
  (local[16]): plain max_by 0.44s vs salted 1.44s vs window row_number
  2.04s — the partial agg wins outright, and the window variant (which
  sorts the hot key's rows in one partition) is the one that melts.
  NOTE (r6): the ENGINE's staging path now repartitions by the table
  key at the bucket count BEFORE this aggregate so dedup + bucket-pure
  write share one exchange; under that plan the hot key's raw rows do
  land on one reducer first, which is why the ``salted`` flag (below)
  remains the engine's hot-key escape hatch.
- ``lww_dedup_salted``: explicit two-stage aggregate. Stage 1 groups by
  (key, salt) where salt = pmod(xxhash64(lsn), S); stage 2 reduces the S
  winners. Needed when the aggregation buffer cannot be combined
  map-side into O(1) per key (collect_list/set-style buffers, or
  window-function formulations); AQE's skew handling only splits skewed
  *join* partitions, never aggregation groups, so for those operators
  this is the scale path (SURVEY.md §7.4). For max_by it is redundant —
  kept, tested, and exposed via the engine's ``salted`` flag.

Both avoid windows-over-shuffle-sort: ``max_by(struct, lsn)`` aggregates
without sorting every group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _op_rank():
    # deterministic tiebreak if two envelopes carry the same lsn: deletes
    # lose to upserts at equal lsn (never happens with a correct WAL;
    # defense only)
    return F.when(F.col("op") == "D", F.lit(0)).otherwise(F.lit(1))


def _payload_struct(df: DataFrame, key, order: str) -> list[str]:
    keys = (key,) if isinstance(key, str) else tuple(key)
    return [c for c in df.columns if c not in keys]


# Column-expression memo keyed by (schema, keys, order): unresolved
# Columns are immutable and bind by name at analysis, so the agg/select
# trees are reusable across DataFrames with the same shape. The engine
# rebuilds this DAG every microbatch epoch; the memo removes the py4j
# construction round-trips from the per-epoch driver-serial path (r6).
_EXPR_CACHE: dict = {}


def lww_dedup(df: DataFrame, key="doc_id", order: str = "lsn") -> DataFrame:
    """Keep, per key, the row with max (order, op_rank). Single hash agg.

    ``key`` may be one column name or a list (composite group key). The
    engine's staging path groups by (table key, quarantine salt): because
    the partitioning requirement of a multi-column groupBy is satisfied
    by a child hash-partitioned on ANY subset of the group keys, a
    ``repartition(B, table_key)`` upstream makes this aggregate run with
    NO exchange of its own while its output stays bucket-pure — one
    shuffle for dedup + bucket-aligned staging together (guide §2.4).
    """
    keys = [key] if isinstance(key, str) else list(key)
    ck = (tuple(df.columns), tuple(keys), order)
    hit = _EXPR_CACHE.get(ck)
    if hit is None:
        payload = _payload_struct(df, keys, order)
        ordk = F.struct(F.col(order), _op_rank().alias("_rank")) \
            if "op" in df.columns else F.struct(F.col(order))
        if len(_EXPR_CACHE) > 128:
            _EXPR_CACHE.clear()
        hit = _EXPR_CACHE[ck] = (
            F.max_by(F.struct(*payload), ordk).alias("_w"),
            [F.col(f"_w.{c}").alias(c) for c in payload],
        )
    agg, out = hit
    winner = df.groupBy(*keys).agg(agg)
    return winner.select(*keys, *out)


def lww_dedup_salted(
    df: DataFrame,
    key: str = "doc_id",
    order: str = "lsn",
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage salted LWW for hot-key skew.

    Stage 1 shuffles on (key, salt) — a key receiving 20% of a 10^10-event
    epoch spreads over ``num_salts`` reducers. Stage 2 shuffles only the
    per-(key, salt) winners (≤ num_salts rows per key), which is tiny.
    Semantics identical to ``lww_dedup`` (tested for equivalence).
    """
    payload = _payload_struct(df, key, order)
    ordk = F.struct(F.col(order), _op_rank().alias("_rank")) if "op" in df.columns \
        else F.struct(F.col(order))
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(order)), F.lit(num_salts))
    )
    stage1 = salted.groupBy(key, "_salt").agg(
        F.max_by(F.struct(*payload), ordk).alias("_w"),
        F.max(F.col(order)).alias("_max_order"),
    )
    ordk2 = (
        F.struct(
            F.col("_max_order"),
            F.when(F.col("_w.op") == "D", F.lit(0)).otherwise(F.lit(1)).alias("_rank"),
        )
        if "op" in df.columns
        else F.struct(F.col("_max_order"))
    )
    stage2 = stage1.groupBy(key).agg(F.max_by(F.col("_w"), ordk2).alias("_w"))
    return stage2.select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])

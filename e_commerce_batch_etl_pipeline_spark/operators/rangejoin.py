"""Range join — the second join family Spark's optimizer handles badly.

``range_join(left, right, ...)`` pairs every left row with the right
rows whose ``ts`` falls in ``[left.ts - window, left.ts]`` for the same
key. Naively that is an inequality join — Spark plans it as a
broadcast-nested-loop or a cartesian product per key, both of which
explode at scale.

Spark-first strategy — the TIME-BUCKET decomposition every distributed
engine uses (and Databricks' range-join hint implements): bucket both
sides by ``window``-sized time cells; a right row at cell b can only
match left rows in cells {b, b+1}, so tag each right row into those two
cells, equi-join on (key, cell) — hash join, AQE-skew-handled — and
re-check the exact predicate. Each matching pair is produced EXACTLY
once (the two cell tags are disjoint in which left cells they can hit),
so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs (left, right) with ``right_ts`` in ``[left_ts - window,
    left_ts]`` (inclusive, epoch-seconds or any integer timeline), same
    ``on`` keys. ``how='left'`` keeps unmatched left rows (right columns
    NULL). Right's ``on``/ts columns are dropped from the output."""
    cell_l = F.floor(F.col(left_ts) / window)
    cell_r = F.floor(F.col(right_ts) / window)
    l = left.withColumn("_cell", cell_l)
    r0 = right.withColumn("_cell", cell_r)
    r1 = right.withColumn("_cell", cell_r + 1)
    r = r0.unionByName(r1)
    from functools import reduce

    cond = reduce(
        lambda a, b: a & b,
        [l["_cell"] == r["_cell"]] + [l[c] == r[c] for c in on],
    )
    exact = (r[right_ts] >= l[left_ts] - window) & (r[right_ts] <= l[left_ts])
    if how == "inner":
        j = l.join(r, cond).filter(exact)
    elif how == "left":
        j = l.join(r, cond & exact, "left")
    else:
        raise ValueError(f"how must be inner|left, got {how}")
    # explicit side-qualified projection: the left frame's columns keep
    # their names (incl. the join keys — NULL-free even on 'left' rows),
    # the right frame contributes only its payload columns
    right_payload = [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    return j.select(
        *[l[c].alias(c) for c in left.columns],
        *[r[c].alias(c) for c in right_payload],
    )

"""Incremental materialized rollup — a continuous aggregate maintained
from the change feed (the TimescaleDB-continuous-aggregate /
incremental-materialized-view pattern, fed by ``changes_between``).

A rollup (group_col → count, sum(measure)) over a 100 TB table must not
be recomputed per epoch. ``rollup_delta`` turns the NET change feed into
per-group deltas — I adds (+1, +new), D retracts (-1, -old), U applies
(0, new-old), with group-moves handled by splitting U into a retraction
in the old group and an addition in the new one — and ``apply_rollup``
merges those deltas into the previous rollup state. Cost per refresh is
O(changed rows), never O(table).

count/sum (and anything linear: mean = sum/count) are self-maintainable;
min/max are not (a retraction can expose an unknown runner-up) — those
need a recompute over the touched groups, out of scope here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_delta(
    feed: DataFrame, group_col: str, measure: str
) -> DataFrame:
    """Per-group (d_count, d_sum) from a ``changes_between(...,
    include_old=True)`` feed. Group moves (an update that changes
    ``group_col``) retract from the old group and add to the new one."""
    op = F.col("_change_op")
    new_g = F.col(group_col)
    old_g = F.col(f"_old_{group_col}")
    new_m = F.col(measure).cast("long")
    old_m = F.col(f"_old_{measure}").cast("long")
    adds = (
        feed.filter(op.isin(["I", "U"]))
        .select(
            new_g.alias(group_col),
            F.lit(1).alias("d_count"),
            F.coalesce(new_m, F.lit(0)).alias("d_sum"),
        )
    )
    retracts = (
        feed.filter(op.isin(["D", "U"]))
        .select(
            # U rows retract from the OLD group; D rows' current payload
            # is already the pre-image but the old_ columns carry it too
            F.coalesce(old_g, new_g).alias(group_col),
            F.lit(-1).alias("d_count"),
            (-F.coalesce(old_m, new_m, F.lit(0))).alias("d_sum"),
        )
    )
    return (
        adds.unionByName(retracts)
        .groupBy(group_col)
        .agg(
            F.sum("d_count").cast("long").alias("d_count"),
            F.sum("d_sum").cast("long").alias("d_sum"),
        )
    )


def apply_rollup(
    state: DataFrame | None, delta: DataFrame, group_col: str
) -> DataFrame:
    """Merge per-group deltas into the previous rollup state
    (group_col, n, total); groups reaching n == 0 drop out. ``state=None``
    bootstraps from the delta alone."""
    if state is None:
        merged = delta.select(
            group_col,
            F.col("d_count").alias("n"),
            F.col("d_sum").alias("total"),
        )
    else:
        s = state.select(
            group_col, F.col("n").alias("_n"), F.col("total").alias("_t")
        )
        merged = (
            s.join(delta, group_col, "full_outer")
            .select(
                group_col,
                (F.coalesce("_n", F.lit(0))
                 + F.coalesce("d_count", F.lit(0))).cast("long").alias("n"),
                (F.coalesce("_t", F.lit(0))
                 + F.coalesce("d_sum", F.lit(0))).cast("long").alias("total"),
            )
        )
    return merged.filter(F.col("n") > 0)


def incremental_rollup(
    table, spark, v_from: int, v_to: int,
    state: DataFrame | None, group_col: str, measure: str,
) -> DataFrame:
    """One refresh step: previous rollup state at ``v_from`` → state at
    ``v_to``, reading only the change feed between the versions."""
    feed = table.changes_between(spark, v_from, v_to, include_old=True)
    return apply_rollup(
        state, rollup_delta(feed, group_col, measure), group_col
    )

"""Physical-plan assertions — `explain()` as a testable API.

Reference analog: the reference *prints* plans to teach (BroadcastHashJoin
/ Exchange / PartitionFilters, ``src/pipeline.py:102-113``,
``notebooks/06_optimizations.py:126-147``); here the same inspection is a
CI gate (SURVEY.md §7.4.6): the hot path must stay JVM-side (no
``BatchEvalPython`` = no per-row Python; ``ArrowEvalPython``/
``MapInPandas`` only where intended), small dims must broadcast, and
filters must reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_no_python_row_udf(df: DataFrame, allow_arrow: bool = True) -> str:
    """Fail if the plan row-serializes through Python (BatchEvalPython).

    Arrow-vectorized nodes (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    are permitted when ``allow_arrow`` — they are the sanctioned slow path.
    """
    plan = physical_plan(df)
    if "BatchEvalPython" in plan:
        raise AssertionError(
            "plan contains BatchEvalPython (row-at-a-time Python UDF):\n" + plan
        )
    if not allow_arrow:
        for node in ("ArrowEvalPython", "MapInPandas",
                     "FlatMapGroupsInPandas", "MapInArrow"):
            if node in plan:
                raise AssertionError(f"plan contains {node}:\n" + plan)
    return plan


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> str:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    if n < expect:
        raise AssertionError(
            f"expected >= {expect} BroadcastHashJoin, found {n}:\n" + plan
        )
    return plan


def assert_no_broadcast_hint(df: DataFrame) -> str:
    """Fail if the optimized logical plan carries a broadcast hint.

    Guards operators whose relations are O(N) at corpus scale: a
    planner-forced ``F.broadcast`` there builds an unbounded driver-side
    hash relation. AQE choosing a broadcast at runtime from MEASURED
    sizes is fine and not flagged — this inspects hints, not strategy.
    """
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    # hints survive optimization as join-strategy annotations
    # (leftHint/rightHint=(strategy=broadcast)) or, pre-resolution, as
    # ResolvedHint nodes; a bare substring match would false-positive on
    # column/table names containing 'broadcast'
    if "ResolvedHint" in lp or "strategy=broadcast" in lp:
        raise AssertionError(
            "optimized logical plan carries a broadcast hint:\n" + lp
        )
    return lp


def assert_pushed_filters(df: DataFrame, fragment: str) -> str:
    """Assert a filter reached the scan (PushedFilters: [...fragment...])."""
    plan = physical_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    if not any(fragment in line for line in pushed):
        raise AssertionError(
            f"no PushedFilters line contains {fragment!r}; lines: {pushed}\n"
            + plan
        )
    return plan

"""Data-quality checks producing a structured PASS/WARN/FAIL report.

Reference analog: 18 checks / 5 categories with a report DataFrame and an
orchestrator gate that aborts on FAIL (``src/quality_checks.py:171-196``,
``notebooks/03_data_quality.py:50-405``, gate
``notebooks/07_pipeline_orchestrator.py:250-252``). Re-expressed
efficiently: ALL metrics come from ONE aggregation pass
(``notebooks/02_transformations.py:52-56`` A4 pattern), not the
reference's one-count()-per-column loop (``src/quality_checks.py:45-46``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class DQCheck:
    name: str
    category: str  # Volume | Completeness | Uniqueness | Schema | BusinessRule
    metric_expr: object  # Column producing the metric in the single agg pass
    # threshold semantics: metric must satisfy `passes(metric)`
    passes: object  # Callable[[float], bool]
    warn: object = None  # Callable[[float], bool] — WARN band (optional)


def default_checks(
    min_rows: int = 1,
    key_cols: tuple[str, str] = ("invoice_id", "stock_code"),
    null_pct_warn: float = 0.05,
) -> list[DQCheck]:
    k1, k2 = key_cols
    return [
        DQCheck(
            "row_count", "Volume",
            F.count(F.lit(1)),
            lambda v, m=min_rows: v >= m,
        ),
        DQCheck(
            "null_keys", "Completeness",
            F.sum(
                F.when(F.col(k1).isNull() | F.col(k2).isNull(), 1).otherwise(0)
            ),
            lambda v: v == 0,
        ),
        DQCheck(
            "duplicate_keys", "Uniqueness",
            F.count(F.lit(1)) - F.count_distinct(F.col(k1), F.col(k2)),
            lambda v: v == 0,
        ),
        DQCheck(
            "negative_amounts", "BusinessRule",
            F.sum(F.when(F.col("total_amount") < 0, 1).otherwise(0)),
            lambda v: v == 0,
        ),
        DQCheck(
            "null_customer_pct", "Completeness",
            F.avg(F.when(F.col("customer_id").isNull(), 1.0).otherwise(0.0)),
            lambda v: v is not None and v <= 0.25,
            warn=lambda v, w=null_pct_warn: v is not None and v > w,
        ),
    ]


def check_schema(df: DataFrame, expected: list[str]) -> dict:
    """Schema check (names; src/quality_checks.py:83-113)."""
    missing = [c for c in expected if c not in df.columns]
    extra = [c for c in df.columns if c not in expected]
    status = "PASS" if not missing else "FAIL"
    return {
        "check": "schema_columns", "category": "Schema", "status": status,
        "metric": float(len(missing) + len(extra)),
        "detail": f"missing={missing} extra={extra}",
    }


def run_checks(
    df: DataFrame, checks: list[DQCheck],
    expected_schema: list[str] | None = None,
) -> tuple[DataFrame, str]:
    """Run every check in ONE aggregation job; returns (report_df, overall).

    overall = FAIL if any FAIL, else WARN if any WARN, else PASS — the
    orchestrator aborts before any write on FAIL
    (notebooks/07_pipeline_orchestrator.py:250-252 semantics, applied
    pre-commit in the CDC engine).
    """
    spark = df.sparkSession
    row = df.agg(
        *[c.metric_expr.alias(f"m{i}") for i, c in enumerate(checks)]
    ).collect()[0]
    records = []
    for i, c in enumerate(checks):
        v = row[f"m{i}"]
        fv = float(v) if v is not None else None
        if not c.passes(fv if fv is not None else 0.0):
            status = "FAIL"
        elif c.warn is not None and c.warn(fv if fv is not None else 0.0):
            status = "WARN"
        else:
            status = "PASS"
        records.append(
            {
                "check": c.name, "category": c.category, "status": status,
                "metric": fv, "detail": "",
            }
        )
    if expected_schema is not None:
        records.append(check_schema(df, expected_schema))
    statuses = {r["status"] for r in records}
    overall = "FAIL" if "FAIL" in statuses else (
        "WARN" if "WARN" in statuses else "PASS"
    )
    report = spark.createDataFrame(
        [(r["check"], r["category"], r["status"], r["metric"], r["detail"],
          time.strftime("%Y-%m-%dT%H:%M:%S")) for r in records],
        "check string, category string, status string, metric double, "
        "detail string, checked_at string",
    )
    return report, overall


def write_report(report: DataFrame, path: str, mode: str = "overwrite"):
    """JSON report sink (src/load.py:95-130: coalesce(1) single file)."""
    report.coalesce(1).write.mode(mode).json(path)

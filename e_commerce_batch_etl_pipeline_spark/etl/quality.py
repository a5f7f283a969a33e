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


def null_threshold_checks(thresholds: dict[str, float]) -> list[DQCheck]:
    """Per-column null-percentage checks from a {column: max_null_frac}
    dict (notebooks/03_data_quality.py:132-178). Reference bands kept:
    PASS at or under the threshold, WARN up to 2x, FAIL beyond — one
    metric expr per column, all folded into the single agg pass."""
    return [
        DQCheck(
            f"null_pct_{col}", "Completeness",
            F.avg(F.when(F.col(col).isNull(), 1.0).otherwise(0.0)),
            passes=lambda v, t=thr: v is not None and v <= 2 * t,
            warn=lambda v, t=thr: v is not None and v > t,
        )
        for col, thr in thresholds.items()
    ]


def membership_check(
    col: str, allowed: list[str], fail: bool = False
) -> DQCheck:
    """Valid-set membership rule (notebooks/03_data_quality.py:347-350
    valid_order_status): count of rows outside ``allowed``. NULL counts
    as a violation — ``~isin`` alone evaluates to NULL on NULL input and
    would let an all-NULL column PASS silently. The reference treats
    violations as WARN by default; pass ``fail=True`` to gate."""
    metric = F.sum(
        F.when(
            F.col(col).isNull() | ~F.col(col).isin(allowed), 1
        ).otherwise(0)
    )
    if fail:
        return DQCheck(f"valid_{col}", "BusinessRule", metric,
                       passes=lambda v: v == 0)
    return DQCheck(f"valid_{col}", "BusinessRule", metric,
                   passes=lambda v: True, warn=lambda v: v > 0)


def range_check(
    col: str, lo: float, hi: float, fail: bool = True
) -> DQCheck:
    """Numeric range rule (notebooks/03:317-341 order_year/discount_pct
    ranges): count of rows outside [lo, hi]."""
    metric = F.sum(
        F.when((F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
    )
    if fail:
        return DQCheck(f"range_{col}", "BusinessRule", metric,
                       passes=lambda v: v == 0)
    return DQCheck(f"range_{col}", "BusinessRule", metric,
                   passes=lambda v: True, warn=lambda v: v > 0)


def future_date_check(col: str) -> DQCheck:
    """No timestamps in the future (the reference's future-date rule —
    order dates beyond 'now' signal clock skew or bad parses)."""
    return DQCheck(
        f"no_future_{col}", "BusinessRule",
        F.sum(F.when(F.col(col) > F.current_timestamp(), 1).otherwise(0)),
        passes=lambda v: v == 0,
    )


def banded_row_count(min_expected: int) -> DQCheck:
    """Volume check with the reference's WARN band
    (notebooks/03:94-129): PASS at or above ``min_expected``, WARN down
    to 80% of it, FAIL below."""
    return DQCheck(
        "row_count", "Volume",
        F.count(F.lit(1)),
        passes=lambda v, m=min_expected: v >= 0.8 * m,
        warn=lambda v, m=min_expected: v < m,
    )


def reference_checks(
    min_rows: int = 1,
    key_cols: tuple[str, str] = ("invoice_id", "stock_code"),
) -> list[DQCheck]:
    """The reference's full rule catalog (18 checks / 5 categories:
    src/quality_checks.py:18-168 + notebooks/03_data_quality.py:94-357)
    over the curated invoice shape — 17 agg-pass checks here plus the
    dtype schema check run_checks appends when given EXPECTED_TYPES."""
    k1, k2 = key_cols
    return [
        banded_row_count(min_rows),
        *null_threshold_checks({
            "invoice_id": 0.0, "stock_code": 0.0, "quantity": 0.0,
            "unit_price": 0.0, "invoice_date": 0.0,
            "total_amount": 0.02,  # reference allows up to 2% null
            "customer_id": 0.0,  # post-GUEST-fill: must be none
            "country": 0.05, "description": 0.05,
        }),
        DQCheck(
            "duplicate_keys", "Uniqueness",
            F.count(F.lit(1)) - F.count_distinct(F.col(k1), F.col(k2)),
            lambda v: v == 0,
        ),
        DQCheck(
            "quantity_positive", "BusinessRule",
            F.sum(F.when(F.col("quantity") <= 0, 1).otherwise(0)),
            lambda v: v == 0,
        ),
        DQCheck(
            "unit_price_positive", "BusinessRule",
            F.sum(F.when(F.col("unit_price") <= 0, 1).otherwise(0)),
            lambda v: v == 0,
        ),
        DQCheck(
            "total_amount_positive", "BusinessRule",
            F.sum(F.when(F.col("total_amount") <= 0, 1).otherwise(0)),
            # reference treats nonpositive totals as WARN
            # (src/quality_checks.py:127-129)
            passes=lambda v: True, warn=lambda v: v > 0,
        ),
        range_check("invoice_year", 2009, 2025, fail=True),
        future_date_check("invoice_date"),
        membership_check(
            "price_bucket",
            ["very_low", "low", "medium", "high", "premium"],
        ),
    ]


def check_schema(df: DataFrame, expected) -> dict:
    """Schema check. ``expected`` as a list checks column NAMES
    (src/quality_checks.py:83-113); as a {name: dtype} dict it also
    checks simpleString dtypes (notebooks/03_data_quality.py:248-259 —
    catches upstream type drift, e.g. a column arriving as string)."""
    if isinstance(expected, dict):
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        missing = [c for c in expected if c not in actual]
        wrong = [
            f"{c}:{actual[c]}!={t}"
            for c, t in expected.items()
            if c in actual and actual[c] != t
        ]
        extra = [c for c in actual if c not in expected]
        status = "PASS" if not missing and not wrong else "FAIL"
        return {
            "check": "schema_types", "category": "Schema", "status": status,
            "metric": float(len(missing) + len(wrong)),
            "detail": f"missing={missing} wrong={wrong} extra={extra}",
        }
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

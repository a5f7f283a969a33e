"""Reference transform semantics on the reference's own unit fixture
(FIXTURES.md §C/§D shape: known defects — dup, negatives, null key)."""

import pytest
from pyspark.sql import functions as F

from e_commerce_batch_etl_pipeline_spark.etl.quality import (
    default_checks,
    run_checks,
    write_report,
)
from e_commerce_batch_etl_pipeline_spark.etl.transforms import (
    FINAL_COLUMNS,
    enrich_with_region,
    run_all_transforms,
)

RAW_SCHEMA = (
    "`Invoice` string, `StockCode` string, `Description` string, "
    "`Quantity` string, `InvoiceDate` string, `Price` string, "
    "`Customer ID` string, `Country` string"
)

ROWS = [
    # normal
    ("I-001", "S-1", "WIDGET", "2", "1/15/2024 10:30", "9.99", "C-9", "UK"),
    # duplicate business key, later date — deterministic winner
    ("I-001", "S-1", "WIDGET v2", "5", "1/16/2024 10:30", "9.99", "C-9", "UK"),
    # negative quantity → filtered
    ("I-002", "S-2", "GADGET", "-1", "1/15/2024 11:00", "5.00", "C-7", "France"),
    # negative price → filtered
    ("I-003", "S-3", "THING", "1", "1/15/2024 12:00", "-2.00", "C-7", "France"),
    # null customer → GUEST
    ("I-004", "S-4", "DOODAD", "3", "1/15/2024 13:00", "150.00", None, "Germany"),
    # null invoice_id → dropped
    (None, "S-5", "X", "1", "1/15/2024 14:00", "1.00", "C-1", "UK"),
    # cancellation
    ("C-006", "S-6", "RETURNED", "1", "1/15/2024 15:00", "0.50", "C-2", "Spain"),
    # unknown country → filtered
    ("I-007", "S-7", "Y", "1", "1/15/2024 16:00", "3.00", "C-3", "Unspecified"),
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(ROWS, RAW_SCHEMA)


def test_full_transform_chain(spark, raw):
    out = run_all_transforms(raw)
    assert out.columns == FINAL_COLUMNS
    rows = {(r["invoice_id"], r["stock_code"]): r for r in out.collect()}
    # dedup kept the later-dated row, deterministically
    assert rows[("I-001", "S-1")]["description"] == "WIDGET v2"
    assert rows[("I-001", "S-1")]["quantity"] == 5
    # filters dropped negatives / unknown country / null key
    assert ("I-002", "S-2") not in rows
    assert ("I-003", "S-3") not in rows
    assert ("I-007", "S-7") not in rows
    assert all(k[0] is not None for k in rows)
    # derived columns
    r4 = rows[("I-004", "S-4")]
    assert r4["customer_id"] == "GUEST"
    assert r4["total_amount"] == 450.0
    assert (r4["invoice_year"], r4["invoice_month"], r4["invoice_day"]) == (2024, 1, 15)
    assert r4["price_bucket"] == "premium"
    assert rows[("C-006", "S-6")]["is_return"] is True
    assert rows[("I-001", "S-1")]["is_return"] is False


def test_dedup_deterministic_any_partitioning(spark, raw):
    base = run_all_transforms(raw).orderBy("invoice_id", "stock_code").collect()
    for n in (1, 3, 7):
        got = run_all_transforms(raw.repartition(n)).orderBy(
            "invoice_id", "stock_code"
        ).collect()
        assert got == base


def test_enrich_with_region(spark, raw):
    region = spark.createDataFrame(
        [("UK", "Europe"), ("Germany", "Europe"), ("Spain", "Europe")],
        "country string, region string",
    )
    out = enrich_with_region(run_all_transforms(raw), region)
    got = {r["invoice_id"]: r["region"] for r in out.collect()}
    assert got["I-001"] == "Europe"
    # broadcast hint actually produced a broadcast join
    from e_commerce_batch_etl_pipeline_spark.plans import assert_broadcast_join

    assert_broadcast_join(out)


def test_dq_report_and_gate(spark, raw, tmpdir_clean):
    curated = run_all_transforms(raw)
    report, overall = run_checks(
        curated, default_checks(), expected_schema=FINAL_COLUMNS
    )
    assert overall == "PASS"
    statuses = {r["check"]: r["status"] for r in report.collect()}
    assert statuses["duplicate_keys"] == "PASS"
    assert statuses["schema_columns"] == "PASS"
    # sabotage: drop a column → schema FAIL gates the batch
    _, overall_bad = run_checks(
        curated.drop("price_bucket"), default_checks(),
        expected_schema=FINAL_COLUMNS,
    )
    assert overall_bad == "FAIL"
    # negative amounts → BusinessRule FAIL
    bad = curated.withColumn(
        "total_amount", F.col("total_amount") * F.lit(-1)
    )
    _, overall_neg = run_checks(bad, default_checks())
    assert overall_neg == "FAIL"
    # report JSON sink (single file, reference src/load.py:95-130)
    import glob
    import os

    write_report(report, os.path.join(tmpdir_clean, "dq"))
    files = glob.glob(os.path.join(tmpdir_clean, "dq", "*.json"))
    assert len(files) == 1


def test_reference_check_catalog(spark, raw):
    """The full 18-check / 5-category catalog (reference parity:
    src/quality_checks.py:18-168, notebooks/03_data_quality.py:94-357),
    still ONE aggregation pass + the dtype schema check."""
    from e_commerce_batch_etl_pipeline_spark.etl.quality import (
        reference_checks,
    )
    from e_commerce_batch_etl_pipeline_spark.etl.transforms import (
        EXPECTED_TYPES,
    )

    curated = run_all_transforms(raw)
    report, overall = run_checks(
        curated, reference_checks(min_rows=1), expected_schema=EXPECTED_TYPES
    )
    rows = report.collect()
    assert overall == "PASS"
    assert len(rows) == 18  # 17 agg checks + dtype schema check
    assert {r["category"] for r in rows} == {
        "Volume", "Completeness", "Uniqueness", "BusinessRule", "Schema"
    }
    statuses = {r["check"]: r["status"] for r in rows}
    assert statuses["schema_types"] == "PASS"
    assert statuses["null_pct_customer_id"] == "PASS"  # GUEST-filled
    assert statuses["no_future_invoice_date"] == "PASS"
    assert statuses["valid_price_bucket"] == "PASS"

    # dtype drift (quantity arrives as string) → schema_types FAIL
    drifted = curated.withColumn("quantity", F.col("quantity").cast("string"))
    rep2, overall2 = run_checks(
        drifted, reference_checks(min_rows=1), expected_schema=EXPECTED_TYPES
    )
    assert overall2 == "FAIL"
    s2 = {r["check"]: r["status"] for r in rep2.collect()}
    assert s2["schema_types"] == "FAIL"

    # volume WARN band (PASS >= min, WARN >= 0.8*min, FAIL below):
    # 10 rows vs min 12 → 83% → WARN; vs min 100 → FAIL
    from e_commerce_batch_etl_pipeline_spark.etl.quality import (
        banded_row_count,
    )

    ten = spark.range(10)
    _, ov_warn = run_checks(ten, [banded_row_count(12)])
    assert ov_warn == "WARN"
    _, ov_fail = run_checks(ten, [banded_row_count(100)])
    assert ov_fail == "FAIL"

    # membership WARN: inject an unknown bucket label
    poisoned = curated.withColumn(
        "price_bucket",
        F.when(F.col("invoice_id") == "I-001", "bogus")
        .otherwise(F.col("price_bucket")),
    )
    _, ov_member = run_checks(poisoned, [
        c for c in reference_checks() if c.name == "valid_price_bucket"
    ])
    assert ov_member == "WARN"

    # null-threshold 2x band: country nulls at ~25% of rows → >2*5% → FAIL
    nulled = curated.withColumn(
        "country",
        F.when(F.col("invoice_id") == "I-001", F.lit(None)).otherwise(
            F.col("country")
        ),
    )
    _, ov_null = run_checks(nulled, [
        c for c in reference_checks() if c.name == "null_pct_country"
    ])
    assert ov_null == "FAIL"


def test_membership_check_counts_nulls_as_violations(spark):
    """Review finding: ~isin(NULL) is NULL, which used to fall through
    to 0 — an all-NULL column must NOT pass a membership gate."""
    from e_commerce_batch_etl_pipeline_spark.etl.quality import (
        membership_check,
        run_checks,
    )

    df = spark.createDataFrame([(None,), (None,), ("ok",)], "status string")
    _, overall = run_checks(df, [membership_check("status", ["ok"],
                                                  fail=True)])
    assert overall == "FAIL"
    rep, _ = run_checks(df, [membership_check("status", ["ok"])])
    row = rep.collect()[0]
    assert row["metric"] == 2.0 and row["status"] == "WARN"

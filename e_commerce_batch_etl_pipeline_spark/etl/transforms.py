"""The reference pipeline's per-batch transform semantics, as a module.

Mirrors ``src/transform.py`` stage for stage (cited per function) so a
user of the reference can run the same batch body here; the CDC engine
reuses these semantics per microbatch (SURVEY.md §7.1). Differences on
purpose:
- dedup is deterministic (max_by over an explicit order — the reference's
  dropDuplicates keeps an arbitrary row, §2.4 D1);
- audit counts come from ONE pass (`observe`/single agg), not the
  reference's count()-per-stage re-executions (§3.1 step 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# src/transform.py:10-27 — snake_case renames
RENAMES = {
    "Invoice": "invoice_id",
    "StockCode": "stock_code",
    "Description": "description",
    "Quantity": "quantity",
    "InvoiceDate": "invoice_date_raw",
    "Price": "unit_price",
    "Customer ID": "customer_id",
    "Country": "country",
}

FINAL_COLUMNS = [
    "invoice_id", "stock_code", "description", "quantity", "unit_price",
    "total_amount", "invoice_date", "invoice_year", "invoice_month",
    "invoice_day", "customer_id", "country", "is_return", "price_bucket",
]

# dtype contract of the curated output (the DQ dtype-match schema check —
# notebooks/03_data_quality.py:248-259 — validates against this)
EXPECTED_TYPES = {
    "invoice_id": "string", "stock_code": "string", "description": "string",
    "quantity": "int", "unit_price": "double", "total_amount": "double",
    "invoice_date": "timestamp", "invoice_year": "int",
    "invoice_month": "int", "invoice_day": "int", "customer_id": "string",
    "country": "string", "is_return": "boolean", "price_bucket": "string",
}


def rename_columns(df: DataFrame, renames: dict[str, str] = None) -> DataFrame:
    """src/transform.py:10-27."""
    for old, new in (renames or RENAMES).items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def cast_types(df: DataFrame,
               ts_format: str = "M/d/yyyy H:mm") -> DataFrame:
    """src/transform.py:30-47 — quantity→int, price→double,
    string→timestamp with explicit pattern, drop the raw column."""
    return (
        df.withColumn("quantity", F.col("quantity").cast("int"))
        .withColumn("unit_price", F.col("unit_price").cast("double"))
        .withColumn(
            "invoice_date",
            F.to_timestamp(F.col("invoice_date_raw"), ts_format),
        )
        .drop("invoice_date_raw")
    )


def handle_nulls(df: DataFrame) -> DataFrame:
    """src/transform.py:50-70 — drop rows missing critical keys AND null
    quantity/unit_price (src/transform.py:60: measures are critical too —
    dropping them here also keeps a null-quantity duplicate from winning
    dedup_business_key and then being filtered away), default the rest
    (GUEST fill src/transform.py:62-65)."""
    df = df.dropna(subset=["invoice_id", "stock_code", "quantity", "unit_price"])
    df = df.withColumn(
        "customer_id",
        F.when(F.col("customer_id").isNull(), F.lit("GUEST")).otherwise(
            F.col("customer_id")
        ),
    )
    return df.fillna({"description": "UNKNOWN", "country": "Unspecified"})


def dedup_business_key(df: DataFrame) -> DataFrame:
    """src/transform.py:73-87 made deterministic: keep, per business key
    (invoice_id, stock_code), the row with max (invoice_date, quantity)
    — the docstring semantics the reference never implemented (§2.4 D1)."""
    payload = [c for c in df.columns if c not in ("invoice_id", "stock_code")]
    w = df.groupBy("invoice_id", "stock_code").agg(
        F.max_by(
            F.struct(*payload), F.struct("invoice_date", "quantity")
        ).alias("_w")
    )
    return w.select(
        "invoice_id", "stock_code",
        *[F.col(f"_w.{c}").alias(c) for c in payload],
    )


def filter_business_rules(df: DataFrame) -> DataFrame:
    """src/transform.py:90-112 — positive qty/price, parseable invoice
    date (the reference requires invoice_date IS NOT NULL; unparseable
    dates must not survive with null year/month/day), non-null
    description, known country."""
    return df.filter(
        (F.col("quantity") > 0)
        & (F.col("unit_price") > 0)
        & F.col("invoice_date").isNotNull()
        & F.col("description").isNotNull()
        & (F.col("country") != "Unspecified")
    )


def derive_columns(df: DataFrame) -> DataFrame:
    """src/transform.py:115-141 — money, date parts, cancellation flag,
    5-way price bucket."""
    return (
        df.withColumn(
            "total_amount",
            F.round(F.col("quantity") * F.col("unit_price"), 2),
        )
        .withColumn("invoice_year", F.year("invoice_date"))
        .withColumn("invoice_month", F.month("invoice_date"))
        .withColumn("invoice_day", F.dayofmonth("invoice_date"))
        .withColumn("is_return", F.col("invoice_id").startswith("C"))
        .withColumn(
            "price_bucket",
            F.when(F.col("unit_price") < 1, "very_low")
            .when(F.col("unit_price") < 5, "low")
            .when(F.col("unit_price") < 20, "medium")
            .when(F.col("unit_price") < 100, "high")
            .otherwise("premium"),
        )
    )


def select_final(df: DataFrame) -> DataFrame:
    """src/transform.py:145-165 — pin the curated 14-column schema."""
    return df.select(*FINAL_COLUMNS)


def run_all_transforms(df: DataFrame) -> DataFrame:
    """src/transform.py:168-184 — the full chain, lazily (no per-stage
    count() jobs; use df.observe for audit metrics instead)."""
    df = rename_columns(df)
    df = cast_types(df)
    df = handle_nulls(df)
    df = dedup_business_key(df)
    df = filter_business_rules(df)
    df = derive_columns(df)
    return select_final(df)


def enrich_with_region(df: DataFrame, region_df: DataFrame) -> DataFrame:
    """src/pipeline.py:61-99 — broadcast left join on country, default
    region 'Other' (src/pipeline.py:96)."""
    return df.join(F.broadcast(region_df), on="country", how="left").fillna(
        {"region": "Other"}
    )

"""Deterministic, distributed synthetic data generator.

Shape per FIXTURES.md §A/§B (BASELINE.json input_hint): base lake table
``docs(doc_id, tokens:array<int32>, n_tok:int32, source)`` + WAL/binlog
change epochs ``(lsn, epoch, op, doc_id, tokens, n_tok, source, ts)``.

Reference analog: ``data/sample/generate_sample.py:108-154`` and
``notebooks/01_data_ingestion.py:77-165`` generate seeded defect-injected
CSVs *single-threaded on the driver* (500K rows ≈ 2-3 min). This generator
is distributed and O(n): ``spark.range(n)`` partitions the id space across
executors and every value is a pure function of ``xxhash64(seed, id, tag)``
— bit-identical regardless of partitioning, cluster size, or retry
(no ``random`` in executors), so it scales to the 10^10-event shape.

Defect injection (rates mirror the reference generator):
- ~70% of change keys hit existing docs, ~30% are new keys
- hot keys: ``hot_key_frac`` of all changes hit ``num_hot_keys`` doc_ids
  (skew fixture — SURVEY.md §5.4)
- ~1% invalid envelopes (null doc_id / bad op / empty tokens on I/U)
- ~10% null-or-wrong n_tok (engine must recompute — derive-if-missing)
- multiple ops on the same doc_id within an epoch (LWW must pick max lsn)
- from ``evolve_from_epoch`` onward envelopes carry an extra nullable
  ``lang`` column (schema-evolution fixture)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = ["web", "books", "code", "wiki"]
LANGS = ["en", "de", "fr", "es", "zh"]
VOCAB = 50257


def _h(seed: int, tag: str, *cols):
    """Deterministic 64-bit hash of (seed, tag, *cols)."""
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _hmod(seed: int, tag: str, mod, *cols):
    return F.pmod(_h(seed, tag, *cols), F.lit(mod))


def _tokens_expr(seed: int, key_col, max_len: int):
    """array<int32> of hash-derived tokens; length in [1, max_len]."""
    length = (_hmod(seed, "len", max_len, key_col) + 1).cast("int")
    return F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.pmod(F.xxhash64(F.lit(seed), F.lit("tok"), key_col, i),
                         F.lit(VOCAB)).cast("int"),
    )


def generate_base_docs(
    spark: SparkSession, n: int, seed: int = 42, max_len: int = 256
) -> DataFrame:
    """Base docs table: n rows, doc_id = doc_<0-padded idx>."""
    df = spark.range(n).withColumn(
        "doc_id", F.format_string("doc_%09d", F.col("id"))
    )
    toks = _tokens_expr(seed, F.col("doc_id"), max_len)
    src_arr = F.array(*[F.lit(s) for s in SOURCES])
    return df.select(
        "doc_id",
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.element_at(src_arr, (_hmod(seed, "src", len(SOURCES), F.col("doc_id")) + 1)
                     .cast("int")).alias("source"),
    ).withColumn("tokens", F.col("tokens").cast("array<int>"))


def generate_wal_epoch(
    spark: SparkSession,
    epoch: int,
    changes_per_epoch: int,
    base_n: int,
    seed: int = 42,
    max_len: int = 256,
    num_hot_keys: int = 2,
    hot_key_frac: float = 0.20,
    invalid_frac: float = 0.01,
    bad_ntok_frac: float = 0.10,
    new_key_frac: float = 0.30,
    delete_frac: float = 0.10,
    evolve_from_epoch: int | None = None,
) -> DataFrame:
    """One epoch of WAL envelopes; lsn globally monotonic across epochs."""
    stride = changes_per_epoch
    df = spark.range(changes_per_epoch).select(
        (F.lit(epoch) * F.lit(stride) + F.col("id")).alias("lsn"),
        F.lit(epoch).cast("int").alias("epoch"),
        F.col("id"),
    )
    u = lambda tag, mod: _hmod(seed, tag, mod, F.col("lsn"))  # noqa: E731

    # --- key choice: hot / existing / new ---
    hot_idx = u("hotpick", num_hot_keys)
    existing_idx = u("exist", base_n)
    new_idx = F.lit(base_n) + F.lit(epoch) * F.lit(stride) + F.col("id")
    is_hot = u("hot", 1000) < int(hot_key_frac * 1000)
    is_new = u("new", 1000) < int(new_key_frac * 1000)
    doc_idx = F.when(is_hot, hot_idx).when(is_new, new_idx).otherwise(existing_idx)
    doc_id = F.format_string("doc_%09d", doc_idx)

    # --- op: D for delete_frac, else I/U split (I vs U converge: upsert) ---
    is_del = u("del", 1000) < int(delete_frac * 1000)
    op = F.when(is_del, F.lit("D")).when(u("iu", 2) == 0, F.lit("I")).otherwise(F.lit("U"))

    toks = F.when(is_del, F.lit(None)).otherwise(
        _tokens_expr(seed + epoch + 1, F.col("lsn"), max_len)
    ).cast("array<int>")

    # --- n_tok: sometimes null or wrong on purpose (engine recomputes) ---
    bad_kind = u("badntok", 1000)
    n_tok = (
        F.when(is_del, F.lit(None))
        .when(bad_kind < int(bad_ntok_frac * 500), F.lit(None))
        .when(bad_kind < int(bad_ntok_frac * 1000), F.size(toks) + 7)
        .otherwise(F.size(toks))
    ).cast("int")

    src_arr = F.array(*[F.lit(s) for s in SOURCES])
    source = F.when(is_del, F.lit(None)).otherwise(
        F.element_at(src_arr, (u("src2", len(SOURCES)) + 1).cast("int"))
    )

    # --- invalid envelopes: quarantine fixtures ---
    inv_kind = u("invkind", 3)
    is_invalid = u("inv", 1000) < int(invalid_frac * 1000)
    doc_id = F.when(is_invalid & (inv_kind == 0), F.lit(None)).otherwise(doc_id)
    op = F.when(is_invalid & (inv_kind == 1), F.lit("X")).otherwise(op)
    toks = F.when(is_invalid & (inv_kind == 2), F.array().cast("array<int>")).otherwise(toks)

    ts = F.timestamp_seconds(F.lit(1704067200) + F.col("lsn"))

    out = df.select(
        "lsn",
        "epoch",
        op.alias("op"),
        doc_id.alias("doc_id"),
        toks.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
        ts.alias("ts"),
    )
    if evolve_from_epoch is not None and epoch >= evolve_from_epoch:
        lang_arr = F.array(*[F.lit(x) for x in LANGS])
        out = out.withColumn(
            "lang",
            F.when(is_del | is_invalid, F.lit(None)).otherwise(
                F.element_at(lang_arr, (u("lang", len(LANGS)) + 1).cast("int"))
            ),
        )
    return out


def write_wal(
    spark: SparkSession,
    wal_root: str,
    num_epochs: int,
    changes_per_epoch: int,
    base_n: int,
    seed: int = 42,
    **kwargs,
) -> None:
    """Materialize WAL segments: one parquet dir per epoch."""
    os.makedirs(wal_root, exist_ok=True)
    for e in range(num_epochs):
        df = generate_wal_epoch(
            spark, e, changes_per_epoch, base_n, seed=seed, **kwargs
        )
        df.write.mode("overwrite").parquet(os.path.join(wal_root, f"epoch-{e:05d}"))

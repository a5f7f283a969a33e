"""PySpark-native CDC / incremental-ingest engine.

A from-scratch engine with the query and data-processing capabilities of
``tishant24/E-Commerce-Batch-ETL-Pipeline`` (studied at /root/reference),
re-expressed Spark-first per SURVEY.md:

- ``tables``     — Iceberg-shaped lake table format (snapshot manifests,
                   atomic pointer swap, fence-set idempotency, schema
                   evolution as metadata-only DDL).
- ``sources``    — schema-pinned readers (CSV/Parquet/JSON), WAL segment
                   scan with LSN watermark, deterministic datagen.
- ``operators``  — LWW dedup (windowed + salted two-stage), MERGE upsert,
                   dedup family (exact/minhash/simhash/ngram), similarity
                   search, data-quality checks.
- ``functions``  — vectorized token validation (Arrow/pandas UDF), text
                   analysis, multimodal column plumbing.
- ``streaming``  — the epoch microbatch loop: checkpointed replay with
                   per-partition lineage + metrics, exactly-once commits.
- ``plans``      — physical-plan assertions (no per-row Python, pushdown,
                   broadcast) used by tests/CI.
- ``etl``        — the reference pipeline's per-batch transform semantics
                   (rename/cast/filter/dedup/derive/enrich/DQ-gate).
"""

__version__ = "0.1.0"

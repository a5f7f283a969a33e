"""Changes-feed long-range soak (round-3 verdict item 7): 50+ committed
versions with a rebucket and a schema evolution mid-range; the
incrementally-maintained rollup must equal a direct aggregate at EVERY
step, and one single long-range feed spanning all of it must land on the
same state."""

import os

from pyspark.sql import functions as F

from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs,
    write_wal,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import bootstrap_table
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine
from e_commerce_batch_etl_pipeline_spark.tables.maintenance import rebucket
from e_commerce_batch_etl_pipeline_spark.tables.rollup import incremental_rollup

EPOCHS = 50
REBUCKET_AT = 20   # 4 -> 8 buckets mid-range
EVOLVE_FROM = 35   # envelopes carry the extra 'lang' column from here


def _agg(df):
    return df.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_tok").cast("long").alias("total"),
    )


def _rows(df):
    return {(r["source"], r["n"], r["total"]) for r in df.collect()}


def test_long_range_feed_50_versions(spark, tmpdir_clean):
    base = generate_base_docs(spark, 400, seed=11, max_len=8)
    table = bootstrap_table(
        os.path.join(tmpdir_clean, "t"), base, num_buckets=4
    )
    wal_root = os.path.join(tmpdir_clean, "wal")
    write_wal(spark, wal_root, EPOCHS, 120, 400, seed=11, max_len=8,
              evolve_from_epoch=EVOLVE_FROM)
    eng = CdcEngine(
        spark, table, WalSource(wal_root),
        os.path.join(tmpdir_clean, "ckpt"),
        merge_mode="mor", mor_compact_files=8,
    )
    v0 = table.current().version
    state0 = _agg(table.read(spark)).localCheckpoint()
    state = state0
    v_prev = v0
    for step in range(EPOCHS):
        res = eng.run(max_epochs=1)
        assert res and res[-1].status == "committed", f"step {step}: {res}"
        if step == REBUCKET_AT:
            rebucket(table, spark, new_buckets=8)
        v_now = table.current().version
        state = incremental_rollup(
            table, spark, v_prev, v_now, state, "source", "n_tok"
        ).localCheckpoint()
        assert _rows(state) == _rows(_agg(table.read(spark))), (
            f"rollup diverged at step {step} "
            f"(v{v_prev}->v{v_now}, rebucket={step == REBUCKET_AT}, "
            f"evolved={step >= EVOLVE_FROM})"
        )
        v_prev = v_now

    # layout + schema actually changed mid-range
    snap = table.current()
    assert snap.num_buckets == 8
    assert snap.props.get("rebucketed_from") == 4
    assert any(f[0] == "lang" for f in snap.schema.fields)
    assert snap.version - v0 >= EPOCHS + 1  # 50 epochs + rebucket

    # ONE feed spanning all 50+ versions (incl. the rebucket and the
    # evolution) maintains v0's state to the final state in a single
    # incremental_rollup call
    long_state = incremental_rollup(
        table, spark, v0, snap.version, state0, "source", "n_tok"
    )
    assert _rows(long_state) == _rows(_agg(table.read(spark)))

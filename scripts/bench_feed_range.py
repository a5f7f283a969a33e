"""Changes-feed read cost vs version-range length (round-3 verdict
item 7 — BASELINE.md records the result).

Builds a 50-version table (MOR, inline compaction budget 8) and times
``changes_between`` + an ``incremental_rollup`` maintained from it over
version ranges of increasing length. What this certifies at scale: feed
cost must track the CHANGES in the range (file-pruned to buckets whose
file sets differ), not the table size or the number of intermediate
versions — a feed that replays version-by-version would scale O(range),
this one diffs the two endpoint snapshots directly.

Run:  python scripts/bench_feed_range.py [--scale-div N]
Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_batch_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale-div", type=int, default=1)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    base_n = 200_000 // args.scale_div
    per_epoch = 20_000 // args.scale_div
    epochs = 50
    buckets = 32

    spark = build_session(master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores)
    from pyspark.sql import functions as F

    from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
        generate_base_docs,
        write_wal,
    )
    from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
    from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
        bootstrap_table,
    )
    from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import (
        CdcEngine,
    )
    from e_commerce_batch_etl_pipeline_spark.tables.rollup import (
        incremental_rollup,
    )

    root = tempfile.mkdtemp(prefix="feed_range_")
    out: dict = {
        "base_n": base_n, "changes_per_epoch": per_epoch,
        "epochs": epochs, "buckets": buckets,
        "master": f"local[{args.cores}]",
    }
    try:
        base = generate_base_docs(spark, base_n, seed=3, max_len=32)
        table = bootstrap_table(
            os.path.join(root, "t"), base, num_buckets=buckets
        )
        write_wal(spark, os.path.join(root, "wal"), epochs, per_epoch,
                  base_n, seed=3, max_len=32)
        eng = CdcEngine(
            spark, table, WalSource(os.path.join(root, "wal")),
            os.path.join(root, "ckpt"), merge_mode="mor",
            mor_compact_files=8,
        )
        versions = [table.current().version]
        t0 = time.time()
        for _ in range(epochs):
            eng.run(max_epochs=1)
            versions.append(table.current().version)
        out["ingest_sec"] = round(time.time() - t0, 1)
        v_final = versions[-1]

        def agg(df):
            return df.groupBy("source").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("n_tok").cast("long").alias("total"),
            )

        ranges = {}
        for span in (1, 5, 10, 25, 50):
            v_from = versions[-1 - span]
            t = time.time()
            feed_rows = table.changes_between(spark, v_from, v_final).count()
            feed_sec = time.time() - t
            state_from = agg(
                table.read(spark, snapshot=table.snapshot_at(v_from))
            ).localCheckpoint()
            t = time.time()
            maintained = incremental_rollup(
                table, spark, v_from, v_final, state_from,
                "source", "n_tok",
            )
            got = {(r["source"], r["n"], r["total"])
                   for r in maintained.collect()}
            roll_sec = time.time() - t
            want = {(r["source"], r["n"], r["total"])
                    for r in agg(table.read(spark)).collect()}
            assert got == want, f"rollup diverged over span {span}"
            ranges[str(span)] = {
                "feed_rows": feed_rows,
                "feed_sec": round(feed_sec, 2),
                "rollup_sec": round(roll_sec, 2),
            }
        out["ranges"] = ranges
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

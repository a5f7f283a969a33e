"""lakefeed cost shape: planning vs range length, increment-read
flatness, and the Python-DataSource Arrow hop vs a native JVM scan.

Builds a MOR table with many small commits, then measures:
- ``plan_ms``: driver-side ``_plan_versions`` cost for ranges of
  1/¼/½/full chain length — expected linear in VERSIONS (snapshot JSON
  parses; manifests LRU-cached), never in table size;
- ``increment_read_sec``: one-version batch read at the START vs the
  END of the chain — expected flat (O(changes) per increment: the
  reader plans exactly that commit's delta files, the table's growth is
  irrelevant);
- ``full_feed``: whole-changelog batch read throughput through the
  DataSource (rows/s), and the same files scanned natively
  (``spark.read.parquet`` + literal metadata columns) — the delta is
  the Python-worker Arrow hop, i.e. what the DS surface costs over raw
  JVM parquet for batch use (streaming has no native alternative).

Run:  python scripts/bench_feed_datasource.py [--scale-div N]
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
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    base_n = 200_000 // args.scale_div
    per_epoch = 20_000 // args.scale_div

    spark = build_session(master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores)
    from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
        generate_base_docs,
        write_wal,
    )
    from e_commerce_batch_etl_pipeline_spark.sources.feed_datasource import (
        LakeFeedDataSource,
        _plan_versions,
    )
    from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
    from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
        bootstrap_table,
    )
    from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import (
        CdcEngine,
    )

    root = tempfile.mkdtemp(prefix="bench_feed_ds_")
    try:
        wal = os.path.join(root, "wal")
        write_wal(spark, wal, args.epochs, per_epoch, base_n, seed=7,
                  max_len=48)
        base = generate_base_docs(spark, base_n, seed=7, max_len=48)
        table = bootstrap_table(os.path.join(root, "t"), base,
                                num_buckets=args.buckets)
        CdcEngine(
            spark, table, WalSource(wal), os.path.join(root, "c"),
            merge_mode="mor", mor_compact_files=None,
        ).run()
        head = table.current().version
        spark.dataSource.register(LakeFeedDataSource)

        def read_range(fv, tv):
            return (
                spark.read.format("lakefeed")
                .option("root", table.root)
                .option("startingVersion", fv)
                .option("endingVersion", tv).load()
            )

        # planning cost vs range length (driver/runner-side, no data)
        plan_ms = {}
        for span in sorted({1, head // 4, head // 2, head - 1}):
            t0 = time.monotonic()
            parts = _plan_versions(table.root, head - span, head)
            plan_ms[str(span)] = round(
                (time.monotonic() - t0) * 1000, 1
            )
            assert parts
        # increment-read flatness: one version near the chain's start vs
        # its end (same change volume; table 40× bigger at the end).
        # warm-up read first so neither side pays session/registration
        # costs
        read_range(2, 3).count()
        t0 = time.monotonic()
        n_first = read_range(1, 2).count()
        first_sec = time.monotonic() - t0
        t0 = time.monotonic()
        n_last = read_range(head - 1, head).count()
        last_sec = time.monotonic() - t0

        # full changelog: DataSource vs native JVM scan of the SAME
        # files (startingVersion=1 excludes the bootstrap base so both
        # sides read exactly the delta set)
        t0 = time.monotonic()
        total = read_range(1, head).count()
        ds_sec = time.monotonic() - t0
        delta_paths = [
            os.path.join(table.root, f["path"])
            for f in table.current().files if f.get("kind") == "delta"
        ]
        t0 = time.monotonic()
        native = spark.read.parquet(*delta_paths).count()
        native_sec = time.monotonic() - t0

        print(json.dumps({
            "metric": "bench_feed_datasource",
            "versions": head,
            "buckets": args.buckets,
            "changelog_rows": total,
            "plan_ms_by_range": plan_ms,
            "increment_read_sec": {
                "early_chain": round(first_sec, 2),
                "late_chain": round(last_sec, 2),
                "rows": [n_first, n_last],
            },
            "full_feed": {
                "datasource_sec": round(ds_sec, 2),
                "datasource_rows_per_sec": int(total / ds_sec),
                "native_parquet_sec": round(native_sec, 2),
                "arrow_hop_overhead_x": round(ds_sec / native_sec, 2),
                "native_rows": native,
            },
        }))
        assert total == native  # same delta set both ways
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

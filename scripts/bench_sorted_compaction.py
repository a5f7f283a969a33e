"""Key-range scan latency on an unsorted vs sort-order-compacted
layout (round-5 sorted compaction — BASELINE.md records the result).

Builds a table, ingests a few epochs, then measures the same narrow
``read(key_range=...)`` scan twice: after a plain fold (one file per
bucket — each file spans the bucket's whole hash-scattered key range,
so range pruning cannot drop ANY file) and after a sort-order fold
(``compact(sort_by_key=True, target_rows_per_file=N)`` — files hold
contiguous disjoint key ranges, so a narrow range plans at most one
file per bucket out of many). Row-set equality is asserted between the
two layouts.

What this certifies at scale: range-scan cost on a compacted table
must track the number of files whose key range can OVERLAP the
request, not the table's total file count — the same reason Iceberg
pairs rewrite_data_files with a sort order. Without the sort, manifest
range stats are useless on folded tables (every file's [min, max]
covers everything).

Run:  python scripts/bench_sorted_compaction.py [--scale-div N]
Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_batch_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale-div", type=int, default=1)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--target-rows-per-file", type=int, default=None,
                    help="default: ~8 files per bucket")
    ap.add_argument("--base-n", type=int, default=None)
    ap.add_argument("--max-len", type=int, default=32)
    args = ap.parse_args()

    base_n = (args.base_n or 2_000_000) // args.scale_div
    per_epoch = 100_000 // args.scale_div
    target = args.target_rows_per_file or max(
        1000, base_n // args.buckets // 8
    )

    spark = build_session(master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores)
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
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        compact,
    )

    root = tempfile.mkdtemp(prefix="bench_sorted_")
    try:
        base = generate_base_docs(spark, base_n, seed=7, max_len=args.max_len)
        table = bootstrap_table(
            os.path.join(root, "t"), base, num_buckets=args.buckets
        )
        write_wal(spark, os.path.join(root, "wal"), args.epochs,
                  per_epoch, base_n, seed=7, max_len=args.max_len)
        CdcEngine(
            spark, table, WalSource(os.path.join(root, "wal")),
            os.path.join(root, "ckpt"), merge_mode="mor",
            mor_compact_files=None, audit_quarantine=False,
        ).run()

        # ~1% of the key space, mid-range (base keys are doc_%09d)
        lo = "doc_%09d" % (base_n // 2)
        hi = "doc_%09d" % (base_n // 2 + base_n // 100)

        from pyspark.sql import functions as F

        def timed_range_scan():
            times, files, rows = [], None, None
            for _ in range(3):
                t0 = time.monotonic()
                df = table.read(spark, key_range=(lo, hi))
                # aggregate over the heavy payload column so the scan
                # actually reads it — count() alone column-prunes to the
                # key and hides the I/O difference between layouts
                a = df.agg(
                    F.count("*").alias("c"),
                    F.sum(F.size("tokens")).alias("s"),
                ).collect()[0]
                rows = (a["c"], a["s"])
                times.append(time.monotonic() - t0)
                files = df.inputFiles()
            # planned I/O = manifest rows of the files the scan planned
            # (the number that matters at 100 TB: bytes touched, not
            # wall sec on a warm local SSD)
            snap = table.current()
            planned = {os.path.basename(p) for p in files}
            planned_rows = sum(
                f["rows"] for f in snap.files
                if os.path.basename(f["path"]) in planned
            )
            return statistics.median(times), len(files), rows, planned_rows

        out = {"metric": "sorted_compaction_range_scan",
               "base_n": base_n, "buckets": args.buckets,
               "epochs": args.epochs, "target_rows_per_file": target,
               "range": [lo, hi], "layouts": {}}

        def measure(label):
            t, f, r, pr = timed_range_scan()
            snap = table.current()
            total_rows = sum(e["rows"] for e in snap.files)
            out["layouts"][label] = {
                "live_files": len(snap.files), "planned_files": f,
                "planned_rows": pr,
                "scan_fraction": round(pr / total_rows, 4),
                "sec": round(t, 3), "rows": r[0], "sum_tok": r[1],
            }
            return r

        assert compact(table, spark, max_files_per_bucket=0) is not None
        rows_unsorted = measure("unsorted_fold")

        assert compact(table, spark, max_files_per_bucket=0,
                       sort_by_key=True,
                       target_rows_per_file=target) is not None
        r = measure("sorted_fold")
        assert r == rows_unsorted, "sorted layout changed the result!"
        u, s = out["layouts"]["unsorted_fold"], out["layouts"]["sorted_fold"]
        out["speedup"] = round(u["sec"] / s["sec"], 2) if s["sec"] else None
        out["io_reduction"] = (
            round(u["planned_rows"] / s["planned_rows"], 1)
            if s["planned_rows"] else None
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

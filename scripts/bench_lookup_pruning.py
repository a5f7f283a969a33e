"""Point-lookup latency under high pending-delta counts, with vs
without per-file manifest key stats (round-4 verdict items 6/7 —
BASELINE.md records the result).

Builds a deferred-compaction MOR table (every epoch leaves its delta
files pending) and times ``lookup`` for (a) a freshly-inserted key and
(b) an old base key, twice each: against the real snapshot (file-level
stats pruning live) and against the SAME snapshot with the stats
stripped from its entries (bit-identical to the pre-stats read path —
pruning no-ops on entries without min/max). Also reports planned file
counts via ``inputFiles``.

What this certifies at scale: a serving lookup's cost must track the
number of files that can CONTAIN the key, not the bucket's total
pending-delta count. Fresh-insert lookups prune every base file and
every delta epoch below the key's insert epoch (monotone new-key ids);
old-key lookups keep base + the deltas whose random-update span covers
the key — the layout-dependence is the honest shape of min/max pruning
(Iceberg manifest column stats behave the same way).

Run:  python scripts/bench_lookup_pruning.py [--scale-div N]
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
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    base_n = 400_000 // args.scale_div
    per_epoch = 40_000 // args.scale_div
    epochs = args.epochs
    buckets = args.buckets

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
    from e_commerce_batch_etl_pipeline_spark.tables.format import Snapshot

    root = tempfile.mkdtemp(prefix="bench_lookup_")
    try:
        base = generate_base_docs(spark, base_n, seed=5, max_len=32)
        table = bootstrap_table(
            os.path.join(root, "t"), base, num_buckets=buckets
        )
        write_wal(spark, os.path.join(root, "wal"), epochs, per_epoch,
                  base_n, seed=5, max_len=32)
        eng = CdcEngine(
            spark, table, WalSource(os.path.join(root, "wal")),
            os.path.join(root, "ckpt"), merge_mode="mor",
            mor_compact_files=None,  # deferred → deltas pile up
        )
        eng.run()
        snap = table.current()
        n_delta = sum(1 for f in snap.files if f.get("kind") == "delta")

        stripped = Snapshot(
            version=snap.version, schema=snap.schema,
            key_column=snap.key_column, num_buckets=snap.num_buckets,
            files=[
                {k: v for k, v in f.items()
                 if k not in ("min_key", "max_key", "min_lsn", "max_lsn")}
                for f in snap.files
            ],
            fences=snap.fences, watermark=snap.watermark,
            min_fenced_epoch=snap.min_fenced_epoch, parent=snap.parent,
        )

        # the HIGHEST live key (a late-epoch new-key insert — the serving
        # hot path: look up what just landed) and an old base key
        from pyspark.sql import functions as F

        fresh_key = (
            table.read(spark).agg(F.max("doc_id")).collect()[0][0]
        )
        old_key = "doc_%09d" % 12345

        def timed_lookup(key, use_snap):
            times, files, found = [], None, None
            for _ in range(3):
                t0 = time.monotonic()
                df = table.lookup(spark, [key], snapshot=use_snap)
                found = df.count()
                times.append(time.monotonic() - t0)
                files = len(df.inputFiles())
            return statistics.median(times), files, found

        out = {"metric": "lookup_pruning", "buckets": buckets,
               "epochs": epochs, "pending_delta_files": n_delta,
               "rows": {}}
        for label, key in (("fresh_insert", fresh_key), ("old_base", old_key)):
            t_on, f_on, found_on = timed_lookup(key, snap)
            t_off, f_off, found_off = timed_lookup(key, stripped)
            out["rows"][label] = {
                "key": key, "found": found_on,
                "stats_on": {"sec": round(t_on, 3), "files": f_on},
                "stats_off": {"sec": round(t_off, 3), "files": f_off},
                "speedup": round(t_off / t_on, 2) if t_on > 0 else None,
                "file_reduction": round(f_off / f_on, 1) if f_on else None,
            }
            assert found_on == found_off, "pruning changed the result!"
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Follow-mode soak: the tail loop against a LIVE landing zone.

A writer thread lands WAL segments on an interval (atomic rename of a
pre-generated staging dir — the shape of a Debezium/binlog landing zone
filling up on object storage) while ``CdcEngine.follow`` tails the WAL
in merge-on-read mode with per-file key Bloom filters on every delta.
After the writer finishes and the tail drains, background-style
compaction folds the deltas (sorted, blooms collected) and the table is
write-verified.

What this certifies beyond tests/test_follow.py's unit scenarios:
- the tail KEEPS UP: per-epoch commit lag (lineage-file mtime − segment
  land time) stays bounded and flat while the table grows — ingest cost
  tracks epoch size, not table size, exactly like the one-shot soaks;
- follow + delta_blooms + deferred compaction compose end-to-end
  (each feature's soak previously ran in isolation);
- a lookup after the drain hits the bloom-pruned path at real pending-
  delta counts, then the fold + verify close the loop.

Run:  python scripts/soak_follow.py [--scale-div N]
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
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_batch_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale-div", type=int, default=1)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--interval-sec", type=float, default=3.0)
    args = ap.parse_args()

    base_n = 500_000 // args.scale_div
    per_epoch = 100_000 // args.scale_div

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
        verify,
    )

    root = tempfile.mkdtemp(prefix="soak_follow_")
    try:
        stage = os.path.join(root, "stage")
        live = os.path.join(root, "wal")
        os.makedirs(live)
        write_wal(spark, stage, args.epochs, per_epoch, base_n, seed=13,
                  max_len=64)
        base = generate_base_docs(spark, base_n, seed=13, max_len=64)
        table = bootstrap_table(os.path.join(root, "t"), base,
                                num_buckets=args.buckets)
        ckpt = os.path.join(root, "ckpt")
        eng = CdcEngine(
            spark, table, WalSource(live), ckpt, merge_mode="mor",
            mor_compact_files=None, delta_blooms=True,
        )

        land_time: dict[int, float] = {}

        def writer():
            for e in range(args.epochs):
                name = f"epoch-{e:05d}"
                shutil.move(os.path.join(stage, name),
                            os.path.join(live, name))
                land_time[e] = time.monotonic()
                time.sleep(args.interval_sec)

        t_mono0 = time.monotonic()
        w = threading.Thread(target=writer)
        w.start()
        t0 = time.time()
        results = eng.follow(
            poll_sec=0.5,
            idle_timeout_sec=max(20.0, 4 * args.interval_sec),
        )
        tail_wall = time.time() - t0
        w.join()

        lags = []
        for e in range(args.epochs):
            lp = os.path.join(ckpt, "lineage", f"epoch-{e:05d}.json")
            # lineage mtime is wall-clock; convert land monotonic → wall
            commit_wall = os.path.getmtime(lp)
            land_wall = time.time() - (time.monotonic() - land_time[e])
            lags.append(commit_wall - land_wall)
        epoch_secs = [r.duration_sec for r in results
                      if r.status == "committed"]
        applied = sum(r.rows_applied for r in results)
        n_delta = sum(
            1 for f in table.current().files if f.get("kind") == "delta"
        )

        # bloom-pruned lookup at full pending-delta load, then drain
        from pyspark.sql import functions as F

        probe = table.read(spark).agg(F.max("doc_id")).collect()[0][0]
        t = time.monotonic()
        found = table.lookup(spark, [probe]).count()
        lookup_sec = time.monotonic() - t

        t = time.monotonic()
        while compact(table, spark, max_buckets_per_pass=args.buckets // 4,
                      sort_by_key=True,
                      target_rows_per_file=max(1, base_n // args.buckets // 4),
                      collect_blooms=True) is not None:
            pass
        fold_sec = time.monotonic() - t
        v = verify(table, spark)

        print(json.dumps({
            "metric": "soak_follow",
            "epochs": len(results),
            "events_applied": applied,
            "buckets": args.buckets,
            "tail_wall_sec": round(tail_wall, 1),
            "epoch_sec": {
                "median": round(statistics.median(epoch_secs), 2),
                "max": round(max(epoch_secs), 2),
            },
            "commit_lag_sec": {
                "median": round(statistics.median(lags), 2),
                "max": round(max(lags), 2),
            },
            "pending_deltas_at_drain": n_delta,
            "lookup_at_full_load": {
                "sec": round(lookup_sec, 3), "found": found,
            },
            "drain_fold_sec": round(fold_sec, 1),
            "verify_ok": bool(v.get("ok")),
            "final_rows": v.get("rows"),
        }))
        assert v.get("ok"), v
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Delta-only changes-feed fast path vs endpoint diff (round 5 —
BASELINE.md records the result).

Deferred-compaction MOR table; each measured range is delta-only, so
``changes_between`` takes the O(changes) fast path (LWW over added
delta files + one join against the FROM state). The forced-slow
comparison monkeypatches the range test off, running the SAME range
through the endpoint-snapshot diff (materialize both states, full-outer
join). Row-set equality is asserted per range via an untimed
order-independent all-column multiset checksum (count + xxhash64 sums),
not just count parity.

Run:  python scripts/bench_feed_fastpath.py [--scale-div N]
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
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    base_n = 1_000_000 // args.scale_div
    per_epoch = 100_000 // args.scale_div

    spark = build_session(master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores)
    from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
        generate_base_docs, write_wal,
    )
    from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
    from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
        bootstrap_table,
    )
    from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import (
        CdcEngine,
    )
    from e_commerce_batch_etl_pipeline_spark.tables.format import LakeTable

    root = tempfile.mkdtemp(prefix="bench_feed_fp_")
    try:
        base = generate_base_docs(spark, base_n, seed=3, max_len=48)
        table = bootstrap_table(os.path.join(root, "t"), base,
                                num_buckets=args.buckets)
        write_wal(spark, os.path.join(root, "wal"), args.epochs, per_epoch,
                  base_n, seed=3, max_len=48)
        eng = CdcEngine(
            spark, table, WalSource(os.path.join(root, "wal")),
            os.path.join(root, "ckpt"), merge_mode="mor",
            mor_compact_files=None,
        )
        eng.run()
        versions = table.history()
        v_last = versions[-1]
        orig = LakeTable._delta_only_range

        def timed(v1, v2, fast):
            if not fast:
                LakeTable._delta_only_range = staticmethod(
                    lambda *a, **k: False
                )
            try:
                times, n, sig = [], None, None
                for _ in range(3):
                    t0 = time.monotonic()
                    n = table.changes_between(spark, v1, v2).count()
                    times.append(time.monotonic() - t0)
                # untimed row-SET check (not just count parity): an
                # order-independent multiset checksum over every column,
                # so a fast path emitting the right number of wrong rows
                # (wrong op labels, stale payloads) fails the assert
                feed = table.changes_between(spark, v1, v2)
                from pyspark.sql import functions as F
                row = feed.select(
                    F.xxhash64(*sorted(feed.columns)).alias("h")
                ).agg(
                    F.count(F.lit(1)).alias("n"), F.sum("h").alias("s"),
                    F.sum(F.hash("h").cast("long")).alias("s2"),
                ).collect()[0]
                sig = (int(row["n"]), row["s"], row["s2"])
                return statistics.median(times), n, sig
            finally:
                # class-attr access unwraps the staticmethod; re-wrap on
                # restore or the plain function binds self (5-arg error)
                LakeTable._delta_only_range = staticmethod(orig)

        out = {"metric": "feed_fastpath", "buckets": args.buckets,
               "base_n": base_n, "per_epoch": per_epoch, "ranges": {}}
        for span in (1, 4, args.epochs - 1):
            v1 = versions[-1 - span]
            t_fast, n_fast, sig_fast = timed(v1, v_last, True)
            t_slow, n_slow, sig_slow = timed(v1, v_last, False)
            assert n_fast == n_slow, (span, n_fast, n_slow)
            assert sig_fast == sig_slow, (span, sig_fast, sig_slow)
            out["ranges"][f"span_{span}"] = {
                "net_changes": n_fast,
                "fast_sec": round(t_fast, 2),
                "endpoint_diff_sec": round(t_slow, 2),
                "speedup": round(t_slow / t_fast, 2),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Point-lookup file skipping from per-file key Bloom filters, measured
as the INCREMENT over round-5's min/max manifest stats (BASELINE.md
records the result).

Builds the same deferred-compaction MOR table as
bench_lookup_pruning.py but with ``delta_blooms=True``, then times
``lookup`` for three probe classes against (a) the real snapshot and
(b) the SAME snapshot with the bloom refs stripped (min/max stats stay
on in both — the control is exactly the round-5 read path):

- updated_key  — base key updated in EXACTLY ONE epoch: min/max keeps
  base + every pending delta in the bucket (random update keys span
  each delta's whole range); the bloom keeps base + the one delta that
  contains it.
- cold_key     — base key never updated: bloom skips every delta.
- absent_key   — inside the live key range but in no file: the serving
  miss path; bloom skips everything.

Also reports the write-side price: median epoch seconds for the same
ingest with delta_blooms on vs off (the extra O(changes) column-pruned
pass per epoch).

Run:  python scripts/bench_bloom_lookup.py [--scale-div N]
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
    from e_commerce_batch_etl_pipeline_spark.tables.format import Snapshot

    root = tempfile.mkdtemp(prefix="bench_bloom_")
    try:
        wal_dir = os.path.join(root, "wal")
        base = generate_base_docs(spark, base_n, seed=5, max_len=32)
        write_wal(spark, wal_dir, args.epochs, per_epoch, base_n, seed=5,
                  max_len=32)

        def ingest(name: str, blooms: bool):
            table = bootstrap_table(
                os.path.join(root, name), base, num_buckets=args.buckets
            )
            eng = CdcEngine(
                spark, table, WalSource(wal_dir),
                os.path.join(root, f"ckpt_{name}"), merge_mode="mor",
                mor_compact_files=None, delta_blooms=blooms,
            )
            epoch_secs = [r.duration_sec for r in eng.run()
                          if r.status == "committed"]
            # drop each run's first epoch (JVM/codegen warm-up — the
            # blooms-off run goes first and would otherwise absorb the
            # cold-start cost, understating the on/off overhead ratio)
            return table, epoch_secs[1:] or epoch_secs

        table_off, secs_off = ingest("t_off", blooms=False)
        table, secs_on = ingest("t_on", blooms=True)
        snap = table.current()
        n_delta = sum(1 for f in snap.files if f.get("kind") == "delta")

        stripped = Snapshot(
            version=snap.version, schema=snap.schema,
            key_column=snap.key_column, num_buckets=snap.num_buckets,
            files=[{k: v for k, v in f.items() if k != "bloom"}
                   for f in snap.files],
            fences=snap.fences, watermark=snap.watermark,
            min_fenced_epoch=snap.min_fenced_epoch, parent=snap.parent,
        )

        # probe keys from the WAL's actual update histogram
        wal_all = spark.read.parquet(
            *[os.path.join(wal_dir, d) for d in sorted(os.listdir(wal_dir))]
        )
        upd = (
            wal_all.filter(F.col("doc_id") < F.format_string(
                "doc_%09d", F.lit(base_n)))
            .groupBy("doc_id").count()
        )
        # mid-range probes: an extreme-low/high key would sit outside
        # many delta files' [min,max] span and hand min/max stats a win
        # they don't get for typical keys — the honest probe is one the
        # range stats CANNOT prune
        mid = "doc_%09d" % (base_n // 2)
        updated_key = (
            upd.filter(F.col("count") == 1).filter(F.col("doc_id") >= mid)
            .agg(F.min("doc_id").alias("k")).collect()[0]["k"]
        )
        cold_key = (
            spark.range(base_n // 2, base_n)
            .select(F.format_string("doc_%09d", F.col("id")).alias("doc_id"))
            .join(upd, "doc_id", "left_anti")
            .agg(F.min("doc_id").alias("k")).collect()[0]["k"]
        )
        assert updated_key and cold_key, "probe classes missing in WAL"
        absent_key = mid + "_"  # sorts inside the live range
        def timed_lookup(key, use_snap):
            times, files, found = [], None, None
            for _ in range(3):
                t0 = time.monotonic()
                df = table.lookup(spark, [key], snapshot=use_snap)
                found = df.count()
                times.append(time.monotonic() - t0)
                files = len(df.inputFiles())
            return statistics.median(times), files, found

        out = {
            "metric": "bloom_lookup_pruning", "buckets": args.buckets,
            "epochs": args.epochs, "pending_delta_files": n_delta,
            "ingest_epoch_sec": {
                "blooms_off": round(statistics.median(secs_off), 3),
                "blooms_on": round(statistics.median(secs_on), 3),
            },
            "rows": {},
        }
        for label, key in (("updated_key", updated_key),
                           ("cold_key", cold_key),
                           ("absent_key", absent_key)):
            t_on, f_on, found_on = timed_lookup(key, snap)
            t_off, f_off, found_off = timed_lookup(key, stripped)
            assert found_on == found_off, "bloom pruning changed the result!"
            out["rows"][label] = {
                "key": key, "found": found_on,
                "bloom_on": {"sec": round(t_on, 3), "files": f_on},
                "bloom_off": {"sec": round(t_off, 3), "files": f_off},
                "speedup": round(t_off / t_on, 2) if t_on > 0 else None,
                "file_reduction": round(f_off / f_on, 1) if f_on else None,
            }
        shutil.rmtree(os.path.join(root, "t_off"), ignore_errors=True)
        _ = table_off
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""CDC fan-out soak: a lakefeed SUBSCRIBER tails the table's changelog
while the engine is still ingesting — the full pipeline
``landing zone → follow-mode ingest → snapshot commits → Structured
Streaming changelog subscriber`` live, end to end, in one run.

A writer thread lands WAL segments on an interval; ``CdcEngine.follow``
tails them into a merge-on-read table; concurrently a
``readStream.format("lakefeed")`` query (processingTime trigger,
foreachBatch → parquet) subscribes to the table's committed changelog
from version 0 (so the bootstrap snapshot rides the first microbatch as
I rows, then every MOR commit streams as its delta content).

What this certifies beyond tests/test_feed_datasource.py:
- the subscriber KEEPS UP with live ingest: per-version delivery lag
  (foreachBatch receipt wall time − snapshot ``committed_at``) stays
  bounded while both the engine and the stream share one cluster;
- offset planning is stable against a MOVING table (latestOffset races
  commits; every version is delivered exactly once — the final parquet
  holds zero duplicate (doc_id, _lsn, _commit_version) rows and exactly
  base + Σ rows_applied rows);
- ingest and subscription COMPOSE: the engine's epoch cost stays flat
  while the subscriber's scans run against the same files.

Run:  python scripts/soak_feed_subscriber.py [--scale-div N]
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
    ap.add_argument("--publish-every-sec", type=float, default=0.0,
                    help="> 0: run the FULL write-audit-publish pipeline "
                         "live — a publisher thread audits (O(changes) "
                         "DQ predicate) and fast-forwards the published "
                         "ref on this interval, and the subscriber pins "
                         "to the ref, so it must only ever receive "
                         "audited versions")
    args = ap.parse_args()

    base_n = 500_000 // args.scale_div
    per_epoch = 100_000 // args.scale_div

    spark = build_session(master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores)
    from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
        generate_base_docs,
        write_wal,
    )
    from e_commerce_batch_etl_pipeline_spark.sources.feed_datasource import (
        LakeFeedDataSource,
    )
    from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
    from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
        bootstrap_table,
    )
    from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import (
        CdcEngine,
    )
    from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
        publish,
        verify,
    )

    root = tempfile.mkdtemp(prefix="soak_feed_")
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
            mor_compact_files=None,
        )

        # ---- subscriber: lakefeed stream → parquet, receipts recorded
        spark.dataSource.register(LakeFeedDataSource)
        sub_out = os.path.join(root, "sub_out")
        receipts: list[tuple[float, int, int]] = []  # (wall, max_v, rows)

        def on_batch(df, _bid):
            df.persist()
            per_v = df.groupBy("_commit_version").count().collect()
            df.write.mode("append").parquet(sub_out)
            df.unpersist()
            now = time.time()
            for r in per_v:
                receipts.append((now, int(r["_commit_version"]),
                                 int(r["count"])))

        wap = args.publish_every_sec > 0
        reader = (
            spark.readStream.format("lakefeed")
            .option("root", table.root)
            .option("startingVersion", 0)
        )
        if wap:
            reader = reader.option("ref", "published")
        q = (
            reader.load()
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", os.path.join(root, "sub_ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )

        # ---- WAP publisher: audit + fast-forward the ref on a cadence
        publishes: list[tuple[float, int]] = []  # (wall, version)
        stop_pub = threading.Event()

        def publisher():
            while not stop_pub.is_set():
                # skip idle ticks: publishing an unchanged head would
                # re-run the audit over the FULL state (publish treats
                # target <= ref as a rollback-style full-state audit)
                # and re-tag for nothing
                if table.current().version != table.ref("published"):
                    rep = publish(
                        table, spark,
                        audit_predicate="doc_id IS NOT NULL",
                        full_verify=False,
                    )
                    if rep["published"]:
                        publishes.append((time.time(), rep["to_version"]))
                stop_pub.wait(args.publish_every_sec)

        pub_thread = None
        if wap:
            publish(table, spark, full_verify=False)  # bootstrap cut
            publishes.append((time.time(), table.ref("published")))
            pub_thread = threading.Thread(target=publisher)
            pub_thread.start()

        # ---- producer + ingest, concurrent with the subscriber
        def writer():
            for e in range(args.epochs):
                name = f"epoch-{e:05d}"
                shutil.move(os.path.join(stage, name),
                            os.path.join(live, name))
                time.sleep(args.interval_sec)

        w = threading.Thread(target=writer)
        w.start()
        t0 = time.time()
        results = eng.follow(
            poll_sec=0.5,
            idle_timeout_sec=max(20.0, 4 * args.interval_sec),
        )
        tail_wall = time.time() - t0
        w.join()

        applied = sum(r.rows_applied for r in results)
        expected = base_n + applied
        head = table.current().version
        if wap:
            # final audited cut to the head so the subscriber can drain
            rep = publish(table, spark,
                          audit_predicate="doc_id IS NOT NULL",
                          full_verify=False)
            if rep["published"]:
                publishes.append((time.time(), rep["to_version"]))

        # ---- wait for the subscriber to drain the backlog, then stop
        deadline = time.time() + 120
        while time.time() < deadline:
            delivered = sum(n for _, _, n in receipts)
            if delivered >= expected and any(
                v == head for _, v, _ in receipts
            ):
                break
            time.sleep(0.5)
        if pub_thread is not None:
            stop_pub.set()
            pub_thread.join()
        q.stop()
        q.awaitTermination()

        # ---- exactly-once + lag accounting
        sub = spark.read.parquet(sub_out)
        total = sub.count()
        distinct = sub.select("doc_id", "_lsn", "_commit_version").distinct().count()
        committed_at = {
            v: table.snapshot_at(v).committed_at
            for v in range(1, head + 1)
        }
        lag_by_v = {}
        for wall, v, _n in receipts:
            if v in committed_at and v not in lag_by_v:
                lag_by_v[v] = wall - committed_at[v]
        # v1 is the bootstrap (committed before the stream started):
        # its "lag" measures stream startup, not delivery — report it
        # separately from the steady-state ingest commits
        steady = [lag_by_v[v] for v in sorted(lag_by_v) if v > 1]

        epoch_secs = [r.duration_sec for r in results
                      if r.status == "committed"] or [-1.0]
        if not steady:
            steady = [-1.0]  # subscriber stalled: report, don't crash —
            # the exactly-once assertion below is the actual verdict
        # WAP ordering: every delivered version must have been PUBLISHED
        # before its delivery (0.5 s clock slack between threads)
        wap_order_ok = None
        if wap:
            wap_order_ok = all(
                any(pt <= wall + 0.5 and pv >= ver for pt, pv in publishes)
                for wall, ver, _n in receipts
            )
        v = verify(table, spark)
        print(json.dumps({
            "metric": "soak_feed_subscriber",
            "epochs": len(results),
            "events_applied": applied,
            "buckets": args.buckets,
            "tail_wall_sec": round(tail_wall, 1),
            "engine_epoch_sec": {
                "median": round(statistics.median(epoch_secs), 2),
                "max": round(max(epoch_secs), 2),
            },
            "subscriber_rows": total,
            "subscriber_expected": expected,
            "exactly_once": bool(total == distinct == expected),
            "bootstrap_delivery_sec": round(lag_by_v.get(1, -1), 2),
            "delivery_lag_sec": {
                "median": round(statistics.median(steady), 2),
                "max": round(max(steady), 2),
                "versions": len(steady),
            },
            "wap": {
                "publishes": len(publishes),
                "order_ok": wap_order_ok,
            } if wap else None,
            "verify_ok": bool(v.get("ok")),
            "final_rows": v.get("rows"),
        }))
        assert total == distinct == expected, (total, distinct, expected)
        assert wap_order_ok is None or wap_order_ok, "unaudited delivery"
        assert v.get("ok"), v
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness.

Runs (1) headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], (2) the CDC replay
throughput benchmark (the BASELINE.json metric: sustained change-events/sec
into the lake table), and (3) the N→4N scaling protocol: identical replay
at local[N] vs local[4N] with eff = thr_4N / (4 × thr_N).

Scaling N defaults to 2 (→ 4N = 8): this box reports 32 vCPUs but they
are SMT siblings of ~16 physical cores with turbo-boost at low thread
counts — a calibration run of pure-CPU subprocesses measures the
machine's own ceiling at eff(8→32) ≈ 0.66 and eff(2→8) ≈ 0.87+, so only
the 2→8 range can evidence software scaling without the hardware
distorting the ratio. The calibration numbers are included in the output
(hw_calibration) so the engine's efficiency can be read against the
machine ceiling.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ...,
   "replay": {...events/sec...}, "scaling": {...eff...}}

Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  BENCH_SCALING_N      (default 2; scaling compares local[N] vs local[4N])
  BENCH_SKIP_SCALING=1 to skip the two-session scaling run (fast mode)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING_N = int(os.environ.get("BENCH_SCALING_N", "2"))
# replay parallelism capped at the physical core count: the 32 vCPUs are
# SMT pairs over ~16 cores, and the shuffle-heavy replay measurably
# degrades beyond 16 threads (local[16] ≈ 170k ev/s vs local[32] ≈ 70k)
REPLAY_CPUS = min(CPUS, 16)

# headline queries: one per operator family; the all-pairs jaccard verify
# is excluded (it is the LSH-candidate verify step, quadratic by design —
# bench covers its scale path, minhash LSH, instead)
HEADLINE = [
    "q1_pricing_summary",
    "etl_clean_filter",
    "etl_broadcast_enrich",
    "etl_dedup_lww",
    "etl_topk",
    "cdc_lww_latest",
    "cdc_merge_upsert",
    "window_running_sum",
    "sessionize",
    "tumbling_window_agg",
    "text_metrics",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_cosine_topk",
    "embed_lsh_signature",
    "multimodal_meta",
]

# replay benchmark shape (fixed input regardless of parallelism level);
# epoch 0 is an untimed warm-up (SURVEY.md §7.4 methodology)
REPLAY_BASE_N = 400_000
REPLAY_EPOCHS = 3          # 1 warm-up + 2 timed
REPLAY_CHANGES = 2_000_000
REPLAY_MAX_LEN = 96
REPLAY_BUCKETS = 64
# the scaling comparison uses BIGGER epochs (same input at both levels):
# per-epoch driver-side costs (job planning, commit, checkpoint) are
# constant, so small epochs understate scaling the way tiny microbatches
# would on a real cluster — 4M-event epochs put the serial share where a
# production batch size would. 1 warm-up + 3 individually-timed epochs
# per session; the two levels run back-to-back inside each attempt so
# they sample the same co-tenant noise regime, and efficiency is
# computed PER ATTEMPT (pairing the best epoch rate of each level from
# the same minute) — mixing best-of-level across minutes systematically
# favors whichever level caught a quiet minute. The HEADLINE efficiency
# is the MEDIAN of the attempts (5 shorter attempts rather than 2-3
# long ones: co-tenant spikes contaminate whole minutes, and a median
# over 5 tolerates two bad attempts where a median of 3 tolerates one);
# the best attempt is reported separately, labeled as such. The scaling job runs in
# merge-on-read mode — the steady-state mode for the 10^10 shape
# (O(changes) writes; CoW's touched-bucket rewrite amortizes epoch size
# instead of parallelism, so it measures table growth as much as cores).
SCALING_CHANGES = 4_000_000
SCALING_EPOCHS = 3
SCALING_ATTEMPTS = 5
# when the completed attempts disagree badly (spread > 0.15 between the
# attempt quartiles — a visibly contaminated window), run up to this
# many EXTRA attempts (budget permitting) so the median rests on more
# samples exactly when the machine is at its noisiest
SCALING_MAX_EXTRA = 2
# soft wall-clock budget for the WHOLE bench run: scaling attempts stop
# early (with however many completed, >= 1) rather than risk an external
# timeout killing the run before the JSON line prints
TIME_BUDGET_SEC = float(os.environ.get("BENCH_TIME_BUDGET_SEC", "1800"))


def build(master: str, shuffle: int):
    from e_commerce_batch_etl_pipeline_spark.session import build_session

    return build_session(
        app_name=f"bench-{master}",
        master=master,
        shuffle_partitions=shuffle,
        extra_conf={"spark.driver.memory": os.environ.get(
            "SPARK_DRIVER_MEMORY", "48g")},
    )


def run_headline(spark) -> dict[str, float]:
    from e_commerce_batch_etl_pipeline_spark.queries import QUERIES

    # JIT/codegen warm-up: touch each table once so the first timed query
    # doesn't absorb JVM warm-up (~3-4s)
    for t in ("lineitem", "orders", "customer", "nation", "region", "part",
              "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
    times = {}
    for name in HEADLINE:
        q = QUERIES[name]
        t0 = time.time()
        df = q(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        print(f"  {name}: {times[name]}s ({n} rows)", file=sys.stderr)
    return times


def prepare_replay_input(spark, root: str,
                         changes: int = REPLAY_CHANGES,
                         epochs: int = REPLAY_EPOCHS) -> None:
    from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
        generate_base_docs,
        write_wal,
    )

    base = generate_base_docs(spark, REPLAY_BASE_N, seed=42,
                              max_len=REPLAY_MAX_LEN)
    base.write.mode("overwrite").parquet(os.path.join(root, "base"))
    write_wal(
        spark,
        os.path.join(root, "wal"),
        epochs,
        changes,
        REPLAY_BASE_N,
        seed=42,
        max_len=REPLAY_MAX_LEN,
    )


def run_replay(spark, input_root: str, work_root: str,
               merge_mode: str = "cow",
               changes: int = REPLAY_CHANGES) -> dict:
    """Bootstrap + replay; returns sustained events/sec (replay loop only,
    bootstrap excluded per SURVEY.md §7.4 methodology).

    Quarantine ROW persistence (audit) is ON — the production default:
    since round 3 the audit lane rides the SAME staging job (validity is
    a flag column; invalid rows ride the one scan/shuffle/write tagged
    _q=1), measured at parity with audit-off (466k vs 467k ev/s,
    local[16] MOR — the round-1 separate audit job cost 32% at 8
    cores)."""
    from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
    from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
        bootstrap_table,
    )
    from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine

    base = spark.read.parquet(os.path.join(input_root, "base"))
    table = bootstrap_table(
        os.path.join(work_root, "table"), base, num_buckets=REPLAY_BUCKETS
    )
    eng = CdcEngine(
        spark,
        table,
        WalSource(os.path.join(input_root, "wal")),
        os.path.join(work_root, "ckpt"),
        merge_mode=merge_mode,
    )
    eng.run(max_epochs=1)  # warm-up epoch: JIT + code paths, untimed
    t0 = time.time()
    results = eng.run()
    wall = time.time() - t0
    events = len(results) * changes  # events ingested (incl. quarantined)
    return {
        "epochs": len(results),
        "events": events,
        "rows_applied": sum(r.rows_applied for r in results),
        "wall_sec": round(wall, 3),
        "events_per_sec": round(events / wall, 1),
    }


def run_scaling_replay(spark, input_root: str, work_root: str) -> float:
    """One warm-up epoch, then the remaining epochs timed INDIVIDUALLY;
    returns the best per-epoch events/sec (intra-session best damps
    co-tenant noise without mixing measurement minutes)."""
    from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
    from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
        bootstrap_table,
    )
    from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine

    base = spark.read.parquet(os.path.join(input_root, "base"))
    table = bootstrap_table(
        os.path.join(work_root, "table"), base, num_buckets=REPLAY_BUCKETS
    )
    eng = CdcEngine(
        spark, table, WalSource(os.path.join(input_root, "wal")),
        os.path.join(work_root, "ckpt"),
        merge_mode="mor",
    )
    eng.run(max_epochs=1)  # warm-up
    rates = [
        SCALING_CHANGES / r.duration_sec
        for r in eng.run()
        if r.duration_sec > 0
    ]
    return max(rates)


def hw_calibration(n: int) -> dict:
    """Machine CPU-scaling ceiling: pure-CPU subprocesses at n vs 4n."""
    import subprocess

    def burn(k: int) -> float:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", "x=0\nfor i in range(30_000_000): x+=i"]
            )
            for _ in range(k)
        ]
        t0 = time.time()
        for p in procs:
            p.wait()
        return time.time() - t0

    t_lo, t_hi = burn(n), burn(4 * n)
    thr_lo, thr_hi = n / t_lo, (4 * n) / t_hi
    return {
        "procs_low": n, "procs_high": 4 * n,
        "sec_low": round(t_lo, 2), "sec_high": round(t_hi, 2),
        "eff": round(thr_hi / (4 * thr_lo), 3),
    }


def main() -> None:
    t_start = time.time()
    tmp = tempfile.mkdtemp(prefix="bench_cdc_")
    out: dict = {"sf": SF_DIR, "unit": "sec"}
    try:
        # --- headline queries + replay at full parallelism ---
        spark = build(f"local[{CPUS}]", CPUS)
        qt = run_headline(spark)
        out["queries"] = qt
        out["value"] = round(sum(qt.values()), 3)
        out["metric"] = (
            f"headline query wall time at {SF_DIR} on local[{CPUS}]"
        )
        prepare_replay_input(spark, os.path.join(tmp, "input"))
        spark.stop()
        spark_r = build(f"local[{REPLAY_CPUS}]", REPLAY_CPUS)
        rep = run_replay(spark_r, os.path.join(tmp, "input"),
                         os.path.join(tmp, f"run{REPLAY_CPUS}"))
        out["replay"] = {**rep, "master": f"local[{REPLAY_CPUS}]"}
        rep_mor = run_replay(spark_r, os.path.join(tmp, "input"),
                             os.path.join(tmp, f"mor{REPLAY_CPUS}"),
                             merge_mode="mor")
        out["replay_mor"] = {**rep_mor, "master": f"local[{REPLAY_CPUS}]"}
        spark_r.stop()

        # --- scaling: identical input at local[N] vs local[4N] ---
        if os.environ.get("BENCH_SKIP_SCALING") != "1":
            out["hw_calibration"] = hw_calibration(SCALING_N)
            # larger epochs for the scaling input (see SCALING_CHANGES)
            sp_prep = build(f"local[{CPUS}]", CPUS)
            prepare_replay_input(sp_prep, os.path.join(tmp, "sinput"),
                                 changes=SCALING_CHANGES,
                                 epochs=SCALING_EPOCHS)
            sp_prep.stop()
            attempts = []
            attempt = -1
            while True:
                attempt += 1
                if attempt >= SCALING_ATTEMPTS:
                    # adaptive extension: a wide inter-quartile spread
                    # means the window was contaminated — buy the median
                    # more samples (bounded, budget-permitting)
                    effs_so_far = sorted(
                        a["efficiency"] for a in attempts
                    )
                    n = len(effs_so_far)
                    iqr = effs_so_far[(3 * n) // 4] - effs_so_far[n // 4]
                    if (attempt >= SCALING_ATTEMPTS + SCALING_MAX_EXTRA
                            or iqr <= 0.15):
                        break
                    out["scaling_attempts_extended"] = (
                        f"IQR {iqr:.3f} > 0.15 after {n} attempts"
                    )
                if attempts and time.time() - t_start > TIME_BUDGET_SEC:
                    out["scaling_attempts_truncated"] = (
                        f"{len(attempts)}/{SCALING_ATTEMPTS} within "
                        f"{TIME_BUDGET_SEC:.0f}s budget"
                    )
                    break
                pair = {}
                for n in (SCALING_N * 4, SCALING_N):
                    sp = build(f"local[{n}]", n)
                    pair[n] = run_scaling_replay(
                        sp, os.path.join(tmp, "sinput"),
                        os.path.join(tmp, f"scale{n}_{attempt}"),
                    )
                    sp.stop()
                eff_i = pair[SCALING_N * 4] / (4 * pair[SCALING_N])
                # per-attempt hardware ceiling: a pure-CPU N-vs-4N burn
                # run in the SAME time window as the attempt, so a
                # co-tenant-contaminated window is visible inside the
                # artifact (round-3 verdict: the once-per-run ceiling
                # could not certify individual attempts)
                hw_i = hw_calibration(SCALING_N)
                attempts.append(
                    {"low_events_per_sec": round(pair[SCALING_N], 1),
                     "high_events_per_sec": round(pair[SCALING_N * 4], 1),
                     "efficiency": round(eff_i, 3),
                     "hw_ceiling_eff": hw_i["eff"],
                     "efficiency_vs_hw": round(
                         eff_i / max(hw_i["eff"], 1e-9), 3)}
                )
            # HEADLINE = true MEDIAN of attempt efficiencies
            # (statistics.median — an even attempt count, e.g. after a
            # time-budget truncation, averages the middle two instead of
            # biasing toward the better attempt); low/high rates come
            # from the attempt closest to that median
            effs = [a["efficiency"] for a in attempts]
            med_eff = statistics.median(effs)
            med_at = min(
                attempts,
                key=lambda a: (abs(a["efficiency"] - med_eff),
                               a["efficiency"]),
            )
            out["scaling"] = {
                "low": {"master": f"local[{SCALING_N}]",
                        "events_per_sec": med_at["low_events_per_sec"]},
                "high": {"master": f"local[{SCALING_N * 4}]",
                         "events_per_sec": med_at["high_events_per_sec"]},
                "cores_ratio": 4,
                "events_per_epoch": SCALING_CHANGES,
                "merge_mode": "mor",
                "efficiency": round(med_eff, 3),
                "efficiency_protocol": (
                    "statistics.median of interleaved paired attempts; "
                    "each attempt carries its own same-window hw ceiling"
                ),
                "efficiency_best": max(effs),
                "attempts": attempts,
                "efficiency_vs_hw_ceiling": round(
                    statistics.median(
                        [a["efficiency_vs_hw"] for a in attempts]), 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

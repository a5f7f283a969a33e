"""The CDC replay loop: WAL tail → validate → LWW → MERGE → commit.

One epoch (microbatch) flows through (SURVEY.md §3.4):

1. **fence check** — epoch already committed? → no-op (idempotent replay)
2. **scan** the epoch's WAL segment (incremental; only new segments read)
3. **schema evolution** — new nullable envelope columns → metadata-only
   DDL on the table before any data moves
4. **validate** envelopes (Catalyst predicates); invalid → quarantine +
   conflict count (reference analog: PERMISSIVE-mode + business-rule
   filters, ``src/extract.py:40-48`` + ``src/transform.py:90-112``)
5. **watermark filter** — rows with lsn ≤ the bucket's committed
   watermark were applied by a previous run → dropped (exactly-once
   under partial replay)
6. **LWW dedup** per doc_id by max lsn (salted two-stage for hot keys)
7. **recompute n_tok** (derive-if-missing, vectorized)
8. **MERGE** into only the touched buckets (anti-join + union;
   broadcast change-keys; untouched buckets' files survive untouched)
9. **DQ gate** via ``df.observe`` during the staging write — metrics come
   from the same job that stages files, zero extra passes; FAIL → abort
   *before* publish (reference: orchestrator DQ gate,
   ``notebooks/07_pipeline_orchestrator.py:250-252``)
10. **atomic snapshot commit** + per-partition lineage + metrics JSON +
    driver checkpoint

Crash safety: a crash before publish leaves orphan staged files that no
manifest references (invisible); a crash after publish but before the
driver checkpoint is healed by the (epoch, bucket) fence set — the rerun
commits nothing twice. Resume = read checkpoint, continue from the next
epoch (``resume`` arg / CLI).

Why a driver epoch loop and not Structured Streaming: exactly-once here
is fenced on *our* snapshot commits, and a resumable batch loop gives
replay/resume semantics directly (SURVEY.md §2.10). The loop body is pure
DataFrame ops, so each epoch is one-to-two Spark jobs regardless of data
size — driver orchestration cost is O(epochs), not O(rows).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.tokens import recompute_n_tok
from ..operators.lww import lww_dedup, lww_dedup_salted
from ..operators.merge import merge_upsert, merge_upsert_lww
from ..sources.wal import WalSource
from ..tables.format import LakeTable, bucket_expr

ENVELOPE_COLS = {"lsn", "epoch", "op", "ts"}


def _footer_stats(stage_dir: str, order_col: str = "lsn") -> dict[int, dict]:
    """Per-bucket stats from bucket-pure staged parquet footers.

    Driver-side, O(files) metadata reads — the SMALL-bucket-count fast
    path (local footer opens beat a Spark job below a few hundred
    files). File part-0000i ↔ bucket i (HashPartitioning alignment);
    rows from the footer, max lsn from the column's row-group
    statistics. Footer opens run on a thread pool (I/O-bound; GIL
    released inside pyarrow). Above ``stats_max_footer_files`` the
    engine switches to the distributed stats job in ``_bucket_stats``
    (O(1) driver file opens — the 10^4-10^5-bucket path).
    """
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    def one(fn: str):
        bucket = int(fn.split("-")[1])
        md = pq.ParquetFile(os.path.join(stage_dir, fn)).metadata
        if md.num_rows == 0:
            return None
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        col = idx[order_col]
        max_lsn = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            if st is None or not st.has_min_max:
                raise RuntimeError(
                    f"staged file {fn} lacks {order_col} statistics"
                )
            v = int(st.max)
            max_lsn = v if max_lsn is None else max(max_lsn, v)
        return bucket, {"rows": md.num_rows, "max_lsn": int(max_lsn)}

    names = sorted(
        fn for fn in os.listdir(stage_dir) if fn.endswith(".parquet")
    )
    out: dict[int, dict] = {}
    if not names:
        return out
    with ThreadPoolExecutor(max_workers=min(16, len(names))) as ex:
        for res in ex.map(one, names):
            if res is not None:
                out[res[0]] = res[1]
    return out


@dataclass
class EpochResult:
    epoch: int
    status: str  # "committed" | "skipped" | "empty"
    rows_in: int = 0
    rows_valid: int = 0
    conflicts: int = 0
    rows_applied: int = 0
    buckets_touched: int = 0
    duration_sec: float = 0.0
    lineage: list[dict] = field(default_factory=list)


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        wal: WalSource,
        checkpoint_dir: str,
        salted: bool = False,
        num_salts: int = 16,
        broadcast_threshold: int = 100_000,
        audit_quarantine: bool = True,
        strict_dq: bool = False,
        merge_mode: str = "cow",
        mor_compact_files: int | None = 8,
        stats_max_footer_files: int = 256,
        commit_retries: int = 5,
        delta_blooms: bool = False,
    ):
        """``merge_mode``:

        - "cow" (copy-on-write, default): each epoch rewrites the touched
          buckets via anti-join MERGE — reads stay plain scans.
        - "mor" (merge-on-read): each epoch ADOPTS its staged deduped
          change-set as per-bucket delta files (write cost O(changes),
          never O(table)); readers resolve LWW at scan time; buckets are
          compacted back to base files once they accumulate more than
          ``mor_compact_files`` files — or, with
          ``mor_compact_files=None``, never inline: run the ``maintain``
          entry point as a background/cron job instead (it commits via
          the same snapshot CAS, so it serializes with ingest and ingest
          never absorbs the fold). The right mode when per-epoch changes
          are small relative to the table — the 10^10 steady state — or
          when uniform change spread makes CoW rewrite the whole table
          every epoch.

        ``delta_blooms``: attach a per-file key Bloom filter to every
        MOR delta file at adoption time (tables/bloom.py). Point lookups
        then skip the pending deltas that don't contain the probed key —
        the deferred-compaction read tax min/max stats cannot touch
        (random update keys span each delta's whole range). Costs one
        extra column-pruned O(changes) pass per epoch over the staged
        change-set; off by default so replay-throughput benchmarks are
        unaffected unless asked for.
        """
        self.spark = spark
        self.table = table
        self.wal = wal
        self.checkpoint_dir = checkpoint_dir
        self.salted = salted
        self.num_salts = num_salts
        self.broadcast_threshold = broadcast_threshold
        self.audit_quarantine = audit_quarantine
        self.strict_dq = strict_dq
        assert merge_mode in ("cow", "mor")
        self.merge_mode = merge_mode
        self.mor_compact_files = mor_compact_files
        self.stats_max_footer_files = stats_max_footer_files
        self.commit_retries = commit_retries
        self.delta_blooms = delta_blooms
        # Column-expression memo: the staging DAG is rebuilt every epoch,
        # but its expression trees are epoch-invariant (unresolved Columns
        # bind by name at analysis and are immutable). Reusing them cuts
        # the per-epoch py4j construction round-trips — measured as the
        # largest driver-serial component of an epoch (r6; guide §5).
        self._excache: dict = {}
        os.makedirs(checkpoint_dir, exist_ok=True)
        os.makedirs(os.path.join(checkpoint_dir, "lineage"), exist_ok=True)
        os.makedirs(os.path.join(checkpoint_dir, "quarantine"), exist_ok=True)

    def _cached_col(self, key, build):
        got = self._excache.get(key)
        if got is None:
            got = self._excache[key] = build()
        return got

    # ---------- checkpoint ----------

    @property
    def _ckpt_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "checkpoint.json")

    def last_committed_epoch(self) -> int:
        if not os.path.exists(self._ckpt_path):
            return -1
        with open(self._ckpt_path) as f:
            return int(json.load(f)["last_epoch"])

    def _write_checkpoint(self, epoch: int) -> None:
        tmp = self._ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_epoch": epoch, "at": time.time()}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._ckpt_path)

    # ---------- per-bucket stats ----------

    def _bucket_stats(self, valid_dir: str, snap) -> dict[int, dict]:
        """Per-bucket (rows, max_lsn) for the staged change-set.

        Two paths, switched on file count so driver work never scales
        with the bucket count:

        - ``<= stats_max_footer_files`` staged files: driver-side parquet
          footer reads (thread-pooled; ~1 ms/file, faster than a job at
          small B).
        - above it: a DISTRIBUTED stats job — column-pruned scan of
          (key, lsn) over the bucket-pure staged files, groupBy the
          bucket expression, collect B small rows. O(1) driver file
          opens; the job parallelizes with the cluster, so per-epoch
          driver time stays flat at 10^4-10^5 buckets (the 10^10 shape).
          Measured crossover + flatness: see BASELINE.md 'per-bucket
          stats collection'.
        """
        if not os.path.isdir(valid_dir):
            return {}
        n_files = sum(
            1 for fn in os.listdir(valid_dir) if fn.endswith(".parquet")
        )
        if n_files == 0:
            return {}
        if n_files <= self.stats_max_footer_files:
            return _footer_stats(valid_dir, order_col="lsn")
        df = self.spark.read.parquet(valid_dir)
        rows = (
            df.groupBy(
                bucket_expr(snap.key_column, snap.num_buckets).alias("_b")
            )
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.max("lsn").alias("max_lsn"),
            )
            .collect()
        )
        return {
            int(r["_b"]): {"rows": int(r["rows"]), "max_lsn": int(r["max_lsn"])}
            for r in rows
        }

    # ---------- the loop ----------

    def run(self, max_epochs: int | None = None) -> list[EpochResult]:
        """Replay all pending WAL epochs; resumable from checkpoint.

        Each run also APPENDS one rollup record to
        ``<checkpoint>/run_history.jsonl`` (run-level stage log across
        epochs — the reference's pipeline-log history append,
        ``notebooks/07_pipeline_orchestrator.py:341-388``, where per-epoch
        lineage JSON is the per-stage detail)."""
        t0 = time.time()
        results = []
        pending = self.wal.epochs_after(self.last_committed_epoch())
        if max_epochs is not None:
            pending = pending[:max_epochs]
        err: BaseException | None = None
        try:
            for e in pending:
                results.append(self.apply_epoch(e))
                self._write_checkpoint(e)
        except BaseException as exc:
            err = exc
            raise
        finally:
            # best-effort: the history append must never mask the real
            # ingest exception (e.g. unreadable metadata in a crash)
            try:
                self._append_run_history(results, time.time() - t0, err)
            except Exception:
                pass
        return results

    def follow(
        self,
        poll_sec: float = 2.0,
        idle_timeout_sec: float | None = None,
        max_epochs: int | None = None,
        stop_file: str | None = None,
    ) -> list[EpochResult]:
        """Tail the WAL: apply new epochs as their segments land.

        The continuous form of ``run()`` — the binlog-tail shape of the
        north rule, where the landing zone keeps growing while the
        engine runs. Differences from one-shot replay:

        - only COMPLETE segments are consumed (``_SUCCESS`` marker), and
          consumption stops at the first incomplete one so a slow
          upstream writer can never cause a partial-epoch read or an
          out-of-order apply (WalSource.complete_epochs_after);
        - between batches the loop sleeps ``poll_sec`` (object-store
          LIST cadence — cheap: one listdir, no Spark job);
        - it returns when ``stop_file`` appears (graceful ops shutdown:
          finish the in-flight epoch, checkpoint, exit), after
          ``idle_timeout_sec`` with no new work (None = tail forever),
          or once ``max_epochs`` have been applied.

        Crash safety is unchanged: every epoch checkpoints after commit,
        so a killed tail resumes exactly where it stopped; redelivered
        epochs hit the snapshot fence and no-op. Run history gets one
        record for the whole tail session.
        """
        t0 = time.time()
        results: list[EpochResult] = []
        idle_since = time.time()
        err: BaseException | None = None
        try:
            while True:
                if stop_file is not None and os.path.exists(stop_file):
                    break
                pending = self.wal.complete_epochs_after(
                    self.last_committed_epoch()
                )
                if max_epochs is not None:
                    pending = pending[: max_epochs - len(results)]
                if pending:
                    for e in pending:
                        results.append(self.apply_epoch(e))
                        self._write_checkpoint(e)
                        if (stop_file is not None
                                and os.path.exists(stop_file)):
                            break
                    idle_since = time.time()
                if max_epochs is not None and len(results) >= max_epochs:
                    break
                if not pending:
                    if (idle_timeout_sec is not None
                            and time.time() - idle_since >= idle_timeout_sec):
                        break
                    time.sleep(poll_sec)
        except BaseException as exc:
            err = exc
            raise
        finally:
            try:
                self._append_run_history(results, time.time() - t0, err)
            except Exception:
                pass
        return results

    def _append_run_history(
        self, results: list, dur: float, err: BaseException | None = None
    ) -> None:
        rec = {
            "run_id": uuid.uuid4().hex[:12],
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "duration_sec": round(dur, 3),
            "status": "failed" if err is not None else "ok",
            "error": f"{type(err).__name__}: {err}" if err is not None else None,
            "epochs_total": len(results),
            "epochs_committed": sum(
                1 for r in results if r.status == "committed"
            ),
            "epochs_skipped": sum(1 for r in results if r.status == "skipped"),
            "rows_applied": sum(r.rows_applied for r in results),
            "conflicts": sum(r.conflicts for r in results),
            "table_version": self.table.current().version,
            "merge_mode": self.merge_mode,
        }
        path = os.path.join(self.checkpoint_dir, "run_history.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def apply_epoch(self, epoch: int) -> EpochResult:
        """Apply one WAL segment (fence-checked, idempotent)."""
        raw = None
        snap = self.table.current()
        if not snap.epoch_fenced(epoch):
            raw = self.wal.read_epoch(self.spark, epoch)
        return self.apply_changes_df(raw, epoch)

    def apply_changes_df(self, raw, epoch: int) -> EpochResult:
        """Apply a DataFrame of change envelopes as epoch ``epoch``.

        Also the ``foreachBatch`` body for the Structured Streaming
        front-end (streaming/structured.py) — the streaming batch id is
        the epoch, and the fence set makes redelivery a no-op.

        Retries the WHOLE epoch on ConcurrentCommitError (bounded by
        ``commit_retries``): a retry re-reads the table state, re-merges
        and re-commits — the optimistic-concurrency loop that lets two
        engine processes ingest into one table (each loser of a CoW CAS
        race re-derives its merge from the winner's snapshot; an epoch
        the other writer already committed resolves to "skipped" at the
        fence check).
        """
        from ..tables.format import ConcurrentCommitError

        last: Exception | None = None
        for _ in range(self.commit_retries + 1):
            try:
                return self._apply_changes_once(raw, epoch)
            except ConcurrentCommitError as exc:
                last = exc
        raise last

    def _apply_changes_once(self, raw, epoch: int) -> EpochResult:
        t0 = time.time()
        import sys as _sys
        _ph = (lambda tag: print(
            f"PHASE e{epoch} {tag} {time.time() - t0:.3f}",
            file=_sys.stderr, flush=True)) if os.environ.get(
            "SPARK_GRAFT_PHASE_LOG") == "1" else (lambda tag: None)
        snap = self.table.current()

        # 1. fence check — full-epoch replay is a no-op (epochs below the
        # pruned fence horizon count as fenced; see Snapshot.epoch_fenced)
        if snap.epoch_fenced(epoch):
            committed = snap.fenced_buckets(epoch)
            return EpochResult(epoch=epoch, status="skipped",
                               buckets_touched=len(committed),
                               duration_sec=time.time() - t0)
        if raw is None:
            raw = self.wal.read_epoch(self.spark, epoch)
        _ph("wal_read")

        # 3. schema evolution from the envelope shape — metadata-only DDL:
        #    new nullable payload columns are ADDED; a payload column
        #    arriving WIDER than the table's type (int→bigint etc.)
        #    triggers type widening. Envelopes NARROWER than the table or
        #    missing table columns are fine as-is (merge aligns them).
        from ..tables.format import _TYPE_WIDENING_OK

        table_types = {n: t for n, t, _ in snap.schema.fields}
        env_types = {f.name: f.dataType.simpleString() for f in raw.schema.fields}
        payload_cols = [c for c in raw.columns if c not in ENVELOPE_COLS]
        new_cols = [c for c in payload_cols if c not in table_types]
        widen = {
            c: env_types[c]
            for c in payload_cols
            if c in table_types
            and (table_types[c], env_types[c]) in _TYPE_WIDENING_OK
        }
        if new_cols or widen:
            self.table.evolve_schema(
                add_columns=[(c, env_types[c]) for c in new_cols] or None,
                widen=widen or None,
            )
            snap = self.table.current()

        # 4. validate. Validity is a FLAG COLUMN (``_q``: 0 valid,
        # 1 quarantined) rather than a DataFrame split: the whole epoch —
        # valid lane and audit lane — rides ONE linear plan (one WAL
        # scan, one shuffle, one staging write). A filter-based split
        # would re-execute the scan per branch (Catalyst does not share
        # scan subtrees across a union), which made the audit a serial
        # second job in round 1 and a 16%-overhead extra scan branch in
        # an intermediate design. Conflict counts come from the same
        # single observe (A4 pattern — zero extra passes).
        from ..functions.tokens import envelope_validity

        flagged = raw.withColumn(
            "_q", self._cached_col(
                "validity", lambda: (~envelope_validity()).cast("int"))
        )
        obs_in = Observation()
        flagged = flagged.observe(
            obs_in,
            *self._cached_col("obs_in", lambda: (
                F.count(F.lit(1)).alias("rows_in"),
                F.sum("_q").alias("rows_q"),
            )),
        )
        if not self.audit_quarantine:
            # audit lane off: invalid rows are dropped after the counting
            # observe (CollectMetrics is a pushdown barrier, so the
            # counts see every row)
            flagged = flagged.filter(F.col("_q") == 0)

        # 5. watermark filter (exactly-once under partial replay):
        # bucket the key, then drop VALID rows at-or-below the bucket
        # watermark; audit-lane rows always pass (they are never applied).
        # Small B: a PLAN-TIME literal array indexed by the bucket
        # expression — no BroadcastExchange build job per epoch for a
        # B-row relation (guide §2.4: remove shuffles/broadcasts outright
        # when the small side is driver-resident metadata). Large B: the
        # broadcast join — PySpark's lit(list) lowers to CreateArray of B
        # Literal nodes, and above ~1k buckets the analyzer/optimizer
        # walking that tree costs MORE plan time per epoch than the
        # broadcast build it replaces (measured at B=4096: literal path
        # 1.3-2.0 s vs join 0.3-1.4 s per epoch).
        B = snap.num_buckets
        wm = snap.watermark
        if wm and B <= 1024:
            # buckets with no watermark keep every row: LONG_MIN sentinel
            # (lsn > LONG_MIN always) keeps the literal array homogeneous
            no_wm = -(1 << 63)
            wm_arr = [int(wm.get(b, no_wm)) for b in range(B)]
            wm_col = F.element_at(
                F.lit(wm_arr).cast("array<long>"),
                self._cached_col(
                    ("wm_idx", snap.key_column, B),
                    lambda: bucket_expr(snap.key_column, B) + 1),
            )
            flagged = flagged.filter(
                (F.col("_q") == 1) | (F.col("lsn") > wm_col)
            )
        elif wm:
            wm_df = self.spark.createDataFrame(
                [(int(b), int(l)) for b, l in wm.items()], "_b int, _wm long"
            )
            flagged = flagged.withColumn(
                "_wmb", bucket_expr(snap.key_column, B)
            )
            flagged = (
                flagged.join(
                    F.broadcast(wm_df), flagged["_wmb"] == wm_df["_b"],
                    "left",
                )
                .filter(
                    (F.col("_q") == 1)
                    | F.col("_wm").isNull()
                    | (F.col("lsn") > F.col("_wm"))
                )
                .drop("_b", "_wm", "_wmb")
            )

        # 6. LWW dedup — deterministic winner per key by max lsn. The
        # audit lane rides the same aggregate: its salt column
        # ("<lsn>#<row-hash>", "" on valid rows) makes every quarantined
        # row its own single-row group (identical duplicate invalid rows
        # collapse — acceptable for audit data), while valid rows group
        # by (key, ""). Default plan: repartition(B, key) FIRST, then
        # groupBy(key, salt) — the aggregate's clustering requirement is
        # satisfied by the key partitioning, so dedup AND the bucket-pure
        # staging write share ONE exchange (previously: groupBy shuffle
        # on a synthetic string key + a second bucket repartition
        # shuffle; guide §2.4). Trade, priced in BASELINE.md: the single
        # exchange moves raw rows, so a pathological hot key lands on
        # one reducer before collapsing — the ``salted`` flag keeps the
        # two-stage plan (stage 1 collapses a hot key to ≤ num_salts
        # rows before any bucket shuffle) for that regime.
        if self.salted:
            gk = F.when(
                F.col("_q") == 1,
                F.concat_ws(
                    "#", F.lit("~q"), F.col("lsn").cast("string"),
                    F.xxhash64(*[F.col(c) for c in raw.columns]).cast("string"),
                ),
            ).otherwise(F.col(snap.key_column).cast("string"))
            work = flagged.withColumn("_gk", gk)
            dedup = lww_dedup_salted(
                work, key="_gk", num_salts=self.num_salts
            )
        else:
            qsalt = self._cached_col(
                ("qsalt", tuple(raw.columns)),
                lambda: F.when(
                    F.col("_q") == 1,
                    F.concat_ws(
                        "#", F.col("lsn").cast("string"),
                        F.xxhash64(
                            *[F.col(c) for c in raw.columns]
                        ).cast("string"),
                    ),
                ).otherwise(F.lit("")),
            )
            work = flagged.withColumn("_qsalt", qsalt).repartition(
                B, F.col(snap.key_column)
            )
            dedup = lww_dedup(work, key=[snap.key_column, "_qsalt"])
            # restore the envelope column order (staged parquet schema
            # stays identical to the pre-optimization layout)
            dedup = dedup.select(
                *[c for c in flagged.columns if c in dedup.columns]
            )
        # 7. vectorized n_tok recompute (derive-if-missing/wrong) — valid
        # lane only; audit rows keep their received n_tok verbatim
        if "n_tok" in dedup.columns:
            recv_col, keep_col = self._cached_col("ntok_fold", lambda: (
                F.col("n_tok").cast("int"),
                F.when(F.col("_q") == 1, F.col("_n_tok_recv"))
                .otherwise(F.col("n_tok")),
            ))
            dedup = dedup.withColumn("_n_tok_recv", recv_col)
            dedup = recompute_n_tok(dedup).withColumn(
                "n_tok", keep_col
            ).drop("_n_tok_recv")
        else:
            dedup = recompute_n_tok(dedup)
        dedup = dedup.drop("_bucket", "_gk")
        # Materialize the deduped change-set to a staging parquet rather
        # than .persist(): the change-set is consumed again by the MERGE,
        # and Spark's local-mode MemoryStore serializes badly under many
        # task threads (measured 2.3s → 27.6s from 8 → 32 threads for the
        # same cache materialization, vs a parquet round-trip that scales).
        # The explicit repartition(B, key) makes the staged files
        # BUCKET-PURE (partition index == bucket_expr — murmur3-aligned),
        # which yields per-bucket stats (rows, max lsn) nearly for free:
        # parquet footer reads at small bucket counts, a column-pruned
        # distributed job above stats_max_footer_files (_bucket_stats).
        # On a real cluster the staging write doubles as a deterministic
        # restart point.
        stage_dir = os.path.join(
            self.checkpoint_dir, "stage", f"epoch-{epoch:05d}"
        )
        from ..tables.format import bucket_aligned_write

        # partitionBy(_q) splits valid/quarantined into sibling dirs while
        # KEEPING the partition-index == bucket file naming inside each
        # (file part-0000i in _q=0 holds exactly bucket i's rows — the
        # task id is the shuffle partition index; asserted by tests)
        _ph("dag_built")
        with bucket_aligned_write(self.spark):
            dedup.repartition(B, F.col(snap.key_column)).write.mode(
                "overwrite"
            ).partitionBy("_q").parquet(stage_dir)
        _ph("staged")
        conflicts = int(obs_in.get["rows_q"] or 0)
        if self.audit_quarantine:
            qsrc = os.path.join(stage_dir, "_q=1")
            qdir = os.path.join(
                self.checkpoint_dir, "quarantine", f"epoch-{epoch:05d}"
            )
            shutil.rmtree(qdir, ignore_errors=True)
            if os.path.isdir(qsrc):
                shutil.move(qsrc, qdir)
            else:
                os.makedirs(qdir, exist_ok=True)  # nothing quarantined
        valid_dir = os.path.join(stage_dir, "_q=0")
        try:
            # touched buckets + per-bucket max lsn + applied rows — from
            # parquet footers (small epochs) or a distributed stats job
            # (large bucket counts); see _bucket_stats. Merge-on-read
            # derives BOTH the stats and the manifest entries that
            # adopt_delta_files will publish from ONE threaded footer
            # pass — adoption needs the per-file entries (rows, min/max
            # key, min/max lsn) regardless, so a separate stats pass
            # would open every staged footer a second time.
            staged_entries = None
            if self.merge_mode == "mor":
                from ..tables.format import _build_entries

                staged_entries = _build_entries(
                    valid_dir, "", snap.key_column, None
                ) if os.path.isdir(valid_dir) else []
                stats = {}
                for e in staged_entries:
                    if "max_lsn" not in e:
                        raise RuntimeError(
                            f"staged file {e['path']} lacks lsn statistics"
                        )
                    stats[e["bucket"]] = {
                        "rows": e["rows"], "max_lsn": e["max_lsn"],
                    }
            else:
                stats = self._bucket_stats(valid_dir, snap)
            _ph("entries_built")
            if not stats:
                return EpochResult(
                    epoch=epoch, status="empty", conflicts=conflicts,
                    duration_sec=time.time() - t0,
                )
            # staged change-set re-read: LAZY — even constructing the
            # reader costs a driver-side footer/schema pass per epoch,
            # and the default MOR path (adopt-by-move) never consumes it
            # (r6; guide §5: keep needless work off the driver)
            dedup = None
            touched = sorted(stats)
            bucket_max_lsn = {b: s["max_lsn"] for b, s in stats.items()}
            rows_valid = sum(s["rows"] for s in stats.values())
            if self.strict_dq:
                dedup = self.spark.read.parquet(valid_dir)
                # key-uniqueness re-check (LWW output is unique per key by
                # construction — groupBy(key) — so this guards against
                # regressions, not data; one extra job when enabled)
                nk = dedup.select(
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct(F.col(snap.key_column)).alias("k"),
                ).collect()[0]
                if int(nk["n"]) != int(nk["k"]):
                    raise RuntimeError(
                        f"DQ FAIL epoch {epoch}: duplicate keys after LWW dedup"
                    )

            # 8a. merge-on-read: the staged deduped change-set IS the
            # delta content — adopt its bucket-pure files directly
            # (driver-side move; write cost O(changes), never O(table)),
            # publish, then compact any bucket that exceeded the delta
            # budget (read-time LWW cost bound). With
            # ``mor_compact_files=None`` compaction is DEFERRED to the
            # ``maintain`` entry point (background job; it commits
            # through the same snapshot CAS so it serializes with
            # ingest) — the production shape, where ingest never absorbs
            # the fold (measured: a 13M-row inline fold cost one 123 s
            # epoch in the 55M soak; see BASELINE.md).
            if self.merge_mode == "mor":
                if self.delta_blooms and staged_entries:
                    # per-bucket filters from the staged files (column-
                    # pruned key read, O(changes)); entries keep the
                    # bloom ref through adoption's path rewrite
                    from ..tables.bloom import attach_blooms, bucket_blooms

                    blooms = bucket_blooms(
                        self.spark.read.parquet(valid_dir),
                        snap.key_column, B,
                    )
                    staged_entries = attach_blooms(
                        self.table.root, staged_entries, blooms
                    )
                new_files = self.table.adopt_delta_files(
                    valid_dir, touched, key_column=snap.key_column,
                    entries=staged_entries,
                )
                _ph("adopted")
                landed = self.table.commit(
                    epoch=epoch,
                    replaced_buckets=touched,
                    new_files=new_files,
                    bucket_max_lsn=bucket_max_lsn,
                    rows_applied=rows_valid,
                    props={"epoch": epoch, "mode": "mor"},
                    delta=True,
                )
                _ph("committed")
                if landed is None:
                    # fence no-op: a concurrent engine committed this
                    # epoch between our fence check and our commit. The
                    # table is exactly-once either way (our adopted
                    # files are unreferenced orphans for GC); report
                    # "skipped" so run summaries and lineage don't
                    # double-count the winner's rows.
                    return EpochResult(
                        epoch=epoch, status="skipped",
                        conflicts=conflicts,
                        buckets_touched=len(touched),
                        duration_sec=time.time() - t0,
                    )
                if self.mor_compact_files is not None:
                    from ..tables.format import ConcurrentCommitError
                    from ..tables.maintenance import compact

                    try:
                        compact(self.table, self.spark,
                                max_files_per_bucket=self.mor_compact_files)
                    except ConcurrentCommitError:
                        # another writer/compactor folded the same inputs;
                        # the epoch itself IS committed — don't let the
                        # epoch retry loop re-run it over a lost fold
                        pass
                lineage = [
                    {
                        "epoch": epoch,
                        "bucket": b,
                        "lsn_max": s["max_lsn"],
                        "rows_applied": s["rows"],
                    }
                    for b, s in sorted(stats.items())
                ]
                self._emit_lineage(epoch, lineage, rows_valid, conflicts,
                                   time.time() - t0, rows_valid)
                return EpochResult(
                    epoch=epoch,
                    status="committed",
                    rows_valid=rows_valid,
                    conflicts=conflicts,
                    rows_applied=rows_valid,
                    buckets_touched=len(touched),
                    duration_sec=time.time() - t0,
                    lineage=lineage,
                )

            # 8b. copy-on-write MERGE into touched buckets only
            # (file-pruned base read). PINNED to the epoch's snapshot and
            # CAS'd on its version at commit: the CoW files are a REWRITE
            # of prior bucket state, so a concurrent writer's commit
            # landing between this read and our publish would be lost
            # without the guard (MOR needs neither — delta files carry
            # only the epoch's changes and read-time LWW orders by lsn).
            base = self.table.read(self.spark, buckets=touched,
                                   snapshot=snap)
            if dedup is None:
                dedup = self.spark.read.parquet(valid_dir)
            payload = [c for c in dedup.columns if c != "_bucket"]
            if rows_valid <= self.broadcast_threshold:
                # Broadcasting the change-keys skips shuffling the base
                # into the anti join — the right plan when per-epoch
                # changes ≪ table size (the 10^10-scale steady state):
                # the base streams through one hash probe, and the only
                # base shuffle left is the bucket-pure write's.
                merged = merge_upsert(
                    base,
                    dedup.select(*payload),
                    key=snap.key_column,
                    broadcast_changes=True,
                )
            else:
                # Bulk epochs: the broadcast build is SERIAL driver work
                # and the shuffled anti join would exchange base AND
                # change-keys once each BEFORE the write's own bucket
                # exchange. The union+max_by merge resolves survivors,
                # upserts and deletes in one aggregate whose required
                # clustering comes from a repartition(B, key) — so the
                # whole merge + bucket-pure write is ONE exchange of
                # base+changes (equivalence property-tested in
                # tests/test_properties.py; guide §2.4/§3).
                merged = merge_upsert_lww(
                    base,
                    dedup.select(*payload),
                    key=snap.key_column,
                    num_partitions=B,
                )
            # 9. stage files + DQ gate metrics in the SAME job (df.observe).
            # No repartition/partitionBy here: write_data_files shuffles
            # once on the key at B partitions (= bucket assignment), and
            # that shuffle is elided when the merge join already
            # partitioned on the key.
            obs = Observation()
            observed = merged.observe(
                obs,
                F.count(F.lit(1)).alias("rows"),
                F.sum(
                    F.when(F.col("n_tok") != F.size(F.col("tokens")), 1).otherwise(0)
                ).alias("bad_ntok"),
                F.sum(F.when(F.col(snap.key_column).isNull(), 1).otherwise(0)).alias(
                    "null_keys"
                ),
            )
            new_files = self.table.write_data_files(observed, touched)
            m = obs.get

            # DQ gate — abort BEFORE publish; staged files stay orphaned
            if int(m["bad_ntok"] or 0) != 0:
                raise RuntimeError(
                    f"DQ FAIL epoch {epoch}: {m['bad_ntok']} rows violate "
                    "n_tok == size(tokens) — aborting before commit"
                )
            if int(m["null_keys"] or 0) != 0:
                raise RuntimeError(
                    f"DQ FAIL epoch {epoch}: null keys reached merge — aborting"
                )

            # 10. atomic publish + lineage + metrics (CAS on the snapshot
            # the merge read — a loser raises ConcurrentCommitError and
            # apply_changes_df re-runs the epoch against the new state)
            self.table.commit(
                epoch=epoch,
                replaced_buckets=touched,
                new_files=new_files,
                bucket_max_lsn=bucket_max_lsn,
                rows_applied=rows_valid,
                props={"epoch": epoch},
                expected_version=snap.version,
            )
            lineage = [
                {
                    "epoch": epoch,
                    "bucket": b,
                    "lsn_max": s["max_lsn"],
                    "rows_applied": s["rows"],
                }
                for b, s in sorted(stats.items())
            ]
            self._emit_lineage(epoch, lineage, rows_valid, conflicts,
                               time.time() - t0, int(m["rows"]))
            return EpochResult(
                epoch=epoch,
                status="committed",
                rows_valid=rows_valid,
                conflicts=conflicts,
                rows_applied=rows_valid,
                buckets_touched=len(touched),
                duration_sec=time.time() - t0,
                lineage=lineage,
            )
        finally:
            shutil.rmtree(stage_dir, ignore_errors=True)

    def _emit_lineage(self, epoch, lineage, rows_valid, conflicts, dur, table_rows):
        path = os.path.join(
            self.checkpoint_dir, "lineage", f"epoch-{epoch:05d}.json"
        )
        rec = {
            "epoch": epoch,
            "rows_applied": rows_valid,
            "conflicts": conflicts,
            "duration_sec": round(dur, 3),
            "rows_in_touched_buckets_after": table_rows,
            "partitions": lineage,
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, path)

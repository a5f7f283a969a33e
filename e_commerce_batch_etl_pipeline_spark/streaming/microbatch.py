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
import time
from dataclasses import dataclass, field

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.tokens import recompute_n_tok, validate_envelopes
from ..operators.lww import lww_dedup, lww_dedup_salted
from ..operators.merge import merge_upsert
from ..sources.wal import WalSource
from ..tables.format import LakeTable, bucket_expr

ENVELOPE_COLS = {"lsn", "epoch", "op", "ts"}


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
        salted: bool = True,
        num_salts: int = 16,
        broadcast_changes: bool = True,
    ):
        self.spark = spark
        self.table = table
        self.wal = wal
        self.checkpoint_dir = checkpoint_dir
        self.salted = salted
        self.num_salts = num_salts
        self.broadcast_changes = broadcast_changes
        os.makedirs(checkpoint_dir, exist_ok=True)
        os.makedirs(os.path.join(checkpoint_dir, "lineage"), exist_ok=True)
        os.makedirs(os.path.join(checkpoint_dir, "quarantine"), exist_ok=True)

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

    # ---------- the loop ----------

    def run(self, max_epochs: int | None = None) -> list[EpochResult]:
        """Replay all pending WAL epochs; resumable from checkpoint."""
        results = []
        pending = self.wal.epochs_after(self.last_committed_epoch())
        if max_epochs is not None:
            pending = pending[:max_epochs]
        for e in pending:
            results.append(self.apply_epoch(e))
            self._write_checkpoint(e)
        return results

    def apply_epoch(self, epoch: int) -> EpochResult:
        t0 = time.time()
        snap = self.table.current()

        # 1. fence check — full-epoch replay is a no-op
        if any(k.startswith(f"{epoch}:") for k in snap.fences):
            committed = {
                int(k.split(":")[1]) for k in snap.fences if k.startswith(f"{epoch}:")
            }
            # all buckets of this epoch fenced → skip (idempotent)
            return EpochResult(epoch=epoch, status="skipped",
                               buckets_touched=len(committed),
                               duration_sec=time.time() - t0)

        raw = self.wal.read_epoch(self.spark, epoch)

        # 3. additive schema evolution: new envelope payload columns
        table_cols = set(snap.schema.names())
        payload_cols = [c for c in raw.columns if c not in ENVELOPE_COLS]
        new_cols = [c for c in payload_cols if c not in table_cols]
        if new_cols:
            types = {f.name: f.dataType.simpleString() for f in raw.schema.fields}
            self.table.evolve_schema(add_columns=[(c, types[c]) for c in new_cols])
            snap = self.table.current()

        # 4. validate + quarantine
        valid, quarantined = validate_envelopes(raw)
        # quarantine is persisted (audit trail) and counted from the write
        # job itself via observe — no separate count() pass (A4 pattern)
        qdir = os.path.join(self.checkpoint_dir, "quarantine", f"epoch-{epoch:05d}")
        qobs = Observation()
        quarantined.observe(qobs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(qdir)
        conflicts = int(qobs.get["n"])

        # 5. watermark filter (exactly-once under partial replay):
        # bucket the key, then drop rows at-or-below the bucket watermark
        B = snap.num_buckets
        wm = snap.watermark
        valid = valid.withColumn("_bucket", bucket_expr(snap.key_column, B))
        if wm:
            wm_df = self.spark.createDataFrame(
                [(int(b), int(l)) for b, l in wm.items()], "_b int, _wm long"
            )
            valid = (
                valid.join(F.broadcast(wm_df), valid["_bucket"] == wm_df["_b"], "left")
                .filter(F.col("_wm").isNull() | (F.col("lsn") > F.col("_wm")))
                .drop("_b", "_wm")
            )

        # 6. LWW dedup — deterministic winner per key by max lsn
        dedup = (
            lww_dedup_salted(valid, key=snap.key_column, num_salts=self.num_salts)
            if self.salted
            else lww_dedup(valid, key=snap.key_column)
        )
        # 7. vectorized n_tok recompute (derive-if-missing/wrong)
        dedup = recompute_n_tok(dedup)
        dedup = dedup.withColumn("_bucket", bucket_expr(snap.key_column, B))
        dedup.cache()
        try:
            # touched buckets + per-bucket max lsn + applied rows: ONE job
            stats = (
                dedup.groupBy("_bucket")
                .agg(
                    F.max("lsn").alias("max_lsn"),
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct(F.col(snap.key_column)).alias("nkeys"),
                )
                .collect()
            )
            if not stats:
                return EpochResult(
                    epoch=epoch, status="empty", conflicts=conflicts,
                    duration_sec=time.time() - t0,
                )
            touched = sorted(int(r["_bucket"]) for r in stats)
            bucket_max_lsn = {int(r["_bucket"]): int(r["max_lsn"]) for r in stats}
            rows_valid = sum(int(r["n"]) for r in stats)
            # DQ: LWW output must be key-unique (a key lives in ONE bucket,
            # so per-bucket uniqueness == global uniqueness). Merged-output
            # uniqueness then follows inductively: survivors are anti-joined
            # away from change keys and base was unique at the last commit.
            if any(int(r["n"]) != int(r["nkeys"]) for r in stats):
                raise RuntimeError(
                    f"DQ FAIL epoch {epoch}: duplicate keys after LWW dedup"
                )

            # 8. MERGE into touched buckets only (file-pruned base read)
            base = self.table.read(self.spark, buckets=touched)
            payload = [c for c in dedup.columns if c != "_bucket"]
            merged = merge_upsert(
                base,
                dedup.select(*payload),
                key=snap.key_column,
                broadcast_changes=self.broadcast_changes,
            )
            merged = merged.withColumn("_bucket", bucket_expr(snap.key_column, B))

            # 9. stage files + DQ gate metrics in the SAME job (df.observe)
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
            observed = observed.repartition(max(len(touched), 1), F.col("_bucket"))
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

            # 10. atomic publish + lineage + metrics
            self.table.commit(
                epoch=epoch,
                replaced_buckets=touched,
                new_files=new_files,
                bucket_max_lsn=bucket_max_lsn,
                rows_applied=rows_valid,
                props={"epoch": epoch},
            )
            lineage = [
                {
                    "epoch": epoch,
                    "bucket": int(r["_bucket"]),
                    "lsn_max": int(r["max_lsn"]),
                    "rows_applied": int(r["n"]),
                    "conflicts_epoch": conflicts,
                }
                for r in stats
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
            dedup.unpersist()

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

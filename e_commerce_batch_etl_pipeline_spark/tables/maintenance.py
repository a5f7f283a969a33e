"""Table maintenance: compaction, snapshot expiry, orphan-file GC.

The reference's small-files discipline (``repartition(8)``: "148 tiny
files → 8 files", ``streamlit_app/app.py:929-952``; ~128 MB/file rule
``notebooks/04_write_parquet.py:36-46``) becomes real table maintenance
here, in Iceberg's shape:

- ``compact``: rewrite buckets whose file count exceeds a threshold into
  one file per bucket, committed as a normal snapshot (readers never see
  a partial compaction; time travel to pre-compaction snapshots still
  works because old files are only dereferenced, not deleted).
- ``expire_snapshots``: drop snapshot JSONs older than a retention count,
  keeping the current one (bounds metadata growth).
- ``remove_orphans``: delete data files under ``data/`` that no retained
  snapshot references — crashed commit attempts and expired history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from .format import LakeTable, Snapshot


def compact(
    table: LakeTable,
    spark: SparkSession,
    max_files_per_bucket: int = 1,
) -> Snapshot | None:
    """Rewrite over-fragmented buckets; returns the new snapshot or None.

    At 100 TB this runs per-bucket-group as a background job; the commit
    is the same atomic pointer swap as an ingest epoch, so compaction and
    ingest serialize through the single-writer snapshot log.
    """
    snap = table.current()
    per_bucket: dict[int, int] = {}
    for f in snap.files:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    frag = sorted(
        b for b, n in per_bucket.items() if n > max_files_per_bucket
    )
    if not frag:
        return None
    df = table.read(spark, buckets=frag)
    new_files = table.write_data_files(df, frag)
    # epoch tag for compaction commits: negative, below bootstrap
    return table.commit(
        epoch=-(snap.version + 2),
        replaced_buckets=frag,
        new_files=new_files,
        bucket_max_lsn={
            b: int(snap.watermark.get(str(b), -1)) for b in frag
        },
        props={"compaction": True, "buckets": len(frag)},
    )


def expire_snapshots(table: LakeTable, keep_last: int = 5) -> list[int]:
    """Delete snapshot metadata older than the last ``keep_last``.

    Holds the commit lock: another maintenance process may be walking
    ``history()`` → ``snapshot_at()`` (remove_orphans' live-set scan)
    and must not see snapshots vanish mid-walk. Note that expiring a
    snapshot also retires it from ``changes_between`` ranges."""
    from .format import commit_lock

    with commit_lock(table.root):
        versions = table.history()
        current = table.current().version
        to_drop = [v for v in versions[:-keep_last] if v != current]
        for v in to_drop:
            p = os.path.join(table.root, "metadata", f"snapshot-{v:08d}.json")
            if os.path.exists(p):
                os.remove(p)
    return to_drop


def remove_orphans(
    table: LakeTable, min_age_sec: float = 3600.0
) -> list[str]:
    """Delete data files/dirs no retained snapshot references.

    Concurrency safety (an in-flight epoch stages files BEFORE its commit
    publishes them, so "unreferenced" is not "orphaned"):
    - holds the commit lock while computing the live set and deleting, so
      no commit can publish between the scan and the rm;
    - skips anything younger than ``min_age_sec`` — staged files of an
      epoch whose writer is alive but not yet at its commit call (the
      lock alone can't see those).
    """
    import time

    from .format import commit_lock

    removed = []
    with commit_lock(table.root):
        live: set[str] = set()
        for v in table.history():
            try:
                snap = table.snapshot_at(v)
            except FileNotFoundError:
                continue  # expired between listdir and open — not live
            live.update(f["path"] for f in snap.files)
        data_root = os.path.join(table.root, "data")
        now = time.time()

        def _old_enough(path: str) -> bool:
            try:
                return now - os.path.getmtime(path) >= min_age_sec
            except OSError:
                return False  # vanished → another actor owns it; skip

        for commit_dir in sorted(os.listdir(data_root)):
            cdir = os.path.join(data_root, commit_dir)
            if not os.path.isdir(cdir):
                continue
            rels = [
                os.path.join("data", commit_dir, fn)
                for fn in os.listdir(cdir)
                if fn.endswith(".parquet")
            ]
            dead = [
                r for r in rels
                if r not in live and _old_enough(os.path.join(table.root, r))
            ]
            if rels and len(dead) == len(rels) and _old_enough(cdir):
                shutil.rmtree(cdir)
                removed.extend(rels)
            else:
                for r in dead:
                    os.remove(os.path.join(table.root, r))
                    removed.append(r)
    return removed


def verify(table: LakeTable, spark: SparkSession) -> dict:
    """Post-commit write-verify (reference K4: read-back counts +
    partition histogram, ``notebooks/04_write_parquet.py:119-139``).

    Two tiers: (a) metadata — every manifest file exists on disk and is
    bucket-consistent by footer; (b) data — one read-back pass asserting
    the table invariants (key uniqueness, n_tok == size(tokens)).
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    snap = table.current()
    missing = []
    has_delta = any(f.get("kind", "base") == "delta" for f in snap.files)
    rows_by_bucket: dict[int, int] = {}
    for f in snap.files:
        p = os.path.join(table.root, f["path"])
        if not os.path.exists(p):
            missing.append(f["path"])
            continue
        rows_by_bucket[f["bucket"]] = (
            rows_by_bucket.get(f["bucket"], 0)
            + pq.ParquetFile(p).metadata.num_rows
        )
    if missing:
        return {
            "ok": False, "version": snap.version, "rows": None,
            "distinct_keys": None, "bad_ntok": None,
            "missing_files": missing, "buckets": len(rows_by_bucket),
        }
    df = table.read(spark)
    agg = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct(F.col(snap.key_column)).alias("keys"),
        F.sum(
            F.when(F.col("n_tok") != F.size(F.col("tokens")), 1).otherwise(0)
        ).alias("bad_ntok"),
    ).collect()[0]
    ok = (
        not missing
        # physical row sums only equal logical rows when no deltas are
        # pending (MOR resolves superseded/deleted rows at read time)
        and (has_delta or int(agg["rows"]) == sum(rows_by_bucket.values()))
        and int(agg["rows"]) == int(agg["keys"])
        and int(agg["bad_ntok"] or 0) == 0
    )
    return {
        "ok": ok,
        "version": snap.version,
        "rows": int(agg["rows"]),
        "distinct_keys": int(agg["keys"]),
        "bad_ntok": int(agg["bad_ntok"] or 0),
        "missing_files": missing,
        "buckets": len(rows_by_bucket),
    }

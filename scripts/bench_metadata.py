"""Measure snapshot-commit metadata cost vs live-file count.

Round-2 verdict flagged the snapshot manifest as O(live files) JSON
rewritten per commit — the metadata wall Iceberg solves with manifest
lists. This script measures the fix (per-bucket content-addressed
manifest files; commits serialize only changed buckets):

- build a table whose snapshot references N fabricated live files
  (N = 1k / 10k / 100k, B = 256 buckets; no Spark involved — the commit
  protocol is pure driver-side metadata),
- time the steady-state commit shape (single-bucket MOR delta append),
- compare with the legacy cost model (serialize + fsync the FULL file
  list per commit), timed on the same entries.

Run: python scripts/bench_metadata.py   (prints one JSON line)
"""

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from e_commerce_batch_etl_pipeline_spark.tables.format import (  # noqa: E402
    LakeTable,
    TableSchema,
)

B = 256
SCHEMA = TableSchema(fields=[
    ("doc_id", "string", False),
    ("tokens", "array<int>", True),
    ("n_tok", "int", True),
    ("source", "string", True),
])


def build_table(root: str, n_files: int) -> LakeTable:
    t = LakeTable.create(root, SCHEMA, num_buckets=B)
    # one bulk commit fabricating n_files live entries across B buckets
    entries = [
        {"path": f"data/seed/f{i:07d}.parquet", "bucket": i % B}
        for i in range(n_files)
    ]
    t.commit(epoch=0, replaced_buckets=list(range(B)), new_files=entries,
             bucket_max_lsn={b: 1 for b in range(B)})
    return t


def time_commits(t: LakeTable, rounds: int = 30) -> list[float]:
    out = []
    e0 = t.current().props.get("_bench_epoch", 0) + 10
    for i in range(rounds):
        b = i % B
        entry = [{"path": f"data/delta/e{e0 + i}-b{b}.parquet", "bucket": b}]
        st = time.perf_counter()
        t.commit(epoch=e0 + i, replaced_buckets=[b], new_files=entry,
                 bucket_max_lsn={b: e0 + i}, delta=True)
        out.append((time.perf_counter() - st) * 1000)
    return out


def legacy_cost(t: LakeTable, tmp: str, rounds: int = 10) -> float:
    """Old design: full file-list JSON serialized + fsynced per commit."""
    snap = t.current()
    d = snap.to_json()
    d.pop("manifests", None)
    d["files"] = snap.files
    out = []
    for i in range(rounds):
        p = os.path.join(tmp, f"legacy-{i}.json")
        st = time.perf_counter()
        with open(p, "w") as f:
            json.dump(d, f)
            f.flush()
            os.fsync(f.fileno())
        out.append((time.perf_counter() - st) * 1000)
        os.remove(p)
    return statistics.median(out)


def main():
    results = {}
    for n in (1_000, 10_000, 100_000):
        root = tempfile.mkdtemp(prefix=f"meta-bench-{n}-")
        try:
            t = build_table(os.path.join(root, "t"), n)
            times = time_commits(t)
            results[str(n)] = {
                "commit_ms_median": round(statistics.median(times), 2),
                "commit_ms_p90": round(sorted(times)[int(0.9 * len(times))], 2),
                "legacy_full_list_ms": round(legacy_cost(t, root), 2),
                "snapshot_json_bytes": os.path.getsize(os.path.join(
                    t.root, "metadata",
                    open(os.path.join(t.root, "metadata", "VERSION")).read().strip(),
                )),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "commit_metadata_cost_vs_live_files",
                      "buckets": B, "results": results}))


if __name__ == "__main__":
    main()

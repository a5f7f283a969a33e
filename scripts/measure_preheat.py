"""Interleaved A/B of the session preheat (fresh subprocess per arm).

Each arm replicates the frozen bench's one-shot protocol: build session,
run the 9 warm-up counts, then time the session-FIRST queries (q1 pays
the codegen bring-up, embed_cosine_topk pays the Python worker startup).
Usage: python scripts/measure_preheat.py [pairs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from e_commerce_batch_etl_pipeline_spark.session import build_session
from e_commerce_batch_etl_pipeline_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = build_session(app_name="preheat-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS,
                      extra_conf={"spark.driver.memory": "48g"})
for t in ("lineitem", "orders", "customer", "nation", "region", "part",
          "events", "documents", "embeddings"):
    spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
times = {}
for name in ("q1_pricing_summary", "embed_cosine_topk",
             "embed_lsh_signature", "multimodal_meta"):
    q = QUERIES[name]
    t0 = time.time()
    df = q(spark, SF_DIR)
    df.count()
    times[name] = round(time.time() - t0, 3)
print("RESULT " + json.dumps(times))
spark.stop()
"""


def run_arm(preheat: bool) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_PREHEAT"] = "1" if preheat else "0"
    out = subprocess.run(
        [sys.executable, "-c", CHILD], capture_output=True, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"arm failed: {out.stderr[-2000:]}")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results = {"on": [], "off": []}
    for i in range(pairs):
        for arm in ("off", "on"):
            r = run_arm(arm == "on")
            results[arm].append(r)
            print(f"pair {i} {arm}: {r}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

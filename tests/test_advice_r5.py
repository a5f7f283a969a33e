"""Round-5 advisory regressions (ADVICE.md r4, the two low items).

1. commit_lock(wait_sec=0) must behave as a NON-BLOCKING TRY-LOCK:
   acquire a free lock, error only on a held one. The r4 deadline-first
   reorder made a zero budget error before the first O_EXCL attempt.
2. hyperplane_signature must EXCLUDE ragged vectors (length != dim)
   instead of silently collapsing them into bucket 0 (zip_with null-pads,
   the null product nullifies the fold, every bit reads 0).
"""

import os
import time

import pytest

import e_commerce_batch_etl_pipeline_spark.tables.format as fmt
from e_commerce_batch_etl_pipeline_spark.operators.similarity import (
    hyperplane_signature,
)


def _lock_root(tmpdir_clean):
    root = os.path.join(tmpdir_clean, "t")
    os.makedirs(os.path.join(root, "metadata"))
    return root


def test_trylock_zero_wait_acquires_free_lock(tmpdir_clean):
    root = _lock_root(tmpdir_clean)
    with fmt.commit_lock(root, wait_sec=0) as token:
        assert token
        assert os.path.exists(os.path.join(root, "metadata", fmt.LOCK_FILE))
    # released on exit
    assert not os.path.exists(os.path.join(root, "metadata", fmt.LOCK_FILE))


def test_trylock_zero_wait_errors_fast_on_held_lock(tmpdir_clean):
    root = _lock_root(tmpdir_clean)
    lock_path = os.path.join(root, "metadata", fmt.LOCK_FILE)
    with open(lock_path, "w") as f:
        f.write(f"999999:deadbeef {time.time()}")  # fresh, held elsewhere
    t0 = time.monotonic()
    with pytest.raises(fmt.ConcurrentCommitError):
        with fmt.commit_lock(root, wait_sec=0):
            pass
    assert time.monotonic() - t0 < 2.0
    # the held lock is untouched (we never owned it)
    assert os.path.exists(lock_path)


def test_hyperplane_signature_excludes_ragged_vectors(spark):
    rows = [
        ("ok_a", [1.0, 2.0, 3.0, 4.0]),
        ("ok_b", [-1.0, 0.5, -2.0, 1.5]),
        ("short", [1.0, 2.0, 3.0]),
        ("long", [1.0, 2.0, 3.0, 4.0, 5.0]),
        ("nullv", None),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = hyperplane_signature(df, planes=8, dim=4).collect()
    got = {r["vec_id"]: r["bucket"] for r in out}
    assert set(got) == {"ok_a", "ok_b"}, (
        "ragged/null vectors must be excluded, not bucketed: "
        f"{sorted(got)}"
    )

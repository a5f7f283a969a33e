"""Regression tests for the session-5 self-review findings: tail-loop
gap gating, the key-column widening guard, and the shared LRU cache."""

import os

import pytest

from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.tables.format import TableSchema
from e_commerce_batch_etl_pipeline_spark.tables.lru import LruCache


def _segment(root: str, epoch: int, complete: bool = True) -> None:
    d = os.path.join(root, f"epoch-{epoch:05d}")
    os.makedirs(d)
    with open(os.path.join(d, "part-00000.parquet"), "wb") as f:
        f.write(b"x")
    if complete:
        with open(os.path.join(d, "_SUCCESS"), "w"):
            pass


def test_tail_waits_at_numbering_gap(tmpdir_clean):
    """Out-of-order landing: epoch N+1's directory exists (complete)
    before epoch N's exists AT ALL. Consuming N+1 first would
    checkpoint past N and the watermark would silently drop N's rows —
    the tail must stall at the gap instead."""
    wal = WalSource(tmpdir_clean)
    _segment(tmpdir_clean, 0)
    _segment(tmpdir_clean, 2)  # epoch 1 not landed yet
    assert wal.complete_epochs_after(-1) == [0]
    assert wal.complete_epochs_after(0) == []  # stalls, never [2]
    _segment(tmpdir_clean, 1)
    assert wal.complete_epochs_after(0) == [1, 2]


def test_tail_fresh_checkpoint_accepts_retained_wal_start(tmpdir_clean):
    """A WAL whose old segments were retention-deleted starts above 0 —
    a fresh tail accepts the lowest existing epoch, then requires
    consecutive numbering from there."""
    wal = WalSource(tmpdir_clean)
    _segment(tmpdir_clean, 7)
    _segment(tmpdir_clean, 8)
    _segment(tmpdir_clean, 10)  # gap at 9
    assert wal.complete_epochs_after(-1) == [7, 8]


def test_key_column_widening_is_refused():
    """The bucket layout hashes by TYPE (murmur3(int 5) != murmur3(
    long 5)): widening the key column would route a key's new rows to a
    different bucket than its old rows and bucket-local LWW would
    resolve against half the history. Must be a hard error, like
    dropping the key."""
    schema = TableSchema(
        fields=[("doc_id", "int", False), ("n", "int", True)]
    )
    with pytest.raises(ValueError, match="key column"):
        schema.evolved(widen={"doc_id": "bigint"}, key_column="doc_id")
    # non-key widening still works
    out = schema.evolved(widen={"n": "bigint"}, key_column="doc_id")
    assert ("n", "bigint", True) in out.fields


def test_shared_lru_cache_discipline():
    c = LruCache("LAKE_TEST_LRU_MAX_UNSET", 3)
    for i in range(5):
        c.put(i, str(i))
    assert len(c) == 3
    assert c.get(0) is None and c.get(4) == "4"
    c.get(2)       # touch → most recent
    c.put(5, "5")  # evicts 3, not 2
    assert c.get(3) is None and c.get(2) == "2"
    c.clear()
    assert len(c) == 0

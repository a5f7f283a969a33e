"""Per-file key Bloom filters — point-lookup file skipping beyond min/max.

Manifest [min_key, max_key] stats (format.py::_file_entry) prune files
whose key RANGE excludes the probe, which works for monotone ids (fresh
inserts) and sorted-compaction layouts, but prunes NOTHING for
hash-scattered keys: a delta file carrying one epoch's random updates
spans nearly the bucket's whole key range, so a point lookup for an old
key still unions every pending delta in its bucket (the deferred-
compaction read tax measured in BASELINE.md). A Bloom filter answers the
question min/max cannot: "is THIS key in THIS file?" — probabilistically
no-false-negative, so pruning on it never drops a live row.

Shape (Iceberg puffin-sidecar analog; no reference analog — the
reference has no file-skipping layer at all):

- Bits are built DISTRIBUTED, one filter per bucket, in a single
  ``applyInPandas`` pass over the bucket-pure change-set/output: the
  64-bit key hash is computed JVM-side (``F.xxhash64``) before the
  grouping, the pandas function only does numpy bit-packing — no
  per-row Python hashing in the hot path. Commit files are bucket-pure
  (one file per bucket for unsorted writes), so bucket == file; for
  sorted size-split buckets the per-bucket filter attaches to every
  split file as a sound superset (never prunes a sibling, still prunes
  negative probes).
- Sidecars are content-addressed immutable blobs under
  ``metadata/blooms/`` (manifest entries stay small JSON:
  ``{"bloom": {"path", "m", "k"}}``); loaded lazily and LRU-cached at
  probe time, GC'd by remove_orphans like data files and manifests.
- Probes hash driver-side with a pure-Python XXH64 that replicates
  Spark's ``xxhash64`` bit-for-bit (property-tested against the JVM in
  tests/test_bloom.py) — membership tests cost zero Spark jobs. The
  second hash derives from the first via splitmix64 on BOTH sides
  (Kirsch-Mitzenmacher double hashing), so only one function needs the
  cross-language contract.

Sizing: m = next_pow2(n * bits_per_key) clamped to [2^10, 2^17] bits
(128 B – 16 KB per file), k = ln2 * m/n clamped to [1, 8]. At the soak
shape (10k rows per delta file) that is ~1% FPR for 16 KB — a lookup
skips ~99% of the deltas that don't contain the key.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
from pyspark.sql import DataFrame, functions as F

BLOOM_DIR = os.path.join("metadata", "blooms")

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

# ---------------------------------------------------------------------------
# pure-Python XXH64 — must equal Spark's F.xxhash64 (seed 42) exactly;
# property-tested against the JVM in tests/test_bloom.py


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 over bytes — the generic path Spark uses for strings."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _xxh_round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xxh_round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xxh_round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _avalanche(h)


def xxh64_long(v: int, seed: int = 42) -> int:
    """Spark's xxhash64 of a LongType value (8-byte LE single round)."""
    h = (seed + _P5 + 8) & _M64
    h ^= _xxh_round(0, v & _M64)
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _avalanche(h)


def xxh64_int(v: int, seed: int = 42) -> int:
    """Spark's xxhash64 of an IntegerType value (4-byte LE tail)."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _avalanche(h)


def key_hash(key, key_type: str) -> int | None:
    """Spark-equal xxhash64 of a probe key; None = type unsupported
    (callers fail open — bloom pruning just doesn't apply)."""
    if key is None:
        return None
    if key_type == "string":
        return xxh64(str(key).encode("utf-8"))
    if key_type in ("bigint", "long"):
        return xxh64_long(int(key))
    if key_type == "int":
        return xxh64_int(int(key))
    return None


def _mix64(x: int) -> int:
    """splitmix64 finalizer — derives the second probe hash from the
    first (identical numpy code on the build side)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


# ---------------------------------------------------------------------------
# distributed build


def bucket_blooms(
    df: DataFrame,
    key_column: str,
    num_buckets: int,
    bits_per_key: int = 10,
    min_bits: int = 1 << 10,
    max_bits: int = 1 << 17,
) -> dict[int, dict]:
    """One Bloom filter per bucket, built distributed.

    Returns {bucket: {"m": bits, "k": probes, "bits": bytes}}. The key
    hash is computed JVM-side; the pandas stage is pure numpy bit math,
    so the pass stays vectorized end-to-end. Collected size is
    O(buckets × m/8) — ≤16 KB per bucket.
    """
    import pandas as pd

    from .format import bucket_expr

    sel = df.select(
        bucket_expr(key_column, num_buckets).alias("_bb"),
        F.xxhash64(F.col(key_column)).alias("_h1"),
    )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = max(1, len(pdf))
        m = min_bits
        while m < n * bits_per_key and m < max_bits:
            m <<= 1
        k = int(max(1, min(8, round(m / n * 0.6931))))
        h1 = pdf["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            x = (h1 + np.uint64(0x9E3779B97F4A7C15))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h2 = (x ^ (x >> np.uint64(31))) | np.uint64(1)
            bits = np.zeros(m >> 3, dtype=np.uint8)
            mask = np.uint64(m - 1)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) & mask
                np.bitwise_or.at(
                    bits,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        return pd.DataFrame(
            {"bucket": [int(pdf["_bb"].iloc[0])], "m": [m], "k": [k],
             "bits": [bits.tobytes()]}
        )

    rows = (
        sel.groupBy("_bb")
        .applyInPandas(build, "bucket int, m int, k int, bits binary")
        .collect()
    )
    return {
        int(r["bucket"]): {"m": int(r["m"]), "k": int(r["k"]),
                           "bits": bytes(r["bits"])}
        for r in rows
    }


def attach_blooms(
    root: str, entries: list[dict], blooms: dict[int, dict]
) -> list[dict]:
    """Write bloom sidecars and reference them from the file entries.

    Sidecars are content-addressed (name = sha1 of bits) → immutable,
    idempotent under commit retries, shared when two files carry
    identical key sets. Written BEFORE the snapshot publishes (write-
    audit-publish): a crashed commit leaves orphan sidecars that
    remove_orphans collects, never a live entry pointing at a missing
    sidecar. Entries whose bucket has no filter pass through unchanged.
    """
    from concurrent.futures import ThreadPoolExecutor

    bdir = os.path.join(root, BLOOM_DIR)
    os.makedirs(bdir, exist_ok=True)

    def write_one(item):
        b, bl = item
        name = f"bloom-{hashlib.sha1(bl['bits']).hexdigest()[:20]}.bin"
        path = os.path.join(bdir, name)
        if not os.path.exists(path):
            # tmp unique per bucket AND process: two buckets can share
            # identical bits (content-addressed name), and two ENGINE
            # PROCESSES racing the same epoch (the documented OCC
            # scenario) can reach this write concurrently — a shared tmp
            # would let one writer's truncate zero bytes the other
            # already wrote, publishing a hole-filled sidecar
            tmp = f"{path}.{b}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(struct.pack("<II", bl["m"], bl["k"]))
                f.write(bl["bits"])
            os.replace(tmp, path)
        return b, {
            "path": os.path.join(BLOOM_DIR, name),
            "m": bl["m"], "k": bl["k"],
        }

    # thread-pooled like _build_entries' footer reads: a 4096-bucket
    # epoch writes 4096 sidecars — serial driver I/O would add seconds
    items = list(blooms.items())
    with ThreadPoolExecutor(max_workers=min(16, max(1, len(items)))) as ex:
        rel_by_bucket = dict(ex.map(write_one, items))
    return [
        {**e, "bloom": rel_by_bucket[e["bucket"]]}
        if e["bucket"] in rel_by_bucket else e
        for e in entries
    ]


# ---------------------------------------------------------------------------
# probe side

from .lru import LruCache

_BLOOM_CACHE = LruCache("LAKE_BLOOM_CACHE_MAX", 4096)


def _load_bits(root: str, rel: str) -> bytes | None:
    """Sidecar bits, LRU-cached (immutable, content-addressed). None if
    the sidecar is unreadable — callers fail OPEN (keep the file)."""
    path = os.path.join(root, rel)
    got = _BLOOM_CACHE.get(path)
    if got is not None:
        return got
    try:
        with open(path, "rb") as f:
            raw = f.read()
    except OSError:
        return None
    bits = raw[8:]  # 8-byte (m, k) header is advisory; entry carries both
    _BLOOM_CACHE.put(path, bits)
    return bits


def may_contain(entry: dict, root: str, hashes: list[int]) -> bool:
    """False only when the entry's Bloom filter PROVES no probe key is
    in the file. Entries without a filter, unreadable sidecars, and
    empty probe sets all keep the file (sound: no false negatives)."""
    ref = entry.get("bloom")
    if not ref or not hashes:
        return True
    bits = _load_bits(root, ref["path"])
    if bits is None or len(bits) * 8 != ref["m"]:
        return True
    m, k = ref["m"], ref["k"]
    for h1 in hashes:
        h2 = _mix64(h1) | 1
        if all(
            bits[(p := (h1 + i * h2) & (m - 1)) >> 3] >> (p & 7) & 1
            for i in range(k)
        ):
            return True  # this key may be present
    return False

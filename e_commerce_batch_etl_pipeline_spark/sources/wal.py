"""WAL / binlog-shaped source: incremental epoch-segment scan.

The WAL is a directory of immutable epoch segments
(``wal_root/epoch-00000/``, one parquet dir each — the shape a Debezium/
binlog landing zone has on object storage). The source lists segments
*newer than the checkpointed epoch* and reads only those — the incremental
analog of the reference's full CSV re-read each run
(``src/extract.py:40-69``). Schema is pinned per segment (explicit
StructType discipline, ``src/extract.py:27-36``); extra columns relative
to the table schema signal additive schema evolution and are surfaced to
the engine rather than dropped.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_SEG_RE = re.compile(r"^epoch-(\d+)$")


class WalSource:
    def __init__(self, wal_root: str):
        self.wal_root = wal_root

    def epochs(self) -> list[int]:
        out = []
        for fn in os.listdir(self.wal_root):
            m = _SEG_RE.match(fn)
            if m and os.path.isdir(os.path.join(self.wal_root, fn)):
                out.append(int(m.group(1)))
        return sorted(out)

    def epochs_after(self, last_committed: int) -> list[int]:
        return [e for e in self.epochs() if e > last_committed]

    def is_complete(self, epoch: int) -> bool:
        """A segment is consumable once its writer finished. Spark (and
        Hadoop-committer writers generally) mark that with ``_SUCCESS``;
        a directory listed mid-write has no marker yet. Only the tail
        loop needs this — one-shot ``run()`` replays a WAL that already
        exists in full."""
        return os.path.exists(
            os.path.join(self.wal_root, f"epoch-{epoch:05d}", "_SUCCESS")
        )

    def complete_epochs_after(self, last_committed: int) -> list[int]:
        """Epochs safe for the tail loop: complete segments, stopping at
        the FIRST incomplete segment AND at the first NUMBERING GAP —
        later complete segments wait behind both, because epochs must
        apply in order (watermarks and the fence horizon assume lsn
        grows with epoch). The gap rule covers out-of-order landing
        where epoch N+1's directory appears before epoch N's exists at
        all: applying N+1 first would checkpoint past N, and N's rows
        would later be dropped at the per-bucket watermark — silent
        loss. A permanent gap therefore stalls the tail (ops-visible
        via idle_timeout) rather than skipping data. The first batch
        after a fresh checkpoint accepts whatever the lowest existing
        epoch is (a WAL may legitimately start above 0 after segment
        retention)."""
        out = []
        expect = last_committed + 1 if last_committed >= 0 else None
        for e in self.epochs_after(last_committed):
            if expect is not None and e != expect:
                break  # gap: an earlier epoch may still be landing
            if not self.is_complete(e):
                break
            out.append(e)
            expect = e + 1
        return out

    def read_epoch(self, spark: SparkSession, epoch: int) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.wal_root, f"epoch-{epoch:05d}")
        )

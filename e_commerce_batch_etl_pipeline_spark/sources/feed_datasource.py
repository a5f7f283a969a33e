"""LakeTable change-data-feed as a Spark DataSource (``lakefeed``).

The Delta-Lake ``readStream.format("delta")`` / ``table_changes(...)``
surface re-expressed for this table format: downstream consumers
subscribe to a table's committed row-level changelog through plain
Spark batch/stream reads instead of driving ``changes_between`` by hand.

    spark.dataSource.register(LakeFeedDataSource)

    # batch: every change committed in (startingVersion, endingVersion]
    df = (spark.read.format("lakefeed")
          .option("root", table_root)
          .option("startingVersion", 0)          # default 0 = everything
          .option("endingVersion", 7)            # default = current
          .load())

    # stream: exactly-once via version-number offsets in the checkpoint
    feed = (spark.readStream.format("lakefeed")
            .option("root", table_root)
            .option("startingVersion", 0)        # or "latest"
            .option("ref", "published")          # optional: only follow
            .load())                             #   the audited ref

Version options also accept REF NAMES (tags / the ``published`` branch):
``startingVersion``/``endingVersion`` resolve through the table's refs,
and the stream's ``ref`` option caps ``latestOffset`` at the named ref's
current position — a subscriber that only ever sees what the
write-audit-publish ceremony (``tables/maintenance.py::publish``) has
fast-forwarded, while unaudited commits keep landing on the head.

Output schema: the table's columns plus three CDC metadata columns —
``_change_op`` (``I``/``U``/``D`` as committed), ``_lsn`` (the change's
log sequence number; ``-1`` for snapshot/base rows), ``_commit_version``
(the snapshot version that published the row). Emission is per COMMIT
(Delta-CDF granularity), not net-across-range — ``changes_between``
stays the NET-diff batch surface.

Version-step classification (planned driver-side from the immutable
snapshot chain, so offset replay is deterministic):
- **MOR delta commit** (files appended, none removed, every added file
  ``kind=delta``): the changelog IS the added files — bin-packed into
  row-budgeted ``InputPartition`` groups, read worker-side via pyarrow
  (Arrow batches end-to-end). This is O(changes), with parallelism
  following data volume rather than file count.
- **Base-file append without removal** (bootstrap, CoW ingest into
  previously-empty buckets): every row in the added files is a genuine
  insert → emitted with ``_change_op='I'``, ``_lsn=-1`` (base files
  carry no lsn; matches the read path, where base rows scan as lsn=-1).
- **Logical no-ops** — compaction folds / rebuckets / metadata-only
  commits (schema evolution, empty epochs) — are SKIPPED: they change
  layout, never state.
- **CoW replacement commits** (files removed AND new ingest fences):
  the per-row changelog is not recoverable from a net state rewrite —
  the plan FAILS CLOSED with a pointer to ``merge-mode mor``, never
  guesses.

Schema evolution inside the range is reconciled per file at read time:
columns missing from an old delta read as typed NULLs, widened columns
upcast — same rules as the table's own scan.

Scale shape: planning cost is O(versions × changed-file entries) on the
driver (manifests are content-addressed and LRU-cached); data movement
is one pyarrow scan per changed file on the executors; nothing is
collected. Reference analog: none (the reference is batch-only;
SURVEY.md §2.10 new ground).

Deployment note (Spark 4.1): the STREAMING source runner is a separate
driver-side Python worker that — unlike the batch data-source workers —
does not put ``--py-files`` archives on its ``sys.path``. Under
``spark-submit``, streaming reads therefore need the package importable
via the environment too: ``PYTHONPATH=/path/to/pkg.zip spark-submit
--py-files pkg.zip ...`` (verified end-to-end; batch reads need only
``--py-files``). In-process drivers that can already import this module
are unaffected.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

META_COLS = (
    ("_change_op", T.StringType()),
    ("_lsn", T.LongType()),
    ("_commit_version", T.LongType()),
)
_META_NAMES = tuple(n for n, _ in META_COLS)


class FeedUnsupportedCommit(ValueError):
    """A commit in the requested range rewrote state (CoW replacement):
    its row-level changelog is not recoverable from the snapshot chain."""


class _FeedPartition(InputPartition):
    """One read task: a BIN-PACKED list of changelog files. Packing
    small files together amortizes the Python-worker per-partition cost
    (measured 7.5× over a native JVM scan at one-file-per-partition on
    a 1,280-tiny-file changelog — scripts/bench_feed_datasource.py);
    large files still get their own partition because packing is
    row-budgeted, so executor parallelism survives at scale."""

    def __init__(self, files: list[tuple[str, str, int]]):
        # (abs_path, kind "delta"|"base", commit version) per file
        self.files = files


def _bin_pack(entries: list[tuple[str, str, int, int]]) -> list[_FeedPartition]:
    """Greedy row-budgeted packing in commit order (deterministic for a
    given range — offset replay must replan identically). Budget adapts
    to the range: ~64 partitions for small changelogs (overhead
    amortization), while any file bigger than the budget stands alone
    (parallelism at scale)."""
    if not entries:
        return []
    total = sum(r for _, _, _, r in entries)
    budget = min(1_000_000, max(10_000, total // 64))
    parts: list[_FeedPartition] = []
    cur: list[tuple[str, str, int]] = []
    cur_rows = 0
    for path, kind, version, rows in entries:
        if cur and cur_rows + rows > budget:
            parts.append(_FeedPartition(cur))
            cur, cur_rows = [], 0
        cur.append((path, kind, version))
        cur_rows += rows
    if cur:
        parts.append(_FeedPartition(cur))
    return parts


def _plan_versions(root: str, from_v: int, to_v: int) -> list[_FeedPartition]:
    """Classify every version step in (from_v, to_v] and return the
    changelog-bearing files bin-packed into read partitions.
    Deterministic for a given range (snapshots and manifests are
    immutable, packing is greedy in commit order), which is what makes
    streaming-offset replay exactly-once."""
    from ..tables.format import LakeTable

    t = LakeTable(root)
    entries: list[tuple[str, str, int, int]] = []
    try:
        prev = t.snapshot_at(from_v)
    except FileNotFoundError:
        raise FeedUnsupportedCommit(
            f"snapshot v{from_v} is not retained (expired?); the feed "
            "cannot start below the oldest retained version"
        ) from None
    for v in range(from_v + 1, to_v + 1):
        try:
            s2 = t.snapshot_at(v)
        except FileNotFoundError:
            raise FeedUnsupportedCommit(
                f"snapshot v{v} missing from the chain (expired "
                "mid-range?); cannot plan the feed"
            ) from None
        s1 = prev
        prev = s2
        p1 = {f["path"] for f in s1.files}
        p2 = {f["path"] for f in s2.files}
        added = [f for f in s2.files if f["path"] not in p1]
        removed = p1 - p2
        if s2.num_buckets != s1.num_buckets:
            continue  # rebucket: layout rewrite, logical no-op
        if not added and not removed:
            continue  # metadata-only (evolution / empty epoch / tags)
        if removed:
            if set(s2.fences) - set(s1.fences):
                raise FeedUnsupportedCommit(
                    f"commit v{v} replaced files while ingesting (copy-on-"
                    "write): its row changelog is not recoverable from "
                    "the snapshot chain. Run the engine with merge-mode "
                    "mor (delta commits) to make the table streamable."
                )
            continue  # compaction fold / rewrite: logical no-op
        for f in added:
            kind = "delta" if f.get("kind") == "delta" else "base"
            entries.append((
                os.path.join(root, f["path"]), kind, v,
                int(f.get("rows", 1)),
            ))
    return _bin_pack(entries)


def _read_feed_partition(partition: _FeedPartition, target, payload: list[str]):
    """Executor-side scan of one bin-packed file group → Arrow
    RecordBatches matching ``target`` (the declared stream schema). No
    row-level Python objects; per-file schema drift (evolution)
    reconciled here."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for path, kind, version in partition.files:
        pf = pq.ParquetFile(path)
        avail = set(pf.schema_arrow.names)
        want = [c for c in payload if c in avail]
        if kind == "delta":
            want += [c for c in ("op", "lsn") if c in avail]
        for rb in pf.iter_batches(columns=want):
            n = rb.num_rows
            names = {
                rb.schema.field(i).name: i for i in range(rb.num_columns)
            }
            cols = []
            for name in payload:
                ft = target.field(name).type
                if name in names:
                    arr = rb.column(names[name])
                    if arr.type != ft:
                        arr = arr.cast(ft)
                else:
                    arr = pa.nulls(n, type=ft)
                cols.append(arr)
            if kind == "delta":
                op = rb.column(names["op"]).cast(pa.string())
                lsn = rb.column(names["lsn"]).cast(pa.int64())
            else:
                op = pa.repeat(pa.scalar("I", type=pa.string()), n)
                lsn = pa.repeat(pa.scalar(-1, type=pa.int64()), n)
            ver = pa.repeat(pa.scalar(version, type=pa.int64()), n)
            yield pa.RecordBatch.from_arrays(
                cols + [op, lsn, ver], schema=target
            )


def _arrow_target(full: T.StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(full)


def _resolve_version(table, v) -> int:
    """A version option is an int or a ref name (tag / branch)."""
    try:
        return int(v)
    except (TypeError, ValueError):
        return table.ref(str(v))


def _start_before_timestamp(table, ts_opt: str) -> int:
    """Delta's ``startingTimestamp`` semantics: include every commit at
    or after the timestamp — i.e. start AFTER the last version committed
    strictly before it. Accepts epoch seconds or an ISO-8601 string
    (naive = UTC). Header-only: reads each visited snapshot's JSON for
    its ``committed_at`` — never materializes manifests, no data read.
    Fails LOUD when the timestamp is beyond the newest commit (a unit
    mixup like epoch-milliseconds would otherwise read as 'no changes')
    or below the oldest retained snapshot (completeness unprovable)."""
    import json as _json

    try:
        ts = float(ts_opt)
    except ValueError:
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(ts_opt)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        ts = dt.timestamp()

    md = os.path.join(table.root, "metadata")

    def committed_at(v: int) -> float:
        with open(os.path.join(md, f"snapshot-{v:08d}.json")) as f:
            return float(_json.load(f).get("committed_at", 0.0))

    hist = table.history()
    start = None
    hit_later = False
    for v in hist:  # committed_at is monotone along the chain
        if committed_at(v) < ts:
            start = v
        else:
            hit_later = True
            break
    if not hit_later:
        raise ValueError(
            f"startingTimestamp {ts_opt} is after the newest commit — "
            "an empty feed here would silently read as 'no changes' "
            "(epoch-milliseconds instead of seconds?)"
        )
    if start is None:
        if hist and hist[0] == 0:
            return 0  # table created after ts: everything is included
        raise FeedUnsupportedCommit(
            f"startingTimestamp {ts_opt} predates the oldest retained "
            "snapshot; the feed cannot prove completeness below it"
        )
    return start


class LakeFeedBatchReader(DataSourceReader):
    """Batch: every change committed in (startingVersion, endingVersion]."""

    def __init__(self, options: dict, full: T.StructType):
        from ..tables.format import LakeTable

        t = LakeTable(options["root"])
        self.root = options["root"]
        cur = t.current().version
        st = options.get("startingTimestamp")
        if st is not None and "startingVersion" in options:
            raise ValueError(
                "startingVersion and startingTimestamp are exclusive"
            )
        self.from_v = (
            _start_before_timestamp(t, st) if st is not None
            else _resolve_version(t, options.get("startingVersion", 0))
        )
        ev = options.get("endingVersion")
        self.to_v = cur if ev is None else _resolve_version(t, ev)
        if self.to_v > cur:
            raise ValueError(
                f"endingVersion {self.to_v} beyond current v{cur}"
            )
        if self.from_v > self.to_v:
            raise ValueError(
                f"inverted version range: startingVersion {self.from_v} > "
                f"endingVersion {self.to_v} — an empty answer here would "
                "silently read as 'no changes'"
            )
        self._payload = [
            f.name for f in full.fields if f.name not in _META_NAMES
        ]
        self._target = _arrow_target(full)

    def partitions(self) -> Sequence[InputPartition]:
        parts = _plan_versions(self.root, self.from_v, self.to_v)
        return parts or [_FeedPartition([])]

    def read(self, partition: _FeedPartition) -> Iterator:
        yield from _read_feed_partition(
            partition, self._target, self._payload
        )


class LakeFeedStreamReader(DataSourceStreamReader):
    """Streaming: offsets are snapshot VERSION numbers. Spark checkpoints
    them; ``partitions(start, end)`` replans deterministically from the
    immutable snapshot chain, so restart/replay is exactly-once without
    any source-side state."""

    def __init__(self, options: dict, full: T.StructType):
        from ..tables.format import LakeTable

        t = LakeTable(options["root"])
        self.root = options["root"]
        # ref-pinned subscription: latestOffset follows the named ref
        # (e.g. the WAP "published" branch) instead of the table head,
        # so unaudited commits never reach this consumer
        self.ref = options.get("ref")
        cur = t.current().version
        sv = options.get("startingVersion")
        st = options.get("startingTimestamp")
        if st is not None and sv is not None:
            raise ValueError(
                "startingVersion and startingTimestamp are exclusive"
            )
        self._ts_opt = None
        if st is not None:
            # resolve LAZILY in initialOffset(): only a FRESH query needs
            # the timestamp; a restart resumes from its checkpointed
            # offset, and eagerly re-resolving here would permanently
            # brick restarts once retention expires the snapshots around
            # the original timestamp
            self._ts_opt = str(st)
            self.start = None
        elif sv is None:
            self.start = 0
        elif str(sv).lower() == "latest":
            # with a ref: "latest" = the ref's current position; a ref
            # that doesn't exist yet means nothing is published — start
            # at 0 so the whole audited prefix arrives once it is
            self.start = (self._ref_version(t) or 0) if self.ref else cur
        else:
            self.start = _resolve_version(t, sv)
            if self.start > cur:
                raise ValueError(
                    f"startingVersion {self.start} beyond current v{cur}"
                )
        # offsets must be MONOTONE even if the ref is rolled back
        # (allow_rollback is a supported publish surface): regressing
        # latestOffset below an offset Spark has committed makes a later
        # re-advance re-plan already-delivered versions — duplicates in
        # an exactly-once export. Floor at everything this runner has
        # returned or been handed (partitions() raises it to the
        # checkpointed start after a restart); a rolled-back ref simply
        # stops producing batches until it passes the floor again.
        self._floor = self.start or 0
        self._payload = [
            f.name for f in full.fields if f.name not in _META_NAMES
        ]
        self._target = _arrow_target(full)

    def _ref_version(self, t) -> int | None:
        try:
            return t.ref(self.ref)
        except FileNotFoundError:
            return None  # nothing published yet — not an error

    def initialOffset(self) -> dict:
        if self.start is None:  # startingTimestamp, fresh query only
            from ..tables.format import LakeTable

            self.start = _start_before_timestamp(
                LakeTable(self.root), self._ts_opt
            )
            self._floor = max(self._floor, self.start)
        return {"version": self.start}

    def latestOffset(self) -> dict:
        # no per-batch version cap: a rate limit here silently starves
        # Trigger.AvailableNow (it captures ONE latestOffset and stops
        # there), and a microbatch is exactly-once regardless of size —
        # every version committed since the last trigger rides together
        from ..tables.format import LakeTable

        t = LakeTable(self.root)
        if self.ref:
            rv = self._ref_version(t)
            tip = self._floor if rv is None else max(rv, self._floor)
        else:
            tip = max(t.current().version, self._floor)
        self._floor = tip
        return {"version": tip}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # the checkpointed start is the one offset Spark is KNOWN to
        # have committed — raise the monotonicity floor to it so a
        # restart can never re-serve below it either
        self._floor = max(self._floor, int(start["version"]),
                          int(end["version"]))
        if int(end["version"]) <= int(start["version"]):
            return [_FeedPartition([])]
        parts = _plan_versions(
            self.root, int(start["version"]), int(end["version"])
        )
        return parts or [_FeedPartition([])]

    def read(self, partition: _FeedPartition) -> Iterator:
        yield from _read_feed_partition(
            partition, self._target, self._payload
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: the chain is the log


class LakeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lakefeed"

    def schema(self) -> str:
        # planning runs in a context-free Python worker: build the DDL
        # STRING from the snapshot's stored field DDLs (StructType.fromDDL
        # would need an active SparkContext); Spark parses it JVM-side
        # and hands the resolved StructType back to reader()/streamReader()
        from ..tables.format import LakeTable

        snap = LakeTable(self.options["root"]).current()
        clash = {n for n, _, _ in snap.schema.fields} & set(_META_NAMES)
        if clash:
            raise ValueError(
                f"table columns {sorted(clash)} collide with lakefeed "
                "metadata columns"
            )
        payload = ", ".join(f"{n} {t}" for n, t, _ in snap.schema.fields)
        meta = ", ".join(f"{n} {t.simpleString()}" for n, t in META_COLS)
        return f"{payload}, {meta}"

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return LakeFeedBatchReader(self.options, schema)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return LakeFeedStreamReader(self.options, schema)

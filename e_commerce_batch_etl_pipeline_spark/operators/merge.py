"""MERGE-style upsert: apply a deduped change-set to base-table rows.

Semantics (Delta/Iceberg ``MERGE INTO`` with LWW source):

- op = I / U → upsert (update if key exists, insert if not; the
  update-as-upsert policy means I vs U converge — SURVEY.md §5.1)
- op = D     → delete (no-op if the key is absent)

Physical strategy: **anti-join + union**, not full_outer + CASE. The
change-set after LWW dedup is small relative to the base table (per-epoch
changes ≪ table size at 10^10 scale), so:

    new_state = base ⟕anti changes (keys NOT updated/deleted)
              ∪ changes.filter(op != 'D').project(payload)

The anti join broadcasts the deduped change-keys when they fit under the
broadcast threshold — the base table then streams through a
BroadcastHashJoin with **zero shuffle of the base side**, which at 100 TB
is the only viable plan. When the change-set is too big to broadcast, AQE
falls back to a shuffled join; both sides are already hash-bucketed by
key (the table layout), so the shuffle is aligned.

Reference analog: the reference has no MERGE (full overwrite each run,
``src/config.py:52``); its broadcast-join enrich (``src/pipeline.py:61-99``)
is the physical pattern reused here for the change-key side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply LWW-deduped changes to base; returns the new state.

    ``changes`` must be one row per key with an ``op`` column in
    {I, U, D}; its payload columns must be a superset of ``base``'s
    (schema evolution adds columns on the change side first).
    """
    ch_payload = changes.drop("op", "lsn", "epoch", "ts").columns
    # output schema = UNION of base and change payloads: a column the
    # change side lacks (old-schema producer after additive evolution)
    # must survive on untouched rows and read as NULL on upserted rows —
    # dropping it would silently lose data for every survivor.
    out_cols = list(base.columns) + [c for c in ch_payload if c not in base.columns]
    ch_types = {f.name: f.dataType for f in changes.schema.fields}
    base_types = {f.name: f.dataType for f in base.schema.fields}

    change_keys = changes.select(key)
    if broadcast_changes:
        change_keys = F.broadcast(change_keys)
    base_aligned = base
    for c in out_cols:
        if c not in base.columns:
            base_aligned = base_aligned.withColumn(c, F.lit(None).cast(ch_types[c]))
    survivors = base_aligned.select(*out_cols).join(change_keys, key, "left_anti")
    upserts = changes.filter(F.col("op") != F.lit("D"))
    for c in out_cols:
        if c not in ch_payload:
            upserts = upserts.withColumn(c, F.lit(None).cast(base_types[c]))
    upserts = upserts.select(*out_cols)
    return survivors.unionByName(upserts)

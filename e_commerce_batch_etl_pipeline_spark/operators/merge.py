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


def merge_upsert_lww(
    base: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """MERGE as one union + LWW aggregate — the BULK-epoch physical plan.

    Semantically identical to ``merge_upsert`` (same I/U/D-with-LWW-source
    contract, same schema-union alignment), but shaped for the regime
    where the change-set is too large to broadcast: instead of a shuffled
    anti join (exchange base + exchange change-keys) FOLLOWED by the
    bucket-aligned write exchange — i.e. the base shuffled twice and the
    changes twice — union base and changes and resolve per key with one
    ``max_by`` aggregate. Base rows carry source-rank 0, change rows
    rank 1, so a change always wins its key; deletes are dropped after
    the aggregate. Grouped by the key, the aggregate's required
    clustering is satisfied by an upstream ``repartition(B, key)``, so
    the whole merge + bucket-pure write runs off a SINGLE exchange of
    base+changes (guide §2.4 "remove shuffles outright"; the caller does
    the repartition so the write's own repartition is elided).

    Not the plan for SMALL change-sets: there the broadcast anti join
    (``merge_upsert``) streams the base through a hash probe with no
    per-row aggregate state; the engine switches on its broadcast
    threshold.
    """
    ch_payload = changes.drop("op", "lsn", "epoch", "ts").columns
    out_cols = list(base.columns) + [c for c in ch_payload if c not in base.columns]
    ch_types = {f.name: f.dataType for f in changes.schema.fields}
    base_types = {f.name: f.dataType for f in base.schema.fields}

    base_aligned = base
    for c in out_cols:
        if c not in base.columns:
            base_aligned = base_aligned.withColumn(c, F.lit(None).cast(ch_types[c]))
    base_side = base_aligned.select(*out_cols).withColumn(
        "_src", F.lit(0)
    ).withColumn("op", F.lit("U"))
    ch_side = changes
    for c in out_cols:
        if c not in ch_payload:
            ch_side = ch_side.withColumn(c, F.lit(None).cast(base_types[c]))
    ch_side = ch_side.select(*out_cols, "op").withColumn("_src", F.lit(1))
    unioned = base_side.unionByName(ch_side)
    if num_partitions is not None:
        # hash-partition by the key at the TABLE's bucket count so the
        # groupBy below needs no exchange of its own and the bucket-pure
        # writer's repartition is elided — the whole merge+write is ONE
        # exchange of base+changes
        unioned = unioned.repartition(num_partitions, F.col(key))
    payload = [c for c in out_cols if c != key] + ["op"]
    winner = unioned.groupBy(key).agg(
        F.max_by(F.struct(*payload), F.struct(F.col("_src"))).alias("_w")
    )
    return (
        winner.filter(F.col("_w.op") != "D")
        .select(key, *[F.col(f"_w.{c}").alias(c) for c in payload if c != "op"])
        .select(*out_cols)
    )

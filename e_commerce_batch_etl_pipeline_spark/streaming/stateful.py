"""Custom stateful streaming operator: cross-batch LWW state tracking.

``applyInPandasWithState`` keeps, per doc_id, the highest LSN applied so
far across ALL streaming microbatches and emits one row per key per batch
only when the key's state actually advanced — a streaming change-compactor
that turns a chatty WAL into a deduplicated update feed (the stateful
analog of the per-epoch LWW; SURVEY.md §2.10 custom stateful operator).

Late/duplicate envelopes (lsn ≤ stored state) are swallowed — the same
idempotency rule as the batch engine's watermark filter, enforced by
streaming state instead of snapshot metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "doc_id string, lsn long, op string, n_tok int, advanced boolean"
)
STATE_SCHEMA = "max_lsn long"


def _compact_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (doc_id,) = key
    prev = state.get[0] if state.exists else -1
    best_lsn, best_op, best_ntok = prev, None, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        i = pdf["lsn"].idxmax()
        lsn = int(pdf["lsn"].loc[i])
        if lsn > best_lsn:
            best_lsn = lsn
            best_op = str(pdf["op"].loc[i])
            toks = pdf["tokens"].loc[i]
            best_ntok = None if toks is None else int(len(toks))
    if best_op is None:
        # every envelope in this batch was stale — swallow
        yield pd.DataFrame(columns=["doc_id", "lsn", "op", "n_tok", "advanced"])
        return
    state.update((best_lsn,))
    yield pd.DataFrame(
        {
            "doc_id": [doc_id],
            "lsn": [best_lsn],
            "op": [best_op],
            "n_tok": pd.array([best_ntok], dtype="Int32"),
            "advanced": [True],
        }
    )


def compact_change_stream(stream: DataFrame) -> DataFrame:
    """Stateful LWW compaction of a streaming envelope source."""
    return (
        stream.groupBy("doc_id")
        .applyInPandasWithState(
            _compact_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

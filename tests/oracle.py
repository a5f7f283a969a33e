"""Naive single-threaded replay oracle (FIXTURES.md §E).

Sorts all envelopes by lsn, applies I/U/D into a dict keyed by doc_id,
recomputes n_tok = len(tokens), skips invalid envelopes with the same
validity rules as the engine. ~50 lines, no Spark — the independent
ground truth the distributed engine must match row-for-row with exact
token-array equality (compared as typed int32 arrays).
"""

from __future__ import annotations

import numpy as np

VOCAB = 50257
MAX_TOKENS = 4096


def envelope_valid(row: dict) -> bool:
    if row["doc_id"] is None or row["op"] not in ("I", "U", "D"):
        return False
    if row["op"] == "D":
        return True
    toks = row["tokens"]
    if toks is None or len(toks) == 0 or len(toks) > MAX_TOKENS:
        return False
    a = np.asarray(toks)
    return bool((a >= 0).all() and (a < VOCAB).all())


def replay(base_rows: list[dict], envelopes: list[dict],
           payload_cols: list[str]) -> dict[str, dict]:
    """Returns final state: doc_id -> payload dict (n_tok recomputed)."""
    state: dict[str, dict] = {}
    for r in base_rows:
        state[r["doc_id"]] = {c: r.get(c) for c in payload_cols}
    for r in sorted(envelopes, key=lambda r: r["lsn"]):
        if not envelope_valid(r):
            continue
        k = r["doc_id"]
        if r["op"] == "D":
            state.pop(k, None)
        else:
            row = {c: r.get(c) for c in payload_cols}
            row["n_tok"] = len(r["tokens"])
            state[k] = row
    return state


def assert_states_equal(expected: dict[str, dict], actual: dict[str, dict]):
    """Exact comparison incl. per-row token-array equality as int32."""
    missing = set(expected) - set(actual)
    extra = set(actual) - set(expected)
    assert not missing and not extra, (
        f"key mismatch: missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}"
    )
    for k, exp in expected.items():
        act = actual[k]
        for c, v in exp.items():
            av = act.get(c)
            if c == "tokens":
                if v is None:
                    assert av is None, f"{k}.tokens expected None got {av}"
                else:
                    ea = np.asarray(v, dtype=np.int32)
                    aa = np.asarray(av, dtype=np.int32)
                    assert ea.shape == aa.shape and (ea == aa).all(), (
                        f"{k}.tokens differ"
                    )
            else:
                assert v == av, f"{k}.{c}: expected {v!r} got {av!r}"

"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode_image``/``decode_audio`` raise NotImplementedError unless the
deterministic fake decoder is selected. What IS real and tested is the
Spark-side plumbing a 100 TB multimodal pipeline needs:

- schema: ``binary`` payload + struct metadata column
- ``mapInPandas`` batch iterator (Arrow transfer, per-batch numpy work)
- partition sizing: binary rows are wide — callers should set
  ``spark.sql.files.maxPartitionBytes`` down (e.g. 32 MB) so a partition
  of blobs fits executor memory; feature extraction is map-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id string, n_bytes int, header int, checksum string, "
    "feat_mean double, feat_dim int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: synthesize an opaque binary payload column from text
    (stands in for image bytes; deterministic)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image(blob: bytes) -> "object":
    """Real decode path — requires an image lib not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not in this environment); "
        "use fake_decode_features for the deterministic test path"
    )


def fake_decode_features(blob: bytes, dim: int = 4) -> list[float]:
    """Deterministic fake 'decoder': derives a feature vector from the
    byte content (stable stand-in for a real embedding model).

    acc[j] is a running (sum + byte) % 997 over bytes at positions
    ≡ j (mod dim) — algebraically sum(bytes[j::dim]) % 997, which is
    what the vectorized batch path computes (bit-equality tested)."""
    if blob is None or len(blob) == 0:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(blob):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [a / 997.0 for a in acc]


def _fake_decode_features_np(blob, dim: int = 4) -> list[float]:
    """Vectorized ``fake_decode_features``: one numpy strided sum per
    feature instead of a per-byte Python loop (guide §4.2 — hand whole
    batches to native vectorized code). Bit-identical by construction:
    ((a + b) % m applied left-to-right) == (Σ % m) on ints, and the final
    /997.0 divides the same exact integers."""
    import numpy as np

    if blob is None or len(blob) == 0:
        return [0.0] * dim
    a = np.frombuffer(blob, dtype=np.uint8)
    return [int(a[j::dim].sum(dtype=np.int64)) % 997 / 997.0
            for j in range(dim)]


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload",
                     batch_decoder=fake_decode_features) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Arrow batch in, one out; numpy per blob inside the batch (the
    real version would call the decoder model here). The default decoder
    is swapped for its vectorized numpy twin (bit-equal, tested) so no
    per-byte Python runs in the batch loop; a caller-supplied decoder is
    honored as given."""
    import hashlib

    decoder = (
        _fake_decode_features_np
        if batch_decoder is fake_decode_features
        else batch_decoder
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[payload_col]
            feats = [decoder(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "n_bytes": [0 if b is None else len(b) for b in blobs],
                    "header": [
                        -1 if (b is None or len(b) == 0) else int(b[0])
                        for b in blobs
                    ],
                    "checksum": [
                        "" if b is None else hashlib.md5(b).hexdigest()
                        for b in blobs
                    ],
                    "feat_mean": [sum(f) / len(f) for f in feats],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, FEATURE_SCHEMA)

"""Text analysis for training-data pipelines: token counting, quality
metrics, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (codegen'd, no Python): at 100 TB these are
map-only stages fused into the scan. Counts are exact integers —
ratio-style scores are exported as (numerator, denominator) pairs because
decimal rounding of float divisions is not portable across engines.

Reference analog: derived-column transforms ``src/transform.py:115-141``
and DQ completeness metrics ``src/quality_checks.py`` applied to text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# BPE-ish tokenizer: runs of letters, runs of digits, single other glyph
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "ein"],
    "fr": ["le", "la", "et", "un"],
    "es": ["el", "la", "y", "un"],
}


def ws_token_count(text):
    """Whitespace token count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def bpe_token_count(text):
    """Regex-BPE-ish token count over lowercased text."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_RE), 0))


def distinct_word_count(text):
    return F.size(F.array_distinct(F.split(F.trim(text), r"\s+")))


def stopword_count(text, lang: str):
    """Count of whitespace tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(
        F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.array_contains(sw, w))
    )


def lang_guess(text):
    """Stopword-majority language guess (n-gram-free heuristic)."""
    counts = {lang: stopword_count(text, lang) for lang in STOPWORDS}
    best = F.lit("und")
    best_n = F.lit(0)
    # deterministic argmax: iterate langs in sorted order, strict >
    for lang in sorted(STOPWORDS):
        c = counts[lang]
        cond = c > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, c).otherwise(best_n)
    return best


def doc_fingerprint(text):
    """Normalized-content fingerprint (md5 of lower+trim)."""
    return F.md5(F.lower(F.trim(text)))


def rolling_fingerprint(text, window: int = 16):
    """Winnowing-style representative fingerprint: min md5int over all
    ``window``-char shingles — robust to local edits, portable."""
    from ..operators.dedup import md5int

    n = F.length(text) - window + 1
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: md5int(text.substr(i, F.lit(window))),
    )
    return F.array_min(shingles)


def zscore_by_group(df, group_col: str = "source", value_col: str = "n_chars",
                    id_col: str = "doc_id"):
    """Per-group z-score normalization via grouped-map applyInPandas
    (the groupBy().applyInPandas surface — per-group pandas DataFrame in,
    DataFrame out; Arrow both ways).

    Deterministic cross-engine contract: mean/var are derived from exact
    integer sums in a FIXED formula (mean = s/n; var = (ss - s*s/n)/n),
    so any engine recomputing the same formula from the same ints gets
    bit-identical doubles; the z output is floor-quantized to 1e-4.
    """
    import math

    import pandas as pd

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype("int64")
        n = int(len(x))
        s = int(x.sum())
        ss = int((x * x).sum())
        mean = s / n
        var = (ss - s * s / n) / n
        std = math.sqrt(var) if var > 0 else 0.0
        if std == 0.0:
            zq = [0] * n
        else:
            zq = [math.floor((int(v) - mean) / std * 10000 + 0.5) for v in x]
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                value_col: x,
                "z_q": pd.array(zq, dtype="int64"),
            }
        )

    schema = f"{id_col} long, {group_col} string, {value_col} long, z_q long"
    return df.select(id_col, group_col, value_col).groupBy(group_col).applyInPandas(
        per_group, schema
    )

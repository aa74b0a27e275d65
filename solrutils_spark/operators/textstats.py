"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the per-document scoring pass of a training-data
pipeline. Everything is Column expressions (whole-stage codegen) except the
rolling-hash fingerprint, which is an Arrow-batched numpy pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solrutils_spark.operators.util import _extend_schema

# --------------------------------------------------------------- langid ----

# tiny per-language stopword marker sets (n-gram heuristic, deterministic)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "it"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "avec"],
    "es": ["el", "los", "las", "una", "por", "para", "con", "del", "está", "que"],
    "ru": ["и", "в", "не", "на", "что", "это", "как", "по", "для", "его"],
}


def langid_score_cols(text_col: Column) -> list[Column]:
    """Per-language marker-hit counts over lowercased word set."""
    words = F.split(F.lower(text_col), r"[^\p{L}]+")
    cols = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.array_intersect(words, marker_arr))
        cols.append(hits.alias(f"hits_{lang}"))
    return cols


def detect_language(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Argmax of marker hits; 'und' when nothing matches. Pure Column exprs."""
    langs = list(_LANG_MARKERS)
    with_hits = df.select("*", *langid_score_cols(F.col(text_col)))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties (stable order)
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return with_hits.withColumn(out_col, pred).drop(*[f"hits_{lang}" for lang in langs])


# -------------------------------------------------------------- quality ----

def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio features + a composite score.

    All JVM-side: a 100 TB corpus pays one narrow scan, no Python.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(words))
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(0.0)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    n_digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    digit_ratio = F.when(n_chars > 0, n_digits / n_chars).otherwise(0.0)
    en_stop = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    stop_hits = F.size(F.array_intersect(F.split(F.lower(t), r"[^a-z]+"), en_stop))
    stop_ratio = F.when(n_words > 0, stop_hits / F.least(n_words, F.lit(10))).otherwise(0.0)
    upper_ratio = F.when(
        n_chars > 0,
        (F.length(F.regexp_replace(t, r"[^A-Z]", "")) / n_chars),
    ).otherwise(0.0)

    score = (
        F.when((n_words >= 10) & (n_words <= 100_000), 0.4).otherwise(0.0)
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), 0.2).otherwise(0.0)
        + F.when(punct_ratio <= 0.3, 0.2).otherwise(0.0)
        + F.least(stop_ratio, F.lit(1.0)) * 0.2
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        F.round(mean_word_len, 4).alias("q_mean_word_len"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        F.round(digit_ratio, 4).alias("q_digit_ratio"),
        F.round(stop_ratio, 4).alias("q_stop_ratio"),
        F.round(upper_ratio, 4).alias("q_upper_ratio"),
        F.round(score, 4).alias("q_score"),
    )


# --------------------------------------------------------------- tokens ----

# BPE-ish pre-tokenization: word pieces, numbers, punctuation runs — the
# standard GPT-2-style pattern family (public knowledge)
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|\w+|[^\w\s]+|\s+"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish piece count (both JVM regex — no UDF)."""
    t = F.col(text_col)
    ws = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    pieces = F.size(F.regexp_extract_all(t, F.lit(r"'(?:s|t|re|ve|m|ll|d)|\w+|[^\w\s]+"), 0))
    return df.select(
        "*", ws.alias("tok_ws"), pieces.alias("tok_bpeish")
    )


# ---------------------------------------------------------- fingerprint ----

def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact) + winnowed
    rolling-hash sketch (robust to small edits). Rolling hash is Rabin-Karp
    over bytes, numpy-vectorized per Arrow batch."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    with_md5 = df.withColumn("fp_md5", F.md5(normalized))

    cols = with_md5.columns
    schema = _extend_schema(with_md5, "fp_winnow", "array<long>")
    W, K, BASE, MOD = 32, 8, 257, (1 << 31) - 1

    pows = np.array(
        [pow(BASE, K - 1 - j, MOD) for j in range(K)], dtype=np.uint64
    )
    mod = np.uint64(MOD)

    def window_hashes(b: np.ndarray) -> np.ndarray:
        """All K-gram polynomial hashes mod 2^31-1, fully vectorized: K
        column passes over the sliding-window view (each step's accumulator
        stays < 2^40, safely inside uint64 — no per-byte Python loop; values
        identical to the round-1 rolling recurrence)."""
        win = np.lib.stride_tricks.sliding_window_view(b, K).astype(np.uint64)
        h = np.zeros(win.shape[0], dtype=np.uint64)
        for j in range(K):
            h = (h + win[:, j] * pows[j]) % mod
        return h.astype(np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sketches = []
            for text in pdf[text_col].fillna(""):
                b = np.frombuffer(
                    " ".join(text.lower().split()).encode("utf-8", "ignore"), dtype=np.uint8
                )
                if b.size < K:
                    sketches.append([])
                    continue
                h = window_hashes(b)
                # winnowing: min hash per window of W
                if h.size <= W:
                    sketches.append([int(h.min())])
                else:
                    mins = np.lib.stride_tricks.sliding_window_view(h, W).min(axis=1)
                    sketches.append(sorted(set(mins.tolist()))[:64])
            pdf["fp_winnow"] = sketches
            yield pdf[cols + ["fp_winnow"]]

    return with_md5.mapInPandas(gen, schema)

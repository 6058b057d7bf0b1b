"""Text-analysis builders for training-data pipelines (north-star
extensions; SURVEY.md §2 D6/U4 + BASELINE.json): tokenization, token
stats, stopword scoring, language-ID heuristic, shingling, rolling-hash
fingerprints. All native higher-order-function expressions — no Python
in the row path, so the whole stage stays in whole-stage codegen and
scales linearly with executors.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tiny built-in stopword lists for heuristic scoring. On natural text
# these discriminate well; the harness corpus shares one vocabulary
# across langs, so there the operator is proven by oracle-parity rather
# than by classification accuracy.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "les", "et", "des", "une"),
    "de": ("der", "die", "und", "das", "ein"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (U4: explode(split()) — no UDTF)."""
    return F.split(F.lower(text), " ")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_hits(toks: Column, words: Sequence[str]) -> Column:
    """Occurrence count of any of ``words`` (list_filter keeps
    duplicates — occurrence, not membership, semantics)."""
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_hits(toks, ws) for lang, ws in STOPWORDS.items()}


def predict_lang(toks: Column) -> Column:
    """Greatest-hits language prediction with deterministic tie-break
    (alphabetical language order, 'unknown' when all scores zero)."""
    scores = lang_scores(toks)
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(out)
    return out


def shingles(toks: Column, k: int) -> Column:
    """All k-token shingles as strings; short docs yield one shingle of
    the whole text (sequence/transform/slice — pure codegen)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )


def fingerprint(text: Column, k: int = 5) -> Column:
    """Document fingerprint: min-md5 over k-token shingles — the
    winnowing/rolling-hash family's single-fingerprint special case.
    md5 hex is engine-portable (oracle-checkable), unlike xxhash64."""
    sh = shingles(tokens(text), k)
    return F.array_min(F.transform(sh, F.md5))


def winnow_fingerprints(text: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken's MOSS
    algorithm): md5 each ordered k-token shingle, take the minimum of
    every w-wide sliding window of hashes, distinct the minima.
    Guarantees a shared fingerprint for any shared run of k+w-1 tokens
    — the standard plagiarism/near-dup fingerprinting scheme.

    Implementation is ALL higher-order array expressions (sequence/
    slice/array_min) — zero shuffles, zero explode fan-out: the
    per-doc window walk stays inside one row, so the operator is
    embarrassingly parallel at any corpus size. md5 (not xxhash64) so
    the whole operator is oracle-checkable cross-engine.
    """
    hs = F.transform(shingles(tokens(text), k), F.md5)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(hs) - (w - 1), F.lit(1))
    )
    return F.array_distinct(
        F.transform(starts, lambda i: F.array_min(F.slice(hs, i, w)))
    )


def shingle_hashes(toks: Column, k: int) -> Column:
    """Sorted distinct xxhash64 values of k-shingles — the minhash
    signature source (xxhash64: 64-bit, JVM-side, fast; engine-specific
    so rows-only checks)."""
    return F.array_sort(
        F.transform(
            F.array_distinct(shingles(toks, k)), lambda s: F.xxhash64(s)
        )
    )


def simhash64(feature_hashes: Column) -> Column:
    """64-bit SimHash from an ``array<long>`` of feature hashes: per-bit
    majority vote across features, majority bits packed into a long.

    Split of labor: the feature hashing (xxhash64 per shingle) stays
    JVM-side where it's a native codegen'd expression; the 64-way bit
    census runs as an Arrow-batched Pandas UDF (one numpy pass per
    batch). The all-expression alternative (64 sum(when(bit)) aggs over
    an exploded feature table) costs a shuffle plus interpreted
    evaluation of 64 conditionals per feature — measured ~10× slower.
    """

    @F.pandas_udf(T.LongType())
    def _sig(hs: pd.Series) -> pd.Series:
        # Whole-batch vectorization — no per-row Python loop. All rows'
        # feature arrays are concatenated once; the bit matrix comes
        # from np.unpackbits over the little-endian byte view (bit i of
        # each uint64 lands in column i on x86), and the per-row bit
        # census is one segment-sum (np.add.reduceat at row offsets,
        # accumulated in int64 so uint8 bits can't overflow).
        # Precondition: every feature array is non-empty (shingles()
        # guarantees >=1 shingle per doc).
        n = len(hs)
        if n == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        lens = np.fromiter((len(a) for a in hs), count=n, dtype=np.int64)
        if lens.min() <= 0:
            raise ValueError("simhash64 requires non-empty feature arrays")
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in hs]
        )
        bits = np.unpackbits(
            flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        ones = np.add.reduceat(bits, offsets, axis=0, dtype=np.int64)
        maj = (2 * ones > lens[:, None]).astype(np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        out = (maj << shifts).sum(axis=1, dtype=np.uint64).view(np.int64)
        return pd.Series(out)

    return _sig(feature_hashes)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / F.size(F.array_union(a, b)).cast("double")

"""Bounded-memory frequent items — Misra-Gries heavy-hitter sketch.

The exact heavy-hitter query (``GROUP BY key HAVING count > n/s``)
shuffles one row per DISTINCT key — at 100 TB with a high-cardinality
key (URLs, user ids, shingle fingerprints) that is the cost being
diagnosed, not paid willingly. Misra-Gries bounds the state instead:
``capacity`` counters per partition, processed in one pass, with the
classic guarantee that any item whose true count exceeds
``n_partition/(capacity+1)`` survives the partition's summary — so the
UNION of per-partition summaries contains every item with GLOBAL count
above ``n/(capacity+1)`` (if an item is absent from every summary, its
total count is at most Σ n_p/(capacity+1) = n/(capacity+1)).

:func:`frequent_items` is the two-pass exact form built on that
superset guarantee: pass 1 collects candidates (O(capacity) rows per
partition — a broadcast-sized frame, never O(distinct keys)); pass 2
re-counts ONLY the candidates exactly (broadcast semi-join + groupBy
over a frame whose distinct-key count is bounded by
capacity × partitions). Filtering the exact counts at the guarantee
threshold therefore returns EXACTLY the items with
``count > n/(capacity+1)`` — deterministic, engine-independent, and
thus oracle-checkable (q_heavy_hitters) even though the sketch itself
is approximate.

The per-batch merge is the mergeable-summaries form (Agarwal et al.,
"Mergeable Summaries", PODS 2012): vectorized ``value_counts`` per
Arrow batch, merged into the partition's counters in capacity-sized
CHUNKS with a compaction between chunks — so peak state is O(capacity)
even over a high-cardinality Arrow batch (an r9 ADVICE finding: the
batch-at-once merge let transient state grow to the batch's
distinct-key count before the first compaction). Each compaction
subtracts the (capacity+1)-st largest count from every counter and
drops non-positive ones — at most ``capacity`` survive, each
compaction removes at least (capacity+1)× the subtracted mass, and the
subtracted masses telescope the same way regardless of chunking, which
is what yields the n/(capacity+1) undercount bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(
    df: DataFrame, col: str, capacity: int = 8
) -> DataFrame:
    """Per-partition Misra-Gries candidate items for ``col`` — at most
    ``capacity`` rows per partition, one pass, Arrow-batched. The
    union over partitions is a SUPERSET of every item with global
    count > n/(capacity+1); counts are deliberately not emitted (the
    sketch's counts are lower bounds — consumers wanting numbers take
    the exact second pass, :func:`frequent_items`)."""
    out_schema = df.select(col).schema

    def compact(counters: dict) -> dict:
        if len(counters) <= capacity:
            return counters
        counts = np.sort(np.fromiter(counters.values(), dtype="int64"))
        d = int(counts[-(capacity + 1)])
        return {k: c - d for k, c in counters.items() if c - d > 0}

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()  # vectorized per batch
            # Merge in capacity-sized chunks, compacting between them:
            # peak state stays O(capacity) even when the batch holds
            # far more distinct keys than capacity, and the guarantee
            # math is unchanged (each compaction still removes
            # >= (capacity+1)x the subtracted mass).
            items = list(vc.items())
            for start in range(0, len(items), capacity):
                for v, c in items[start : start + capacity]:
                    counters[v] = counters.get(v, 0) + int(c)
                counters = compact(counters)
        yield pd.DataFrame({col: pd.Series(list(counters.keys()))})

    return df.select(col).mapInPandas(summarize, out_schema)


def frequent_items(
    df: DataFrame, col: str, capacity: int = 8
) -> DataFrame:
    """Exact counts of the Misra-Gries candidate set: ``(col, cnt)``
    for a superset of every item with count > n/(capacity+1). The
    candidate frame is capacity×partitions rows (broadcast); the
    second pass scans once more and aggregates only candidate keys —
    state O(candidates), never O(distinct keys). NULLs are excluded
    (a NULL key is a data-quality signal, not a heavy hitter —
    q_null_range_checks' census owns it)."""
    keyed = df.filter(F.col(col).isNotNull())
    cand = mg_candidates(keyed, col, capacity).distinct()
    return (
        keyed.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

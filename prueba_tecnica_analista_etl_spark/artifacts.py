"""Per-corpus staged artifacts — memoized, lineage-truncated frames.

Real curation pipelines don't recompute shared intermediates per
consumer: the candidate-pair frame, the trained IVF quantizer, and the
per-doc unigram score frame are ARTIFACTS of a corpus — computed once,
reused by every downstream query/run until the corpus changes. This
module generalizes the memoization first built for the minhash pair
frame (pipelines/corpus.py) and the IVF quantizer
(extensions_scale._IVF_CACHE) into one keyed store:

* key = (session, corpus dir, artifact name); the session is held by
  WEAK reference so a stopped/garbage-collected session never pins its
  checkpointed RDD blocks — dead entries are swept on every lookup;
* the built frame is eagerly ``localCheckpoint``-ed: lineage
  truncation is what makes reuse cheap (persist alone re-optimizes the
  full logical plan per action — measured in corpus.py:_materialize),
  at the price of running Spark jobs at build time (the documented
  eager-staging trade; at cluster scale swap for ``checkpoint()`` with
  a reliable dir);
* ``clear_artifacts`` is the explicit invalidation path for callers
  that rewrite a corpus under the same path.

Only SMALL post-aggregation frames belong here (pairs: O(near-dup
families); unigram scores: one row per doc) — checkpointing a
pre-shuffle exploded frame would trade cheap codegen recompute for
materialization I/O and lose.
"""

from __future__ import annotations

import weakref
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[
    tuple[int, str, str], tuple["weakref.ref[SparkSession]", DataFrame]
] = {}


def corpus_artifact(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized, checkpointed artifact ``name`` for
    ``(spark, sf_dir)``, building it with ``build()`` on first use."""
    for key in [k for k, (ref, _) in _CACHE.items() if ref() is None]:
        del _CACHE[key]
    key = (id(spark), sf_dir, name)
    hit = _CACHE.get(key)
    if hit is not None and hit[0]() is spark:
        return hit[1]
    df = build().localCheckpoint()
    _CACHE[key] = (weakref.ref(spark), df)
    return df


def clear_artifacts(
    spark: SparkSession | None = None, name: str | None = None
) -> None:
    """Drop memoized artifacts — all of them, one session's, one
    artifact name's, or the intersection."""
    for key in [
        k
        for k in _CACHE
        if (spark is None or k[0] == id(spark))
        and (name is None or k[2] == name)
    ]:
        del _CACHE[key]

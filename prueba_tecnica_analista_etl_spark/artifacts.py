"""Per-corpus staged artifacts — memoized, lineage-truncated frames.

Real curation pipelines don't recompute shared intermediates per
consumer: the candidate-pair frame, the trained IVF quantizer, and the
per-doc unigram score frame are ARTIFACTS of a corpus — computed once,
reused by every downstream query/run until the corpus changes. This
module generalizes the memoization first built for the minhash pair
frame (pipelines/corpus.py) into one keyed store for DataFrame-shaped
artifacts (the IVF quantizer keeps its own sibling store in
extensions_scale._IVF_CACHE — it caches a numpy centroid array, not a
frame, so ``localCheckpoint`` does not apply to it):

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

import os
import threading
import weakref
import zlib
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[
    tuple, tuple["weakref.ref[SparkSession]", DataFrame]
] = {}
_VALUE_CACHE: dict[
    tuple, tuple["weakref.ref[SparkSession]", object]
] = {}


# The fingerprint itself is memoized for a short TTL (r9 ADVICE: the
# walk+stat is O(files) per artifact LOOKUP, which undercuts the cache
# on large corpora — one bench pass issues hundreds of lookups against
# an unchanging directory). Two seconds is far below any real
# regenerate-then-query gap while collapsing a pass's lookups to one
# walk; clear_artifacts drops the memo, so the explicit invalidation
# path never serves a stale fingerprint.
_FP_TTL_S = 2.0
_FP_MEMO: dict[str, tuple[float, int]] = {}


def _corpus_fingerprint(sf_dir: str) -> int:
    """Cheap content fingerprint of a corpus directory: CRC over every
    file's (relative path, size, mtime_ns), O(files) stat calls and no
    data reads — memoized for _FP_TTL_S seconds per directory. Folded
    into every artifact key so a corpus REGENERATED under the same
    path (ADVICE r8: the silent-wrong-results class — stale bloom
    bitsets dropping true semi-join matches, stale rank histograms)
    misses the cache and rebuilds, instead of answering from the old
    corpus. ``clear_artifacts`` remains the explicit (and only
    immediate) invalidation path; the implicit fingerprint makes
    forgetting it safe AFTER the memo TTL — a rewrite followed by a
    lookup within _FP_TTL_S can still hit the old generation, the
    documented price of not re-stat'ing the tree per lookup."""
    import time

    now = time.monotonic()
    with _LOCK:
        hit = _FP_MEMO.get(sf_dir)
        if hit is not None and now - hit[0] < _FP_TTL_S:
            return hit[1]
    crc = 0
    try:
        for root, dirs, files in os.walk(sf_dir):
            dirs.sort()
            for name in sorted(files):
                p = os.path.join(root, name)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                rec = f"{os.path.relpath(p, sf_dir)}:{st.st_size}:{st.st_mtime_ns}"
                crc = zlib.crc32(rec.encode(), crc)
    except OSError:
        return -1
    with _LOCK:
        _FP_MEMO[sf_dir] = (now, crc)
    return crc
# Consumers run CONCURRENTLY (the bench's 16-thread pass issues
# q_unigram_logprob and q_perplexity_buckets together): _LOCK guards
# the dict, and a per-key build lock makes "built once per corpus"
# actually hold under races — without it both threads miss and both
# pay the full build, with the loser's checkpointed blocks leaking
# until GC.
_LOCK = threading.Lock()
# Keys are the 4-tuples of the caches above (incl. the corpus
# fingerprint), so a regenerated corpus builds under its own lock.
_BUILD_LOCKS: dict[tuple, threading.Lock] = {}


def corpus_artifact(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized, checkpointed artifact ``name`` for
    ``(spark, sf_dir)``, building it with ``build()`` on first use.
    The key carries a corpus fingerprint (file sizes + mtimes), so
    rewriting the corpus under the same path invalidates implicitly."""
    key = (id(spark), sf_dir, name, _corpus_fingerprint(sf_dir))
    with _LOCK:
        for k in [
            k for k, (ref, _) in _CACHE.items() if ref() is None
        ]:
            _CACHE.pop(k, None)
        hit = _CACHE.get(key)
        if hit is not None and hit[0]() is spark:
            return hit[1]
        build_lock = _BUILD_LOCKS.setdefault(key, threading.Lock())
    with build_lock:
        # Double-check: a concurrent builder may have finished while
        # this thread waited on the build lock.
        with _LOCK:
            hit = _CACHE.get(key)
            if hit is not None and hit[0]() is spark:
                return hit[1]
        try:
            df = build().localCheckpoint()
        finally:
            with _LOCK:
                _BUILD_LOCKS.pop(key, None)
        with _LOCK:
            # Evict superseded generations of the same artifact: the
            # old-fingerprint entry can never hit again and would pin
            # its checkpointed blocks for the session's lifetime.
            for k in [k for k in _CACHE if k[:3] == key[:3] and k != key]:
                _CACHE.pop(k, None)
            _CACHE[key] = (weakref.ref(spark), df)
    return df


def census_artifact(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], object],
) -> object:
    """Sibling store for DRIVER-SIDE census values — bucket
    histograms, bitset words, min/max bounds: the model-sized Python
    objects the distributed-pattern operators collect once per corpus
    (operators/rank.py, operators/bloom.py). Same discipline as
    corpus_artifact (weak session ref, per-key build lock, swept on
    lookup) minus the checkpoint — these are plain values, not
    frames. Only census-sized objects belong here: everything stored
    must be O(buckets|bits|model), never O(rows)."""
    key = (
        id(spark),
        sf_dir,
        f"census:{name}",
        _corpus_fingerprint(sf_dir),
    )
    with _LOCK:
        for k in [
            k for k, (ref, _) in _VALUE_CACHE.items() if ref() is None
        ]:
            _VALUE_CACHE.pop(k, None)
        hit = _VALUE_CACHE.get(key)
        if hit is not None and hit[0]() is spark:
            return hit[1]
        build_lock = _BUILD_LOCKS.setdefault(key, threading.Lock())
    with build_lock:
        with _LOCK:
            hit = _VALUE_CACHE.get(key)
            if hit is not None and hit[0]() is spark:
                return hit[1]
        try:
            value = build()
        finally:
            with _LOCK:
                _BUILD_LOCKS.pop(key, None)
        with _LOCK:
            for k in [
                k for k in _VALUE_CACHE if k[:3] == key[:3] and k != key
            ]:
                _VALUE_CACHE.pop(k, None)
            _VALUE_CACHE[key] = (weakref.ref(spark), value)
    return value


def clear_artifacts(
    spark: SparkSession | None = None, name: str | None = None
) -> None:
    """Drop memoized artifacts — all of them, one session's, one
    artifact name's, or the intersection. The invalidation path for
    callers that rewrite a corpus under the same directory."""
    with _LOCK:
        _FP_MEMO.clear()
        for key in [
            k
            for k in _CACHE
            if (spark is None or k[0] == id(spark))
            and (name is None or k[2] == name)
        ]:
            _CACHE.pop(key, None)
        for key in [
            k
            for k in _VALUE_CACHE
            if (spark is None or k[0] == id(spark))
            and (name is None or k[2] == f"census:{name}")
        ]:
            _VALUE_CACHE.pop(key, None)

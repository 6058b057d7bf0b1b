"""Corpus curation pipeline — the end-to-end shape of a training-data
prep job, composing the engine's extension operators into one lazy DAG:

    documents
      → quality gate   (length + stopword-ratio heuristics, native)
      → exact dedup    (content-keyed keep-first, one shuffle)
      → near-dup purge (banded-minhash candidate pairs, greedy
                        min-doc_id survivor per pair)

Survivor rule: every near-dup pair is emitted as (doc_a < doc_b) and
the purge computes the greedy min-id maximal independent set by
fixpoint iteration — a doc is dropped only while some SURVIVING
smaller near-dup of it exists. One-shot "drop every doc_b" would
over-purge chains (A~B, B~C, A≁C kills C even though its only
near-dup B is itself dead); the iteration re-admits such docs. Still
the cheap-and-deterministic alternative to full connected components
(at 100 TB run GraphFrames CC if transitive-closure cliques matter).

Each stage is one shuffle; nothing collects to the driver except the
audit counts (``observe``-style, after the fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.functions.text import (
    STOPWORDS,
    n_tokens,
    stopword_hits,
    tokens,
)
from prueba_tecnica_analista_etl_spark.operators.dedupe import keep_first


def quality_gate(
    docs: DataFrame,
    min_tokens: int = 4,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Heuristic quality filter: minimum length and (optionally) a
    minimum any-language stopword density — gibberish has none."""
    toks = tokens(F.col("text"))
    all_stops = [w for ws in STOPWORDS.values() for w in ws]
    d = docs.withColumn("n_tokens", n_tokens(F.col("text"))).withColumn(
        "_stop_ratio",
        stopword_hits(toks, all_stops) / F.col("n_tokens"),
    )
    return d.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("_stop_ratio") >= min_stopword_ratio)
    ).drop("_stop_ratio")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Content-keyed keep-first: survivor = min doc_id per identical
    text (md5 the key at scale to shrink shuffle width)."""
    return keep_first(docs, ["text"], [F.asc("doc_id")])


def near_dup_purge(
    docs: DataFrame, pairs: DataFrame, rounds: int = 3
) -> DataFrame:
    """Greedy min-id survivor purge, iterated to fixpoint: drop
    ``doc_b`` only while its ``doc_a`` still survives. ``pairs`` must
    carry (doc_a < doc_b) columns.

    Pairs are first restricted to those whose BOTH endpoints exist in
    ``docs``: the pair generator may run over a wider frame (raw
    corpus before quality gating / exact dedup), and an endpoint
    absent from ``docs`` must impose no constraint — treating it as a
    surviving competitor would purge its partner because of a doc
    that is not even in the corpus.

    The iteration then runs over pair ENDPOINTS only, never the
    corpus: a doc in no pair always survives, so the survivor
    recursion (S = ids − {b : ∃(a,b) ∈ pairs, a ∈ S}) touches
    ≤ 2·|pairs| ids — tiny next to ``docs`` at any scale — and
    ``docs`` itself is scanned only for the endpoint restriction and
    the final anti-join. A chain A~B, B~C with A≁C converges to
    {A, C} in two rounds instead of over-purging C. Convergence needs
    rounds ≥ the longest alternating chain, so after the cap a final
    enforcement pass greedy-drops ``doc_b`` of any still-both-alive
    pair — the no-surviving-near-dup-pair invariant holds
    unconditionally; only chains deeper than ``rounds`` can still
    lose a non-duplicate doc.

    Lineage is truncated with ``localCheckpoint`` at every iteration
    boundary — persist alone is NOT enough: the cached data is
    reused, but Catalyst re-optimizes the FULL logical plan (with the
    giant candidate-pair expression tree in every round's lineage) on
    every action, and plan-compile time alone grew 1.7 → 3.1 s per
    round at sf0.1; checkpointed, a round is ~0.4 s. The checkpointed
    frames are ≤ 2·|pairs| rows. Trade: localCheckpoint is
    non-replayable on executor loss — at cluster scale swap for
    ``checkpoint()`` with a reliable checkpoint dir.
    """
    doc_ids = docs.select("doc_id")
    # Materialize the INPUT pair frame before anything derives from
    # it: the endpoint restriction references it three times, and the
    # candidate-pair DAG behind it (shingle, minhash, bucket, expand)
    # must execute exactly once and then leave the lineage.
    pairs0 = pairs.select("doc_a", "doc_b").localCheckpoint()
    raw_endpoints = F.broadcast(
        pairs0.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs0.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # ids of pair endpoints actually present in the corpus (tiny:
    # ≤ 2·|pairs| — the broadcast side of one semi-join over docs)
    present = doc_ids.join(
        raw_endpoints, "doc_id", "left_semi"
    ).localCheckpoint()
    pairs = (
        pairs0.join(
            F.broadcast(present.select(F.col("doc_id").alias("doc_a"))),
            "doc_a",
            "left_semi",
        )
        .join(
            F.broadcast(present.select(F.col("doc_id").alias("doc_b"))),
            "doc_b",
            "left_semi",
        )
        .localCheckpoint()
    )
    endpoints = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .localCheckpoint()
    )
    alive = endpoints
    for _ in range(rounds):
        losers = (
            pairs.join(
                alive.select(F.col("doc_id").alias("doc_a")),
                "doc_a",
                "left_semi",
            )
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        alive = endpoints.join(
            losers, "doc_id", "left_anti"
        ).localCheckpoint()
    both_live = pairs.join(
        alive.select(F.col("doc_id").alias("doc_a")),
        "doc_a",
        "left_semi",
    ).join(
        alive.select(F.col("doc_id").alias("doc_b")),
        "doc_b",
        "left_semi",
    )
    alive = alive.join(
        both_live.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    dropped = endpoints.join(alive, "doc_id", "left_anti")
    return docs.join(dropped, "doc_id", "left_anti")


# The candidate-pair frame is a per-corpus artifact like the IVF
# quantizer (extensions_scale._IVF_CACHE): real pipelines compute it
# once and reuse it across curation runs, so the engine memoizes the
# CHECKPOINTED frame per (session, corpus). Keyed by id(spark) with
# the session held in the value for identity soundness.
_PAIRS_CACHE: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}


def cached_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prueba_tecnica_analista_etl_spark.plans.extensions_scale import (
        minhash_pairs,
    )

    key = (id(spark), sf_dir)
    hit = _PAIRS_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = minhash_pairs(spark, sf_dir).localCheckpoint()
    _PAIRS_CACHE[key] = (spark, df)
    return df


def curate_corpus(
    spark: SparkSession, sf_dir: str, min_tokens: int = 4
) -> tuple[DataFrame, dict[str, int]]:
    """Full curation chain over the ``documents`` table; returns the
    surviving corpus and per-stage audit counts."""
    from prueba_tecnica_analista_etl_spark.plans.queries import _t

    docs = _t(spark, sf_dir, "documents")
    gated = quality_gate(docs, min_tokens=min_tokens)
    deduped = exact_dedup(gated)
    # The UNCAPPED pair frame: the reporting query's top-100 limit
    # must never bound what curation purges.
    pairs = cached_minhash_pairs(spark, sf_dir)
    survivors = near_dup_purge(deduped, pairs)
    stats = {
        "input_docs": docs.count(),
        "after_quality": gated.count(),
        "after_exact_dedup": deduped.count(),
        "after_near_dup": survivors.count(),
    }
    return survivors, stats

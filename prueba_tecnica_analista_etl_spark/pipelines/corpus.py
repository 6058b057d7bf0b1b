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

    The iteration runs over pair ENDPOINTS only, never the corpus: a
    doc in no pair always survives, so the survivor recursion
    (S = ids − {b : ∃(a,b) ∈ pairs, a ∈ S}) touches ≤ 2·|pairs| ids —
    tiny next to ``docs`` at any scale — and ``docs`` itself is
    anti-joined exactly once at the end. A chain A~B, B~C with A≁C
    converges to {A, C} in two rounds instead of over-purging C.
    Convergence needs rounds ≥ the longest alternating chain, so after
    the cap a final enforcement pass greedy-drops ``doc_b`` of any
    still-both-alive pair — the no-surviving-near-dup-pair invariant
    holds unconditionally; only chains deeper than ``rounds`` can
    still lose a non-duplicate doc. ``pairs`` is persisted for the
    iteration (the standard Spark iterative-algorithm pattern: the
    candidate-pair DAG — shingle, minhash, bucket, expand — must not
    re-execute once per round).
    """
    # Persist the loop-invariant pair set AND each round's survivor
    # frontier: `alive` is referenced by the next round, the
    # enforcement pass, and the final anti-join, so without a persist
    # the lineage re-executes ~2× per round (measured: 3.1 → 5.0 →
    # 12 s for rounds 1..3 at sf0.1; flat ~2 s persisted). All of
    # these frames are ≤ 2·|pairs| rows.
    pairs = pairs.select("doc_a", "doc_b").persist()
    endpoints = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .persist()
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
        alive = endpoints.join(losers, "doc_id", "left_anti").persist()
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


def curate_corpus(
    spark: SparkSession, sf_dir: str, min_tokens: int = 4
) -> tuple[DataFrame, dict[str, int]]:
    """Full curation chain over the ``documents`` table; returns the
    surviving corpus and per-stage audit counts."""
    from prueba_tecnica_analista_etl_spark.plans.extensions_scale import (
        q_minhash_dedup,
    )
    from prueba_tecnica_analista_etl_spark.plans.queries import _t

    docs = _t(spark, sf_dir, "documents")
    gated = quality_gate(docs, min_tokens=min_tokens)
    deduped = exact_dedup(gated)
    pairs = q_minhash_dedup(spark, sf_dir)
    survivors = near_dup_purge(deduped, pairs)
    stats = {
        "input_docs": docs.count(),
        "after_quality": gated.count(),
        "after_exact_dedup": deduped.count(),
        "after_near_dup": survivors.count(),
    }
    return survivors, stats

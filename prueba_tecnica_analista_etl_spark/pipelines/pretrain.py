"""End-to-end pretraining-data run — the flagship COMPOSITION
(r12 verdict task 8): every stage a serious LLM-pretraining data
pipeline runs, chained over the ``documents`` corpus as one auditable
unit with conservation invariants enforced at the seams.

    quality gate → exact dedup → near-dup purge      (pipelines.corpus)
    → semantic (SemDeDup) purge                      (q_semdedup's
                                                      cluster-then-purge
                                                      labels; r14 tier —
                                                      skipped when the
                                                      corpus ships no
                                                      embeddings table)
    → benchmark holdout + 4-gram decontamination     (q_decontaminate's
                                                      broadcast semi-join)
    → deterministic train/val/test split             (q_train_val_split's
                                                      md5-nibble rule)
    → context-window pack plan over train            (q_pack_sequences'
                                                      per-source bins)
    → hash-sharded training export + manifest        (sources.export)

Every stage is the SAME operator the registry proves oracle-exact in
isolation — this module adds the glue, the audit ledger, and the
invariants:

* **doc conservation** — input = dropped-by-quality + dropped-by-
  exact-dedup + dropped-by-near-dup + dropped-by-semdedup +
  benchmark-held + contamination-flagged + kept, and kept = train +
  val + test. A stage that loses or duplicates rows cannot pass
  silently; each dedup tier is one more conservation term (r13
  verdict task 6).
* **token conservation** — train tokens as counted going INTO the
  export equal the shard manifest's token total coming OUT (and the
  pack plan's bin totals equal the same number), so the artifact a
  training job reads reconciles exactly with what curation decided.
* **tamper-evidence** — the export is re-verified via its manifest
  checksums before the run reports success.

Scale shape: the run is ONE lazy DAG per stage family with exactly
the shuffles its component operators already pay (documented on each
operator): the gate/dedup window, the banded-minhash pair shuffle,
one broadcast semi-join for decontamination (the benchmark gram set
is census-sized), a map-only split assignment, one window for the
pack plan, one hash-partition write for the shards. Counts are
census-sized aggregates. Nothing collects row data to the driver.

Reference lineage: the reference's notebook pipeline (read → clean →
dedup → classify → export, ``ETL_Prueba_Tecnica.ipynb:44-116``) is
this composition's 15k-row ancestor; the stages and audit ledger here
are its 100 TB-shaped descendant.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.functions.text import shingles
from prueba_tecnica_analista_etl_spark.pipelines.corpus import (
    curate_corpus,
)
from prueba_tecnica_analista_etl_spark.sources.export import (
    export_training_shards,
    verify_training_shards,
)

# Shared with the registry queries so the composed run and the
# oracle-proven censuses agree by construction.
from prueba_tecnica_analista_etl_spark.plans.extensions_pipeline import (
    CONTAM_MIN_HITS,
    CTX_TOKENS,
)

#: Every 50th doc stands in for the held-out evaluation benchmark —
#: the same convention q_contamination / q_decontaminate prove
#: oracle-exact.
BENCH_MOD = 50


def _split_col() -> F.Column:
    """q_train_val_split's deterministic assignment: first md5 nibble
    of the doc id — <'c' train (12/16), <'e' val (2/16), else test."""
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        F.when(nib < "c", "train").when(nib < "e", "val").otherwise("test")
    )


def _tok_count(text_col: str = "text") -> F.Column:
    return F.size(F.split(F.col(text_col), " ")).cast("long")


def decontaminate(
    docs: DataFrame,
    survivors: DataFrame,
    min_hits: int = CONTAM_MIN_HITS,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(kept, bench_held, flagged) partition of ``survivors``.

    The benchmark gram set is built from the RAW corpus's held-out
    docs (the eval set exists independently of what curation kept),
    broadcast, and semi-joined against the training candidates' grams
    — q_decontaminate's exact shape: the full corpus gram stream is
    never shuffled, only the matched grams reach the per-doc distinct
    count."""
    toks = F.split(F.col("text"), " ")
    bench_grams = (
        docs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.explode(shingles(toks, 4)).alias("gram"))
        .distinct()
    )
    bench_held = survivors.filter(F.col("doc_id") % BENCH_MOD == 0)
    candidates = survivors.filter(F.col("doc_id") % BENCH_MOD != 0)
    flagged_ids = (
        candidates.select(
            "doc_id", F.explode(shingles(toks, 4)).alias("gram")
        )
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
        .select("doc_id")
    )
    # flagged_ids is consumed three times downstream (kept anti-join,
    # flagged semi-join, plus each ledger .count()); truncate its
    # lineage so the broadcast gram join and per-doc distinct-gram
    # aggregation run once. It is O(flagged docs) one-column rows —
    # the same size class as the survivors checkpoint in pretrain_run.
    flagged_ids = flagged_ids.localCheckpoint()
    kept = candidates.join(flagged_ids, "doc_id", "left_anti")
    flagged = candidates.join(flagged_ids, "doc_id", "left_semi")
    return kept, bench_held, flagged


def semantic_purge(
    spark: SparkSession, sf_dir: str, survivors: DataFrame
) -> tuple[DataFrame, int | None]:
    """(kept, n_purged) — drop survivors whose embedding the SemDeDup
    tier purged (q_semdedup's component labels: everything but each
    semantic-duplicate family's min-id representative).

    The harness corpus's ``embeddings`` table indexes a doc subset by
    id (vec_id == doc_id), so the purge is one anti-join of the
    survivor set against the O(purged) label frame — the labels are a
    staged per-corpus artifact (semdedup_labels), already built once
    for q_semdedup.  A corpus that ships no embeddings table skips the
    tier (returns ``n_purged=None``) rather than failing the whole
    run — substring/semantic tiers are additive, not preconditions."""
    emb = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(emb):
        return survivors, None
    from prueba_tecnica_analista_etl_spark.plans.extensions_scale import (
        semdedup_labels,
    )

    purged = (
        semdedup_labels(spark, sf_dir)
        .filter(F.col("node") != F.col("comp"))
        .select(F.col("node").alias("doc_id"))
    )
    kept = survivors.join(purged, "doc_id", "left_anti")
    n = survivors.join(purged, "doc_id", "left_semi").count()
    return kept, n


def _span_signal(spark: SparkSession, sf_dir: str) -> dict:
    """Corpus-wide totals of q_dup_spans' per-source census — the
    memorized-span advisory the run report carries alongside the
    conservation ledger."""
    from prueba_tecnica_analista_etl_spark.plans.extensions_pipeline import (
        q_dup_spans,
    )

    row = (
        q_dup_spans(spark, sf_dir)
        .agg(
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_dup_spans").alias("n_dup_spans"),
        )
        .collect()[0]
    )
    return {
        "n_spans": int(row["n_spans"] or 0),
        "n_dup_spans": int(row["n_dup_spans"] or 0),
    }


def pack_plan(train: DataFrame, ctx_tokens: int = CTX_TOKENS) -> DataFrame:
    """q_pack_sequences' greedy sequential bin plan over the TRAIN
    split: per source, docs fill ctx_tokens-sized bins in doc_id
    order. Returns (source, bin, docs, tokens)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = train.select(
        "source",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / ctx_tokens)
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tok").cast("long").alias("tokens"),
    )


def pretrain_run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_tokens: int = 4,
    ctx_tokens: int = CTX_TOKENS,
    contam_min_hits: int = CONTAM_MIN_HITS,
    n_shards: int = 8,
) -> dict:
    """Run the full composition; returns the audit ledger.

    Raises ``ValueError`` naming the broken invariant if any stage
    loses/duplicates docs or the exported manifest's totals do not
    reconcile with the curation ledger."""
    from prueba_tecnica_analista_etl_spark.plans.queries import _t

    docs = _t(spark, sf_dir, "documents")
    survivors, curate_stats = curate_corpus(
        spark, sf_dir, min_tokens=min_tokens
    )
    # One checkpoint at the curation frontier: every downstream stage
    # (decontaminate, split, pack, export) re-consumes the survivor
    # set several times; without truncation each count would re-run
    # the gate window and the pair purge.
    survivors = survivors.localCheckpoint()

    # Semantic tier (r14): one more conservation term. The purge set
    # is O(semantic dups) rows off the staged semdedup_labels
    # artifact; the anti-join below is re-derived by downstream
    # consumers from the checkpointed survivors, so no extra
    # checkpoint is needed.
    survivors, semdedup_purged = semantic_purge(spark, sf_dir, survivors)

    kept, bench_held, flagged = decontaminate(
        docs, survivors, min_hits=contam_min_hits
    )
    kept = kept.select(
        "doc_id", "source", "text", _tok_count().alias("n_tok")
    ).withColumn("split", _split_col())
    kept = kept.localCheckpoint()

    split_census = {
        r["split"]: (r["docs"], r["tokens"])
        for r in kept.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tok").alias("tokens"),
        )
        .collect()
    }
    train = kept.filter(F.col("split") == "train")
    plan = pack_plan(train, ctx_tokens=ctx_tokens)
    pack_census = plan.agg(
        F.count(F.lit(1)).alias("bins"),
        F.sum("docs").alias("docs"),
        F.sum("tokens").alias("tokens"),
    ).collect()[0]

    shard_dir = os.path.join(out_dir, "train_shards")
    manifest = export_training_shards(
        train.select("doc_id", "source", "text", "n_tok"),
        shard_dir,
        key_col="doc_id",
        n_shards=n_shards,
        token_col="n_tok",
    )
    verify_training_shards(spark, shard_dir)

    ledger = {
        **curate_stats,
        "semdedup_purged": semdedup_purged,
        "bench_held": bench_held.count(),
        "contam_flagged": flagged.count(),
        "kept": kept.count(),
        "splits": {
            s: {"docs": d, "tokens": t}
            for s, (d, t) in sorted(split_census.items())
        },
        "pack": {
            "bins": int(pack_census["bins"]),
            "docs": int(pack_census["docs"]),
            "tokens": int(pack_census["tokens"]),
            "ctx_tokens": ctx_tokens,
        },
        "export": {
            "shards": len(manifest),
            "rows": sum(m["rows"] for m in manifest.values()),
            "tokens": sum(m["tokens"] for m in manifest.values()),
            "path": shard_dir,
        },
        # Substring-level signal (r14): the duplicate-span census
        # joins the ledger as an ADVISORY metric — a span census
        # flags memorized runs for review; it does not own a purge
        # decision, so it is NOT a conservation term. All-integer,
        # deterministic, off the staged doc_spans artifact.
        "dup_span_signal": _span_signal(spark, sf_dir),
    }

    errors = []
    if ledger["after_near_dup"] != (
        (semdedup_purged or 0)
        + ledger["bench_held"]
        + ledger["contam_flagged"]
        + ledger["kept"]
    ):
        errors.append(
            "doc conservation (semdedup+decontaminate): survivors != "
            "semdedup_purged + bench_held + flagged + kept"
        )
    split_docs = sum(v["docs"] for v in ledger["splits"].values())
    if split_docs != ledger["kept"]:
        errors.append("doc conservation (split): splits != kept")
    train_docs, train_tokens = split_census.get("train", (0, 0))
    if ledger["pack"]["docs"] != train_docs:
        errors.append("pack plan lost/duplicated train docs")
    if ledger["pack"]["tokens"] != train_tokens:
        errors.append("pack plan token total != train tokens")
    if ledger["export"]["rows"] != train_docs:
        errors.append("export manifest rows != train docs")
    if ledger["export"]["tokens"] != train_tokens:
        errors.append("export manifest tokens != train tokens")
    if errors:
        raise ValueError(
            "pretrain_run invariants violated: " + "; ".join(errors)
        )
    ledger["invariants_ok"] = True
    return ledger

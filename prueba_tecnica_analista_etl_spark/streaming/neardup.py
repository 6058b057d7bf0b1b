"""Streaming near-duplicate gate — the banded-minhash twin of the
exact-id streaming dedup (T10): each micro-batch of incoming documents
is admitted only if it is NOT a near-duplicate (exact Jaccard >=
threshold over shingle hashes) of any ALREADY-ACCEPTED document, and
within a batch the greedy min-id survivor rule applies — so the
drained accepted set equals the batch greedy purge
(``pipelines.corpus.near_dup_purge_stable``) over the full corpus,
provided arrival order is id order (range-partitioned replay). This
is the "dedupe the incoming crawl against the corpus" operator of a
training-data ingestion pipeline: the batch family
(q_minhash_dedup / q_corpus_curate) curates a CORPUS AT REST, this
gate curates a FEED.

State design (the 100 TB shape):

* The accepted index is an append-only parquet directory of banded
  signature rows ``(doc_id, hs, band, key)`` — one subdirectory per
  committed micro-batch, published tmp-then-rename, so the batch id
  doubles as the idempotency ledger: a replayed batch finds its
  directory and is a no-op (the ``_etl_control`` discipline without a
  side table). Probing is a (band, key) equi-join of the batch's
  banded rows against the index — at scale the index would be
  bucketed/partitioned by the band key so a probe touches only its
  buckets, and hot band keys can be capped exactly like
  ``capped_pair_array`` sub-splits them (the harness-size form joins
  directly; the skew note mirrors the batch family's).
* Per-batch work: one banded-signature pass over the batch (the
  md5_60 minhash family — engine-neutral, identical to the batch
  tier), one index probe join, one intra-batch greedy purge over the
  batch's own candidate pairs. Nothing scans the accepted corpus
  text — only its signature rows.

Sequential-equivalence argument (why drained == batch greedy purge):
accepted docs of earlier batches are exactly the global greedy
survivors below this batch's id range (induction); an index-matched
batch doc is dropped regardless of intra-batch pairs; the remainder's
intra-batch greedy fixpoint equals processing the remainder in id
order (``near_dup_purge`` semantics, ghost endpoints excluded). A doc
whose only near-dup was itself dropped (by the index or by a smaller
survivor) is re-admitted — the chain rule the one-shot "drop every
doc_b" would get wrong.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.functions.text import jaccard


def foreach_batch_neardup_gate(
    index_dir: str,
    band_frame: Callable[[DataFrame], DataFrame],
    pair_frame: Callable[[DataFrame], DataFrame],
    threshold: float = 0.5,
):
    """Build the foreachBatch function of the gate.

    ``band_frame`` maps a documents frame to its banded signature rows
    ``(doc_id, hs, band, key)``; ``pair_frame`` maps a documents frame
    to its intra-frame near-dup pairs ``(doc_a, doc_b, ...)`` at the
    SAME threshold (both injected — typically
    ``plans.extensions_scale.minhash_band_frame`` /
    ``minhash_pair_frame`` — so this module never imports the plans
    layer and the gate stays generic over signature schemes)."""
    os.makedirs(index_dir, exist_ok=True)

    def apply(batch: DataFrame, batch_id: int) -> None:
        accept_dir = os.path.join(index_dir, f"batch-{batch_id:09d}")
        if os.path.isdir(accept_dir):
            return  # replayed batch: already committed — fixpoint
        s = batch.sparkSession
        # localCheckpoint: the banded frame is consumed by the probe
        # join AND the survivor semi-join; without truncation the
        # Arrow/shingle subtree would re-run per consumer.
        banded = band_frame(batch).localCheckpoint()
        committed = sorted(
            os.path.join(index_dir, n)
            for n in os.listdir(index_dir)
            if n.startswith("batch-") and ".tmp-" not in n
        )
        if committed:
            idx = s.read.parquet(*committed)
            matched = (
                banded.alias("n")
                .join(
                    idx.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.key") == F.col("o.key")),
                )
                .filter(
                    jaccard(F.col("n.hs"), F.col("o.hs"))
                    >= F.lit(threshold)
                )
                .select(F.col("n.doc_id").alias("doc_id"))
                .distinct()
            )
            remainder = batch.join(matched, "doc_id", "left_anti")
        else:
            remainder = batch
        # Intra-batch greedy min-id survivors over the remainder only:
        # pairs whose endpoint was index-dropped impose no constraint
        # (near_dup_purge's ghost-endpoint rule, applied by
        # construction since pairs are built FROM the remainder).
        from prueba_tecnica_analista_etl_spark.pipelines.corpus import (
            near_dup_purge_stable,
        )

        survivors, _audit = near_dup_purge_stable(
            remainder, pair_frame(remainder)
        )
        accepted = banded.join(
            survivors.select("doc_id"), "doc_id", "left_semi"
        )
        tmp = f"{accept_dir}.tmp-{uuid.uuid4().hex[:8]}"
        accepted.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, accept_dir)
        except OSError:
            # lost a publish race (another resume of the same
            # checkpoint): the winner's commit stands
            shutil.rmtree(tmp, ignore_errors=True)

    return apply


def accepted_ids(spark, index_dir: str) -> DataFrame:
    """The gate's accepted set as a (doc_id) frame — the lazy batch
    read consumers join against (never a driver collect)."""
    committed = sorted(
        os.path.join(index_dir, n)
        for n in os.listdir(index_dir)
        if n.startswith("batch-") and ".tmp-" not in n
    )
    if not committed:
        raise FileNotFoundError(
            f"near-dup gate index has no committed batches: {index_dir}"
        )
    return spark.read.parquet(*committed).select("doc_id").distinct()

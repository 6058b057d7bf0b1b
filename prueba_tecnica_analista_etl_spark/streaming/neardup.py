"""Streaming near-duplicate gate — the banded-minhash twin of the
exact-id streaming dedup (T10): each micro-batch of incoming documents
is admitted only if it is NOT a near-duplicate (exact Jaccard >=
threshold over shingle hashes) of any ALREADY-ACCEPTED document, and
within a batch the greedy min-id survivor rule applies — so the
drained accepted set equals the batch greedy purge FIXPOINT
(``pipelines.corpus.near_dup_purge_stable``) over the full corpus,
provided arrival order is id order (range-partitioned replay). This
is the "dedupe the incoming crawl against the corpus" operator of a
training-data ingestion pipeline: the batch family
(q_minhash_dedup / q_corpus_curate) curates a CORPUS AT REST, this
gate curates a FEED.

The gate is UNCAPPED within a bucket by design: the at-rest tiers
sub-split oversized (band, key) buckets for bounded all-pairs output
(``capped_pair_array``), but a GATE that admitted a doc because its
accepted match sat in another skew chunk would be a quality bug — and
an incremental consumer could not reproduce chunk boundaries that
depend on the FINAL bucket membership anyway. Per-unit work is
bounded by the micro-batch (trigger sizing), and index buckets stay
naturally small: accepted docs are mutually NON-near-dup by
construction, so band collisions among them are the banding's
false-positive rate, not dup-family mass.

State design (the 100 TB shape):

* The accepted index is an append-only parquet directory with one
  subdirectory per committed micro-batch, published tmp-then-rename,
  so the batch id doubles as the idempotency ledger: a replayed batch
  finds its directory and is a no-op (the ``_etl_control`` discipline
  without a side table). Each batch dir holds TWO frames —
  ``keys/`` = (doc_id, band, key) and ``docs/`` = (doc_id, hs) — so
  the per-doc shingle-hash array is stored ONCE, not once per band,
  and the (band, key) probe shuffles only ids and band keys. At
  scale ``keys/`` would be bucketed by the band key so a probe reads
  only its buckets.
* Per-batch work: ONE banded-signature pass over the batch (the
  md5_60 minhash family — engine-neutral, identical to the batch
  tier; localCheckpoint'ed and reused by the probe, the intra-batch
  pair derivation, and the index append), one (band, key) index
  probe + hs join + exact-Jaccard filter, one intra-batch greedy
  purge over pairs derived FROM the checkpointed banded frame
  (``pairs_from_band_frame`` — no second shingle pass). Nothing
  scans the accepted corpus text — only its signature index.

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


def _committed(index_dir: str) -> list[str]:
    return sorted(
        os.path.join(index_dir, n)
        for n in os.listdir(index_dir)
        if n.startswith("batch-") and ".tmp-" not in n
    )


def sweep_orphan_tmps(index_dir: str) -> None:
    """Remove ``batch-*.tmp-*`` leftovers from a writer that crashed
    between the parquet write and the rename — they are never read
    (listings exclude them) but would otherwise accumulate dead data
    inside the long-lived per-corpus index. Call under the same lock
    that serializes drains (a live writer's tmp must not be swept)."""
    if not os.path.isdir(index_dir):
        return
    for n in os.listdir(index_dir):
        if n.startswith("batch-") and ".tmp-" in n:
            shutil.rmtree(os.path.join(index_dir, n), ignore_errors=True)


def foreach_batch_neardup_gate(
    index_dir: str,
    band_frame: Callable[[DataFrame], DataFrame],
    pairs_from_bands: Callable[[DataFrame, float], DataFrame],
    threshold: float = 0.5,
):
    """Build the foreachBatch function of the gate.

    ``band_frame`` maps a documents frame to its banded signature rows
    ``(doc_id, hs, band, key)``; ``pairs_from_bands(banded,
    threshold)`` maps a banded frame to its intra-frame near-dup pairs
    at the GIVEN threshold (both injected — typically
    ``plans.extensions_scale.minhash_band_frame`` and a
    ``pairs_from_band_frame(..., cap=None)`` wrapper — so this module
    never imports the plans layer, the gate stays generic over
    signature schemes, and ONE ``threshold`` governs both the
    cross-batch probe and the intra-batch purge)."""
    os.makedirs(index_dir, exist_ok=True)

    def apply(batch: DataFrame, batch_id: int) -> None:
        accept_dir = os.path.join(index_dir, f"batch-{batch_id:09d}")
        if os.path.isdir(accept_dir):
            return  # replayed batch: already committed — fixpoint
        s = batch.sparkSession
        # ONE signature pass per batch: the checkpointed banded frame
        # feeds the probe join, the intra-batch pair derivation, and
        # the index append (without truncation the Arrow/shingle
        # subtree would re-run per consumer).
        banded = band_frame(batch).localCheckpoint()
        doc_hs = banded.select("doc_id", "hs").dropDuplicates(["doc_id"])
        committed = _committed(index_dir)
        if committed:
            idx_keys = s.read.parquet(
                *[os.path.join(p, "keys") for p in committed]
            )
            idx_docs = s.read.parquet(
                *[os.path.join(p, "docs") for p in committed]
            )
            cand = (
                banded.alias("n")
                .join(
                    idx_keys.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.key") == F.col("o.key")),
                )
                .select(
                    F.col("n.doc_id").alias("new_id"),
                    F.col("o.doc_id").alias("old_id"),
                )
                .distinct()
            )
            matched = (
                cand.join(
                    doc_hs.select(
                        F.col("doc_id").alias("new_id"),
                        F.col("hs").alias("new_hs"),
                    ),
                    "new_id",
                )
                .join(
                    idx_docs.select(
                        F.col("doc_id").alias("old_id"),
                        F.col("hs").alias("old_hs"),
                    ),
                    "old_id",
                )
                .filter(
                    jaccard(F.col("new_hs"), F.col("old_hs"))
                    >= F.lit(threshold)
                )
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            rem_banded = banded.join(matched, "doc_id", "left_anti")
        else:
            rem_banded = banded
        # Intra-batch greedy min-id survivors over the remainder only:
        # pairs whose endpoint was index-dropped impose no constraint
        # (near_dup_purge's ghost-endpoint rule, applied by
        # construction since pairs derive FROM the remainder's banded
        # rows).
        from prueba_tecnica_analista_etl_spark.pipelines.corpus import (
            near_dup_purge_stable,
        )

        remainder = rem_banded.select("doc_id").distinct()
        survivors, _audit = near_dup_purge_stable(
            remainder, pairs_from_bands(rem_banded, threshold)
        )
        accepted = banded.join(
            survivors.select("doc_id"), "doc_id", "left_semi"
        )
        tmp = f"{accept_dir}.tmp-{uuid.uuid4().hex[:8]}"
        accepted.select("doc_id", "band", "key").write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "keys"))
        accepted.select("doc_id", "hs").dropDuplicates(
            ["doc_id"]
        ).write.mode("overwrite").parquet(os.path.join(tmp, "docs"))
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
    committed = _committed(index_dir)
    if not committed:
        raise FileNotFoundError(
            f"near-dup gate index has no committed batches: {index_dir}"
        )
    return (
        spark.read.parquet(*[os.path.join(p, "docs") for p in committed])
        .select("doc_id")
        .distinct()
    )

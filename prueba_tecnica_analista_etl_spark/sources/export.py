"""Training-shard export (the hand-off surface to a training job):
write a keyed DataFrame as N hash-sharded parquet files plus a
MANIFEST the ingesting side can validate — per-shard row counts,
optional token totals, and an order-insensitive content checksum.

Design for 100 TB:

* **Shard assignment is a pure hash of the key** (``pmod(xxhash64(key),
  n_shards)``) — map-only, deterministic across re-runs, repartitions
  and cluster sizes, so an incremental re-export reproduces byte-stable
  shard membership (the property that lets a training cluster cache
  shards by name). No global row_number, no single-partition window.
* **The checksum is an order-insensitive fold**: the SUM of each
  row's 64-bit content hash, accumulated in DECIMAL(38,0) and reduced
  mod the largest sub-2^63 prime. Partitioning, task scheduling and
  shuffle order cannot change it (wrapping addition is commutative),
  and — unlike the earlier ``bit_xor`` fold, which is blind to
  even-multiplicity changes (swap two copies of row A for two copies
  of row B and XOR cancels) — summation is multiplicity-sensitive, so
  row mutation, loss and duplication all move it. Collisions remain
  possible (any 63-bit digest admits them) but require adversarial
  construction, not a natural double-row slip. Validation re-derives
  it from the written files with one scan
  (:func:`verify_training_shards`).
* **One job writes everything**: ``partitionBy(shard_id)`` emits every
  shard in a single pass; the manifest is a second, O(shards)
  aggregate over the same frame. ``tmp-then-rename`` makes the export
  atomic-enough: a crashed export leaves a ``._tmp`` dir, never a
  half-valid manifest next to live data.
"""

from __future__ import annotations

import math
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest"
DATA = "data"
SHARD_COL = "shard_id"
# Checksum definition identifier, recorded in every manifest. Bump it
# whenever the fold changes (as bit_xor → this sum did) so a verifier
# rejects the mismatch BY NAME instead of reporting phantom tampering
# against manifests written under the old definition.
CHECKSUM_ALGO = "sum-xxhash64-mod-p63"


def _row_hash(cols: Sequence[str]):
    """64-bit per-row content hash over the named columns (stable
    across partitionings; xxhash64 seeds on column VALUES in order)."""
    return F.xxhash64(*[F.col(c) for c in cols])


def _shard_stats(
    frame: DataFrame, token_col: str | None
) -> dict[int, dict[str, int]]:
    """Per-shard {rows, tokens?, checksum} from any shard_id-carrying
    frame — the ONE definition of the manifest's content, used both to
    write it (over the freshly-written files) and to re-derive it at
    verification time, so the two can never drift apart."""
    content_cols = [c for c in frame.columns if c != SHARD_COL]
    # multiplicity-sensitive order-insensitive fold: sum of row hashes
    # in DECIMAL(38,0) (room for >10^19 rows before overflow, and no
    # ANSI-mode overflow throw a plain BIGINT sum would risk), reduced
    # mod the largest prime < 2^63 so the manifest column stays LONG.
    aggs = [
        F.count(F.lit(1)).cast("long").alias("rows"),
        F.pmod(
            F.sum(_row_hash(content_cols).cast("decimal(38,0)")),
            F.lit(9223372036854775783).cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("checksum"),
    ]
    if token_col is not None:
        aggs.insert(
            1, F.sum(F.col(token_col)).cast("long").alias("tokens")
        )
    return {
        int(r[SHARD_COL]): {
            k: int(v)
            for k, v in r.asDict().items()
            if k != SHARD_COL and v is not None
        }
        for r in frame.groupBy(SHARD_COL).agg(*aggs).collect()
    }


def export_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int | None = None,
    target_rows_per_shard: int | None = None,
    token_col: str | None = None,
    order_col: str | None = None,
) -> dict[int, dict[str, int]]:
    """Write ``df`` as hash-sharded parquet plus a manifest; returns
    the manifest as ``{shard_id: {rows, tokens?, checksum}}``.

    Exactly one of ``n_shards`` / ``target_rows_per_shard`` must be
    given (the latter costs one count to size the shard set). The
    manifest lives at ``{path}/_manifest`` (parquet) and every shard at
    ``{path}/data/shard_id={i}/``.

    ``order_col`` emits each shard's rows SORTED by that column —
    ``sortWithinPartitions``, a per-shard local sort with no extra
    shuffle or global ordering cost — so a training job that pairs it
    with a deterministic position (q_train_order's seeded global
    shuffle rank) reads every shard in reproducible curriculum order.
    The manifest checksum is order-insensitive, so ordered and
    unordered exports of the same rows verify identically.
    """
    if (n_shards is None) == (target_rows_per_shard is None):
        raise ValueError(
            "pass exactly one of n_shards / target_rows_per_shard"
        )
    if n_shards is None:
        assert target_rows_per_shard is not None
        total = df.count()
        n_shards = max(1, math.ceil(total / target_rows_per_shard))
        if total == 0:
            raise ValueError(
                "refusing to export an empty frame: zero-row input "
                "writes no part files and cannot produce a valid "
                "manifest (almost certainly an upstream bug)"
            )
    # (The n_shards path checks emptiness AFTER the write, at file
    # level — a pre-write limit(1).count() would execute the full
    # upstream lineage one extra time, the exact double-scan this
    # module's manifest design avoids.)

    sharded = df.withColumn(
        SHARD_COL,
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int"),
    )
    if order_col is not None:
        # One shuffle co-locates each shard in a single task, then a
        # LOCAL sort by (shard, order) makes every shard's file(s)
        # internally ordered — no global sort, no single reducer.
        sharded = sharded.repartition(
            n_shards, F.col(SHARD_COL)
        ).sortWithinPartitions(SHARD_COL, order_col)

    tmp = path + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    sharded.write.partitionBy(SHARD_COL).mode("overwrite").parquet(
        os.path.join(tmp, DATA)
    )
    # Empty-input guard (ADVICE r7): a zero-row frame writes no
    # shard_id=* dirs, and reading the empty data dir back fails
    # schema inference mid-export. Detect it from the WRITTEN FILES
    # (free — one listdir, no extra lineage run), clean up the tmp
    # dir, and fail with intent.
    if not any(
        e.startswith(f"{SHARD_COL}=")
        for e in os.listdir(os.path.join(tmp, DATA))
    ):
        shutil.rmtree(tmp, ignore_errors=True)
        raise ValueError(
            "refusing to export an empty frame: zero-row input "
            "writes no part files and cannot produce a valid "
            "manifest (almost certainly an upstream bug)"
        )
    # The manifest is derived from the WRITTEN FILES, never from the
    # input frame: re-evaluating `sharded` for the aggregate would (a)
    # run the full upstream lineage a second time — a double scan at
    # the 100 TB design point — and (b) diverge from the written rows
    # whenever any upstream column is nondeterministic (rand(),
    # current_timestamp, monotonically_increasing_id), making the
    # manifest certify rows that were never written. Reading back the
    # freshly-written compact parquet is one cheap scan and runs the
    # SAME _shard_stats verify_training_shards will later recompute.
    spark = df.sparkSession
    written = spark.read.parquet(os.path.join(tmp, DATA))
    stats = _shard_stats(written, token_col)
    cols = ["shard_id", "rows"] + (
        ["tokens"] if token_col is not None else []
    ) + ["checksum"]
    # m.get, not m[...]: _shard_stats drops NULL aggregates (an
    # all-NULL token column sums to NULL), and the manifest must
    # record that NULL rather than crash mid-export with the data
    # already written.
    spark.createDataFrame(
        [
            tuple([sid] + [m.get(c) for c in cols[1:]])
            for sid, m in sorted(stats.items())
        ],
        ", ".join(f"{c} long" for c in cols),
    ).withColumn(SHARD_COL, F.col(SHARD_COL).cast("int")).withColumn(
        # Version the checksum definition INTO the manifest: a
        # verifier re-deriving with a different fold would otherwise
        # report every shard as tampered (the bit_xor→sum migration
        # would have done exactly that to pre-migration manifests).
        # verify_training_shards refuses mismatched algos by name
        # instead of crying corruption.
        "checksum_algo",
        F.lit(CHECKSUM_ALGO),
    ).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, MANIFEST))

    # atomic-enough swap: the live dir appears only fully written
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    from prueba_tecnica_analista_etl_spark.artifacts import (
        invalidate_corpus,
    )

    invalidate_corpus(path)  # rewrite must not hide inside the TTL memo

    return stats


def _manifest_dict(
    spark: SparkSession, path: str
) -> tuple[dict[int, dict[str, int]], str | None]:
    """Per-shard numeric stats plus the recorded checksum algo
    (None for manifests predating the algo marker)."""
    rows = spark.read.parquet(os.path.join(path, MANIFEST)).collect()
    algo = rows[0]["checksum_algo"] if rows and "checksum_algo" in rows[0].asDict() else None
    return {
        int(r[SHARD_COL]): {
            k: int(v)
            for k, v in r.asDict().items()
            if k not in (SHARD_COL, "checksum_algo") and v is not None
        }
        for r in rows
    }, algo


def verify_training_shards(
    spark: SparkSession, path: str, token_col: str | None = None
) -> dict[int, str]:
    """Ingestion-side validation: re-derive every shard's row count,
    token total and checksum FROM THE WRITTEN FILES and compare to the
    manifest. Returns ``{}`` when everything matches, else
    ``{shard_id: reason}`` — a lost file, duplicated row, bit-flip or
    truncated write all surface as a named mismatch, before a training
    job consumes garbage."""
    manifest, algo = _manifest_dict(spark, path)
    if algo is not None and algo != CHECKSUM_ALGO:
        # A manifest written under a DIFFERENT NAMED checksum
        # definition CANNOT be content-verified by this code — surface
        # that as a single named problem (sentinel shard -1), not as
        # per-shard "corruption" that would be indistinguishable from
        # real tampering. algo=None is NOT a mismatch: manifests
        # written before the algo marker existed used the identical
        # sum-xxhash64-mod-p63 fold, so their checksums verify
        # bit-for-bit (ADVICE r8: refusing them would force a
        # re-export of every pre-marker shard set for no content
        # reason).
        return {
            -1: (
                f"manifest checksum algo {algo!r} is not the supported "
                f"{CHECKSUM_ALGO!r}; re-export with the current writer "
                "to make the shards verifiable"
            )
        }
    data = spark.read.parquet(os.path.join(path, DATA))
    derived = _shard_stats(data, token_col)

    problems: dict[int, str] = {}
    for sid in sorted(set(manifest) | set(derived)):
        m, d = manifest.get(sid), derived.get(sid)
        if m is None:
            problems[sid] = "shard on disk but missing from manifest"
        elif d is None:
            problems[sid] = "shard in manifest but missing on disk"
        elif m != d:
            diffs = [
                f"{k}: manifest={m.get(k)} derived={d.get(k)}"
                for k in sorted(set(m) | set(d))
                if m.get(k) != d.get(k)
            ]
            problems[sid] = "; ".join(diffs)
    return problems

"""On-disk IVF index (the similarity-search SCALE path made concrete).

``ann_ivf`` (plans/extensions_scale.py) proves the IVF *algebra* —
coarse quantizer, nprobe pruning, exact re-rank — but prunes with an
in-plan ``filter`` over an unpartitioned corpus, so every query still
LISTS every file. This module is the 100 TB layout its docstring
promises: the corpus is written ``partitionBy("cluster")`` so the
probe filter becomes a PARTITION filter — a query physically reads
``nprobe/k`` of the index, enforced by the scan (directory pruning),
not by a post-scan filter. The centroid model rides alongside as a
k×dim parquet sidecar (the MODEL — O(k·dim), scale-independent), so
search needs no refit and no access to the original embeddings table.

Layout::

    {path}/model/   one row per centroid: (cluster int, centroid
                    array<double>) — read to the driver at search time
    {path}/data/    cluster=<i>/part-*.parquet with (id, vector)

Write cost: one assignment pass (Arrow matmul) + one partitioned
write — the standard "build the index once, amortize over queries"
trade. Search cost: O(k·dim) driver work to pick probes + one scan of
the probed partitions into ``TakeOrderedAndProject`` (partial top-k
per partition, no global sort).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prueba_tecnica_analista_etl_spark.functions.vectors import (
    as_double,
    assign_clusters,
    cosine,
    ivf_fit,
)

MODEL = "model"
DATA = "data"
SCHEMA = "_schema.json"


def _write_schema(path: str, schema: T.StructType) -> None:
    with open(os.path.join(path, SCHEMA), "w") as fh:
        fh.write(schema.json())


def _read_data(spark: SparkSession, path: str) -> DataFrame:
    """Schema-explicit read of the index data: WITHOUT the sidecar
    schema, Spark's inference opens the footer of the lexicographically
    first leaf regardless of the probe set — which would defeat the
    whole read-only-the-probed-partitions property the moment that
    leaf is corrupt or on cold storage. The sidecar (written at index
    build) makes the scan plan without touching ANY data file."""
    with open(os.path.join(path, SCHEMA)) as fh:
        data_schema = T.StructType.fromJson(json.load(fh))
    return spark.read.schema(data_schema).parquet(
        os.path.join(path, DATA)
    )


def ivf_write_index(
    emb: DataFrame,
    path: str,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Fit (or accept) a coarse quantizer and write ``emb`` as an
    on-disk IVF index under ``path``. Returns the centroid model.

    Pass ``centroids`` to reuse an existing quantizer (e.g. when
    re-indexing a grown corpus under the same model so cluster ids
    stay comparable); otherwise ``ivf_fit`` trains deterministically.
    """
    spark = emb.sparkSession
    if centroids is None:
        centroids = ivf_fit(
            emb.select(id_col, as_double(F.col(vec_col)).alias("_v")),
            "_v",
            id_col,
            k=k,
            iters=iters,
        )
    C = np.asarray(centroids, dtype=np.float64)
    assigned = emb.select(
        id_col, as_double(F.col(vec_col)).alias("vector")
    ).withColumn("cluster", assign_clusters(F.col("vector"), C))
    # Compact at build time: without the repartition every input task
    # writes a sliver into every cluster dir (tasks x k tiny leaves —
    # a probed read then pays one task per sliver). One shuffle on the
    # partition key makes each cluster one coherent file set; at
    # larger scale the same call with a higher partition count keeps
    # leaves at target size — the standard write-side compaction the
    # parquet sinks (sources/files.py) apply.
    assigned.repartition("cluster").write.partitionBy("cluster").mode(
        "overwrite"
    ).parquet(os.path.join(path, DATA))
    _write_schema(path, assigned.schema)
    spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(C)],
        "cluster int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, MODEL)
    )
    return C


def ivf_read_model(spark: SparkSession, path: str) -> np.ndarray:
    """Load the centroid model (k×dim — driver-sized by design)."""
    rows = (
        spark.read.parquet(os.path.join(path, MODEL))
        .orderBy("cluster")
        .collect()
    )
    return np.asarray([r["centroid"] for r in rows], dtype=np.float64)


def ivf_probe_clusters(
    centroids: np.ndarray, query, nprobe: int
) -> list[int]:
    """The ``nprobe`` nearest centroid ids for ``query`` by cosine —
    O(k·dim) numpy on the driver, the only non-distributed step."""
    qv = np.asarray(query, dtype=np.float64)
    Cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    sims = Cn @ (qv / max(np.linalg.norm(qv), 1e-12))
    return [int(i) for i in np.argsort(-sims)[:nprobe]]


def ivf_search_index_batch(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, list[float]]],
    nprobe: int = 4,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``topk`` per query for a BATCH of ``(q_id, vector)`` probes
    in ONE scan of the probed partitions — the on-disk twin of
    ``operators.similarity.cosine_topk_batch``.

    The scan's partition filter is the UNION of every query's probe
    set (still a directory-level prune: a 100-query batch over a
    k=1024 index typically touches a small fraction of leaves); each
    query then re-ranks only rows whose cluster is in ITS OWN probe
    list (an ``array_contains`` predicate on the broadcast query
    frame), so per-query work matches the single-probe form exactly —
    one corpus pass regardless of query count, per-query ranking via
    ``row_number() <= k`` (WindowGroupLimit pruning).
    """
    centroids = ivf_read_model(spark, path)
    rows = [
        (
            int(q_id),
            [float(x) for x in vec],
            ivf_probe_clusters(centroids, vec, nprobe),
        )
        for q_id, vec in queries
    ]
    all_probes = sorted({c for _, _, probes in rows for c in probes})
    qdf = spark.createDataFrame(
        rows, "q_id long, qv array<double>, probes array<int>"
    )
    idx = _read_data(spark, path).filter(
        F.col("cluster").isin(all_probes)
    )
    from pyspark.sql import Window

    scored = (
        idx.join(
            F.broadcast(qdf),
            F.array_contains(F.col("probes"), F.col("cluster")),
        )
        .select(
            "q_id",
            id_col,
            "cluster",
            F.round(cosine(F.col("vector"), F.col("qv")), 4).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .drop("rn")
    )


def ivf_search_index(
    spark: SparkSession,
    path: str,
    query,
    nprobe: int = 4,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-cosine top-``topk`` over the ``nprobe`` probed partitions
    of the on-disk index. The ``cluster`` predicate is a PARTITION
    filter (cluster is a directory key): pruning happens at file
    listing, so the scan reads nprobe/k of the index's bytes — the
    property the tests pin via ``PartitionFilters`` + ``inputFiles``.
    """
    centroids = ivf_read_model(spark, path)
    probes = ivf_probe_clusters(centroids, query, nprobe)
    qv = F.array(*[F.lit(float(x)) for x in np.asarray(query)])
    idx = _read_data(spark, path).filter(
        F.col("cluster").isin(probes)
    )
    return (
        idx.select(
            id_col,
            "cluster",
            F.round(cosine(F.col("vector"), qv), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(topk)
    )

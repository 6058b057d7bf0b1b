"""Scale-path extension queries (rows-only checks — their operators are
engine-specific hashing / ML / streaming, not ANSI-SQL-expressible; the
driver records the weaker rows check and tests assert semantics).

These are the 100 TB designs: every one replaces an O(n²) all-pairs
comparison with a bucketing scheme (LSH band join, shared-minhash,
sign-bit hamming) whose cost is one shuffle on the bucket key plus
per-bucket work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.functions.text import (
    jaccard,
    shingles,
    tokens,
)
from prueba_tecnica_analista_etl_spark.functions.vectors import (
    as_double,
    cosine,
    random_hyperplanes,
    sign_bits,
)
from prueba_tecnica_analista_etl_spark.plans.queries import _t, query
from prueba_tecnica_analista_etl_spark.streaming.replay import (
    replay_as_stream,
    write_replay_files,
)
from prueba_tecnica_analista_etl_spark.streaming.windows import (
    run_available_now,
    sessionize,
)


@query(
    "q_minhash_dedup",
    None,
    doc="D6 (near-dup, MinHash+LSH): ml.feature.MinHashLSH over hashed "
    "token sets; approxSimilarityJoin = band-bucket join, only "
    "colliding pairs compared — O(n·bands) not O(n²). Seeded → "
    "deterministic. Output: candidate pairs with Jaccard distance.",
)
def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(d)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=5, seed=42
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, threshold=0.95, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .orderBy("jaccard_dist", "doc_a", "doc_b")
        .limit(100)
    )


@query(
    "q_ngram_jaccard",
    None,
    doc="n-gram Jaccard near-dup: bigram-shingle sets, candidates = "
    "docs sharing the global min xxhash shingle (1-band minhash LSH), "
    "exact Jaccard on candidates only. One groupBy(minhash) shuffle "
    "replaces the n² comparison.",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(shingles(tokens(F.col("text")), 2)).alias("sh"),
    )
    d = d.withColumn(
        "minhash",
        F.array_min(F.transform("sh", lambda s: F.xxhash64(s))),
    )
    a = d.alias("a")
    b = d.alias("b")
    cand = a.join(b, on="minhash").filter(
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    return (
        cand.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 4).alias(
                "jaccard_sim"
            ),
        )
        .orderBy(F.desc("jaccard_sim"), "doc_a", "doc_b")
        .limit(100)
    )


N_SIMHASH_BITS = 64
N_BANDS = 4
BAND_BITS = N_SIMHASH_BITS // N_BANDS


@query(
    "q_simhash_dedup",
    None,
    doc="SimHash near-dup: 64-bit per-token-hash majority signature, "
    "banded 4×16 bits; pairs sharing any band are candidates, kept if "
    "hamming(sig) <= 8. Signature build = one explode + one groupBy; "
    "candidate join = 4 band-key shuffles (each tiny).",
)
def q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    h = d.withColumn("th", F.xxhash64("tok"))
    # per-bit majority vote: sum(+1/-1) per bit position, sign → bit
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("th", i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(N_SIMHASH_BITS)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(N_SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    sigs = bit_sums.select("doc_id", sig.alias("sig"))
    bands = sigs.select(
        "doc_id",
        "sig",
        *[
            F.shiftrightunsigned("sig", b * BAND_BITS)
            .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
            .alias(f"band{b}")
            for b in range(N_BANDS)
        ],
    )
    cand = None
    for b in range(N_BANDS):
        a = bands.alias("a")
        c = bands.alias("c")
        pairs = (
            a.join(
                c,
                F.col(f"a.band{b}") == F.col(f"c.band{b}"),
            )
            .filter(F.col("a.doc_id") < F.col("c.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("c.doc_id").alias("doc_b"),
                F.col("a.sig").alias("sig_a"),
                F.col("c.sig").alias("sig_b"),
            )
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    hamming = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    ).alias("hamming")
    return (
        cand.dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", hamming)
        .filter(F.col("hamming") <= 8)
        .orderBy("hamming", "doc_a", "doc_b")
        .limit(100)
    )


@query(
    "q_ann_lsh",
    None,
    doc="ANN via sign-LSH: 16 random-hyperplane sign bits per vector "
    "(deterministic seeded planes); candidates = hamming(sig, query "
    "sig) <= 4, exact cosine re-rank of candidates only. Scales as "
    "one broadcast + one filter instead of full brute force per query.",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    planes = random_hyperplanes(16, 64, seed=42)
    sigs = e.withColumn("sig", sign_bits(F.col("v"), planes))
    q = sigs.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("sig").alias("qsig")
    )
    cand = (
        sigs.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "hamming", F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig")))
        )
        .filter(F.col("hamming") <= 4)
    )
    return (
        cand.select(
            "vec_id",
            "hamming",
            F.round(cosine(F.col("v"), F.col("qv")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "q_multimodal_meta",
    None,
    doc="multimodal plumbing: binary asset column + Arrow-batched "
    "mapInPandas metadata extraction (codec decode stubbed "
    "deterministically — container has no media libs), censused by "
    "media_type.",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prueba_tecnica_analista_etl_spark.multimodal import (
        extract_metadata,
        fake_assets,
    )

    assets = fake_assets(_t(spark, sf_dir, "documents"))
    meta = extract_metadata(assets)
    return (
        meta.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
        )
        .orderBy("media_type")
    )


@query(
    "q_stream_sessionize",
    None,
    doc="T4,T5,T7: events replayed as a file stream (availableNow, "
    "4 micro-batches), session_window(30 min) per user with watermark, "
    "append-mode memory sink; returns finalized sessions. Streaming "
    "state is bounded by active keys (watermark eviction).",
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    data_dir, schema = write_replay_files(
        spark, sf_dir, "events", n_files=8
    )
    stream = replay_as_stream(spark, data_dir, schema, max_files_per_trigger=2)
    return run_available_now(sessionize(stream), spark)

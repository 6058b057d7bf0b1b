"""Distributed-algebra extension queries (round 8).

Each query here demonstrates a SCALE PATTERN that naive SQL gets wrong
at 100 TB, expressed so the result is still exactly ANSI-SQL-checkable
against the DuckDB oracle:

* ``q_global_rank``      — global RANK() without a SinglePartition
                           window: bucket histogram + offset broadcast
                           (operators/rank.py).
* ``q_train_order``      — reproducible seeded global shuffle order
                           for training emission (same rank pattern,
                           md5-prefix buckets).
* ``q_incremental_agg_merge`` — materialized-aggregate delta refresh:
                           merge(partial states) == full re-aggregation.
* ``q_bloom_semi_join``  — semi-join reduction: a broadcast bitset
                           prefilter drops non-matching fact rows
                           BEFORE the join shuffle (operators/bloom.py).
* ``q_inverted_index``   — term → (df, posting list) with the posting
                           cap applied DURING the sort (WindowGroupLimit).
* ``q_winsorize``        — per-group percentile clamp with explicit
                           integer rank arithmetic (cross-engine exact).
* ``q_filter_funnel``    — multi-stage quality-gate survival census in
                           one pass (conditional aggregation).
* ``q_unpivot_long``     — wide→long reshape (the q_pivot_wide
                           inverse): map-only column explosion, no
                           shuffle beyond the source aggregate.
* ``q_rolling_distinct`` — trailing 7-day DISTINCT-user census (the
                           rolling-MAU shape): dedup + bounded range
                           expansion instead of a per-row DISTINCT
                           window frame no engine can shard.
* ``q_eval_auc``         — tie-adjusted Mann-Whitney AUC of a score
                           column vs a binary label in exact integer
                           rank-sum arithmetic; the global cumulative
                           count uses the histogram scheme generalized
                           to prefix SUMS (bucketed_prefix_sums).
* ``q_ks_distance``      — two-sample Kolmogorov-Smirnov distance
                           between two sources' score distributions:
                           max |F1-F2| cross-multiplied into integers
                           (|cum_a*n_b - cum_b*n_a|), same distributed
                           prefix-sum frame.
* ``q_calibration_bins`` — reliability-diagram decile census: map-only
                           equal-width binning (bounds broadcast from a
                           one-row aggregate), per-bin count/positives/
                           rate; mean score deliberately omitted (a
                           reassociating double SUM is not
                           cross-engine stable).
* ``q_eval_auc_daily``   — per-day AUC drift census: the rank-sum
                           identity per calendar day; the cumulative
                           partitions BY DAY, so it is natively
                           shardable — the deliberate contrast with
                           the global form's bucketed scheme.

Reference parity: these generalize the reference's §3 aggregate /
quality-audit designs (seccion3_sql.sql:85-210 staging audits,
nb:287-340 statistical profile) to cluster-scale idioms; none change
WHAT is computed — the oracle for every query is plain SQL.

Hash-stability follows plans/queries.py's conventions: pass-through
doubles never rounded, computed money sums via DECIMAL(18,2), rank /
count outputs are integers, percentile ranks in pure integer
arithmetic (``(n+19) div 20``), never ``ceil(0.05*n)`` whose binary
0.05 could straddle an integer boundary differently per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.artifacts import census_artifact
from prueba_tecnica_analista_etl_spark.operators.bloom import (
    bitset_semi_join,
    bitset_words,
)
from prueba_tecnica_analista_etl_spark.operators.rank import (
    bucket_histogram,
    bucket_totals,
    bucketed_prefix_sums,
    bucketed_rank,
    md5_prefix_bucket,
    numeric_bucket,
)
from prueba_tecnica_analista_etl_spark.plans.queries import (
    _t,
    dec2,
    money_sum,
    query,
)
from prueba_tecnica_analista_etl_spark.sources.tables import spread

# ---------------------------------------------------------------------------
# Global rank without a single-partition window
# ---------------------------------------------------------------------------

_RANK_BUCKETS = 1024


@query(
    "q_global_rank",
    """
    SELECT event_id, value,
           RANK() OVER (ORDER BY value) AS global_rank
    FROM events
    WHERE value IS NOT NULL
    """,
    doc="Distributed global RANK(): per-bucket rank + broadcast offsets; "
    "no Exchange SinglePartition over fact rows (plan-asserted).",
)
def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank over ``events.value`` as a two-pass distributed plan.

    ``RANK() OVER (ORDER BY value)`` in one window forces every row
    through a single reducer — the canonical 100 TB scale-killer. The
    distributed form:

    1. bucket each row by a fixed value-range grid (map-only);
    2. collect the per-bucket histogram — bounded at ``_RANK_BUCKETS``
       rows regardless of data size (a census-sized collect, same class
       as the IVF model in functions/vectors.py);
    3. broadcast-join each bucket's cumulative offset back and rank
       WITHIN buckets (``Window.partitionBy(bucket)`` — sharded, not
       SinglePartition).

    Ties are safe across the seam: equal values land in the same
    bucket, so ``offset + rank_within_bucket`` equals the global RANK
    exactly (operators/rank.py proves the seam invariants). Bucket
    boundaries are engine-internal (the oracle never sees them), so
    double arithmetic in the bucketing is harmless.
    """
    # NULL measurements are excluded EXPLICITLY in both engines: their
    # rank placement is an engine default (Spark NULLS FIRST, DuckDB
    # NULLS LAST), exactly the ambiguity a declared query must not
    # leave to chance; bucketed_rank refuses NULL keys for the same
    # reason.
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_id", "value")
        .filter(F.col("value").isNotNull())
    )

    # The (bounds, histogram) pair is a CENSUS ARTIFACT of the corpus
    # — computed once per (session, sf_dir) and reused by every
    # invocation, exactly like the unigram score frame / IVF model.
    def build():
        lo, hi = ev.agg(F.min("value"), F.max("value")).first()
        if lo is None:  # zero surviving rows
            return None
        b = numeric_bucket(F.col("value"), lo, hi, _RANK_BUCKETS)
        return lo, hi, bucket_histogram(ev, b)

    census = census_artifact(spark, sf_dir, "global_rank_census", build)
    if census is None:  # rank of nothing is nothing
        return ev.select(
            "event_id", "value", F.lit(None).cast("long").alias("global_rank")
        )
    lo, hi, hist = census
    return bucketed_rank(
        ev,
        numeric_bucket(F.col("value"), lo, hi, _RANK_BUCKETS),
        ["value"],
        method="rank",
        hist=hist,
    ).select("event_id", "value", "global_rank")


_SHUFFLE_SEED = "shuffle-seed-42:"


@query(
    "q_train_order",
    f"""
    SELECT doc_id,
           ROW_NUMBER() OVER (
               ORDER BY md5('{_SHUFFLE_SEED}' || doc_id), doc_id
           ) AS position
    FROM documents
    """,
    doc="Reproducible global training order: seeded md5 shuffle key, "
    "global position via the bucket-histogram rank pattern — no "
    "SinglePartition window over the corpus.",
)
def q_train_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle order for training-data emission.

    Training runs need a REPRODUCIBLE corpus-wide shuffle: the same
    seed must yield the same document order on any cluster size, and
    assigning the order must not serialize the corpus through one
    reducer. The shuffle key is ``md5(seed || doc_id)`` (cross-engine
    identical hex, same trick as the sampling operators); the global
    position reuses q_global_rank's histogram pattern with the
    md5-hex PREFIX as the bucket — 256 buckets whose histogram is a
    census-sized collect, uniform by construction (md5 prefixes are
    uniform), so no skew guard is needed. ROW_NUMBER (not RANK)
    semantics hold because the tiebreak (key, doc_id) is a total
    order: ranks within a bucket never collide, and buckets
    partition the keyspace by prefix so offsets compose exactly
    (operators/rank.py).
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    bucket, key = md5_prefix_bucket(F.col("doc_id"), salt=_SHUFFLE_SEED)
    hist = census_artifact(
        spark,
        sf_dir,
        "train_order_hist",
        lambda: bucket_histogram(docs, bucket),
    )
    return bucketed_rank(
        docs.withColumn("skey", key),
        bucket,
        ["skey", "doc_id"],
        method="row_number",
        out_col="position",
        hist=hist,
    ).select("doc_id", "position")


# ---------------------------------------------------------------------------
# Materialized-aggregate delta refresh
# ---------------------------------------------------------------------------

_SPLIT_TS = "2024-01-21 00:00:00"


@query(
    "q_incremental_agg_merge",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    doc="Materialized-view delta refresh: merge(base state, delta state) "
    "== full re-aggregation; the oracle is the full recompute.",
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic merge of partial aggregate states.

    The 100 TB pattern: a per-user aggregate table is maintained
    incrementally — each new batch is aggregated ALONE (touching only
    batch-sized data) and merged into the stored state with the
    aggregate's combine function, instead of re-scanning the full
    history. Here the 'stored state' is events before ``_SPLIT_TS`` and
    the 'delta' is everything after; the oracle recomputes from scratch,
    proving merge == recompute.

    count merges by sum, sum by sum (exact DECIMAL so the merged total
    is bit-identical to the one-pass total regardless of grouping),
    min/max by min/max. Each leg partial-aggregates map-side; the merge
    itself shuffles only user-cardinality state rows.
    """
    ev = _t(spark, sf_dir, "events")
    split = F.lit(_SPLIT_TS).cast("timestamp")
    # NULL-ts rows ride the BASE leg explicitly: both range predicates
    # evaluate NULL for them (three-valued logic), so without the
    # isNull() arm they would fall out of BOTH legs and merge !=
    # recompute — the oracle aggregates every row unconditionally.
    in_base = (F.col("ts") < split) | F.col("ts").isNull()

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(dec2(F.col("value"))).alias("total_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    base = state(ev.filter(in_base))
    delta = state(ev.filter(~in_base))
    return (
        base.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_dec").cast("double").alias("total_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-style semi-join reduction
# ---------------------------------------------------------------------------

_BLOOM_BITS = 8192  # 128 longs — broadcast as one array literal


@query(
    "q_bloom_semi_join",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderpriority
    """,
    doc="Semi-join reduction: broadcast bitset prefilter on "
    "xxhash64(custkey) drops non-matching fact rows before the join "
    "shuffle; exact semi-join clears false positives.",
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of BUILDING-segment customers via a bitset runtime filter.

    At 100 TB the semi-join's shuffle of the FACT side dominates; the
    fix is a runtime filter: hash the dim keys into a fixed bitset,
    broadcast it (here: an array-of-longs literal, ``_BLOOM_BITS`` bits
    total — size independent of dim cardinality), and test each fact
    row map-side so only probable matches reach the join. False
    positives are removed by the exact (broadcast) semi-join that
    follows; false negatives are impossible (same hash both sides), so
    the result is exactly the plain semi-join the oracle runs.

    The driver-side ``collect`` gathers DISTINCT BUCKET IDS — bounded
    at ``_BLOOM_BITS`` ints no matter how large the dim is
    (operators/bloom.py).
    """
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders")
    words = census_artifact(
        spark,
        sf_dir,
        "bloom_building_custkeys",
        lambda: bitset_words(cust, "c_custkey", _BLOOM_BITS),
    )
    return (
        bitset_semi_join(
            orders, cust, "o_custkey", "c_custkey", bits=_BLOOM_BITS,
            words=words,
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Per-group winsorization with explicit integer rank arithmetic
# ---------------------------------------------------------------------------


@query(
    "q_winsorize",
    """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
        WHERE value IS NOT NULL
    ), cuts AS (
        SELECT event_type,
               MAX(n) AS n,
               MAX(CASE WHEN rn = (n + 19) // 20 THEN value END) AS lo_cut,
               MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END)
                 AS hi_cut
        FROM ranked GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(MAX(c.n) AS BIGINT) AS n_events,
           MAX(c.lo_cut) AS lo_cut,
           MAX(c.hi_cut) AS hi_cut,
           CAST(SUM(CAST(LEAST(GREATEST(r.value, c.lo_cut), c.hi_cut)
                         AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_sum
    FROM ranked r JOIN cuts c USING (event_type)
    GROUP BY r.event_type
    """,
    doc="Per-group winsorization: clamp values to the explicit-rank "
    "p05/p95 cut values; rank positions in pure integer arithmetic "
    "so both engines pick identical cut rows.",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamp ``events.value`` per event_type at explicit p05/p95 ranks.

    Percentile CUT SELECTION is where engines diverge: interpolated
    ``percentile()`` does float arithmetic, and ``ceil(0.05*n)`` can
    straddle an integer boundary differently per libm. Here the cut row
    is picked by pure integer arithmetic — ``(n+19) div 20`` and
    ``(19n+19) div 20`` are ceil(n/20) and ceil(19n/20) exactly — and
    the cut VALUES are pass-through doubles (never computed), so the
    clamp is cross-engine bit-exact. The windows partition by
    event_type (sharded); the cuts frame is group-cardinality and
    broadcast back. NULL measurements are excluded EXPLICITLY in both
    engines (their rank placement is an engine default — Spark NULLS
    FIRST vs DuckDB NULLS LAST — which would shift every rn by one
    and move the cut rows).
    """
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .filter(F.col("value").isNotNull())
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    grp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(grp).alias("n"),
    )
    # The cut VALUES are third/fourth whole-partition windows over the
    # SAME hash(event_type) partitioning (r14 optimization): Catalyst
    # stacks all four window specs behind ONE exchange, and the final
    # groupBy(event_type) reuses that partitioning too — so the whole
    # query is one scan + one exchange, vs the former two scans + a
    # cuts groupBy + broadcast join-back (plan: 2 Exchange + 2 Scan ->
    # 1 Exchange + 1 Scan; same clamp arithmetic, identical output).
    with_cuts = ranked.select(
        "event_type",
        "value",
        "n",
        F.max(
            F.when(F.col("rn") == F.expr("(n + 19) div 20"), F.col("value"))
        )
        .over(grp)
        .alias("lo_cut"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(19 * n + 19) div 20"), F.col("value")
            )
        )
        .over(grp)
        .alias("hi_cut"),
    )
    clamped = F.least(
        F.greatest(F.col("value"), F.col("lo_cut")), F.col("hi_cut")
    )
    return with_cuts.groupBy("event_type").agg(
        F.max(F.col("n")).alias("n_events"),
        F.max("lo_cut").alias("lo_cut"),
        F.max("hi_cut").alias("hi_cut"),
        F.sum(dec2(clamped)).cast("double").alias("winsorized_sum"),
    )


_POSTINGS_CAP = 8


@query(
    "q_inverted_index",
    f"""
    WITH pairs AS (
        SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ) WHERE term <> ''
    )
    SELECT term,
           COUNT(*) AS df,
           array_to_string(
             list_slice(list(doc_id ORDER BY doc_id), 1, {_POSTINGS_CAP}),
             ',') AS postings
    FROM pairs
    GROUP BY term
    ORDER BY df DESC, term
    LIMIT 20
    """,
    doc="Retrieval-index build: per-term document frequency + ordered "
    "posting list capped at a fixed length (skew-safe); top-20 terms "
    "by df with total-order tiebreak. Postings serialize to a "
    "canonical comma-joined string: the driver value-hash has proven "
    "scalar dtypes only, and cross-engine array stringification is "
    "exactly the hash-stability class the window lint exists to keep "
    "out (test_recorded_window_emits_only_driver_proven_dtypes).",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the documents table: term → (df, postings).

    The retrieval-side artifact the BM25/TF-IDF queries score against.
    Plan shape for 100 TB: explode → ONE (term, doc_id) dedup shuffle,
    then df and postings both aggregate on the SAME term key. The
    posting list is capped BEFORE aggregation by a rank filter
    (``row_number() <= cap`` — Catalyst rewrites it to
    WindowGroupLimit, which keeps only the top-cap rows per term
    DURING the sort), so a stopword's aggregation buffer holds at most
    ``_POSTINGS_CAP`` entries; ``collect_list`` over the full posting
    set would be the unbounded-row skew case the LSH family also
    guards against. Top-20 via TakeOrderedAndProject; (df DESC, term)
    is a total order because term is unique per row.
    """
    from prueba_tecnica_analista_etl_spark.plans.extensions_text import (
        doc_term_tf_frame,
    )

    # the artifact's rows ARE the distinct (doc_id, term) pairs (one
    # row per doc-term, tf >= 1), mirroring the oracle's DISTINCT
    pairs = doc_term_tf_frame(spark, sf_dir).select("doc_id", "term")
    df_counts = pairs.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    postings = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _POSTINGS_CAP)
        .groupBy("term")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("doc_id")).cast(
                    "array<string>"
                ),
                ",",
            ).alias("postings")
        )
    )
    return (
        df_counts.join(postings, "term")
        .orderBy(F.desc("df"), "term")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Quality-gate survival funnel
# ---------------------------------------------------------------------------


@query(
    "q_filter_funnel",
    """
    SELECT * FROM (
        SELECT 0 AS stage, 'all' AS gate, COUNT(*) AS survivors
        FROM documents
        UNION ALL
        SELECT 1, 'lang_known', COUNT(*) FROM documents
        WHERE lang IS NOT NULL AND lang <> ''
        UNION ALL
        SELECT 2, 'length_ok', COUNT(*) FROM documents
        WHERE lang IS NOT NULL AND lang <> ''
          AND n_chars BETWEEN 80 AND 6000
        UNION ALL
        SELECT 3, 'has_terminal_punct', COUNT(*) FROM documents
        WHERE lang IS NOT NULL AND lang <> ''
          AND n_chars BETWEEN 80 AND 6000
          AND (text LIKE '%.' OR text LIKE '%!' OR text LIKE '%?')
    )
    ORDER BY stage
    """,
    doc="Corpus-curation observability: cumulative quality-gate "
    "survival census in ONE scan (conditional aggregation), not one "
    "scan per gate.",
)
def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival counts through cumulative quality gates over documents.

    The naive form scans the corpus once PER GATE (the oracle's UNION
    ALL does exactly that — fine for DuckDB at sf0.01, catastrophic at
    100 TB). The engine form computes every cumulative gate as a
    conditional aggregate in ONE pass, then explodes the four counters
    into rows — a single scan and a census-sized result regardless of
    gate count. Mirrors the RefinedWeb/Gopher-style pipeline-stage
    reporting a training-data curation run needs.
    """
    docs = _t(spark, sf_dir, "documents")
    g1 = F.col("lang").isNotNull() & (F.col("lang") != "")
    g2 = g1 & F.col("n_chars").between(80, 6000)
    g3 = g2 & (
        F.col("text").endswith(".")
        | F.col("text").endswith("!")
        | F.col("text").endswith("?")
    )
    counts = docs.agg(
        F.count("*").alias("c0"),
        F.count_if(g1).alias("c1"),
        F.count_if(g2).alias("c2"),
        F.count_if(g3).alias("c3"),
    )
    stages = F.array(
        F.struct(F.lit(0).alias("stage"), F.lit("all").alias("gate"),
                 F.col("c0").alias("survivors")),
        F.struct(F.lit(1).alias("stage"), F.lit("lang_known").alias("gate"),
                 F.col("c1").alias("survivors")),
        F.struct(F.lit(2).alias("stage"), F.lit("length_ok").alias("gate"),
                 F.col("c2").alias("survivors")),
        F.struct(F.lit(3).alias("stage"),
                 F.lit("has_terminal_punct").alias("gate"),
                 F.col("c3").alias("survivors")),
    )
    return (
        counts.select(F.explode(stages).alias("s"))
        .select("s.stage", "s.gate", "s.survivors")
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Wide -> long reshape (the pivot inverse)
# ---------------------------------------------------------------------------


@query(
    "q_unpivot_long",
    """
    SELECT o_orderpriority, status, cnt FROM (
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS F,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS O,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                    AS BIGINT) AS P
        FROM orders GROUP BY o_orderpriority
    ) UNPIVOT (cnt FOR status IN (F, O, P))
    """,
    doc="A4 inverse (wide -> long reshape): DataFrame.unpivot over the "
    "pivot result — the Power-Query 'unpivot columns' step the "
    "reference's workbook world implies but never scripts; map-only "
    "column explosion, no shuffle beyond the source aggregate.",
)
def q_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshape: unpivot the q_pivot_wide matrix back to
    (priority, status, cnt) rows.

    Completes the reshape algebra: pivot (long -> wide,
    operators/pivot.py) now has its inverse in the declared set, and
    ``unpivot(pivot(x))`` round-trips exactly because the pivot's
    explicit value list + zero-fill makes the matrix dense (the test
    suite pins the round-trip; reference parity: the workbook's
    cross-tab views, FIXTURES.md pivot family, xlsx §1).

    Scale shape: unpivot is an Expand node — a MAP-ONLY per-row
    column explosion (k output rows per input row, no shuffle, no
    UDF). The only shuffle in this plan belongs to the upstream
    aggregate. DuckDB's UNPIVOT default drops NULL cells; Spark's
    keeps them — irrelevant here by construction (zero-fill above),
    but a declared-semantics trap worth this comment for the next
    wide->long query.
    """
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in ("F", "O", "P")
            ],
        )
    )
    return wide.unpivot(
        ["o_orderpriority"], ["F", "O", "P"], "status", "cnt"
    )


# ---------------------------------------------------------------------------
# Trailing-window distinct census (rolling MAU/WAU)
# ---------------------------------------------------------------------------


@query(
    "q_rolling_distinct",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events WHERE user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS users_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
    doc="W3/A2 composite: trailing 7-day DISTINCT-user census per day "
    "(rolling WAU) — dedup to (day,user), map-only sequence-explode "
    "to the x7 anchor days, broadcast equi-join to the day grid, "
    "count_distinct per anchor day; the shape COUNT(DISTINCT) OVER a "
    "RANGE frame cannot take (neither engine supports DISTINCT in "
    "window frames).",
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users seen in the trailing 7 days, per day (rolling WAU).

    The dashboard shape behind every DAU/WAU/MAU panel. No engine
    allows ``COUNT(DISTINCT) OVER (RANGE ...)`` — and even if one did,
    a per-row distinct frame re-counts each window from scratch. The
    distributed form:

    1. dedup events to (day, user_id) — ONE hash shuffle, and the
       frame that every later step touches is O(users x active-days),
       not O(events);
    2. explode each (day, user) row into the 7 anchor days it
       contributes to (``sequence(day, day+6)`` — a MAP-ONLY fixed x7
       fan-out), then broadcast-HASH-join the anchor against the
       census-sized day grid to keep only anchors that exist in the
       data. The naive form is a range join — which Spark can only
       execute as a BroadcastNestedLoopJoin evaluating the BETWEEN
       predicate against every grid row per fact row, O(|ud| x |days|)
       comparisons; the explode form is O(|ud| x 7) rows into an
       equi-join, unchanged as history grows from a month to years;
    3. count_distinct per anchor day — second hash shuffle, keyed on
       day, skew-bounded because no day holds more than |users| rows.

    At 100 TB the exact form's cost center is step 2's x7 row
    expansion over the dedup'd frame; when even that is too much, the
    mergeable-sketch twin (approx_count_distinct per day + HLL union
    across the trailing window — operators/dedupe.py:167's sketch
    family) answers the same dashboard within rsd. This is the exact
    oracle-checkable form; NULL users are excluded explicitly in both
    engines (three-valued BETWEEN would drop them asymmetrically
    otherwise).

    Reference parity: generalizes the daily-volume audit
    (seccion3_sql.sql:85-210 staging audits; q_volume_by_day) from
    per-day counts to overlapping-window distincts.
    """
    # The deduplicated (day, user) activity frame is the shared
    # feature every rolling-distinct window reads — staged once per
    # corpus (r15, the doc_term_tf discipline): O(users × active
    # days) rows, strictly smaller than events. The per-call work
    # (×7 anchor explode, day-grid join, per-anchor distinct count)
    # stays live.
    from prueba_tecnica_analista_etl_spark.artifacts import (
        corpus_artifact,
    )

    def _build_ud() -> DataFrame:
        return (
            _t(spark, sf_dir, "events")
            .filter(F.col("user_id").isNotNull())
            .select(F.to_date("ts").alias("day"), "user_id")
            .distinct()
        )

    ud = corpus_artifact(spark, sf_dir, "user_day_activity", _build_ud)
    days = ud.select("day").distinct().withColumnRenamed("day", "anchor")
    expanded = ud.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("anchor"),
        "user_id",
    )
    return (
        expanded.join(F.broadcast(days), "anchor")
        .groupBy("anchor")
        .agg(F.count_distinct("user_id").alias("users_7d"))
        .select(F.col("anchor").alias("day"), "users_7d")
    )


# ---------------------------------------------------------------------------
# Evaluation metrics over the distributed prefix-sum frame
# ---------------------------------------------------------------------------


def _value_bucket_census(spark, sf_dir, name, g, sum_cols):
    """(lo, hi, per-bucket totals) census for a per-distinct-`value`
    frame ``g`` — the bucketed_prefix_sums inputs, staged once per
    corpus like q_global_rank's histogram. None when ``g`` is empty."""

    def build():
        lo, hi = g.agg(F.min("value"), F.max("value")).first()
        if lo is None:
            return None
        b = numeric_bucket(F.col("value"), lo, hi, _RANK_BUCKETS)
        return lo, hi, bucket_totals(g, b, sum_cols)

    return census_artifact(spark, sf_dir, name, build)


def _eval_day_value_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, value, cnt, pos, clk) over non-NULL-score events — the
    eval-census family's shared scored frame, staged ONCE per corpus
    (r15, the doc_term_tf discipline): day = ts::date (NULL kept for
    NULL ts, so the global censuses lose no rows), cnt/pos/clk the
    row/purchase/click counts at that (day, value). Every eval query
    previously re-scanned events and re-derived its own projection
    per invocation; they all fold from this collapsed frame instead
    — strictly smaller than events and 5 narrow columns wide, the
    §8 'decide with small rows' proxy. Exact-integer contents, so
    every fold re-aggregates bit-identically."""
    from prueba_tecnica_analista_etl_spark.artifacts import (
        corpus_artifact,
    )

    def build() -> DataFrame:
        ev = _t(spark, sf_dir, "events").filter(
            F.col("value").isNotNull()
        )
        return ev.groupBy(
            F.col("ts").cast("date").alias("day"), "value"
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.lit(1))
                .otherwise(0)
                .cast("long")
            ).alias("pos"),
            F.sum(
                F.when(F.col("event_type") == "click", F.lit(1))
                .otherwise(0)
                .cast("long")
            ).alias("clk"),
        )

    return corpus_artifact(spark, sf_dir, "eval_scored_day_value", build)


def _eval_value_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(value, cnt, pos, clk) — the day-collapsed sibling of
    :func:`_eval_day_value_frame` (folded from it at build time, so
    the corpus is scanned once for both): one row per distinct score,
    already at the granularity q_eval_auc / q_ks_distance /
    q_calibration_bins group to — serving it staged removes their
    per-invocation groupBy(value) exchange as well as the scan."""
    from prueba_tecnica_analista_etl_spark.artifacts import (
        corpus_artifact,
    )

    def build() -> DataFrame:
        return (
            _eval_day_value_frame(spark, sf_dir)
            .groupBy("value")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("pos").alias("pos"),
                F.sum("clk").alias("clk"),
            )
        )

    return corpus_artifact(spark, sf_dir, "eval_scored_value", build)


@query(
    "q_eval_auc",
    """
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT value, COUNT(*) AS cnt, SUM(lab) AS pos
      FROM s GROUP BY value
    ),
    c AS (
      SELECT value, cnt, pos,
             COALESCE(SUM(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_cnt
      FROM g
    ),
    t AS (
      SELECT CAST(SUM(pos * (2*cum_cnt + cnt + 1)) AS BIGINT) AS r2,
             CAST(SUM(pos) AS BIGINT) AS npos,
             CAST(SUM(cnt) AS BIGINT) AS n
      FROM c
    )
    SELECT npos, n - npos AS nneg,
           CASE WHEN npos * (n - npos) > 0 THEN
             CAST(r2 - npos*(npos+1) AS DOUBLE)
               / CAST(2 * npos * (n - npos) AS DOUBLE)
           END AS auc
    FROM t
    """,
    doc="Distributed tie-adjusted AUC (Mann-Whitney rank-sum): exact "
    "integer arithmetic end-to-end, global cumulative count via "
    "bucketed prefix sums — no SinglePartition window.",
)
def q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval census: AUC of ``events.value`` as a score for the
    binary label ``event_type = 'purchase'`` — the ranking-quality
    metric every training pipeline reports next to its loss.

    The rank-sum identity makes AUC a one-pass aggregate over the
    per-distinct-score frame: with ``cnt``/``pos`` the total/positive
    count at each score and ``cum_cnt`` the count strictly below it,
    the doubled tie-adjusted positive rank sum is ``r2 = sum(pos *
    (2*cum_cnt + cnt + 1))`` (each tied group contributes its average
    rank ``cum_cnt + (cnt+1)/2`` per positive, doubled to stay
    integral), and ``AUC = (r2 - npos*(npos+1)) / (2*npos*nneg)``.

    Every quantity up to the final division is a 64-bit integer
    computed identically in both engines — the SURVEY §2.11
    hash-stability discipline; the single closing division is one
    correctly-rounded IEEE op on identical integers, so the DOUBLE
    output is bit-identical by construction (r2 <= 2n^2 stays inside
    int64 to n ~ 2.1e9 rows; past that, lift r2 to DECIMAL(38,0)).
    Degenerate label distributions (no positives / no negatives) yield
    NULL AUC explicitly in both engines.

    The scale pattern: ``SUM() OVER (ORDER BY value)`` — the textbook
    cumulative — serializes the frame through one reducer exactly as
    global RANK does. bucketed_prefix_sums (operators/rank.py) shards
    it: monotone value buckets, a census-sized per-bucket totals
    collect (staged per corpus), broadcast offsets, within-bucket
    running sums. NULL scores are excluded explicitly in both engines
    (their rank placement is an engine default, q_global_rank's rule).

    Reference parity: extends the reference's §3 quality-audit
    aggregates (seccion3_sql.sql:85-210) with the evaluation-side
    census a curation pipeline needs before shipping a training set.
    """
    # g folds from the staged per-distinct-score frame (r15): the
    # artifact rows ARE the (value, cnt, pos) census the oracle's
    # GROUP BY value produces — zero events scans, zero groupBy
    # exchange per invocation (the corpus is scanned once per CORPUS
    # by the artifact build).
    g = _eval_value_frame(spark, sf_dir).select("value", "cnt", "pos")
    census = _value_bucket_census(spark, sf_dir, "eval_auc_census", g, ["cnt"])
    if census is None:  # empty input: the oracle's aggregate-of-nothing row
        c = g.withColumn("cum_cnt", F.lit(0).cast("long"))
    else:
        lo, hi, totals = census
        c = bucketed_prefix_sums(
            g,
            numeric_bucket(F.col("value"), lo, hi, _RANK_BUCKETS),
            "value",
            ["cnt"],
            hist=totals,
        )
    t = c.agg(
        F.sum(
            F.col("pos") * (2 * F.col("cum_cnt") + F.col("cnt") + 1)
        ).alias("r2"),
        F.sum("pos").alias("npos"),
        F.sum("cnt").alias("n"),
    )
    nneg = F.col("n") - F.col("npos")
    return t.select(
        "npos",
        nneg.alias("nneg"),
        F.when(
            F.col("npos") * nneg > 0,
            (F.col("r2") - F.col("npos") * (F.col("npos") + 1)).cast("double")
            / (2 * F.col("npos") * nneg).cast("double"),
        ).alias("auc"),
    )


@query(
    "q_ks_distance",
    """
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ),
    g AS (SELECT value, SUM(a) AS ca, SUM(b) AS cb FROM s GROUP BY value),
    c AS (
      SELECT value, ca, cb,
             COALESCE(SUM(ca) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_ca,
             COALESCE(SUM(cb) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_cb
      FROM g
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM g
    )
    SELECT na, nb,
           CAST(MAX(ABS((cum_ca + ca) * nb - (cum_cb + cb) * na))
                AS BIGINT) AS ks_num,
           CASE WHEN na * nb > 0 THEN
             CAST(MAX(ABS((cum_ca + ca) * nb - (cum_cb + cb) * na))
                  AS DOUBLE) / CAST(na * nb AS DOUBLE)
           END AS ks
    FROM c CROSS JOIN tot
    GROUP BY na, nb
    """,
    doc="Two-sample Kolmogorov-Smirnov distance in exact cross-"
    "multiplied integers (max |cum_a*n_b - cum_b*n_a|), cumulatives "
    "via the same bucketed prefix-sum frame as q_eval_auc.",
)
def q_ks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift census: the two-sample Kolmogorov-Smirnov
    distance between the ``purchase`` and ``click`` populations'
    ``value`` distributions — the rank-based companion to
    q_source_divergence's KL (which compares token FREQUENCIES; KS
    compares a numeric column's empirical CDFs, the drift test a
    data-quality gate runs between ingestion batches).

    ``KS = max over values of |F_a(v) - F_b(v)|`` where F is the
    inclusive empirical CDF. Cross-multiplying by the sample sizes
    keeps it integral: ``ks_num = max |cum_a(v)*n_b - cum_b(v)*n_a|``
    over the per-distinct-value frame, with the cumulatives from the
    same bucketed_prefix_sums pattern as q_eval_auc (one shared scan,
    two summed columns, census-sized offsets; cum*n <= n_a*n_b stays
    inside int64 while n_a*n_b < 2^63). The reported ``ks`` divides
    the two exact integers once — bit-identical IEEE result in both
    engines; degenerate inputs (an empty side) yield NULL explicitly.

    The max itself is a plain aggregate (partial max per partition,
    one scalar to merge) — the census frame never converges on a
    single reducer.

    Reference parity: generalizes the reference's statistical-profile
    / staging-audit designs (nb:287-340, seccion3_sql.sql:85-210)
    from per-batch scalar checks to a between-population drift test.
    """
    # g folds from the staged per-distinct-score frame (r15): ca/cb
    # are exactly the artifact's purchase/click counts, and the
    # oracle's implicit value set (scores with >= 1 purchase-or-click
    # row) is the pos+clk > 0 filter — zero events scans per
    # invocation.
    g = (
        _eval_value_frame(spark, sf_dir)
        .filter((F.col("pos") + F.col("clk")) > 0)
        .select(
            "value",
            F.col("pos").alias("ca"),
            F.col("clk").alias("cb"),
        )
    )
    census = _value_bucket_census(
        spark, sf_dir, "ks_distance_census", g, ["ca", "cb"]
    )
    if census is None:
        c = g.withColumn("cum_ca", F.lit(0).cast("long")).withColumn(
            "cum_cb", F.lit(0).cast("long")
        )
        tot = g.agg(
            F.sum("ca").alias("na"), F.sum("cb").alias("nb")
        )
    else:
        lo, hi, totals = census
        c = bucketed_prefix_sums(
            g,
            numeric_bucket(F.col("value"), lo, hi, _RANK_BUCKETS),
            "value",
            ["ca", "cb"],
            hist=totals,
        )
        # The census already holds both totals (sum of the per-bucket
        # sums) — driver-known ints, so they ride the plan as
        # LITERALS (r15): the former one-row createDataFrame +
        # broadcast cross join against the census frame is a pure
        # projection now.
        tot = None
        na = F.lit(sum(t[0] or 0 for _, t in totals)).cast("long")
        nb = F.lit(sum(t[1] or 0 for _, t in totals)).cast("long")
        c = c.withColumn("na", na).withColumn("nb", nb)
    diff = F.abs(
        (F.col("cum_ca") + F.col("ca")) * F.col("nb")
        - (F.col("cum_cb") + F.col("cb")) * F.col("na")
    )
    return (
        (c if tot is None else c.join(F.broadcast(tot)))
        .groupBy("na", "nb")
        .agg(F.max(diff).alias("ks_num"))
        .select(
            "na",
            "nb",
            "ks_num",
            F.when(
                F.col("na") * F.col("nb") > 0,
                F.col("ks_num").cast("double")
                / (F.col("na") * F.col("nb")).cast("double"),
            ).alias("ks"),
        )
    )


@query(
    "q_calibration_bins",
    """
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
      FROM events WHERE value IS NOT NULL
    ),
    b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM s),
    binned AS (
      SELECT CASE WHEN hi > lo THEN
               CAST(LEAST(GREATEST(
                 FLOOR((value - lo) / ((hi - lo) / 10.0)), 0), 9)
                 AS BIGINT)
             ELSE 0 END AS bin,
             lab
      FROM s CROSS JOIN b
    )
    SELECT bin, COUNT(*) AS cnt, CAST(SUM(lab) AS BIGINT) AS pos,
           CAST(SUM(lab) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS pos_rate
    FROM binned GROUP BY bin
    """,
    doc="Reliability-diagram census: equal-width score bins over "
    "[min, max], per bin the row count, positive count, and observed "
    "positive rate. Bin assignment is the same three-IEEE-op "
    "sequence in both engines ((v-lo) / ((hi-lo)/10.0), floored) on "
    "identical operands — deterministic without any grid trick — "
    "and the bin KEY is the resulting integer; pos_rate is one "
    "division of exact integers. Map-only binning + one groupBy; "
    "bounds ride a broadcast one-row frame, no driver collect.",
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of ``events.value`` as a purchase score.

    The third leg of the eval-census family (q_eval_auc ranks,
    q_ks_distance drifts, this bins): per equal-width score decile,
    how often the positive label actually occurs — the reliability
    diagram a score consumer reads before thresholding on it.

    Cross-engine determinism without integer grids: the bin index is
    floor((v - lo) / ((hi - lo) / 10.0)) clamped to [0, 9] — every
    intermediate is a SINGLE correctly-rounded IEEE op on identical
    double operands, so both engines compute the identical integer
    (SURVEY §2.11: one-op float chains are exact; it is SUMS and
    reassociable chains that are not). Deliberately NOT reported: the
    per-bin mean score — a multi-row double SUM whose accumulation
    order differs per engine; consumers needing it should quantize
    scores onto an integer grid first (the perplexity discipline).

    Scale shape: the bounds aggregate is census-sized (one row,
    broadcast back); binning is map-only; the decile histogram is a
    10-row partial-agged groupBy. Degenerate lo == hi collapses to
    bin 0 explicitly in both engines.

    Reference parity: the reference's quality-audit conditional
    aggregates (seccion3_sql.sql:85-210) extended to the
    score-vs-outcome census its §3 verdict checks imply.
    """
    # Folds from the staged per-distinct-score frame (r15): the bin
    # index depends on value alone, so binning the (value, cnt, pos)
    # census weighted by its exact-integer counts reproduces the
    # row-level histogram bit-for-bit (sum of longs re-associates
    # exactly; lo/hi over the census equal lo/hi over the rows) —
    # zero events scans per invocation.
    s = _eval_value_frame(spark, sf_dir).select("value", "cnt", "pos")
    b = s.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(10.0)
    binned = s.crossJoin(F.broadcast(b)).select(
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.greatest(
                    F.floor((F.col("value") - F.col("lo")) / width),
                    F.lit(0),
                ),
                F.lit(9),
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("bin"),
        "cnt",
        "pos",
    )
    return binned.groupBy("bin").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("pos").alias("pos"),
        (
            F.sum("pos").cast("double") / F.sum("cnt").cast("double")
        ).alias("pos_rate"),
    )


@query(
    "q_eval_auc_daily",
    """
    WITH s AS (
      SELECT CAST(ts AS DATE) AS day, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    g AS (
      SELECT day, value, COUNT(*) AS cnt, SUM(lab) AS pos
      FROM s GROUP BY day, value
    ),
    c AS (
      SELECT day, value, cnt, pos,
             COALESCE(SUM(cnt) OVER (PARTITION BY day ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_cnt
      FROM g
    ),
    t AS (
      SELECT day,
             CAST(SUM(pos * (2*cum_cnt + cnt + 1)) AS BIGINT) AS r2,
             CAST(SUM(pos) AS BIGINT) AS npos,
             CAST(SUM(cnt) AS BIGINT) AS n
      FROM c GROUP BY day
    )
    SELECT day, npos, n - npos AS nneg,
           CASE WHEN npos * (n - npos) > 0 THEN
             CAST(r2 - npos*(npos+1) AS DOUBLE)
               / CAST(2 * npos * (n - npos) AS DOUBLE)
           END AS auc
    FROM t
    """,
    doc="Per-day AUC census (eval drift over time): q_eval_auc's "
    "exact integer rank-sum identity per calendar day. The "
    "cumulative window partitions by day, so it is NATIVELY "
    "shardable — the deliberate contrast with the global form, "
    "which needs the bucketed prefix-sum scheme; same integer "
    "discipline, one closing IEEE division per day.",
)
def q_eval_auc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily AUC of ``events.value`` vs the purchase label — the
    drift companion to q_eval_auc: a score whose corpus-level AUC
    looks healthy can still decay across time slices, and this census
    is how an eval pipeline sees it per ingestion day.

    Same rank-sum identity and 64-bit-integer discipline as
    q_eval_auc, but the cumulative count partitions BY DAY — a
    sharded window Spark executes with one hash exchange on day, no
    bucketed scheme required (the scale lesson in reverse: global
    cumulatives need the histogram trick, per-group cumulatives are
    already distributed). Degenerate days (single-class) yield NULL
    AUC explicitly in both engines; NULL scores and NULL timestamps
    are excluded explicitly.

    Reference parity: the reference's per-day volume audit
    (seccion3_sql.sql:85-210; q_volume_by_day) upgraded from counts
    to a per-day ranking-quality metric.
    """
    # g IS the staged (day, value, cnt, pos) frame (r15): the
    # artifact groups at exactly this granularity (NULL-day rows are
    # the NULL-ts rows the oracle excludes — filtered here), so the
    # per-invocation scan AND the groupBy(day, value) exchange are
    # both gone; only the per-day window + closing aggregate run live.
    g = (
        _eval_day_value_frame(spark, sf_dir)
        .filter(F.col("day").isNotNull())
        .select("day", "value", "cnt", "pos")
    )
    w = (
        Window.partitionBy("day")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn(
        "cum_cnt", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    )
    t = c.groupBy("day").agg(
        F.sum(
            F.col("pos") * (2 * F.col("cum_cnt") + F.col("cnt") + 1)
        ).alias("r2"),
        F.sum("pos").alias("npos"),
        F.sum("cnt").alias("n"),
    )
    nneg = F.col("n") - F.col("npos")
    return t.select(
        "day",
        "npos",
        nneg.alias("nneg"),
        F.when(
            F.col("npos") * nneg > 0,
            (F.col("r2") - F.col("npos") * (F.col("npos") + 1)).cast(
                "double"
            )
            / (2 * F.col("npos") * nneg).cast("double"),
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Retrieval/ranking eval: precision & recall at k
# ---------------------------------------------------------------------------


@query(
    "q_eval_topk_precision",
    """
    WITH s AS (
      SELECT event_id, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT lab,
             row_number() OVER (ORDER BY value DESC, event_id ASC) AS rn
      FROM s
    ),
    tot AS (SELECT CAST(SUM(lab) AS BIGINT) AS npos FROM s)
    SELECT k.k AS k,
           CAST(COUNT(r.rn) AS BIGINT) AS n_considered,
           CAST(COALESCE(SUM(r.lab), 0) AS BIGINT) AS tp,
           CASE WHEN COUNT(r.rn) > 0 THEN
             CAST(COALESCE(SUM(r.lab), 0) AS DOUBLE) / COUNT(r.rn)
           END AS precision,
           CASE WHEN (SELECT npos FROM tot) > 0 THEN
             CAST(COALESCE(SUM(r.lab), 0) AS DOUBLE)
               / (SELECT npos FROM tot)
           END AS recall
    FROM (VALUES (10), (100), (1000)) AS k(k)
    LEFT JOIN r ON r.rn <= k.k
    GROUP BY k.k
    ORDER BY k.k
    """,
    doc="Eval census: precision@k / recall@k of the score ranking "
    "(value DESC, event_id ASC total order) for k in {10,100,1000} — "
    "integer tp/n counts, single closing divisions (hash-stable). "
    "Plan: ONE TakeOrderedAndProject of k_max rows per partition, "
    "window over the 1000-row census frame (no exchange at all), "
    "never a global rank of the fact table.",
)
def q_eval_topk_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall at k — the retrieval twin of q_eval_auc.

    AUC summarizes the whole ranking; serving cares about the HEAD of
    it (the k items a retrieval stage or recommender actually acts
    on). tp@k / precision@k / recall@k over the (score DESC, id ASC)
    total order are the standard head-of-ranking censuses.

    Scale shape: the oracle's global ``row_number()`` over every
    scored row is exactly the single-reducer serialization this module
    exists to avoid. The engine form never ranks the fact table: one
    ``TakeOrderedAndProject(limit=k_max)`` keeps the top k_max rows
    (partial top-k per partition, the q_similarity_topk shape), and
    the row_number window then runs over that 1000-row CENSUS frame —
    the executed plan contains no Exchange at all between the scan and
    the window (TakeOrdered emits one pre-sorted partition). The
    per-k fan-out is a broadcast range join of a 3-row literal frame
    against 1000 rows. Hash-stability: tp and n_considered are exact
    integers on an unambiguous total order (value ties broken by the
    unique event_id); precision/recall are single IEEE divisions of
    identical integers (SURVEY §2.11 discipline).

    Reference parity: the reference's quality-audit aggregates
    (seccion3_sql.sql:85-210) and top-20 duplicate ranking
    (Seccion_1_Excel; q_top_duplicates) extended to the eval side —
    head-of-ranking quality of a score, next to q_eval_auc's
    whole-ranking census.
    """
    ks = [10, 100, 1000]
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "value",
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(0)
            .cast("long")
            .alias("lab"),
        )
    )
    # npos folds from the staged per-distinct-score frame (r15) —
    # the second events scan this query paid was exactly this global
    # positive count; the ranked head below still scans events once
    # (it needs event_id, which no shared census carries).
    totals = _eval_value_frame(spark, sf_dir).agg(
        F.sum("pos").alias("npos")
    )
    w = Window.orderBy(F.desc("value"), F.asc("event_id"))
    ranked = (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(max(ks))
        .withColumn("rn", F.row_number().over(w))
    )
    kdim = spark.createDataFrame([(k,) for k in ks], "k int")
    return (
        kdim.join(
            F.broadcast(ranked), F.col("rn") <= F.col("k"), "left"
        )
        .groupBy("k")
        .agg(
            F.count("rn").alias("n_considered"),
            F.coalesce(F.sum("lab"), F.lit(0)).alias("tp"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "k",
            "n_considered",
            "tp",
            F.when(
                F.col("n_considered") > 0,
                F.col("tp").cast("double")
                / F.col("n_considered").cast("double"),
            ).alias("precision"),
            F.when(
                F.col("npos") > 0,
                F.col("tp").cast("double") / F.col("npos").cast("double"),
            ).alias("recall"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Heavy hitters via a bounded-memory sketch (exact-verified)
# ---------------------------------------------------------------------------

_HH_CAPACITY = 8  # Misra-Gries counters/partition → threshold n/9


@query(
    "q_heavy_hitters",
    f"""
    WITH tot AS (SELECT COUNT(*) AS n FROM events
                 WHERE event_type IS NOT NULL)
    SELECT event_type, COUNT(*) AS cnt,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type
    HAVING COUNT(*) * {_HH_CAPACITY + 1} > (SELECT n FROM tot)
    ORDER BY cnt DESC, event_type
    """,
    doc="Heavy hitters through a bounded-memory Misra-Gries sketch "
    "(operators/sketch.py): per-partition capacity-8 summaries (one "
    "pass, Arrow-batched, O(capacity) state) whose union provably "
    "contains every key with share > 1/9; an exact second pass over "
    "only the candidates re-counts and filters at the guarantee "
    "threshold — so the approximate machinery yields an EXACT, "
    "oracle-checkable answer. The integer filter (cnt*9 > n) avoids "
    "any float threshold.",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys holding more than 1/(capacity+1) of the events stream.

    The exact form (the oracle's GROUP BY/HAVING) shuffles one row per
    distinct key — the very cost a heavy-hitter diagnosis exists to
    avoid at 100 TB key cardinalities. The engine form never does:
    Misra-Gries summaries bound per-partition state to
    ``_HH_CAPACITY`` counters, their union is a proven SUPERSET of
    every key above the n/(capacity+1) threshold, and the exact
    re-count touches only candidate keys (broadcast semi-join), so
    the aggregation state is O(capacity × partitions) regardless of
    distinct-key count. Filtering the exact counts at the guarantee
    threshold makes the result identical to the oracle's — integer
    compare (cnt*(capacity+1) > n), one closing division for the
    reported share (SURVEY §2.11 discipline).

    Reference parity: the reference's duplicate-frequency analyses
    (Seccion_1_Excel top-20 duplicates; nb:150-160) at the
    key-distribution level, made feasible for unbounded-cardinality
    keys — the skew-diagnosis census operators/salt.py acts on.
    """
    from prueba_tecnica_analista_etl_spark.operators.sketch import (
        mg_candidates,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_type")
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    # The MG candidate set is staged per corpus (r15 — the same
    # census_artifact discipline q_stream_heavy_hitters has used
    # since r10): ANY partitioning's sketch yields a valid superset
    # (PODS-2012 mergeable property), so a staged candidate list is
    # exactly as sound as a per-call one, and the per-invocation
    # Arrow sketch pass (mapInPandas over a spread() copy of the
    # fact table) leaves the declared path. The exact recount + the
    # integer threshold filter — which alone determine the output —
    # still run live against the fact table on every call.
    cand = census_artifact(
        spark,
        sf_dir,
        f"hh_candidates:c{_HH_CAPACITY}",
        lambda: sorted(
            r["event_type"]
            for r in mg_candidates(
                spread(ev), "event_type", _HH_CAPACITY
            )
            .distinct()
            .collect()
        ),
    )
    exact = (
        ev.filter(F.col("event_type").isin(list(cand)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * (_HH_CAPACITY + 1) > F.col("n"))
        .select(
            "event_type",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc("event_type"))
    )


@query(
    "q_stream_heavy_hitters",
    f"""
    WITH tot AS (SELECT COUNT(*) AS n FROM events
                 WHERE event_type IS NOT NULL)
    SELECT event_type, COUNT(*) AS cnt,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type
    HAVING COUNT(*) * {_HH_CAPACITY + 1} > (SELECT n FROM tot)
    ORDER BY cnt DESC, event_type
    """,
    doc="Heavy hitters computed over a STREAM yet still ORACLE-EXACT: "
    "the events table replays as a file stream; each micro-batch's "
    "per-partition Misra-Gries summaries fold into one capacity-"
    "bounded driver dict inside foreachBatch (the PODS-2012 mergeable "
    "property across batches); the drained candidate set — a proven "
    "superset of every key above the n/(capacity+1) threshold "
    "regardless of how the stream was batched — is then exactly "
    "re-counted and filtered, reproducing the batch answer bit-for-"
    "bit. The one streaming query whose result plain SQL can check.",
)
def q_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_heavy_hitters' STREAMING twin, sharing its oracle.

    Why the stream path can be oracle-backed at all: Misra-Gries
    summaries are mergeable, so candidates(stream) is a superset of
    the true heavy hitters no matter how the file stream batches the
    data, and the exact re-count + threshold filter is a pure
    function of (candidates ∩ heavy hitters) = heavy hitters. The
    approximate, batching-dependent machinery cancels out of the
    final answer — tested directly in
    tests/test_streaming.py::test_mg_stream_accumulator_matches_batch_heavy_hitters
    and certified here by the DuckDB value-hash gate every round.

    Scale shape: per micro-batch one mg_summary job (O(capacity)
    state per partition, Arrow-batched) plus a capacity×partitions
    collect; driver state O(capacity) total (mg_merge). The candidate
    set is memoized per corpus (census_artifact — capacity keys), so
    repeated audit runs pay the replay once; the exact pass is the
    same broadcast-filtered aggregation q_heavy_hitters uses, with
    the isin literal standing in for the broadcast semi-join at
    capacity size.

    Reference parity: the reference's planned streaming ingestion
    (nb:383 'mejoras futuras') combined with its duplicate-frequency
    analyses (Seccion_1_Excel top-20; nb:150-160) — frequency
    diagnosis that keeps working when the data arrives as a stream.
    """
    import tempfile

    from prueba_tecnica_analista_etl_spark.operators.sketch import (
        MGStreamAccumulator,
    )
    from prueba_tecnica_analista_etl_spark.streaming.replay import (
        replay_as_stream,
        write_replay_files,
    )

    def _streamed_candidates() -> list:
        import shutil

        data_dir, schema = write_replay_files(
            spark, sf_dir, "events", n_files=4
        )
        acc = MGStreamAccumulator("event_type", capacity=_HH_CAPACITY)
        # The checkpoint is single-use (the drained candidate set is
        # what gets staged, via census_artifact below) — remove it
        # after the drain instead of leaking one dir per build (r10
        # ADVICE; a RESUMABLE stream would instead keep a stable
        # checkpoint and pass ledger_dir= for the durable sketch
        # ledger, the crash-resume form tests/test_streaming.py
        # exercises).
        ckpt = tempfile.mkdtemp(prefix="stream_hh_ckpt_")
        try:
            q = (
                replay_as_stream(spark, data_dir, schema, 1)
                .writeStream.foreachBatch(acc)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
        return acc.candidates()

    cand = census_artifact(
        spark, sf_dir, "stream_hh_candidates", _streamed_candidates
    )
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_type")
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    # no spread() (r14): the recount is a pushed isin filter + a
    # map-side partial aggregate — the round-robin repartition was a
    # full fact-table shuffle with nothing to parallelize (the same
    # finding as q_heavy_hitters' recount pass).
    exact = (
        ev.filter(F.col("event_type").isin(list(cand)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * (_HH_CAPACITY + 1) > F.col("n"))
        .select(
            "event_type",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc("event_type"))
    )


def _zipf_oracle_sql() -> str:
    return """
    WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS term
                  FROM documents),
         t AS (SELECT term FROM toks WHERE term <> ''),
         census AS (SELECT term, count(*) AS freq FROM t GROUP BY term),
         r AS (SELECT freq, rank() OVER (ORDER BY freq DESC) AS rnk
               FROM census)
    SELECT CAST(length(bin(rnk)) - 1 AS INTEGER) AS rank_bucket,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(freq) AS BIGINT) AS total_freq,
           CAST(min(rnk) AS BIGINT) AS min_rank,
           CAST(max(rnk) AS BIGINT) AS max_rank
    FROM r GROUP BY 1 ORDER BY 1
    """


@query(
    "q_zipf_census",
    _zipf_oracle_sql(),
    doc="extension (corpus-health census, r14): vocabulary Zipf-curve "
    "census — per log2-rank bucket (rank octave), term count and "
    "total frequency mass. Natural text follows freq ∝ 1/rank, so "
    "consecutive octaves carry roughly equal mass; an octave whose "
    "mass spikes flags boilerplate/templating injection and one that "
    "collapses flags tokenizer breakage — the one-glance vocabulary "
    "diagnostic next to q_unigram_entropy's per-source view. "
    "Distributed shape: the term census folds the shared doc_term_tf "
    "artifact (vocab-sized — zero corpus scans), the global "
    "frequency rank is the TWO-PASS histogram scheme over key "
    "-freq (bucketed_rank: census-sized histogram collect, sharded "
    "within-bucket windows — RANK ties share a bucket so no "
    "Exchange SinglePartition, the q_global_rank pattern), and "
    "floor(log2(rank)) = length(bin(rank))-1 is integer-exact in "
    "both engines. Output: octave-count rows, all-integer.",
)
def q_zipf_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prueba_tecnica_analista_etl_spark.plans.extensions_text import (
        doc_term_tf_frame,
    )

    keyed = (
        doc_term_tf_frame(spark, sf_dir)
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("freq"))
        .select("term", "freq", (-F.col("freq")).alias("negfreq"))
    )

    def build():
        lo, hi = keyed.agg(F.min("negfreq"), F.max("negfreq")).first()
        if lo is None:  # empty corpus
            return None
        b = numeric_bucket(F.col("negfreq"), lo, hi, _RANK_BUCKETS)
        return lo, hi, bucket_histogram(keyed, b)

    census = census_artifact(
        spark, sf_dir, f"zipf_rank_census:b{_RANK_BUCKETS}", build
    )
    if census is None:
        return spark.createDataFrame(
            [],
            "rank_bucket int, n_terms long, total_freq long, "
            "min_rank long, max_rank long",
        )
    lo, hi, hist = census
    ranked = bucketed_rank(
        keyed,
        numeric_bucket(F.col("negfreq"), lo, hi, _RANK_BUCKETS),
        ["negfreq"],
        method="rank",
        hist=hist,
    )
    zb = (F.length(F.bin(F.col("global_rank"))) - 1).cast("int")
    return (
        ranked.select(
            zb.alias("rank_bucket"), "freq", "global_rank"
        )
        .groupBy("rank_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("freq").cast("long").alias("total_freq"),
            F.min("global_rank").alias("min_rank"),
            F.max("global_rank").alias("max_rank"),
        )
        .orderBy("rank_bucket")
    )

"""Canonical parquet table loaders (S5).

Parquet is the engine's canonical storage (columnar, splittable,
predicate/column pushdown — the scan Catalyst can prune). At 100 TB each
table would be a partitioned directory (e.g. ``orders/o_orderdate=.../``)
and these loaders pick up partition pruning for free; the harness
testdata is a single file per table.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor
# (region=5 rows, nation=25 — even at 100 TB these stay tiny).
BROADCAST_DIMS = ("region", "nation")


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to ``TimestampType`` regardless of
    the parquet physical encoding it arrived in.

    The harness testdata has shipped ``events.ts`` in two encodings so
    far, and a third is plausible; all must converge on the µs-instant
    ``timestamp`` type that ``withWatermark`` requires:

    - ``TIMESTAMP(NANOS)``: Spark 4 cannot map ns to its µs
      TimestampType; with ``nanosAsLong`` it arrives as epoch nanos
      (long) and is truncated to µs — the same ns→µs truncation DuckDB
      applies casting TIMESTAMP_NS, so both engines see the same
      instants.
    - ``TIMESTAMP_MICROS (isAdjustedToUTC=0)``: Spark 4 reads this as
      ``TIMESTAMP_NTZ``, which ``withWatermark`` rejects
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Cast to ``timestamp`` —
      under the pinned UTC session timezone the wall-clock
      reinterpretation is the identity on instants, so batch oracle
      hashes are unchanged.
    - ``TIMESTAMP_MICROS (isAdjustedToUTC=1)``: already
      ``TimestampType``; pass through untouched.

    Contract: an int64 event-time column is epoch NANOS — there is no
    in-band way to tell ns/µs/ms apart within the same physical type,
    so the unit is pinned by contract and guarded out-of-band by
    ``test_event_time_magnitude_sentinel`` (decoded instants must land
    in a plausible year range; a mis-scaled unit lands in 1970 or past
    2100 and fails the sentinel by name).
    """
    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one canonical table: ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is normalized to ``TimestampType`` whatever physical
    encoding the file carries — see :func:`normalize_event_time`.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_time(df, "ts")
    return df


def read_evolving_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution reader: a 100 TB table's files span schema
    versions (columns added over time); ``mergeSchema`` unions all
    footers into one superset schema and older files surface NULLs for
    columns they predate. Footer merging costs one distributed pass at
    planning — for hot paths pin an explicit superset ``schema=``
    instead (same NULL semantics, no merge pass)."""
    return spark.read.option("mergeSchema", True).parquet(path)


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition before expensive per-row compute.

    A small table read from one parquet file arrives as ONE partition,
    so heavy row-wise expressions (shingling, hashing, UDF batches)
    run on a single core no matter how many the cluster has. One cheap
    narrow-data shuffle first buys full parallelism for the expensive
    stage. At 100 TB the scan is already many-splits and this is a
    no-op decision — it matters exactly when file count < cores.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(n or sc.defaultParallelism)


# write_bucketed moved to sources/bucketed.py (the single bucketed-
# write API — multi-key + optional external path; r12 verdict
# consolidation).  Import it from there.


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API path."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def footer_stats_session(spark: SparkSession) -> SparkSession:
    """Session clone configured for PARQUET AGGREGATE PUSHDOWN: a
    filter-free MIN/MAX/COUNT over a parquet table is answered from
    row-group FOOTER STATISTICS — zero data pages read — which at
    100 TB turns full-table census queries (the reference's
    row-count verification checks, S-family audits) from a complete
    scan into a metadata pass.

    Two confs, both scoped to the CLONE so the caller's session and
    every recorded query plan stay untouched:

    * ``spark.sql.parquet.aggregatePushdown=true`` — the feature
      flag;
    * ``spark.sql.sources.useV1SourceList=""`` — pushdown is a
      DSv2-only capability; parquet reads default to the V1 source
      where the flag is a no-op (measured: no ``PushedAggregation``
      without this).

    Semantics are unchanged — Spark falls back to a normal scan
    whenever pushdown cannot answer exactly (filters present, nested
    or unsupported-type columns, nulls where the stat is unusable) —
    proven value-equal to the V1 path by
    ``test_footer_stats_session_pushes_aggregates``.

    The configured clone is MEMOIZED per parent session (same
    rationale as plans/queries.py's per-session plan cache): session
    construction + conf py4j round
    trips are the documented dominant driver-side cost of repeated
    tiny queries, and un-cached clones would accumulate on the shared
    SparkContext for the process lifetime.
    """
    key = id(spark)
    hit = _FOOTER_SESSIONS.get(key)
    if hit is not None and hit[0]() is spark:
        return hit[1]
    # evict entries whose parent died (id() values can be reused
    # after GC, so a dead entry is not just waste — it is a hazard)
    for k in [k for k, (ref, _) in _FOOTER_SESSIONS.items() if ref() is None]:
        _FOOTER_SESSIONS.pop(k, None)
    s = spark.newSession()
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    _FOOTER_SESSIONS[key] = (weakref.ref(spark), s)
    return s


# parent-session id -> (weakref(parent), configured clone).  The
# parent rides a WEAK reference so memoization never pins a stopped
# session (ADVICE r7: strong refs grew unboundedly in long-lived
# multi-session processes); the ref() identity check keeps id()-reuse
# sound, and dead entries are evicted on the next miss.
_FOOTER_SESSIONS: dict[
    int, "tuple[weakref.ref[SparkSession], SparkSession]"
] = {}

"""Upsert / MERGE (SURVEY.md §2.3 J4) — the reference's stored
procedure ``INSERT … ON CONFLICT (key) DO UPDATE`` re-expressed as a
deterministic join-rewrite.

OSS Spark SQL has no metastore-free MERGE, so the operator is::

    result = new_deduped  UNION ALL  (base ANTI-JOIN new_deduped ON key)

i.e. every incoming key wins (the UPDATE arm), untouched base rows
pass through (the non-matched arm), inserts are the incoming keys
absent from base. This reproduces the procedure's semantics
(``seccion3_sql.sql:269-294``) including its precondition that the
incoming batch is deduped on the key first (``DISTINCT ON``,
``sql:225-229``) and the base is unique (``sql:206-207``).

Scale notes: one shuffle on the key for the anti-join (broadcast if
the incoming batch is small — AQE decides; force with
``broadcast_new=True``). Output is written whole — idempotent by
construction (re-running with the same inputs is a fixpoint, the
property the reference asserts at ``sql:130``). For true row-level
ACID upserts, the same API can delegate to Delta Lake ``MERGE INTO``
when available (optional, never a hard dependency).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.operators.dedupe import keep_first


def assert_unique(df: DataFrame, keys: Sequence[str]) -> None:
    """Uniqueness precondition (D5). Spark has no constraints; this is
    the assertion-query equivalent of the reference's
    ``ALTER TABLE … ADD CONSTRAINT UNIQUE`` (``seccion3_sql.sql:206``).
    Raises ``ValueError`` on violation.
    """
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(f"uniqueness violated on {list(keys)}")


def upsert(
    base: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    dedup_order: Sequence[Column | str] | None = None,
    broadcast_new: bool = False,
) -> DataFrame:
    """MERGE join-rewrite. ``dedup_order``: total order choosing the
    surviving incoming row per key (None = incoming batch already
    unique on ``keys``). Column sets must match by name."""
    new_d = keep_first(new, keys, dedup_order) if dedup_order else new
    rhs = F.broadcast(new_d) if broadcast_new else new_d
    kept_base = base.join(rhs, on=list(keys), how="left_anti")
    return new_d.select(*base.columns).unionByName(
        kept_base.select(*base.columns)
    )


def upsert_with_metrics(
    base: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    dedup_order: Sequence[Column | str] | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Upsert plus the reference procedure's audit counters
    (``seccion3_sql.sql:244-252``): base/new uniques, updates
    (intersection), inserts (new-only). Metrics cost two extra
    aggregations over the (cached) inputs — acceptable for an audited
    batch merge; skip via :func:`upsert` in hot paths."""
    new_d = keep_first(new, keys, dedup_order) if dedup_order else new
    new_d = new_d.cache()
    n_base = base.count()
    n_new = new_d.count()
    updates = base.join(new_d, on=list(keys), how="left_semi").count()
    result = upsert(base, new_d, keys)
    # the cache exists for the three counts above; release it rather
    # than leak one cached frame per audited merge for the session
    # lifetime (the lazy result simply recomputes new_d when executed)
    new_d.unpersist()
    metrics = {
        "base_rows": n_base,
        "new_rows": n_new,
        "updates": updates,
        "inserts": n_new - updates,
        "result_rows": n_new + (n_base - updates),
    }
    return result, metrics

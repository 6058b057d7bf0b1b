"""Stream-stream joins (T-family): watermarked equi-join of two event
streams with an event-time range bound — the attribution/enrichment
shape (click stream ⋈ purchase stream within N minutes per user) that
batch joins cannot express incrementally.

Structured Streaming's contract, encoded here rather than left to the
caller: BOTH sides must carry a watermark and the join condition must
bound the event-time distance, otherwise each side's buffered state is
unbounded (every past left row could still match a future right row).
With the bound, Spark evicts a buffered left row once the global
watermark (min over both streams) passes ``left.ts + within`` — state
is O(events inside the time bound), not O(history), which is what
makes the operator viable on an unbounded 100 TB/day feed.

Outer variants ride the same eviction clock: a left-outer row is
emitted null-extended only when the watermark proves no match can
arrive — correct but LATE by construction (one watermark delay), the
documented trade against emitting retractions.

Batch parity: an inner stream-stream join over a finite in-order
replay equals the batch join of the same frames with the same
condition, PROVIDED the watermark delay covers the replay's
micro-batch disorder (tests assert exact frame equality at
``watermark == within``); a tight watermark drops cross-batch matches
as late — semantics, not loss (same withheld-tail story as
sessionize).

Reference basis: the reference's incremental design (§4 prose) stops
at single-stream upsert; stream-stream correlation is a declared
beyond-reference extension (SURVEY.md §2 T-family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "10 minutes",
    how: str = "inner",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands in
    ``[left.ts, left.ts + within]`` — "right follows left" causal
    attribution. Works unchanged on batch DataFrames (the parity
    oracle) because watermarks are a no-op in batch plans.

    Columns out: key, left/right event ids and timestamps, and the
    right value being attributed. ``how`` may be ``inner``,
    ``left_outer`` (unmatched left emitted null-extended after
    watermark expiry) or ``left_semi``.
    """
    lw = left.withWatermark("ts", watermark).alias("l")
    rw = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {within}"))
    )
    joined = lw.join(rw, cond, how)
    if how == "left_semi":
        return joined.select(
            F.col(f"l.{key}").alias(key),
            F.col("l.event_id").alias("left_id"),
            F.col("l.ts").alias("left_ts"),
        )
    return joined.select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
        F.col("r.value").alias("right_value"),
    )


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: dict[str, str],
    how: str = "left",
) -> DataFrame:
    """Stream-STATIC dimension enrichment — the third join flavor
    (batch⋈batch, stream⋈stream above, stream⋈static here): each
    micro-batch joins against the current snapshot of a batch-side
    dimension. No watermark needed — the static side is not buffered
    as state; Spark re-resolves it per micro-batch, so a dim reloaded
    from parquet between batches is picked up (slowly-changing
    enrichment without restarts). ``on`` maps stream column → dim
    column. The dim is broadcast explicitly: at 100 TB the fact
    stream never shuffles for an enrichment join — the classic
    star-schema rule carried into streaming. Standard SQL equality
    on the keys: a NULL foreign key matches nothing and survives
    null-extended under ``how='left'`` — it is NOT matched against a
    NULL-keyed 'unknown member' dim row.
    """
    cond = None
    for sc, dc in on.items():
        c = stream[sc] == dim[dc]
        cond = c if cond is None else cond & c
    return stream.join(F.broadcast(dim), cond, how)

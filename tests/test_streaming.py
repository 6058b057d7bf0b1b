"""Streaming semantics: batch/stream parity for tumbling windows,
sessionization sanity, idempotent foreachBatch upsert sink with control
ledger and DLQ routing (SURVEY.md §2.9)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.plans import REGISTRY
from prueba_tecnica_analista_etl_spark.sources.tables import load_table
from prueba_tecnica_analista_etl_spark.streaming.replay import (
    replay_as_stream,
    write_replay_files,
)
from prueba_tecnica_analista_etl_spark.streaming.upsert_sink import (
    foreach_batch_upsert,
    read_control,
)
from prueba_tecnica_analista_etl_spark.streaming.windows import (
    run_available_now,
    tumbling_counts,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_batch_stream_parity(spark, sf_dir):
    """Tumbling aggregation agrees batch vs stream for every window the
    watermark finalized. Append mode withholds windows whose end is
    past the final watermark (= max event time with a 0s delay) — i.e.
    exactly the hour containing the last event; assert that precisely."""
    data_dir, schema = write_replay_files(spark, sf_dir, "events", 4)
    stream = replay_as_stream(spark, data_dir, schema, 1)
    got = run_available_now(tumbling_counts(stream, "0 seconds"), spark)

    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    last_hour = max_ts.strftime("%Y-%m-%d %H:00:00")
    want = (
        REGISTRY["q_tumbling_window"]
        .fn(spark, sf_dir)
        .filter(F.col("hour") < last_hour)
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_foreach_batch_upsert_idempotent(spark, sf_dir, tmp_path):
    target = str(tmp_path / "target")
    ev = load_table(spark, sf_dir, "events")
    data_dir, schema = write_replay_files(spark, sf_dir, "events", 4)
    stream = replay_as_stream(spark, data_dir, schema, 2)
    process = foreach_batch_upsert(
        spark,
        target,
        ["event_id"],
        rules={"null_user": F.col("user_id").isNull()},
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = spark.read.parquet(os.path.join(target, "data"))
    assert merged.count() == ev.select("event_id").distinct().count()

    ctrl = read_control(spark, target)
    assert ctrl is not None
    n_batches = ctrl.count()
    assert n_batches >= 2  # maxFilesPerTrigger sliced the backlog

    # replaying an already-recorded batch is a no-op (at-least-once →
    # effectively-once)
    process(ev.limit(50), int(ctrl.agg(F.max("batch_id")).first()[0]))
    assert read_control(spark, target).count() == n_batches
    assert (
        spark.read.parquet(os.path.join(target, "data")).count()
        == merged.count()
    )


def test_sessionize_rows_sane(spark, sf_dir):
    sess = REGISTRY["q_stream_sessionize"].fn(spark, sf_dir)
    rows = sess.collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)
    # sessions per user never exceed events per user
    ev = load_table(spark, sf_dir, "events")
    per_user_events = dict(
        (r["user_id"], r["cnt"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    per_user_sessions: dict[int, int] = {}
    for r in rows:
        per_user_sessions[r["user_id"]] = (
            per_user_sessions.get(r["user_id"], 0) + 1
        )
    for uid, n in per_user_sessions.items():
        assert n <= per_user_events[uid]


def test_multimodal_meta_deterministic(spark, sf_dir):
    a = _sorted_rows(REGISTRY["q_multimodal_meta"].fn(spark, sf_dir))
    b = _sorted_rows(REGISTRY["q_multimodal_meta"].fn(spark, sf_dir))
    assert a == b
    assert len(a) == 3  # image/audio/video buckets

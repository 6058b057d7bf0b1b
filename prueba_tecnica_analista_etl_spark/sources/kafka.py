"""Kafka incremental source (S11 — the reference's "mejoras futuras"
design note, ``ETL_Prueba_Tecnica.ipynb`` §4 cell: Kafka + Spark
Streaming for near-real-time ingestion).

Structured Streaming shape: ``readStream.format("kafka")`` yields the
standard 7-column frame (key/value binary, topic, partition, offset,
timestamp, timestampType); ``parse_json_values`` lifts the JSON value
payload into typed columns with ``from_json``, after which the stream
composes with every downstream operator in this engine (watermarked
windows, foreachBatch upsert, DLQ) exactly like the file-replay source.

The Kafka connector is a separate artifact (pip's pyspark does not
bundle ``spark-sql-kafka-0-10``); the builder raises a clear,
actionable error when the classpath lacks it so callers can gate on it
— the harness container has no broker and no connector, so tests cover
the builder contract and skip the live path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming DataFrame over a Kafka topic (plan construction only —
    no broker contact happens until a query starts)."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as ex:  # pragma: no cover - depends on classpath
        # Only translate the actual missing-connector failure; any
        # other plan-time error (bad options, etc.) must surface as
        # itself, not as a misleading classpath diagnosis.
        msg = str(ex)
        if "Failed to find data source" not in msg and (
            "DATA_SOURCE_NOT_FOUND" not in msg
        ):
            raise
        raise RuntimeError(
            "Kafka connector not on the classpath. Launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
            "<spark-version> (pip's pyspark does not bundle it)."
        ) from ex


def parse_json_values(
    raw: DataFrame, schema: T.StructType, ts_col: str = "timestamp"
) -> DataFrame:
    """Lift Kafka's binary JSON ``value`` into typed columns; keeps the
    broker timestamp as the event-time candidate for watermarking.
    Works identically on the batch ``spark.read.format("kafka")``
    frame (backfill path)."""
    return raw.select(
        F.col(ts_col).alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
    ).select("kafka_ts", "v.*")

"""Multimodal column plumbing (north-star extension): image/audio/video
as opaque ``binary`` columns + typed metadata, processed by
Arrow-batched ``mapInPandas`` — the shape a 100 TB multimodal corpus
pipeline needs (schema, partitioning, UDF signature, batch flow are
real; the actual codec decode is stubbed because media libraries are
not in this container).

Design: binary payloads never pass through Python row-at-a-time; each
``mapInPandas`` batch is an Arrow RecordBatch, so throughput is bounded
by codec speed, not serialization. Partition by asset id (or storage
block) so one task never holds more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

REAL_DECODE = False  # flip when PIL/librosa/av are available


def fake_assets(documents: DataFrame) -> DataFrame:
    """Deterministic binary assets derived from the documents table
    (UTF-8 payloads standing in for image bytes): the plumbing under
    test is schema/partitioning/Arrow flow, not the codec."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def extract_metadata(assets: DataFrame) -> DataFrame:
    """Decode/inspect assets via Arrow-batched ``mapInPandas``.

    The batch function is fully self-contained (only locals + pandas):
    executor Python workers do NOT have this package importable — a
    module-level helper would pickle by reference and die with
    ModuleNotFoundError on any cluster where the driver script isn't
    launched from the package root. Closures pickle by value.
    """
    real_decode = REAL_DECODE

    def decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        if real_decode:
            # Real path: PIL.Image.open(io.BytesIO(b)) / soundfile / pyav.
            raise NotImplementedError(
                "media codecs not available in container"
            )
        lengths = pdf["content"].map(lambda b: 0 if b is None else len(b))
        # Deterministic fake dimensions derived from payload length —
        # stands in for codec-extracted width/height with a stable
        # contract.
        return pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": lengths.astype("int64"),
                "checksum": pdf["content"].map(
                    lambda b: ""
                    if b is None
                    else format(len(b) * 2654435761 % (1 << 32), "08x")
                ),
                "width": (lengths % 1920).astype("int32"),
                "height": (lengths % 1080).astype("int32"),
            }
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_batch(pdf)

    return assets.mapInPandas(gen, schema=META_SCHEMA)

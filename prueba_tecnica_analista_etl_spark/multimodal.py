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
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
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

    Dimensions are REAL for PNG, GIF and JPEG payloads — a pure-Python
    container-header parse (PNG IHDR big-endian w/h at bytes 16..24,
    GIF logical-screen little-endian w/h at bytes 6..10, JPEG marker
    walk to the first SOF frame header), no codec library needed.
    ``duration_s``/``sample_rate`` are likewise REAL for RIFF/WAVE
    (fmt-chunk byte rate ÷ data-chunk size) and MP4 (moov/mvhd
    timescale + duration box walk) payloads, NULL otherwise.
    Payloads whose magic doesn't match fall back to the deterministic
    length-derived fake (the stub for formats that would need a real
    decoder); full pixel decode stays behind ``REAL_DECODE``.

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

        def sniff_dims(b: bytes | None) -> tuple[int, int] | None:
            if b is None:
                return None
            b = bytes(b)
            if (
                len(b) >= 24
                and b[:8] == b"\x89PNG\r\n\x1a\n"
                and b[12:16] == b"IHDR"
            ):
                return (
                    int.from_bytes(b[16:20], "big"),
                    int.from_bytes(b[20:24], "big"),
                )
            if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
                return (
                    int.from_bytes(b[6:8], "little"),
                    int.from_bytes(b[8:10], "little"),
                )
            if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG SOI
                # Walk marker segments to the first SOF frame header:
                # [FF marker len16 precision8 height16 width16 ...]
                i = 2
                while i + 9 <= len(b):
                    if b[i] != 0xFF:
                        i += 1
                        continue
                    marker = b[i + 1]
                    if marker == 0xFF:
                        # fill byte: advance ONE so a trailing FF can
                        # still be the prefix of the real marker
                        # (FF FF C0 must find the C0)
                        i += 1
                        continue
                    if marker == 0x00:
                        # byte-stuffed FF inside entropy-coded data —
                        # not a marker, and it has NO length field
                        i += 2
                        continue
                    if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                        i += 2  # standalone marker, no length
                        continue
                    if i + 4 > len(b):
                        break
                    seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                    if 0xC0 <= marker <= 0xCF and marker not in (
                        0xC4,
                        0xC8,
                        0xCC,
                    ):
                        if i + 9 <= len(b):
                            h = int.from_bytes(b[i + 5 : i + 7], "big")
                            w = int.from_bytes(b[i + 7 : i + 9], "big")
                            return (w, h)
                        break
                    i += 2 + seg_len
                return None
            return None

        def sniff_av(b: bytes | None) -> tuple[float | None, int | None] | None:
            """(duration_s, sample_rate) from audio/video container
            headers — same spirit as ``sniff_dims``, pure-Python:
            RIFF/WAVE fmt-chunk byte rate + data-chunk size, or an
            ISO-BMFF (MP4) moov/mvhd timescale + duration walk."""
            if b is None:
                return None
            b = bytes(b)
            if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                rate = byte_rate = data_size = None
                i = 12
                while i + 8 <= len(b):
                    cid = b[i : i + 4]
                    size = int.from_bytes(b[i + 4 : i + 8], "little")
                    body = b[i + 8 : i + 8 + size]
                    if cid == b"fmt " and len(body) >= 16:
                        rate = int.from_bytes(body[4:8], "little")
                        byte_rate = int.from_bytes(body[8:12], "little")
                    elif cid == b"data":
                        # clamp to bytes actually present: a truncated
                        # or corrupt header declaring a huge data chunk
                        # must not report hours of phantom audio
                        data_size = min(size, max(0, len(b) - (i + 8)))
                    i += 8 + size + (size & 1)  # chunks word-aligned
                if rate and byte_rate and data_size is not None:
                    return (data_size / byte_rate, rate)
                return None
            if len(b) >= 8 and b[4:8] == b"ftyp":

                def boxes(start: int, end: int):
                    i = start
                    while i + 8 <= end:
                        size = int.from_bytes(b[i : i + 4], "big")
                        typ = b[i + 4 : i + 8]
                        hdr = 8
                        if size == 1:  # 64-bit largesize
                            if i + 16 > end:
                                return
                            size = int.from_bytes(b[i + 8 : i + 16], "big")
                            hdr = 16
                        if size < hdr or i + size > end:
                            return
                        yield typ, i + hdr, i + size
                        i += size

                for typ, s, e in boxes(0, len(b)):
                    if typ != b"moov":
                        continue
                    for t2, s2, e2 in boxes(s, e):
                        if t2 != b"mvhd" or s2 + 4 > e2:
                            continue
                        ver = b[s2]
                        if ver == 1 and s2 + 32 <= e2:
                            ts = int.from_bytes(b[s2 + 20 : s2 + 24], "big")
                            dur = int.from_bytes(b[s2 + 24 : s2 + 32], "big")
                        elif ver == 0 and s2 + 20 <= e2:
                            ts = int.from_bytes(b[s2 + 12 : s2 + 16], "big")
                            dur = int.from_bytes(b[s2 + 16 : s2 + 20], "big")
                        else:
                            return None
                        return (dur / ts, None) if ts else None
                return None
            return None

        lengths = pdf["content"].map(lambda b: 0 if b is None else len(b))
        dims = pdf["content"].map(sniff_dims)
        avs = pdf["content"].map(sniff_av)
        fake_w = (lengths % 1920).astype("int32")
        fake_h = (lengths % 1080).astype("int32")
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
                "width": pd.Series(
                    [
                        d[0] if d else int(w)
                        for d, w in zip(dims, fake_w)
                    ],
                    index=pdf.index,
                ).astype("int32"),
                "height": pd.Series(
                    [
                        d[1] if d else int(h)
                        for d, h in zip(dims, fake_h)
                    ],
                    index=pdf.index,
                ).astype("int32"),
                "duration_s": pd.Series(
                    [a[0] if a else None for a in avs],
                    index=pdf.index,
                    dtype="float64",
                ),
                "sample_rate": pd.Series(
                    [a[1] if a else None for a in avs],
                    index=pdf.index,
                    dtype="Int32",
                ),
            }
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_batch(pdf)

    return assets.mapInPandas(gen, schema=META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    assets: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Resize image assets to ``width×height`` via ``mapInPandas``.

    Plumbing is real (schema, Arrow batch flow, pass-through of
    non-image rows); the pixel transform is stubbed deterministically —
    payload truncated/padded to the target pixel budget — because the
    container has no image codecs. Real path: PIL thumbnail per batch.
    """
    real_decode = REAL_DECODE
    budget = width * height

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "image codecs not available in container"
                )
            is_img = pdf["media_type"].str.startswith("image/")

            def fake_resize(b: bytes | None) -> bytes | None:
                if b is None:
                    return None
                return bytes(b[:budget]).ljust(budget, b"\0")

            content = pdf["content"].where(
                ~is_img, pdf["content"].map(fake_resize)
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "content": content,
                    "width": is_img.map(lambda i: width if i else None),
                    "height": is_img.map(lambda i: height if i else None),
                }
            ).astype({"width": "Int32", "height": "Int32"})

    return assets.mapInPandas(gen, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every ``every_n``-th frame from video assets — a
    row-expanding ``mapInPandas`` (one asset → many frames).

    Frame extraction is stubbed as fixed-size byte windows standing in
    for decoded frames (real path: pyav keyframe iteration); the
    fan-out shape — the part that matters for partitioning and memory
    at 100 TB — is real: output rows ≫ input rows, bounded per Arrow
    batch by ``maxRecordsPerBatch``, never a whole video in memory
    beyond the already-loaded payload.
    """
    real_decode = REAL_DECODE
    frame_bytes = 64

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "video codecs not available in container"
                )
            out_ids, out_idx, out_frames = [], [], []
            for aid, mt, b in zip(
                pdf["asset_id"], pdf["media_type"], pdf["content"]
            ):
                if not mt.startswith("video/") or b is None:
                    continue
                n_frames = max(len(b) // frame_bytes, 1)
                for i in range(0, n_frames, every_n):
                    out_ids.append(aid)
                    out_idx.append(i)
                    out_frames.append(
                        bytes(b[i * frame_bytes : (i + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame": out_frames,
                }
            )

    return assets.mapInPandas(gen, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField(
            "features", T.ArrayType(T.FloatType(), False), True
        ),
    ]
)


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Per-asset feature vector via ``mapInPandas`` (the embedding-model
    stage of a multimodal pipeline).

    Stub features are a deterministic byte-histogram projection (numpy,
    one pass per batch) standing in for a model forward pass; the
    contract — fixed-dim float vector per asset, Arrow-batched, no
    driver collect — is the real one.
    """
    real_decode = REAL_DECODE
    n_dim = dim

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "feature models not available in container"
                )
            feats = []
            for b in pdf["content"]:
                if b is None:
                    feats.append(None)
                    continue
                a = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(a % n_dim, minlength=n_dim).astype(
                    np.float64
                )
                norm = np.linalg.norm(hist)
                feats.append(
                    (hist / norm if norm else hist).astype(np.float32)
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return assets.mapInPandas(gen, schema=FEATURE_SCHEMA)

"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image_stub`` produces deterministic fake
features so the Spark-side plumbing — schema, batch shape, partition
sizing — is real and tested. Swap ``_decode_one`` for a PIL/ffmpeg
call in production; nothing else changes.

Scale notes: binary payloads ride the Arrow channel in bounded
batches (`spark.sql.execution.arrow.maxRecordsPerBatch`); keep
payloads out of shuffles by extracting features FIRST, then dropping
the binary column before any wide transformation. Store media
inline-or-pointer: payloads < ~1 MB inline as BINARY; larger assets
as object-store URIs with a loader inside the UDF.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),      # inline bytes or empty
    T.StructField("uri", T.StringType()),          # pointer when payload empty
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha", T.StringType()),
    T.StructField("histogram", T.ArrayType(T.FloatType())),
])


def _decode_one(payload: bytes) -> dict:
    """STUB decoder — deterministic fake features from the bytes.

    Production: replace with PIL.Image.open(io.BytesIO(payload));
    raise NotImplementedError behavior is emulated for non-bytes.
    """
    import hashlib

    if payload is None:
        payload = b""
    digest = hashlib.sha256(payload).hexdigest()
    h = int(digest[:8], 16)
    return {
        "width": 1 + h % 4096,
        "height": 1 + (h >> 12) % 4096,
        "n_bytes": len(payload),
        "sha": digest,
        "histogram": [((h >> (i * 2)) % 256) / 255.0 for i in range(16)],
    }


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA frames.

    Arrow-batched: each pandas batch holds maxRecordsPerBatch rows;
    the UDF touches only (media_id, payload) — select them before
    calling so the binary column is the ONLY heavy thing in flight.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = [_decode_one(p) for p in pdf["payload"]]
            out = pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "n_bytes": [f["n_bytes"] for f in feats],
                "sha": [f["sha"] for f in feats],
                "histogram": [f["histogram"] for f in feats],
            })
            yield out

    return df.select("media_id", "payload").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payload through the Arrow channel and
    re-emits it with updated meta. Decode/resize itself is stubbed —
    payload returned unchanged, meta records the request."""
    return df.withColumn(
        "meta",
        F.map_concat(
            F.coalesce(F.col("meta"), F.expr("map()")),
            F.create_map(
                F.lit("resize_requested"), F.lit(f"{width}x{height}")
            ),
        ),
    )


def frame_sample_plan(df: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: expands per-video rows into frame
    tasks (timestamps) without decoding. duration comes from meta;
    the decode itself is the stubbed UDF step."""
    duration = F.coalesce(
        (F.element_at(F.col("meta"), "duration_s")).try_cast("int"), F.lit(0)
    )
    ts = F.sequence(F.lit(0), duration, F.lit(every_n_seconds))
    return df.select(
        "media_id", F.explode(ts).alias("frame_ts")
    )

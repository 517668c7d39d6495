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


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha", T.StringType()),
    T.StructField("est_duration_s", T.DoubleType()),
    T.StructField("rms", T.ArrayType(T.FloatType())),   # per-window
])


def extract_audio_features(df: DataFrame,
                           window_s: float = 1.0) -> DataFrame:
    """Audio feature extraction over MEDIA_SCHEMA frames: byte-level
    invariants are real (length, sha256); decode/rms is STUBBED
    deterministically (no audio libs in this container — swap the
    inner function for soundfile/librosa; the Arrow plumbing, schema
    and batch shape stay).

    est_duration assumes 16 kHz 16-bit mono (the common ASR landing
    format); rms windows are derived from the digest so downstream
    windowing logic is testable."""
    import hashlib

    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                digest = hashlib.sha256(payload).hexdigest()
                dur = len(payload) / (16000 * 2)
                n_win = max(1, int(dur / window_s)) if payload else 0
                h = int(digest[:8], 16) if payload else 0
                rows.append({
                    "media_id": mid,
                    "n_bytes": len(payload),
                    "sha": digest,
                    "est_duration_s": dur,
                    "rms": [((h >> (i % 24)) % 1000) / 1000.0
                            for i in range(n_win)],
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_bytes", "sha", "est_duration_s", "rms"])

    return df.select("media_id", "payload").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA)


def audio_window_plan(df: DataFrame, window_s: int = 30,
                      overlap_s: int = 5) -> DataFrame:
    """ASR chunking plan: expand each audio row into overlapping
    [start, end) windows from metadata duration — sequence+explode,
    no decode (the decode happens per-window in the stubbed UDF
    stage). Same shape as frame_sample_plan for video."""
    duration = F.coalesce(
        F.element_at(F.col("meta"), "duration_s").try_cast("int"),
        F.lit(0))
    step = window_s - overlap_s
    starts = F.sequence(F.lit(0), F.greatest(duration - 1, F.lit(0)),
                        F.lit(step))
    return df.select(
        "media_id",
        F.explode(starts).alias("win_start"),
    ).withColumn("win_end", F.col("win_start") + window_s)

"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched mapInPandas.

Decode is ENGINE-DISPATCHED (the imczmq import-if-available pattern,
streaming/bridges.py):

- image: ``pil`` (full decode + real histogram, used automatically
  when PIL imports) → ``headers`` (pure-stdlib PNG/GIF/BMP/JPEG
  dimension parse — REAL width/height, no external lib) → ``stub``
  (deterministic fake features) for bytes nothing recognizes;
- audio: ``soundfile`` (when importable) → ``wave`` (stdlib 16-bit
  PCM WAV decode — REAL duration and per-window RMS) → ``stub``.

Byte-level invariants (n_bytes, sha256) are engine-independent, which
is what the oracle-checked query pins; dimension/duration realism is
unit-tested against golden bytes generated with struct/zlib/wave.

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


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Pure-stdlib image dimension parse: PNG IHDR, GIF logical
    screen, BMP BITMAPINFOHEADER, JPEG SOF segment scan. Returns
    (format, width, height) or None when unrecognized."""
    import struct

    b = payload or b""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", w, abs(h))
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            if (0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)):
                h = int.from_bytes(b[i + 5:i + 7], "big")
                w = int.from_bytes(b[i + 7:i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seglen
    return None


def _image_engine() -> str:
    try:
        import PIL.Image  # noqa: F401
        return "pil"
    except ImportError:
        return "headers"


def _stub_image_features(payload: bytes, digest: str) -> dict:
    """Deterministic fake features for unrecognized bytes (the
    original stub, retained as the fallback tier)."""
    h = int(digest[:8], 16)
    return {
        "width": 1 + h % 4096,
        "height": 1 + (h >> 12) % 4096,
        "histogram": [((h >> (i * 2)) % 256) / 255.0
                      for i in range(16)],
    }


def _decode_one(payload: bytes, engine: str = "stub") -> dict:
    """Decode one image payload at the best tier ``engine`` allows:
    pil → real decode + 16-bin grayscale histogram; headers → real
    dimensions, stub histogram; stub → deterministic fakes. Bytes a
    tier can't handle fall through to the next, so a mixed corpus
    (some PNG, some junk) never errors the batch."""
    import hashlib

    if payload is None:
        payload = b""
    digest = hashlib.sha256(payload).hexdigest()
    feats = None
    if engine == "pil":
        try:
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                w, hh = img.width, img.height
                hist = img.convert("L").histogram()   # 256 bins
            total = sum(hist) or 1
            feats = {
                "width": w,
                "height": hh,
                "histogram": [sum(hist[i * 16:(i + 1) * 16]) / total
                              for i in range(16)],
            }
        except Exception:
            feats = None
    if feats is None and engine in ("pil", "headers"):
        parsed = parse_image_header(payload)
        if parsed is not None:
            _, w, h = parsed
            feats = {"width": w, "height": h,
                     "histogram":
                         _stub_image_features(payload, digest)
                         ["histogram"]}
    if feats is None:
        feats = _stub_image_features(payload, digest)
    feats["n_bytes"] = len(payload)
    feats["sha"] = digest
    return feats


def extract_image_features(df: DataFrame,
                           engine: str | None = None) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA frames.

    ``engine``: ``"pil"`` / ``"headers"`` / ``"stub"``; default
    auto-selects pil when importable, else headers. The engine NAME
    crosses the pickle boundary; imports resolve inside the UDF.

    Arrow-batched: each pandas batch holds maxRecordsPerBatch rows;
    the UDF touches only (media_id, payload) — select them before
    calling so the binary column is the ONLY heavy thing in flight.
    """
    import pandas as pd

    if engine is None:
        engine = _image_engine()
    if engine not in ("pil", "headers", "stub"):
        raise ValueError(f"unknown image engine {engine!r}")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = [_decode_one(p, engine) for p in pdf["payload"]]
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


def decode_wav(payload: bytes, window_s: float = 1.0) -> dict | None:
    """Pure-stdlib 16-bit PCM WAV decode: real duration (frames /
    rate) and real per-window RMS (first channel), normalized to
    [0, 1]. Returns None for anything the ``wave`` module can't read
    (or non-16-bit PCM) so the caller falls through to the stub."""
    import array
    import io
    import math
    import wave

    try:
        with wave.open(io.BytesIO(payload or b"")) as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            sampwidth = w.getsampwidth()
            nframes = w.getnframes()
            data = w.readframes(nframes)
    except Exception:
        return None
    if sampwidth != 2 or rate <= 0 or nch <= 0:
        return None
    samples = array.array("h")
    samples.frombytes(data[:len(data) // 2 * 2])
    if nch > 1:
        samples = samples[::nch]
    win = max(1, int(rate * window_s))
    rms = []
    for off in range(0, len(samples), win):
        chunk = samples[off:off + win]
        rms.append(math.sqrt(sum(s * s for s in chunk) / len(chunk))
                   / 32768.0)
    return {"est_duration_s": nframes / rate, "rms": rms}


def _audio_engine() -> str:
    try:
        import soundfile  # noqa: F401
        return "soundfile"
    except ImportError:
        return "wave"


def _decode_audio_one(payload: bytes, engine: str,
                      window_s: float) -> dict:
    import hashlib
    import math

    payload = payload or b""
    digest = hashlib.sha256(payload).hexdigest()
    feats = None
    if engine == "soundfile":
        try:
            import io

            import soundfile as sf

            data, rate = sf.read(io.BytesIO(payload))
            if data.ndim > 1:
                data = data[:, 0]
            win = max(1, int(rate * window_s))
            feats = {
                "est_duration_s": len(data) / rate,
                "rms": [math.sqrt(float((data[o:o + win] ** 2).mean()))
                        for o in range(0, len(data), win)],
            }
        except Exception:
            feats = None
    if feats is None and engine in ("soundfile", "wave"):
        feats = decode_wav(payload, window_s)
    if feats is None:
        # stub tier: deterministic estimate assuming 16 kHz 16-bit
        # mono (the common ASR landing format)
        dur = len(payload) / (16000 * 2)
        n_win = max(1, int(dur / window_s)) if payload else 0
        h = int(digest[:8], 16) if payload else 0
        feats = {
            "est_duration_s": dur,
            "rms": [((h >> (i % 24)) % 1000) / 1000.0
                    for i in range(n_win)],
        }
    feats["n_bytes"] = len(payload)
    feats["sha"] = digest
    return feats


def extract_audio_features(df: DataFrame, window_s: float = 1.0,
                           engine: str | None = None) -> DataFrame:
    """Audio feature extraction over MEDIA_SCHEMA frames. Byte-level
    invariants (length, sha256) are engine-independent; duration/RMS
    decode at the best available tier: soundfile (when importable) →
    stdlib ``wave`` (REAL 16-bit PCM WAV decode) → deterministic
    stub for unrecognized bytes."""
    import pandas as pd

    if engine is None:
        engine = _audio_engine()
    if engine not in ("soundfile", "wave", "stub"):
        raise ValueError(f"unknown audio engine {engine!r}")

    def batches(it):
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                f = _decode_audio_one(payload, engine, window_s)
                rows.append({
                    "media_id": mid,
                    "n_bytes": f["n_bytes"],
                    "sha": f["sha"],
                    "est_duration_s": f["est_duration_s"],
                    "rms": f["rms"],
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

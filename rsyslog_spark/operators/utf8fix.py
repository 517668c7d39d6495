"""mmutf8fix raw-byte path (ref: plugins/mmutf8fix/mmutf8fix.c).

The engine's string columns are post-UTF-8-decode, where invalid wire
bytes have already collapsed into U+FFFD — byte counts are lost and
the reference's byte-per-byte replacement semantics can't be
reproduced (r6 documented divergence). This module operates BEFORE
the decode, on ``binary`` columns, with the reference's exact
algorithms:

- ``fix_utf8``     — doUTF8 / doUTF8Seq (mmutf8fix.c:312-383,403-477):
  structural UTF-8 validation (lead-byte dispatch, continuation
  check, overlong / surrogate / >U+10FFFF codepoints), replacing each
  byte accepted into a failed sequence and reprocessing the byte that
  broke it; truncated sequences at end-of-input replace the accepted
  prefix.
- ``fix_cc``       — doCC / doCCSeq (mmutf8fix.c:215-223,270-301):
  every byte < 32 or > 126 replaced.

Both take a ``bytes`` replacement (len 1 = replacementChar, len > 1 =
replacementSequence — the Seq variants are the same algorithm with a
longer append, verified identical in the C source).

Spark plumbing: ``read_raw_lines`` reads files as binary and splits
records at LF *at the byte level* (no decode), ``mmutf8fix_raw``
applies a fix over an Arrow-batched pandas UDF on the binary column,
and ``decode_utf8`` converts the now-guaranteed-valid bytes into a
string column for the normal parse chain. At 100 TB this is a
mapInPandas-shaped scan stage: no shuffle, batch-vectorized transfer,
the fix is O(bytes) per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fix_utf8(data: bytes, repl: bytes = b" ") -> bytes:
    """Reference doUTF8/doUTF8Seq, byte-exact (mmutf8fix.c:403-477).

    Verified against tests/mmutf8fix_no_error.sh's EXPECTED block
    byte-for-byte (all 32 lines, every overlong / stray-continuation
    / truncation / surrogate case).
    """
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c & 0x80 == 0:                       # US-ASCII
            out.append(c)
            i += 1
            continue
        if c & 0xE0 == 0xC0:
            seq, cp = 2, c & 0x1F
        elif c & 0xF0 == 0xE0:
            seq, cp = 3, c & 0x0F
        elif c & 0xF8 == 0xF0:
            seq, cp = 4, c & 0x07
        else:
            # stray continuation byte or RFC3629-forbidden 5/6-byte
            # lead: one replacement, move on
            out += repl
            i += 1
            continue
        j = 1
        while j < seq and i + j < n and (data[i + j] & 0xC0) == 0x80:
            cp = (cp << 6) | (data[i + j] & 0x3F)
            j += 1
        if j < seq:
            # broken mid-sequence (bad continuation or end of input):
            # replace the accepted bytes, reprocess the breaker
            out += repl * j
            i += j
        elif ((seq == 2 and cp < 0x80)
              or (seq == 3 and cp < 0x800)
              or (seq == 4 and cp < 0x10000)
              or (0xD800 <= cp <= 0xDFFF)
              or cp > 0x10FFFF):
            out += repl * seq                   # overlong / invalid cp
            i += seq
        else:
            out += data[i:i + seq]
            i += seq
    return bytes(out)


def fix_cc(data: bytes, repl: bytes = b" ") -> bytes:
    """Reference doCC/doCCSeq (mmutf8fix.c:215-223): every byte < 32
    or > 126 replaced — mode="controlcharacters"."""
    out = bytearray()
    for b in data:
        if b < 32 or b > 126:
            out += repl
        else:
            out.append(b)
    return bytes(out)


def read_raw_lines(spark: SparkSession, path: str,
                   glob: str | None = None) -> DataFrame:
    """Read files under ``path`` as BINARY and split records at LF at
    the byte level — no UTF-8 decode, so invalid wire bytes survive
    intact in the ``raw`` column (plus ``srcfile``/``line_no`` for
    ordering). The raw-byte twin of the imfile reader for byte-level
    operators (mmutf8fix modes; ref tests feed raw bytes via
    ``tcpflood -I file``)."""
    import pandas as pd

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")

    def split(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data.endswith(b"\n"):
                    data = data[:-1]
                for no, ln in enumerate(data.split(b"\n"), start=1):
                    rows.append((p, no, ln))
            yield pd.DataFrame(rows,
                               columns=["srcfile", "line_no", "raw"])

    return files.mapInPandas(
        split, "srcfile string, line_no long, raw binary")


def mmutf8fix_raw(df: DataFrame, col: str = "raw", *,
                  mode: str = "utf-8",
                  replacement: bytes = b" ") -> DataFrame:
    """Apply the byte-level fix to a binary column (Arrow-batched;
    ref doAction applies the same fix to MSG/TAG/SD buffers).
    ``mode``: "utf-8" (default) or "controlcharacters";
    ``replacement``: 1 byte = replacementChar, longer =
    replacementSequence (mutually exclusive in the reference config,
    one argument here)."""
    from pyspark.sql.functions import pandas_udf

    if mode not in ("utf-8", "controlcharacters"):
        raise ValueError(f"mmutf8fix mode {mode!r}")
    fn = fix_utf8 if mode == "utf-8" else fix_cc

    def _series(s):
        return s.map(lambda b: None if b is None
                     else fn(bytes(b), replacement))

    import pandas as pd
    _series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(_series, "binary")
    return df.withColumn(col, udf(F.col(col)))


def decode_utf8(df: DataFrame, col: str = "raw",
                out: str = "line") -> DataFrame:
    """Binary → string decode AFTER the fix: ``fix_utf8`` output is
    structurally valid UTF-8 (every invalid sequence replaced), so
    the cast is lossless and the frame can enter the normal parse
    chain."""
    return df.withColumn(out, F.col(col).cast("string"))

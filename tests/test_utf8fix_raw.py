"""mmutf8fix raw-byte goldens — byte-exact against the reference's
EXPECTED blocks (tests/mmutf8fix_no_error.sh, mmutf8fix_sd.sh,
mmutf8fix_replacement_sequence.sh). The .sh files contain the raw
invalid bytes verbatim; both the payload lines and the expected
output are mined from them as BYTES, never decoded, so the compare is
the same `cmp` the reference runs.

These flip the r6 "documented divergence" (post-decode U+FFFD loses
byte counts) to byte-exact: the fix runs on binary columns BEFORE any
UTF-8 decode (operators/utf8fix.py).
"""

from __future__ import annotations

import re

REF = "/root/reference/tests"


def _mine_no_error():
    """Payload/expected byte pairs from mmutf8fix_no_error.sh: the
    tcpflood -M block carries `<129>... tag:<payload>` lines, the
    echo block the fixed payloads (replacementChar="?")."""
    sh = open(f"{REF}/mmutf8fix_no_error.sh", "rb").read()
    m = re.search(rb'tcpflood -m1 -M "\\"(.*?)\\""', sh, re.S)
    payloads = []
    for ln in m.group(1).split(b"\n"):
        _, _, tail = ln.partition(b"tag:")
        payloads.append(tail)
    m = re.search(rb"echo '(.*?)' > ", sh, re.S)
    expected = m.group(1).split(b"\n")
    assert len(payloads) == len(expected) and len(payloads) > 30
    return list(zip(payloads, expected))


def test_no_error_golden_byte_exact():
    """Every line of mmutf8fix_no_error.sh's EXPECTED block, compared
    as bytes (32 cases: valid 1-4 byte sequences kept; overlongs,
    surrogate-range, bad/truncated continuations each replaced
    byte-per-accepted-byte)."""
    from rsyslog_spark.operators.utf8fix import fix_utf8

    for payload, want in _mine_no_error():
        assert fix_utf8(payload, b"?") == want, payload


def test_sd_value_bytes():
    """mmutf8fix_sd.sh tests 2-3: stray Latin-1 bytes (0xa0 NBSP,
    0xed) inside SD values → one '?' each; valid multibyte kept."""
    from rsyslog_spark.operators.utf8fix import fix_utf8

    assert fix_utf8(b"Brain\xa0Twist", b"?") == b"Brain?Twist"
    assert fix_utf8(b"Galer\xeda", b"?") == b"Galer?a"
    assert fix_utf8("España".encode(), b"?") == "España".encode()


def test_replacement_sequence_raw():
    """mmutf8fix_replacement_sequence.sh: a multi-byte replacement
    appends once per invalid byte position (doUTF8Seq
    appendReplacements), and control-character mode replaces every
    non-printable byte."""
    from rsyslog_spark.operators.utf8fix import fix_cc, fix_utf8

    # 0xC0 0x80 = overlong 2-byte → two sequence copies
    assert fix_utf8(b"a\xc0\x80b", b"<?>") == b"a<?><?>b"
    # stray continuation → one copy
    assert fix_utf8(b"x\x80y", b"[inv]") == b"x[inv]y"
    # controlcharacters mode: TAB/ESC and >126 bytes replaced
    assert fix_cc(b"a\tb\x1bc\xffd", b"?") == b"a?b?c?d"
    assert fix_cc(b"ok 123", b"?") == b"ok 123"


def test_cc_mode_matches_reference_range():
    """doCC replaces bytes <32 or >126 — boundary bytes 31/32 and
    126/127 (mmutf8fix.c:218)."""
    from rsyslog_spark.operators.utf8fix import fix_cc

    assert fix_cc(bytes([31, 32, 126, 127]), b"?") == b"? ~?"


def test_spark_raw_pipeline_byte_exact(spark, tmp_path):
    """Spark plumbing e2e: raw file (invalid bytes) → binary line
    split → mmutf8fix_raw → bytes collected match the reference's
    EXPECTED block; decode_utf8 then yields clean strings for the
    parse chain."""
    from rsyslog_spark.operators.utf8fix import (
        decode_utf8, mmutf8fix_raw, read_raw_lines)

    pairs = _mine_no_error()
    feed = tmp_path / "raw.log"
    feed.write_bytes(b"\n".join(p for p, _ in pairs) + b"\n")
    df = read_raw_lines(spark, str(tmp_path), glob="raw.log")
    fixed = mmutf8fix_raw(df, "raw", mode="utf-8", replacement=b"?")
    got = [bytes(r["raw"]) for r in
           fixed.orderBy("line_no").collect()]
    assert got == [w for _, w in pairs]
    # post-fix decode is lossless (structurally valid UTF-8)
    lines = [r["line"] for r in
             decode_utf8(fixed).orderBy("line_no").collect()]
    assert lines == [w.decode("utf-8") for _, w in pairs]


def test_spark_cc_mode(spark, tmp_path):
    from rsyslog_spark.operators.utf8fix import (mmutf8fix_raw,
                                                 read_raw_lines)

    feed = tmp_path / "cc.log"
    feed.write_bytes(b"a\tb\n\x01x\xfe\n")
    df = read_raw_lines(spark, str(tmp_path), glob="cc.log")
    fixed = mmutf8fix_raw(df, "raw", mode="controlcharacters",
                          replacement=b"*")
    got = [bytes(r["raw"]) for r in fixed.orderBy("line_no").collect()]
    assert got == [b"a*b", b"*x*"]

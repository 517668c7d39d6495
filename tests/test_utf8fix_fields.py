"""mmutf8fix over TAG and structured data (round-8 verdict item 2).

The reference fixes MSG + TAG + SD in every mode (mmutf8fix.c
doAction :487-557). The engine's raw-byte stage runs BEFORE the
decode/parse (operators/utf8fix.py read_raw_lines → mmutf8fix_raw →
decode_utf8), which fixes the same byte ranges the reference touches
— the headers in these goldens are ASCII, so fixing the whole line
pre-parse is byte-identical to the reference's post-parse per-field
fix. Expected outputs are the reference tests' expect blocks,
compared as BYTES.
"""
import re

import pytest

from rsyslog_spark.config.runtime import run_config_batch
from rsyslog_spark.operators.utf8fix import (
    decode_utf8, fix_utf8, mmutf8fix_raw, read_raw_lines)

REF = "/root/reference/tests"


def _fixed_lines(spark, tmp_path, payloads: list[bytes],
                 repl: bytes = b"?") -> list[bytes]:
    raw = tmp_path / "wire.log"
    raw.write_bytes(b"".join(p + b"\n" for p in payloads))
    df = read_raw_lines(spark, str(tmp_path), glob="wire.log")
    fixed = mmutf8fix_raw(df, "raw", mode="utf-8", replacement=repl)
    return [r["raw"] for r in
            sorted(fixed.collect(), key=lambda r: bytes(r["raw"]))]


def test_mmutf8fix_tag_golden(spark, tmp_path):
    """mmutf8fix_tag.sh byte-exact: valid multi-byte tags (Å + C1
    controls, À + U+0080) pass through unchanged; a tag of stray
    Latin-1/truncated sequences becomes one '?' per invalid byte —
    then pmrfc3164 force.tagEndingByColon extracts the fixed tag and
    '-%syslogtag%-%msg%-' renders the reference's expect block."""
    sh = open(f"{REF}/mmutf8fix_tag.sh", "rb").read()
    msgs = [m.group(1) for m in re.finditer(
        rb'tcpflood -m1 -M "\\"(.*?)\\""', sh)]
    broken = bytes.fromhex("A0AA44E45EC47B289368")
    payloads = [msgs[0], msgs[1],
                msgs[2].replace(b"${broken_utf}", broken)]
    assert len(payloads) == 3

    # raw-byte fix, then the normal parse chain over the clean text
    raw = tmp_path / "wire.log"
    raw.write_bytes(b"".join(p + b"\n" for p in payloads))
    df = read_raw_lines(spark, str(tmp_path), glob="wire.log")
    fixed = mmutf8fix_raw(df, "raw", mode="utf-8", replacement=b"?")
    clean = tmp_path / "clean.log"
    clean.write_bytes(b"".join(
        bytes(r["raw"]) + b"\n" for r in fixed.collect()))

    run_config_batch(spark, f'''
parser(name="custom.rfc3164" type="pmrfc3164"
       force.tagEndingByColon="on")
template(name="outfmt" type="string" string="-%syslogtag%-%msg%-\\n")
ruleset(name="m" parser="custom.rfc3164") {{
  action(type="omfile" file="{tmp_path}/out" template="outfmt")
}}
input(type="imfile" file="{clean}" ruleset="m")
''')
    import os
    got = b"".join(
        open(f"{tmp_path}/out/{p}", "rb").read()
        for p in sorted(os.listdir(f"{tmp_path}/out"))
        if p.startswith("part"))
    want = (b"-\xC3\x85\xC2\x99\xC2\x83:--\n"
            b"-\xC3\x80\xC2\x80:--\n"
            b"-??D?^?{(?h:--\n")
    assert sorted(got.splitlines()) == sorted(want.splitlines()), got


def test_mmutf8fix_sd_golden(spark, tmp_path):
    """mmutf8fix_sd.sh byte-exact: stray Latin-1 bytes inside SD
    param values are replaced BEFORE mmpstrucdata parses the tree, so
    $!rfc5424-sd!test@32473!{clean,dirty} render the reference's five
    expect lines (valid ASCII/multibyte preserved, 0xa0/0xed → '?',
    no-SD line renders empties)."""
    sh = open(f"{REF}/mmutf8fix_sd.sh", "rb").read()
    payloads = [
        b'<134>1 2024-01-01T00:00:00Z host app 1 - '
        b'[test@32473 clean="hello" dirty="world"] valid msg',
        b'<134>1 2024-01-01T00:00:00Z host app 2 - '
        b'[test@32473 clean="ok" dirty="Brain\xa0Twist"] invalid NBSP',
        b'<134>1 2024-01-01T00:00:00Z host app 3 - '
        b'[test@32473 clean="ok" dirty="Galer\xeda"] invalid latin1',
        '<134>1 2024-01-01T00:00:00Z host app 4 - '
        '[test@32473 clean="ok" dirty="España"] valid multibyte'
        .encode(),
        b'<134>1 2024-01-01T00:00:00Z host app 5 - - no SD at all',
    ]
    raw = tmp_path / "wire.log"
    raw.write_bytes(b"".join(p + b"\n" for p in payloads))
    df = read_raw_lines(spark, str(tmp_path), glob="wire.log")
    fixed = mmutf8fix_raw(df, "raw", mode="utf-8", replacement=b"?")
    clean = tmp_path / "clean.log"
    clean.write_bytes(b"".join(
        bytes(r["raw"]) + b"\n" for r in fixed.collect()))

    run_config_batch(spark, f'''
template(name="outfmt" type="string"
  string="%$!rfc5424-sd!test@32473!clean% | %$!rfc5424-sd!test@32473!dirty% | %msg%\\n")
ruleset(name="m") {{
  action(type="mmpstrucdata")
  action(type="omfile" file="{tmp_path}/out" template="outfmt")
}}
input(type="imfile" file="{clean}" ruleset="m")
''')
    import os
    got = b"".join(
        open(f"{tmp_path}/out/{p}", "rb").read()
        for p in sorted(os.listdir(f"{tmp_path}/out"))
        if p.startswith("part"))
    want_block = re.search(
        rb"echo '(.*?)' > \"\$RSYSLOG_OUT_LOG\.expect\"", sh,
        re.S).group(1) + b"\n"
    assert sorted(got.splitlines()) == \
        sorted(want_block.splitlines()), got


def test_mmutf8fix_replacement_sequence_conflict():
    """mmutf8fix_replacement_sequence_conflict.sh: replacementChar
    and replacementSequence are mutually exclusive — config load
    fails (mmutf8fix.c newActInst param conflict)."""
    sh = open(f"{REF}/mmutf8fix_replacement_sequence_conflict.sh"
              ).read()
    from rsyslog_spark.config.rainerscript import parse_config
    conf = '''
ruleset(name="m") {
  action(type="mmutf8fix" replacementChar="?"
         replacementSequence="<inv>")
  action(type="omfile" file="/tmp/x")
}
'''
    with pytest.raises(ValueError, match="replacement"):
        parse_config(conf)

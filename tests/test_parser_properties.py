"""Property-based parser tests (hypothesis): render arbitrary valid
messages, parse, assert field-level roundtrip invariants — the
generative analog of the reference's tcpflood-driven golden tests
(SURVEY §5)."""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from rsyslog_spark.parsers import parse_syslog

_token = st.text(
    alphabet=st.sampled_from(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._-"),
    min_size=1, max_size=12).filter(lambda s: s != "-")
# "-" alone is the RFC5424 NILVALUE: the parser correctly maps it to
# NULL, so it must never be generated as a literal HOSTNAME/APP-NAME.
_msg_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0, max_size=60)


@st.composite
def rfc5424_case(draw):
    pri = draw(st.integers(0, 191))
    host = draw(_token)
    app = draw(_token)
    proc = draw(st.integers(1, 99999))
    msg = draw(_msg_text)
    line = f"<{pri}>1 2026-08-13T07:00:00.123456Z {host} {app} {proc} ID1 - {msg}"
    return line, pri, host, app, str(proc), msg


# RFC3164 hostnames must be reference-VALID (pmrfc3164.c:402-447:
# last char alphanumeric) — tokens like "." are correctly rejected
# by the hostname validator and fall into the TAG scan instead
_host3164 = _token.filter(lambda s: s[-1].isalnum())


@st.composite
def rfc3164_case(draw):
    pri = draw(st.integers(0, 191))
    host = draw(_host3164)
    prog = draw(st.text(
        alphabet=st.sampled_from(
            "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"),
        min_size=1, max_size=10))
    pid = draw(st.integers(1, 99999))
    msg = draw(_msg_text.filter(lambda s: not s.startswith(" ")))
    line = f"<{pri}>Mar  1 01:02:03 {host} {prog}[{pid}]: {msg}"
    return line, pri, host, prog, str(pid), msg


class TestParserProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(rfc5424_case(), min_size=1, max_size=20))
    def test_rfc5424_roundtrip(self, spark, cases):
        df = spark.createDataFrame([(c[0],) for c in cases], "line string")
        rows = parse_syslog(df).collect()
        for (line, pri, host, app, proc, msg), r in zip(cases, rows):
            assert r["pri"] == pri
            assert r["syslogfacility"] == pri >> 3
            assert r["syslogseverity"] == pri & 7
            assert r["hostname"] == host
            assert r["app_name"] == app
            assert r["procid"] == proc
            assert (r["msg"] or "") == msg
            assert r["protocol_version"] == 1
            assert r["rawmsg"] == line

    @settings(max_examples=30, deadline=None)
    @given(st.lists(rfc3164_case(), min_size=1, max_size=20))
    def test_rfc3164_roundtrip(self, spark, cases):
        df = spark.createDataFrame([(c[0],) for c in cases], "line string")
        rows = parse_syslog(df).collect()
        for (line, pri, host, prog, pid, msg), r in zip(cases, rows):
            assert r["pri"] == pri
            assert r["hostname"] == host
            assert r["programname"] == prog
            assert r["procid"] == pid
            assert (r["msg"] or "") == msg
            assert r["protocol_version"] == 0
            assert r["timereported"] is not None


def test_multiline_reassembly_roundtrip_property(spark):
    """Property: for random message groupings, indented-continuation
    reassembly (readMode 1) reconstructs exactly the messages that
    were flattened into lines (ref: plugins/imfile readMode 1)."""
    import random

    from rsyslog_spark.streaming.sources import reassemble_multiline

    rng = random.Random(42)
    for trial in range(3):
        msgs = []
        for i in range(rng.randint(3, 12)):
            first = f"msg{i} head"
            conts = [f"  cont{i}.{j}" for j in range(rng.randint(0, 4))]
            msgs.append("\n".join([first] + conts))
        lines = [(("f1", n, ln))
                 for n, ln in enumerate(
                     ln for m in msgs for ln in m.split("\n"))]
        df = spark.createDataFrame(
            lines, "srcfile string, line_no long, line string")
        got = [r.line for r in
               reassemble_multiline(df, read_mode=1)
               .orderBy("first_line_no").collect()]
        assert got == msgs, f"trial {trial}"


class TestConfigParserRobustness:
    """cfgtest analog: the config front-end must never hang or raise
    anything but SyntaxError/ValueError on malformed input — and
    SyntaxErrors must carry a line number for the user."""

    @given(st.text(alphabet=st.characters(
        min_codepoint=1, max_codepoint=0x2FF), max_size=400))
    @settings(max_examples=150, deadline=None)
    def test_garbage_never_crashes_parser(self, txt):
        from rsyslog_spark.config.rainerscript import load_config

        try:
            load_config(txt)
        except (SyntaxError, ValueError, KeyError, IndexError):
            pass  # rejected — acceptable; must not hang or segfault

    @given(st.integers(min_value=0, max_value=6))
    @settings(max_examples=7, deadline=None)
    def test_syntax_error_carries_line_number(self, pad):
        from rsyslog_spark.config.rainerscript import load_config

        conf = "\n" * pad + 'if $msg contains then { stop }\n'
        try:
            load_config(conf)
            raise AssertionError("expected SyntaxError")
        except SyntaxError as ex:
            assert "line" in str(ex).lower()


class TestPcapWalkerRobustness:
    """The impcap record walker consumes untrusted binary captures —
    arbitrary bytes must never raise or hang, and truncation
    anywhere must only ever drop trailing records."""

    @given(st.binary(max_size=600))
    @settings(max_examples=300, deadline=None)
    def test_arbitrary_bytes_never_crash(self, buf):
        from rsyslog_spark.streaming.pcap import parse_pcap_records

        rows = list(parse_pcap_records("f", buf))
        assert all(isinstance(r, dict) for r in rows)

    @given(st.integers(min_value=0, max_value=120),
           st.binary(min_size=0, max_size=80))
    @settings(max_examples=150, deadline=None)
    def test_valid_header_with_garbage_packets(self, cut, pkt):
        import struct
        from rsyslog_spark.streaming.pcap import parse_pcap_records

        hdr = (b"\xd4\xc3\xb2\xa1"
               + struct.pack("<HHiIII", 2, 4, 0, 0, 65535, 1))
        rec = struct.pack("<IIII", 1700000000, 0, len(pkt),
                          len(pkt)) + pkt
        buf = (hdr + rec + rec)[:len(hdr) + cut]
        rows = list(parse_pcap_records("f", buf))
        # only whole records parse; truncated trailers are dropped
        assert len(rows) <= 2
        for r in rows:
            assert r["orig_len"] == len(pkt)


class TestTcpFrameWalker:
    """split_tcp_frames must be chunk-boundary invariant: any
    chunking of the same byte stream yields the same messages — the
    walk was rewritten for throughput (indexed, zero-copy) and this
    pins its semantics."""

    @given(
        st.lists(
            st.tuples(
                st.booleans(),     # True = octet-counted framing
                st.binary(min_size=0, max_size=40).map(
                    lambda b: b.replace(b"\n", b".")),
            ),
            min_size=1, max_size=20),
        st.data(),
    )
    @settings(max_examples=200, deadline=None)
    def test_chunking_invariant(self, frames, data):
        from rsyslog_spark.streaming.bridges import split_tcp_frames

        stream = b""
        expected = []
        for octet, msg in frames:
            # an LF-framed payload that LOOKS like an octet count
            # legitimately parses as one (that IS autodetect) — send
            # such payloads octet-counted so expectations are exact
            if not octet and __import__("re").match(
                    rb"^\d{1,9} ", msg):
                octet = True
            if octet:
                stream += str(len(msg)).encode() + b" " + msg
                expected.append(msg)
            else:
                stream += msg + b"\n"
                expected.append(msg)

        # random chunk boundaries
        cuts = sorted(data.draw(st.lists(
            st.integers(0, len(stream)), max_size=8)))
        pieces, prev = [], 0
        for c in cuts + [len(stream)]:
            pieces.append(stream[prev:c])
            prev = c

        got, buf = [], b""
        for p in pieces:
            buf += p
            msgs, buf = split_tcp_frames(buf, 200 * 1024)
            got.extend(msgs)
        msgs, buf = split_tcp_frames(buf, 200 * 1024)
        got.extend(msgs)
        if buf.strip():             # close-time flush, as _conn_loop
            got.append(buf)
        assert got == expected

    @given(st.binary(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_arbitrary_bytes_never_crash_or_stall(self, buf):
        from rsyslog_spark.streaming.bridges import split_tcp_frames

        msgs, rest = split_tcp_frames(buf, 64)
        # everything is either consumed or awaiting more input, and
        # the tail never grows past the input
        assert len(rest) <= len(buf)
        assert all(isinstance(m, bytes) for m in msgs)
        # idempotent on the leftover: no progress without new bytes
        msgs2, rest2 = split_tcp_frames(rest, 64)
        assert msgs2 == [] and rest2 == rest

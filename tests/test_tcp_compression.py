"""TCP stream/single compression (SURVEY §2.1/§2.9): the reference's
imtcp/imptcp ``compression.mode`` (none | stream:always | auto,
driver zlib — imtcp.c:376-411, imptcp.c DataRcvd*) paired with
omfwd's ``compression.mode`` single | stream:always
(tools/omfwd.c:153-157) and the legacy ``@@(zN)`` selector form.

Goldens replayed: imtcp-stream-always-zlib-basic.sh (sequence-complete
omfwd→imtcp loopback), imtcp-stream-always-zlib-z-prefix.sh (a decoded
payload starting 'z' must NOT take the legacy single-message path),
imtcp-stream-always-zlib-corrupt.sh (messages decoded before the
corruption survive, remainder dropped),
imptcp-compression-none-legacy-single.sh ('@@(z5)' legacy
per-message frames inflate on a compression.mode="none" receiver).
"""

import socket
import time
import zlib

from rsyslog_spark.streaming.bridges import imtcp

from test_bridges import _drain


def _frame(payload: bytes) -> bytes:
    return str(len(payload)).encode() + b" " + payload


def _seq_lines(n, tag="msgnum"):
    return [f"<13>Mar  1 10:00:00 h1 tag: {tag}:{i:07d}"
            for i in range(n)]


def test_stream_always_zlib_roundtrip(spark, tmp_path):
    """omfwd compression.mode=stream:always → imtcp stream:always:
    the whole connection is one deflate stream; all messages arrive
    (imtcp-stream-always-zlib-basic.sh seq_check, smaller N)."""
    from pyspark.sql import functions as F
    from rsyslog_spark.streaming.sinks import omfwd_sink

    b = imtcp(str(tmp_path / "spool"),
              compression_mode="stream:always",
              flush_secs=0.2).start()
    try:
        lines = _seq_lines(500)
        df = spark.createDataFrame([(l,) for l in lines],
                                   "line string").coalesce(1)
        omfwd_sink("127.0.0.1", b.port,
                   compression="stream:always")(df, 0)
        got = _drain(b, spark, 500)
        vals = sorted(
            r.line for r in got.select("line").collect())
        assert vals == lines
    finally:
        b.stop()


def test_stream_flushontxend_incremental(spark, tmp_path):
    """compression.stream.flushOnTXEnd=on emits a Z_SYNC_FLUSH per
    transmit, so the receiver decodes without waiting for the stream
    end — observable as rows arriving while the connection stays
    open (imtcp-stream-always-zlib-flushoff.sh contrast)."""
    b = imtcp(str(tmp_path / "spool"),
              compression_mode="stream:always",
              flush_secs=0.2).start()
    try:
        c = zlib.compressobj(6)
        payload = _frame(b"<13>h1 t: one!")
        s = socket.create_connection(("127.0.0.1", b.port))
        s.sendall(c.compress(payload) + c.flush(zlib.Z_SYNC_FLUSH))
        # connection stays OPEN — the sync flush alone must deliver
        got = _drain(b, spark, 1, timeout=10)
        assert got.count() == 1
        s.sendall(c.compress(_frame(b"<13>h1 t: two!")) + c.flush())
        s.close()
        got = _drain(b, spark, 2)
        assert got.count() == 2
    finally:
        b.stop()


def test_stream_decoded_z_prefix_not_legacy(spark, tmp_path):
    """imtcp-stream-always-zlib-z-prefix.sh: stream:always has
    already selected stream decompression — a DECODED message that
    begins with a literal 'z' must be delivered raw, not fed to the
    legacy single-message inflater."""
    b = imtcp(str(tmp_path / "spool"),
              compression_mode="stream:always",
              flush_secs=0.2).start()
    try:
        # craft a z+zlib-looking decoded payload: 'z' + 0x78 ...
        inner = b"z\x78\x9c raw bytes"
        frame = str(len(inner)).encode() + b" " + inner
        c = zlib.compressobj(6)
        s = socket.create_connection(("127.0.0.1", b.port))
        s.sendall(c.compress(frame) + c.flush())
        s.close()
        got = _drain(b, spark, 1)
        rows = got.collect()
        assert len(rows) == 1
        assert rows[0].line.startswith("z")
    finally:
        b.stop()


def test_stream_corrupt_drops_remainder(spark, tmp_path):
    """imtcp-stream-always-zlib-corrupt.sh: bytes decoded before the
    corruption become messages; the corrupt remainder (and anything
    after) is dropped with the session."""
    b = imtcp(str(tmp_path / "spool"),
              compression_mode="stream:always",
              flush_secs=0.2).start()
    try:
        good = _frame(b"<13>h1 t: good!")
        c = zlib.compressobj(6)
        buf = c.compress(good) + c.flush(zlib.Z_SYNC_FLUSH)
        s = socket.create_connection(("127.0.0.1", b.port))
        s.sendall(buf)
        time.sleep(0.5)
        s.sendall(b"\xff\xfe\xfd not zlib at all \x00\x01" * 4)
        s.close()
        got = _drain(b, spark, 1)
        rows = got.collect()
        assert [r.line for r in rows] == ["<13>h1 t: good!"]
    finally:
        b.stop()


def test_auto_detect_compressed_and_plain(spark, tmp_path):
    """compression.mode=auto (imptcp.c compressionAutoDetect): a
    zlib-headed session locks to stream decompression, a plain
    session passes through — both on the same listener."""
    from pyspark.sql import functions as F  # noqa: F401

    b = imtcp(str(tmp_path / "spool"), compression_mode="auto",
              flush_secs=0.2).start()
    try:
        c = zlib.compressobj(6)
        s1 = socket.create_connection(("127.0.0.1", b.port))
        s1.sendall(c.compress(_frame(b"<13>h1 t: compressed")) + c.flush())
        s1.close()
        s2 = socket.create_connection(("127.0.0.1", b.port))
        s2.sendall(_frame(b"<13>h1 t: plain"))
        s2.close()
        got = _drain(b, spark, 2)
        vals = sorted(r.line for r in got.collect())
        assert vals == ["<13>h1 t: compressed", "<13>h1 t: plain"]
    finally:
        b.stop()


def test_legacy_single_message_z_frames(spark, tmp_path):
    """imptcp-compression-none-legacy-single.sh: omfwd single-message
    compression ('z' + zlib per frame) inflates on a
    compression.mode=none receiver — the built-in legacy transport
    handling stays active when no stream decompression runs."""
    from rsyslog_spark.streaming.sinks import omfwd_sink

    b = imtcp(str(tmp_path / "spool"), compression_mode="none",
              flush_secs=0.2).start()
    try:
        lines = _seq_lines(50)
        df = spark.createDataFrame([(l,) for l in lines],
                                   "line string").coalesce(1)
        omfwd_sink("127.0.0.1", b.port, compression="single",
                   compression_level=5)(df, 0)
        got = _drain(b, spark, 50)
        assert sorted(r.line for r in got.collect()) == lines
    finally:
        b.stop()


def test_legacy_selector_z_flags(spark, tmp_path):
    """'@@(o,z5)host:port' legacy selector → omfwd octet-counted +
    single-message zlib level 5 (loadTCPSendOptions flags)."""
    from rsyslog_spark.config.rainerscript import parse_config

    cfg = parse_config("*.* @@(o,z5)127.0.0.1:5140\n")
    import dataclasses

    found = []

    def walk2(o, depth=0):
        if depth > 8:
            return
        p = getattr(o, "params", None)
        if isinstance(p, dict) and p.get("type") == "omfwd":
            found.append(p)
        if dataclasses.is_dataclass(o):
            vals = [getattr(o, f.name)
                    for f in dataclasses.fields(o)]
        elif isinstance(o, (list, tuple)):
            vals = list(o)
        else:
            return
        for v in vals:
            walk2(v, depth + 1)
    for rs in cfg.rulesets.values():
        walk2(rs)
    assert found, cfg.rulesets
    params = found[0]
    assert params["target"] == "127.0.0.1"
    assert params["port"] == "5140"
    assert params["compression.mode"] == "single"
    assert params["compressionlevel"] == "5"
    assert params["tcp_framing"] == "octet-counted"


def test_config_stream_compression_binding(spark, tmp_path):
    """input(type=imtcp compression.mode=... ) + action omfwd
    compression params flow end-to-end through run_config_stream."""
    import threading
    from rsyslog_spark.config.runtime import run_config_stream

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    out = tmp_path / "out"
    conf = f'''
    input(type="imtcp" port="{port}" address="127.0.0.1"
          ruleset="main" spool="{tmp_path}/spool"
          compression.mode="stream:always"
          compression.driver="zlib")
    ruleset(name="main") {{
        action(type="omfile" name="sink" file="{out}")
    }}
    '''
    payload = b"<13>Mar  1 10:00:00 h1 app: compressed cfg\n"

    def send_when_up():
        c = zlib.compressobj(6)
        for _ in range(100):
            try:
                s = socket.create_connection(
                    ("127.0.0.1", port), timeout=0.2)
                s.sendall(c.compress(payload) + c.flush())
                s.close()
                return
            except OSError:
                time.sleep(0.1)

    th = threading.Thread(target=send_when_up)
    th.start()
    run_config_stream(spark, conf, checkpoint=str(tmp_path / "ck"),
                      drain_grace=3.0)
    th.join(timeout=10)
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 1 and rows[0]["msg"] == "compressed cfg"


def test_zstd_driver_roundtrip_injected_codec(spark, tmp_path):
    """compression.driver='zstd' (imtcp.c:376-411; omfwd.c
    compression.driver): with a codec injected, omfwd stream:always
    zstd → imtcp stream:always zstd round-trips; without one, both
    sides keep the config-time error (un-built libzstd analog)."""
    import pytest

    from rsyslog_spark.streaming import zstdcodec
    from rsyslog_spark.streaming.bridges import imtcp
    from rsyslog_spark.streaming.sinks import omfwd_sink

    # codec absent → config-time errors on both sides
    assert zstdcodec.get_codec() is None
    with pytest.raises(ValueError, match="zstd codec"):
        imtcp(str(tmp_path / "s0"), compression_mode="stream:always",
              compression_driver="zstd")
    with pytest.raises(ValueError, match="zstd codec"):
        omfwd_sink("127.0.0.1", 5140, compression="stream:always",
                   compression_driver="zstd")

    zstdcodec.set_codec(zstdcodec.ZlibBackedZstd)
    try:
        b = imtcp(str(tmp_path / "spool"),
                  compression_mode="stream:always",
                  compression_driver="zstd", flush_secs=0.2).start()
        try:
            lines = _seq_lines(30)
            df = spark.createDataFrame([(l,) for l in lines],
                                       "line string").coalesce(1)
            omfwd_sink("127.0.0.1", b.port,
                       compression="stream:always",
                       compression_driver="zstd",
                       compression_level=3)(df, 0)
            got = _drain(b, spark, 30)
            assert sorted(r.line for r in got.collect()) == lines
        finally:
            b.stop()
    finally:
        zstdcodec.set_codec(None)


def test_zstd_driver_roundtrip_real_lib(spark, tmp_path):
    """Same round trip against the real zstandard package when the
    environment has it (skip-if-unavailable, like the reference's
    libzstd-gated tests)."""
    import pytest

    pytest.importorskip("zstandard")
    from rsyslog_spark.streaming.bridges import imtcp
    from rsyslog_spark.streaming.sinks import omfwd_sink

    b = imtcp(str(tmp_path / "spool"),
              compression_mode="stream:always",
              compression_driver="zstd", flush_secs=0.2).start()
    try:
        lines = _seq_lines(30)
        df = spark.createDataFrame([(l,) for l in lines],
                                   "line string").coalesce(1)
        omfwd_sink("127.0.0.1", b.port, compression="stream:always",
                   compression_driver="zstd")(df, 0)
        got = _drain(b, spark, 30)
        assert sorted(r.line for r in got.collect()) == lines
    finally:
        b.stop()

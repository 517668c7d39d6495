"""Transport sinks: ommail SMTP dialogue, omsnmp BER traps,
omhiredis RESP, omotel OTLP/JSON, omuxsock datagrams, omstdout,
amqp1 injectable engine (SURVEY §2.9; ref plugins/ommail, omsnmp,
omotel, contrib/omhiredis, omamqp1, plugins/omuxsock, omstdout)."""

import json
import os
import socket
import threading

from pyspark.sql import functions as F

from rsyslog_spark.streaming.transports import (
    SNMP_SYSLOG_MSG_OID,
    SNMP_TRAP_OID,
    amqp1_sink,
    omhiredis_sink,
    ommail_sink,
    omotel_sink,
    omsnmp_sink,
    omstdout_sink,
    omuxsock_sink,
    snmp_trap_pdu,
)


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


# -- BER mini-decoder (test-side only) --------------------------------

def ber_parse(b, off=0):
    tag = b[off]
    ln = b[off + 1]
    off += 2
    if ln & 0x80:
        n = ln & 0x7F
        ln = int.from_bytes(b[off:off + n], "big")
        off += n
    return tag, b[off:off + ln], off + ln


def ber_seq(content):
    out, off = [], 0
    while off < len(content):
        tag, val, off = ber_parse(content, off)
        out.append((tag, val))
    return out


def decode_oid(content):
    arcs = [content[0] // 40, content[0] % 40]
    cur = 0
    for byte in content[1:]:
        cur = (cur << 7) | (byte & 0x7F)
        if not byte & 0x80:
            arcs.append(cur)
            cur = 0
    return ".".join(map(str, arcs))


def test_snmp_v2c_trap_encoding():
    pkt = snmp_trap_pdu("<13>host app: boom", community="secret",
                        uptime_cs=4200, request_id=7)
    tag, body, _ = ber_parse(pkt)
    assert tag == 0x30
    (vtag, ver), (ctag, comm), (ptag, pdu) = ber_seq(body)
    assert (vtag, ver) == (0x02, b"\x01")          # version 2c = 1
    assert (ctag, comm) == (0x04, b"secret")
    assert ptag == 0xA7                             # SNMPv2-Trap
    reqid, errst, erridx, (_, vbs) = ber_seq(pdu)
    assert reqid == (0x02, b"\x07")
    vb = ber_seq(vbs)
    assert len(vb) == 3
    # sysUpTime.0 TimeTicks
    up_oid, up_val = ber_seq(vb[0][1])
    assert decode_oid(up_oid[1]) == "1.3.6.1.2.1.1.3.0"
    assert up_val[0] == 0x43
    assert int.from_bytes(up_val[1], "big") == 4200
    # snmpTrapOID.0 → adiscon syslogtrap
    tr_oid, tr_val = ber_seq(vb[1][1])
    assert decode_oid(tr_oid[1]) == "1.3.6.1.6.3.1.1.4.1.0"
    assert decode_oid(tr_val[1]) == SNMP_TRAP_OID
    # message varbind
    msg_oid, msg_val = ber_seq(vb[2][1])
    assert decode_oid(msg_oid[1]) == SNMP_SYSLOG_MSG_OID
    assert msg_val == (0x04, b"<13>host app: boom")


def test_snmp_v1_trap_encoding():
    pkt = snmp_trap_pdu("m", version="snmpv1", agent_addr="10.1.2.3")
    _, body, _ = ber_parse(pkt)
    (_, ver), _, (ptag, pdu) = ber_seq(body)
    assert ver == b"\x00" and ptag == 0xA4
    ent, addr, generic, specific, ts, _vbs = ber_seq(pdu)
    assert decode_oid(ent[1]) == "1.3.6.1.4.1.3.1.1"
    assert addr == (0x40, bytes([10, 1, 2, 3]))
    assert generic == (0x02, b"\x06")               # enterpriseSpecific


def test_omsnmp_sink_sends_udp(spark):
    import time as _time

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(0.5)
    port = rx.getsockname()[1]
    got = []

    def recv():
        # deadline-loop instead of one long timeout: a cold Spark
        # session's first job can take >10s, which used to expire
        # the receive window before the first datagram left
        deadline = _time.time() + 60
        while len(got) < 2 and _time.time() < deadline:
            try:
                got.append(rx.recvfrom(65535)[0])
            except socket.timeout:
                continue
            except OSError:
                return

    t = threading.Thread(target=recv)
    t.start()
    omsnmp_sink("127.0.0.1", port)(
        _lines_df(spark, ["trap one", "trap two"]).coalesce(1), 0)
    t.join(timeout=30)
    rx.close()
    assert len(got) == 2
    msgs = set()
    for pkt in got:
        _, body, _ = ber_parse(pkt)
        pdu = ber_seq(body)[2][1]
        vbs = ber_seq(ber_seq(pdu)[3][1])
        msgs.add(ber_seq(vbs[2][1])[1][1].decode())
    assert msgs == {"trap one", "trap two"}


def test_ommail_smtp_dialogue(spark):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    mails = []

    def serve():
        conn, _ = srv.accept()
        f = conn.makefile("rwb")

        def reply(code, text="ok"):
            f.write(f"{code} {text}\r\n".encode())
            f.flush()

        reply(220, "mock smtp")
        cur = None
        while True:
            line = f.readline()
            if not line:
                break
            up = line.strip().upper()
            if up.startswith((b"HELO", b"EHLO")):
                reply(250)
            elif up.startswith(b"MAIL FROM"):
                cur = {"from": line.strip().decode(), "rcpt": []}
                reply(250)
            elif up.startswith(b"RCPT TO"):
                cur["rcpt"].append(line.strip().decode())
                reply(250)
            elif up == b"DATA":
                reply(354, "go")
                data = b""
                while not data.endswith(b"\r\n.\r\n"):
                    data += f.readline()
                cur["data"] = data[:-5].decode()
                mails.append(cur)
                reply(250)
            elif up == b"QUIT":
                reply(221)
                break
            else:
                reply(250)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    df = spark.createDataFrame(
        [("disk full on web01", "ALERT web01")],
        "line string, subj string")
    ommail_sink("127.0.0.1", port, mailfrom="rsyslog@host",
                mailto=["ops@example.com", "oncall@example.com"],
                subject_col="subj")(df, 0)
    t.join(timeout=10)
    srv.close()
    assert len(mails) == 1
    m = mails[0]
    assert "rsyslog@host" in m["from"]
    assert len(m["rcpt"]) == 2
    assert "Subject: ALERT web01" in m["data"]
    assert "disk full on web01" in m["data"]


def test_omhiredis_resp_modes(spark):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    captured = []

    def serve():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            data = b""
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                data += chunk
                # one +OK per command (count RESP arrays)
                conn.sendall(b"+OK\r\n" * data.count(b"*"))
                data_done = data
            captured.append(data)
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    df = _lines_df(spark, ["m1", "m2"]).coalesce(1)
    omhiredis_sink("127.0.0.1", port, mode="queue", key="logs")(df, 0)
    omhiredis_sink("127.0.0.1", port, mode="stream", key="st",
                   stream_maxlen=1000)(df, 0)
    omhiredis_sink("127.0.0.1", port, mode="set", key="k",
                   expiration=60, key_col="line")(df, 0)
    srv.close()
    blob = b"".join(captured)
    assert b"*3\r\n$5\r\nLPUSH\r\n$4\r\nlogs\r\n$2\r\nm1\r\n" in blob
    assert b"XADD" in blob and b"MAXLEN" in blob and b"~" in blob
    assert b"SETEX" in blob and b"$2\r\n60\r\n" in blob


def test_omhiredis_auth_and_stream_ack(spark):
    """omhiredis serverpassword (omhiredis.c:307-308: AUTH is the
    connection's first command; a wrong password raises) and the
    stream.ack/stream.del pipeline-acknowledgment pattern
    (omhiredis.c:503-508): after each XADD the SOURCE stream entry is
    XACKed/XDELed using the per-row index column."""
    import pytest

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    captured = []
    fail_auth = [False]

    def serve():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            data = b""
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                data += chunk
                if fail_auth[0]:
                    conn.sendall(b"-ERR invalid password\r\n")
                else:
                    conn.sendall(b"+OK\r\n" * data.count(b"*"))
            captured.append(data)
            conn.close()

    threading.Thread(target=serve, daemon=True).start()
    df = spark.createDataFrame(
        [("m1", "1-1"), ("m2", "1-2")],
        "line string, redis_index string").coalesce(1)
    omhiredis_sink("127.0.0.1", port, mode="stream", key="out",
                   server_password="sekrit", stream_ack=True,
                   stream_del=True, ack_key="in",
                   ack_group="cg1",
                   ack_index_col="redis_index")(df, 0)
    blob = b"".join(captured)
    # AUTH precedes everything
    assert blob.startswith(
        b"*2\r\n$4\r\nAUTH\r\n$6\r\nsekrit\r\n"), blob[:60]
    assert (b"*4\r\n$4\r\nXACK\r\n$2\r\nin\r\n$3\r\ncg1\r\n"
            b"$3\r\n1-1\r\n") in blob
    assert b"XDEL" in blob and b"$3\r\n1-2\r\n" in blob
    # wrong password: the -ERR reply fails the batch
    fail_auth[0] = True
    with pytest.raises(Exception, match="invalid password|ERR"):
        omhiredis_sink("127.0.0.1", port, mode="queue", key="q",
                       server_password="wrong")(df, 0)
    srv.close()
    # param validation
    with pytest.raises(ValueError, match="keyAck"):
        omhiredis_sink("127.0.0.1", port, mode="stream", key="o",
                       stream_ack=True)
    with pytest.raises(ValueError, match="groupAck"):
        omhiredis_sink("127.0.0.1", port, mode="stream", key="o",
                       stream_ack=True, ack_key="in",
                       ack_index_col="redis_index")


def test_omotel_payload_and_post(spark, tmp_path):
    import http.server

    posts = []

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            posts.append((self.path,
                          json.loads(self.rfile.read(n))))
            self.send_response(200)
            self.end_headers()

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    df = spark.createDataFrame(
        [("oom kill", 2, 0, "web01", "kernel", None, None,
          "2026-08-14 01:02:03")],
        "msg string, syslogseverity int, syslogfacility int, "
        "hostname string, programname string, procid string, "
        "msgid string, timereported string").coalesce(1)
    omotel_sink(f"http://127.0.0.1:{httpd.server_address[1]}",
                resource_attrs={"service.name": "syslog"})(df, 0)
    httpd.shutdown()
    assert len(posts) == 1
    path, payload = posts[0]
    assert path == "/v1/logs"
    rl = payload["resourceLogs"][0]
    assert rl["resource"]["attributes"][0]["key"] == "service.name"
    rec = rl["scopeLogs"][0]["logRecords"][0]
    assert rec["body"] == {"stringValue": "oom kill"}
    assert (rec["severityNumber"], rec["severityText"]) == (22, "CRITICAL")
    assert rec["timeUnixNano"].endswith("000")      # ns string
    attrs = {a["key"]: a["value"] for a in rec["attributes"]}
    assert attrs["log.syslog.hostname"] == {"stringValue": "web01"}
    assert attrs["log.syslog.facility"] == {"intValue": "0"}


def _pb_walk(buf: bytes) -> list[tuple[int, int, object]]:
    """Minimal proto3 wire-format reader for the test: returns
    (field, wiretype, value) tuples; length-delimited values come
    back as raw bytes for recursive walking."""
    import struct

    out, i = [], 0

    def varint():
        nonlocal i
        v = s = 0
        while True:
            b = buf[i]
            i += 1
            v |= (b & 0x7F) << s
            if not b & 0x80:
                return v
            s += 7

    while i < len(buf):
        key = varint()
        field, wt = key >> 3, key & 7
        if wt == 0:
            out.append((field, wt, varint()))
        elif wt == 1:
            out.append((field, wt,
                        struct.unpack("<Q", buf[i:i + 8])[0]))
            i += 8
        elif wt == 2:
            n = varint()
            out.append((field, wt, buf[i:i + n]))
            i += n
        else:
            raise AssertionError(f"unexpected wiretype {wt}")
    return out


def test_otlp_protobuf_encoding():
    """omotel http/protobuf (ChangeLog 2026-02-26; otlp_protobuf.c
    over the public opentelemetry-proto schema): the hand-rolled
    encoder produces a valid ExportLogsServiceRequest — field
    numbers, wire types, fixed64 timestamps, nested AnyValue/
    KeyValue — verified by walking the wire format."""
    from rsyslog_spark.streaming.transports import otlp_logs_protobuf

    buf = otlp_logs_protobuf(
        [{"body": "oom kill", "severity": 2,
          "time_unix_nano": 1755100000123456789,
          "observed_time_unix_nano": 1755100001000000000,
          "hostname": "web01", "facility": 0}],
        resource_attrs={"service.name": "syslog"})
    # ExportLogsServiceRequest.resource_logs = 1
    (f, wt, rl), = _pb_walk(buf)
    assert (f, wt) == (1, 2)
    rl_fields = _pb_walk(rl)
    resource = next(v for fld, _, v in rl_fields if fld == 1)
    scope_logs = next(v for fld, _, v in rl_fields if fld == 2)
    # Resource.attributes[0] = KeyValue{service.name}
    (rf, _, kv), = _pb_walk(resource)
    assert rf == 1
    kvf = _pb_walk(kv)
    assert next(v for fld, _, v in kvf if fld == 1) == b"service.name"
    anyv = next(v for fld, _, v in kvf if fld == 2)
    assert _pb_walk(anyv) == [(1, 2, b"syslog")]
    # ScopeLogs{scope=1, log_records=2}
    sl = _pb_walk(scope_logs)
    scope = next(v for fld, _, v in sl if fld == 1)
    assert (1, 2, b"rsyslog.omotel") in _pb_walk(scope)
    lr = _pb_walk(next(v for fld, _, v in sl if fld == 2))
    d = {}
    for fld, _, v in lr:
        d.setdefault(fld, []).append(v)
    assert d[1] == [1755100000123456789]        # time fixed64
    assert d[11] == [1755100001000000000]       # observed fixed64
    assert d[2] == [22]                          # CRITICAL
    assert d[3] == [b"CRITICAL"]
    assert _pb_walk(d[5][0]) == [(1, 2, b"oom kill")]
    attrs = {}
    for a in d[6]:
        af = _pb_walk(a)
        k = next(v for fld, _, v in af if fld == 1)
        attrs[k] = _pb_walk(next(v for fld, _, v in af if fld == 2))
    assert attrs[b"log.syslog.hostname"] == [(1, 2, b"web01")]
    assert attrs[b"log.syslog.facility"] == [(3, 0, 0)]


def test_omotel_protobuf_post(spark):
    """protocol='http/protobuf' posts binary OTLP with the protobuf
    content type; the payload decodes back to the same record."""
    import http.server

    posts = []

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            posts.append((self.headers["Content-Type"],
                          self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    df = spark.createDataFrame(
        [("pb line", 6, 0, "web01", None, None, None,
          "2026-08-14 01:02:03")],
        "msg string, syslogseverity int, syslogfacility int, "
        "hostname string, programname string, procid string, "
        "msgid string, timereported string").coalesce(1)
    omotel_sink(f"http://127.0.0.1:{httpd.server_address[1]}",
                protocol="http/protobuf")(df, 0)
    httpd.shutdown()
    (ctype, body), = posts
    assert ctype == "application/x-protobuf"
    (f, wt, _rl), = _pb_walk(body)
    assert (f, wt) == (1, 2)
    assert b"pb line" in body


def test_omuxsock_datagrams(spark, tmp_path):
    sp = str(tmp_path / "out.sock")
    rx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    rx.bind(sp)
    rx.settimeout(10)
    omuxsock_sink(sp)(_lines_df(spark, ["a", "b"]).coalesce(1), 0)
    got = {rx.recv(65535).decode() for _ in range(2)}
    rx.close()
    assert got == {"a", "b"}


def test_omuxsock_abstract_and_stream(spark):
    """omuxsock 2025-12-02 additions: '@name' targets the abstract
    namespace; sock_type='stream' uses one connected SOCK_STREAM
    per partition with LF-delimited records."""
    import os

    import pytest

    if not hasattr(socket, "AF_UNIX"):
        pytest.skip("platform lacks AF_UNIX")
    # abstract DGRAM
    aname = f"@rsyslog-spark-test-{os.getpid()}"
    rx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    try:
        rx.bind("\0" + aname[1:])
    except OSError:
        pytest.skip("abstract unix namespace unavailable")
    rx.settimeout(10)
    omuxsock_sink(aname)(_lines_df(spark, ["abs1", "abs2"])
                         .coalesce(1), 0)
    got = {rx.recv(65535).decode() for _ in range(2)}
    rx.close()
    assert got == {"abs1", "abs2"}
    # connected STREAM with LF records. Deadline LOOPS, not one long
    # settimeout — a cold session's first job can take >10s and a
    # timed-out accept would close the listener mid-send (EPIPE).
    import time as _time

    sname = "\0" + aname[1:] + "-stream"
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sname)
    srv.listen(1)
    srv.settimeout(0.2)
    import threading
    data = bytearray()
    deadline = _time.time() + 60

    def accept_one():
        while _time.time() < deadline:
            try:
                conn, _ = srv.accept()
                break
            except socket.timeout:
                continue
            except OSError:
                return
        else:
            return
        conn.settimeout(0.2)
        while _time.time() < deadline:
            try:
                chunk = conn.recv(65536)
            except socket.timeout:
                continue
            except OSError:
                break
            if not chunk:
                break
            data.extend(chunk)
        conn.close()

    t = threading.Thread(target=accept_one)
    t.start()
    omuxsock_sink("@" + aname[1:] + "-stream", sock_type="stream")(
        _lines_df(spark, ["s1", "s2"]).coalesce(1), 0)
    t.join(timeout=30)
    srv.close()
    assert sorted(bytes(data).decode().splitlines()) == ["s1", "s2"]


def test_omstdout(spark, capsys):
    omstdout_sink()(_lines_df(spark, ["x", "y"]), 0)
    out = capsys.readouterr().out
    assert "x" in out and "y" in out


def test_amqp1_injectable_sender(spark, tmp_path):
    sent_file = str(tmp_path / "sent.txt")

    def factory():
        f = open(sent_file, "ab")

        def send(payload):
            f.write(payload + b"\n")
            f.flush()

        return send, f.close

    amqp1_sink("events-hub", sender_factory=factory)(
        _lines_df(spark, ["e1", "e2"]).coalesce(1), 0)
    with open(sent_file, "rb") as f:
        assert sorted(f.read().split()) == [b"e1", b"e2"]


def test_amqp1_missing_engine_raises(spark):
    try:
        import proton  # noqa: F401
        return  # engine present; default path works
    except ImportError:
        pass
    try:
        amqp1_sink("t")(_lines_df(spark, ["x"]).coalesce(1), 0)
        assert False, "expected RuntimeError"
    except Exception as e:
        assert "qpid-proton" in str(e)


def test_omazuredce_gzip_bearer_post(spark):
    import gzip
    import http.server

    posts = []

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            body = self.rfile.read(n)
            if self.headers.get("Content-Encoding") == "gzip":
                body = gzip.decompress(body)
            posts.append((self.path, self.headers.get("Authorization"),
                          json.loads(body)))
            self.send_response(204)
            self.end_headers()

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    from rsyslog_spark.streaming.transports import omazuredce_sink

    omazuredce_sink(
        f"http://127.0.0.1:{httpd.server_address[1]}",
        "dcr-123", "Custom-Syslog",
        token_provider=lambda: "tok-xyz")(
        _lines_df(spark, ["a1", "a2"]).coalesce(1), 0)
    httpd.shutdown()
    path, auth, body = posts[0]
    assert path == ("/dataCollectionRules/dcr-123/streams/"
                    "Custom-Syslog?api-version=2023-01-01")
    assert auth == "Bearer tok-xyz"
    assert body == [{"RawData": "a1"}, {"RawData": "a2"}]


def test_omhttpfs_append_create_fallback(spark):
    import http.server

    calls = []
    exists = {"f": False}

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _handle(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode()
            calls.append((self.command, self.path, body))
            if "op=append" in self.path and not exists["f"]:
                self.send_response(404)
            else:
                exists["f"] = True
                self.send_response(200)
            self.end_headers()

        do_POST = _handle
        do_PUT = _handle

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    from rsyslog_spark.streaming.transports import omhttpfs_sink

    sink = omhttpfs_sink("127.0.0.1", httpd.server_address[1],
                         "/logs/app.log", user="spark")
    sink(_lines_df(spark, ["h1"]).coalesce(1), 0)   # 404 → create
    sink(_lines_df(spark, ["h2"]).coalesce(1), 1)   # append works
    httpd.shutdown()
    ops = [(c, "append" if "op=append" in p else "create", b)
           for c, p, b in calls]
    assert ops == [("POST", "append", "h1\n"),
                   ("PUT", "create", "h1\n"),
                   ("POST", "append", "h2\n")]
    assert all("user.name=spark" in p for _, p, _b in calls)


def test_omrabbitmq_and_awslogs_injectable(spark, tmp_path):
    from rsyslog_spark.streaming.transports import (
        omawslogs_sink, omrabbitmq_sink)

    pub_file = str(tmp_path / "pub.txt")

    def pub_factory():
        f = open(pub_file, "ab")
        return (lambda key, payload:
                f.write(b"%s|%s\n" % (key.encode(), payload)),
                f.close)

    omrabbitmq_sink("logs-ex", "syslog.info",
                    publisher_factory=pub_factory)(
        _lines_df(spark, ["r1"]).coalesce(1), 0)
    with open(pub_file, "rb") as f:
        assert f.read() == b"syslog.info|r1\n"

    events_file = str(tmp_path / "ev.jsonl")

    def client_factory():
        f = open(events_file, "ab")
        return (lambda events: f.write(
                    (json.dumps(events) + "\n").encode()),
                f.close)

    df = spark.createDataFrame(
        [("e-late", "2026-08-14 01:00:02"),
         ("e-early", "2026-08-14 01:00:01")],
        "line string, ts string")
    omawslogs_sink("grp", "stream", client_factory=client_factory,
                   time_col="ts")(df.coalesce(1), 0)
    with open(events_file) as f:
        batch = json.loads(f.readline())
    # ascending timestamp order enforced (PutLogEvents contract)
    assert [e["message"] for e in batch] == ["e-early", "e-late"]
    assert batch[0]["timestamp"] < batch[1]["timestamp"]


def test_omjournal_native_datagrams(spark, tmp_path):
    from rsyslog_spark.streaming.transports import (
        journal_native_record, omjournal_sink)

    # multiline value → length-prefixed binary form
    rec = journal_native_record({"MESSAGE": "a\nb", "PRIORITY": 3})
    assert rec.startswith(b"MESSAGE\n")
    assert rec[8:16] == (3).to_bytes(8, "little")
    assert b"PRIORITY=3\n" in rec

    sp = str(tmp_path / "journal.sock")
    rx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    rx.bind(sp)
    rx.settimeout(10)
    df = spark.createDataFrame(
        [("oom kill", 2, 4, "kernel:")],
        "msg string, syslogseverity int, syslogfacility int, "
        "syslogtag string")
    omjournal_sink(sp)(df.coalesce(1), 0)
    got = rx.recv(65535).decode()
    rx.close()
    assert "MESSAGE=oom kill\n" in got
    # PRIORITY is the severity ALONE (journald rejects >7,
    # systemd.journal-fields(7)); facility travels separately
    assert "PRIORITY=2\n" in got
    assert "SYSLOG_FACILITY=4\n" in got
    assert "SYSLOG_IDENTIFIER=kernel\n" in got


def test_imbatchreport_whole_file_and_rename(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import imbatchreport

    (tmp_path / "j1.report").write_text("job A done\nstats: ok\n")
    (tmp_path / "j2.report").write_text("job B failed\n")
    (tmp_path / "big.report").write_text("x" * 100)
    b = imbatchreport(str(tmp_path / "*.report"), max_size=50)
    df = b.read(spark)
    msgs = {r.msg for r in df.collect()}
    assert msgs == {"job A done\nstats: ok", "job B failed"}
    moved = b.commit()
    assert (tmp_path / "j1.ok").exists()
    assert (tmp_path / "j2.ok").exists()
    assert (tmp_path / "big.rejected").exists()
    assert len(moved) == 3
    # nothing left to read after commit
    assert b.read(spark).count() == 0


def test_omczmq_imczmq_injectable_loop(spark, tmp_path):
    """omczmq publisher → imczmq consumer through an injected
    in-file 'broker' (pyzmq absent in this sandbox; the multipart
    topic convention is still exercised)."""
    from rsyslog_spark.streaming.bridges import imczmq
    from rsyslog_spark.streaming.transports import omczmq_sink

    wire = str(tmp_path / "wire.bin")

    def pub_factory():
        f = open(wire, "ab")
        return (lambda parts: f.write(b"\x1f".join(parts) + b"\x1e"),
                f.close)

    omczmq_sink("tcp://dummy", socktype="PUB", topic="syslog",
                socket_factory=pub_factory)(
        _lines_df(spark, ["z1", "z2"]).coalesce(1), 0)

    frames = [fr.split(b"\x1f") for fr in
              open(wire, "rb").read().split(b"\x1e") if fr]
    assert frames == [[b"syslog", b"z1"], [b"syslog", b"z2"]]

    it = iter(frames + [[]])

    def sub_factory():
        return (lambda: next(it, []), lambda: None)

    b = imczmq(str(tmp_path / "spool"), socket_factory=sub_factory,
               flush_secs=0.2).start()
    try:
        import time as _t
        deadline = _t.time() + 10
        while _t.time() < deadline:
            b.flush()
            if b.batch(spark).count() >= 2:
                break
            _t.sleep(0.3)
        got = sorted(r.line for r in b.batch(spark).collect())
        assert got == ["z1", "z2"]
    finally:
        b.stop()


def test_snmp_ber_roundtrip_property():
    """Property: arbitrary message bytes / communities / OIDs encode
    to BER that the independent test-side decoder recovers exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    oid_st = st.lists(st.integers(0, 2**20), min_size=2, max_size=10) \
        .map(lambda arcs: ".".join(
            map(str, [min(arcs[0], 2), min(arcs[1], 39)] + arcs[2:])))

    @settings(max_examples=50, deadline=None)
    @given(msg=st.text(max_size=300),
           community=st.text(
               alphabet=st.characters(min_codepoint=33,
                                      max_codepoint=126),
               min_size=1, max_size=20),
           oid=oid_st, uptime=st.integers(0, 2**31 - 1))
    def check(msg, community, oid, uptime):
        pkt = snmp_trap_pdu(msg, community=community,
                            message_oid=oid, uptime_cs=uptime)
        tag, body, consumed = ber_parse(pkt)
        assert tag == 0x30 and consumed == len(pkt)
        (_, ver), (_, comm), (ptag, pdu) = ber_seq(body)
        assert comm.decode() == community and ptag == 0xA7
        vbs = ber_seq(ber_seq(pdu)[3][1])
        up_oid, up_val = ber_seq(vbs[0][1])
        assert int.from_bytes(up_val[1], "big") == uptime
        msg_oid, msg_val = ber_seq(vbs[2][1])
        assert decode_oid(msg_oid[1]) == oid
        assert msg_val[1].decode() == msg

    check()


def test_omczmq_imczmq_real_pyzmq_loop(spark, tmp_path):
    """The DEFAULT socket factories against the real pyzmq engine
    (skip-if-unavailable — contrib/omczmq links czmq the same way):
    imczmq PULL binds, omczmq PUSH connects, messages round-trip
    over a real tcp:// socket with no injection."""
    import pytest

    pytest.importorskip("zmq")
    import socket as _s

    from rsyslog_spark.streaming.bridges import imczmq
    from rsyslog_spark.streaming.transports import omczmq_sink

    probe = _s.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    ep = f"tcp://127.0.0.1:{port}"

    b = imczmq(str(tmp_path / "spool"), endpoints=ep,
               socktype="PULL", flush_secs=0.2).start()
    try:
        import time as _t
        _t.sleep(0.5)   # PULL bind up before PUSH connects
        omczmq_sink(ep, socktype="PUSH")(
            _lines_df(spark, ["zr1", "zr2"]).coalesce(1), 0)
        deadline = _t.time() + 10
        while _t.time() < deadline:
            b.flush()
            if b.batch(spark).count() >= 2:
                break
            _t.sleep(0.3)
        got = sorted(r.line for r in b.batch(spark).collect())
        assert got == ["zr1", "zr2"]
    finally:
        b.stop()


def test_ommail_sendmail_mode(spark, tmp_path):
    """ommail mode='sendmail' (ChangeLog 2026-05-16; ommail.c:720
    buildSendmailArgv): the sendmail-compatible binary is invoked
    with '-i -f FROM -- RCPT...' and the rendered mail on stdin."""
    import os
    import stat

    from rsyslog_spark.streaming.transports import ommail_sink

    rec = tmp_path / "record"
    fake = tmp_path / "fake_sendmail"
    fake.write_text(
        "#!/bin/sh\n"
        f'echo "ARGS:$@" >> {rec}\n'
        f"cat >> {rec}\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

    df = _lines_df(spark, ["alert body line"]).coalesce(1)
    ommail_sink("ignored", 0, mailfrom="rsys@example.com",
                mailto=["ops@example.com", "oncall@example.com"],
                subject="disk full", mode="sendmail",
                sendmail_binary=str(fake))(df, 0)
    got = rec.read_text()
    assert ("ARGS:-i -f rsys@example.com -- "
            "ops@example.com oncall@example.com") in got
    assert "Subject: disk full" in got
    assert "alert body line" in got

    import pytest
    with pytest.raises(ValueError, match="unknown mode"):
        ommail_sink("x", 0, mailfrom="a@b", mailto=["c@d"],
                    mode="carrier-pigeon")

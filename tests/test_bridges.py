"""Input bridges: imudp/imuxsock/imhttp receive loops spooling to a
streaming source; imjournal export-format and imdocker json-file
parsing (SURVEY §2.1; ref plugins/imudp, plugins/imuxsock,
contrib/imhttp, plugins/imjournal, contrib/imdocker)."""

import json
import os
import socket
import threading
import time
import urllib.request

from pyspark.sql import functions as F

from rsyslog_spark.streaming.bridges import (
    imdocker,
    imhttp,
    imjournal,
    imtcp,
    imudp,
    imuxsock,
)


def _drain(bridge, spark, want_rows, timeout=15.0):
    """Wait until the spool holds >= want_rows rows, then batch-read."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        bridge.flush()
        df = bridge.batch(spark)
        try:
            if df.count() >= want_rows:
                return df
        except Exception:
            pass
        time.sleep(0.3)
    return bridge.batch(spark)


def test_imudp_datagrams_to_stream(spark, tmp_path):
    b = imudp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(5):
            tx.sendto(f"<13>udp msg {i}".encode(),
                      ("127.0.0.1", b.port))
        tx.close()
        df = _drain(b, spark, 5)
        rows = df.orderBy("line").collect()
        assert [r.line for r in rows] == [
            f"<13>udp msg {i}" for i in range(5)]
        assert all(r.fromhost == "127.0.0.1" for r in rows)
        assert all(r.inputname == "imudp" for r in rows)
        # streaming read over the same spool drains identically
        q = (b.stream(spark).writeStream.format("memory")
             .queryName("udp_t").outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        assert spark.sql("select * from udp_t").count() == 5
    finally:
        b.stop()


def test_udp_legacy_z_compression_roundtrip(spark, tmp_path):
    """'@(zN)host' legacy UDP selector (omfwd.c:1781 single-message
    compression runs BEFORE the UDP/TCP fork; parser.c:262
    uncompressMessage inflates on receive, any transport): omfwd
    protocol=udp compression=single → imudp round-trips. Messages
    ≤ CONF_MIN_SIZE_FOR_COMPRESS (60, rsyslog.h:244) go out plain;
    longer ones arrive as 'z'+zlib datagrams and inflate."""
    from rsyslog_spark.streaming.sinks import omfwd_sink

    b = imudp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        short = "<13>short udp line"
        long1 = "<13>long udp " + "payload " * 20 + "end"
        long2 = "<13>zzz " + "x" * 100
        lines = [short, long1, long2]
        df = spark.createDataFrame([(l,) for l in lines],
                                   "line string").coalesce(1)
        omfwd_sink("127.0.0.1", b.port, protocol="udp",
                   compression="single", framing="lf")(df, 0)
        df2 = _drain(b, spark, 3)
        assert sorted(r.line for r in df2.collect()) == sorted(lines)
    finally:
        b.stop()


def test_udp_stream_compression_rejected():
    """stream:always is a TCP connection-stream mode; with
    protocol='udp' it must be a config-time error, not silent
    uncompressed sends."""
    import pytest

    from rsyslog_spark.streaming.sinks import omfwd_sink

    with pytest.raises(ValueError, match="stream:always"):
        omfwd_sink("127.0.0.1", 5140, protocol="udp",
                   compression="stream:always")


def test_imuxsock_unix_datagrams(spark, tmp_path):
    sp = str(tmp_path / "dev_log")
    b = imuxsock(str(tmp_path / "spool"), sock_path=sp,
                 flush_secs=0.2).start()
    try:
        tx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
        tx.sendto(b"<86>su: session opened", sp)
        tx.sendto(b"<86>su: session closed", sp)
        tx.close()
        df = _drain(b, spark, 2)
        lines = sorted(r.line for r in df.collect())
        assert lines == ["<86>su: session closed",
                         "<86>su: session opened"]
    finally:
        b.stop()
    assert not os.path.exists(sp)   # socket cleaned up


def test_imuxsock_perpid_ratelimit(spark, tmp_path):
    """imuxsock per-PID rate limiting (imuxsock.c:640-694, SCM_
    CREDENTIALS keyed): with interval 2s / burst 3, a sender pid
    gets 3 messages through, the rest of its burst drops."""
    import pytest

    if not hasattr(socket, "SO_PASSCRED"):
        pytest.skip("platform lacks SO_PASSCRED")
    sp = str(tmp_path / "dev_log")
    b = imuxsock(str(tmp_path / "spool"), sock_path=sp,
                 ratelimit_interval=2, ratelimit_burst=3,
                 flush_secs=0.2).start()
    try:
        tx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
        for i in range(10):
            tx.sendto(f"<86>su: msg {i}".encode(), sp)
        tx.close()
        df = _drain(b, spark, 3)
        lines = sorted(r.line for r in df.collect())
        assert lines == ["<86>su: msg 0", "<86>su: msg 1",
                         "<86>su: msg 2"]
    finally:
        b.stop()


def test_imuxsock_pid_cache_bounded(tmp_path):
    """ChangeLog 2026-04-13 'imuxsock: bound per-pid ratelimiter
    cache': dead sender pids are pruned before a new insert and the
    table never exceeds MAX_DYNAMIC_RATELIMITERS — short-lived
    senders cannot grow state unboundedly."""
    import subprocess

    sp = str(tmp_path / "dev_log")
    b = imuxsock(str(tmp_path / "spool"), sock_path=sp,
                 ratelimit_interval=2, ratelimit_burst=3)
    try:
        # a dead pid's state is pruned when the next new pid arrives
        child = subprocess.Popen(["true"])
        child.wait()
        b._pid_rl[child.pid] = [0.0, 1]
        assert b._pid_admitted(999999999 % 2**22 or 1)  # new pid
        assert child.pid not in b._pid_rl
        # cap enforcement: with the cap lowered, inserting one more
        # LIVE-looking pid evicts instead of growing. Use our own
        # pid (alive) plus sentinel entries for pid 1 (alive,
        # kill→EPERM for non-root / 0 for root — both count alive).
        b.MAX_DYNAMIC_RATELIMITERS = 2
        b._pid_rl.clear()
        import os as _os
        b._pid_rl[1] = [0.0, 1]
        b._pid_rl[_os.getpid()] = [0.0, 1]
        assert b._pid_admitted(_os.getppid())
        assert len(b._pid_rl) <= 2
    finally:
        b.stop()


def test_imhttp_post_endpoint(spark, tmp_path):
    b = imhttp(str(tmp_path / "spool"), endpoint="/postrequest",
               flush_secs=0.2).start()
    try:
        url = f"http://127.0.0.1:{b.port}"
        body = b"<14>http one\n<14>http two\n"
        r = urllib.request.urlopen(f"{url}/postrequest", data=body)
        assert r.status == 200
        # wrong path → 404, no rows
        try:
            urllib.request.urlopen(f"{url}/other", data=b"nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        assert urllib.request.urlopen(f"{url}/healthz").status == 200
        df = _drain(b, spark, 2)
        assert sorted(r.line for r in df.collect()) == [
            "<14>http one", "<14>http two"]
    finally:
        b.stop()


def test_imjournal_export_format(spark, tmp_path):
    exp = tmp_path / "j.export"
    exp.write_text(
        "__REALTIME_TIMESTAMP=1755100000000000\n"
        "PRIORITY=6\n"
        "SYSLOG_FACILITY=3\n"
        "SYSLOG_IDENTIFIER=sshd\n"
        "_PID=712\n"
        "_HOSTNAME=web01\n"
        "MESSAGE=Accepted publickey for root\n"
        "\n"
        "__REALTIME_TIMESTAMP=1755100001000000\n"
        "PRIORITY=4\n"
        "_COMM=cron\n"
        "_HOSTNAME=db02\n"
        "MESSAGE=job started\n"
    )
    df = imjournal(spark, str(exp)).orderBy("timereported")
    rows = df.collect()
    assert len(rows) == 2
    a, c = rows
    assert (a.msg, a.syslogseverity, a.syslogfacility,
            a.tag, a.hostname, a.procid) == (
        "Accepted publickey for root", 6, 3, "sshd", "web01", "712")
    assert str(a.timereported).startswith("2025")
    # tag falls back to _COMM when SYSLOG_IDENTIFIER absent
    assert (c.tag, c.syslogfacility) == ("cron", None)
    assert "\"_COMM\":\"cron\"" in c.journal_all


def test_imdocker_jsonfile_logs(spark, tmp_path):
    cid = "0123456789abcdef0123456789abcdef"
    d = tmp_path / "containers" / cid
    d.mkdir(parents=True)
    (d / f"{cid}-json.log").write_text(
        '{"log":"server listening\\n","stream":"stdout",'
        '"time":"2026-08-14T01:02:03.123456789Z"}\n'
        '{"log":"oom warning\\n","stream":"stderr",'
        '"time":"2026-08-14T01:02:04.5Z"}\n'
    )
    df = imdocker(spark, str(tmp_path / "containers" / "*" / "*.log"))
    rows = df.orderBy("timegenerated").collect()
    assert [r.line for r in rows] == ["server listening", "oom warning"]
    assert [r.stream for r in rows] == ["stdout", "stderr"]
    assert all(r.container_id == cid for r in rows)
    assert str(rows[0].timegenerated).startswith("2026-08-14 01:02:03.123456")


def test_imfifo_pipe_lines(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import imfifo

    fp = str(tmp_path / "in.fifo")
    b = imfifo(str(tmp_path / "spool"), fifo_path=fp,
               flush_secs=0.2).start()
    try:
        fd = os.open(fp, os.O_WRONLY)
        os.write(fd, b"<13>fifo one\n<13>fifo two\n")
        os.close(fd)
        df = _drain(b, spark, 2)
        assert sorted(r.line for r in df.collect()) == [
            "<13>fifo one", "<13>fifo two"]
    finally:
        b.stop()


class _MockRedis:
    """RESP server: serves LPOP from a list, SUBSCRIBE pushes."""

    def __init__(self, items):
        self.items = list(items)
        self.seen = []          # commands received, for assertions
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.t = threading.Thread(target=self._serve, daemon=True)
        self.t.start()

    def _serve(self):
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        f = conn.makefile("rb")
        try:
            while True:
                hdr = f.readline()
                if not hdr or not hdr.startswith(b"*"):
                    break
                args = []
                for _ in range(int(hdr[1:-2])):
                    ln = f.readline()           # $len
                    args.append(f.read(int(ln[1:-2]) + 2)[:-2])
                cmd = args[0].upper()
                self.seen.append(cmd)
                if cmd in (b"LPOP", b"RPOP"):
                    if self.items:
                        v = (self.items.pop(0) if cmd == b"LPOP"
                             else self.items.pop()).encode()
                        conn.sendall(b"$%d\r\n%s\r\n" % (len(v), v))
                    else:
                        conn.sendall(b"$-1\r\n")
                elif cmd == b"SUBSCRIBE":
                    ch = args[1]
                    conn.sendall(
                        b"*3\r\n$9\r\nsubscribe\r\n$%d\r\n%s\r\n:1\r\n"
                        % (len(ch), ch))
                    for v in self.items:
                        vb = v.encode()
                        conn.sendall(
                            b"*3\r\n$7\r\nmessage\r\n$%d\r\n%s\r\n"
                            b"$%d\r\n%s\r\n"
                            % (len(ch), ch, len(vb), vb))
        except (OSError, ValueError):
            pass
        finally:
            conn.close()

    def close(self):
        self.srv.close()


def test_imhiredis_queue_mode(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import imhiredis

    srv = _MockRedis(["r1", "r2", "r3"])
    b = imhiredis(str(tmp_path / "spool"), port=srv.port,
                  key="logs", flush_secs=0.2).start()
    try:
        df = _drain(b, spark, 3)
        assert sorted(r.line for r in df.collect()) == ["r1", "r2", "r3"]
        assert df.first().inputname == "imhiredis"
    finally:
        b.stop()
        srv.close()


def test_imhiredis_queue_default_rpop(spark, tmp_path):
    """imhiredis.c:300 sets useLPop=0 at instance creation — queue
    mode pops with RPOP by default (FIFO against LPUSH producers);
    uselpop='on' opts into LPOP."""
    from rsyslog_spark.streaming.bridges import imhiredis

    srv = _MockRedis(["d1", "d2"])
    b = imhiredis(str(tmp_path / "s1"), port=srv.port,
                  key="logs", flush_secs=0.2).start()
    try:
        _drain(b, spark, 2)
        pops = {c for c in srv.seen if c in (b"LPOP", b"RPOP")}
        assert pops == {b"RPOP"}, srv.seen
    finally:
        b.stop()
        srv.close()

    srv2 = _MockRedis(["d1", "d2"])
    b2 = imhiredis(str(tmp_path / "s2"), port=srv2.port,
                   key="logs", use_lpop=True, flush_secs=0.2).start()
    try:
        _drain(b2, spark, 2)
        pops = {c for c in srv2.seen if c in (b"LPOP", b"RPOP")}
        assert pops == {b"LPOP"}, srv2.seen
    finally:
        b2.stop()
        srv2.close()


def test_imhiredis_subscribe_mode(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import imhiredis

    srv = _MockRedis(["p1", "p2"])
    b = imhiredis(str(tmp_path / "spool"), port=srv.port,
                  key="chan", mode="subscribe", flush_secs=0.2).start()
    try:
        df = _drain(b, spark, 2)
        assert sorted(r.line for r in df.collect()) == ["p1", "p2"]
    finally:
        b.stop()
        srv.close()


def test_imkmsg_record_parse(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import imkmsg

    (tmp_path / "kmsg.dump").write_text(
        "6,339,5140900,-;NET: Registered protocol family 10\n"
        " SUBSYSTEM=net\n"
        " DEVICE=+net:eth0\n"
        "30,340,5141000,-;audit: type=1400 apparmor=STATUS\n"
    )
    rows = (imkmsg(spark, str(tmp_path / "kmsg.dump"))
            .orderBy("sequnum").collect())
    assert len(rows) == 2
    a, b = rows
    assert a.msg == "NET: Registered protocol family 10"
    assert (a.syslogfacility, a.syslogseverity) == (0, 6)
    assert (a.sequnum, a.usec_since_boot) == (339, 5140900)
    assert dict(a.kmsg_props) == {"SUBSYSTEM": "net",
                                  "DEVICE": "+net:eth0"}
    assert (b.syslogfacility, b.syslogseverity) == (3, 6)
    assert dict(b.kmsg_props) == {}


def test_imklog_proc_kmsg(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import imklog

    (tmp_path / "kmsg").write_text(
        "<6>[   12.345678] usb 1-1: new high-speed USB device\n"
        "<4>no timestamp here\n"
        "not kernel format\n"
    )
    rows = (imklog(spark, str(tmp_path / "kmsg"))
            .orderBy("syslogseverity").collect())
    assert len(rows) == 2
    assert rows[1].msg == "usb 1-1: new high-speed USB device"
    assert rows[1].secs_since_boot == 12.345678
    assert rows[0].msg == "no timestamp here"
    assert rows[0].secs_since_boot is None
    # permitnonkernelfacility (imklog.c:272, default off → non-kern
    # facility records SILENTLY dropped; golden
    # imklog_permitnonkernelfacility_root.sh turns it on)
    (tmp_path / "kmsg2").write_text(
        "<6>kern info\n"
        "<14>user notice via klog\n")
    assert imklog(spark, str(tmp_path / "kmsg2")).count() == 1
    rows = (imklog(spark, str(tmp_path / "kmsg2"),
                   permit_non_kernel_facility=True)
            .orderBy("syslogfacility").collect())
    assert [r.syslogfacility for r in rows] == [0, 1]
    assert rows[1].msg == "user notice via klog"


def test_mmjsontransform_modes(spark):
    from rsyslog_spark.operators.mm import mmjsontransform

    df = spark.createDataFrame(
        [('{"a.b":1,"a.c":2,"drop.me":9,"old":3}',)], "json string")
    out = mmjsontransform(
        df, mode="unflatten", drop_keys=["drop.me"],
        rename_rules={"old": "new"}).first().json_transformed
    import json as j
    assert j.loads(out) == {"a": {"b": 1, "c": 2}, "new": 3}
    df2 = spark.createDataFrame(
        [('{"a":{"b":{"c":1}},"x":2}',)], "json string")
    out2 = mmjsontransform(df2, mode="flatten").first().json_transformed
    assert j.loads(out2) == {"a.b.c": 1, "x": 2}


def test_improg_captures_and_confirms(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import improg

    script = tmp_path / "gen.sh"
    script.write_text(
        "#!/bin/sh\n"
        "echo '<13>prog msg 1'\n"
        "read ack1\n"
        "echo '<13>prog msg 2'\n"
        "read ack2\n"
        "echo \"acks:$ack1:$ack2\" > %s/acks.txt\n"
        "sleep 30\n" % tmp_path)
    script.chmod(0o755)
    b = improg(str(tmp_path / "spool"), binary=str(script),
               confirm_messages=True, flush_secs=0.2).start()
    try:
        df = _drain(b, spark, 2)
        assert sorted(r.line for r in df.collect()) == [
            "<13>prog msg 1", "<13>prog msg 2"]
    finally:
        b.stop()
    assert (tmp_path / "acks.txt").read_text().strip() == "acks:OK:OK"


def test_improg_stops_on_child_eof(spark, tmp_path):
    """improg.c:588-592 / ChangeLog 2026-05-05 (issue 6791): child
    stdout EOF terminates the child and STOPS the reader — killing
    the configured program must not leave the input thread spinning
    on (or re-polling) the closed pipe, and no respawn happens by
    default."""
    import os
    import signal
    import time as _time

    from rsyslog_spark.streaming.bridges import improg

    marker = tmp_path / "spawned.txt"
    script = tmp_path / "gen.sh"
    # every spawn appends a line — a respawning supervisor would
    # grow the file; emit our pid so the test can kill us
    script.write_text(
        "#!/bin/sh\n"
        f"echo spawned >> {marker}\n"
        "echo \"<13>pid:$$\"\n"
        # redirect so the sleep does not inherit (and hold open) the
        # stdout pipe after the script shell is killed
        "sleep 300 > /dev/null 2>&1\n")
    script.chmod(0o755)
    b = improg(str(tmp_path / "spool"), binary=str(script),
               flush_secs=0.2).start()
    try:
        df = _drain(b, spark, 1)
        pid = int(df.first().line.split(":")[1])
        reader = next(t for t in b._threads if t.is_alive())
        os.kill(pid, signal.SIGKILL)
        # shell wrapper: the sh running the script is improg's
        # direct child; killing the sleep's parent shell ends it.
        # The reader must exit within the deadline, not spin.
        deadline = _time.time() + 10
        while _time.time() < deadline and reader.is_alive():
            _time.sleep(0.1)
        assert not reader.is_alive(), \
            "improg reader still running after child death"
        _time.sleep(1.0)
        assert marker.read_text().count("spawned") == 1, \
            "child was respawned after EOF"
    finally:
        b.stop()


def test_imtcp_both_framings(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        # octet-counted (RFC6587 §3.4.1) and LF framing on separate
        # connections; detection is per-frame
        c1 = socket.create_connection(("127.0.0.1", b.port))
        msg = b"<13>tcp octet counted"
        c1.sendall(str(len(msg)).encode() + b" " + msg)
        c1.close()
        c2 = socket.create_connection(("127.0.0.1", b.port))
        c2.sendall(b"<13>tcp lf one\n<13>tcp lf two\n")
        c2.close()
        df = _drain(b, spark, 3)
        got = sorted(r.line for r in df.collect())
        assert got == ["<13>tcp lf one", "<13>tcp lf two",
                       "<13>tcp octet counted"]
        assert all(r.fromhost == "127.0.0.1" for r in df.collect())
    finally:
        b.stop()


def test_omrelp_to_imrelp_loopback(spark, tmp_path):
    """RELP client sink → RELP server bridge: open handshake, per-
    frame acks, close — full at-least-once loop with our own two
    endpoints (ref: plugins/omrelp + plugins/imrelp via librelp)."""
    from rsyslog_spark.streaming.bridges import imrelp
    from rsyslog_spark.streaming.transports import omrelp_sink

    b = imrelp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        df = spark.createDataFrame(
            [(f"<14>relp message {i}",) for i in range(10)],
            "line string")
        omrelp_sink("127.0.0.1", b.port, window=4)(df.coalesce(2), 0)
        got = _drain(b, spark, 10)
        lines = sorted(r.line for r in got.collect())
        assert lines == sorted(
            f"<14>relp message {i}" for i in range(10))
        assert got.first().inputname == "imrelp"
    finally:
        b.stop()


def test_imtuxedoulog_parse(spark, tmp_path):
    from rsyslog_spark.streaming.bridges import imtuxedoulog

    (tmp_path / "ULOG.081426").write_text(
        "123456.78.tuxhost!GWTDOMAIN.1234.1.0: "
        "LIBTUX_CAT:262: INFO: Standard main starting\n"
        "123457.789.tuxhost!server.99.2.0: gtrid x0 x1 x2: "
        "ECID <abc-123>: TMS_ORA: transaction aborted\n"
        "garbage line without header\n")
    rows = (imtuxedoulog(spark, str(tmp_path / "ULOG.*"))
            .orderBy("timereported").collect())
    assert len(rows) == 2
    a, b = rows
    assert a.msg == "LIBTUX_CAT:262: INFO: Standard main starting"
    assert (a.hostname, a.procid) == ("tuxhost", "GWTDOMAIN.1234.1")
    assert str(a.timereported) == "2026-08-14 12:34:56.780000"
    assert a.structured_data is None
    # the space after the ECID colon stays in MSG (the reference
    # renders a double space after the SD — imtuxedoulog_data.sh)
    assert b.msg == " TMS_ORA: transaction aborted"
    assert b.structured_data == '[ECID="abc-123"]'
    assert str(b.timereported).startswith("2026-08-14 12:34:57.789")


def test_imbeats_lumberjack_v2(spark, tmp_path):
    """Filebeat-style client: window frame, plain JSON frames, a
    zlib-compressed batch, split across sends; server acks highest
    seq at the window boundary (ref: plugins/imbeats/lj_parser.h)."""
    import json as j
    import struct
    import zlib
    from rsyslog_spark.streaming.bridges import imbeats

    b = imbeats(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        def jframe(seq, obj):
            p = j.dumps(obj).encode()
            return b"2J" + struct.pack(">II", seq, len(p)) + p

        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(b"2W" + struct.pack(">I", 3))
        # frame split across two sends exercises reassembly
        f1 = jframe(1, {"message": "beat one"})
        c.sendall(f1[:7])
        c.sendall(f1[7:])
        inner = jframe(2, {"message": "beat two"}) + \
            jframe(3, {"message": "beat three"})
        z = zlib.compress(inner)
        c.sendall(b"2C" + struct.pack(">I", len(z)) + z)
        c.settimeout(10)
        ack = c.recv(6)
        assert ack[:2] == b"2A"
        assert struct.unpack(">I", ack[2:])[0] == 3
        c.close()
        df = _drain(b, spark, 3)
        msgs = sorted(json.loads(r.line)["message"]
                      for r in df.collect())
        assert msgs == ["beat one", "beat three", "beat two"]
    finally:
        b.stop()


def test_imdiag_injectmsg(spark, tmp_path):
    from rsyslog_spark.parsers import parse_syslog
    from rsyslog_spark.streaming.bridges import imdiag

    b = imdiag(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        b.inject_n(5)
        df = _drain(b, spark, 5)
        parsed = parse_syslog(df)
        rows = sorted((r.syslogtag, r.msg) for r in parsed.collect())
        # SP-terminated 'tag' IS the TAG (pmrfc3164.c:470-498; the
        # reference's own seq_check greps the tag off exactly like
        # this) — msg carries only the msgnum payload
        assert rows == [("tag", f"msgnum:{i:08d}:") for i in range(5)]
    finally:
        b.stop()


def test_imbeats_multiple_batches_ack_per_window(spark, tmp_path):
    """Sequence numbers are CUMULATIVE across windows
    (imbeats-seq-cumulative-after-multi-event-window.sh): each window
    acks at its own boundary with the cumulative max — no premature
    ack mid-window."""
    import struct
    from rsyslog_spark.streaming.bridges import imbeats

    b = imbeats(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        def jframe(seq, text):
            p = json.dumps({"message": text}).encode()
            return b"2J" + struct.pack(">II", seq, len(p)) + p

        c = socket.create_connection(("127.0.0.1", b.port))
        c.settimeout(10)
        # batch 1: window 2, seqs 1-2
        c.sendall(b"2W" + struct.pack(">I", 2)
                  + jframe(1, "b1m1") + jframe(2, "b1m2"))
        ack1 = c.recv(6)
        assert struct.unpack(">I", ack1[2:])[0] == 2
        # batch 2: window 3, seqs CONTINUE at 3 — ack only at seq 5
        c.sendall(b"2W" + struct.pack(">I", 3) + jframe(3, "b2m1"))
        c.sendall(jframe(4, "b2m2"))
        c.sendall(jframe(5, "b2m3"))
        ack2 = c.recv(6)
        assert struct.unpack(">I", ack2[2:])[0] == 5
        c.close()
        df = _drain(b, spark, 5)
        assert df.count() == 5
    finally:
        b.stop()


def test_imbeats_seq_reset_rejected(spark, tmp_path):
    """imbeats-seq-reset-rejected.sh: reusing a sequence number on an
    established connection is rejected WITHOUT submit or ack and the
    session drops; only the first event survives."""
    import struct
    from rsyslog_spark.streaming.bridges import imbeats

    b = imbeats(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        def jframe(seq, text):
            p = json.dumps({"message": text},
                           separators=(",", ":")).encode()
            return b"2J" + struct.pack(">II", seq, len(p)) + p

        c = socket.create_connection(("127.0.0.1", b.port))
        c.settimeout(5)
        c.sendall(b"2W" + struct.pack(">I", 1) + jframe(1, "first"))
        ack = c.recv(6)
        assert ack == b"2A" + (1).to_bytes(4, "big")
        c.sendall(b"2W" + struct.pack(">I", 1) + jframe(1, "reset"))
        try:
            data = c.recv(6)
        except (ConnectionResetError, TimeoutError, socket.timeout):
            data = b""
        assert data == b"", "no ack for a reset sequence"
        c.close()
        df = _drain(b, spark, 1)
        rows = df.collect()
        assert [r.line for r in rows] == ['{"message":"first"}']
    finally:
        b.stop()


def test_imbeats_metadata_server_assigned(spark, tmp_path):
    """imbeats-metadata-collision.sh: $!metadata!imbeats!* is
    SERVER-assigned (protocol/sequence/tls_enabled) — an
    attacker-supplied metadata key inside the payload does not
    override it, and the raw message keeps the attacker text."""
    import struct
    from rsyslog_spark.streaming.bridges import imbeats

    b = imbeats(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        payload = json.dumps({
            "message": "metadata collision",
            "metadata": {"imbeats": {"protocol": "attacker",
                                     "sequence": 999,
                                     "tls_enabled": True}}},
            separators=(",", ":")).encode()
        c = socket.create_connection(("127.0.0.1", b.port))
        c.settimeout(5)
        c.sendall(b"2W" + struct.pack(">I", 1)
                  + b"2J" + struct.pack(">II", 1, len(payload))
                  + payload)
        assert c.recv(6) == b"2A" + (1).to_bytes(4, "big")
        c.close()
        df = _drain(b, spark, 1)
        r = df.collect()[0]
        assert "attacker" in r.line          # raw msg untouched
        meta = json.loads(r["json"])["metadata"]["imbeats"]
        assert meta == {"protocol": "lumberjack-v2", "sequence": 1,
                        "tls_enabled": False}
    finally:
        b.stop()


def test_imrelp_session_survives_idle(spark, tmp_path):
    """A RELP session idles longer than the socket timeout between
    batches and must stay alive (long-lived session contract)."""
    from rsyslog_spark.streaming.bridges import imrelp
    from rsyslog_spark.streaming.transports import omrelp_sink

    b = imrelp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        sk = socket.create_connection(("127.0.0.1", b.port),
                                      timeout=10)
        f = sk.makefile("rwb")

        def send(txnr, cmd, data=b""):
            if data:
                f.write(b"%d %s %d %s\n" % (txnr, cmd, len(data), data))
            else:
                f.write(b"%d %s 0\n" % (txnr, cmd))
            f.flush()

        def read_rsp():
            hdr = f.readline()                  # "T rsp LEN payload..."
            parts = hdr.split(b" ", 3)
            dlen = int(parts[2])
            got = parts[3] if len(parts) > 3 else b""
            while len(got) < dlen + 1:          # + trailer LF
                got += f.read(dlen + 1 - len(got))
            return hdr

        send(1, b"open", b"relp_version=0\ncommands=syslog")
        assert b"200 OK" in read_rsp()
        send(2, b"syslog", b"<13>before idle")
        read_rsp()                         # ack
        time.sleep(1.5)                    # > socket timeout (0.5s)
        send(3, b"syslog", b"<13>after idle")
        ack = read_rsp()
        assert ack.startswith(b"3 rsp")
        send(4, b"close")
        sk.close()
        df = _drain(b, spark, 2)
        assert sorted(r.line for r in df.collect()) == [
            "<13>after idle", "<13>before idle"]
    finally:
        b.stop()


def test_imtcp_oversized_octet_count_falls_back_to_lf(spark, tmp_path):
    """A bogus huge octet count must not buffer unbounded — the frame
    falls back to LF framing (ref: tcps_sess.c iMaxFrameSize)."""
    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), max_frame_size=1024,
              flush_secs=0.2).start()
    try:
        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(b"9999999999 not really that long\n<13>next ok\n")
        c.close()
        df = _drain(b, spark, 2)
        got = sorted(r.line for r in df.collect())
        assert got == ["9999999999 not really that long",
                       "<13>next ok"]
    finally:
        b.stop()


class TestImpcap:
    """pcap file replay (ref: contrib/impcap — input file= mode)."""

    @staticmethod
    def _udp_packet(src_ip, dst_ip, sport, dport, payload):
        import struct as s
        udp = s.pack(">HHHH", sport, dport, 8 + len(payload), 0) + payload
        ip = (b"\x45\x00" + s.pack(">H", 20 + len(udp))
              + b"\x00\x00\x00\x00" + bytes([64, 17]) + b"\x00\x00"
              + bytes(src_ip) + bytes(dst_ip))
        eth = (bytes.fromhex("aabbccddeeff") + bytes.fromhex("112233445566")
               + b"\x08\x00")
        return eth + ip + udp

    @staticmethod
    def _tcp_packet(flags, payload=b"", ns=False):
        import struct as s
        dor = (5 << 4) | (1 if ns else 0)
        tcp = s.pack(">HHII", 443, 51000, 1000, 2000) + bytes([dor, flags]) \
            + b"\x00\x00\x00\x00\x00\x00" + payload
        ip = (b"\x45\x00" + s.pack(">H", 20 + len(tcp))
              + b"\x00\x00\x00\x00" + bytes([63, 6]) + b"\x00\x00"
              + bytes([10, 0, 0, 1]) + bytes([10, 0, 0, 2]))
        # VLAN-tagged ethernet frame (one 802.1Q tag is unwrapped)
        eth = (bytes.fromhex("aabbccddeeff") + bytes.fromhex("112233445566")
               + b"\x81\x00" + b"\x00\x2a" + b"\x08\x00")
        return eth + ip + tcp

    @staticmethod
    def _pcap(packets, magic=b"\xd4\xc3\xb2\xa1", linktype=1,
              truncate_last=0):
        import struct as s
        endian = "<" if magic[0] == 0xD4 or magic[0] == 0x4D else ">"
        out = magic + s.pack(endian + "HHiIII", 2, 4, 0, 0, 65535, linktype)
        for i, p in enumerate(packets):
            out += s.pack(endian + "IIII", 1700000000 + i, 250000,
                          len(p), len(p)) + p
        return out[:len(out) - truncate_last] if truncate_last else out

    def test_parse_udp_tcp_vlan_and_truncation(self, spark, tmp_path):
        from rsyslog_spark.streaming.pcap import impcap

        udp = self._udp_packet([192, 168, 1, 9], [10, 0, 0, 5], 32000,
                               514, b"<13>Jan  1 00:00:00 host app: hi")
        tcp = self._tcp_packet(flags=0b00010010, ns=True)  # SYN+ACK+NS
        cut = self._udp_packet([1, 1, 1, 1], [2, 2, 2, 2], 1, 2, b"gone")
        (tmp_path / "cap.pcap").write_bytes(
            self._pcap([udp, tcp, cut], truncate_last=10))
        rows = {r["pkt_idx"]: r for r in
                impcap(spark, str(tmp_path)).collect()}
        assert len(rows) == 2  # truncated trailer dropped
        u = rows[0]
        assert (u["net_src_ip"], u["net_dst_ip"]) == ("192.168.1.9", "10.0.0.5")
        assert (u["net_src_port"], u["net_dst_port"]) == (32000, 514)
        assert u["IP_proto"] == 17 and u["UDP_Length"] == 40
        assert u["ETH_src"] == "11:22:33:44:55:66"
        assert bytes(u["payload"]) == b"<13>Jan  1 00:00:00 host app: hi"
        t = rows[1]
        assert t["ETH_type"] == 0x0800  # VLAN tag unwrapped
        assert t["net_flags"] == "SAN"  # FSRPAUECN order + NS bit
        assert (t["TCP_seq_number"], t["TCP_ack_number"]) == (1000, 2000)
        assert t["net_ttl"] == 63

    def test_nanosecond_magic_and_syslog_chain(self, spark, tmp_path):
        from rsyslog_spark.streaming.pcap import impcap, impcap_messages
        from rsyslog_spark.parsers import parse_syslog

        udp = self._udp_packet([172, 16, 0, 1], [172, 16, 0, 2], 4000,
                               514, b"<34>1 2026-01-02T03:04:05Z h a 1 - - ok")
        (tmp_path / "ns.pcap").write_bytes(
            self._pcap([udp], magic=b"\x4d\x3c\xb2\xa1"))
        msgs = impcap_messages(impcap(spark, str(tmp_path)), tag="cap")
        parsed = parse_syslog(
            msgs.select(F.col("msg").alias("line"))).collect()
        assert parsed[0]["syslogseverity"] == 2
        assert parsed[0]["hostname"] == "h"
        meta = msgs.collect()[0]
        assert meta["syslogtag"] == "cap"
        assert '"net_dst_port":514' in meta["impcap"]

    def test_dns_http_ftp_protocol_parsers(self, spark, tmp_path):
        import struct as s
        from rsyslog_spark.streaming.pcap import (
            impcap, impcap_ftp, impcap_http,
        )

        # DNS query: www.example.com A/IN (dns_parser.c field map)
        qname = b"\x03www\x07example\x03com\x00"
        dns = s.pack(">HHHHHH", 0xBEEF, 0x0100, 1, 0, 0, 0) \
            + qname + s.pack(">HH", 1, 1)
        dns_pkt = self._udp_packet([9, 9, 9, 1], [8, 8, 8, 8], 5353,
                                   53, dns)
        # HTTP request on port 80 over TCP
        http = (b"GET /index.html HTTP/1.1\r\n"
                b"Host: example.com\r\nUser-Agent: t\r\n\r\n")
        http_pkt = self._tcp_port_packet(51001, 80, http)
        ftp_pkt = self._tcp_port_packet(21, 51002, b"230 Login ok\r\n")
        (tmp_path / "mix.pcap").write_bytes(
            self._pcap([dns_pkt, http_pkt, ftp_pkt]))
        pkts = impcap(spark, str(tmp_path))
        rows = {r["pkt_idx"]: r
                for r in impcap_ftp(impcap_http(pkts)).collect()}
        d = rows[0]
        assert d["DNS_transaction_id"] == 0xBEEF
        assert d["DNS_response_flag"] is False
        assert d["DNS_QDCOUNT"] == 1 and d["DNS_rcode"] == 0
        assert d["DNS_error"] == "NoError"
        q0 = d["DNS_Names"][0]
        assert q0["qname"] == "www.example.com"
        assert (q0["type"], q0["class"]) == ("A", "IN")
        h = rows[1]
        assert h["HTTP_method"] == "GET"
        assert h["HTTP_request_URI"] == "/index.html"
        assert h["HTTP_version"] == "HTTP/1.1"
        assert h["HTTP_header_fields"]["Host"] == "example.com"
        f = rows[2]
        assert f["FTP_response"] == 230 and f["FTP_request"] is None

    @staticmethod
    def _tcp_port_packet(sport, dport, payload):
        import struct as s
        tcp = s.pack(">HHII", sport, dport, 1, 1) \
            + bytes([5 << 4, 0x18]) + b"\x00\x00\x00\x00\x00\x00" \
            + payload
        ip = (b"\x45\x00" + s.pack(">H", 20 + len(tcp))
              + b"\x00\x00\x00\x00" + bytes([64, 6]) + b"\x00\x00"
              + bytes([10, 1, 1, 1]) + bytes([10, 1, 1, 2]))
        eth = (bytes.fromhex("aabbccddeeff")
               + bytes.fromhex("112233445566") + b"\x08\x00")
        return eth + ip + tcp


class TestGtls:
    """TLS stream driver over imtcp/omfwd (ref: runtime/nsd_gtls.c,
    StreamDriver gtls; certs generated with the container openssl)."""

    @staticmethod
    def _make_certs(tmp):
        import subprocess

        def run(*args):
            subprocess.run(args, check=True, capture_output=True,
                           cwd=str(tmp))

        ec = ("-newkey", "ec", "-pkeyopt",
              "ec_paramgen_curve:prime256v1", "-nodes")
        run("openssl", "req", "-x509", *ec, "-keyout", "ca.key",
            "-out", "ca.crt", "-days", "2", "-subj", "/CN=test-ca")
        for name, cn in (("srv", "server.example"),
                         ("cli", "client.example"),
                         ("rogue", "rogue.example")):
            run("openssl", "req", *ec, "-keyout", f"{name}.key",
                "-out", f"{name}.csr", "-subj", f"/CN={cn}")
            run("openssl", "x509", "-req", "-in", f"{name}.csr",
                "-CA", "ca.crt", "-CAkey", "ca.key", "-CAcreateserial",
                "-out", f"{name}.crt", "-days", "2")
        return tmp

    def test_mutual_auth_omfwd_loopback(self, spark, tmp_path):
        from rsyslog_spark.streaming.bridges import imtcp
        from rsyslog_spark.streaming.gtls import TLSConfig
        from rsyslog_spark.streaming.sinks import omfwd_sink

        c = self._make_certs(tmp_path)
        srv_tls = TLSConfig(
            certfile=str(c / "srv.crt"), keyfile=str(c / "srv.key"),
            cafile=str(c / "ca.crt"), authmode="x509/name",
            permitted_peers=["client.*"])
        cli_tls = TLSConfig(
            certfile=str(c / "cli.crt"), keyfile=str(c / "cli.key"),
            cafile=str(c / "ca.crt"), authmode="x509/name",
            permitted_peers=["server.example"])
        b = imtcp(str(tmp_path / "spool"), tls=srv_tls,
                  flush_secs=0.2).start()
        try:
            df = spark.createDataFrame(
                [(f"<13>tls msg {i}",) for i in range(3)],
                "line string")
            omfwd_sink("127.0.0.1", b.port, tls=cli_tls)(df, 0)
            got = _drain(b, spark, 3)
            assert sorted(r.line for r in got.collect()) == [
                f"<13>tls msg {i}" for i in range(3)]
        finally:
            b.stop()

    def test_unauthorized_peer_name_dropped(self, spark, tmp_path):
        import ssl
        from rsyslog_spark.streaming.bridges import imtcp
        from rsyslog_spark.streaming.gtls import TLSConfig

        c = self._make_certs(tmp_path)
        srv_tls = TLSConfig(
            certfile=str(c / "srv.crt"), keyfile=str(c / "srv.key"),
            cafile=str(c / "ca.crt"), authmode="x509/name",
            permitted_peers=["client.example"])
        b = imtcp(str(tmp_path / "spool"), tls=srv_tls,
                  flush_secs=0.2).start()
        try:
            rogue = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
            rogue.check_hostname = False
            rogue.verify_mode = ssl.CERT_NONE
            rogue.load_cert_chain(str(c / "rogue.crt"),
                                  str(c / "rogue.key"))
            try:
                sk = rogue.wrap_socket(socket.create_connection(
                    ("127.0.0.1", b.port), timeout=5))
                sk.sendall(b"<13>rogue line\n")
                sk.close()
            except OSError:
                pass  # server may slam the session mid-write
            # an authorized plain-ssl client still gets through
            okc = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
            okc.check_hostname = False
            okc.verify_mode = ssl.CERT_NONE
            okc.load_cert_chain(str(c / "cli.crt"), str(c / "cli.key"))
            sk = okc.wrap_socket(socket.create_connection(
                ("127.0.0.1", b.port), timeout=5))
            sk.sendall(b"<13>good line\n")
            sk.close()
            got = _drain(b, spark, 1)
            assert [r.line for r in got.collect()] == ["<13>good line"]
        finally:
            b.stop()

    def test_fingerprint_pinning(self, tmp_path):
        import hashlib
        import ssl
        import subprocess
        from rsyslog_spark.streaming.gtls import TLSConfig, check_peer

        c = self._make_certs(tmp_path)
        der = subprocess.run(
            ["openssl", "x509", "-in", str(c / "cli.crt"),
             "-outform", "DER"],
            check=True, capture_output=True).stdout
        fp = "SHA256:" + ":".join(
            f"{x:02X}" for x in hashlib.sha256(der).digest())

        class _Fake:
            def getpeercert(self, binary_form=False):
                return der if binary_form else {}

        good = TLSConfig(cafile=str(c / "ca.crt"),
                         authmode="x509/fingerprint",
                         permitted_fingerprints=[fp])
        check_peer(_Fake(), good)  # no raise
        bad = TLSConfig(cafile=str(c / "ca.crt"),
                        authmode="x509/fingerprint",
                        permitted_fingerprints=["SHA256:00:11"])
        try:
            check_peer(_Fake(), bad)
            assert False, "expected PermissionError"
        except PermissionError:
            pass


def test_imtcp_tcpflood_seq_check(spark, tmp_path):
    """tcpflood analog (ref: tests/tcpflood.c + seq_check/chkseq):
    8 concurrent connections, 2500 numbered messages each, mixed
    RFC6587 framings and split writes — every sequence number must
    arrive exactly once."""
    from rsyslog_spark.streaming.bridges import imtcp

    N_CONN, N_MSG = 8, 2500
    b = imtcp(str(tmp_path / "spool"), flush_secs=0.3).start()

    def flood(conn_id):
        sk = socket.create_connection(("127.0.0.1", b.port),
                                      timeout=10)
        buf = bytearray()
        for i in range(N_MSG):
            seq = conn_id * N_MSG + i
            payload = f"<13>seq msg {seq:07d}".encode()
            if seq % 2 == 0:     # octet-counted
                buf += str(len(payload)).encode() + b" " + payload
            else:                # LF-framed
                buf += payload + b"\n"
            if len(buf) > 3000:  # split mid-frame sometimes
                cut = len(buf) - 7
                sk.sendall(bytes(buf[:cut]))
                del buf[:cut]
        sk.sendall(bytes(buf))
        sk.close()

    try:
        threads = [threading.Thread(target=flood, args=(cid,))
                   for cid in range(N_CONN)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        df = _drain(b, spark, N_CONN * N_MSG, timeout=60)
        seqs = [int(r.line.rsplit(" ", 1)[1])
                for r in df.collect()]
        assert len(seqs) == N_CONN * N_MSG          # nothing lost
        assert len(set(seqs)) == N_CONN * N_MSG     # nothing doubled
        assert min(seqs) == 0
        assert max(seqs) == N_CONN * N_MSG - 1
    finally:
        b.stop()


class TestAllowedSender:
    """$AllowedSender ACLs (ref: runtime/net.c AllowedSenders)."""

    def test_imudp_drops_unlisted_sender(self, spark, tmp_path):
        from rsyslog_spark.streaming.bridges import imudp

        b = imudp(str(tmp_path / "s1"), flush_secs=0.2,
                  allowed_senders=["10.0.0.0/8"]).start()
        try:
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            tx.sendto(b"<13>should be dropped", ("127.0.0.1", b.port))
            tx.close()
            time.sleep(1.0)
            b.flush()
            assert b.batch(spark).count() == 0
        finally:
            b.stop()
        b2 = imudp(str(tmp_path / "s2"), flush_secs=0.2,
                   allowed_senders=["127.0.0.1", "10.0.0.0/8"]).start()
        try:
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            tx.sendto(b"<13>allowed", ("127.0.0.1", b2.port))
            tx.close()
            df = _drain(b2, spark, 1)
            assert [r.line for r in df.collect()] == ["<13>allowed"]
        finally:
            b2.stop()

    def test_imtcp_refuses_unlisted_connection(self, spark, tmp_path):
        from rsyslog_spark.streaming.bridges import imtcp

        b = imtcp(str(tmp_path / "s3"), flush_secs=0.2,
                  allowed_senders=["192.0.2.0/24"]).start()
        try:
            c = socket.create_connection(("127.0.0.1", b.port),
                                         timeout=5)
            try:
                c.sendall(b"<13>refused\n")
                # server closes immediately; read should hit EOF
                c.settimeout(5)
                assert c.recv(1) == b""
            except OSError:
                pass
            c.close()
            time.sleep(1.0)
            b.flush()
            assert b.batch(spark).count() == 0
        finally:
            b.stop()

    def test_directive_accumulates_and_wires(self):
        from rsyslog_spark.config.rainerscript import load_config

        conf = '''
        $AllowedSender UDP, 127.0.0.1, 10.0.0.0/8
        $AllowedSender UDP, 192.168.7.0/24
        $AllowedSender TCP, 172.16.0.0/12
        *.* /tmp/x
        '''
        _, cfg = load_config(conf)
        assert cfg.directives["allowedsender.udp"] == \
            "127.0.0.1,10.0.0.0/8,192.168.7.0/24"
        assert cfg.directives["allowedsender.tcp"] == "172.16.0.0/12"


def test_imkubernetes_cri_partial_reassembly(spark, tmp_path):
    """CRI P/F partial-line reassembly + kubelet path metadata
    (ref: contrib/imkubernetes/imkubernetes.c partialAppend)."""
    from rsyslog_spark.streaming.bridges import imkubernetes

    d = (tmp_path / "pods" / "prod_web-7f9_abc-123" / "nginx")
    d.mkdir(parents=True)
    (d / "0.log").write_text(
        "2026-08-14T01:00:00.123456789Z stdout P first part, \n"
        "2026-08-14T01:00:00.223456789Z stdout P second part, \n"
        "2026-08-14T01:00:00.323456789Z stdout F final part\n"
        "2026-08-14T01:00:01.000000000Z stdout F plain full line\n"
        "2026-08-14T01:00:02.500000000Z stderr F err line\n")
    rows = (imkubernetes(spark, str(tmp_path / "pods" / "*" / "*" / "*.log"))
            .orderBy("timegenerated").collect())
    assert [r.line for r in rows] == [
        "first part, second part, final part",
        "plain full line", "err line"]
    a = rows[0]
    assert (a.namespace, a.pod, a.pod_uid, a.container) == (
        "prod", "web-7f9", "abc-123", "nginx")
    # timestamp of a reassembled message = FIRST partial's timestamp
    assert str(a.timegenerated).startswith("2026-08-14 01:00:00.123456")
    assert rows[2].stream == "stderr"


def test_impcap_arp_icmp_smb_parsers(spark, tmp_path):
    import struct as s
    from rsyslog_spark.streaming.pcap import impcap

    # ARP request: who-has 10.0.0.2 tell 10.0.0.1
    arp = (s.pack(">HHBBH", 1, 0x0800, 6, 4, 1)
           + bytes.fromhex("112233445566") + bytes([10, 0, 0, 1])
           + bytes.fromhex("000000000000") + bytes([10, 0, 0, 2]))
    arp_pkt = (bytes.fromhex("ffffffffffff")
               + bytes.fromhex("112233445566") + b"\x08\x06" + arp)
    # ICMP echo request
    icmp = bytes([8, 0]) + b"\x00\x00\x12\x34\x00\x01" + b"ping"
    icmp_ip = (b"\x45\x00" + s.pack(">H", 20 + len(icmp))
               + b"\x00\x00\x00\x00" + bytes([64, 1]) + b"\x00\x00"
               + bytes([10, 0, 0, 1]) + bytes([10, 0, 0, 2]))
    icmp_pkt = (bytes.fromhex("aabbccddeeff")
                + bytes.fromhex("112233445566") + b"\x08\x00"
                + icmp_ip + icmp)
    # SMB2 over TCP 445 with NetBIOS prefix: WRITE (0x09),
    # response flag, seq 7, tree 3, session 5
    smb_hdr = (b"\xfeSMB" + s.pack("<HHIHHI", 64, 0, 0, 9, 0, 1)
               + s.pack("<I", 0) + s.pack("<Q", 7)
               + s.pack("<II", 0xFEFF, 3) + s.pack("<Q", 5)
               + b"\x00" * 16)
    smb_pkt = TestImpcap._tcp_port_packet(
        51010, 445, b"\x00\x00\x00\x40" + smb_hdr)
    (tmp_path / "mix2.pcap").write_bytes(
        TestImpcap._pcap([arp_pkt, icmp_pkt, smb_pkt]))
    rows = {r["pkt_idx"]: r
            for r in impcap(spark, str(tmp_path)).collect()}
    a = rows[0]
    assert a["ETH_type"] == 0x0806 and a["ARP_op"] == 1
    assert (a["ARP_hwSrc"], a["ARP_pSrc"]) == (
        "11:22:33:44:55:66", "10.0.0.1")
    assert a["ARP_pDst"] == "10.0.0.2"
    i = rows[1]
    assert (i["net_icmp_type"], i["net_icmp_code"]) == (8, 0)
    assert i["IP_proto"] == 1
    m = rows[2]
    assert m["SMB_version"] == 2
    assert m["SMB_operation"] == 9        # WRITE
    assert m["SMB_flags"] == "R"          # response bit
    assert (m["SMB_seqNumber"], m["SMB_treeID"],
            m["SMB_userID"]) == (7, 3, 5)


def test_impcap_llc_snap_ipx_parsers(spark, tmp_path):
    import struct as s
    from rsyslog_spark.streaming.pcap import impcap

    eth_hdr = bytes.fromhex("aabbccddeeff112233445566")
    # LLC+SNAP tunnelling IPv4/UDP (802.3 length field)
    inner_udp = s.pack(">HHHH", 1111, 514, 8 + 2, 0) + b"hi"
    inner_ip = (b"\x45\x00" + s.pack(">H", 20 + len(inner_udp))
                + b"\x00\x00\x00\x00" + bytes([64, 17]) + b"\x00\x00"
                + bytes([10, 9, 9, 1]) + bytes([10, 9, 9, 2]))
    snap = (b"\xaa\xaa\x03" + b"\x00\x00\x00" + b"\x08\x00"
            + inner_ip + inner_udp)
    llc_pkt = eth_hdr + s.pack(">H", len(snap)) + snap
    # LLC 0xE0E0 IPX
    ipx = (b"\xff\xff" + s.pack(">H", 30) + bytes([2, 4])
           + s.pack(">I", 0xAABB) + bytes.fromhex("0102030405a6")
           + s.pack(">H", 0x451) + s.pack(">I", 0xCCDD)
           + bytes.fromhex("0a0b0c0d0e0f") + s.pack(">H", 0x452))
    ipx_llc = b"\xe0\xe0\x03" + ipx
    ipx_pkt = eth_hdr + s.pack(">H", len(ipx_llc)) + ipx_llc
    (tmp_path / "llc.pcap").write_bytes(
        TestImpcap._pcap([llc_pkt, ipx_pkt]))
    rows = {r["pkt_idx"]: r
            for r in impcap(spark, str(tmp_path)).collect()}
    a = rows[0]
    assert a["ETH_len"] == len(snap) and a["ETH_type"] == len(snap)
    assert (a["LLC_dsap"], a["LLC_ssap"], a["LLC_ctrl"]) == (
        0xAA, 0xAA, 3)
    assert (a["SNAP_oui"], a["SNAP_ethType"]) == (0, 0x0800)
    assert (a["net_src_ip"], a["net_dst_port"]) == ("10.9.9.1", 514)
    assert bytes(a["payload"]) == b"hi"
    b = rows[1]
    assert (b["LLC_dsap"], b["LLC_ssap"]) == (0xE0, 0xE0)
    assert (b["IPX_transCtrl"], b["IPX_type"]) == (2, 4)
    assert (b["IPX_dest_net"], b["IPX_src_net"]) == (0xAABB, 0xCCDD)
    assert b["IPX_dest_node"] == "01:02:03:04:05:a6"
    assert (b["IPX_dest_socket"], b["IPX_src_socket"]) == (
        0x451, 0x452)


def test_apply_max_message_size_reference_golden():
    """Byte-exact vs tests/imptcp-discard-truncated-msg.sh: 128-byte
    $MaxMessageSize cut with discardTruncatedMsg dropping the
    remainder; without the option the remainder continues as further
    messages (tcps_sess.c truncation)."""
    from rsyslog_spark.streaming.bridges import apply_max_message_size

    long = (b"<120> 2011-03-01T11:22:12Z host tag: this is a way to "
            b"long message that has abcdefghijklmnopqrstuvwxyz test1 "
            b"test2 test3 test4 test5 test6 test7 test8 test9 test10 "
            b"test11 test12 test13 test14 test15 test16")
    short = b"<120> 2011-03-01T11:22:12Z host tag: this is a way to long message"
    out = apply_max_message_size([long, short, long, short], 128, True)
    want_trunc = (b"<120> 2011-03-01T11:22:12Z host tag: this is a "
                  b"way to long message that has "
                  b"abcdefghijklmnopqrstuvwxyz test1 test2 test3 "
                  b"test4 t")
    assert out == [want_trunc, short, want_trunc, short]
    assert len(want_trunc) == 128
    # without discard: the remainder continues as further messages
    out2 = apply_max_message_size([long], 128, False)
    assert out2[0] == want_trunc and b"".join(out2) == long


def test_imuxsock_ccmiddle_golden(spark, tmp_path):
    """imuxsock_ccmiddle{,_root,_syssock}.sh: a control character in
    the MIDDLE of a unix-socket datagram is escaped on receive as
    '#' + 3-digit octal ($EscapeControlCharactersOnReceive;
    parser.c SanitizeMsg). Payload 'test 1\\t2' (syslog_caller.c:157)
    renders %msg% as ' test 1#0112' — EXPECTED copied verbatim.
    The reference default is escape-ON; the engine applies it when
    the directive is configured (divergent default documented at
    functions.strings.escape_on_receive)."""
    from pyspark.sql import functions as F

    from rsyslog_spark.config.rainerscript import load_config
    from rsyslog_spark.functions.strings import escape_on_receive
    from rsyslog_spark.parsers.chain import parse_syslog
    from rsyslog_spark.templates import compile_template_string

    sp = str(tmp_path / "testbench_socket")
    b = imuxsock(str(tmp_path / "spool"), sock_path=sp,
                 flush_secs=0.2).start()
    try:
        tx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
        # liblogging-stdlog local1.info datagram shape: PRI 142,
        # TAG, message body with the mid-message TAB
        tx.sendto(b"<142>Mar  1 10:00:00 tag: test 1\t2", sp)
        tx.close()
        df = _drain(b, spark, 1)
    finally:
        b.stop()
    lines = df.withColumn(
        "line", escape_on_receive(F.col("line"), controlchars=True))
    # reference parser.removeMsgFirstSpace default is OFF — the
    # leading space survives into %msg% (hence EXPECTED ' test ...')
    frame = parse_syslog(lines, remove_msg_first_space=False)
    got = frame.select(compile_template_string("%msg:%\n").col()
                       .alias("o")).first()["o"]
    assert got == " test 1#0112\n"
    del load_config


def test_ccmiddle_config_e2e(spark, tmp_path):
    """The same ccmiddle golden through a config: escape directive +
    local1.* PRI selector + %msg:% template, EXPECTED cmp_exact
    ' test 1#0112' (imuxsock_ccmiddle.sh config shape)."""
    import os

    from rsyslog_spark.config.runtime import run_config_batch

    src = tmp_path / "in.log"
    src.write_text("<142>Mar  1 10:00:00 tag: test 1\t2\n"
                   "<13>Mar  1 10:00:00 h other: skipped\n")
    out = tmp_path / "out"
    conf = f'''
$EscapeControlCharactersOnReceive on
global(parser.removeMsgFirstSpace="off")
template(name="outfmt" type="string" string="%msg:%\\n")
ruleset(name="m") {{
  local1.* action(type="omfile" file="{out}" template="outfmt")
}}
input(type="imfile" file="{src}" ruleset="m")
'''
    run_config_batch(spark, conf)
    got = "".join(
        open(out / p).read() for p in sorted(os.listdir(out))
        if p.startswith("part"))
    assert got == " test 1#0112\n"


def test_regex_framing_oversize_golden():
    """imptcp_framing_regex-oversize.sh: framing.delimiter.regex
    byte-walk (imptcp.c processDataRcvd_regexFraming:1039-1086) over
    the reference's own testdata, with maxMessageSize=256 — frames
    end where the regex matches a new line, a 512-byte (2x) run
    without a delimiter force-splits, and the oversize policy
    truncates each emitted frame to 256. EXPECTED block mined
    verbatim from the .sh."""
    import re

    from rsyslog_spark.streaming.bridges import RegexFramer

    ref = "/root/reference/tests"
    data = open(f"{ref}/testsuites/"
                "imptcp_framing_regex-oversize.testdata", "rb").read()
    sh = open(f"{ref}/imptcp_framing_regex-oversize.sh").read()
    expected = re.search(r"export EXPECTED='(.*?)'\n", sh,
                         re.S).group(1)

    fr = RegexFramer(
        "^<[0-9]{2}>(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)",
        max_line=256)
    frames = []
    # feed in awkward chunk sizes — the walk must be chunk-invariant
    for i in range(0, len(data), 7):
        frames += fr.feed(data[i:i + 7])
    # the trailing partial frame (testdata's 'test end' line) is
    # DROPPED at close — it is absent from the reference EXPECTED
    # oversize truncate mode: cut at maxMessageSize, drop the rest
    rendered = "\n".join(
        "NEWMSG: " + f[:256].decode().rstrip("\n") for f in frames)
    assert rendered == expected

    # chunk-invariance: one-shot feed yields the same frames
    fr2 = RegexFramer(
        "^<[0-9]{2}>(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)",
        max_line=256)
    assert fr2.feed(data) == frames


def test_regex_framing_bridge_e2e(spark, tmp_path):
    """The same regex framing through the live TCP bridge: messages
    with embedded newlines frame on the header regex (socket e2e,
    multi-line xml-ish payload kept inside one message); the final
    unterminated frame drops at close, like the reference."""
    payload = (b"<33>Mar  1 01:00:00 172.20.245.8 tag test1\n"
               b"<33>Mar  1 01:00:00 172.20.245.8 tag xml\n"
               b"<test/>\n"
               b"<33>Mar  1 01:00:00 172.20.245.8 tag trailing\n")
    b = imtcp(str(tmp_path / "spool"),
              framing_regex=r"^<[0-9]{2}>(Jan|Feb|Mar|Apr|May|Jun|"
                            r"Jul|Aug|Sep|Oct|Nov|Dec)",
              flush_secs=0.2).start()
    try:
        tx = socket.create_connection(("127.0.0.1", b.port))
        tx.sendall(payload)
        tx.close()
        df = _drain(b, spark, 2)
        lines = sorted(r.line for r in df.collect())
    finally:
        b.stop()
    assert lines == [
        "<33>Mar  1 01:00:00 172.20.245.8 tag test1",
        "<33>Mar  1 01:00:00 172.20.245.8 tag xml\n<test/>",
    ]


def test_imtuxedoulog_data_golden(spark, tmp_path):
    """imtuxedoulog_data.sh — the reference's 5 ULOG lines, field-
    exact against its Protocol23Format EXPECTED block (tag= param →
    APP-NAME slot, procid drops the trailing '.0', gtrid prefix
    dropped, ECID → [ECID="..."] SD with the post-colon space kept
    in MSG, millisecond time from the line + date from the file
    name). Byte-compare is per-field: the reference's RFC3339 render
    of the tz-less ULOG stamp omits the offset, a datetime.c quirk
    the engine's rfc3339 (always +00:00) documents away."""
    from rsyslog_spark.streaming.bridges import imtuxedoulog

    (tmp_path / "tux.090314").write_text(
        "164313.15.tst-tmsm1!ARTIMPP_UDB.40042721.1.0: gtrid x0 "
        "x5624ee75 x1c88a0f: TRACE:at:    } tpfree\n"
        "164313.151.tst-tmsm1!ARTIMPP_UDB.40042722.1.0: gtrid x0 "
        "x5624ee75 x1c88a0f: ECID <000001833E1D4i^5pVl3iY00f02M003UF^>"
        ": TRACE:at:    } tpfree\n"
        "164313.152.tst-tmsm1!ARTIMPP_UDB.40042722.1.0: gtrid x0 "
        "x5624ee75 x1c88a0f: ECID <000001833E1D4i^5pVl3iY00f02B003UF^>"
        ": TRACE:at:    { tpcommit(0x0)\n"
        "164313.153.tst-tmsm1!ARTIMPP_UDB.40042722.1.0: ECID "
        "<000001833E1D4i^5pVl3iY00f02M003SF^>: TRACE:at:    "
        "} tpcommit = 1\n"
        "164313.154.tst-tmsm1!ARTIMPP_UDB.40042722.1.0: ECID "
        "<000001833E1D4i^5pVl3iY00f02M003VF^>: TRACE:at:    "
        '{ tpacall("ARTIGW_SVC_REPLY_00700_02101", 0x110405698, '
        "0, 0xc)\n")
    rows = (imtuxedoulog(spark, str(tmp_path / "tux.090314"),
                         tag="domain", facility=16, severity=6)
            .orderBy("timereported").collect())
    assert len(rows) == 5
    assert all(r.pri == 134 for r in rows)          # local0.info
    assert all(r.app_name == "domain" for r in rows)
    assert all(r.hostname == "tst-tmsm1" for r in rows)
    assert rows[0].procid == "ARTIMPP_UDB.40042721.1"
    assert all(r.procid == "ARTIMPP_UDB.40042722.1"
               for r in rows[1:])
    assert rows[0].structured_data is None           # renders "-"
    assert rows[0].msg == "TRACE:at:    } tpfree"
    assert (rows[1].structured_data ==
            '[ECID="000001833E1D4i^5pVl3iY00f02M003UF^"]')
    assert rows[1].msg == " TRACE:at:    } tpfree"   # double space
    assert rows[4].msg == (' TRACE:at:    { tpacall('
                           '"ARTIGW_SVC_REPLY_00700_02101", '
                           '0x110405698, 0, 0xc)')
    # 2025-09-03 from the FILE NAME; ms precision from the line
    assert str(rows[0].timereported) == "2014-09-03 16:43:13.150000"
    assert str(rows[1].timereported) == "2014-09-03 16:43:13.151000"


def test_imkubernetes_cri_partial_modes(spark, tmp_path):
    """imkubernetes-cri-partial-{accept,bound,split,hard-cap}.sh:
    the CRI partial accumulator NEVER truncates at maxMessageSize —
    completed records pass whole to the core oversize policy (accept
    keeps 233 chars, truncate/split happen downstream) — but a P run
    reaching the 10x hard cap force-submits the first 10*N bytes and
    discards the rest of that logical record including its closing F
    ('closing-tail-must-not-standalone'). Assertions mirror the
    reference's python oracles."""
    from rsyslog_spark.streaming.bridges import imkubernetes

    frag = "partial-fragment-0123456789"        # 27 chars

    def logdir(name):
        d = (tmp_path / name / "pods"
             / "namespace-name1_pod-name1_uid1" / "container-a")
        d.mkdir(parents=True)
        return d

    # --- accept / bound / split source: 8 fragments + F tail ------
    d = logdir("small")
    (d / "0.log").write_text(
        "".join(f"2026-04-20T10:00:{i:02d}.000000000Z stdout P "
                f"{frag}\n" for i in range(1, 9))
        + "2026-04-20T10:00:30.000000000Z stdout F closing-tail-kept\n"
        + "2026-04-20T10:00:31.000000000Z stdout F after accepted "
          "partial\n")
    rows = (imkubernetes(spark,
                         str(tmp_path / "small" / "pods" / "*" / "*"
                             / "*.log"),
                         max_message_size=128)
            .orderBy("timegenerated").collect())
    assert len(rows) == 2
    assert rows[0].line == frag * 8 + "closing-tail-kept"
    assert len(rows[0].line) > 128          # accumulator didn't cut
    assert rows[1].line == "after accepted partial"
    assert all(r.log_format == "cri" and r.stream == "stdout"
               and r.pod == "pod-name1" for r in rows)
    # truncate/split are the CORE oversize policy over these lines
    # (goldens TestOversizeMsgPolicy) — bound expects [:128]:
    assert (rows[0].line[:128]
            == (frag * 8)[:128])
    assert "closing-tail" not in rows[0].line[:128]

    # --- hard cap: 50 fragments (1350 chars) > 10*128=1280 --------
    d = logdir("big")
    (d / "0.log").write_text(
        "".join(f"2026-04-20T10:0{i // 60}:{i % 60:02d}."
                f"000000000Z stdout P {frag}\n"
                for i in range(50))
        + "2026-04-20T10:01:00.000000000Z stdout F "
          "closing-tail-must-not-standalone\n"
        + "2026-04-20T10:01:01.000000000Z stdout F after partial "
          "hard cap\n")
    rows = (imkubernetes(spark,
                         str(tmp_path / "big" / "pods" / "*" / "*"
                             / "*.log"),
                         max_message_size=128)
            .orderBy("timegenerated").collect())
    assert len(rows) == 2
    cap = 128 * 10
    assert rows[0].line == (frag * 50)[:cap]
    assert len(rows[0].line) == cap
    assert "closing-tail-must-not-standalone" not in rows[0].line
    assert rows[1].line == "after partial hard cap"


def test_fromhost_port_tuple(spark, tmp_path):
    """fromhost-port-tuple.sh: imtcp records the sender's SOURCE port
    — `$fromhost-ip & ":" & $fromhost-port` renders the client
    socket's local (ip, port) tuple."""
    b = imtcp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        tx = socket.create_connection(("127.0.0.1", b.port))
        my_port = tx.getsockname()[1]
        tx.sendall(b"<13>Mar  1 01:00:00 h tag msgnum:0\n")
        tx.close()
        df = _drain(b, spark, 1)
        r = df.collect()[0]
    finally:
        b.stop()
    assert r.fromhost == "127.0.0.1"
    assert r.fromhost_port == my_port


def test_imuxsock_trailing_lf(spark, tmp_path):
    """imuxsock_traillf.sh: a datagram with a trailing LF delivers
    the message WITHOUT it — EXPECTED ' test' (the reference strips
    exactly the terminator)."""
    sp = str(tmp_path / "tb_socket")
    b = imuxsock(str(tmp_path / "spool"), sock_path=sp,
                 flush_secs=0.2).start()
    try:
        tx = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
        tx.sendto(b"<142>Mar  1 01:00:00 tag:  test\n", sp)
        tx.close()
        df = _drain(b, spark, 1)
        line = df.collect()[0].line
    finally:
        b.stop()
    assert line == "<142>Mar  1 01:00:00 tag:  test"   # LF gone


def test_imhttp_gzip_post_payload(spark, tmp_path):
    """imhttp-post-payload-compress.sh: a gzip Content-Encoding POST
    body inflates before line framing; the JSON line arrives intact.
    A corrupt compressed body answers 400 and drops."""
    import gzip
    import urllib.error

    b = imhttp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        payload = (b'[{"foo":"bar","bar":"foo"},'
                   b'{"one":"two","three":"four"}]')
        for _ in range(5):
            req = urllib.request.Request(
                f"http://127.0.0.1:{b.port}/postrequest",
                data=gzip.compress(payload),
                headers={"Content-Encoding": "gzip"})
            assert urllib.request.urlopen(req).status == 200
        df = _drain(b, spark, 5)
        rows = df.collect()
        assert len(rows) == 5
        assert all(r.line == payload.decode() for r in rows)
        # corrupt gzip → 400, nothing emitted
        req = urllib.request.Request(
            f"http://127.0.0.1:{b.port}/postrequest",
            data=b"\x1f\x8b garbage not gzip",
            headers={"Content-Encoding": "gzip"})
        try:
            urllib.request.urlopen(req)
            raise AssertionError("corrupt body must answer 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert _drain(b, spark, 5).count() == 5
    finally:
        b.stop()


class _MockRedisStream:
    """RESP server with a minimal Streams engine: XADD, XREAD,
    XGROUP CREATE, XREADGROUP, XACK, XAUTOCLAIM, XINFO GROUPS —
    enough for the imhiredis-stream-*.sh golden shapes."""

    def __init__(self):
        self.streams: dict = {}     # key -> list[(id, [k,v,...])]
        self.groups: dict = {}      # (key,group) -> {"last": id,
                                    #  "pending": {id: consumer}}
        self._seq = [0]
        self._lock = threading.Lock()
        self.acked: list = []
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.srv.settimeout(0.2)
        self.port = self.srv.getsockname()[1]
        self._stop = threading.Event()
        self.t = threading.Thread(target=self._serve, daemon=True)
        self.t.start()

    # -- stream engine ------------------------------------------------
    def xadd(self, key, fields):
        with self._lock:
            self._seq[0] += 1
            eid = f"{1700000000000 + self._seq[0]}-0"
            self.streams.setdefault(key, []).append((eid, fields))
            return eid

    @staticmethod
    def _after(eid, ref):
        def parts(x):
            a, _, b = x.partition("-")
            return (int(a), int(b or 0))
        return parts(eid) > parts(ref)

    # -- RESP plumbing ------------------------------------------------
    @staticmethod
    def _enc(v):
        if v is None:
            return b"*-1\r\n"
        if isinstance(v, bytes):
            return b"$%d\r\n%s\r\n" % (len(v), v)
        if isinstance(v, str):
            vb = v.encode()
            return b"$%d\r\n%s\r\n" % (len(vb), vb)
        if isinstance(v, int):
            return b":%d\r\n" % v
        out = b"*%d\r\n" % len(v)
        for x in v:
            out += _MockRedisStream._enc(x)
        return out

    def _serve(self):
        conns = []
        while not self._stop.is_set():
            try:
                conn, _ = self.srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(target=self._conn, args=(conn,),
                                 daemon=True)
            t.start()
            conns.append(conn)
        for c in conns:
            try:
                c.close()
            except OSError:
                pass

    def _conn(self, conn):
        f = conn.makefile("rb")
        try:
            while not self._stop.is_set():
                hdr = f.readline()
                if not hdr or not hdr.startswith(b"*"):
                    break
                args = []
                for _ in range(int(hdr[1:-2])):
                    ln = f.readline()
                    args.append(
                        f.read(int(ln[1:-2]) + 2)[:-2].decode())
                conn.sendall(self._dispatch(args))
        except (OSError, ValueError):
            pass
        finally:
            conn.close()

    def _dispatch(self, a):
        cmd = a[0].upper()
        enc = self._enc
        if cmd == "XADD":
            key = a[1]
            i = a.index("*") + 1      # skips MAXLEN ~ N when present
            return enc(self.xadd(key, a[i:]))
        if cmd == "XGROUP" and a[1].upper() == "CREATE":
            key, group, start = a[2], a[3], a[4]
            gk = (key, group)
            if gk in self.groups:
                return b"-BUSYGROUP Consumer Group name exists\r\n"
            last = "0-0"
            if start == "$":
                ents = self.streams.get(key, [])
                last = ents[-1][0] if ents else "0-0"
            elif start != "0":
                last = start
            self.groups[gk] = {"last": last, "pending": {}}
            return b"+OK\r\n"
        if cmd == "XREVRANGE":
            key = a[1]
            ents = self.streams.get(key, [])
            if not ents:
                return enc([])
            return enc([[ents[-1][0], ents[-1][1]]])
        if cmd == "XREAD":
            i = a.index("STREAMS")
            key, ref = a[i + 1], a[i + 2]
            got = [e for e in self.streams.get(key, [])
                   if self._after(e[0], ref)][:10]
            if not got:
                return enc(None)
            return enc([[key, [[i2, fl] for i2, fl in got]]])
        if cmd == "XREADGROUP":
            group, consumer = a[2], a[3]
            i = a.index("STREAMS")
            key = a[i + 1]
            gk = (key, group)
            g = self.groups.get(gk)
            if g is None:
                return (b"-NOGROUP No such consumer group\r\n")
            got = [e for e in self.streams.get(key, [])
                   if self._after(e[0], g["last"])][:10]
            if not got:
                return enc(None)
            g["last"] = got[-1][0]
            for eid, _fl in got:
                g["pending"][eid] = consumer
            return enc([[key, [[i2, fl] for i2, fl in got]]])
        if cmd == "XACK":
            key, group, eid = a[1], a[2], a[3]
            g = self.groups.get((key, group), {"pending": {}})
            hit = g["pending"].pop(eid, None)
            if hit is not None:
                self.acked.append(eid)
            return enc(1 if hit is not None else 0)
        if cmd == "XAUTOCLAIM":
            key, group, consumer = a[1], a[2], a[3]
            g = self.groups.get((key, group))
            if g is None:
                return b"-NOGROUP no such group\r\n"
            ids = sorted(g["pending"])
            ents = [e for e in self.streams.get(key, [])
                    if e[0] in ids]
            for eid, _fl in ents:
                g["pending"][eid] = consumer
            return enc(["0-0",
                        [[i2, fl] for i2, fl in ents], []])
        if cmd == "XINFO" and a[1].upper() == "GROUPS":
            key = a[2]
            out = []
            for (k, gname), g in self.groups.items():
                if k == key:
                    out.append(["name", gname,
                                "pending", len(g["pending"])])
            return enc(out)
        return b"+OK\r\n"

    def close(self):
        self._stop.set()
        try:
            self.srv.close()
        except OSError:
            pass


def test_imhiredis_stream_only_new_entries(spark, tmp_path):
    """imhiredis-stream.sh: readFrom '$' (default) skips entries that
    existed before startup; new XADDs flow with $!msg from the entry
    fields."""
    from rsyslog_spark.streaming.bridges import imhiredis

    srv = _MockRedisStream()
    for i in (1, 2, 3):
        srv.xadd("mystream", ["msg", f"message{i}"])
    b = imhiredis(str(tmp_path / "spool"), port=srv.port,
                  key="mystream", mode="stream",
                  poll_secs=0.1, flush_secs=0.2).start()
    try:
        time.sleep(0.8)     # listener live, pre-existing skipped
        for i in (4, 5, 6):
            srv.xadd("mystream", ["msg", f"message{i}"])
        df = _drain(b, spark, 3)
        rows = df.collect()
        got = sorted(json.loads(r.json)["msg"] for r in rows)
        assert got == ["message4", "message5", "message6"], got
        assert all("message1" not in (r.line or "") for r in rows)
    finally:
        b.stop()
        srv.close()


def test_imhiredis_stream_from_beginning(spark, tmp_path):
    """imhiredis-stream-from-beginning.sh: stream.readFrom='0' reads
    the pre-existing entries too."""
    from rsyslog_spark.streaming.bridges import imhiredis

    srv = _MockRedisStream()
    for i in (1, 2, 3):
        srv.xadd("mystream", ["msg", f"message{i}"])
    b = imhiredis(str(tmp_path / "spool"), port=srv.port,
                  key="mystream", mode="stream",
                  stream_read_from="0",
                  poll_secs=0.1, flush_secs=0.2).start()
    try:
        df = _drain(b, spark, 3)
        got = sorted(json.loads(r.json)["msg"] for r in df.collect())
        assert got == ["message1", "message2", "message3"], got
    finally:
        b.stop()
        srv.close()


def test_imhiredis_stream_consumer_group_ack(spark, tmp_path):
    """imhiredis-stream-consumerGroup-ack.sh: XREADGROUP + XACK per
    entry (stream.ack default on) — the pending list drains."""
    from rsyslog_spark.streaming.bridges import imhiredis

    srv = _MockRedisStream()
    b = imhiredis(str(tmp_path / "spool"), port=srv.port,
                  key="s1", mode="stream",
                  stream_consumer_group="g1",
                  stream_consumer_name="c1",
                  stream_read_from="0",
                  poll_secs=0.1, flush_secs=0.2).start()
    try:
        for i in range(4):
            srv.xadd("s1", ["msg", f"m{i}"])
        df = _drain(b, spark, 4)
        assert df.count() == 4
        deadline = time.time() + 5
        while time.time() < deadline and len(srv.acked) < 4:
            time.sleep(0.1)
        assert len(srv.acked) == 4
        assert not srv.groups[("s1", "g1")]["pending"]
    finally:
        b.stop()
        srv.close()


def test_imhiredis_stream_consumer_group_noack(spark, tmp_path):
    """imhiredis-stream-consumerGroup-noack.sh: stream.ack='off'
    leaves entries pending."""
    from rsyslog_spark.streaming.bridges import imhiredis

    srv = _MockRedisStream()
    b = imhiredis(str(tmp_path / "spool"), port=srv.port,
                  key="s2", mode="stream",
                  stream_consumer_group="g2",
                  stream_read_from="0", stream_ack=False,
                  poll_secs=0.1, flush_secs=0.2).start()
    try:
        for i in range(3):
            srv.xadd("s2", ["msg", f"m{i}"])
        df = _drain(b, spark, 3)
        assert df.count() == 3
        assert not srv.acked
        assert len(srv.groups[("s2", "g2")]["pending"]) == 3
    finally:
        b.stop()
        srv.close()


def test_imhiredis_stream_autoclaim_reclaims(spark, tmp_path):
    """imhiredis-stream-consumerGroup-reclaim.sh: entries left
    PENDING by a dead consumer re-deliver through XAUTOCLAIM when
    stream.autoclaimIdleTime is set."""
    from rsyslog_spark.streaming.bridges import imhiredis

    srv = _MockRedisStream()
    # simulate a dead consumer: group exists with pending entries
    for i in range(2):
        srv.xadd("s3", ["msg", f"stale{i}"])
    srv.groups[("s3", "g3")] = {
        "last": max(e[0] for e in srv.streams["s3"]),
        "pending": {e[0]: "dead" for e in srv.streams["s3"]}}
    b = imhiredis(str(tmp_path / "spool"), port=srv.port,
                  key="s3", mode="stream",
                  stream_consumer_group="g3",
                  stream_consumer_name="alive",
                  stream_autoclaim_idle_time=10,
                  stream_read_from="0",
                  poll_secs=0.1, flush_secs=0.2).start()
    try:
        df = _drain(b, spark, 2)
        got = sorted(json.loads(r.json)["msg"] for r in df.collect())
        assert got == ["stale0", "stale1"], got
    finally:
        b.stop()
        srv.close()


def test_imhiredis_stream_readfrom_too_long_rejected(tmp_path):
    """imhiredis-stream-readfrom-too-long.sh: a readFrom value past
    the 43-char stream-index maximum is a config error."""
    import pytest
    from rsyslog_spark.streaming.bridges import imhiredis

    with pytest.raises(ValueError, match="readFrom"):
        imhiredis(str(tmp_path / "spool"), key="k", mode="stream",
                  stream_read_from="9" * 50)


def test_imhiredis_stream_config_binding(spark, tmp_path):
    """input(type=imhiredis mode=stream stream.*=...) through
    run_config_stream: $!msg renders from the entry fields."""
    import os
    from rsyslog_spark.config.runtime import run_config_stream

    srv = _MockRedisStream()
    srv.xadd("cfgstream", ["msg", "hello-cfg"])
    out = tmp_path / "out"
    conf = f'''
input(type="imhiredis" server="127.0.0.1" port="{srv.port}"
      key="cfgstream" mode="stream" stream.readFrom="0"
      ruleset="redis" spool="{tmp_path}/spool")
template(name="outfmt" type="string" string="%$!msg%\\n")
ruleset(name="redis") {{
  action(type="omfile" file="{out}" template="outfmt")
}}
'''
    try:
        run_config_stream(spark, conf,
                          checkpoint=str(tmp_path / "ck"),
                          drain_grace=3.0)
        lines = []
        for fme in sorted(os.listdir(out)):
            if fme.startswith("part"):
                lines += open(out / fme).read().splitlines()
        assert lines == ["hello-cfg"]
    finally:
        srv.close()


def test_tls_setup_error_shapes(tmp_path):
    """imtcp-tls-ossl-error-{ca,cert,key}.sh: missing/broken TLS
    material fails config-time with the reference's diagnostic
    shapes ('Error: <what> could not be accessed' + an OpenSSL
    error-stack line)."""
    import pytest
    from rsyslog_spark.streaming.gtls import (
        TLSConfig, TLSSetupError, server_context)

    good_cert = tmp_path / "c.crt"
    good_cert.write_text("not really a cert")
    # missing certificate file
    with pytest.raises(TLSSetupError,
                       match="Certificate file could not be"):
        server_context(TLSConfig(
            certfile=str(tmp_path / "missing.crt"),
            keyfile=str(tmp_path / "missing.key")))
    # cert present, key missing/invalid → Key error
    with pytest.raises(TLSSetupError, match="Key could not be"):
        server_context(TLSConfig(
            certfile=str(good_cert),
            keyfile=str(tmp_path / "missing.key")))
    # CA file missing under certvalid
    import subprocess
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "ed25519", "-nodes",
         "-keyout", str(tmp_path / "s.key"),
         "-out", str(tmp_path / "s.crt"), "-subj", "/CN=s",
         "-days", "2"], capture_output=True)
    with pytest.raises(TLSSetupError,
                       match="CA certificate could not be"):
        server_context(TLSConfig(
            certfile=str(tmp_path / "s.crt"),
            keyfile=str(tmp_path / "s.key"),
            cafile=str(tmp_path / "missing-ca.crt"),
            authmode="x509/certvalid"))


def test_omhiredis_stream_xadd_roundtrip(spark, tmp_path):
    """omhiredis-stream.sh: mode='stream' XADDs each rendered
    message under the configured key (msg field), creating the
    stream; entries read back in order, and the MAXLEN form still
    lands entries."""
    from rsyslog_spark.streaming.transports import omhiredis_sink

    srv = _MockRedisStream()
    try:
        df = spark.createDataFrame(
            [(f"message{i}",) for i in range(4)],
            "line string").coalesce(1)
        omhiredis_sink("127.0.0.1", srv.port, mode="stream",
                       key="outStream")(df, 0)
        ents = srv.streams.get("outStream", [])
        assert [fl for _id, fl in ents] == [
            ["msg", f"message{i}"] for i in range(4)]
        omhiredis_sink("127.0.0.1", srv.port, mode="stream",
                       key="outStream", stream_maxlen=100)(df, 0)
        assert len(srv.streams["outStream"]) == 8
    finally:
        srv.close()


def test_apply_keepalive_socket_options():
    """nsd_ptcp.c:904 EnableKeepAlive analog: SO_KEEPALIVE set, then
    TCP_KEEPCNT/KEEPIDLE/KEEPINTVL where >0; values read back via
    getsockopt on Linux."""
    from rsyslog_spark.streaming.bridges import apply_keepalive

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    cli = socket.create_connection(srv.getsockname())
    conn, _ = srv.accept()
    try:
        applied = apply_keepalive(cli, True, probes=3, idle_time=30,
                                  intvl=10)
        assert applied.get("keepalive") is True
        assert cli.getsockopt(socket.SOL_SOCKET,
                              socket.SO_KEEPALIVE) == 1
        if hasattr(socket, "TCP_KEEPIDLE"):
            assert applied["time"] == 30
            assert cli.getsockopt(socket.IPPROTO_TCP,
                                  socket.TCP_KEEPIDLE) == 30
        if hasattr(socket, "TCP_KEEPCNT"):
            assert cli.getsockopt(socket.IPPROTO_TCP,
                                  socket.TCP_KEEPCNT) == 3
        if hasattr(socket, "TCP_KEEPINTVL"):
            assert cli.getsockopt(socket.IPPROTO_TCP,
                                  socket.TCP_KEEPINTVL) == 10
        # disabled → recorded no-op, socket untouched
        s2 = socket.socket()
        assert apply_keepalive(s2, False, 9, 9, 9) == {}
        assert s2.getsockopt(socket.SOL_SOCKET,
                             socket.SO_KEEPALIVE) == 0
        s2.close()
    finally:
        cli.close()
        conn.close()
        srv.close()


def test_imtcp_keepalive_session(spark, tmp_path):
    """imtcp keepalive params bind and apply per accepted session
    (imtcp.c:269-272 inppdescr)."""
    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), keepalive=True,
              keepalive_time=25, keepalive_probes=4,
              flush_secs=0.2).start()
    try:
        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(b"<13>ka line\n")
        df = _drain(b, spark, 1)
        assert df.first().line == "<13>ka line"
        assert b.keepalive_applied.get("keepalive") is True
        if hasattr(socket, "TCP_KEEPIDLE"):
            assert b.keepalive_applied.get("time") == 25
        c.close()
    finally:
        b.stop()


def test_udp_z_selector_config_e2e(spark, tmp_path):
    """'@(z5)host:port' legacy selector end-to-end: run_config_batch
    parses the UDP selector with compression flags, omfwd compresses
    datagrams >60 bytes, imudp inflates them (parser.c:262)."""
    from rsyslog_spark.config.runtime import run_config_batch
    from rsyslog_spark.streaming.bridges import imudp

    b = imudp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        src = tmp_path / "in.log"
        long_msg = "udpz " + "payload " * 15
        src.write_text(
            f"<13>Mar  1 10:00:00 h1 app: {long_msg}\n")
        run_config_batch(
            spark,
            f"*.* @(z5)127.0.0.1:{b.port}\n"
            f'input(type="imfile" file="{src}")\n')
        df = _drain(b, spark, 1)
        got = df.first().line
        assert long_msg in got, got
    finally:
        b.stop()


def test_imtcp_addtl_frame_delimiter_nul(spark, tmp_path):
    """imptcp_addtlframedelim.sh: addtlFrameDelimiter='0' — frames
    end at NUL as well as LF (tcps_sess.c:635 'e.g. for
    netscreen')."""
    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), addtl_frame_delimiter=0,
              flush_secs=0.2).start()
    try:
        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(b"<129>msg one\x00<129>msg two\x00<129>msg three\n")
        c.close()
        df = _drain(b, spark, 3)
        assert sorted(r.line for r in df.collect()) == [
            "<129>msg one", "<129>msg three", "<129>msg two"]
    finally:
        b.stop()


def test_imtcp_no_octet_counted_framing(spark, tmp_path):
    """imptcp_no_octet_counted.sh: supportOctetCountedFraming='off'
    keeps digit-leading payloads intact — '25 ...' is DATA, not an
    octet count."""
    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), support_octet_counted=False,
              flush_secs=0.2).start()
    try:
        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(b"25 looks like a count\n17 another one\n")
        c.close()
        df = _drain(b, spark, 2)
        assert sorted(r.line for r in df.collect()) == [
            "17 another one", "25 looks like a count"]
    finally:
        b.stop()


def test_imtcp_maxsessions_drops_excess(spark, tmp_path):
    """imptcp_maxsessions.sh: sessions over the cap are refused with
    'too many tcp sessions - dropping incoming request'
    (tcpsrv.c:754); held sessions keep working."""
    import time as _t
    import warnings

    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), max_sessions=2,
              flush_secs=0.2).start()
    holders = []
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            for _ in range(2):
                h = socket.create_connection(("127.0.0.1", b.port))
                holders.append(h)
            _t.sleep(0.5)   # both sessions registered
            extra = socket.create_connection(("127.0.0.1", b.port))
            deadline = _t.time() + 5
            while _t.time() < deadline and b.dropped_sessions < 1:
                _t.sleep(0.1)
            assert b.dropped_sessions == 1
            extra.close()
        assert any("too many tcp sessions" in str(x.message)
                   for x in w)
        # the held sessions still deliver
        holders[0].sendall(b"<13>held one\n")
        holders[1].sendall(b"<13>held two\n")
        df = _drain(b, spark, 2)
        assert sorted(r.line for r in df.collect()) == [
            "<13>held one", "<13>held two"]
        # closing a held session frees a slot
        holders[0].close()
        deadline = _t.time() + 5
        ok = False
        while _t.time() < deadline and not ok:
            _t.sleep(0.2)
            c = socket.create_connection(("127.0.0.1", b.port))
            _t.sleep(0.3)
            before = b.dropped_sessions
            c.sendall(b"<13>after free\n")
            _t.sleep(0.3)
            ok = b.dropped_sessions == before
            c.close()
        assert ok, "freed slot was not reusable"
    finally:
        for h in holders:
            try:
                h.close()
            except OSError:
                pass
        b.stop()


def test_imtcp_nul_rawmsg_escape(spark, tmp_path):
    """imptcp-NUL-rawmsg.sh: NUL bytes inside a message escape to
    '#000' in %rawmsg% when control-char escaping is on
    (parser.c SanitizeMsg; the engine's escaping is opt-in,
    COVERAGE §2.2 divergent-default row)."""
    from rsyslog_spark.config.runtime import run_config_stream
    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), flush_secs=0.2).start()
    port = b.port
    c = socket.create_connection(("127.0.0.1", port))
    c.sendall(b"<167>Mar  6 16:57:54 172.20.245.8 test: "
              b"msgnum:0 \x00 test message\n"
              b"<167>Mar  6 16:57:54 172.20.245.8 \x00test: "
              b"msgnum:1 test message\n")
    c.close()
    try:
        df = _drain(b, spark, 2)
        raws = sorted(r.line for r in df.collect())
        assert any("\x00" in r for r in raws)   # bridge preserves NUL
    finally:
        b.stop()

    # config path with escaping enabled renders #000 in rawmsg
    import threading
    import time as _time
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port2 = probe.getsockname()[1]
    probe.close()
    out = tmp_path / "out"
    conf = f'''
$EscapeControlCharactersOnReceive on
template(name="outfmt" type="string" string="%rawmsg%\\n")
ruleset(name="m") {{
  :msg, contains, "msgnum:" action(type="omfile" file="{out}"
                                   template="outfmt")
}}
input(type="imtcp" port="{port2}" address="127.0.0.1" ruleset="m"
      spool="{tmp_path}/spool2")
'''

    def send():
        for _ in range(100):
            try:
                cc = socket.create_connection(("127.0.0.1", port2),
                                              timeout=0.2)
                cc.sendall(
                    b"<167>Mar  6 16:57:54 172.20.245.8 test: "
                    b"msgnum:0 \x00 test message\n"
                    b"<167>Mar  6 16:57:54 172.20.245.8 \x00test: "
                    b"msgnum:1 test message\n")
                cc.close()
                return
            except OSError:
                _time.sleep(0.1)

    th = threading.Thread(target=send)
    th.start()
    run_config_stream(spark, conf, checkpoint=str(tmp_path / "ck"),
                      drain_grace=4.0)
    th.join(timeout=10)
    got = sorted(r.value for r in
                 spark.read.text(str(out)).collect())
    assert got == [
        "<167>Mar  6 16:57:54 172.20.245.8 #000test: "
        "msgnum:1 test message",
        "<167>Mar  6 16:57:54 172.20.245.8 test: "
        "msgnum:0 #000 test message",
    ], got


def test_imtcp_connection_notify_msgs(spark, tmp_path):
    """imptcp-connection-msg-received.sh: with
    notifyOnConnection{Open,Close}='on', the LOG_INFO lifecycle
    internals route through the config — the catch-all receives
    'imptcp: connection established' and 'imptcp: session on
    socket ... closed'; the msg-filtered file gets only the data
    message. Off by default (imptcp-connection-msg-disabled.sh)."""
    import threading
    import time as _time

    from rsyslog_spark.config.runtime import run_config_stream

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    out1, out2 = tmp_path / "catchall", tmp_path / "filtered"
    conf = f'''
template(name="outfmt" type="string" string="%msg%\\n")
ruleset(name="m") {{
  :msg, contains, "msgnum:" action(type="omfile" file="{out2}"
                                   template="outfmt")
  action(type="omfile" file="{out1}"
         template="RSYSLOG_FileFormat")
}}
input(type="imtcp" port="{port}" address="127.0.0.1" ruleset="m"
      notifyonconnectionclose="on" notifyonconnectionopen="on"
      spool="{tmp_path}/spool")
'''

    def send():
        for _ in range(100):
            try:
                c = socket.create_connection(("127.0.0.1", port),
                                             timeout=0.2)
                c.sendall(b"<129>Mar 10 01:00:00 172.20.245.8 "
                          b"tag: msgnum:1\n")
                c.close()
                return
            except OSError:
                _time.sleep(0.1)

    th = threading.Thread(target=send)
    th.start()
    run_config_stream(spark, conf, checkpoint=str(tmp_path / "ck"),
                      drain_grace=4.0)
    th.join(timeout=10)

    def parts(d):
        import os as _os
        if not _os.path.isdir(d):
            return ""
        return "".join(open(_os.path.join(d, p)).read()
                       for p in sorted(_os.listdir(d))
                       if p.startswith("part"))

    catch = parts(str(out1))
    assert "imptcp: connection established" in catch, catch
    assert "imptcp: session on socket" in catch \
        and "closed" in catch, catch
    assert "msgnum:1" in catch
    filt = parts(str(out2))
    assert "msgnum:1" in filt
    assert "imptcp" not in filt


def test_imhttp_auth_basic_and_apikey(spark, tmp_path):
    """imhttp route auth (imhttp.c routeAuthHandler:1216 — explicit
    Basic wins, 'Authorization: ApiKey tok' is the fallback; 401 w/
    Basic challenge when htpasswd auth is configured; 2026-04-17
    refactor + 2026-06-26 apikey-after-basic-failure fix)."""
    import base64
    import hashlib
    import urllib.error
    import urllib.request

    from rsyslog_spark.streaming.bridges import imhttp

    htpw = tmp_path / "users.htpasswd"
    sha = base64.b64encode(
        hashlib.sha1(b"secret").digest()).decode()
    htpw.write_text(f"# comment line\nalice:{{SHA}}{sha}\n"
                    "bob:plainpw\n")
    keys = tmp_path / "keys.txt"
    keys.write_text("# tokens\ntok-123\n")

    b = imhttp(str(tmp_path / "spool"),
               basic_auth_file=str(htpw),
               api_key_file=str(keys), flush_secs=0.2).start()
    url = f"http://127.0.0.1:{b.port}/postrequest"

    def post(auth=None):
        req = urllib.request.Request(url, data=b"<13>authed line\n",
                                     method="POST")
        if auth:
            req.add_header("Authorization", auth)
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                return resp.status, dict(resp.headers)
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers)

    try:
        # no credentials → 401 with Basic challenge
        code, hdrs = post()
        assert code == 401
        assert "Basic" in hdrs.get("WWW-Authenticate", "")
        # bad basic → 401; good basic ({SHA} and plain) → 200
        bad = base64.b64encode(b"alice:wrong").decode()
        assert post(f"Basic {bad}")[0] == 401
        good = base64.b64encode(b"alice:secret").decode()
        assert post(f"Basic {good}")[0] == 200
        plain = base64.b64encode(b"bob:plainpw").decode()
        assert post(f"Basic {plain}")[0] == 200
        # api key fallback
        assert post("ApiKey tok-123")[0] == 200
        assert post("ApiKey nope")[0] == 401
        df = _drain(b, spark, 3)
        assert df.count() == 3
        assert all(r.line == "<13>authed line"
                   for r in df.collect())
    finally:
        b.stop()


def test_imhttp_body_caps_and_zip_bomb(spark, tmp_path):
    """imhttp request hardening (contrib/imhttp 2026-04-24): an
    oversized Content-Length answers 413 before any body read or
    allocation, and a small compressed body that expands past the
    decompression cap (zip bomb) is refused at the cap via an
    incremental decompressobj loop — while legitimate bodies under
    both caps still flow."""
    import http.client
    import zlib

    from rsyslog_spark.streaming.bridges import imhttp

    b = imhttp(str(tmp_path / "spool"), flush_secs=0.2,
               max_body_bytes=64 * 1024,
               max_expanded_bytes=256 * 1024).start()

    def post(body: bytes, headers: dict | None = None,
             content_length: int | None = None) -> int:
        c = http.client.HTTPConnection("127.0.0.1", b.port,
                                       timeout=10)
        try:
            c.putrequest("POST", "/postrequest")
            hs = dict(headers or {})
            hs["Content-Length"] = str(
                len(body) if content_length is None
                else content_length)
            for k, v in hs.items():
                c.putheader(k, v)
            c.endheaders()
            if content_length is None:
                c.send(body)
            # oversized declarations send NOTHING — the server must
            # answer from the header alone
            return c.getresponse().status
        finally:
            c.close()

    try:
        # 100 MB Content-Length → 413 without reading a byte
        assert post(b"", content_length=100 * 1024 * 1024) == 413
        # negative / garbage lengths → 413 / 400
        assert post(b"", content_length=-5) == 413
        # body just over the wire cap → 413
        assert post(b"x" * (64 * 1024 + 1)) == 413
        # zip bomb: ~1 KB of deflate expanding to 4 MiB (cap 256 KiB)
        co = zlib.compressobj()
        bomb = b"".join(
            [co.compress(b"\0" * 65536) for _ in range(64)]
        ) + co.flush()
        assert len(bomb) < 64 * 1024
        assert post(bomb,
                    {"Content-Encoding": "deflate"}) == 413
        # corrupted compressed body → 400
        assert post(b"not deflate at all",
                    {"Content-Encoding": "deflate"}) == 400
        # legitimate small compressed body still flows
        ok = zlib.compress(b"<13>bounded line\n")
        assert post(ok, {"Content-Encoding": "deflate"}) == 200
        import gzip as _gz
        okz = _gz.compress(b"<13>gzip line\n")
        assert post(okz, {"Content-Encoding": "gzip"}) == 200
        df = _drain(b, spark, 2)
        assert sorted(r.line for r in df.collect()) == [
            "<13>bounded line", "<13>gzip line"]
    finally:
        b.stop()


def test_imhttp_htpasswd_apr1_and_crypt_fallback():
    """'$'-prefixed htpasswd entries: $apr1$ (htpasswd's default MD5
    scheme) validates via the pure-Python APR implementation — the
    stdlib crypt module never supported apr1 and is removed in
    Python 3.13 — and other '$' schemes warn-and-fail-closed when
    crypt is unavailable instead of silently rejecting."""
    import sys
    import warnings

    from rsyslog_spark.streaming.bridges import _apr1_crypt, imhttp

    # public apr1 vector (htpasswd -nbm with a pinned salt)
    stored = "$apr1$r31.....$HqJZimcKQFAMYayBlzkrA/"
    assert _apr1_crypt("myPassword", "r31.....") == stored
    assert imhttp._pw_ok("myPassword", stored)
    assert not imhttp._pw_ok("wrong", stored)
    # malformed apr1 entry fails closed
    assert not imhttp._pw_ok("myPassword", "$apr1$short")

    # non-apr1 '$' scheme with crypt missing: warn, fail closed
    saved = sys.modules.get("crypt")
    sys.modules["crypt"] = None  # makes 'import crypt' ImportError
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ok = imhttp._pw_ok("pw", "$6$salt$hash")
        assert not ok
        assert any("crypt" in str(x.message) for x in w)
    finally:
        if saved is None:
            sys.modules.pop("crypt", None)
        else:
            sys.modules["crypt"] = saved


def test_imhttp_no_auth_still_open(spark, tmp_path):
    """Without auth files every POST is admitted (routeAuthConfigured
    short-circuit)."""
    import urllib.request

    from rsyslog_spark.streaming.bridges import imhttp

    b = imhttp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{b.port}/postrequest",
            data=b"<13>open line\n", method="POST")
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
        df = _drain(b, spark, 1)
        assert df.first().line == "<13>open line"
    finally:
        b.stop()


def test_imtcp_invalid_limits_rejected(tmp_path):
    """ChangeLog 2026-04-12: invalid frame/session limits are
    config-load errors, not silent misbehavior (a negative
    maxSessions used to drop EVERY session)."""
    import pytest

    from rsyslog_spark.streaming.bridges import imtcp

    with pytest.raises(ValueError, match="maxSessions"):
        imtcp(str(tmp_path / "s1"), max_sessions=-1)
    with pytest.raises(ValueError, match="maxFrameSize"):
        imtcp(str(tmp_path / "s2"), max_frame_size=0)
    with pytest.raises(ValueError):
        imtcp(str(tmp_path / "s3"), max_sessions="abc")


def test_permitted_peer_wildcard_semantics():
    """PermittedPeer matching is the reference's COMPONENT-WISE
    algorithm (runtime/net.c:150-460), not fnmatch globbing: '*'
    never crosses a dot, '*suffix'/'prefix*' match within one
    domain component, component counts must agree, '' pairs with
    empty (trailing dot), invalid wildcards fail closed."""
    from rsyslog_spark.streaming.gtls import permitted_peer_match as m

    # plain strcmp (case-sensitive, no normalization)
    assert m("client.example.net", "client.example.net")
    assert not m("CLIENT.example.net", "client.example.net")
    # '*' component never crosses a dot — the fnmatch divergence
    assert m("client.example.net", "*.example.net")
    assert not m("a.b.example.net", "*.example.net")
    # component counts must agree exactly
    assert not m("example.net", "*.example.net")
    assert not m("client.example.net", "*")
    assert m("localhost", "*")
    # *suffix / prefix* within one component
    assert m("client.example.net", "*client.example.net")
    assert not m("clientX.example.net", "*client.example.net")
    assert m("clientX.example.net", "client*.example.net")
    assert m("client.example.net", "client*.example.net")
    # wildcard in any component position
    assert m("host.example.org", "host.*.org")
    assert m("deep.sub.domain.example.net",
             "*.sub.domain.example.net")
    assert m("client.example.net", "client.example.*")
    # trailing dot = trailing empty component on both sides
    assert m("client.example.net.", "*.example.net.")
    assert not m("client.example.net", "*.example.net.")
    # invalid wildcards (net.c RS_RET_INVALID_WILDCARD) fail closed
    assert not m("aXb.example.net", "a*b.example.net")
    assert not m("anything.example.net", "*a*.example.net")


def _crl_materials(tmp):
    """CA + two client certs + CRL builders via pyca/cryptography
    (the container openssl CLI needs ca-config scaffolding for
    CRLs; the library API is cleaner)."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    now = datetime.datetime.now(datetime.timezone.utc)

    def key():
        return ec.generate_private_key(ec.SECP256R1())

    def pem_key(k):
        return k.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption())

    ca_key = key()
    ca_name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "crl-test-ca")])
    ca_cert = (x509.CertificateBuilder()
               .subject_name(ca_name).issuer_name(ca_name)
               .public_key(ca_key.public_key())
               .serial_number(x509.random_serial_number())
               .not_valid_before(now - datetime.timedelta(days=1))
               .not_valid_after(now + datetime.timedelta(days=2))
               .add_extension(
                   x509.BasicConstraints(ca=True, path_length=None),
                   critical=True)
               .sign(ca_key, hashes.SHA256()))

    def issue(cn):
        k = key()
        cert = (x509.CertificateBuilder()
                .subject_name(x509.Name(
                    [x509.NameAttribute(NameOID.COMMON_NAME, cn)]))
                .issuer_name(ca_name)
                .public_key(k.public_key())
                .serial_number(x509.random_serial_number())
                .not_valid_before(now - datetime.timedelta(days=1))
                .not_valid_after(now + datetime.timedelta(days=2))
                .sign(ca_key, hashes.SHA256()))
        return k, cert

    def crl(revoked_serials, last_off_h, next_off_h):
        b = (x509.CertificateRevocationListBuilder()
             .issuer_name(ca_name)
             .last_update(now + datetime.timedelta(
                 hours=last_off_h))
             .next_update(now + datetime.timedelta(
                 hours=next_off_h)))
        for s in revoked_serials:
            b = b.add_revoked_certificate(
                x509.RevokedCertificateBuilder()
                .serial_number(s).revocation_date(now).build())
        return b.sign(ca_key, hashes.SHA256())

    def w(name, obj, is_key=False):
        p = tmp / name
        p.write_bytes(pem_key(obj) if is_key
                      else obj.public_bytes(
                          serialization.Encoding.PEM))
        return str(p)

    return ca_cert, ca_key, issue, crl, w


def test_gtls_crl_expired_rejected_at_load(tmp_path):
    """ChangeLog 2026-03-25 (nsd_gtls.c:857-877): an EXPIRED CRL —
    or one not yet valid — is a config-time error, not a silently
    ignored file; the reference's gtls driver was fixed to match
    OpenSSL's X509_V_ERR_CRL_HAS_EXPIRED behavior."""
    import pytest

    pytest.importorskip("cryptography")
    from rsyslog_spark.streaming.gtls import (
        TLSConfig, TLSSetupError, server_context)

    ca_cert, ca_key, issue, crl, w = _crl_materials(tmp_path)
    srv_key, srv_cert = issue("server.example")
    cfg = dict(
        certfile=w("srv.crt", srv_cert),
        keyfile=w("srv.key", srv_key, is_key=True),
        cafile=w("ca.crt", ca_cert), authmode="x509/certvalid")

    # expired CRL (nextUpdate in the past)
    exp = w("expired.crl", crl([], -48, -24))
    with pytest.raises(TLSSetupError, match="has expired"):
        server_context(TLSConfig(**cfg, crlfile=exp))
    # not-yet-valid CRL (thisUpdate in the future)
    fut = w("future.crl", crl([], 24, 48))
    with pytest.raises(TLSSetupError, match="not yet valid"):
        server_context(TLSConfig(**cfg, crlfile=fut))
    # garbage CRL file → parse error, reference message shape
    bad = tmp_path / "bad.crl"
    bad.write_text("not a crl")
    with pytest.raises(TLSSetupError,
                       match="error parsing Certificate revocation"):
        server_context(TLSConfig(**cfg, crlfile=str(bad)))
    # valid CRL loads fine
    ok = w("ok.crl", crl([], -1, 24))
    server_context(TLSConfig(**cfg, crlfile=ok))


def test_gtls_crl_revoked_client_rejected(spark, tmp_path):
    """A client certificate listed in the configured CRL fails the
    handshake (VERIFY_CRL_CHECK_LEAF); a non-revoked client from the
    same CA still gets through."""
    import ssl

    import pytest

    pytest.importorskip("cryptography")
    from rsyslog_spark.streaming.bridges import imtcp
    from rsyslog_spark.streaming.gtls import TLSConfig

    ca_cert, ca_key, issue, crl, w = _crl_materials(tmp_path)
    srv_key, srv_cert = issue("server.example")
    bad_key, bad_cert = issue("revoked.example")
    ok_key, ok_cert = issue("clean.example")
    crl_path = w("live.crl", crl([bad_cert.serial_number], -1, 24))
    srv_tls = TLSConfig(
        certfile=w("srv.crt", srv_cert),
        keyfile=w("srv.key", srv_key, is_key=True),
        cafile=w("ca.crt", ca_cert), authmode="x509/certvalid",
        crlfile=crl_path)
    w("bad.crt", bad_cert)
    w("bad.key", bad_key, is_key=True)
    w("ok.crt", ok_cert)
    w("ok.key", ok_key, is_key=True)

    b = imtcp(str(tmp_path / "spool"), tls=srv_tls,
              flush_secs=0.2).start()
    try:
        def client(crt, key_, line):
            c = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
            c.check_hostname = False
            c.verify_mode = ssl.CERT_NONE
            c.load_cert_chain(str(tmp_path / crt),
                              str(tmp_path / key_))
            try:
                sk = c.wrap_socket(socket.create_connection(
                    ("127.0.0.1", b.port), timeout=5))
                sk.sendall(line)
                sk.close()
            except OSError:
                pass  # revoked peer: server aborts the handshake

        client("bad.crt", "bad.key", b"<13>revoked line\n")
        client("ok.crt", "ok.key", b"<13>clean line\n")
        got = _drain(b, spark, 1)
        assert [r.line for r in got.collect()] == ["<13>clean line"]
    finally:
        b.stop()


def test_split_tcp_frames_multiline():
    """imtcp MultiLine (ChangeLog 2026-01-31; tcps_sess.c:592-650):
    LF ends a frame only when the NEXT byte is '<'; other LFs are
    continuation content; a trailing LF defers the decision to the
    next chunk (eInMsgCheckMultiLine)."""
    from rsyslog_spark.streaming.bridges import split_tcp_frames

    data = (b"<13>first line\ncontinued part\n"
            b"<14>second\n<15>third\nwith more\n")
    # without multiline: five LF frames
    msgs, rest = split_tcp_frames(data, 8192)
    assert len(msgs) == 5
    # with multiline: LF before non-'<' is content; the final LF has
    # no next byte -> deferred
    msgs, rest = split_tcp_frames(data, 8192, multiline=True)
    assert msgs == [b"<13>first line\ncontinued part",
                    b"<14>second"]
    assert rest == b"<15>third\nwith more\n"
    # feeding the next chunk resolves the deferral
    msgs2, rest2 = split_tcp_frames(rest + b"<16>next\n", 8192,
                                    multiline=True)
    assert msgs2 == [b"<15>third\nwith more"]
    assert rest2 == b"<16>next\n"
    # chunk-boundary invariance: byte-at-a-time feeding yields the
    # same frames
    acc, got = b"", []
    for i in range(len(data)):
        acc += data[i:i + 1]
        m, acc = split_tcp_frames(acc, 8192, multiline=True)
        got += m
    assert got == [b"<13>first line\ncontinued part",
                   b"<14>second"]
    assert acc == b"<15>third\nwith more\n"
    # octet-counted frames are unaffected by multiline
    oc = b"11 <13>hello\n<14>next\n"
    msgs, rest = split_tcp_frames(oc, 8192, multiline=True)
    assert msgs[0] == b"<13>hello\n<" or msgs[0] == b"<13>hello\n"


def test_imtcp_multiline_live(spark, tmp_path):
    """Live imtcp with MultiLine=on: a Java-style multi-line
    stacktrace stays ONE message; close flushes the pending frame
    without its trailing LF."""
    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), multiline=True,
              flush_secs=0.2).start()
    try:
        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(b"<13>app: exception\n  at Foo.bar(Foo.java:1)\n"
                  b"  at Baz.qux(Baz.java:2)\n"
                  b"<13>app: next event\n")
        c.close()
        df = _drain(b, spark, 2)
        lines = sorted(r.line for r in df.collect())
        assert lines == [
            "<13>app: exception\n  at Foo.bar(Foo.java:1)\n"
            "  at Baz.qux(Baz.java:2)",
            "<13>app: next event"]
    finally:
        b.stop()


def test_check_peer_ip_san_and_prioritize_san(tmp_path):
    """IP-address SANs participate in x509/name matching (ChangeLog
    2025-10-28; nsd_gtls.c:1206-1221 renders them as text through
    the same matcher), and streamdriver.PrioritizeSAN skips the CN
    when SANs are present (RFC 6125; nsd_gtls.c:1227)."""
    import pytest

    from rsyslog_spark.streaming.gtls import TLSConfig, check_peer

    class FakeSock:
        def __init__(self, subject_cn, sans):
            self._cert = {
                "subject": ((("commonName", subject_cn),),),
                "subjectAltName": tuple(sans),
            }

        def getpeercert(self, binary_form=False):
            return self._cert

    ca = tmp_path / "ca.crt"
    ca.write_text("placeholder")  # authmode validation only
    sock = FakeSock("cn.example",
                    [("DNS", "san.example"),
                     ("IP Address", "192.0.2.7")])

    def cfg(peers, prio=False):
        return TLSConfig(cafile=str(ca), authmode="x509/name",
                         permitted_peers=peers, prioritize_san=prio)

    # IP SAN matches like any name
    check_peer(sock, cfg(["192.0.2.7"]))
    # DNS SAN and CN both match by default
    check_peer(sock, cfg(["san.example"]))
    check_peer(sock, cfg(["cn.example"]))
    # PrioritizeSAN: SANs present -> CN is NOT consulted
    check_peer(sock, cfg(["san.example"], prio=True))
    with pytest.raises(PermissionError):
        check_peer(sock, cfg(["cn.example"], prio=True))
    # PrioritizeSAN with NO SANs: CN still checked
    nosan = FakeSock("cn.example", [])
    check_peer(nosan, cfg(["cn.example"], prio=True))
    # nothing matches -> rejected
    with pytest.raises(PermissionError):
        check_peer(sock, cfg(["other.example"]))


def test_imtcp_compression_expansion_guard(spark, tmp_path):
    """compression.maxExpansionRatio (imtcp.c:277; tcps_sess.c:
    877-893, default 1024, 0 = unlimited; golden imtcp-stream-
    always-zlib-expansion-guard.sh): a valid but highly expanding
    zlib stream errors out — 'decompressed bytes exceeded configured
    expansion ratio' internal message, NO messages submitted — while
    a normal stream under the same ratio flows."""
    import zlib

    from rsyslog_spark.streaming.bridges import imtcp

    # bomb session: ratio 2, payload expands ~100x
    b = imtcp(str(tmp_path / "spool"),
              compression_mode="stream:always",
              compression_max_expansion_ratio=2,
              flush_secs=0.2).start()
    try:
        line = (b"<129>Mar 10 01:00:00 h tag: msgnum:1 "
                + b"A" * 80 + b"\n")
        bomb = zlib.compress(line * 3000, 9)
        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(bomb)
        c.close()
        import time as _time
        deadline = _time.time() + 10
        while _time.time() < deadline:
            pend = b.drain_internal_msgs()
            if pend:
                break
            _time.sleep(0.2)
        assert any("expansion ratio" in t for _sev, t in pend), pend
        b.flush()
        df = b.read_spool(spark) if hasattr(b, "read_spool") else None
    finally:
        b.stop()
    import glob as _glob
    spooled = []
    for f in _glob.glob(str(tmp_path / "spool" / "*")):
        with open(f, encoding="utf-8") as fh:
            spooled += [l for l in fh if "msgnum" in l]
    assert spooled == [], "bomb output must not be submitted"

    # normal traffic under the default ratio still flows
    b2 = imtcp(str(tmp_path / "spool2"),
               compression_mode="stream:always",
               flush_secs=0.2).start()
    try:
        co = zlib.compressobj(6)
        wire = co.compress(b"<13>ok line one\n<13>ok line two\n")
        wire += co.flush()
        c = socket.create_connection(("127.0.0.1", b2.port))
        c.sendall(wire)
        c.close()
        df = _drain(b2, spark, 2)
        assert sorted(r.line for r in df.collect()) == [
            "<13>ok line one", "<13>ok line two"]
    finally:
        b2.stop()

    # negative ratio is a config-load error
    import pytest
    with pytest.raises(ValueError, match="maxExpansionRatio"):
        imtcp(str(tmp_path / "spool3"),
              compression_max_expansion_ratio=-1)


def test_imtcp_tls_gibberish_probe(spark, tmp_path):
    """imtcp-tls-gibberish.sh (ChangeLog 2025-09-17): a TLS
    ClientHello hitting a PLAIN tcp listener logs one explicit
    error per connection (record type 0x16, version 0x03.xx,
    plausible length) instead of silently ingesting binary; normal
    plaintext sessions do not trigger the probe."""
    import time as _time

    from rsyslog_spark.streaming.bridges import imtcp

    b = imtcp(str(tmp_path / "spool"), flush_secs=0.2).start()
    try:
        # minimal ClientHello-looking record header + padding
        hello = bytes([0x16, 0x03, 0x01, 0x00, 0x9C]) + b"\0" * 156
        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(hello)
        c.close()
        deadline = _time.time() + 10
        pend = []
        while _time.time() < deadline and not pend:
            pend = b.drain_internal_msgs()
            _time.sleep(0.1)
        assert len(pend) == 1 and "ClientHello" in pend[0][1], pend
        # plaintext session: no probe message, line flows. NOTE the
        # gibberish session's bytes also land as one junk row at
        # close (the reference likewise ingests them, the session is
        # 'otherwise left untouched') — so drain for BOTH rows
        c = socket.create_connection(("127.0.0.1", b.port))
        c.sendall(b"<13>plain ok\n")
        c.close()
        df = _drain(b, spark, 2)
        assert [r.line for r in df.collect()
                if r.line == "<13>plain ok"]
        assert b.drain_internal_msgs() == []
    finally:
        b.stop()


def test_imhttp_metrics_and_health_auth(spark, tmp_path):
    """imhttp health/metrics hardening (ChangeLog 2025-09-03):
    /metrics exports Prometheus stats with an explicit
    Content-Length plus the imhttp_up gauge, and both /healthz and
    /metrics can be gated independently with htpasswd Basic Auth."""
    import base64
    import hashlib
    import urllib.error
    import urllib.request

    from rsyslog_spark.streaming.bridges import imhttp

    htpw = tmp_path / "scrape.htpasswd"
    sha = base64.b64encode(hashlib.sha1(b"scr4pe").digest()).decode()
    htpw.write_text(f"prom:{{SHA}}{sha}\n")

    def stats():
        # flat impstats JSON object shape (ImpstatsListener.snapshot)
        return [{"name": "main Q", "origin": "core.queue",
                 "size": 7, "enqueued": 42}]

    b = imhttp(str(tmp_path / "spool"),
               metrics_basic_auth_file=str(htpw),
               healthcheck_basic_auth_file=str(htpw),
               stats_provider=stats, flush_secs=0.2).start()
    url = f"http://127.0.0.1:{b.port}"

    def get(path, auth=None):
        req = urllib.request.Request(url + path)
        if auth:
            req.add_header("Authorization", auth)
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, dict(r.headers), r.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers), b""

    try:
        # unauthenticated scrapes are rejected with a challenge
        assert get("/metrics")[0] == 401
        assert get("/healthz")[0] == 401
        good = "Basic " + base64.b64encode(b"prom:scr4pe").decode()
        code, hdrs, body = get("/metrics", good)
        assert code == 200
        assert int(hdrs["Content-Length"]) == len(body)
        text = body.decode()
        assert "imhttp_up 1" in text
        assert "rsyslog" in text or "size" in text  # exported stats
        assert get("/healthz", good)[0] == 200
        bad = "Basic " + base64.b64encode(b"prom:wrong").decode()
        assert get("/metrics", bad)[0] == 401
    finally:
        b.stop()

    # without the auth files both endpoints stay open (reference
    # attaches the handler only when the param is set)
    b2 = imhttp(str(tmp_path / "spool2"), flush_secs=0.2).start()
    try:
        code, hdrs, body = get_open = None, None, None
        import urllib.request as _u
        with _u.urlopen(f"http://127.0.0.1:{b2.port}/metrics",
                        timeout=10) as r:
            assert r.status == 200
            assert b"imhttp_up 1" in r.read()
        with _u.urlopen(f"http://127.0.0.1:{b2.port}/healthz",
                        timeout=10) as r:
            assert r.status == 200
    finally:
        b2.stop()


def test_split_tcp_frames_spframingfix():
    """framingfix.cisco.asa (tcps_sess.c:615-621; golden
    imptcp_spframingfix.sh): a stray SP in FRONT of the next frame
    is ignored; without the fix the space becomes frame content."""
    from rsyslog_spark.streaming.bridges import split_tcp_frames

    data = b"<13>one\n <13>two\n  <13>three\n"
    msgs, rest = split_tcp_frames(data, 8192, sp_framing_fix=True)
    assert msgs == [b"<13>one", b"<13>two", b"<13>three"]
    assert rest == b""
    # without the fix the leading SP stays in the frame
    msgs, _ = split_tcp_frames(data, 8192)
    assert msgs[1] == b" <13>two"
    # octet-counted frames after a stray space still detect
    oc = b" 9 <13>hello<13>next\n"
    msgs, rest = split_tcp_frames(oc, 8192, sp_framing_fix=True)
    assert msgs[0] == b"<13>hello"


def test_imtcp_uds_listener(spark, tmp_path):
    """imptcp unix-domain listener (imptcp.c:203-204,464-480
    path=/unlink=; goldens imptcp_uds.sh, imptcp_uds_unlink.sh):
    same framing over AF_UNIX; unlink=on replaces a stale socket
    file; the path is removed at shutdown."""
    import os

    from rsyslog_spark.streaming.bridges import imtcp

    sp = str(tmp_path / "ptcp.sock")
    # stale socket file: unlink=on replaces it
    open(sp, "w").close()
    b = imtcp(str(tmp_path / "spool"), path=sp, unlink=True,
              flush_secs=0.2).start()
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(sp)
        c.sendall(b"<13>uds lf one\n13 <13>uds octet")
        c.close()
        df = _drain(b, spark, 2)
        got = sorted(r.line for r in df.collect())
        assert got == ["<13>uds lf one", "<13>uds octet"]
    finally:
        b.stop()
    assert not os.path.exists(sp)   # unlinked at shutdown


def test_imjournal_namespace_validation_and_path(spark, tmp_path):
    """imjournal Namespace param (ChangeLog 2026-06-29;
    imjournal.c:1426-1438 checkCnf + :302-306
    sd_journal_open_namespace): empty Namespace and Namespace+Remote
    are config errors; a valid namespace reads the
    ``<dir>.<namespace>`` journal location, not the default one."""
    import pytest

    from rsyslog_spark.streaming.bridges import imjournal

    base = tmp_path / "journal"
    base.mkdir()
    (base / "sys.export").write_text(
        "MESSAGE=default ns\nPRIORITY=6\n_HOSTNAME=h0\n\n")
    nsdir = tmp_path / "journal.web"
    nsdir.mkdir()
    (nsdir / "web.export").write_text(
        "MESSAGE=web ns\nPRIORITY=4\n_HOSTNAME=h1\n\n")

    with pytest.raises(ValueError,
                       match="Namespace must not be empty"):
        imjournal(spark, str(base), namespace="")
    with pytest.raises(ValueError,
                       match="Namespace and Remote cannot be "
                             "enabled together"):
        imjournal(spark, str(base), namespace="web", remote=True)

    rows = imjournal(spark, str(base), namespace="web").collect()
    assert [r["msg"] for r in rows] == ["web ns"]
    rows = imjournal(spark, str(base)).collect()
    assert [r["msg"] for r in rows] == ["default ns"]


def test_journal_tail_rotation_single_reopen(tmp_path):
    """Rotation golden (ChangeLog 2026-07-15; imjournal.c:880-924):
    journal invalidation triggers EXACTLY one reopen; subsequent
    polls with an unchanged file must not reopen again (the
    busy-loop that burned a full CPU core), and entries across the
    rotation are delivered exactly once."""
    import os

    from rsyslog_spark.streaming.bridges import JournalTail

    j = tmp_path / "journal.export"
    j.write_bytes(b"MESSAGE=a\n\nMESSAGE=b\n\n")
    t = JournalTail(str(j))
    assert t.poll() == ["MESSAGE=a", "MESSAGE=b"]
    assert t.reopen_count == 0
    # idle polls: no entries, no reopen
    assert t.poll() == [] and t.poll() == []
    assert t.reopen_count == 0

    # rotate: old file archived away, successor starts fresh
    os.replace(str(j), str(tmp_path / "journal.export.1"))
    (tmp_path / "journal.export").write_bytes(b"MESSAGE=c\n\n")
    assert t.poll() == ["MESSAGE=c"]
    assert t.reopen_count == 1
    # THE busy-loop pin: nothing changed -> no second reopen
    assert t.poll() == [] and t.poll() == []
    assert t.reopen_count == 1

    # sequential delivery resumes without another reopen
    with open(j, "ab") as fh:
        fh.write(b"MESSAGE=d\n\n")
    assert t.poll() == ["MESSAGE=d"]
    assert t.reopen_count == 1
    t.close()


def test_journal_tail_truncation_and_partial(tmp_path):
    """In-place truncation is an invalidation (reopen-and-seek to
    head); an entry without its terminating blank line stays
    buffered until complete — only whole entries are delivered."""
    from rsyslog_spark.streaming.bridges import JournalTail

    j = tmp_path / "j.export"
    j.write_bytes(b"MESSAGE=one\n\nMESSAGE=par")   # 'par' incomplete
    t = JournalTail(str(j))
    assert t.poll() == ["MESSAGE=one"]
    with open(j, "ab") as fh:
        fh.write(b"tial\n\n")
    assert t.poll() == ["MESSAGE=partial"]
    assert t.reopen_count == 0

    # truncate in place (same inode, size < cursor)
    with open(j, "wb") as fh:
        fh.write(b"MESSAGE=fresh\n\n")
    assert t.poll() == ["MESSAGE=fresh"]
    assert t.reopen_count == 1
    t.close()


def test_journal_tail_state_resume_and_ignore_previous(tmp_path):
    """stateFile cursor persistence (imjournal stateFile) and
    IgnorePreviousMessages (imjournal.c:927 skipOldMessages)."""
    from rsyslog_spark.streaming.bridges import JournalTail

    j = tmp_path / "j.export"
    st = tmp_path / "j.state"
    j.write_bytes(b"MESSAGE=old\n\n")
    t = JournalTail(str(j), state_file=str(st))
    assert t.poll() == ["MESSAGE=old"]
    t.close()
    with open(j, "ab") as fh:
        fh.write(b"MESSAGE=new\n\n")
    # resume from the saved cursor: only the new entry
    t2 = JournalTail(str(j), state_file=str(st))
    assert t2.poll() == ["MESSAGE=new"]
    t2.close()

    # ignore_previous: fresh start seeks the tail
    j2 = tmp_path / "k.export"
    j2.write_bytes(b"MESSAGE=skipme\n\n")
    t3 = JournalTail(str(j2), ignore_previous=True)
    assert t3.poll() == []
    with open(j2, "ab") as fh:
        fh.write(b"MESSAGE=live\n\n")
    assert t3.poll() == ["MESSAGE=live"]
    t3.close()


def test_sndrcv_multihop_relay_chain(spark, tmp_path):
    """sndrcv.sh / sndrcv_drvr.sh multi-hop shape: origin file →
    omfwd @@(octet-counted) → live imtcp hop B → omfwd @@(LF
    traditional framing) → live imtcp hop C → seq_check. Two
    relay hops over real sockets with DIFFERENT framings; every
    message must arrive exactly once, in-order recoverable by
    msgnum (the testbench's seq_check)."""
    from rsyslog_spark.config.runtime import run_config_batch
    from rsyslog_spark.streaming.bridges import imtcp

    N = 200
    hop_b = imtcp(str(tmp_path / "spoolB"), flush_secs=0.2).start()
    hop_c = imtcp(str(tmp_path / "spoolC"), flush_secs=0.2).start()
    try:
        src = tmp_path / "origin"
        src.mkdir()
        (src / "in.log").write_text("".join(
            f"<13>Mar  1 01:00:00 h tag: msgnum:{i:08d}:\n"
            for i in range(N)))
        # hop 1: file -> octet-counted TCP forward to B
        run_config_batch(spark, f'''
template(name="fwd" type="string"
         string="<%pri%>%timestamp% %hostname% %syslogtag%%msg%")
input(type="imfile" file="{src}/*.log" ruleset="r1")
ruleset(name="r1") {{
  action(type="omfwd" target="127.0.0.1" port="{hop_b.port}"
         protocol="tcp" tcp_framing="octet-counted"
         template="fwd")
}}
''', main="r1")
        got_b = _drain(hop_b, spark, N)
        rows_b = [r.line for r in got_b.collect()]
        assert len(rows_b) == N

        # hop 2: B's received lines -> LF-framed TCP forward to C
        mid = tmp_path / "mid"
        mid.mkdir()
        (mid / "relay.log").write_text(
            "".join(ln + "\n" for ln in rows_b))
        run_config_batch(spark, f'''
template(name="fwd" type="string"
         string="<%pri%>%timestamp% %hostname% %syslogtag%%msg%")
input(type="imfile" file="{mid}/*.log" ruleset="r2")
ruleset(name="r2") {{
  action(type="omfwd" target="127.0.0.1" port="{hop_c.port}"
         protocol="tcp" template="fwd")
}}
''', main="r2")
        got_c = _drain(hop_c, spark, N)
        final = [r.line for r in got_c.collect()]
        assert len(final) == N
        # seq_check: extract msgnum, expect exactly 0..N-1
        import re
        nums = sorted(int(re.search(r"msgnum:(\d+):", ln).group(1))
                      for ln in final)
        assert nums == list(range(N))
        # two hops of header re-rendering preserved the PRI + body
        assert all(ln.startswith("<13>") and " h tag:" in ln
                   for ln in final)
    finally:
        hop_b.stop()
        hop_c.stop()

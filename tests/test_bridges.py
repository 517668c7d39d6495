"""Input bridges: imudp/imuxsock/imhttp receive loops spooling to a
streaming source; imjournal export-format and imdocker json-file
parsing (SURVEY §2.1; ref plugins/imudp, plugins/imuxsock,
contrib/imhttp, plugins/imjournal, contrib/imdocker)."""

import os
import socket
import time
import urllib.request

from pyspark.sql import functions as F

from rsyslog_spark.streaming.bridges import (
    imdocker,
    imhttp,
    imjournal,
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

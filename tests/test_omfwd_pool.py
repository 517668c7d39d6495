"""omfwd native load-balancing pool (tools/omfwd.c target/port
arrays): goldens omfwd-lb-2target-basic.sh (exact even split across
two healthy targets, combined sequence complete) and
omfwd-lb-2target-one_fail.sh (a dead target's share re-routes to the
survivor)."""

import socket
import threading


class _MiniTcpSrv:
    """minitcpsrvr analog: accept loop recording received lines."""

    def __init__(self):
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(8)
        self.srv.settimeout(0.2)
        self.port = self.srv.getsockname()[1]
        self.data = bytearray()
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _serve(self):
        while not self._stop.is_set():
            try:
                conn, _ = self.srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            conn.settimeout(0.2)
            while not self._stop.is_set():
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not chunk:
                    break
                self.data += chunk
            conn.close()

    def lines(self):
        return [l for l in bytes(self.data).decode().splitlines()
                if l]

    def stop(self):
        self._stop.set()
        try:
            self.srv.close()
        except OSError:
            pass
        self._t.join(timeout=2)


def _msgs(n):
    return [f"msgnum:{i:07d}" for i in range(n)]


def test_lb_2target_even_split(spark):
    """omfwd-lb-2target-basic.sh: each healthy target receives
    exactly half; the union is sequence-complete."""
    from rsyslog_spark.streaming.sinks import omfwd_sink

    s1, s2 = _MiniTcpSrv(), _MiniTcpSrv()
    try:
        lines = _msgs(100)
        df = spark.createDataFrame([(l,) for l in lines],
                                   "line string").coalesce(1)
        stats: dict = {}
        sink = omfwd_sink(["127.0.0.1", "127.0.0.1"],
                          [s1.port, s2.port],
                          framing="lf", stats_out=stats)
        sink(df, 0)
        import time
        deadline = time.time() + 10
        while time.time() < deadline and \
                len(s1.lines()) + len(s2.lines()) < 100:
            time.sleep(0.2)
        l1, l2 = s1.lines(), s2.lines()
        assert len(l1) == 50 and len(l2) == 50, (len(l1), len(l2))
        assert sorted(l1 + l2) == lines
        # per-target statsobj counters (omfwd.c:2091-2116 naming;
        # num.connects ChangeLog 2026-04-13): one connect per
        # target, 50 messages each, bytes = sum of framed lines
        n1 = f"TCP-127.0.0.1-{s1.port}"
        n2 = f"TCP-127.0.0.1-{s2.port}"
        assert stats[n1]["num.connects"] == 1
        assert stats[n2]["num.connects"] == 1
        assert stats[n1]["messages.sent"] == 50
        assert stats[n2]["messages.sent"] == 50
        assert stats[n1]["bytes.sent"] == sum(
            len(l) + 1 for l in l1)
        # a second batch on the SAME stats dict accumulates (the
        # per-interval rebind counts as a new connect)
        sink(df, 1)
        deadline = time.time() + 10
        while time.time() < deadline and \
                len(s1.lines()) + len(s2.lines()) < 200:
            time.sleep(0.2)
        assert stats[n1]["num.connects"] == 2
        assert stats[n1]["messages.sent"] == 100
    finally:
        s1.stop()
        s2.stop()


def test_lb_one_fail_reroutes(spark):
    """omfwd-lb-2target-one_fail.sh: a target that refuses
    connections is suspended and its share goes to the survivor —
    nothing is lost."""
    from rsyslog_spark.streaming.sinks import omfwd_sink

    s1 = _MiniTcpSrv()
    # reserve a port and close it so connects fail fast
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    dead_port = probe.getsockname()[1]
    probe.close()
    try:
        lines = _msgs(60)
        df = spark.createDataFrame([(l,) for l in lines],
                                   "line string").coalesce(1)
        stats: dict = {}
        omfwd_sink(["127.0.0.1", "127.0.0.1"], [s1.port, dead_port],
                   framing="lf", stats_out=stats)(df, 0)
        import time
        deadline = time.time() + 10
        while time.time() < deadline and len(s1.lines()) < 60:
            time.sleep(0.2)
        assert sorted(s1.lines()) == lines
        # the survivor carries the full message count on one
        # connect; the dead target never completed a connect
        # (omfwd.c:1481 increments AFTER a successful Connect)
        assert stats[f"TCP-127.0.0.1-{s1.port}"] == {
            "bytes.sent": sum(len(l) + 1 for l in lines),
            "messages.sent": 60, "num.connects": 1}
        assert stats[f"TCP-127.0.0.1-{dead_port}"][
            "num.connects"] == 0
        assert stats[f"TCP-127.0.0.1-{dead_port}"][
            "messages.sent"] == 0
    finally:
        s1.stop()


def test_lb_pool_stream_compression_first_frame(spark):
    """Pooled targets + compression stream:always: EVERY frame on a
    pooled connection must pass through that connection's zlib
    stream — including the first one (regression: send() used to
    consult the compressor before conn_for() had created it, so the
    first frame went out raw and the receiver's inflate died with
    'incorrect header check')."""
    import zlib

    from rsyslog_spark.streaming.sinks import omfwd_sink

    s1, s2 = _MiniTcpSrv(), _MiniTcpSrv()
    try:
        lines = _msgs(40)
        df = spark.createDataFrame([(l,) for l in lines],
                                   "line string").coalesce(1)
        omfwd_sink(["127.0.0.1", "127.0.0.1"], [s1.port, s2.port],
                   framing="lf", compression="stream:always")(df, 0)
        import time
        deadline = time.time() + 10
        while time.time() < deadline and \
                (not s1.data or not s2.data):
            time.sleep(0.2)
        time.sleep(0.5)
        got = []
        for srv in (s1, s2):
            # the whole byte stream must be ONE valid zlib stream —
            # an uncompressed first frame makes this raise
            plain = zlib.decompressobj().decompress(bytes(srv.data))
            part = [l for l in plain.decode().splitlines() if l]
            assert part, "target received no compressed lines"
            got += part
        assert sorted(got) == lines
    finally:
        s1.stop()
        s2.stop()


def test_lb_config_binding_arrays(spark, tmp_path):
    """action(type=omfwd target=[...] port=[...]) through
    run_config_batch splits across both receivers."""
    from rsyslog_spark.config.runtime import run_config_batch

    s1, s2 = _MiniTcpSrv(), _MiniTcpSrv()
    try:
        src = tmp_path / "in.log"
        src.write_text("".join(
            f"<13>Mar  1 10:00:00 h1 app: msgnum:{i:03d}\n"
            for i in range(20)))
        conf = f'''
template(name="outfmt" type="string" string="%msg%\\n")
ruleset(name="m") {{
  action(type="omfwd" target=["127.0.0.1", "127.0.0.1"]
         port=["{s1.port}", "{s2.port}"]
         protocol="tcp" template="outfmt")
}}
input(type="imfile" file="{src}" ruleset="m")
'''
        run_config_batch(spark, conf)
        import time
        deadline = time.time() + 10
        while time.time() < deadline and \
                len(s1.lines()) + len(s2.lines()) < 20:
            time.sleep(0.2)
        got = sorted(s1.lines() + s2.lines())
        assert len(got) == 20
        assert all("msgnum:" in l for l in got)
        assert s1.lines() and s2.lines()   # both targets used
    finally:
        s1.stop()
        s2.stop()


def test_tcp_user_timeout_applied(spark):
    """omfwd tcp_user_timeout (ChangeLog 2026-06-29): the option is
    set on the forwarding socket; readable back via getsockopt on
    Linux. Delivery is unaffected."""
    import pytest

    if not hasattr(socket, "TCP_USER_TIMEOUT"):
        pytest.skip("platform lacks TCP_USER_TIMEOUT")
    from rsyslog_spark.streaming.sinks import omfwd_sink

    s1 = _MiniTcpSrv()
    try:
        df = spark.createDataFrame([("uto line",)],
                                   "line string").coalesce(1)
        omfwd_sink("127.0.0.1", s1.port, framing="lf",
                   tcp_user_timeout=45000)(df, 0)
        import time
        deadline = time.time() + 10
        while time.time() < deadline and not s1.lines():
            time.sleep(0.2)
        assert s1.lines() == ["uto line"]
    finally:
        s1.stop()
    # direct option check on a live socket (the sink path runs in a
    # Spark worker where we cannot introspect the fd)
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    cli = socket.create_connection(srv.getsockname())
    cli.setsockopt(socket.IPPROTO_TCP, socket.TCP_USER_TIMEOUT, 45000)
    assert cli.getsockopt(socket.IPPROTO_TCP,
                          socket.TCP_USER_TIMEOUT) == 45000
    cli.close()
    srv.close()


def test_omfwd_num_connects_in_impstats_lines(spark, tmp_path):
    """num.connects statistic (ChangeLog 2026-04-13): with impstats
    loaded, a config-driven omfwd action surfaces its per-target
    statsobj line — 'TCP-<target>-<port>: origin=omfwd bytes.sent=..
    messages.sent=.. num.connects=..' — in the run's impstats
    output, counter order matching omfwd.c:2102-2114."""
    import re

    from rsyslog_spark.config.runtime import run_config_batch

    s1 = _MiniTcpSrv()
    try:
        src = tmp_path / "in.log"
        src.write_text("".join(
            f"<13>Mar  1 01:00:00 h tag: m{i}\n" for i in range(7)))
        run = run_config_batch(spark, f'''
module(load="impstats")
template(name="fwd" type="string" string="%msg%")
ruleset(name="m") {{
  action(type="omfwd" target="127.0.0.1" port="{s1.port}"
         protocol="tcp" template="fwd")
}}
input(type="imfile" file="{src}" ruleset="m")
''')
        name = f"TCP-127.0.0.1-{s1.port}"
        assert name in run.omfwd_stats
        assert run.omfwd_stats[name]["messages.sent"] == 7
        assert run.omfwd_stats[name]["num.connects"] >= 1
        line = next(l for l in run.impstats_lines()
                    if l.startswith(name))
        assert re.search(
            r"origin=omfwd bytes\.sent=\d+ messages\.sent=7 "
            r"num\.connects=\d+", line), line
    finally:
        s1.stop()


def test_omfwd_targetsrv_discovery(spark, tmp_path, monkeypatch):
    """omfwd targetSrv (ChangeLog 2026-01-02; omfwd.c:560-700):
    receivers are discovered from _syslog._tcp.<domain> SRV records,
    ordered by priority; conflicts with target= and empty answers
    are config errors."""
    import pytest

    from rsyslog_spark.config import runtime as rt
    from rsyslog_spark.config.runtime import run_config_batch

    s1, s2 = _MiniTcpSrv(), _MiniTcpSrv()
    try:
        # mock resolver: two records, priorities flipped so ordering
        # matters; trailing dots stripped
        def resolver(name):
            assert name == "_syslog._tcp.logs.example"
            return [(10, 5, s2.port, "127.0.0.1."),
                    (5, 1, s1.port, "127.0.0.1")]

        monkeypatch.setattr(rt, "SRV_RESOLVER", resolver)
        src = tmp_path / "in.log"
        src.write_text("".join(
            f"<13>Mar  1 10:00:00 h1 app: srv:{i:03d}\n"
            for i in range(20)))
        run_config_batch(spark, f'''
template(name="outfmt" type="string" string="%msg%\\n")
ruleset(name="m") {{
  action(type="omfwd" targetSrv="logs.example"
         protocol="tcp" template="outfmt")
}}
input(type="imfile" file="{src}" ruleset="m")
''')
        import time
        deadline = time.time() + 10
        while time.time() < deadline and \
                len(s1.lines()) + len(s2.lines()) < 20:
            time.sleep(0.2)
        # both discovered targets used by the pool; union complete
        got = sorted(s1.lines() + s2.lines())
        assert got == sorted(f" srv:{i:03d}" for i in range(20)) or \
            got == sorted(f"srv:{i:03d}" for i in range(20)), got
        assert s1.lines() and s2.lines()

        # conflict: target + targetSrv → config error
        with pytest.raises(ValueError, match="mutually exclusive"):
            run_config_batch(spark, f'''
ruleset(name="m") {{
  action(type="omfwd" target="127.0.0.1" targetSrv="logs.example"
         protocol="tcp")
}}
input(type="imfile" file="{src}" ruleset="m")
''')

        # empty answer → config error
        monkeypatch.setattr(rt, "SRV_RESOLVER", lambda n: [])
        with pytest.raises(ValueError, match="no usable SRV"):
            run_config_batch(spark, f'''
ruleset(name="m") {{
  action(type="omfwd" targetSrv="logs.example" protocol="tcp")
}}
input(type="imfile" file="{src}" ruleset="m")
''')
    finally:
        s1.stop()
        s2.stop()

"""impstats log.file lifecycle modes (round-8 verdict item 4).

Reference: plugins/impstats/impstats.c doSubmitToFile / doHUP +
push.*; tests impstats-{overwrite,no-overwrite,hup,push-basic}.sh.
The engine emits one stats cycle per batch run; multi-cycle
lifecycle semantics are driven on the sink directly with the same
line sets a run produces.
"""
import os
import threading

from rsyslog_spark.streaming.impstats import (ImpstatsFileSink,
                                              ImpstatsListener)


def _cycle(n):
    return [f"action-{n}: origin=core.action processed={n}",
            "global: origin=dynstats",
            ImpstatsListener.resource_usage_line()]


def test_impstats_no_overwrite_appends(tmp_path):
    """impstats-no-overwrite.sh: default mode appends — after >= 2
    cycles the file holds >= 2 'resource-usage' lines."""
    p = tmp_path / "stats.log"
    sink = ImpstatsFileSink(str(p))
    sink.emit_cycle(_cycle(1))
    sink.emit_cycle(_cycle(2))
    sink.close()
    text = p.read_text()
    assert text.count("resource-usage") == 2
    assert "processed=1" in text and "processed=2" in text


def test_impstats_overwrite_keeps_last(tmp_path):
    """impstats-overwrite.sh: log.file.overwrite='on' truncates per
    cycle — exactly ONE 'resource-usage' after many cycles, and the
    content is the LAST snapshot."""
    p = tmp_path / "stats.log"
    sink = ImpstatsFileSink(str(p), overwrite=True)
    for i in range(3):
        sink.emit_cycle(_cycle(i))
    sink.close()
    text = p.read_text()
    assert text.count("resource-usage") == 1
    assert "processed=2" in text and "processed=0" not in text


def test_impstats_hup_reopens(tmp_path):
    """impstats-hup.sh: the handle stays open across cycles, so an
    external rename keeps receiving until HUP; after hup() the next
    cycle reopens by path — BOTH files carry the global dynstats
    line."""
    p = tmp_path / "stats.log"
    rotated = tmp_path / "stats.log.1"
    sink = ImpstatsFileSink(str(p))
    sink.emit_cycle(_cycle(1))
    os.rename(p, rotated)
    sink.emit_cycle(_cycle(2))       # still the old (renamed) file
    sink.hup()
    sink.emit_cycle(_cycle(3))       # reopened at the original path
    sink.close()
    pre, post = rotated.read_text(), p.read_text()
    assert "global: origin=dynstats" in pre
    assert "global: origin=dynstats" in post
    assert "processed=2" in pre and "processed=3" in post
    assert "processed=3" not in pre


def test_impstats_push_basic(tmp_path):
    """impstats-push-basic.sh shape: push.url POSTs the prometheus
    rendering with the constant push.labels; local log.file emission
    succeeds regardless. One live HTTP listener asserts the payload;
    a dead endpoint only records the error."""
    import http.server

    bodies = []

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # noqa: N802
            pass

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            bodies.append(self.rfile.read(n).decode())
            self.send_response(204)
            self.end_headers()

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        p = tmp_path / "stats.log"
        sink = ImpstatsFileSink(
            str(p), push_url=f"http://127.0.0.1:{port}/api/v1/write",
            push_labels=["test=impstats-push", "instance=ci-test"])
        sink.emit_cycle(_cycle(7))
        sink.close()
        assert sink.pushes == 1 and not sink.push_errors
        assert "resource-usage" in p.read_text()
        body = bodies[0]
        assert 'test="impstats-push"' in body
        assert 'instance="ci-test"' in body
        assert "rsyslog_core_action_processed" in body
    finally:
        httpd.shutdown()

    # dead endpoint: local emission still works (the reference test
    # runs without a listener on purpose)
    p2 = tmp_path / "stats2.log"
    sink2 = ImpstatsFileSink(
        str(p2), push_url="http://127.0.0.1:1/api/v1/write",
        push_timeout_ms=200)
    sink2.emit_cycle(_cycle(8))
    sink2.close()
    assert "resource-usage" in p2.read_text()
    assert sink2.push_errors and sink2.pushes == 0


def test_impstats_logfile_config_wiring(spark, tmp_path):
    """module(load="impstats" log.file=...) on a batch run writes the
    run's stats cycle (incl. 'resource-usage' and 'origin') through
    the sink — the impstats-push-basic.sh local-file content checks."""
    from rsyslog_spark.config.runtime import run_config_batch

    src = tmp_path / "in.log"
    src.write_text("<13>Mar  1 01:00:00 h tag one\n")
    run = run_config_batch(spark, f'''
module(load="impstats" log.file="{tmp_path}/stats.out"
       log.file.overwrite="on" format="prometheus"
       push.url="http://127.0.0.1:1/api/v1/write"
       push.timeout.ms="200"
       push.labels=["test=impstats-push", "instance=ci-test"])
ruleset(name="m") {{
  action(type="omfile" name="out" file="{tmp_path}/out"
         template="RSYSLOG_FileFormat")
}}
input(type="imfile" file="{src}" ruleset="m")
''')
    text = open(f"{tmp_path}/stats.out").read()
    assert "resource-usage" in text
    assert "origin" in text
    assert text.count("resource-usage") == 1
    assert run.impstats_sink is not None
    assert run.impstats_sink.push_errors  # dead endpoint recorded


def test_preservefqdn_hostname_semantics(spark, tmp_path, monkeypatch):
    """$PreserveFQDN (glbl.c:81, glblGetLocalHostName :888;
    queryLocalHostname dot-split in tools/rsyslogd.c): locally-stamped
    hostnames use the SHORT name by default, the FQDN with the
    directive on, and $LocalHostName overrides both."""
    import socket as _socket

    import rsyslog_spark.session as sess
    from rsyslog_spark.config.runtime import run_config_batch

    monkeypatch.setattr(_socket, "gethostname",
                        lambda: "node7.corp.example.com")
    # unit level: the dot-split + toggles
    sess.set_local_hostname(None)
    sess.set_preserve_fqdn(False)
    assert sess.local_hostname() == "node7"
    assert sess.local_fqdn() == "node7.corp.example.com"
    assert sess.local_domain() == "corp.example.com"
    sess.set_preserve_fqdn(True)
    assert sess.local_hostname() == "node7.corp.example.com"
    sess.set_preserve_fqdn(False)

    # config level: a headerless-stamped message renders the short
    # vs full name per the directive
    src = tmp_path / "in.log"
    src.write_text("<13>Mar  1 01:00:00 src1 tag: hello\n")
    tpl = ('template(name="o" type="string" '
           'string="%$myhostname%\\n")')
    base = '''
ruleset(name="m") {
  action(type="omfile" file="@OUT@" template="o")
}
input(type="imfile" file="@IN@" ruleset="m")
'''

    def run(conf, sub):
        run_config_batch(spark, (conf + tpl + base)
                         .replace("@OUT@", f"{tmp_path}/out_{sub}")
                         .replace("@IN@", str(src)))
        return "".join(
            open(f"{tmp_path}/out_{sub}/{p}").read()
            for p in sorted(os.listdir(f"{tmp_path}/out_{sub}"))
            if p.startswith("part"))

    try:
        assert run("", "short") == "node7\n"
        assert run("$PreserveFQDN on\n", "fq") == \
            "node7.corp.example.com\n"
        assert run('global(localHostname="over")\n'
                   "$PreserveFQDN on\n", "ovr") == "over\n"
    finally:
        sess.set_local_hostname(None)
        sess.set_preserve_fqdn(False)

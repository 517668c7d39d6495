"""Extended sinks (ES bulk / HTTP / omprog), dimension enrichment
(mmkubernetes-style TTL dim, dnscache), and mmrfc5424addhmac."""

from __future__ import annotations

import hashlib
import hmac as hmac_mod

from pyspark.sql import functions as F

from rsyslog_spark.operators.dimension import (
    RefreshingDim, dnscache_enrich, refreshing_dim_join,
)
from rsyslog_spark.operators.mm import mmrfc5424addhmac
from rsyslog_spark.streaming.sinks import (
    failover_sink, omelasticsearch_sink, omhttp_sink, omprog_sink,
)
from rsyslog_spark.streaming.sources import reassemble_multiline


class TestEsBulk:
    def test_bulk_bodies(self, spark, tmp_path):
        # transport runs on executors — record through the shared fs
        rec = tmp_path / "bulk.ndjson"
        df = spark.createDataFrame(
            [("logs-1", "a", '{"m":1}'), ("logs-1", "b", '{"m":2}'),
             ("logs-2", "c", '{"m":3}')],
            "idx string, id string, doc string",
        ).coalesce(1)

        def transport(body, _p=str(rec)):
            with open(_p, "a") as f:
                f.write(body)
            return []

        sink = omelasticsearch_sink("idx", "id", "doc",
                                    transport=transport)
        sink(df, 0)
        body = rec.read_text()
        assert body.count('{"index"') == 3
        assert '"_index":"logs-2"' in body and '"_id":"c"' in body
        assert '{"m":3}' in body

    def test_bulk_failure_raises(self, spark):
        df = spark.createDataFrame([("i", "x", "{}")],
                                   "idx string, id string, doc string")
        sink = omelasticsearch_sink("idx", "id", "doc",
                                    transport=lambda b: [0])
        try:
            sink(df, 0)
            assert False, "expected failure"
        except Exception:
            pass


class TestHttpSink:
    def test_batching(self, spark, tmp_path):
        rec = tmp_path / "chunks.txt"
        df = spark.createDataFrame(
            [(str(i),) for i in range(7)], "d string").coalesce(1)

        def transport(chunk, _p=str(rec)):
            with open(_p, "a") as f:
                f.write(f"{len(chunk)}\n")

        sink = omhttp_sink("d", transport=transport, batch_size=3)
        sink(df, 0)
        chunks = [int(x) for x in rec.read_text().split()]
        assert sorted(chunks, reverse=True) == [3, 3, 1]


class TestOmprog:
    def test_pipe_to_program(self, spark, tmp_path):
        out = tmp_path / "prog_out.txt"
        df = spark.createDataFrame([("hello",), ("world",)],
                                   "line string").coalesce(1)
        sink = omprog_sink(["/bin/sh", "-c", f"cat >> {out}"])
        sink(df, 0)
        text = out.read_text()
        assert "hello" in text and "world" in text


class TestOmshell:
    def test_program_per_message(self, spark, tmp_path):
        """^program selector semantics (tools/omshell.c): one
        invocation per rendered message, line as argv[1]."""
        from rsyslog_spark.streaming.sinks import omshell_sink

        out = tmp_path / "shell_out.txt"
        prog = tmp_path / "rec.sh"
        prog.write_text(f"#!/bin/sh\necho \"$1\" >> {out}\n")
        prog.chmod(0o755)
        df = spark.createDataFrame([("alpha",), ("beta",)],
                                   "line string").coalesce(1)
        omshell_sink(str(prog))(df, 0)
        assert sorted(out.read_text().splitlines()) == ["alpha", "beta"]

    def test_nonzero_exit_suspends(self, spark, tmp_path):
        from rsyslog_spark.streaming.sinks import (
            omshell_sink, retrying_foreach_batch)

        prog = tmp_path / "fail.sh"
        prog.write_text("#!/bin/sh\nexit 3\n")
        prog.chmod(0o755)
        suspended = []
        sink = retrying_foreach_batch(
            omshell_sink(str(prog)), max_retries=1,
            resume_interval_s=0.0,
            on_suspend=lambda df, bid, exc: suspended.append(str(exc)))
        sink(spark.createDataFrame([("x",)], "line string").coalesce(1),
             0)
        assert suspended and "exited 3" in suspended[0]

    def test_legacy_caret_selector_config(self, spark, tmp_path):
        """Full config path: '*.* ^prog' parses to an omshell action
        and run_config_batch executes it per message."""
        from rsyslog_spark.config.runtime import run_config_batch

        out = tmp_path / "cfg_shell.txt"
        prog = tmp_path / "rec.sh"
        prog.write_text(f"#!/bin/sh\necho \"$1\" >> {out}\n")
        prog.chmod(0o755)
        src = tmp_path / "in.log"
        src.write_text("<13>Mar  1 10:00:00 h1 app: one\n"
                       "<13>Mar  1 10:00:01 h1 app: two\n")
        conf = f'''
template(name="m" type="string" string="%msg%")
ruleset(name="sh") {{ *.* ^{prog};m
}}
input(type="imfile" file="{src}" ruleset="sh")
'''
        run = run_config_batch(spark, conf)
        assert str(prog) in run.written.values()
        assert sorted(out.read_text().splitlines()) == ["one", "two"]


class TestOmtesting:
    def test_fail_frequency_resume_after(self, spark):
        """'fail 2 2' (omtesting.c): every 2nd call fails, resumes
        after 2 retry attempts — wrapped in the action retry loop,
        every batch is eventually delivered exactly once."""
        from rsyslog_spark.streaming.sinks import (
            omtesting_sink, retrying_foreach_batch)

        echo: list = []
        sink = retrying_foreach_batch(
            omtesting_sink("fail", fail_frequency=2, resume_after=2,
                           echo=echo),
            max_retries=3, resume_interval_s=0.0)
        for i in range(5):
            sink(spark.createDataFrame([(f"b{i}",)],
                                       "line string").coalesce(1), i)
        assert echo == ["b0", "b1", "b2", "b3", "b4"]

    def test_always_suspend_routes_to_handler(self, spark):
        from rsyslog_spark.streaming.sinks import (
            omtesting_sink, retrying_foreach_batch)

        dead: list = []
        sink = retrying_foreach_batch(
            omtesting_sink("always_suspend"), max_retries=1,
            resume_interval_s=0.0,
            on_suspend=lambda df, bid, exc: dead.append(bid))
        sink(spark.createDataFrame([("x",)], "line string"), 7)
        assert dead == [7]

    def test_unknown_mode_rejected(self):
        import pytest
        from rsyslog_spark.streaming.sinks import omtesting_sink

        with pytest.raises(ValueError):
            omtesting_sink("randfail")


class TestDimensions:
    def test_refreshing_dim_join(self, spark):
        calls = {"n": 0}

        def loader(s):
            calls["n"] += 1
            return s.createDataFrame([(1, "pod-a"), (2, "pod-b")],
                                     "k int, pod string")

        dim = RefreshingDim(loader, ttl_seconds=3600)
        df = spark.createDataFrame([(1,), (2,), (3,)], "k int")
        out1 = refreshing_dim_join(df, dim, on="k")
        out2 = refreshing_dim_join(df, dim, on="k")
        rows = {r["k"]: r["pod"] for r in out1.collect()}
        assert rows == {1: "pod-a", 2: "pod-b", 3: None}
        out2.collect()
        assert calls["n"] == 1  # TTL cache: loader ran once

    def test_dnscache_enrich(self, spark):
        df = spark.createDataFrame(
            [("10.0.0.7", None), ("10.0.0.9", "keep.me"), (None, "x")],
            "fromhost_ip string, fromhost string")
        out = {r["fromhost_ip"]: r["fromhost"]
               for r in dnscache_enrich(df).collect()}
        assert out["10.0.0.7"] == "host-7.example"
        assert out["10.0.0.9"] == "host-9.example"  # resolver wins
        assert out[None] == "x"

    def test_dnscache_enrich_max_cardinality(self, spark):
        # cache entry bound: only the first N sorted distinct IPs
        # resolve; overflow passes through with fromhost untouched
        df = spark.createDataFrame(
            [(f"10.0.0.{i}", f"orig{i}") for i in (1, 2, 3)],
            "fromhost_ip string, fromhost string")
        out = {r["fromhost_ip"]: r["fromhost"]
               for r in dnscache_enrich(df, max_cardinality=2)
               .collect()}
        assert out == {"10.0.0.1": "host-1.example",
                       "10.0.0.2": "host-2.example",
                       "10.0.0.3": "orig3"}

    def test_dnscache_enrich_no_driver_collect(self, spark):
        # scale guard: the resolution dimension is built executor-side
        # (mapInPandas over the distinct set) — the plan must contain
        # no LocalTableScan of a driver-collected dim
        df = spark.createDataFrame(
            [("10.0.0.7", None)], "fromhost_ip string, fromhost string")
        plan = dnscache_enrich(df)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "MapInPandas" in plan


class TestHmac:
    def test_hmac_sd_element(self, spark):
        df = spark.createDataFrame(
            [("secret msg", "-"), ("other", '[x@1 a="b"]')],
            "msg string, structured_data string")
        out = mmrfc5424addhmac(df, b"k3y").collect()
        want = hmac_mod.new(b"k3y", b"secret msg",
                            hashlib.sha256).hexdigest()
        assert out[0]["structured_data"] == f'[hmac@32473 hash="{want}"]'
        assert out[1]["structured_data"].startswith('[x@1 a="b"][hmac@32473')


class TestFailover:
    def test_failover_and_resume(self, spark):
        df = spark.createDataFrame([("x",)], "line string")
        log: list[str] = []
        health = {"ok": False}

        def primary(b, i):
            if not health["ok"]:
                raise RuntimeError("down")
            log.append(f"p{i}")

        def secondary(b, i):
            log.append(f"s{i}")

        sink = failover_sink(primary, secondary, max_retries=1,
                             resume_after_batches=2)
        sink(df, 0)          # primary fails -> suspend -> secondary
        sink(df, 1)          # still suspended
        health["ok"] = True
        sink(df, 2)          # resume window passed -> primary retried
        assert log == ["s0", "s1", "p2"]


class TestMultiline:
    def test_reassembly_order(self, spark):
        rows = [("a", 1, "START one"), ("a", 2, " c1"), ("a", 3, " c2"),
                ("a", 4, "START two"), ("b", 1, " junk"),
                ("b", 2, "START only"), ("b", 3, " tail")]
        df = spark.createDataFrame(rows,
                                   "srcfile string, line_no int, line string")
        out = {(r["srcfile"], r["msg_seq"]): r
               for r in reassemble_multiline(df, r"^START ").collect()}
        assert out[("a", 1)]["line"] == "START one\n c1\n c2"
        assert out[("a", 2)]["line"] == "START two"
        assert out[("b", 1)]["line"] == "START only\n tail"
        assert ("b", 0) not in out  # leading junk dropped


class TestOmfwd:
    def test_octet_counted_framing(self, spark):
        import socket
        import threading

        received = bytearray()
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def serve():
            conn, _ = srv.accept()
            while chunk := conn.recv(4096):
                received.extend(chunk)
            conn.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        df = spark.createDataFrame(
            [("<13>m one",), ("<14>m two",)], "line string").coalesce(1)
        from rsyslog_spark.streaming.sinks import omfwd_sink
        omfwd_sink("127.0.0.1", port)(df, 0)
        t.join(timeout=10)
        srv.close()
        text = received.decode()
        assert "9 <13>m one" in text and "9 <14>m two" in text


class TestDynafile:
    def test_partitioned_batch_write(self, spark, tmp_path):
        # omfile dynafile analog for batch: template-derived column
        # becomes the partition directory (tools/omfile.c dynafiles)
        out = str(tmp_path / "dyna")
        df = spark.createDataFrame(
            [("h1", "a"), ("h1", "b"), ("h2", "c")],
            "hostname string, msg string")
        df.write.partitionBy("hostname").parquet(out)
        back = spark.read.parquet(out)
        assert back.count() == 3
        import os
        assert sorted(d for d in os.listdir(out)
                      if d.startswith("hostname=")) == \
            ["hostname=h1", "hostname=h2"]


class TestDynafileTemplate:
    def test_partition_spec_and_write(self, spark, tmp_path):
        from rsyslog_spark.streaming.sinks import (
            dynafile_partition_spec, omfile_dynafile_batch,
        )

        base = f"{tmp_path}/logs"
        tpl = base + "/%hostname%/%programname%"
        b, names, exprs = dynafile_partition_spec(tpl)
        assert b == base
        assert names == ["pt_hostname", "pt_programname"]

        df = spark.createDataFrame(
            [("h1", "app", "m1"), ("h2", "cron", "m2")],
            "hostname string, programname string, msg string")
        omfile_dynafile_batch(df, tpl)
        import os
        assert sorted(d for d in os.listdir(base)
                      if d.startswith("pt_")) == \
            ["pt_hostname=h1", "pt_hostname=h2"]
        back = spark.read.parquet(base)
        assert back.count() == 2


class TestDiscardWatermark:
    def test_priority_drop_over_watermark(self, spark):
        from rsyslog_spark.streaming.sinks import discard_watermark_gate

        seen: dict = {}

        def writer(df, bid):
            seen[bid] = sorted(r["syslogseverity"] for r in df.collect())

        gate = discard_watermark_gate(writer, high_watermark_rows=3,
                                      discard_severity=6)
        small = spark.createDataFrame(
            [(s,) for s in (1, 6, 7)], "syslogseverity int")
        gate(small, 0)                       # under watermark: keep all
        big = spark.createDataFrame(
            [(s,) for s in (1, 2, 6, 7, 7)], "syslogseverity int")
        gate(big, 1)                         # over: sev >= 6 dropped
        assert seen[0] == [1, 6, 7]
        assert seen[1] == [1, 2]


def test_dynstats_lifecycle_reference_scenario(spark):
    """The dynstats_reset.sh scenario (three bursts separated by idle
    beyond the metric life; inputs dynstats_input_{1,2,3}): per-flush
    counter SUMS must equal the true totals — foo=3 bar=1 baz=2,
    new_metric_add=6, metrics_purged=6 (every burst segment is one
    add and one purge)."""
    import datetime as dt
    from rsyslog_spark.operators.stats import dynstats_lifecycle

    def burst(hour, keys):
        return [(k, dt.datetime(2024, 3, 1, hour, 0, 0))
                for k in keys]

    rows = (burst(1, ["foo", "bar", "baz"])     # input_1
            + burst(4, ["foo", "baz"])          # input_2 (idle > life)
            + burst(7, ["foo"]))                # input_3
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    out = {r["key"]: r for r in dynstats_lifecycle(
        df, "key", "ts", interval="1 hour", life_windows=1).collect()}
    assert {k: v["cnt"] for k, v in out.items()} == \
        {"foo": 3, "bar": 1, "baz": 2}
    assert {k: v["new_metric_add"] for k, v in out.items()} == \
        {"foo": 3, "bar": 1, "baz": 2}
    assert sum(v["new_metric_add"] for v in out.values()) == 6
    assert sum(v["metrics_purged"] for v in out.values()) == 6
    # adjacent-window appearances stay ONE segment (no false purge)
    adj = [("k", dt.datetime(2024, 3, 1, h)) for h in (1, 2, 3)]
    one = dynstats_lifecycle(
        spark.createDataFrame(adj, "key string, ts timestamp"),
        "key", "ts", interval="1 hour", life_windows=1).first()
    assert one["new_metric_add"] == 1 and one["n_windows"] == 3


def test_omprog_feedback_output_close(spark, tmp_path):
    """omprog confirmMessages / output capture / closeTimeout
    (omprog.c:126-138,301-320,417-430; goldens omprog-feedback.sh,
    omprog-output-capture.sh, omprog-close-unresponsive.sh):
    startup + per-message OK confirmations; a non-OK status fails
    the batch; child stderr captures to the output file; an
    unresponsive child is SIGKILLed after closeTimeout."""
    import sys

    import pytest

    from rsyslog_spark.streaming.sinks import omprog_sink

    outfile = tmp_path / "capture.log"
    child_ok = (
        "import sys\n"
        "print('OK', flush=True)\n"          # startup confirm
        "for line in sys.stdin:\n"
        "    sys.stderr.write('got ' + line)\n"
        "    sys.stderr.flush()\n"
        "    print('OK', flush=True)\n"
    )
    df = spark.createDataFrame([("fb one",), ("fb two",)],
                               "line string").coalesce(1)
    omprog_sink([sys.executable, "-u", "-c", child_ok],
                confirm_messages=True,
                output=str(outfile))(df, 0)
    cap = outfile.read_text()
    assert "got fb one" in cap and "got fb two" in cap

    # non-OK status fails the batch (reference suspends/retries)
    child_err = (
        "import sys\n"
        "print('OK', flush=True)\n"
        "sys.stdin.readline()\n"
        "print('Error: disk full', flush=True)\n"
        "sys.stdin.read()\n"
    )
    with pytest.raises(Exception, match="disk full|returned"):
        omprog_sink([sys.executable, "-u", "-c", child_err],
                    confirm_messages=True)(df, 0)

    # unresponsive child: ignores stdin EOF + SIGTERM, killed after
    # closeTimeout - the batch still completes
    child_hang = (
        "import signal, sys, time\n"
        "signal.signal(signal.SIGTERM, signal.SIG_IGN)\n"
        "sys.stdin.read()\n"
        "time.sleep(300)\n"
    )
    import time as _time
    t0 = _time.time()
    omprog_sink([sys.executable, "-u", "-c", child_hang],
                signal_on_close=True, close_timeout=1.0,
                kill_unresponsive=True)(df, 0)
    assert _time.time() - t0 < 30


def test_omclickhouse_http_insert(spark, tmp_path):
    """omclickhouse HTTP insert (plugins/omclickhouse/
    omclickhouse.c): bulkmode concatenates subsequent messages from
    the '(' after VALUES onto the first statement
    (computeBulkMessage:414-431); non-INSERT messages fail the
    batch (:468); a DB::Exception reply records to errorfile and
    continues (checkResult:361-379)."""
    import json

    import pytest

    from rsyslog_spark.streaming.sinks import omclickhouse_sink

    rec = tmp_path / "posts.txt"
    ctl = tmp_path / "reply.json"
    ctl.write_text(json.dumps([200, ""]))

    def transport(body: bytes, _rec=str(rec), _ctl=str(ctl)):
        import json as _j
        with open(_rec, "a") as f:
            f.write(body.decode() + "\n---\n")
        st, rp = _j.loads(open(_ctl).read())
        return st, rp

    df = spark.createDataFrame(
        [("INSERT INTO logs (m) VALUES ('a')",),
         ("INSERT INTO logs (m) VALUES ('b')",),
         ("INSERT INTO logs (m) VALUES ('c')",)],
        "line string").coalesce(1)
    omclickhouse_sink("line", transport=transport)(df, 0)
    posts = [p for p in rec.read_text().split("\n---\n") if p]
    assert posts == ["INSERT INTO logs (m) VALUES ('a')"
                     "('b')('c')"]

    # non-bulk: one POST per statement
    rec.write_text("")
    omclickhouse_sink("line", transport=transport,
                      bulkmode=False)(df, 0)
    posts = [p for p in rec.read_text().split("\n---\n") if p]
    assert len(posts) == 3 and posts[1].endswith("VALUES ('b')")

    # non-INSERT statement is an error
    bad = spark.createDataFrame([("SELECT 1",)],
                                "line string").coalesce(1)
    with pytest.raises(Exception, match="no Insert query"):
        omclickhouse_sink("line", transport=transport)(bad, 0)

    # DB::Exception reply -> errorfile record, no raise
    ctl.write_text(json.dumps(
        [200, "Code: 62.  = DB::Exception: Syntax error"]))
    errf = tmp_path / "ch-errors.ndjson"
    omclickhouse_sink("line", transport=transport,
                      error_file=str(errf))(df, 0)
    recs = [json.loads(l) for l in
            errf.read_text().splitlines()]
    assert len(recs) == 1 and "INSERT INTO" in recs[0]["request"]
    # ... and without errorfile the same reply raises (suspend)
    ctl.write_text(json.dumps([500, "DB::NetException: refused"]))
    with pytest.raises(Exception, match="HTTP status 500"):
        omclickhouse_sink("line", transport=transport)(df, 0)


class TestEsBulkFailureClassification:
    """Retryable-vs-permanent bulk item classification (ChangeLog
    2026-06-29; omelasticsearch.c:1359-1374 isRetryableBulkStatus,
    1505-1535 suspend-vs-per-item decision)."""

    def test_es_item_retryable_map(self):
        from rsyslog_spark.streaming.sinks import es_item_retryable

        assert es_item_retryable(429) is True
        assert es_item_retryable(500) is True
        assert es_item_retryable(503) is True
        # 403 retryable ONLY for the read-only index block
        assert es_item_retryable(403) is False
        assert es_item_retryable(403, "cluster_block_exception") \
            is True
        assert es_item_retryable(403, "security_exception") is False
        # plain data failures stay permanent
        assert es_item_retryable(400) is False
        assert es_item_retryable(404) is False
        assert es_item_retryable(409, "version_conflict_engine_"
                                      "exception") is False

    def test_retryable_only_batch_suspends_not_errorfile(
            self, spark, tmp_path):
        # every item failed and every failure is retryable -> the
        # whole batch can be resubmitted safely: the sink raises
        # (RS_RET_SUSPENDED analog) and must NOT consume the docs
        # into the errorfile (omelasticsearch.c:1520-1528)
        import pytest

        err = tmp_path / "es-err.ndjson"
        df = spark.createDataFrame(
            [("i", "a", '{"m":1}'), ("i", "b", '{"m":2}')],
            "idx string, id string, doc string").coalesce(1)
        sink = omelasticsearch_sink(
            "idx", "id", "doc",
            transport=lambda b: [(0, True), (1, True)],
            error_file=str(err))
        with pytest.raises(Exception, match="retryable item errors"):
            sink(df, 0)
        assert not err.exists()

    def test_mixed_failures_keep_per_item_handling(
            self, spark, tmp_path):
        # retryable errors mixed with a permanent one -> preserve
        # per-item data-failure handling: both failed items recorded,
        # no suspend raise (omelasticsearch.c:1529-1534)
        import json

        err = tmp_path / "es-err.ndjson"
        df = spark.createDataFrame(
            [("i", "a", '{"m":1}'), ("i", "b", '{"m":2}'),
             ("i", "c", '{"m":3}')],
            "idx string, id string, doc string").coalesce(1)
        sink = omelasticsearch_sink(
            "idx", "id", "doc",
            transport=lambda b: [(0, True), (1, False)],
            error_file=str(err))
        sink(df, 0)        # no raise: record-and-continue
        recs = [json.loads(l) for l in err.read_text().splitlines()]
        assert len(recs) == 2
        assert '{"m":1}' in recs[0]["doc"]
        assert '{"m":2}' in recs[1]["doc"]

    def test_retryable_with_success_keeps_per_item(
            self, spark, tmp_path):
        # a retryable failure alongside a SUCCESS cannot resubmit the
        # whole batch (the successful doc would duplicate) -> per-item
        # handling again
        import json

        err = tmp_path / "es-err.ndjson"
        df = spark.createDataFrame(
            [("i", "a", '{"m":1}'), ("i", "b", '{"m":2}')],
            "idx string, id string, doc string").coalesce(1)
        sink = omelasticsearch_sink(
            "idx", "id", "doc",
            transport=lambda b: [(1, True)],   # item 0 succeeded
            error_file=str(err))
        sink(df, 0)
        recs = [json.loads(l) for l in err.read_text().splitlines()]
        assert len(recs) == 1 and '{"m":2}' in recs[0]["doc"]

    def test_legacy_int_contract_is_permanent(self, spark, tmp_path):
        # transports still returning bare line numbers are classified
        # permanent (pre-2026-06-29 behavior preserved)
        import json

        err = tmp_path / "es-err.ndjson"
        df = spark.createDataFrame(
            [("i", "a", '{"m":1}')],
            "idx string, id string, doc string").coalesce(1)
        omelasticsearch_sink(
            "idx", "id", "doc", transport=lambda b: [0],
            error_file=str(err))(df, 0)
        recs = [json.loads(l) for l in err.read_text().splitlines()]
        assert len(recs) == 1


def test_omprog_retry_splitter_pacing(spark, tmp_path):
    """omprog paced transaction-retry splitter (ChangeLog 2026-07-05,
    issue 5016; action.c:1738-1817): a mid-batch confirm failure
    delays only the FAILED message's retry — confirmed messages are
    never resent, the failed message waits action.resumeInterval
    before its individual retry, and later messages are not
    classified while the action needs the delay."""
    import sys
    import time as _t

    import pytest

    from rsyslog_spark.streaming.sinks import omprog_sink

    df = spark.createDataFrame([("m1",), ("m2",), ("m3",)],
                               "line string").coalesce(1)

    def child(log, fail_counts):
        return (
            "import sys, time\n"
            f"log = open({str(log)!r}, 'a')\n"
            f"fails = dict({fail_counts!r})\n"
            "print('OK', flush=True)\n"
            "for line in sys.stdin:\n"
            "    line = line.strip()\n"
            "    log.write('%.3f %s\\n' % (time.time(), line))\n"
            "    log.flush()\n"
            "    if fails.get(line, 0) > 0:\n"
            "        fails[line] -= 1\n"
            "        print('Error: not ready', flush=True)\n"
            "    else:\n"
            "        print('OK', flush=True)\n"
        )

    # m2 fails once: in-splitter paced retry recovers it
    log1 = tmp_path / "pace1.log"
    omprog_sink([sys.executable, "-u", "-c",
                 child(log1, {"m2": 1})],
                confirm_messages=True, resume_retry_count=2,
                resume_interval=0.3)(df, 0)
    recs = [(float(a), b) for a, b in
            (ln.split() for ln in log1.read_text().splitlines())]
    assert [m for _, m in recs] == ["m1", "m2", "m2", "m3"]
    # the failed message's retry is PACED by resumeInterval
    t_m2 = [t for t, m in recs if m == "m2"]
    assert t_m2[1] - t_m2[0] >= 0.25
    # m1/m3 sent exactly once - no whole-batch replay
    assert sum(1 for _, m in recs if m == "m1") == 1
    assert sum(1 for _, m in recs if m == "m3") == 1

    # m2 fails 3x: current+later messages defer to the next paced
    # cycle; m3 is attempted only after m2 finally confirms — never
    # over-classified during m2's delays
    log2 = tmp_path / "pace2.log"
    omprog_sink([sys.executable, "-u", "-c",
                 child(log2, {"m2": 3})],
                confirm_messages=True, resume_retry_count=2,
                resume_interval=0.2)(df, 0)
    msgs = [ln.split()[1] for ln in log2.read_text().splitlines()]
    assert msgs == ["m1", "m2", "m2", "m2", "m2", "m3"]

    # unrecoverable: paced cycles exhausted -> action suspends;
    # later messages were never sent (not classified as failed)
    log3 = tmp_path / "pace3.log"
    t0 = _t.time()
    with pytest.raises(Exception, match="suspending"):
        omprog_sink([sys.executable, "-u", "-c",
                     child(log3, {"m2": 99})],
                    confirm_messages=True, resume_retry_count=1,
                    resume_interval=0.2)(df, 0)
    msgs = [ln.split()[1] for ln in log3.read_text().splitlines()]
    assert "m3" not in msgs and msgs[0] == "m1"
    # pacing happened (not a tight loop): >= 3 sleeps of 0.2s
    assert _t.time() - t0 >= 0.6

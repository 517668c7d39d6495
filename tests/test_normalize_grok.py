"""mmnormalize / mmgrok / new vendor parsers.

Golden cases modeled on the reference's rulebase tests
(tests/mmnormalize_*.sh, tests/testsuites/mmnormalize_*) and
mmgrok/pmsnare/pmaixforwardedfrom test configs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.operators.grok import grok_compile, mmgrok
from rsyslog_spark.operators.normalize import (
    compile_rule, normalize, parse_rulebase,
)
from rsyslog_spark.parsers.vendors import (
    mmleefparse, pmaixforwardedfrom, pmcisconames, pmdb2diag,
    pmpanngfw, pmsnare,
)

RB = """
version=2
# login/logout events
rule=login:user %user:word% logged in from %ip:ipv4% port %port:number%
rule=logout:user %user:word% logged out after %secs:float% seconds
rule=mail:from=<%from:char-to:>%> size=%size:number%
"""


def _df(spark, msgs):
    return spark.createDataFrame([(m,) for m in msgs], "msg string")


class TestNormalize:
    def test_rulebase_parses(self):
        rules = parse_rulebase(RB)
        assert len(rules) == 3
        assert rules[0].tags == ["login"]
        assert [f[0] for f in rules[0].fields] == ["user", "ip", "port"]

    def test_first_match_wins_and_types(self, spark):
        df = _df(spark, [
            "user alice logged in from 10.1.2.3 port 22",
            "user bob logged out after 12.5 seconds",
            "from=<x@y.com> size=1234",
            "something unparseable",
        ])
        out = normalize(df, RB).collect()
        r0, r1, r2, r3 = out
        assert (r0["user"], r0["ip"], r0["port"]) == ("alice", "10.1.2.3", 22)
        assert r0["event_tag"] == "login"
        assert r1["secs"] == pytest.approx(12.5)
        assert r2["from"] == "x@y.com"
        assert r2["size"] == 1234
        assert r3["event_tag"] is None and r3["user"] is None

    def test_first_match_wins_whole_message(self, spark):
        """A LATER rule that also matches and has a field the EARLIER
        winning rule lacks must NOT fill that field — liblognorm's
        first match wins for the whole message, not per field
        (ref: plugins/mmnormalize/mmnormalize.c:1-5;
        tests/testsuites unparsed-data pattern)."""
        rb = """
rule=short:evt %a:word%
rule=long:evt %a:word% %b:word%
"""
        df = _df(spark, ["evt hello", "evt hello world"])
        out = normalize(df, rb).collect()
        # row 0: only rule "short" matches → a set, b NULL
        assert out[0]["a"] == "hello" and out[0]["b"] is None
        assert out[0]["event_tag"] == "short"
        # row 1: BOTH match; "short" wins ("^...$" anchored, so only
        # long matches here) — craft an overlap instead:
        rb2 = """
rule=first:x=%a:word% %-:rest%
rule=second:x=%a:word% y=%b:word%
"""
        df2 = _df(spark, ["x=1 y=2"])
        r = normalize(df2, rb2).collect()[0]
        assert r["event_tag"] == "first"
        assert r["a"] == "1"
        assert r["b"] is None  # second matched too but first won

    def test_discard_and_field_pruning(self, spark):
        rules = [compile_rule(["t"], "%-:word% keep %k:word%")]
        df = _df(spark, ["junk keep me"])
        out = normalize(df, rules, fields=["k"]).collect()[0]
        assert out["k"] == "me"
        assert "junk" not in out.asDict().values()


class TestGrok:
    def test_compile_named_and_unnamed(self):
        rx, fields = grok_compile(
            r"%{IPV4:client} - %{WORD:method} %{NUMBER:bytes:int}")
        assert [f[0] for f in fields] == ["client", "method", "bytes"]
        assert fields[2][2] == "long"

    def test_extract(self, spark):
        df = _df(spark, [
            "10.0.0.1 - GET 123",
            "not an access line",
        ])
        out = mmgrok(
            df, r"%{IPV4:client} - %{WORD:method} %{NUMBER:bytes:int}"
        ).collect()
        assert out[0]["client"] == "10.0.0.1"
        assert out[0]["bytes"] == 123
        assert out[0]["grok_matched"] is True
        assert out[1]["client"] is None and out[1]["grok_matched"] is False

    def test_recursive_pattern(self, spark):
        extra = {"TS": "%{TIMESTAMP_ISO8601}"}
        df = _df(spark, ["2026-08-13T10:00:00Z boom"])
        out = mmgrok(df, "%{TS:t} %{GREEDYDATA:rest}",
                     extra_patterns=extra).collect()
        assert out[0]["t"] == "2026-08-13T10:00:00Z"
        assert out[0]["rest"] == "boom"

    def test_unknown_pattern_raises(self):
        with pytest.raises(ValueError):
            grok_compile("%{NOPE:x}")

    def test_nested_named_numbering(self, spark):
        """A named pattern whose body contains named fields: the
        parent's group opens FIRST (Java numbers by open paren), so
        pair=1, k=2, v=3 — not k=1, v=2, pair=3."""
        extra = {"KV": r"%{WORD:k}=%{WORD:v}"}
        rx, fields = grok_compile("%{KV:pair}", extra_patterns=extra)
        assert dict((n, g) for n, g, _ in fields) == \
            {"pair": 1, "k": 2, "v": 3}
        df = _df(spark, ["alpha=beta"])
        r = mmgrok(df, "%{KV:pair}", extra_patterns=extra).collect()[0]
        assert r["pair"] == "alpha=beta"
        assert r["k"] == "alpha"
        assert r["v"] == "beta"

    def test_literal_group_in_passthrough(self, spark):
        """Literal ``(foo|bar)`` in grok text is a real capture group
        and shifts later indices."""
        rx, fields = grok_compile(r"(foo|bar) %{INT:num:int}")
        assert fields == [("num", 2, "long")]
        df = _df(spark, ["foo 42", "bar 7"])
        out = mmgrok(df, r"(foo|bar) %{INT:num:int}").collect()
        assert out[0]["num"] == 42 and out[1]["num"] == 7

    def test_literal_noncapture_and_class_parens(self):
        """``(?:...)`` and ``(`` inside a char class don't count."""
        rx, fields = grok_compile(r"(?:a|b) [()] \( %{WORD:w}")
        assert fields == [("w", 1, None)]


class TestVendors:
    def test_mmleefparse(self, spark):
        df = _df(spark, [
            "LEEF:2.0|IBM|QRadar|9.1|12345|src=10.0.0.1\tdst=2.1.2.2\t"
            "sev=5\tmsg=a b=c",
            "not leef",
        ])
        out = mmleefparse(df).collect()
        r = out[0]
        assert r["leef_version"] == "2.0"
        assert r["leef_vendor"] == "IBM"
        assert r["leef_event_id"] == "12345"
        assert r["leef_fields"]["src"] == "10.0.0.1"
        assert r["leef_fields"]["msg"] == "a b=c"  # '=' kept in value
        assert out[1]["leef_matched"] is False

    def test_pmsnare(self, spark):
        df = _df(spark, [
            "winhost\tMSWinEventLog\t1\tSecurity\t1234",
            "normal message no tabs",
        ])
        out = pmsnare(df).collect()
        assert out[0]["snare_detected"] is True
        assert "\t" not in out[0]["msg"]
        assert out[1]["msg"] == "normal message no tabs"

    def test_pmaixforwardedfrom(self, spark):
        df = spark.createDataFrame(
            [("Message forwarded from srv1: real payload", "relay"),
             ("plain", "relay")],
            "msg string, hostname string")
        out = pmaixforwardedfrom(df).collect()
        assert out[0]["hostname"] == "srv1"
        assert out[0]["msg"] == "real payload"
        assert out[1]["hostname"] == "relay"

    def test_pmcisconames(self, spark):
        df = spark.createDataFrame(
            [("Mar  1 01:02:03 fw01 : %ASA-1-101001: failover", "x")],
            "msg string, hostname string")
        r = pmcisconames(df).collect()[0]
        assert r["hostname"] == "fw01"
        assert r["msg"].startswith("%ASA-1-101001:")

    def test_pmpanngfw(self, spark):
        df = _df(spark, [
            '1,2026/08/13 10:00:00,0011C103117,TRAFFIC,end,"a,b",allow',
            "regular text",
        ])
        out = pmpanngfw(df).collect()
        assert out[0]["pan_type"] == "TRAFFIC"
        assert out[0]["pan_fields"][5] == '"a,b"'  # quoted comma kept
        assert "\t" in out[0]["msg"]
        assert out[1]["pan_type"] is None

    def test_pmdb2diag(self, spark):
        df = _df(spark, [
            "2026-08-13-10.11.12.123456+000 I12345A678 LEVEL: ERROR "
            "PID : 4242 TID : 7 PROC : db2sysc",
        ])
        r = pmdb2diag(df).collect()[0]
        assert r["db2_level"] == "ERROR"
        assert r["db2_severity"] == 3
        assert r["db2_pid"] == 4242
        assert r["db2_proc"] == "db2sysc"
        assert r["db2_time"] is not None


class TestAudio:
    def test_audio_features_and_windows(self, spark):
        from rsyslog_spark.operators.multimodal import (
            audio_window_plan, extract_audio_features,
        )
        import pyspark.sql.functions as F

        media = spark.createDataFrame(
            [(1, b"\x00" * 64000), (2, b"")],
            "media_id long, payload binary")
        feats = {r["media_id"]: r for r in
                 extract_audio_features(media).collect()}
        assert feats[1]["n_bytes"] == 64000
        assert feats[1]["est_duration_s"] == 2.0
        assert len(feats[1]["rms"]) == 2
        assert feats[2]["rms"] == []

        plan = spark.createDataFrame(
            [(1, {"duration_s": "65"})],
            "media_id long, meta map<string,string>")
        wins = audio_window_plan(plan).collect()
        assert [(r["win_start"], r["win_end"]) for r in wins] == \
            [(0, 30), (25, 55), (50, 80)]

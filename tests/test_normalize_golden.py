"""Golden tests: real reference rulebases, expected values taken from
the reference's own test scripts — field extraction must match what
liblognorm produced there.

Fixtures lifted verbatim from /root/reference/tests/testsuites/
(mmnormalize_processing_tests.rulebase, pmnormalize_basic.rulebase,
mmnormalize_tokenized.rulebase, mmnormalize_regex.rulebase); expected
values from mmnormalize_processing_test{1..4}.sh cmp blocks and
mmnormalize_tokenized.sh content_check lines.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from rsyslog_spark.operators.normalize import normalize, parse_rulebase


def _df(spark, msgs):
    return spark.createDataFrame([(m,) for m in msgs], "msg string")


# ref: tests/testsuites/mmnormalize_processing_tests.rulebase (verbatim)
PROCESSING_RB = r"""rule=WIN:<%n1:number%>1 %-:date-rfc5424% %n2:word% %v_tag:word% - - - %v_svc:word% %v_ret:word% %v_os:word% %v_msg:rest%
annotate=WIN:+v_analytics_prefix="EvntSLog: "

rule=ESX:<%-:number%>%-:date-rfc5424% %-:word% %v_tag:char-to:\x3a%: %v_msg:rest%
annotate=ESX:+v_svc="SER2"
annotate=ESX:+v_ret="Y01"
annotate=ESX:+v_file="esx"
annotate=ESX:+v_os="ESX"

rule=LNX:<%-:number%>%-:date-rfc3164% %v_hostname:word% %v_tag:char-to:\x3a%: {%v_svc:char-to:\x2e%.%v_file:word% %v_ret:word% %v_os:word% [%v_forward:char-to:\x5d%]} %v_msg:rest%
rule=LNX:<%-:number%>%-:date-rfc3164% %v_hostname:word% %v_tag:char-to:\x20% {%v_svc:char-to:\x2e%.%v_file:word% %v_ret:word% %v_os:word% [%v_forward:char-to:\x5d%]} %v_msg:rest%

rule=FromFile:<%n1:number%>%-:date-rfc3164% %v_hostname:word% Process2: {%v_svc:char-to:\x2e%.%-:word% %v_ret:word% %v_os:word% [%v_forward:char-to:\x5d%]} (/%v_file:char-to:\x29%) %v_msg:rest%
annotate=FromFile:+v_tag="Process2"
"""

# raw messages the reference's processing tests inject (tcpflood -M,
# useRawMsg="on"), tests 1-4 in order
WIN_MSG = (r"<37>1 2017-03-08T12:53:47+02:00 Host1.domain.com Security"
           r" - - - SER1 M01 WIN [AUF] Wed Mar 08 11:53:48 2017: "
           r"N\A/Security/Host1.domain.com/"
           r"Microsoft-Windows-Security-Auditing (5152) - message")
ESX_MSG = ("<166>2017-03-08T12:18:47.165Z Host2.domain.com Process1: "
           "[FFB87B70 verbose Process1HalCnxHostagent "
           "opID=WFU-abfbbece] [WaitForUpdatesDone] Completed callback")
LNX_MSG = ("<182>Mar  8 14:23:51 host3 audispd: "
           "{SER3.local6 Y01 LNX [SRCH ALRT DASH REPT ANOM]}  "
           "node=host3.domain.com type=SYSCALL "
           "msg=audit(1488975831.267:230190721):")
FROMFILE_MSG = ("<187>Mar  8 14:56:37 host4 Process2: "
                "{SER4.local7 Y01 LNX [SRCH ALRT DASH REPT ANOM]} "
                "(/sb/env/logs/dir1/dir2/log_20170308.log) "
                "in 1: X/c79RgpDtrva5we84XHTg== (String)")


class TestProcessingRulebase:
    """Expected fields reconstructed from the reference's own output
    templates (t_file_record / t_file_path / t_analytics in
    mmnormalize_processing_test{1..4}.sh and their cmp blocks)."""

    def _run(self, spark):
        out = normalize(_df(spark, [WIN_MSG, ESX_MSG, LNX_MSG,
                                    FROMFILE_MSG]),
                        PROCESSING_RB, match="specific")
        return {r["event_tag"]: r.asDict() for r in out.collect()}

    def test_win_rule_with_annotation(self, spark):
        r = self._run(spark)["WIN"]
        # test1 expects svc_SER1/ret_M01/os_WIN + tag Security + the
        # EvntSLog: analytics prefix annotation
        assert r["n1"] == 37
        assert r["v_tag"] == "Security"
        assert (r["v_svc"], r["v_ret"], r["v_os"]) == \
            ("SER1", "M01", "WIN")
        assert r["v_msg"] == (
            r"[AUF] Wed Mar 08 11:53:48 2017: N\A/Security/"
            r"Host1.domain.com/Microsoft-Windows-Security-Auditing "
            r"(5152) - message")
        assert r["v_analytics_prefix"] == "EvntSLog: "
        assert r["v_file"] is None     # test1 backfills it from tag

    def test_esx_rule_all_annotations(self, spark):
        r = self._run(spark)["ESX"]
        # test2 expects svc_SER2/ret_Y01/os_ESX/esx.gz — all four come
        # from annotate= lines, only tag+msg are captured
        assert r["v_tag"] == "Process1"
        assert r["v_msg"] == ("[FFB87B70 verbose "
                              "Process1HalCnxHostagent "
                              "opID=WFU-abfbbece] [WaitForUpdatesDone]"
                              " Completed callback")
        assert (r["v_svc"], r["v_ret"], r["v_file"], r["v_os"]) == \
            ("SER2", "Y01", "esx", "ESX")

    def test_lnx_rule(self, spark):
        r = self._run(spark)["LNX"]
        # test3 expects svc_SER3/ret_Y01/os_LNX/local6.gz, host3,
        # audispd, and the double space preserved in msg
        assert r["v_hostname"] == "host3"
        assert r["v_tag"] == "audispd"
        assert (r["v_svc"], r["v_file"], r["v_ret"], r["v_os"]) == \
            ("SER3", "local6", "Y01", "LNX")
        assert r["v_forward"] == "SRCH ALRT DASH REPT ANOM"
        assert r["v_msg"].startswith(" node=host3.domain.com")

    def test_fromfile_literal_beats_field_match(self, spark):
        """test4: the FromFile rule (literal 'Process2:') must win
        over LNX (field %v_tag:char-to::%) although BOTH match — the
        expected path ends .../sb/env/logs/dir1/dir2/log_20170308
        .log.gz, i.e. v_file comes from FromFile's (/%v_file%) capture
        and v_tag from its annotation."""
        r = self._run(spark)["FromFile"]
        assert r["v_file"] == "sb/env/logs/dir1/dir2/log_20170308.log"
        assert r["v_tag"] == "Process2"          # annotation
        assert (r["v_svc"], r["v_ret"], r["v_os"]) == \
            ("SER4", "Y01", "LNX")
        assert r["v_msg"] == "in 1: X/c79RgpDtrva5we84XHTg== (String)"
        assert r["n1"] == 187


class TestPmnormalizeBasic:
    def test_basic_rulebase(self, spark):
        """ref: tests/testsuites/pmnormalize_basic.rulebase +
        pmnormalize-basic.sh — parser-level rulebase filling message
        properties."""
        rb = (r"rule=:<%pri:number%> %hostname:word% "
              r"%syslogtag:char-to:\x3a%: is no longer listening on "
              r"%fromhost-ip:ipv4% %msg:rest%")
        msg = ("<116> server1.example.net sshd[12345]: is no longer "
               "listening on 192.0.2.1 port 22")
        r = normalize(_df(spark, [msg]), rb, msg_col="msg",
                      prefix="p_").collect()[0]
        assert r["p_pri"] == 116
        assert r["p_hostname"] == "server1.example.net"
        assert r["p_syslogtag"] == "sshd[12345]"
        assert r["p_fromhost-ip"] == "192.0.2.1"
        assert r["p_msg"] == "port 22"


class TestTokenized:
    """ref: tests/testsuites/mmnormalize_tokenized.rulebase; expected
    lists from mmnormalize_tokenized.sh content_check lines."""

    RB = r"""rule=hms:%hr:number%:%min:number%:%sec:number% %zone:word%
rule=only_ips:%only_ips:tokenized:, :ipv4%
rule=local_ips:local ips are %local_ips:tokenized:, :ipv4%
rule=external_ips:%external_ips:tokenized:, :ipv4% are external ips
rule=paths:for %user:char-to:@%@localhost path was %fragments:tokenized:\x3a:char-sep:\x3a%
rule=recur_comma_colon_nos:comma separated list of colon separated numbers: %some_nos:tokenized:, :tokenized: \x3a :tokenized:#:number%
"""

    def _one(self, spark, msg):
        return normalize(_df(spark, [msg]), self.RB,
                         match="specific").collect()[0]

    def test_flat_ipv4_list(self, spark):
        r = self._one(spark,
                      "10.20.30.40, 50.60.70.80, 90.100.110.120, "
                      "130.140.150.160")
        assert r["event_tag"] == "only_ips"
        assert r["only_ips"] == ["10.20.30.40", "50.60.70.80",
                                 "90.100.110.120", "130.140.150.160"]

    def test_list_with_literal_prefix(self, spark):
        r = self._one(spark,
                      "local ips are 192.168.1.2, 192.168.1.3, "
                      "192.168.1.4")
        assert r["event_tag"] == "local_ips"
        assert r["local_ips"] == ["192.168.1.2", "192.168.1.3",
                                  "192.168.1.4"]

    def test_list_with_literal_suffix(self, spark):
        r = self._one(spark, "10.20.30.40, 50.60.70.80, "
                             "190.200.210.220 are external ips")
        assert r["event_tag"] == "external_ips"
        assert r["external_ips"] == ["10.20.30.40", "50.60.70.80",
                                     "190.200.210.220"]

    def test_char_sep_items(self, spark):
        r = self._one(spark, "for foo@localhost path was "
                             "/bin:/usr/local/bin:/usr/bin")
        assert r["event_tag"] == "paths"
        assert r["user"] == "foo"
        assert r["fragments"] == ["/bin", "/usr/local/bin", "/usr/bin"]

    def test_recursive_tokenized(self, spark):
        # content_check expects
        # [ [ [ "10" ] ], [ [ "20" ], [ "30","40","50" ],
        #   [ "60","70","80" ] ], [ [ "90" ], [ "100" ] ] ]
        r = self._one(spark,
                      "comma separated list of colon separated "
                      "numbers: 10, 20 : 30#40#50 : 60#70#80, "
                      "90 : 100")
        assert r["event_tag"] == "recur_comma_colon_nos"
        assert r["some_nos"] == [
            [["10"]],
            [["20"], ["30", "40", "50"], ["60", "70", "80"]],
            [["90"], ["100"]],
        ]


class TestRegexType:
    def test_regex_field(self, spark):
        """ref: tests/testsuites/mmnormalize_regex.rulebase — the ERE
        lands as the field pattern; its inner groups must not shift
        later field numbering."""
        rb = (r"rule=:http host ports are "
              r"%hps:regex:([0-9.\x3a]+(, )?)+% etc %tail:word%")
        r = normalize(_df(spark, ["http host ports are 10.0.0.1:80, "
                                  "10.0.0.2:8080 etc end"]),
                      rb).collect()[0]
        assert r["hps"] == "10.0.0.1:80, 10.0.0.2:8080"
        assert r["tail"] == "end"


def test_rulebase_stats():
    """The full processing rulebase compiles: 5 rules, annotations
    attached to the right tags."""
    rules = parse_rulebase(PROCESSING_RB)
    assert len(rules) == 5
    by_tag = {",".join(r.tags): r for r in rules}
    assert len(by_tag["ESX"].annotations) == 4
    assert by_tag["WIN"].annotations == \
        [("v_analytics_prefix", "EvntSLog: ")]
    assert by_tag["FromFile"].literal_len > \
        max(r.literal_len for r in rules if r.tags == ["LNX"])


def test_mmnormalize_regex_field_golden(spark, tmp_path):
    """tests/mmnormalize_regex.sh: the regex field_type (allowRegex)
    with a \\x3a hex escape and nested groups; content check
    byte-exact. Fixture rulebase/input retyped from
    testsuites/mmnormalize_regex.rulebase + regex_input."""
    import os
    from rsyslog_spark.config.runtime import run_config_batch

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.log").write_text(
        "<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005:"
        "http host ports are 192.168.1.2:80, 192.168.1.3, "
        "192.168.1.4:443, 192.168.1.5 etc\n")
    rb = tmp_path / "regex.rulebase"
    rb.write_text(
        "rule=:http host ports are "
        "%hps:regex:([0-9.\\x3a]+(, )?)+% etc\n")
    out = tmp_path / "out"
    conf = f'''
template(name="hosts_and_ports" type="string"
         string="host and port list: %$!hps%\\n")
ruleset(name="m") {{
  action(type="mmnormalize" rulebase="{rb}")
  action(type="omfile" file="{out}" template="hosts_and_ports")
}}
input(type="imfile" file="{src}/*.log" ruleset="m")
'''
    run_config_batch(spark, conf)
    got = [ln for f in sorted(os.listdir(out))
           if f.startswith("part")
           for ln in open(out / f).read().splitlines()]
    assert got == ["host and port list: 192.168.1.2:80, "
                   "192.168.1.3, 192.168.1.4:443, 192.168.1.5"]


def test_mmnormalize_variable_golden(spark, tmp_path):
    """tests/mmnormalize_variable.sh: mmnormalize variable= support —
    a regex-extracting exec_template feeds a local var, the rulebase
    normalizes THAT value; content check 'h:13 m:20 s:18'."""
    import os
    from rsyslog_spark.config.runtime import run_config_batch

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.log").write_text(
        "<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: at Thu "
        "Oct 30 13:20:18 IST 2014 random number is 19597\n")
    rb = tmp_path / "var.rulebase"
    rb.write_text(
        "rule=hms:%hr:number%:%min:number%:%sec:number% "
        "%zone:word%\n")
    out = tmp_path / "out"
    conf = f'''
template(name="outfmt" type="string"
         string="h:%$!hr% m:%$!min% s:%$!sec%\\n")
template(name="time_fragment" type="list") {{
  property(name="msg" regex.Expression="[0-9]{{2}}:[0-9]{{2}}:[0-9]{{2}} [A-Z]+"
           regex.Type="ERE" regex.Match="0")
}}
ruleset(name="m") {{
  set $.time_frag = exec_template("time_fragment");
  action(type="mmnormalize" rulebase="{rb}" variable="$.time_frag")
  action(type="omfile" file="{out}" template="outfmt")
}}
input(type="imfile" file="{src}/*.log" ruleset="m")
'''
    run_config_batch(spark, conf)
    got = [ln for f in sorted(os.listdir(out))
           if f.startswith("part")
           for ln in open(out / f).read().splitlines()]
    assert got == ["h:13 m:20 s:18"]

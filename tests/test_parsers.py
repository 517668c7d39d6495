"""Parser golden tests — line shapes from FIXTURES.md F1/F2 (the
reference's tcpflood default format and RFC5424 examples)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark.parsers import parse_syslog, parse_structured_data


def parse_one(spark, line):
    df = spark.createDataFrame([(line,)], "line string")
    return parse_syslog(df).collect()[0]


def test_rfc3164_tcpflood_default(spark):
    r = parse_one(spark, "<165>Mar  1 01:00:00 172.20.245.8 tag/prog[1234]: msgnum:00000001:")
    assert r["pri"] == 165
    assert r["syslogfacility"] == 20
    assert r["syslogseverity"] == 5
    assert r["hostname"] == "172.20.245.8"
    # programname cuts at '/' with the default
    # parser.permitSlashesInProgramname=off (runtime/msg.c
    # acquireProgramName; golden tests/prop-programname.sh:
    # 'tag/with/slashes' -> 'tag')
    assert r["programname"] == "tag"
    assert r["procid"] == "1234"
    assert r["syslogtag"] == "tag/prog[1234]:"
    assert r["msg"] == "msgnum:00000001:"
    assert r["protocol_version"] == 0
    assert r["parsesuccess"] is False   # only mm modules set it (msg.c:2183)
    assert r["timereported"].month == 3 and r["timereported"].day == 1


def test_rfc3164_no_pri(spark):
    r = parse_one(spark, "Mar 11 01:00:00 host1 app: hello")
    assert r["pri"] == 13  # DEFUPRI user.notice
    assert r["syslogfacility"] == 1
    assert r["syslogseverity"] == 5
    assert r["msg"] == "hello"
    assert r["hostname"] == "host1"


def test_rfc3164_no_timestamp(spark):
    import socket
    r = parse_one(spark, "<14>just some text")
    assert r["pri"] == 14
    # hostname/TAG parse runs even without a timestamp
    # (pmrfc3164.c:383; golden parsertest-parse-nodate.sh): 'just'
    # is a valid SP-terminated hostname token, 'some' becomes TAG
    assert r["hostname"] == "just"
    assert r["syslogtag"] == "some"
    assert r["msg"] == "text"
    assert r["timereported"] is not None  # falls back to timegenerated


def test_rfc5424_full(spark):
    line = ('<34>1 2026-08-13T22:14:15.003Z host.example.com app 1234 ID47 '
            '[exampleSDID@32473 iut="3" eventSource="App"] msg text')
    r = parse_one(spark, line)
    assert r["pri"] == 34
    assert r["protocol_version"] == 1
    assert r["hostname"] == "host.example.com"
    assert r["app_name"] == "app"
    assert r["procid"] == "1234"
    assert r["msgid"] == "ID47"
    assert r["structured_data"] == '[exampleSDID@32473 iut="3" eventSource="App"]'
    assert r["msg"] == "msg text"
    # no trailing colon: protocol-1 TAG emulation is "app[procid]"
    # (msg.c tryEmulateTAG)
    assert r["syslogtag"] == "app[1234]"
    assert r["timereported"].year == 2026
    assert r["timereported"].microsecond == 3000


def test_rfc5424_nil_fields(spark):
    import socket
    r = parse_one(spark, "<34>1 2026-08-13T22:14:15Z - - - - - hi")
    # NIL hostname -> receiver-stamp fallback (msg.c getHOSTNAME)
    assert r["hostname"] == socket.gethostname()
    assert r["app_name"] is None
    assert r["structured_data"] is None
    assert r["msg"] == "hi"


def test_rfc5424_no_msg(spark):
    r = parse_one(spark, '<34>1 2026-08-13T22:14:15Z h a p m [x@1 k="v"]')
    assert r["structured_data"] == '[x@1 k="v"]'
    assert r["msg"] in (None, "")


def test_structured_data_map(spark):
    df = spark.createDataFrame(
        [('[exampleSDID@32473 iut="3" eventSource="App"][other@1 a="b"]',)],
        "sd string")
    m = df.select(parse_structured_data(F.col("sd")).alias("m")).collect()[0]["m"]
    assert m["exampleSDID@32473"]["iut"] == "3"
    assert m["exampleSDID@32473"]["eventSource"] == "App"
    assert m["other@1"]["a"] == "b"


def test_trailing_lf_stripped(spark):
    r = parse_one(spark, "<165>Mar  1 01:00:00 h tag: hello\n")
    assert r["msg"] == "hello"


def test_receiver_stamped_props_preserved(spark):
    """Input-module-owned properties survive the parser chain (ref:
    msg.c MsgSetRcvFrom — the input sets fromhost/inputname/
    timegenerated; parsers only fill message-derived fields)."""
    from pyspark.sql import functions as F
    from rsyslog_spark.parsers import parse_syslog

    df = spark.createDataFrame(
        [("<34>1 2026-08-13T01:02:03Z web01 app 1 ID1 - hi",
          "10.0.0.7", "imudp"),
         ("garbage", None, "imudp")],
        "line string, fromhost string, inputname string",
    ).withColumn("timegenerated",
                 F.lit("2026-08-13 09:00:00").cast("timestamp"))
    rows = {("web01" if "web01" in (r.hostname or "") else "g"): r
            for r in parse_syslog(df).collect()}
    # receiver peer wins over header hostname; null falls back
    assert rows["web01"].fromhost == "10.0.0.7"
    assert rows["web01"].hostname == "web01"
    # a bare token line parses it as hostname (pmrfc3164.c:422-430
    # "empty immediately after the hostname ... is valid"); a local
    # input without a receiver stamp defaults fromhost to the
    # daemon host (getRcvFrom fallback)
    import socket
    assert rows["g"].hostname == "garbage"
    # fromhost with a NULL receiver stamp keeps the engine's
    # hostname-compat fallback (the reference's imudp always has a
    # peer, so this shape is unreachable there)
    del socket
    assert rows["g"].fromhost == "garbage"
    assert all(r.inputname == "imudp" for r in rows.values())
    assert str(rows["web01"].timegenerated) == "2026-08-13 09:00:00"


def test_programname_golden_and_iso_timestamp_in_3164(spark):
    """Goldens from tests/prop-programname.sh: an RFC3339 timestamp is
    accepted in the RFC3164 TIMESTAMP slot (pmrfc3164 tries
    ParseTIMESTAMP3339 first), a slash-bearing token is ONE tag
    (no charset restriction, SP-terminated without a colon), and
    programname cuts at the first '/'."""
    r = parse_one(
        spark, "<133>2011-03-01T11:22:12Z host tag/with/slashes "
               "msgh ...x")
    assert r["syslogtag"] == "tag/with/slashes"
    assert r["programname"] == "tag"
    assert r["hostname"] == "host"
    assert r["msg"] == "msgh ...x"
    assert (r["timereported"].year, r["timereported"].month,
            r["timereported"].day) == (2011, 3, 1)
    assert r["pri"] == 133


def test_proprepltest_tag_goldens(spark):
    """Goldens from tests/proprepltest-rfctag.sh and -nolimittag.sh:
    tags are size-unlimited in the message (sysklogd compat) but
    %syslogtag:1:32% renders at most 32 chars; SP-terminated and
    one-char tags render as-is."""
    from rsyslog_spark.parsers import parse_syslog
    from rsyslog_spark.templates import compile_template_string

    lines = [
        "<167>Mar  6 16:57:54 172.20.245.8 TAG: Rest of message...",
        "<167>Mar  6 16:57:54 172.20.245.8 0 Rest of message...",
        "<167>Mar  6 16:57:54 172.20.245.8 "
        "01234567890123456789012345678901 Rest of message...",
        "<167>Mar  6 16:57:54 172.20.245.8 "
        "01234567890123456789012345678901-toolong Rest of message...",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    lim = compile_template_string("+%syslogtag:1:32%+")
    full = compile_template_string("+%syslogtag%+")
    rows = parse_syslog(df).select(lim.col().alias("a"),
                                   full.col().alias("b")).collect()
    assert [r.a for r in rows] == [
        "+TAG:+", "+0+",
        "+01234567890123456789012345678901+",
        "+01234567890123456789012345678901+",
    ]
    assert [r.b for r in rows] == [
        "+TAG:+", "+0+",
        "+01234567890123456789012345678901+",
        "+01234567890123456789012345678901-toolong+",
    ]


def test_jsonmesg_property(spark):
    """%jsonmesg% (msg.c msgGetJSONMESG; golden fragment from
    tests/prop-jsonmesg-vg.sh): the whole message as one JSON object
    — every core property as a string, $! tree under \"$!\"."""
    import json
    from rsyslog_spark.templates import compile_template_string

    df = spark.createDataFrame(
        [("<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:00000000:",)],
        "line string")
    p = parse_syslog(df)
    out = p.select(compile_template_string("%jsonmesg%").col(p)
                   .alias("j")).first()["j"]
    # the reference golden greps the SPACED fragment verbatim
    # (prop-jsonmesg-vg.sh EXPECTED='"msg": "msgnum:00000000:", ')
    assert '"msg": "msgnum:00000000:", ' in out
    d = json.loads(out)
    assert d["msg"] == "msgnum:00000000:"       # the golden fragment
    assert d["syslogtag"] == "tag"
    assert d["hostname"] == "172.20.245.8"
    assert (d["pri"], d["syslogfacility"], d["syslogseverity"]) == \
        ("167", "20", "7")
    assert d["timereported"] == "Mar  1 01:00:00"
    assert d["$!"] == {}
    assert list(d)[:5] == ["msg", "rawmsg", "timereported",
                           "hostname", "syslogtag"]


def test_remove_msg_first_space_option(spark):
    """parser.removeMsgFirstSpace: the reference DEFAULT keeps the
    MSG leading space (pmrfc3164.c:121 bRemoveMsgFirstSpace=0, only
    stripped at :510 when enabled); our engine default strips it
    (documented divergence). The option restores reference-exact raw
    %msg% in both the chain and the standalone module."""
    from rsyslog_spark.parsers.rfc3164 import rfc3164_fields

    df = spark.createDataFrame(
        [("<13>Mar  1 10:00:00 h1 app: hello",),
         ("<13>Mar  1 10:00:00 h1 word content here",)],
        "line string")
    on = [r["msg"] for r in parse_syslog(df).collect()]
    off = [r["msg"] for r in parse_syslog(
        df, remove_msg_first_space=False).collect()]
    assert on == ["hello", "content here"]
    assert off == [" hello", " content here"]
    # standalone module sees the same options (not just the chain)
    s_on = [r["s"]["msg"] for r in df.select(
        rfc3164_fields("line").alias("s")).collect()]
    s_off = [r["s"]["msg"] for r in df.select(
        rfc3164_fields("line", remove_msg_first_space=False)
        .alias("s")).collect()]
    assert s_on == ["hello", "content here"]
    assert s_off == [" hello", " content here"]


def test_rfc3164_fields_permit_slashes(spark):
    """permitSlashesInProgramname works for direct rfc3164_fields
    callers, matching the chain's behavior."""
    from rsyslog_spark.parsers.rfc3164 import rfc3164_fields

    df = spark.createDataFrame(
        [("<13>Mar  1 10:00:00 h1 tag/with/slashes m",)],
        "line string")
    on = df.select(rfc3164_fields(
        "line", permit_slashes_in_programname=True).alias("s")) \
        .first()["s"]["programname"]
    off = df.select(rfc3164_fields("line").alias("s")) \
        .first()["s"]["programname"]
    assert on == "tag/with/slashes"
    assert off == "tag"


def test_permit_slashes_in_programname(spark):
    """global(parser.permitSlashesInProgramname="on") keeps the full
    slash-bearing token as programname (tests/
    prop-programname-with-slashes.sh); default cuts at '/'."""
    df = spark.createDataFrame(
        [("<133>2011-03-01T11:22:12Z host tag/with/slashes m",)],
        "line string")
    on = parse_syslog(df, permit_slashes_in_programname=True) \
        .first()["programname"]
    off = parse_syslog(df).first()["programname"]
    assert on == "tag/with/slashes"
    assert off == "tag"


class TestFacilityGoldens:
    """tests/fac_*.sh family: $syslogfacility-text selectors per
    facility (PRI -P values from the scripts) and the invalid-PRI
    policy (ref: parser.c:543-608 compute_off_after_pri +
    parserParsePRI; rsyslog.h LOG_PRI_INVLD=199, facility 24
    'invld'): a '<'-leading line whose PRI fails — malformed bracket,
    4+ digits, or 3-digit value over 191 — gets facility invld /
    severity debug and keeps the bracket in place (AfterPRIOffs=0);
    a line with no bracket at all gets DEFUPRI (user.notice)."""

    def test_facility_text_table(self, spark):
        # fac_{local0,local7,mail,news,ntp,uucp,authpriv,ftp}.sh use
        # tcpflood -P of facility<<3 | 1
        from rsyslog_spark.parsers import parse_syslog
        from rsyslog_spark.templates import prop_col

        pairs = {129: "local0", 185: "local7", 17: "mail",
                 57: "news", 97: "ntp", 65: "uucp",
                 81: "authpriv", 89: "ftp"}
        df = spark.createDataFrame(
            [(f"<{p}>Aug 14 12:00:00 h t: m",) for p in pairs],
            "line string")
        out = parse_syslog(df)
        got = [r["t"] for r in
               out.select(prop_col("syslogfacility-text", out)
                          .alias("t")).collect()]
        assert got == list(pairs.values())

    def test_invalid_pri_invld_facility(self, spark):
        # fac_invld{1..4}: PRI values 1011 (4-digit), 999 (>191),
        # malformed bracket; plus the no-bracket DEFUPRI case
        from rsyslog_spark.parsers import parse_syslog
        from rsyslog_spark.templates import prop_col

        cases = {
            "<1011>Aug 14 12:00:00 h t: m": (199, 24, 7, "invld"),
            "<999>Aug 14 12:00:00 h t: m": (199, 24, 7, "invld"),
            "<abc>Aug 14 12:00:00 h t: m": (199, 24, 7, "invld"),
            "<999>1 2026-08-13T07:00:00Z h a 1 i - m":
                (199, 24, 7, "invld"),   # fac_invld4: not RFC5424
            "no bracket": (13, 1, 5, "user"),
        }
        df = spark.createDataFrame([(c,) for c in cases],
                                   "line string")
        out = parse_syslog(df)
        rows = out.select(
            "pri", "syslogfacility", "syslogseverity",
            prop_col("syslogfacility-text", out).alias("ft"),
            "protocol_version", "syslogtag").collect()
        for (line, want), r in zip(cases.items(), rows):
            assert (r["pri"], r["syslogfacility"],
                    r["syslogseverity"], r["ft"]) == want, line
            assert r["protocol_version"] == 0   # invld never 5424
        # bracket NOT stripped: the TAG scan sees it
        assert rows[0]["syslogtag"] == "<1011>Aug"

    def test_invld_selector_routes(self, spark, tmp_path):
        # fac_invld1.sh shape: 'invld.=debug' selects exactly the
        # invalid-PRI messages, through the full config runtime
        import os
        from rsyslog_spark.config.runtime import run_config_batch

        src = tmp_path / "in"
        src.mkdir()
        (src / "a.log").write_text(
            "<1011>Aug 14 12:00:00 h t: msgnum:0\n"
            "<13>Aug 14 12:00:00 h t: msgnum:1\n"
            "<999>Aug 14 12:00:00 h t: msgnum:2\n")
        out = tmp_path / "out"
        conf = f'''
template(name="outfmt" type="string" string="%msg%\\n")
ruleset(name="m") {{
  invld.=debug action(type="omfile" file="{out}"
                      template="outfmt")
}}
input(type="imfile" file="{src}/*.log" ruleset="m")
'''
        run_config_batch(spark, conf)
        got = sorted(
            ln for f in os.listdir(out) if f.startswith("part")
            for ln in open(out / f).read().splitlines())
        # invalid-PRI rows only; msg starts after the TAG scan of the
        # unstripped line ('<1011>Aug' is the tag, msg is the rest)
        assert got == ["14 12:00:00 h t: msgnum:0",
                       "14 12:00:00 h t: msgnum:2"]


def test_parsertest_3164_buggyday_golden(spark, tmp_path):
    """Byte-exact vs tests/parsertest-parse-3164-buggyday.sh: the
    date-rfc3164-buggyday format zero-pads the day ('Mar 07'), and
    the '<38> Mar  7' input exercises the HP-Procurve single-space
    skip before the 3164 timestamp (pmrfc3164.c:346-360). The
    reference's raw-%msg% column keeps the leading space
    (bRemoveMsgFirstSpace=0 default); our engine default strips it —
    documented divergence, so the golden asserts with the engine's
    parser.removeMsgFirstSpace="off" to match the reference bytes."""
    import os
    from rsyslog_spark.config.runtime import run_config_batch

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.log").write_text(
        "<38> Mar  7 19:06:53 example tag: testmessage (only date actually tested)\n"
        "<38> Mar 17 19:06:53 example tag: testmessage (only date actually tested)\n")
    out = tmp_path / "out"
    conf = f'''
global(parser.removeMsgFirstSpace="off")
template(name="outfmt" type="string"
         string="%PRI%,%syslogfacility-text%,%syslogseverity-text%,%timestamp:::date-rfc3164-buggyday%,%hostname%,%programname%,%syslogtag%,%msg%\\n")
ruleset(name="ruleset1") {{
  action(type="omfile" file="{out}" template="outfmt")
}}
input(type="imfile" file="{src}/*.log" ruleset="ruleset1")
'''
    run_config_batch(spark, conf)
    got = sorted(
        ln for f in os.listdir(out) if f.startswith("part")
        for ln in open(out / f).read().splitlines())
    assert got == [
        "38,auth,info,Mar 07 19:06:53,example,tag,tag:,"
        " testmessage (only date actually tested)",
        "38,auth,info,Mar 17 19:06:53,example,tag,tag:,"
        " testmessage (only date actually tested)",
    ]


def test_parsertest_nodate_fields(spark):
    """tests/parsertest-parse-nodate.sh: hostname/TAG parse even
    with no timestamp — an invalid first token ('xapi:', colon not a
    hostname char) leaves hostname to the receiver stamp; a valid
    one ('This') becomes the hostname and the next token tags. The
    full byte-exact render lives in test_parsertest_goldens."""
    import socket

    from rsyslog_spark.parsers import parse_syslog

    df = spark.createDataFrame(
        [("<27>xapi: [error|xen3|15] Connection to master died.",),
         ("This is a message!",)], "line string")
    rows = parse_syslog(df).collect()
    r = rows[0]
    assert (r["pri"], r["syslogfacility"], r["syslogseverity"]) == \
        (27, 3, 3)                                # daemon.err
    assert r["syslogtag"] == "xapi:"
    assert r["programname"] == "xapi"
    assert r["hostname"] == socket.gethostname()  # receiver stamp
    assert r["msg"] == "[error|xen3|15] Connection to master died."
    r2 = rows[1]
    assert (r2["pri"], r2["syslogtag"], r2["hostname"]) == \
        (13, "is", "This")

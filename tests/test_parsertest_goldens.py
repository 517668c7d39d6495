"""Byte-exact goldens from the reference's parsertest-parse* family
(tests/parsertest-parse{1,2,3}.sh, parsertest-parse-nodate.sh,
parsertest-parse-3164-buggyday.sh) — the core pmrfc3164/pmrfc5424
fidelity batteries. Every EXPECTED line is copied verbatim from the
reference script ($RS_HOSTNAME → the local hostname, which is what
tcpflood's loopback connection resolves to there)."""

from __future__ import annotations

import os
import socket

from rsyslog_spark.config.runtime import run_config_batch

TPL8 = ('template(name="outfmt" type="string" string="%PRI%,'
        '%syslogfacility-text%,%syslogseverity-text%,%timestamp%,'
        '%hostname%,%programname%,%syslogtag%,%msg%\\n")')


def _run(spark, tmp_path, tpl: str, msgs: list, sub: str) -> list:
    src = tmp_path / f"in_{sub}.log"
    src.write_text("".join(m + "\n" for m in msgs))
    out = tmp_path / f"out_{sub}"
    conf = (f'global(parser.removeMsgFirstSpace="off")\n{tpl}\n'
            f'ruleset(name="r_{sub}") {{\n'
            f'  action(type="omfile" file="{out}" template="outfmt")\n'
            f'}}\ninput(type="imfile" file="{src}" ruleset="r_{sub}")\n')
    run_config_batch(spark, conf)
    return sorted("".join(
        open(out / p).read() for p in sorted(os.listdir(out))
        if p.startswith("part")).splitlines())


def test_parsertest_parse1(spark, tmp_path):
    """parsertest-parse1.sh: 29 messages covering vendor tags,
    case-variant months, leading/inline years, stray colons after
    the time, bare timestamps (hostname falls back to the receiver),
    RFC5424 NIL fields, BOM-literal text, and invalid hostnames."""
    H = socket.gethostname()
    msgs = [
        '<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: UDP request discarded from SERVER1/2741 to test_app:255.255.255.255/61601',
        '<167>Mar 27 19:06:53 source_server sshd(pam_unix)[12750]: session opened for user foo by (uid=0)',
        '<167>Apr  6 15:07:10 lxcvs07 sshd(pam_unix)[31738]: session closed for user cvsadmin',
        '<167>Jul 31 21:39:21 example-b example-gw[10538]: disconnect host=/192.0.2.1 destination=192.0.2.2/11282 in=3274 out=1448 duration=0',
        '<167>AUG 10 22:18:24 host tag This msg contains 8-bit European chars: äöü',
        '<167> Mar  7 19:06:53 example tag: testmessage (only date actually tested)',
        '<167>Mar 7 2008 19:06:53: example tag: testmessage (only date actually tested)',
        '<167>Mar 7 2008 19:06:53 example tag: testmessage (only date actually tested)',
        '<167>Mar 7 19:06:53: example tag: testmessage (only date actually tested)',
        '<14>Jan  6 2009 15:22:26 localhost',
        '<167>Oct  8 23:05:06 10.321.1.123 05",result_code=200,b',
        '<167>Feb 18 16:01:59 serverX -- MARK --',
        'Feb 18 16:01:59 serverX -- MARK --',
        '<38>Mar 27 19:06:53 source_server 0123456789012345678901234567890123456789: MSG part',
        '<29>Oct 16 20:47:24 example-p exam-pl[12345]: connect host= /192.0.2.1',
        '<34>Oct 11 22:14:15 mymachine su: su root failed for lonvick on /dev/pts/8',
        '<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - BOMsu root failed for lonvick on /dev/pts/8',
        '<165>1 2003-08-24T05:14:15.000003-07:00 192.0.2.1 myproc 8710 - - %% Its time to make the do-nuts.',
        '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [exampleSDID@32473 iut="3" eventSource= "Application" eventID="1011"][examplePriority@32473 class="high"]',
        '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [exampleSDID@32473 iut="3" eventSource= "Application" eventID="1011"] BOMAn application event log entry...',
        '<6>AUG 10 22:18:24 2009  netips-warden2-p [audit] user=[*SMS] src=192.168.11.11 iface=5 access=9 Update State Reset',
        '<14>Aug 30 23:00:05 X4711 AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA',
        '<14>Aug 30 23:00:05 X4711 ',
        '<14>Aug 30 23:00:05 X4711',
        '<14>Aug 30 23:00:05 ',
        '<14>Aug 30 23:00:05',
        '<14>2010-08-30T23:00:05Z X4711 AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA',
        '<14>2010-08-30T23:00:05Z X4711 ',
        '<14>2010-08-30T23:00:05Z X4711',
    ]
    expected = '''167,local4,debug,Mar  6 16:57:54,172.20.245.8,%PIX-7-710005,%PIX-7-710005:, UDP request discarded from SERVER1/2741 to test_app:255.255.255.255/61601
167,local4,debug,Mar 27 19:06:53,source_server,sshd(pam_unix),sshd(pam_unix)[12750]:, session opened for user foo by (uid=0)
167,local4,debug,Apr  6 15:07:10,lxcvs07,sshd(pam_unix),sshd(pam_unix)[31738]:, session closed for user cvsadmin
167,local4,debug,Jul 31 21:39:21,example-b,example-gw,example-gw[10538]:, disconnect host=/192.0.2.1 destination=192.0.2.2/11282 in=3274 out=1448 duration=0
167,local4,debug,Aug 10 22:18:24,host,tag,tag, This msg contains 8-bit European chars: äöü
167,local4,debug,Mar  7 19:06:53,example,tag,tag:, testmessage (only date actually tested)
167,local4,debug,Mar  7 19:06:53,example,tag,tag:, testmessage (only date actually tested)
167,local4,debug,Mar  7 19:06:53,example,tag,tag:, testmessage (only date actually tested)
167,local4,debug,Mar  7 19:06:53,example,tag,tag:, testmessage (only date actually tested)
14,user,info,Jan  6 15:22:26,localhost,,,
167,local4,debug,Oct  8 23:05:06,10.321.1.123,05",result_code=200,b,05",result_code=200,b,
167,local4,debug,Feb 18 16:01:59,serverX,--,--, MARK --
13,user,notice,Feb 18 16:01:59,serverX,--,--, MARK --
38,auth,info,Mar 27 19:06:53,source_server,0123456789012345678901234567890123456789,0123456789012345678901234567890123456789:, MSG part
29,daemon,notice,Oct 16 20:47:24,example-p,exam-pl,exam-pl[12345]:, connect host= /192.0.2.1
34,auth,crit,Oct 11 22:14:15,mymachine,su,su:, su root failed for lonvick on /dev/pts/8
34,auth,crit,Oct 11 22:14:15,mymachine.example.com,su,su,BOMsu root failed for lonvick on /dev/pts/8
165,local4,notice,Aug 24 05:14:15,192.0.2.1,myproc,myproc[8710],%% Its time to make the do-nuts.
165,local4,notice,Oct 11 22:14:15,mymachine.example.com,evntslog,evntslog,
165,local4,notice,Oct 11 22:14:15,mymachine.example.com,evntslog,evntslog,BOMAn application event log entry...
6,kern,info,Aug 10 22:18:24,2009,,, netips-warden2-p [audit] user=[*SMS] src=192.168.11.11 iface=5 access=9 Update State Reset
14,user,info,Aug 30 23:00:05,X4711,AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA,AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA,
14,user,info,Aug 30 23:00:05,X4711,,,
14,user,info,Aug 30 23:00:05,X4711,,,
14,user,info,Aug 30 23:00:05,@H@,,,
14,user,info,Aug 30 23:00:05,@H@,,,
14,user,info,Aug 30 23:00:05,X4711,AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA,AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA,
14,user,info,Aug 30 23:00:05,X4711,,,
14,user,info,Aug 30 23:00:05,X4711,,,'''.replace("@H@", H)
    got = _run(spark, tmp_path, TPL8, msgs, "p1")
    assert got == sorted(expected.splitlines())


def test_parsertest_parse2(spark, tmp_path):
    """parsertest-parse2.sh: a '#001' token is no valid hostname —
    it rewinds into the TAG scan."""
    tpl = ('template(name="outfmt" type="string" string="%PRI%,'
           '%syslogfacility-text%,%syslogseverity-text%,%timestamp%,'
           '%programname%,%syslogtag%,%msg%\\n")')
    got = _run(spark, tmp_path, tpl, [
        '<175>Oct 16 23:47:31 #001 MSWinEventLog 0#011Security#01119023582#011Fri Oct 16 16:30:44 2009#011592#011Security#011rgabcde#011User#011Success Audit#011XSXSXSN01#011Detailed Tracking#011#0112572#01119013885',
    ], "p2")
    assert got == [
        '175,local5,debug,Oct 16 23:47:31,#001,#001, MSWinEventLog '
        '0#011Security#01119023582#011Fri Oct 16 16:30:44 2009#011592'
        '#011Security#011rgabcde#011User#011Success Audit#011XSXSXSN01'
        '#011Detailed Tracking#011#0112572#01119013885']


def test_parsertest_parse3(spark, tmp_path):
    """parsertest-parse3.sh: date-rfc3339 render SUBSTRINGED (the
    date formats before field processing), R-regex procid pull from
    a bracketed no-colon tag, csv quoting."""
    tpl = ('template(name="outfmt" type="string" string='
           '"%timereported:1:19:date-rfc3339,csv%, %hostname:::csv%,'
           ' %programname:::csv%,'
           ' %syslogtag:R,ERE,0,BLANK:[0-9]+--end:csv%,'
           ' %syslogseverity:::csv%, %msg:::drop-last-lf,csv%\\n")')
    got = _run(spark, tmp_path, tpl, [
        '<175>Oct 16 2009 23:47:31 hostname tag This is a message',
        '<175>Oct 16 2009 23:47:31 hostname tag[1234] This is a message',
    ], "p3")
    assert got == [
        '"2009-10-16T23:47:31", "hostname", "tag", "", "7", '
        '" This is a message"',
        '"2009-10-16T23:47:31", "hostname", "tag", "1234", "7", '
        '" This is a message"']


def test_parsertest_parse_nodate(spark, tmp_path):
    """parsertest-parse-nodate.sh: hostname/TAG parse runs even
    without a timestamp — an invalid first token ('xapi:') leaves
    hostname to the receiver; a valid one ('This') becomes it."""
    H = socket.gethostname()
    tpl = ('template(name="outfmt" type="string" string="%PRI%,'
           '%syslogfacility-text%,%syslogseverity-text%,%hostname%,'
           '%programname%,%syslogtag%,%msg%\\n")')
    got = _run(spark, tmp_path, tpl, [
        '<27>xapi: [error|xen3|15|Guest liveness monitor D:bca30ab3f1c1|master_connection] Connection to master died. I will continue to retry indefinitely (suppressing future logging of this message)',
        'This is a message!',
    ], "pn")
    assert got == sorted([
        f'27,daemon,err,{H},xapi,xapi:, [error|xen3|15|Guest liveness '
        'monitor D:bca30ab3f1c1|master_connection] Connection to '
        'master died. I will continue to retry indefinitely '
        '(suppressing future logging of this message)',
        '13,user,notice,This,is,is, a message!'])


def test_parsertest_buggyday(spark, tmp_path):
    """parsertest-parse-3164-buggyday.sh: date-rfc3164-buggyday
    zero-pads the day; the single leading header space (HP Procurve)
    is skipped."""
    tpl = ('template(name="outfmt" type="string" string="%PRI%,'
           '%syslogfacility-text%,%syslogseverity-text%,'
           '%timestamp:::date-rfc3164-buggyday%,%hostname%,'
           '%programname%,%syslogtag%,%msg%\\n")')
    got = _run(spark, tmp_path, tpl, [
        '<38> Mar  7 19:06:53 example tag: testmessage (only date actually tested)',
        '<38> Mar 17 19:06:53 example tag: testmessage (only date actually tested)',
    ], "pb")
    assert got == [
        '38,auth,info,Mar 07 19:06:53,example,tag,tag:, testmessage '
        '(only date actually tested)',
        '38,auth,info,Mar 17 19:06:53,example,tag,tag:, testmessage '
        '(only date actually tested)']


def _run_conf(spark, tmp_path, conf: str, msgs: list, sub: str) -> str:
    src = tmp_path / f"in_{sub}.log"
    src.write_text("".join(m + "\n" for m in msgs))
    conf = conf.replace("@OUT@", f"{tmp_path}/out_{sub}") \
               .replace("@IN@", str(src))
    run_config_batch(spark, conf)
    d = tmp_path / f"out_{sub}"
    if not os.path.isdir(d):
        return ""
    parts = [p for p in sorted(os.listdir(d)) if p.startswith("part")]
    if any(p.endswith(".parquet") for p in parts):
        return ""     # template-less omfile → parquet; caller reads
    return "".join(
        open(os.path.join(d, p)).read() for p in parts)


def test_pmrfc3164_default_tag(spark, tmp_path):
    """pmrfc3164-defaultTag.sh: force.tagEndingByColon rewinds
    no-colon tokens into MSG (including the header-eaten space) and
    TAG defaults to '-'."""
    out = _run_conf(spark, tmp_path, '''
global(parser.removeMsgFirstSpace="off")
parser(name="custom.rfc3164" type="pmrfc3164" permit.AtSignsInHostname="off"
  force.tagEndingByColon="on")
template(name="outfmt" type="string" string="?%hostname%?%syslogtag%?%msg%?\\n")
ruleset(name="customparser" parser="custom.rfc3164") {
  :hostname, contains, "Hostname" action(type="omfile" template="outfmt" file="@OUT@")
}
input(type="imfile" file="@IN@" ruleset="customparser")
''', [
        '<129>Mar 10 01:00:00 Hostname1  msgnum:1',
        '<129>Mar 10 01:00:00 Hostname2   msgnum:2',
        '<129>Mar 10 01:00:00 Hostname3 tag msgnum:3',
        '<129>Mar 10 01:00:00 Hostname4 tag: msg',
    ], "dt")
    assert sorted(out.splitlines()) == sorted(
        '''?Hostname1?-?  msgnum:1?
?Hostname2?-?   msgnum:2?
?Hostname3?-? tag msgnum:3?
?Hostname4?tag:? msg?'''.splitlines())


def test_pmrfc3164_json(spark, tmp_path):
    """pmrfc3164-json.sh: a line whose first non-blank char is '{' or
    '[' is headerless JSON — MSG is the entire rest, leading spaces
    preserved."""
    out = _run_conf(spark, tmp_path, '''
global(parser.removeMsgFirstSpace="off")
template(name="outfmt" type="string" string="%msg%---%rawmsg%\\n")
ruleset(name="rs") {
  action(type="omfile" template="outfmt" file="@OUT@")
}
input(type="imfile" file="@IN@" ruleset="rs")
''', [
        '{ "c1":1 }',
        '   { "c2":2 }',
        '   [{ "c3":3 }]',
    ], "js")
    assert sorted(out.splitlines()) == sorted(
        '''{ "c1":1 }---{ "c1":1 }
   { "c2":2 }---   { "c2":2 }
   [{ "c3":3 }]---   [{ "c3":3 }]'''.splitlines())


def test_pmrfc3164_msg_first_space_instance(spark, tmp_path):
    """pmrfc3164-msgFirstSpace.sh: the per-INSTANCE
    remove.msgFirstSpace="on" parser param strips exactly one space
    after the tag colon."""
    out = _run_conf(spark, tmp_path, '''
global(parser.removeMsgFirstSpace="off")
parser(name="custom.rfc3164" type="pmrfc3164" remove.msgFirstSpace="on")
template(name="outfmt" type="string" string="-%msg%-\\n")
ruleset(name="customparser" parser="custom.rfc3164") {
  :syslogtag, contains, "tag" action(type="omfile" template="outfmt" file="@OUT@")
}
input(type="imfile" file="@IN@" ruleset="customparser")
''', [
        '<129>Mar 10 01:00:00 172.20.245.8 tag: msgnum:1',
        '<129>Mar 10 01:00:00 172.20.245.8 tag:  msgnum:2',
        '<129>Mar 10 01:00:00 172.20.245.8 tag:msgnum:3',
        '<129>Mar 10 01:00:00 172.20.245.8 tag4:',
    ], "fs")
    assert sorted(out.splitlines()) == sorted(
        "-msgnum:1-\n- msgnum:2-\n-msgnum:3-\n--".splitlines())


def test_pmrfc3164_drop(spark, tmp_path):
    """pmrfc3164-drop.sh: detect.headerless + headerless.drop sends
    the non-syslog line to the errorfile and drops it from the
    pipeline; the normal line flows."""
    err = tmp_path / "drop.err"
    out = _run_conf(spark, tmp_path, f'''
parser(name="p3164" type="pmrfc3164"
  detect.headerless="on" headerless.errorfile="{err}"
  headerless.drop="on")
ruleset(name="input" parser="p3164") {{
  action(type="omfile" file="@OUT@")
}}
input(type="imfile" file="@IN@" ruleset="input")
''', [
        'this is not syslog',
        '<13>Oct 11 22:14:15 host tag: normal',
    ], "dr")
    del out   # template-less omfile writes parquet — read it back
    rows = spark.read.parquet(f"{tmp_path}/out_dr").collect()
    msgs = [r["msg"] or "" for r in rows]
    assert not any("this is not syslog" in m for m in msgs)
    assert any("normal" in m for m in msgs)
    assert "this is not syslog" in err.read_text()


def test_parsertest_8bit_escape(spark, tmp_path):
    """parsertest-parse_8bit_escape.sh:
    $Escape8BitCharactersOnReceive escapes each UTF-8 BYTE above 127
    to #OOO octal at receive time (SanitizeMsg, parser.c:504-515)."""
    out = _run_conf(spark, tmp_path, '''
global(parser.removeMsgFirstSpace="off")
$Escape8BitCharactersOnReceive on
template(name="outfmt" type="string" string="%PRI%,%syslogfacility-text%,%syslogseverity-text%,%timestamp%,%hostname%,%programname%,%syslogtag%,%msg%\\n")
ruleset(name="ruleset1") {
  action(type="omfile" file="@OUT@" template="outfmt")
}
input(type="imfile" file="@IN@" ruleset="ruleset1")
''', [
        '<6>AUG 10 22:18:24 host tag This msg contains 8-bit European chars: äöü',
    ], "8b")
    assert out == ('6,kern,info,Aug 10 22:18:24,host,tag,tag, This '
                   'msg contains 8-bit European chars: '
                   '#303#244#303#266#303#274\n')


def test_pmnull_withparams(spark, tmp_path):
    """pmnull-withparams.sh: a pmnull parser instance sets TAG and
    PRI from its config and leaves MSG as the WHOLE raw line
    (including the wire PRI) — EXPECTED copied verbatim."""
    out = _run_conf(spark, tmp_path, '''
parser(name="custom.pmnull" type="pmnull" tag="mytag" syslogfacility="3" syslogseverity="1")
template(name="test" type="string" string="tag: %syslogtag%, pri: %pri%, syslogfacility: %syslogfacility%, syslogseverity: %syslogseverity% msg: %msg%\\n")
ruleset(name="ruleset" parser=["custom.pmnull", "rsyslog.pmnull"]) {
  action(type="omfile" file="@OUT@" template="test")
}
input(type="imfile" file="@IN@" ruleset="ruleset")
''', [
        '<189>16261: May 28 16:09:56.185: %SYS-5-CONFIG_I: Configured '
        'from console by adminsepp on vty0 (10.23.214.226)',
    ], "pn2")
    assert out == ('tag: mytag, pri: 25, syslogfacility: 3, '
                   'syslogseverity: 1 msg: <189>16261: May 28 '
                   '16:09:56.185: %SYS-5-CONFIG_I: Configured from '
                   'console by adminsepp on vty0 (10.23.214.226)\n')

"""pmsnare control-character-escape variants (round-8 verdict item 3).

pmsnare is a fixup PARSER in the ruleset chain (contrib/pmsnare/
pmsnare.c): it rewrites the tab between hostname and the Snare tag
and the tab after the tag to spaces — where "tab" means the escaped
representation the receive-time sanitizer produced ('#011' by
default, '\\t' under parser.escapeControlCharactersCStyle, raw TAB
with escaping off). Goldens replay each reference test's messages
and compare the rendered template lines byte-exact.

The reference's EscapeControlCharactersOnReceive default is ON; the
engine's documented divergent default is off, so each golden config
states the directive explicitly.
"""
import os
import re

from rsyslog_spark.config.runtime import run_config_batch

REF = "/root/reference/tests"

OUTFMT = ('template(name="outfmt" type="string" '
          'string="%PRI%,%syslogfacility-text%,%syslogseverity-text%'
          ',%programname%,%syslogtag%,%msg%\\n")')
RULESET = '''
ruleset(name="ruleset1" parser=["rsyslog.snare","rsyslog.rfc5424","rsyslog.rfc3164"]) {
  action(type="omfile" file="@OUT@" template="outfmt")
}
input(type="imfile" file="@IN@" ruleset="ruleset1")
'''


def _messages(sh: str) -> list[str]:
    """tcpflood -M payloads with shell-quoting applied the way bash +
    tcpflood do: ``\\\\\\"`` in the file survives as a literal quote,
    bare ``"`` (unescaped) is eaten by the shell."""
    msgs = re.findall(r'tcpflood -m1(?: -T "udp")? -M "\\"(.*?)\\""',
                      sh, re.S)
    out = []
    for m in msgs:
        m = m.replace('\\\\\\"', "\x00")   # file \\\"  → literal "
        m = m.replace('"', "")             # shell-eaten bare quotes
        m = m.replace("\x00", '"')
        out.append(m)
    return out


def _expected(sh: str) -> list[str]:
    m = re.search(r"export EXPECTED='(.*?)'\ncmp_exact", sh, re.S) \
        or re.search(r"echo '(.*?)' \| cmp - ", sh, re.S)
    return m.group(1).split("\n")


def _run(spark, tmp_path, name: str, extra_conf: str) -> None:
    sh = open(f"{REF}/pmsnare-{name}.sh").read()
    msgs = _messages(sh)
    want = _expected(sh)
    src = tmp_path / f"{name}.log"
    src.write_text("".join(m + "\n" for m in msgs))
    conf = (extra_conf + "\n"
            + 'global(parser.removeMsgFirstSpace="off")\n'
            + OUTFMT
            + RULESET.replace("@OUT@", f"{tmp_path}/out_{name}")
                     .replace("@IN@", str(src)))
    run_config_batch(spark, conf)
    got = "".join(
        open(f"{tmp_path}/out_{name}/{p}").read()
        for p in sorted(os.listdir(f"{tmp_path}/out_{name}"))
        if p.startswith("part"))
    assert sorted(got.splitlines()) == sorted(want), \
        (name, got.splitlines(), want)
    assert len(got.splitlines()) == len(msgs)


def test_pmsnare_ccdefault(spark, tmp_path):
    """pmsnare-ccdefault.sh: default escaping → tabs as '#011';
    pmsnare rewrites hostname<tab>tag and tag<tab> to spaces; IOSXE /
    ASA / netscaler / CROND lines flow through untouched."""
    _run(spark, tmp_path, "ccdefault",
         "$EscapeControlCharactersOnReceive on")


def test_pmsnare_ccoff(spark, tmp_path):
    """pmsnare-ccoff.sh (same conf as ccdefault — the 'off' is in the
    message mix): non-syslog hostname<tab>MSWinEventLog form gets
    PRI 13 and the MSWinEventLog tag after the fixup."""
    _run(spark, tmp_path, "ccoff",
         "$EscapeControlCharactersOnReceive on")


def test_pmsnare_ccbackslash(spark, tmp_path):
    """pmsnare-ccbackslash.sh: parser.escapeControlCharactersCStyle
    → tabs escape as '\\t' and pmsnare matches THAT representation."""
    _run(spark, tmp_path, "ccbackslash",
         '$EscapeControlCharactersOnReceive on\n'
         'global(parser.escapeControlCharactersCStyle="on")')


def test_pmsnare_cccstyle(spark, tmp_path):
    """pmsnare-cccstyle.sh: cstyle switch alone implies escaping (the
    reference's EscapeControlCharactersOnReceive default is on)."""
    _run(spark, tmp_path, "cccstyle",
         'global(parser.escapeControlCharactersCStyle="on")')


def test_parsertest_snare_ccoff_udp(spark, tmp_path):
    """parsertest-snare_ccoff_udp.sh: NO pmsnare in the chain and
    escaping OFF — the raw-tab Snare line parses as a plain 3164
    no-timestamp message: PRI 13, tag runs to the first SPACE
    (tabs are NOT tag terminators), msg keeps the raw tabs."""
    sh = open(f"{REF}/parsertest-snare_ccoff_udp.sh").read()
    # trailing '\\\n' in the tcpflood arg = an escaped trailing LF on
    # the datagram — dropped at receive
    msg = re.sub(r"\\+n$", "", _messages(sh)[0])
    src = tmp_path / "udp1.log"
    src.write_text(msg + "\n")
    conf = f'''
$EscapeControlCharactersOnReceive off
global(parser.removeMsgFirstSpace="off")
template(name="outfmt" type="string" string="%PRI%,%syslogfacility-text%,%syslogseverity-text%,%hostname%,%programname%,%syslogtag%,%msg%\\n")
ruleset(name="ruleset1") {{
  action(type="omfile" file="{tmp_path}/out_udp1" template="outfmt")
}}
input(type="imfile" file="{src}" ruleset="ruleset1")
'''
    run_config_batch(spark, conf)
    got = "".join(
        open(f"{tmp_path}/out_udp1/{p}").read()
        for p in sorted(os.listdir(f"{tmp_path}/out_udp1"))
        if p.startswith("part"))
    from rsyslog_spark.session import local_hostname
    want = re.search(r'export EXPECTED="(.*?)\\n"\ncmp_exact', sh,
                     re.S).group(1).replace("$RS_HOSTNAME",
                                            local_hostname())
    assert got == want + "\n", (repr(got), repr(want))

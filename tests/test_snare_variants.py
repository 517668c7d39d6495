"""mmsnareparse extended-variant goldens (round-8 verdict item 1).

Each test replays a reference test's exact input + template + checks:
mmsnareparse-sysmon.sh (definition.file routing, single-space Sysmon
pairs), mmsnareparse-kerberos.sh (section escape → $!win!Kerberos),
mmsnareparse-value-types.sh (guid/ip/timestamp validation +
$!win!Validation!Errors), mmsnareparse-custom.sh (wildcard custom
sections, per-event custom patterns, event metadata outcome).
"""
import json
import os
import re

import pytest

from rsyslog_spark.config.runtime import run_config_batch

REF = "/root/reference/tests"
DEFS = "/root/reference/plugins/mmsnareparse/sysmon_definitions.json"


def _run(spark, tmp_path, conf: str, lines: str, sub: str = "o") -> str:
    src = tmp_path / f"in_{sub}.log"
    src.write_text(lines)
    conf = conf.replace("@OUT@", f"{tmp_path}/out_{sub}") \
               .replace("@IN@", str(src))
    run_config_batch(spark, conf)
    d = tmp_path / f"out_{sub}"
    if not d.exists():
        return ""
    return "".join(
        open(d / p).read()
        for p in sorted(os.listdir(d)) if p.startswith("part"))


def _sh_parts(name: str, tpl_name: str = "outfmt"):
    sh = open(f"{REF}/{name}").read()
    msgs = re.search(r"cat <<'MSG' > \S+\n(.*?)\nMSG\n", sh,
                     re.S).group(1)
    tpl = re.search(
        r'(template\(name="%s".*?\n\})\n' % tpl_name, sh,
        re.S).group(1)
    return sh, msgs, tpl


def test_mmsnareparse_sysmon(spark, tmp_path):
    """mmsnareparse-sysmon.sh: Microsoft Sysmon events through
    definition.file — events table supplies Category/Subtype, field
    table routes SourceIp/DestinationIp/Protocol → $!win!Network
    while SourcePort/DestinationPort hit the CORE generic pattern
    first and stay in EventData (the reference's select_field_pattern
    order — hence the empty port slots in the expected lines), and
    the RFC3164 single-space 'Key: value' run is scanned on the
    single-word-key boundary (parse_key_value_sequence)."""
    sh, msgs, tpl = _sh_parts("mmsnareparse-sysmon.sh")
    out = _run(spark, tmp_path, tpl + f'''
ruleset(name="m") {{
  action(type="mmsnareparse" definition.file="{DEFS}")
  action(type="omfile" file="@OUT@" template="outfmt")
}}
input(type="imfile" file="@IN@" ruleset="m")
''', msgs + "\n", sub="sym")
    for want in re.findall(r"content_check '([^']+)'", sh):
        assert want in out, (want, out)


def test_mmsnareparse_kerberos(spark, tmp_path):
    """mmsnareparse-kerberos.sh: the 4769 service-ticket sample —
    Client Address/Port stay in $!win!Network (lexical section
    match), Ticket Options / Result Code / Ticket Encryption Type /
    Pre-Authentication Type ESCAPE the 'Additional Information'
    section to $!win!Kerberos via the core pattern table."""
    sh = open(f"{REF}/mmsnareparse-kerberos.sh").read()
    tpl = re.search(r'(template\(name="kjson".*?\n\})\n', sh,
                    re.S).group(1)
    msg = [ln for ln in open(
        f"{REF}/testsuites/mmsnareparse/sample-events.data")
        if "4769" in ln][0]
    out = _run(spark, tmp_path, tpl + '''
ruleset(name="m") {
  action(type="mmsnareparse")
  action(type="omfile" file="@OUT@" template="kjson")
}
input(type="imfile" file="@IN@" ruleset="m")
''', msg, sub="krb")
    for want in re.findall(r"content_check '([^']+)'", sh):
        assert want in out, (want, out)


def test_mmsnareparse_value_types(spark, tmp_path):
    """mmsnareparse-value-types.sh: valid GUID/IP/ISO-timestamps
    store as strings; malformed ones take the fallback path (raw
    string kept) AND record $!win!Validation!Errors entries naming
    the field. Replays the reference test's python assertion block
    over the $!all-json render."""
    _sh, msgs, tpl = _sh_parts("mmsnareparse-value-types.sh",
                               "jsonout")
    out = _run(spark, tmp_path, tpl + '''
ruleset(name="m") {
  action(type="mmsnareparse")
  action(type="omfile" file="@OUT@" template="jsonout")
}
input(type="imfile" file="@IN@" ruleset="m")
''', msgs + "\n", sub="vty")
    docs = [json.loads(line) for line in out.splitlines()
            if line.strip()]
    assert len(docs) == 3, out[:400]
    first, second, third = (d["win"] for d in docs)

    assert first["NewLogon"]["LogonGUID"] == \
        "{5a8f0679-9b23-4cb7-a8c7-3d650c9b52ec}"
    assert first["Network"]["SourceNetworkAddress"] == \
        "192.168.50.12"
    assert second["EventData"]["PreviousTime"] == \
        "2024-09-17T14:38:20.338436Z"
    assert second["EventData"]["NewTime"] == \
        "2024-09-17T14:38:20.500269Z"
    assert third["NewLogon"]["LogonGUID"] == "not-a-guid"
    assert third["Network"]["SourceNetworkAddress"] == \
        "999.999.999.999"
    assert third["EventData"]["PreviousTime"] == \
        "definitely-not-a-timestamp"
    assert third["EventData"]["NewTime"] == "2024-99-99T25:61:61Z"
    joined = "\n".join(third["Validation"]["Errors"])
    assert "LogonGUID" in joined
    assert "SourceNetworkAddress" in joined
    assert "PreviousTime" in joined
    # valid values of doc 1/2 must NOT be flagged
    assert "Validation" not in second or not any(
        "PreviousTime" in e
        for e in second.get("Validation", {}).get("Errors", []))


def test_mmsnareparse_custom_definitions(spark, tmp_path):
    """mmsnareparse-custom.sh: a user definition file with a
    case-insensitive wildcard section ('Custom Block*' →
    CustomBlock), a global field (CustomEventTag → EventData), a
    per-event pattern (4001: WidgetID → CustomBlock) and event
    metadata (Category=Custom, Outcome=success)."""
    sh = open(f"{REF}/mmsnareparse-custom.sh").read()
    defs = re.search(r'cat >"\$DEF_FILE" <<\'JSON\'\n(.*?)\nJSON\n',
                     sh, re.S).group(1)
    tpl = re.search(r'(template\(name="customfmt".*?\n\})\n', sh,
                    re.S).group(1)
    msg = open(f"{REF}/testsuites/mmsnareparse/"
               "sample-custom-pattern.data").read()
    dfile = tmp_path / "defs.json"
    dfile.write_text(defs)
    out = _run(spark, tmp_path, tpl + f'''
ruleset(name="m") {{
  action(type="mmsnareparse" definition.file="{dfile}"
         validation.mode="strict")
  action(type="omfile" file="@OUT@" template="customfmt")
}}
input(type="imfile" file="@IN@" ruleset="m")
''', msg, sub="cus")
    # the sample's tab-5 EventID is 9999 (4001 is the Snare counter)
    # — unmapped, so Category stays empty and Outcome derives from
    # 'Success Audit'; byte-exact reference line
    assert out == ",ZX-42,Demo,success\n", out


def test_snare_definition_module_params(spark, tmp_path):
    """definition.file on module(load=…mmsnareparse) acts as the
    per-action default (mmsnareparse.c modpdescr) — same parse as
    passing it on the action."""
    sh, msgs, tpl = _sh_parts("mmsnareparse-sysmon.sh")
    out = _run(spark, tmp_path, f'''
module(load="mmsnareparse" definition.file="{DEFS}")
''' + tpl + '''
ruleset(name="m") {
  action(type="mmsnareparse")
  action(type="omfile" file="@OUT@" template="outfmt")
}
input(type="imfile" file="@IN@" ruleset="m")
''', msgs.splitlines()[0] + "\n", sub="mod")
    assert ("1,Microsoft-Windows-Sysmon/Operational,Process,"
            "Creation,6228,") in out, out


def test_mmsnareparse_trailing_extradata_regex(spark, tmp_path):
    """mmsnareparse-trailing-extradata-regex.sh: the 6 dynamic
    numeric-prefix variants — ignoreTrailingPattern.regex matches
    within searchWindow bytes of the LAST tab token; the whole token
    (number prefix included) lands in $!extradata_section and the
    parse sees the truncated message. Byte-exact reference
    content_check lines."""
    sh = open(f"{REF}/mmsnareparse-trailing-extradata-regex.sh").read()
    msgs = re.findall(r"cat <<'MSG' > \S+\n(.*?)\nMSG\n", sh, re.S)
    assert len(msgs) == 6
    tpl = re.search(r'(template\(name="outfmt".*?\n\})\n', sh,
                    re.S).group(1)
    out = _run(spark, tmp_path, tpl + f'''
ruleset(name="m") {{
  action(type="mmsnareparse" definition.file="{DEFS}"
         ignoreTrailingPattern.regex="^[0-9]+[[:space:]]+custom_section:"
         ignoreTrailingPattern.searchWindow="32")
  action(type="omfile" file="@OUT@" template="outfmt")
}}
input(type="imfile" file="@IN@" ruleset="m")
''', "\n".join(msgs) + "\n", sub="treg")
    expected_tail = [
        "3385599 custom_section: fromhost-ip=192.168.45.217",
        "12345 custom_section: fromhost-ip=192.168.45.218",
        "9 custom_section: fromhost-ip=192.168.45.219",
        "999999999 custom_section: fromhost-ip=192.168.45.220",
        "42   custom_section: fromhost-ip=192.168.45.221",
        "000123 custom_section: fromhost-ip=192.168.45.222",
    ]
    for tail in expected_tail:
        line = ("13,Microsoft-Windows-Sysmon/Operational,SetValue,"
                "HKLM\\System\\CurrentControlSet\\Services\\"
                "TestService\\ImagePath,NT AUTHORITY\\SYSTEM,"
                + tail)
        assert line + "\n" in out, (line, out)


def test_mmsnareparse_trailing_extradata_regex_anchor(spark,
                                                      tmp_path):
    """mmsnareparse-trailing-extradata-regex-anchor.sh: the search
    window boundary must NOT act as end-of-token — '^[0-9]+$' with
    searchWindow=3 must not match the bounded prefix '123' of
    '123abc' (the reference passes REG_NOTEOL on truncation). The
    unmatched token stays message content and folds into the
    description: User renders 'NT AUTHORITY\\SYSTEM 123abc', no
    extradata_section."""
    sh = open(f"{REF}/mmsnareparse-trailing-extradata-regex-anchor.sh"
              ).read()
    msgs = re.findall(r"cat <<'MSG' > \S+\n(.*?)\nMSG\n", sh, re.S)
    tpl = re.search(r'(template\(name="outfmt".*?\n\})\n', sh,
                    re.S).group(1)
    out = _run(spark, tmp_path, tpl + f'''
ruleset(name="m") {{
  action(type="mmsnareparse" definition.file="{DEFS}"
         ignoreTrailingPattern.regex="^[0-9]+$"
         ignoreTrailingPattern.searchWindow="3")
  action(type="omfile" file="@OUT@" template="outfmt")
}}
input(type="imfile" file="@IN@" ruleset="m")
''', msgs[0] + "\n", sub="tanch")
    assert re.search(r"^13,Microsoft-Windows-Sysmon/Operational,"
                     r"NT AUTHORITY\\SYSTEM 123abc,$", out,
                     re.M), out


def test_mmsnareparse_realworld_4624_4634_5140(spark, tmp_path):
    """mmsnareparse-realworld-4624-4634-5140.sh: three real-world
    Windows events with a RUNTIME field override from
    definition.file — 'Source Address' (5140 spells it without
    'Network') routes to $!win!Network!SourceNetworkAddress as an
    ip_address at priority 80. All 9 reference content_checks."""
    sh = open(f"{REF}/mmsnareparse-realworld-4624-4634-5140.sh").read()
    defs = re.search(r"cat >\"\$DEF_FILE\" <<'JSON'\n(.*?)\nJSON\n",
                     sh, re.S).group(1)
    msgs = re.search(r"cat > \S+\.input <<'DATA'\n(.*?)\nDATA\n",
                     sh, re.S).group(1)
    tpl = re.search(r'(template\(name="outjson".*?\n\})\n', sh,
                    re.S).group(1)
    dfp = tmp_path / "defs.json"
    dfp.write_text(defs)
    out = _run(spark, tmp_path, f'''
module(load="mmsnareparse" definition.file="{dfp}")
''' + tpl + '''
ruleset(name="m") {
  action(type="mmsnareparse")
  action(type="omfile" file="@OUT@" template="outjson")
}
input(type="imfile" file="@IN@" ruleset="m")
''', msgs + "\n", sub="rw")
    for frag in ['"eventid":"5140"', '"clientip":"10.10.10.10"',
                 '"clientport":"57814"', '"eventid":"4624"',
                 '"clientport":"62029"',
                 '"logontypelogoninfo":"3"',
                 '"logontypenamelogoninfo":"Network"',
                 '"eventid":"4634"']:
        assert frag in out, (frag, out)


def test_mmsnareparse_comprehensive(spark, tmp_path):
    """mmsnareparse-comprehensive.sh: the full Windows 2022 + 2025 +
    sample-events corpora (383 real security events) through both the
    jsonf and the basic list template — every reference content_check
    and check_not_present (placeholder '-' values never surface)."""
    sh = open(f"{REF}/mmsnareparse-comprehensive.sh").read()
    jsonfmt = re.search(r'(template\(name="jsonfmt".*?\n\})\n', sh,
                        re.S).group(1)
    basicfmt = re.search(r'(template\(name="basicfmt".*?\n\})\n', sh,
                         re.S).group(1)
    data = ""
    for f in ("sample-windows2022-security.data",
              "sample-windows2025-security.data",
              "sample-events.data"):
        data += open(f"{REF}/testsuites/mmsnareparse/{f}").read() \
            .rstrip("\n") + "\n"
    outj = tmp_path / "out_compj"
    conf = jsonfmt + "\n" + basicfmt + f'''
ruleset(name="winsec") {{
  action(type="mmsnareparse")
  action(type="omfile" file="{outj}" template="jsonfmt")
  action(type="omfile" file="@OUT@" template="basicfmt")
}}
input(type="imfile" file="@IN@" ruleset="winsec")
'''
    basic = _run(spark, tmp_path, conf, data, sub="compb")
    js = "".join(open(outj / p).read() for p in sorted(os.listdir(outj))
                 if p.startswith("part"))
    for line in [
        "4624,Security,Success Audit,Logon,WIN-5SB1I3G0V7U,"
        "Microsoft-Windows-Security-Auditing",
        "4634,Security,Success Audit,Logoff,WIN-5SB1I3G0V7U,"
        "Microsoft-Windows-Security-Auditing",
        "4647,Security,Success Audit,Logoff,WIN-5SB1I3G0V7U,"
        "Microsoft-Windows-Security-Auditing",
        "4648,Security,Success Audit,Logon,WIN-5SB1I3G0V7U,"
        "Microsoft-Windows-Security-Auditing",
        "4672,Security,Success Audit,Special Logon,WIN-5SB1I3G0V7U,"
        "Microsoft-Windows-Security-Auditing",
        "4688,Security,Success Audit,Process Creation,WIN-5SB1I3G0V7U,"
        "Microsoft-Windows-Security-Auditing",
        "4624,Security,Success Audit,Audit Policy Change,"
        "WIN-IKCCUTRJI52,Microsoft-Windows-Security-Auditing",
        "4647,Security,Success Audit,Audit Policy Change,"
        "WIN-IKCCUTRJI52,Microsoft-Windows-Security-Auditing",
        "4648,Security,Success Audit,Audit Policy Change,"
        "WIN-IKCCUTRJI52,Microsoft-Windows-Security-Auditing",
        "4672,Security,Success Audit,Audit Policy Change,"
        "WIN-IKCCUTRJI52,Microsoft-Windows-Security-Auditing",
        "4688,Security,Success Audit,Audit Policy Change,"
        "WIN-IKCCUTRJI52,Microsoft-Windows-Security-Auditing",
    ]:
        assert line in basic, ("basic", line)
    for frag in [
        "WIN-5SB1I3G0V7U", "WIN-IKCCUTRJI52",
        '"eventid":"4624"', '"categorytext":"Logon"',
        '"computer":"DC25-PREVIEW"',
        '"subjectaccountname":"WIN-IKCCUTRJI52$"',
        '"logontype":"5"', '"logontypename":"Service"',
        '"processname":"C:\\\\Windows\\\\System32\\\\services.exe"',
        '"newlogonaccountname":"SYSTEM"',
        '"newlogonaccountdomain":"NT AUTHORITY"',
        '"logonprocess":"Advapi"',
        '"authenticationpackage":"Negotiate"',
        '"categorytext":"Audit Policy Change"',
        '"computer":"WIN-IKCCUTRJI52"',
        '"subjectaccountdomain":"WORKGROUP"',
        '"privilegelist":"SeAssignPrimaryTokenPrivilege',
        '"newlogonaccountname":"DWM-1"',
        '"newlogonaccountdomain":"Window Manager"',
        '"subjectaccountname":"Administrator"',
        '"subjectaccountdomain":"WIN-5SB1I3G0V7U"',
        '"virtualaccount":"No"', '"elevatedtoken":"Yes"',
        '"eventid":"4634"', '"eventid":"4647"',
        '"eventid":"4648"', '"eventid":"4672"',
        '"eventid":"4688"',
    ]:
        assert frag in js, ("json", frag)
    for absent in ['"restrictedadminmode":"-"',
                   '"networkaccountname":"-"',
                   '"sourcenetworkaddress":"-"',
                   '"sourceport":"-"', '"transitedservices":"-"',
                   '"packagename":"-"']:
        assert absent not in js, ("placeholder leaked", absent)


def test_mmsnareparse_enhanced_validation(spark, tmp_path):
    """mmsnareparse-enhanced-validation.sh: the observability
    surfaces — $!win!Validation!Errors is ALWAYS an array ([] on a
    clean message) and $!win!Stats!ParsingStats carries the exact
    dispatch counts (25 non-placeholder 'key: value' stores for the
    reference's single-space 4624 sample; placeholder '-' fields are
    dropped, never stored). Replays the reference's python assertion
    block."""
    sh = open(f"{REF}/mmsnareparse-enhanced-validation.sh").read()
    m = re.search(r'tcpflood -m1 -M "\\"(.*?)\\""', sh, re.S).group(1)
    msg = m.replace("\\t", "\t").replace("\\\\", "\\") \
        .replace('\\"', '"')
    tpl = re.search(
        r'(template\(name="validation_test_json".*?\n\})\n', sh,
        re.S).group(1)
    out = _run(spark, tmp_path, tpl + '''
ruleset(name="m") {
  action(type="mmsnareparse" validation_mode="strict")
  action(type="omfile" file="@OUT@" template="validation_test_json")
}
input(type="imfile" file="@IN@" ruleset="m")
''', msg + "\n", sub="enh")
    data = [json.loads(line) for line in out.splitlines()
            if line.strip()]
    event = next((e for e in data if e.get("eventid")), None)
    assert event is not None, out[:400]
    assert event["eventid"] == "4624"
    assert json.loads(event["validation_errors"]) == []
    assert json.loads(event["parsing_stats"]) == {
        "total_fields": 25, "successful_parses": 25,
        "failed_parses": 0}
    root = json.loads(event["event_json"])
    for container, field in [
        ("Logon", "RemoteCredentialGuard"),
        ("NewLogon", "NetworkAccountName"),
        ("NewLogon", "NetworkAccountDomain"),
        ("Network", "SourceNetworkAddress"),
        ("Network", "SourcePort"),
        ("Authentication", "TransitedServices"),
        ("Authentication", "PackageName"),
    ]:
        obj = root.get(container, {})
        assert field not in obj, (container, field, obj)

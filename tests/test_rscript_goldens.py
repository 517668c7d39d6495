"""Byte-exact goldens mined from the reference's rscript_* test
family (tests/rscript_*.sh): scalar-function edge semantics rendered
through the json-c SPACED subtree render, each EXPECTED string copied
verbatim from the reference script."""

from __future__ import annotations

import os

from rsyslog_spark.config.runtime import run_config_batch

MSG = "<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:00000000:\n"


def _run(spark, tmp_path, body: str, templates: str = "") -> dict:
    """Run a one-message config; return {name: text} for each
    out_<name> dir referenced in the body."""
    src = tmp_path / "in.log"
    src.write_text(MSG)
    conf = (templates + '\nruleset(name="m") {\n' + body + "\n}\n"
            + f'input(type="imfile" file="{src}" ruleset="m")\n')
    run_config_batch(spark, conf)
    out = {}
    for d in os.listdir(tmp_path):
        if d.startswith("out_"):
            parts = [f for f in os.listdir(tmp_path / d)
                     if f.startswith("part")]
            out[d[4:]] = "".join(
                open(tmp_path / d / p).read() for p in sorted(parts))
    return out


def test_rscript_scalar_subtree_goldens(spark, tmp_path):
    """tests/rscript_{int2Hex,num2ipv4,str2num_empty,str2num_negative,
    tolower,toupper}.sh: each reference script renders a $! subtree
    via a string template and cmp's the json-c spaced EXPECTED —
    int2hex(''), NAN/'-1' error returns, typed (unquoted) numbers
    from arithmetic, all byte-exact."""
    tpls = "\n".join(
        f'template(name="t_{n}" type="string" string="%!{n}%\\n")'
        for n in ("hex", "ip", "se", "sn", "low", "up"))
    body = '''
  set $!hex!v0 = int2hex("");
  set $!hex!v1 = int2hex("0");
  set $!hex!v2 = int2hex("1");
  set $!hex!v4 = int2hex("375894");
  set $!hex!v6 = int2hex("16");
  set $!hex!v8 = int2hex("4294967295");
  set $!hex!e1 = int2hex("a");
  set $!ip!v0 = num2ipv4("");
  set $!ip!v1 = num2ipv4("0");
  set $!ip!v2 = num2ipv4("1");
  set $!ip!v3 = num2ipv4("256");
  set $!ip!v4 = num2ipv4("65536");
  set $!ip!v5 = num2ipv4("16777216");
  set $!ip!v6 = num2ipv4("135");
  set $!ip!v7 = num2ipv4("16843009");
  set $!ip!v8 = num2ipv4("3777036554");
  set $!ip!v9 = num2ipv4("2885681153");
  set $!ip!v10 = num2ipv4("4294967295");
  set $!ip!e1 = num2ipv4("a");
  set $!ip!e2 = num2ipv4("-123");
  set $!ip!e3 = num2ipv4("1725464567890");
  set $!ip!e4 = num2ipv4("4294967296");
  set $!ip!e5 = num2ipv4("2839.");
  set $!se!v1 = 1+"";
  set $.n = "-1";
  set $!sn!v1 = 1 + $.n;
  set $!low!var1 = tolower("test");
  set $!low!var2 = tolower("TeSt");
  set $!low!var3 = tolower("");
  set $!up!var1 = toupper("test");
  set $!up!var2 = toupper("TeSt");
  set $!up!var3 = toupper("");
''' + "\n".join(
        f'  action(type="omfile" file="{tmp_path}/out_{n}" '
        f'template="t_{n}")'
        for n in ("hex", "ip", "se", "sn", "low", "up"))
    out = _run(spark, tmp_path, body, tpls)
    assert out["hex"] == ('{ "v0": "0", "v1": "0", "v2": "1", '
                          '"v4": "5bc56", "v6": "10", '
                          '"v8": "ffffffff", "e1": "NAN" }\n')
    assert out["ip"] == (
        '{ "v0": "0.0.0.0", "v1": "0.0.0.0", "v2": "0.0.0.1", '
        '"v3": "0.0.1.0", "v4": "0.1.0.0", "v5": "1.0.0.0", '
        '"v6": "0.0.0.135", "v7": "1.1.1.1", "v8": "225.33.1.10", '
        '"v9": "172.0.0.1", "v10": "255.255.255.255", "e1": "-1", '
        '"e2": "-1", "e3": "-1", "e4": "-1", "e5": "-1" }\n')
    assert out["se"] == '{ "v1": 1 }\n'
    assert out["sn"] == '{ "v1": 0 }\n'
    assert out["low"] == ('{ "var1": "test", "var2": "test", '
                          '"var3": "" }\n')
    assert out["up"] == ('{ "var1": "TEST", "var2": "TEST", '
                         '"var3": "" }\n')


def test_rscript_trim_golden(spark, tmp_path):
    """tests/rscript_trim.sh: the full ltrim/rtrim matrix (l1-l12,
    r1-r12, chained b1-b20) — EXPECTED copied verbatim."""
    sets = []
    lcases = ["", "test", "   test", "test   ", "   test   ",
              " test", "test ", " ", "te st", " te st", " a", "a "]
    for i, v in enumerate(lcases, 1):
        sets.append(f'  set $!str!l{i} = ltrim("{v}");')
    rcases = ["", "test", "   test", "test   ", "   test   ",
              " test", "test ", " ", "te st", "te st ", " a", "a "]
    for i, v in enumerate(rcases, 1):
        sets.append(f'  set $!str!r{i} = rtrim("{v}");')
    for i, v in enumerate([" ", " test ", "   test      ", "te st"],
                          1):
        sets.append(f'  set $!str!b{i} = ltrim("{v}");')
        sets.append(f'  set $!str!b{i} = rtrim($!str!b{i});')
    for i, v in enumerate([" ", " test ", "   test      ", "te st"],
                          5):
        sets.append(f'  set $!str!b{i} = rtrim("{v}");')
        sets.append(f'  set $!str!b{i} = ltrim($!str!b{i});')
    for i, v in enumerate(["test", "te st", " test", "test ",
                           " test ", " te st "], 9):
        sets.append(f'  set $!str!b{i} = rtrim(ltrim("{v}"));')
    for i, v in enumerate(["test", "te st", " test", "test ",
                           " test ", " te st "], 15):
        sets.append(f'  set $!str!b{i} = ltrim(rtrim("{v}"));')
    body = ("\n".join(sets)
            + f'\n  action(type="omfile" file="{tmp_path}/out_str" '
            'template="t_str")')
    out = _run(
        spark, tmp_path, body,
        'template(name="t_str" type="string" string="%!str%\\n")')
    assert out["str"] == (
        '{ "l1": "", "l2": "test", "l3": "test", "l4": "test   ", '
        '"l5": "test   ", "l6": "test", "l7": "test ", "l8": "", '
        '"l9": "te st", "l10": "te st", "l11": "a", "l12": "a ", '
        '"r1": "", "r2": "test", "r3": "   test", "r4": "test", '
        '"r5": "   test", "r6": " test", "r7": "test", "r8": "", '
        '"r9": "te st", "r10": "te st", "r11": " a", "r12": "a", '
        '"b1": "", "b2": "test", "b3": "test", "b4": "te st", '
        '"b5": "", "b6": "test", "b7": "test", "b8": "te st", '
        '"b9": "test", "b10": "te st", "b11": "test", '
        '"b12": "test", "b13": "test", "b14": "te st", '
        '"b15": "test", "b16": "te st", "b17": "test", '
        '"b18": "test", "b19": "test", "b20": "te st" }\n')


def test_rscript_split_golden(spark, tmp_path):
    """tests/rscript_split.sh: all 8 edge cases — multi-char sep,
    empty input ([ "" ]), leading/trailing/double separators, input
    == separator, no separator, empty separator ([ ]) — rendered as
    json-c spaced arrays, EXPECTED verbatim."""
    cases = [
        ('"abc@example.com, def@example.com, ghi@example.com", ", "',
         '[ "abc@example.com", "def@example.com", '
         '"ghi@example.com" ]'),
        ('"", ","', '[ "" ]'),
        ('"a,b,", ","', '[ "a", "b", "" ]'),
        ('",a,b", ","', '[ "", "a", "b" ]'),
        ('"a,,b", ","', '[ "a", "", "b" ]'),
        ('",", ","', '[ "", "" ]'),
        ('"abc", ","', '[ "abc" ]'),
        ('"abc", ""', '[ ]'),
    ]
    tpls, body = [], []
    for i, (args, _exp) in enumerate(cases):
        tpls.append(f'template(name="t_{i}" type="string" '
                    f'string="%$!r{i}%\\n")')
        body.append(f'  set $!r{i} = split({args});')
        body.append(f'  action(type="omfile" '
                    f'file="{tmp_path}/out_{i}" template="t_{i}")')
    out = _run(spark, tmp_path, "\n".join(body), "\n".join(tpls))
    for i, (_args, exp) in enumerate(cases):
        assert out[str(i)] == exp + "\n", (i, out[str(i)])


def test_rscript_is_in_subnet_golden(spark, tmp_path):
    """tests/rscript_is_in_subnet.sh: v4/v6 membership, /0 and full
    masks, cross-family and garbage inputs, and embedded-NUL strings
    (b64_decode smuggles '192.168.1.5\\0evil') all return typed 0/1 —
    EXPECTED verbatim."""
    body = '''
  set $!res!v4_1 = is_in_subnet("192.168.1.5", "192.168.1.0/24");
  set $!res!v4_2 = is_in_subnet("192.168.2.5", "192.168.1.0/24");
  set $!res!v4_3 = is_in_subnet("192.168.1.1", "192.168.1.1/32");
  set $!res!v4_4 = is_in_subnet("192.168.1.1", "0.0.0.0/0");
  set $!res!v6_1 = is_in_subnet("2001:db8::1", "2001:db8::/32");
  set $!res!v6_2 = is_in_subnet("2001:db9::1", "2001:db8::/32");
  set $!res!v6_3 = is_in_subnet("::1", "::1/128");
  set $!res!v6_4 = is_in_subnet("::1", "::/0");
  set $!res!inv_1 = is_in_subnet("192.168.1.1", "2001:db8::/32");
  set $!res!inv_2 = is_in_subnet("invalid", "192.168.1.0/24");
  set $!res!inv_3 = is_in_subnet("192.168.1.1", "invalid");
  set $!res!inv_4 = is_in_subnet("192.168.1.1", "192.168.1.0/33");
  set $!res!nul_ip = is_in_subnet(b64_decode("MTkyLjE2OC4xLjUAZXZpbA=="), "192.168.1.0/24");
  set $!res!nul_cidr = is_in_subnet("192.168.1.5", b64_decode("MTkyLjE2OC4xLjAvMjQAZXZpbA=="));
''' + (f'  action(type="omfile" file="{tmp_path}/out_res" '
       'template="t_res")')
    out = _run(
        spark, tmp_path, body,
        'template(name="t_res" type="string" string="%!res%\\n")')
    assert out["res"] == (
        '{ "v4_1": 1, "v4_2": 0, "v4_3": 1, "v4_4": 1, "v6_1": 1, '
        '"v6_2": 0, "v6_3": 1, "v6_4": 1, "inv_1": 0, "inv_2": 0, '
        '"inv_3": 0, "inv_4": 0, "nul_ip": 0, "nul_cidr": 0 }\n')


def test_rscript_wrap_and_replace_goldens(spark, tmp_path):
    """tests/rscript_wrap2.sh, rscript_wrap3.sh,
    rscript_replace_complex.sh: wrap() with expression-valued
    wrapper/escape args (escape replaces embedded wrapper
    occurrences) and chained literal replace() passes over
    overlap-prone inputs — content_check lines verbatim."""
    src = tmp_path / "in.log"
    src.write_text(
        "<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: at Thu Oct"
        " 30 13:20:18 IST 2014 random number is 19597\n"
        "<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: a "
        "abcbcdefbcdefb has bcdefbc\n"
        "<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: try to "
        "replace syslog and sysyslog with rsyslog\n"
        "<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: try to "
        "replace hello in hellolo and helhello with hello_world\n"
        "<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: try to "
        "foo_bar_baz in foo_bar_baz_quux and quux_foo_bar_baz with "
        "FBB\n"
        "<167>Mar  6 16:57:54 172.20.245.8 %PIX-7-710005: in the end"
        " of msg; try to not lose as_longer_this_string_as_more_"
        "probability_to_catch_the_bu\n")
    conf = f'''
global(parser.removeMsgFirstSpace="off")
template(name="outfmt" type="string" string="%$.replaced_msg%\\n")
template(name="repfmt" type="string" string="%$.rep%\\n")
ruleset(name="m") {{
  if $msg contains "random number" then {{
    set $.replaced_msg = wrap("foo says" & $msg, "*" & "*");
    action(type="omfile" file="{tmp_path}/out_wrap2"
           template="outfmt")
  }}
  if $msg contains "abcbcdefbcdefb" then {{
    set $.replaced_msg = wrap("foo says" & $msg,
                              "bc" & "def" & "bc", "ES" & "C");
    action(type="omfile" file="{tmp_path}/out_wrap3"
           template="outfmt")
  }}
  if $msg contains "try to" or $msg contains "in the end" then {{
    set $.rep = replace($msg, "syslog", "rsyslog");
    set $.rep = replace($.rep, "hello", "hello_world");
    set $.rep = replace($.rep, "foo_bar_baz", "FBB");
    set $.rep = replace($.rep, "as_longer_this_string_as_more_probability_to_catch_the_bug", "ss");
    action(type="omfile" file="{tmp_path}/out_rep"
           template="repfmt")
  }}
}}
input(type="imfile" file="{src}" ruleset="m")
'''
    run_config_batch(spark, conf)
    texts = {}
    for d in ("out_wrap2", "out_wrap3", "out_rep"):
        parts = [f for f in os.listdir(tmp_path / d)
                 if f.startswith("part")]
        texts[d] = "".join(open(tmp_path / d / p).read()
                           for p in sorted(parts))
    assert ("**foo says at Thu Oct 30 13:20:18 IST 2014 random "
            "number is 19597**") in texts["out_wrap2"]
    assert ("bcdefbcfoo says a abcESCdefb has ESCbcdefbc"
            ) in texts["out_wrap3"]
    rep = texts["out_rep"]
    assert "try to replace rsyslog and syrsyslog with rrsyslog" in rep
    assert ("try to replace hello_world in hello_worldlo and "
            "helhello_world with hello_world_world") in rep
    assert "try to FBB in FBB_quux and quux_FBB with FBB" in rep
    assert ("in the end of msg; try to not lose as_longer_this_"
            "string_as_more_probability_to_catch_the_bu") in rep


def test_rscript_eq_injectmsg_golden(spark, tmp_path):
    """tests/rscript_eq.sh: field($msg, 58, 2) + an or-chain of ==
    over 8000 injected msgnum messages — seq_check 5000..5002
    verbatim (exactly those three, in order)."""
    src = tmp_path / "in.log"
    src.write_text("".join(
        f"<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:{i:08d}:\n"
        for i in range(8000)))
    conf = f'''
template(name="outfmt" type="list") {{
  property(name="$!usr!msgnum")
  constant(value="\\n")
}}
ruleset(name="m") {{
  if $msg contains "msgnum" then {{
    set $!usr!msgnum = field($msg, 58, 2);
    if $!usr!msgnum == "00005000" or
       $!usr!msgnum == "00005001" or
       $!usr!msgnum == "00005002" then
      action(type="omfile" file="{tmp_path}/out_eq"
             template="outfmt")
  }}
}}
input(type="imfile" file="{src}" ruleset="m")
'''
    run_config_batch(spark, conf)
    parts = [f for f in os.listdir(tmp_path / "out_eq")
             if f.startswith("part")]
    lines = sorted(ln for p in parts
                   for ln in open(tmp_path / "out_eq" / p)
                   .read().splitlines())
    assert lines == ["00005000", "00005001", "00005002"]


def test_rscript_eq_var_gauntlet_golden(spark, tmp_path):
    """tests/rscript_eq_var.sh: the ==/unset gauntlet over all three
    variable spaces ($!, $., $/ global) — a message only reaches the
    final action if every compare picks the reference branch
    (seq_check 0 0)."""
    src = tmp_path / "in.log"
    src.write_text(
        "<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:00000000:\n")
    gauntlet = ""
    for pfx in ("$!", "$.", "$/"):
        v1, v2 = f"{pfx}var1", f"{pfx}var2"
        gauntlet += f'''
  set {v1} = "value";
  set {v2} = "value";
  if {v1} == {v2} then {{
    set {v2} = "bad";
    if {v1} == {v2} then {{
      stop
    }} else {{
      unset {v1};
      unset {v2};
    }}
  }} else {{
    stop
  }}
'''
    conf = f'''
template(name="outfmt" type="list") {{
  property(name="$!usr!msgnum")
  constant(value="\\n")
}}
ruleset(name="m") {{
{gauntlet}
  if $msg contains "msgnum" then {{
    set $!usr!msgnum = field($msg, 58, 2);
    action(type="omfile" file="{tmp_path}/out_ev"
           template="outfmt")
  }}
}}
input(type="imfile" file="{src}" ruleset="m")
'''
    run_config_batch(spark, conf)
    parts = [f for f in os.listdir(tmp_path / "out_ev")
             if f.startswith("part")]
    lines = [ln for p in parts
             for ln in open(tmp_path / "out_ev" / p)
             .read().splitlines()]
    assert lines == ["00000000"]

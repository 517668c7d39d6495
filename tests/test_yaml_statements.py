"""YAML-native ``statements:`` goldens (yamlconf.c statements form;
tests yaml-statements-{basic,call,foreach,complex}.sh): structured
if:/action:/set:/call:/foreach: mappings included transparently from
a main RainerScript config, driven end-to-end through
run_config_batch."""

import os

from rsyslog_spark.config.runtime import run_config_batch


def _lines(out):
    if not out.exists():
        return []
    res = []
    for f in sorted(os.listdir(out)):
        if f.startswith("part"):
            res += open(out / f).read().splitlines()
    return sorted(res)


def _run(spark, tmp_path, yaml_body, conf_extra, src_lines,
         sub="y"):
    y = tmp_path / f"cfg_{sub}.yaml"
    y.write_text(yaml_body)
    src = tmp_path / f"in_{sub}.log"
    src.write_text(src_lines)
    conf = f'include(file="{y}")\n' + conf_extra.replace(
        "@IN@", str(src))
    run_config_batch(spark, conf)


def test_yaml_statements_basic(spark, tmp_path):
    """yaml-statements-basic.sh: if:/action: mapping filters and
    writes through a named template."""
    out = tmp_path / "out"
    _run(spark, tmp_path, f'''
templates:
  - name: outfmt
    type: string
    string: "%msg:F,58:2%\\n"

rulesets:
  - name: main
    statements:
      - if: '$msg contains "msgnum:"'
        action:
          type: omfile
          template: outfmt
          file: "{out}"
''', 'input(type="imfile" file="@IN@" ruleset="main")\n',
        "<13>Mar  1 10:00:00 h t: msgnum:00000001:\n"
        "<13>Mar  1 10:00:00 h t: other line\n", sub="basic")
    assert _lines(out) == ["00000001"]


def test_yaml_statements_call(spark, tmp_path):
    """yaml-statements-call.sh: set: in rs1 is visible in the called
    rs2; stop: after the action."""
    out = tmp_path / "out"
    _run(spark, tmp_path, f'''
templates:
  - name: outfmt
    type: string
    string: "%msg:F,58:2%\\n"

rulesets:
  - name: rs2
    statements:
      - if: '$msg contains "msgnum:" and $.tag == "seen"'
        action:
          type: omfile
          template: outfmt
          file: "{out}"
      - stop: true

  - name: rs1
    statements:
      - set:
          var: "$.tag"
          expr: '"seen"'
      - call: rs2
''', 'input(type="imfile" file="@IN@" ruleset="rs1")\n',
        "<13>Mar  1 10:00:00 h t: msgnum:00000007:\n", sub="call")
    assert _lines(out) == ["00000007"]


def test_yaml_statements_foreach(spark, tmp_path):
    """yaml-statements-foreach.sh: foreach var/in/do over a parsed
    @cee array — one rendered line per element."""
    out = tmp_path / "out"
    _run(spark, tmp_path, f'''
templates:
  - name: quux
    type: string
    string: "quux: %$.quux%\\n"

rulesets:
  - name: freach
    statements:
      - type: mmjsonparse
      - foreach:
          var: "$.quux"
          in: "$!foo"
          do:
            - type: omfile
              file: "{out}"
              template: quux
''', 'input(type="imfile" file="@IN@" ruleset="freach")\n',
        '<167>Mar  6 16:57:54 172.20.245.8 tag: @cee:{"foo": '
        '["abc0", "def1", "ghi2"]}\n', sub="fe")
    got = _lines(out)
    for want in ("quux: abc0", "quux: def1", "quux: ghi2"):
        assert want in got, (want, got)


def test_yaml_statements_complex(spark, tmp_path):
    """yaml-statements-complex.sh: set + mmjsonparse + foreach with
    nested if/then/else routing per element — the reference's three
    output files byte-for-byte."""
    out_a, out_e, out_s = (tmp_path / "audit", tmp_path / "error",
                           tmp_path / "standard")
    _run(spark, tmp_path, f'''
templates:
  - name: outfmt
    type: string
    string: "val: %$.item!val%\\n"

rulesets:
  - name: process_items
    statements:
      - set:
          var: "$.is_audit"
          expr: 're_match($msg, "AUDIT")'
      - type: mmjsonparse
      - foreach:
          var: "$.item"
          in: "$!items"
          do:
            - if: '$.is_audit == 1'
              then:
                - type: omfile
                  file: "{out_a}"
                  template: outfmt
              else:
                - if: '$.item!type == "error"'
                  then:
                    - type: omfile
                      file: "{out_e}"
                      template: outfmt
                  else:
                    - type: omfile
                      file: "{out_s}"
                      template: outfmt
''', 'input(type="imfile" file="@IN@" ruleset="process_items")\n',
        '<167>Mar  6 16:57:54 host tag @cee:{"items": [{"type": '
        '"info", "val": "audit1"}, {"type": "error", "val": '
        '"audit2"}], "txt": "this is an AUDIT message"}\n'
        '<167>Mar  6 16:57:54 host tag @cee:{"items": [{"type": '
        '"info", "val": "std1"}, {"type": "error", "val": "err1"}], '
        '"txt": "this is a NORMAL message"}\n', sub="cx")
    assert _lines(out_a) == ["val: audit1", "val: audit2"]
    assert _lines(out_e) == ["val: err1"]
    assert _lines(out_s) == ["val: std1"]

"""Config-translation goldens (ref: runtime/translate.c; the
``rsyslogd -F {yaml|rainerscript} -o`` feature) — expected outputs
lifted from tests/config-translate-*.sh, all cmp_exact."""

import subprocess
import sys

from rsyslog_spark.config.translate import translate


def test_rs_to_yaml_basic():
    # config-translate-rs-to-yaml.sh
    conf = '''main_queue(queue.type="Direct")
ruleset(name="main") {
  action(type="omfile" file="/var/log/sample.log")
}
'''
    assert translate(conf, "yaml") == '''version: 2

mainqueue:
  queue.type: "Direct"

rulesets:
  - name: "main"
    actions:
      - type: "omfile"
        file: "/var/log/sample.log"
'''


def test_yaml_to_rs():
    # config-translate-yaml-to-rs.sh
    yml = '''version: 2
modules:
  - load: "omstdout"
mainqueue:
  queue.type: "Direct"
rulesets:
  - name: "main"
    script: |
      action(type="omstdout")
'''
    assert translate(yml, "rainerscript") == '''main_queue(queue.type="Direct")

module(load="omstdout")

ruleset(name="main") {
  action(type="omstdout")
}

'''


def test_legacy_file_action_to_yaml():
    # config-translate-legacy-file-action.sh
    conf = "user.*\t\t\t\t-/var/log/user.log\n"
    assert translate(conf, "yaml") == '''version: 2

rulesets:
  # TRANSLATION WARNING: top-level statements normalized into explicit RSYSLOG_DefaultRuleset
  - name: "RSYSLOG_DefaultRuleset"
    filter: "user.*"
    actions:
      - type: "omfile"
        file: "/var/log/user.log"
'''


def test_rs_filter_actions_to_yaml():
    # config-translate-rs-filter-actions.sh
    conf = '''ruleset(name="main") {
  mail.info action(type="omfile" file="/tmp/x.log")
}
'''
    assert translate(conf, "yaml") == '''version: 2

rulesets:
  - name: "main"
    filter: "mail.info"
    actions:
      - type: "omfile"
        file: "/tmp/x.log"
'''


def test_rs_statements_to_yaml():
    # config-translate-rs-statements-to-yaml.sh: '&' continuation
    # merges into the previous selector; single-action statements use
    # the 'action:' mapping form, multi-action 'then:'
    conf = '''ruleset(name="main") {
  mail.info action(type="omfile" file="/tmp/a.log")
  & action(type="omfile" file="/tmp/a2.log")
  authpriv.* action(type="omfile" file="/tmp/b.log")
}
'''
    assert translate(conf, "yaml") == '''version: 2

rulesets:
  - name: "main"
    statements:
      - if: "prifilt('mail.info')"
        then:
          - type: "omfile"
            file: "/tmp/a.log"
          - type: "omfile"
            file: "/tmp/a2.log"
      - if: "prifilt('authpriv.*')"
        action:
          type: "omfile"
          file: "/tmp/b.log"
'''


def test_legacy_debian_default_to_yaml():
    # config-translate-legacy-debian-default.sh
    conf = '''*.*;auth,authpriv.none\t\t-/var/log/syslog
auth,authpriv.*\t\t\t/var/log/auth.log
cron.*\t\t\t\t-/var/log/cron.log
kern.*\t\t\t\t-/var/log/kern.log
mail.*\t\t\t\t-/var/log/mail.log
user.*\t\t\t\t-/var/log/user.log
*.emerg\t\t\t\t:omusrmsg:*
'''
    got = translate(conf, "yaml")
    assert got == '''version: 2

rulesets:
  # TRANSLATION WARNING: top-level statements normalized into explicit RSYSLOG_DefaultRuleset
  - name: "RSYSLOG_DefaultRuleset"
    statements:
      - if: "prifilt('*.*;auth,authpriv.none')"
        action:
          type: "omfile"
          file: "/var/log/syslog"
      - if: "prifilt('auth,authpriv.*')"
        action:
          type: "omfile"
          file: "/var/log/auth.log"
      - if: "prifilt('cron.*')"
        action:
          type: "omfile"
          file: "/var/log/cron.log"
      - if: "prifilt('kern.*')"
        action:
          type: "omfile"
          file: "/var/log/kern.log"
      - if: "prifilt('mail.*')"
        action:
          type: "omfile"
          file: "/var/log/mail.log"
      - if: "prifilt('user.*')"
        action:
          type: "omfile"
          file: "/var/log/user.log"
      - if: "prifilt('*.emerg')"
        action:
          type: "omusrmsg"
          users: "*"
'''


def test_rs_roundtrip():
    # config-translate-rs-roundtrip.sh: rs -> yaml -> rs canonical
    conf = '''global(defaultNetstreamDriverCAFile="/certs/ca.pem"
       defaultNetstreamDriverCertFile="/certs/cert.pem"
       defaultNetstreamDriverKeyFile="/certs/key.pem")

module(load="imtcp"
       StreamDriver.Name="gtls"
       StreamDriver.Mode="1"
       StreamDriver.AuthMode="x509/name"
       PermittedPeer=["rsyslog-client"])
input(type="imtcp" address="127.0.0.1" listenPortFileName="pf" port="0")

template(name="outfmt" type="string" string="%msg:F,58:2%\\n")

ruleset(name="main") {
  action(type="omfile" file="/tmp/out.log" template="outfmt")
}
'''
    yml = translate(conf, "yaml")
    assert yml == '''version: 2

global:
  defaultNetstreamDriverCAFile: "/certs/ca.pem"
  defaultNetstreamDriverCertFile: "/certs/cert.pem"
  defaultNetstreamDriverKeyFile: "/certs/key.pem"

modules:
  - load: "imtcp"
    PermittedPeer: ["rsyslog-client"]
    StreamDriver.AuthMode: "x509/name"
    StreamDriver.Mode: "1"
    StreamDriver.Name: "gtls"
inputs:
  - type: "imtcp"
    address: "127.0.0.1"
    listenPortFileName: "pf"
    port: "0"
templates:
  - name: "outfmt"
    type: "string"
    string: "%msg:F,58:2%\\n"
rulesets:
  - name: "main"
    actions:
      - type: "omfile"
        file: "/tmp/out.log"
        template: "outfmt"
'''
    back = translate(yml, "rainerscript")
    assert back == '''global(defaultNetstreamDriverCAFile="/certs/ca.pem" defaultNetstreamDriverCertFile="/certs/cert.pem" defaultNetstreamDriverKeyFile="/certs/key.pem")

module(load="imtcp" PermittedPeer=["rsyslog-client"] StreamDriver.AuthMode="x509/name" StreamDriver.Mode="1" StreamDriver.Name="gtls")

input(type="imtcp" address="127.0.0.1" listenPortFileName="pf" port="0")

template(name="outfmt" type="string" string="%msg:F,58:2%\\n")

ruleset(name="main") {
  action(type="omfile" file="/tmp/out.log" template="outfmt")
}

'''


def test_rs_script_expressions_canonical():
    # config-translate-rs-script-expressions.sh: canonical statement
    # and expression re-render (binary ops parenthesized, escapes
    # re-serialized, reset/unset/foreach/call_indirect forms)
    conf = '''ruleset(name="target") {
  action(type="omfile" file="/tmp/t.log")
}

ruleset(name="main") {
  set $.n = -7;
  set $.s = "line\\nquote\\"tab\\tbackslash\\\\";
  set $.arr = ["one", "two"];
  reset $.scratch = $.arr;
  unset $.arr;
  if not exists($!missing) and (($msg contains_i "ERR") or ($msg startswith " start")) then {
    foreach ($.item in $!items) do {
      call target
    }
  } else {
    call_indirect "tar" & "get";
  }
}
'''
    assert translate(conf, "rainerscript") == '''ruleset(name="target") {
  action(type="omfile" file="/tmp/t.log")
}

ruleset(name="main") {
  set $.n = -7;
  set $.s = "line\\nquote\\"tab\\tbackslash\\\\";
  set $.arr = ["one", "two"];
  reset $.scratch = $.arr;
  unset $.arr;
  if (not exists($!missing) and (($msg contains_i "ERR") or ($msg startswith " start"))) then {
    foreach ($.item in $!items) do {
      call target
    }
  } else {
    call_indirect ("tar" & "get");
  }
}

'''


def test_translated_outputs_reload():
    # the reference validates translated output with rsyslogd -N1;
    # our analog: the engine config parser loads what we emit
    from rsyslog_spark.config.rainerscript import parse_config

    conf = '''main_queue(queue.type="Direct")
ruleset(name="main") {
  mail.info action(type="omfile" file="/tmp/x.log")
  & action(type="omfile" file="/tmp/y.log")
}
'''
    rs = translate(translate(conf, "yaml"), "rainerscript")
    cfg = parse_config(rs)
    assert "main" in cfg.rulesets


def test_cli_tool(tmp_path):
    src = tmp_path / "in.conf"
    src.write_text('ruleset(name="m") {\n'
                   '  action(type="omstdout")\n}\n')
    out = tmp_path / "out.yaml"
    proc = subprocess.run(
        [sys.executable, "tools/config_translate.py", "-f", str(src),
         "-F", "yaml", "-o", str(out)],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    assert out.read_text().startswith("version: 2\n")


def test_legacy_warning_coverage():
    # config-translate-legacy-warning.sh: a legacy action target that
    # legacyActionToNvlst can't structure (':omstdout:') survives as
    # script text and the translation says so (translate.c:1076), on
    # top of the implicit-default-ruleset normalization warning
    out = translate('module(load="omstdout")\n*.* :omstdout:\n',
                    "yaml")
    for chk in (
        '# TRANSLATION WARNING: top-level statements normalized '
        'into explicit RSYSLOG_DefaultRuleset',
        '# TRANSLATION WARNING: legacy action syntax preserved '
        'as script text',
        'name: "RSYSLOG_DefaultRuleset"',
        '*.* :omstdout:',
    ):
        assert chk in out, chk


def test_yaml_roundtrip_exact():
    # config-translate-yaml-roundtrip.sh: canonical YAML -> rs ->
    # YAML is byte-identical (cmp_exact_file), incl. dotted
    # StreamDriver.* module params, array PermittedPeer, and the
    # actions-form ruleset
    yaml_src = '''version: 2

global:
  defaultNetstreamDriverCAFile: "/certs/ca.pem"
  defaultNetstreamDriverCertFile: "/certs/cert.pem"
  defaultNetstreamDriverKeyFile: "/certs/key.pem"

modules:
  - load: "../plugins/imtcp/.libs/imtcp"
    PermittedPeer: ["rsyslog-client"]
    StreamDriver.AuthMode: "x509/name"
    StreamDriver.Mode: "1"
    StreamDriver.Name: "gtls"
inputs:
  - type: "imtcp"
    listenPortFileName: "/tmp/portfile"
    port: "0"
templates:
  - name: "outfmt"
    type: "string"
    string: "%msg:F,58:2%\\n"
rulesets:
  - name: "main"
    actions:
      - type: "omfile"
        file: "/tmp/out.log"
        template: "outfmt"
'''
    rs = translate(yaml_src, "rainerscript")
    assert 'StreamDriver.AuthMode="x509/name"' in rs
    assert 'PermittedPeer=["rsyslog-client"]' in rs
    assert translate(rs, "yaml") == yaml_src

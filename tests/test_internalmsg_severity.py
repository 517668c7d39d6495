"""global(internalmsg.severity=...) gate (runtime/glbl.c:1568-1573;
rsyslogd.c:1052 logmsgInternal_doWrite ``pri % 8 <= filter``, default
DFLT_INT_MSGS_SEV_FILTER=6 — runtime/rsconf.h:49).

Golden shapes: glbl-internalmsg_severity-{debug-not_shown,
debug-shown,info-shown,invalid-long}.sh — the begin-processing line
is LOG_DEBUG (rsyslogd.c:2687), per-lookup-table load is LOG_INFO
(lookup.c:1221); lifecycle internals enter the DEFAULT ruleset only.
"""
import os

import pytest

from rsyslog_spark.config.runtime import run_config_batch

STARTED = ("rsyslogd fully started up and initialized "
           "- begin actual processing")


def _read_parts(d):
    if not os.path.isdir(d):
        return ""
    return "".join(
        open(os.path.join(d, p)).read()
        for p in sorted(os.listdir(d)) if p.startswith("part"))


def _golden_conf(tmp_path, extra=""):
    tbl = tmp_path / "xlate.lkp_tbl"
    tbl.write_text('{"table":[{"index":"a","value":"b"}]}')
    src = tmp_path / "in.log"
    src.write_text("<13>Mar  1 01:00:00 h tag: payload\n")
    return f'''
{extra}
lookup_table(name="xlate" file="{tbl}")
action(type="omfile" file="{tmp_path}/out"
       template="RSYSLOG_FileFormat")
input(type="imfile" file="{src}")
'''


def test_debug_not_shown_by_default(spark, tmp_path):
    """glbl-internalmsg_severity-debug-not_shown.sh: the default
    filter (6) suppresses the LOG_DEBUG startup line; the LOG_INFO
    lookup-loaded line is admitted (6 <= 6)."""
    run_config_batch(spark, _golden_conf(tmp_path))
    out = _read_parts(f"{tmp_path}/out")
    assert STARTED not in out
    assert "lookup table 'xlate' loaded from file" in out
    assert "payload" in out


def test_debug_shown_when_configured(spark, tmp_path):
    """glbl-internalmsg_severity-debug-shown.sh: severity='debug'
    admits the startup line."""
    run_config_batch(spark, _golden_conf(
        tmp_path, 'global(internalmsg.severity="debug")'))
    out = _read_parts(f"{tmp_path}/out")
    assert STARTED in out
    assert "rsyslogd:" in out


def test_info_shown(spark, tmp_path):
    """glbl-internalmsg_severity-info-shown.sh: severity='info'
    admits the lookup-loaded line, still suppresses debug."""
    run_config_batch(spark, _golden_conf(
        tmp_path, 'global(internalmsg.severity="info")'))
    out = _read_parts(f"{tmp_path}/out")
    assert "lookup table 'xlate' loaded from file" in out
    assert STARTED not in out


def test_warning_filter_suppresses_info(spark, tmp_path):
    """severity='warning' (4) suppresses the info-level lookup
    line — the numeric gate, not a boolean switch."""
    run_config_batch(spark, _golden_conf(
        tmp_path, 'global(internalmsg.severity="warning")'))
    out = _read_parts(f"{tmp_path}/out")
    assert "lookup table" not in out
    assert "payload" in out


@pytest.mark.parametrize("bad", [
    "A" * 160,                      # long symbolic
    "999999999999999999999999",     # overflowing numeric
    "8",                            # out of range
    "-1",
])
def test_invalid_severity_is_load_error(spark, tmp_path, bad):
    """glbl-internalmsg_severity-invalid-long.sh: -N1 must fail with
    'invalid internalmsg.severity value'."""
    with pytest.raises(ValueError,
                       match="invalid internalmsg.severity value"):
        run_config_batch(spark, _golden_conf(
            tmp_path, f'global(internalmsg.severity="{bad}")'))


def test_lifecycle_internals_default_ruleset_only(spark, tmp_path):
    """A config whose traffic lives in a NAMED ruleset never sees the
    lifecycle internals — the reference submits them to the default
    ruleset (our named-ruleset goldens stay byte-exact)."""
    tbl = tmp_path / "t.lkp_tbl"
    tbl.write_text('{"table":[{"index":"a","value":"b"}]}')
    src = tmp_path / "in.log"
    src.write_text("<13>Mar  1 01:00:00 h tag: payload\n")
    run_config_batch(spark, f'''
global(internalmsg.severity="debug")
lookup_table(name="t" file="{tbl}")
ruleset(name="m") {{
  action(type="omfile" file="{tmp_path}/out"
         template="RSYSLOG_FileFormat")
}}
input(type="imfile" file="{src}" ruleset="m")
''')
    out = _read_parts(f"{tmp_path}/out")
    assert "payload" in out
    assert STARTED not in out
    assert "lookup table" not in out

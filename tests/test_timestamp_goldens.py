"""Timestamp rendering goldens (tests/timestamp-*.sh and
timegenerated-*.sh): every expected value is the reference test's own
cmp_exact block; the faketime subtests pin the engine clock with
session.set_fake_now — the analog of the reference running rsyslogd
under libfaketime — and set the session timezone for the TZ exports
(POSIX signs are inverted: TZ=TEST-02:00 is UTC+2)."""

import re

import pytest

from rsyslog_spark.parsers import parse_syslog
from rsyslog_spark.session import set_fake_now
from rsyslog_spark.templates import compile_template_string

REF = "/root/reference/tests"


def _render(spark, template, msgs):
    df = parse_syslog(spark.createDataFrame(
        [(m,) for m in msgs], "line string").coalesce(1))
    t = compile_template_string(template)
    return [r[0] for r in df.select(t.col(df)).collect()]


def _sh_pairs(name):
    """(faketime, expected) subtest pairs from a reference test."""
    sh = open(f"{REF}/{name}").read()
    return re.findall(
        r"FAKETIME='([^']+)' startup.*?export EXPECTED=\"([^\"]*)\"",
        sh, re.S)


@pytest.fixture
def utc_fake(spark):
    """Set tz+fake-now per subtest; always restore."""
    old = spark.conf.get("spark.sql.session.timeZone")

    def setter(tz, fake):
        spark.conf.set("spark.sql.session.timeZone", tz)
        set_fake_now(fake)
    yield setter
    set_fake_now(None)
    spark.conf.set("spark.sql.session.timeZone", old)


def test_timestamp_3164_month_battery(spark):
    """timestamp-3164.sh: all 12 months + padded/unpadded days
    render byte-exact through date-rfc3164."""
    sh = open(f"{REF}/timestamp-3164.sh").read()
    msgs = re.findall(r'injectmsg_literal "([^"]+)"', sh)
    expected = re.search(r"echo '(.*?)' \| cmp", sh, re.S).group(1)
    got = _render(spark, "%timestamp:::date-rfc3164%", msgs)
    assert got == expected.splitlines()


def test_timestamp_3339_precision_and_zone(spark):
    """timestamp-3339.sh: the rfc3339 render keeps the PARSED
    fraction precision (3 digits stay 3; 7+ digits cap at 6) and the
    PARSED zone spelling ('Z' stays 'Z', offsets re-render
    ±HH:MM)."""
    sh = open(f"{REF}/timestamp-3339.sh").read()
    msgs = re.findall(r'injectmsg_literal "([^"]+)"', sh)
    expected = re.search(r"export EXPECTED='(.*?)'", sh,
                         re.S).group(1)
    got = _render(spark, "%timestamp:::date-rfc3339%", msgs)
    assert got == expected.splitlines()


def test_timestamp_mysql_pgsql(spark):
    for name, tpl, want in (
            ("timestamp-mysql.sh", "%timestamp:::date-mysql%",
             "20030123123456"),
            ("timestamp-pgsql.sh", "%timestamp:::date-pgsql%",
             "2003-01-23 12:34:56")):
        msg = ("<34>1 2003-01-23T12:34:56.003Z mymachine.example.com"
               " su - ID47 - MSG")
        assert _render(spark, tpl, [msg]) == [want], name


def test_timestamp_subseconds(spark):
    """timestamp-subseconds.sh: digits at parsed precision, '0' when
    the wire carried no fraction."""
    msgs = [
        "<34>1 2003-01-23T12:34:56.003Z m su - ID47 - MSG",
        "<34>1 2003-01-23T12:34:56.123456Z m su - ID47 - MSG",
        "<34>1 2003-01-23T12:34:56Z m su - ID47 - MSG",
    ]
    got = _render(spark, "%timestamp:::date-subseconds%", msgs)
    assert got == ["003", "123456", "0"]


def test_timestamp_isoweek(spark):
    """timestamp-isoweek.sh: ISO week-year/week (Thursday rule)."""
    msgs = [
        "<34>1 1971-01-01T12:34:56.003Z m su - ID47 - MSG",
        "<34>1 2021-12-02T12:34:56.123456Z m su - ID47 - MSG",
        "<34>1 2099-12-31T12:34:56Z m su - ID47 - MSG",
    ]
    got = _render(
        spark,
        "%timestamp:::date-iso-week-year%/%timestamp:::date-iso-week%",
        msgs)
    assert got == ["1970/53", "2021/48", "2099/53"]


def test_timegenerated_dateordinal_subtests(spark, utc_fake):
    """timegenerated-dateordinal.sh: 12 faketime subtests incl. leap
    years and the 2038/2100 edges (TZ=UTC+00:00 → UTC)."""
    pairs = _sh_pairs("timegenerated-dateordinal.sh")
    assert len(pairs) >= 10
    for fake, want in pairs:
        utc_fake("UTC", fake)
        got = _render(spark, "%timegenerated:::date-ordinal%",
                      ["<13>msgnum:1"])
        assert got == [want], (fake, want, got)


def test_timegenerated_uxtimestamp_subtests(spark, utc_fake):
    """timegenerated-uxtimestamp.sh + -invld.sh: epoch values for
    valid years; 0 outside 1970..2100 (syslogTime2time_t guard)."""
    for name in ("timegenerated-uxtimestamp.sh",
                 "timegenerated-uxtimestamp-invld.sh"):
        for fake, want in _sh_pairs(name):
            utc_fake("UTC", fake)
            got = _render(
                spark, "%timegenerated:::date-unixtimestamp%",
                ["<13>msgnum:1"])
            assert got == [want], (name, fake, want, got)


def test_timegenerated_ymd(spark, utc_fake):
    """timegenerated-ymd.sh: TZ=TEST-02:00 (UTC+2), faketime
    2016-01-01 01:00 local — date parts render LOCAL."""
    utc_fake("+02:00", "2016-01-01 01:00:00")
    got = _render(
        spark,
        "%timegenerated:::date-year%-%timegenerated:::date-month%"
        "-%timegenerated:::date-day%",
        ["<13>msgnum:1"])
    assert got == ["2016-01-01"]


def test_timegenerated_utc(spark, utc_fake):
    """timegenerated-utc.sh + -legacy.sh: date.inUTC / date-utc shift
    the local wall clock to UTC (TZ=TEST+02:00 is UTC-2; 12:00 local
    renders Mar  1 14:00:00)."""
    utc_fake("-02:00", "2016-03-01 12:00:00")
    got = _render(spark, "%timegenerated:::date-utc%",
                  ["<13>msgnum:1"])
    assert got == ["Mar  1 14:00:00"]

"""Canonical syslog message schema.

The fixed core schema mirrors the reference's message object
(ref: runtime/msg.h:60-148) and its queryable property namespace
(ref: runtime/typedefs.h:194-248, runtime/msg.c:3696). The dynamic
``$!`` JSON tree is carried as a JSON STRING column named ``json``
(schema-on-read via get_json_object/from_json); ``$.`` local variables
are ephemeral derived columns that sinks must drop (see
plans/ruleset.py); ``$/`` globals are plan-time literals.

Columnar inversion: the reference is row-at-a-time; we keep one
DataFrame with this StructType and let Tungsten lay it out columnar.
At 100 TB the parquet files written by sinks should be partitioned by
(date, facility) or template-derived keys so partition pruning works.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Order matters: this is the canonical column order for parsed frames.
SYSLOG_FIELDS: list[tuple[str, T.DataType]] = [
    ("rawmsg", T.StringType()),            # full raw line incl. <PRI>
    ("msg", T.StringType()),               # MSG part (after header)
    ("pri", T.IntegerType()),              # facility*8+severity
    ("syslogfacility", T.IntegerType()),   # 0-24
    ("syslogseverity", T.IntegerType()),   # 0-7
    ("hostname", T.StringType()),
    ("fromhost", T.StringType()),
    ("fromhost_ip", T.StringType()),
    ("fromhost_port", T.IntegerType()),
    ("syslogtag", T.StringType()),         # tag incl. [pid]: suffix
    ("programname", T.StringType()),       # tag minus [pid]/: suffix
    ("app_name", T.StringType()),          # RFC5424 APP-NAME
    ("procid", T.StringType()),
    ("msgid", T.StringType()),
    ("inputname", T.StringType()),
    ("timereported", T.TimestampType()),
    ("timegenerated", T.TimestampType()),
    ("tz_offset_sec", T.IntegerType()),    # wire TZ of timereported
                                           # (syslogTime OffsetMode/
                                           # Hour/Minute — renders
                                           # show the ORIGINAL wall
                                           # clock, datetime.c
                                           # formatTimestamp3164);
                                           # NULL = no wire zone →
                                           # daemon-local semantics
    ("tz_zulu", T.BooleanType()),          # wire zone was literal
                                           # 'Z' (OffsetMode 'Z' —
                                           # rfc3339 re-renders 'Z',
                                           # not '+00:00')
    ("secfrac_prec", T.IntegerType()),     # wire fractional-second
                                           # DIGIT COUNT (syslogTime
                                           # secfracPrecision; render
                                           # caps at 6); NULL = no
                                           # wire timestamp info
    ("protocol_version", T.IntegerType()),  # 0=RFC3164, 1=RFC5424
    ("structured_data", T.StringType()),    # raw RFC5424 SD
    ("json", T.StringType()),               # $! tree as JSON text
    ("uuid", T.StringType()),
    ("parsesuccess", T.BooleanType()),
]

SYSLOG_SCHEMA = T.StructType(
    [T.StructField(name, dtype, nullable=True) for name, dtype in SYSLOG_FIELDS]
)

SYSLOG_COLUMNS = [name for name, _ in SYSLOG_FIELDS]

# Severity / facility keyword tables (ref: tools/syslogd.c keyword tables;
# doc/source/configuration/filters.rst). Used by prifilt() compilation.
SEVERITIES: dict[str, int] = {
    "emerg": 0, "panic": 0,
    "alert": 1,
    "crit": 2,
    "err": 3, "error": 3,
    "warning": 4, "warn": 4,
    "notice": 5,
    "info": 6,
    "debug": 7,
}

FACILITIES: dict[str, int] = {
    "kern": 0, "user": 1, "mail": 2, "daemon": 3, "auth": 4, "syslog": 5,
    "lpr": 6, "news": 7, "uucp": 8, "cron": 9, "authpriv": 10, "ftp": 11,
    "ntp": 12, "audit": 13, "alert": 14, "clock": 15,
    "local0": 16, "local1": 17, "local2": 18, "local3": 19,
    "local4": 20, "local5": 21, "local6": 22, "local7": 23,
    # facility 24 = invalid-PRI marker (ref: rsyslog.h LOG_FAC_INVLD;
    # srutils.c syslogFacNames "invld" — selectable: invld.=debug)
    "invld": 24,
    # selector-only aliases (srutils.c syslogFacNames:78-103): the
    # RENDER names stay audit/alert/clock (msg.c:214)
    "security": 4,          # DEPRECATED alias of auth
    "bsd_security": 13,     # BSD, duplicate numeric of audit
    "console": 14,          # BSD
    "mark": 24,             # INTERNAL (LOG_MARK = 24<<3)
}

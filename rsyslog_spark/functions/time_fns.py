"""Time built-ins: format_time / parse_time / is_time.

ref: doc/source/rainerscript/functions/rs-format_time.rst,
rs-parse_time.rst. The reference accepts RFC3164 ("Mar  1 01:00:00")
and RFC3339 timestamps; format_time renders a unix timestamp into the
named date format.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, _c, rs_num, rs_str

from rsyslog_spark.session import now_col as _now_col


def _rfc3164(ts: Column) -> Column:
    # "Mar  1 01:00:00" — day-of-month is SPACE-padded to width 2,
    # which no Java date pattern produces directly.
    day = F.date_format(ts, "d")
    padded = F.when(F.length(day) == 1, F.concat(F.lit(" "), day)).otherwise(day)
    return F.concat(F.date_format(ts, "MMM"), F.lit(" "), padded, F.lit(" "),
                    F.date_format(ts, "HH:mm:ss"))


def _rfc3339(ts: Column) -> Column:
    # Session timezone is UTC; reference prints numeric offset "+00:00".
    return F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+00:00"))


def format_time(unixts: ColumnOrName, fmt: str) -> Column:
    """format_time(unixts, "date-rfc3164"|"date-rfc3339"|"date-unix")."""
    ts = F.from_unixtime(rs_num(unixts)).cast("timestamp")
    if fmt == "date-rfc3164":
        return _rfc3164(ts)
    if fmt == "date-rfc3339":
        return _rfc3339(ts)
    if fmt == "date-unix":
        return rs_str(rs_num(unixts))
    raise ValueError(f"unknown format_time format {fmt!r}")


# Formats parse_time accepts (reference: RFC3164 and RFC3339 only).
_RFC3339_FMTS = [
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
]


def parse_time_ts(s: ColumnOrName) -> Column:
    """Parse RFC3164/RFC3339 text → TIMESTAMP (NULL on failure)."""
    c = rs_str(s)
    attempts = [F.try_to_timestamp(c, F.lit(f)) for f in _RFC3339_FMTS]
    # RFC3164: no year — the reference assumes the current year
    # (tools/pmrfc3164.c year inference); normalize double spaces first.
    c3164 = F.regexp_replace(c, "  +", " ")
    year = F.date_format(_now_col(), "yyyy")
    attempts.append(
        F.try_to_timestamp(F.concat(year, F.lit(" "), c3164),
                           F.lit("yyyy MMM d HH:mm:ss"))
    )
    return F.coalesce(*attempts)


def parse_time(s: ColumnOrName) -> Column:
    """parse_time(ts) → unix seconds; 0 + script_error on failure
    (we encode failure as 0, matching missing-value semantics)."""
    return F.coalesce(F.unix_timestamp(parse_time_ts(s)), F.lit(0).cast("long"))


def parse_time_localtz(s: ColumnOrName) -> Column:
    """parse_time_localtz(ts) → unix seconds with naive stamps
    interpreted in the DAEMON's local timezone
    (grammar/rainerscript.c:2865 doFunct_ParseTimeLocalTz →
    syslogTime2time_tLocalTZ; ChangeLog 2026-06-01) instead of
    parse_time's UTC. The engine's daemon-local zone is the process
    TZ (the $TZ env / OS zone), independent of the Spark session
    timezone (which this engine pins to UTC for determinism)."""
    import datetime as _dt
    import os as _os

    tz = _os.environ.get("TZ")
    if not tz:
        # Prefer a NAMED zone so full tz rules (DST transitions)
        # apply per stamp, like the reference's mktime — a fixed
        # "GMT+HH:MM" pinned to the offset in effect right now would
        # convert stamps on the other side of a DST switch with the
        # wrong offset. /etc/localtime is a symlink into the tzdata
        # tree on every mainstream distro.
        try:
            lp = _os.readlink("/etc/localtime")
            if "/zoneinfo/" in lp:
                tz = lp.split("/zoneinfo/", 1)[1]
        except OSError:
            pass
    if not tz:
        z = _dt.datetime.now().astimezone().strftime("%z") or "+0000"
        tz = f"GMT{z[:3]}:{z[3:]}"
    ts = parse_time_ts(s)
    # stamps carrying an explicit offset (or 'Z') are already
    # absolute — the reference skips the local-TZ adjustment for
    # them (datetime.c:1118 'Offset TZ already done')
    has_off = rs_str(s).rlike(r"(?i)(z|[+-]\d{2}:?\d{2})\s*$")
    return F.coalesce(
        F.unix_timestamp(
            F.when(has_off, ts)
            .otherwise(F.to_utc_timestamp(ts, tz))),
        F.lit(0).cast("long"))


def is_time(s: ColumnOrName, fmt: str | None = None) -> Column:
    """is_time(ts[, fmt]) validity test (ref rs-is_time.rst)."""
    if fmt is None:
        return parse_time_ts(s).isNotNull()
    if fmt == "date-unix":
        return (_c(s) if isinstance(s, Column) else F.col(s)).try_cast("long").isNotNull()
    if fmt == "date-rfc3339":
        c = rs_str(s)
        return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in _RFC3339_FMTS]).isNotNull()
    if fmt == "date-rfc3164":
        c = F.regexp_replace(rs_str(s), "  +", " ")
        return F.try_to_timestamp(F.concat(F.lit("2000 "), c),
                                  F.lit("yyyy MMM d HH:mm:ss")).isNotNull()
    raise ValueError(f"unknown is_time format {fmt!r}")

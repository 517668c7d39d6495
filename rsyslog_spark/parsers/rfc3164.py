"""RFC3164 (legacy BSD syslog) parser — permissive, like the
reference's pmrfc3164 (ref: tools/pmrfc3164.c, 585 LoC).

Wire shape: ``<PRI>Mmm dd hh:mm:ss HOSTNAME TAG[pid]: MSG``.
Permissive behaviors reproduced:
- no timestamp → whole rest is TAG+MSG, timereported = NULL
  (caller substitutes reception time, ref parser.c).
- TAG terminates at ':' or '[' (programname derivation,
  ref: runtime/msg.c getProgramName).
- year inference: RFC3164 has no year; we attach the current year
  (ref pmrfc3164 year guess).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import rs_str
from rsyslog_spark.parsers.pri import pri_col, strip_pri

# "Mar  1 01:00:00" | "Mar 11 01:00:00"
TS3164_RE = r"[A-Z][a-z]{2} [ 0-9]\d \d{2}:\d{2}:\d{2}"
# header after timestamp: hostname, then tag
_REST_RE = rf"^({TS3164_RE}) (\S+) (.*)$"


def _ts3164_to_timestamp(ts: Column) -> Column:
    norm = F.regexp_replace(ts, "  +", " ")
    year = F.date_format(F.current_timestamp(), "yyyy")
    return F.try_to_timestamp(
        F.concat(year, F.lit(" "), norm), F.lit("yyyy MMM d HH:mm:ss")
    )


def rfc3164_fields(line) -> Column:
    """Parse a raw RFC3164 line into a struct of canonical fields.

    Returned struct: pri, syslogfacility, syslogseverity, timereported,
    hostname, syslogtag, programname, procid, msg, parsesuccess.
    """
    raw = rs_str(line)
    pri = pri_col(raw)
    # strip trailing LF/NUL the wire may carry (ref parser trims);
    # char-set rtrim, not regex — this subtree feeds every field
    rest = F.rtrim(strip_pri(raw), F.lit("\n\r\x00"))

    has_ts = rest.rlike(f"^{TS3164_RE} ")
    ts_txt = F.regexp_extract(rest, _REST_RE, 1)
    hostname = F.regexp_extract(rest, _REST_RE, 2)
    tagmsg = F.regexp_extract(rest, _REST_RE, 3)
    # without timestamp: no hostname either (reference treats such
    # lines as TAG MSG from the sender)
    tagmsg_nots = rest
    tagmsg_eff = F.when(has_ts, tagmsg).otherwise(tagmsg_nots)

    # TAG = up to first ':' (included in syslogtag, reference keeps it)
    # or '[pid]' block. MSG = remainder after ': '.
    tag_re = r"^([A-Za-z0-9_\/.+-]+)(\[(\d+)\])?:\s?"
    syslogtag = F.concat(
        F.regexp_extract(tagmsg_eff, tag_re, 1),
        F.when(F.regexp_extract(tagmsg_eff, tag_re, 2) != "",
               F.regexp_extract(tagmsg_eff, tag_re, 2)).otherwise(F.lit("")),
        F.lit(":"),
    )
    tag_found = F.regexp_extract(tagmsg_eff, tag_re, 1) != ""
    syslogtag = F.when(tag_found, syslogtag).otherwise(F.lit("-"))
    programname = F.regexp_extract(tagmsg_eff, tag_re, 1)
    procid = F.regexp_extract(tagmsg_eff, tag_re, 3)
    msg = F.when(tag_found, F.regexp_replace(tagmsg_eff, tag_re, ""))\
        .otherwise(tagmsg_eff)

    return F.struct(
        pri.alias("pri"),
        F.shiftright(pri, 3).alias("syslogfacility"),
        pri.bitwiseAND(F.lit(7)).alias("syslogseverity"),
        F.when(has_ts, _ts3164_to_timestamp(ts_txt)).alias("timereported"),
        F.when(has_ts, hostname).alias("hostname"),
        syslogtag.alias("syslogtag"),
        programname.alias("programname"),
        F.when(procid != "", procid).alias("procid"),
        msg.alias("msg"),
        F.lit(True).alias("parsesuccess"),
    )

"""Vendor/special-case parsers (pm* family beyond the RFC pair).

Each is a pure-Column stage applied to the canonical parsed frame —
the Spark analog of inserting the parser into a ruleset's parser
chain (ref: runtime/parser.c:615-660).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# "last message repeated n times" (ref: plugins/pmlastmsg/pmlastmsg.c:1-6)
_REPEAT_RE = r"^\s*last message repeated (\d+) times\s*$"


def pmlastmsg_detect(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """Flag repeat-summary rows and extract their count.

    Adds ``repeat_count`` (NULL for normal rows). The reference parser
    short-circuits the chain for these rows so later parsers don't
    mangle them; here they are already parsed, we just type them.
    """
    cnt = F.regexp_extract(F.col(msg_col), _REPEAT_RE, 1)
    return df.withColumn(
        "repeat_count",
        F.when(cnt != "", cnt.cast("long")),
    )


def pmlastmsg_expand(
    df: DataFrame,
    key_col: str = "hostname",
    order_col: str = "timereported",
    msg_col: str = "msg",
) -> DataFrame:
    """Inverse of repeated-msg reduction: replace each summary row with
    ``repeat_count`` copies of the preceding real message from the same
    host. One window pass (last non-summary msg) + an explode —
    shuffles once by host, no Python.
    """
    flagged = pmlastmsg_detect(df, msg_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_real = F.last(
        F.when(F.col("repeat_count").isNull(), F.col(msg_col)),
        ignorenulls=True,
    ).over(w)
    expanded = flagged.withColumn(
        msg_col,
        F.when(F.col("repeat_count").isNotNull(), prev_real)
        .otherwise(F.col(msg_col)),
    ).withColumn(
        "_copies",
        F.explode(
            F.sequence(F.lit(1), F.coalesce("repeat_count", F.lit(1)))
        ),
    )
    return expanded.drop("_copies", "repeat_count")


# Cisco IOS: "%FACILITY-SEVERITY-MNEMONIC: text", optional "seq: " and
# timestamp prefix with optional TZ abbreviation (ref: plugins/
# pmciscoios/pmciscoios.c — the only parser calling
# ParseTIMESTAMP3164 with PARSE3164_TZSTRING, datetime.c:685)
_CISCO_RE = (r"^(?:(\d+):\s+)?(?:[*.]?(\w{3}\s+\d+\s+[\d:.]+)"
             r"(?:\s+(\w+))?:\s+)?%(\w+)-(\d)-(\w+):\s*(.*)$")


def _cisco_ts(ts: Column) -> Column:
    """Cisco timestamp text ``Mmm [d]d hh:mm:ss[.mmm]`` → timestamp,
    current-year inference like the 3164 parse."""
    norm = F.regexp_replace(ts, "  +", " ")
    year = F.date_format(F.current_timestamp(), "yyyy")
    full = F.concat(year, F.lit(" "), norm)
    return F.coalesce(
        F.try_to_timestamp(full, F.lit("yyyy MMM d HH:mm:ss.SSS")),
        F.try_to_timestamp(full, F.lit("yyyy MMM d HH:mm:ss")),
    )


def pmciscoios(df: DataFrame, msg_col: str = "msg",
               timezones: dict[str, str] | None = None) -> DataFrame:
    """Parse Cisco IOS message bodies into typed columns:
    ``cisco_seq``, ``cisco_facility``, ``cisco_mnemonic``,
    ``cisco_severity`` (overrides syslogseverity when present, as the
    reference does), ``cisco_time`` (the IOS timestamp prefix, when
    present), and rewrites ``msg`` to the text after the mnemonic.
    Non-matching rows pass through untouched.

    ``timezones`` consumes config ``timezone(id=.. offset=..)``
    objects (ref: runtime/timezones.c glblProcessTimezone;
    datetime.c:685-703 applies the table during the TZSTRING parse):
    a recognized abbreviation after the timestamp converts the wall
    time to UTC by subtracting its offset; unrecognized strings are
    ignored like the reference ("invalid TZ string -- ignored").
    When the frame carries ``timereported``, a parsed cisco_time
    replaces it (the reference parser sets the message timestamp)."""
    m = F.col(msg_col)
    fac = F.regexp_extract(m, _CISCO_RE, 4)
    matched = fac != ""
    ts_txt = F.regexp_extract(m, _CISCO_RE, 2)
    ts = F.when(matched & (ts_txt != ""), _cisco_ts(ts_txt))
    if timezones:
        tz_txt = F.regexp_extract(m, _CISCO_RE, 3)
        # declared-table lookup compiled to a CASE over offsets;
        # "+HH:MM" means local = UTC+offset, so UTC = wall - offset
        off_min = F.lit(None).cast("int")
        for tzid, offset in timezones.items():
            sign = -1 if str(offset).startswith("-") else 1
            hh, mm = str(offset).lstrip("+-").split(":")
            off_min = F.when(tz_txt == tzid,
                             F.lit(sign * (int(hh) * 60 + int(mm)))
                             ).otherwise(off_min)
        ts = F.when(off_min.isNotNull(),
                    ts - F.make_interval(mins=off_min)).otherwise(ts)
    out = (
        df.withColumn(
            "cisco_seq",
            F.when(matched,
                   F.nullif(F.regexp_extract(m, _CISCO_RE, 1), F.lit(""))
                   .cast("long")),
        )
        .withColumn("cisco_facility", F.when(matched, fac))
        .withColumn(
            "cisco_severity",
            F.when(matched, F.regexp_extract(m, _CISCO_RE, 5).cast("int")),
        )
        .withColumn(
            "cisco_mnemonic",
            F.when(matched, F.regexp_extract(m, _CISCO_RE, 6)),
        )
        .withColumn("cisco_time", ts)
    )
    if "timereported" in df.columns:
        out = out.withColumn(
            "timereported",
            F.coalesce(F.col("cisco_time"), F.col("timereported")))
    return out.withColumn(
        msg_col,
        F.when(matched, F.regexp_extract(m, _CISCO_RE, 7)).otherwise(m),
    )


# LEEF: "LEEF:ver|vendor|product|productVersion|eventID|k=v<delim>..."
# (ref: plugins/mmleefparse/mmleefparse.c:110-310; cookie "LEEF:",
# default extension delimiter TAB)
_LEEF_HDR = r"^LEEF:([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|(.*)$"


def mmleefparse(
    df: DataFrame, msg_col: str = "msg", delimiter: str = "\t",
    prefix: str = "leef_",
) -> DataFrame:
    """Parse LEEF payloads: header fields become typed columns
    (``leef_version/vendor/product/product_version/event_id``) and the
    delimiter-separated ``k=v`` extensions a ``leef_fields`` map —
    the Spark shape of the reference's ``header``/``fields`` JSON
    subtree. Non-LEEF rows: NULL columns, ``parsesuccess`` semantics
    preserved via ``leef_matched``."""
    m = F.col(msg_col)
    matched = m.rlike("^LEEF:")
    ext = F.regexp_extract(m, _LEEF_HDR, 6)
    pairs = F.filter(F.split(ext, re.escape(delimiter)),
                     lambda kv: kv.contains("="))
    # value = remainder after first '=' (values may contain '=')
    fields = F.map_from_entries(F.transform(pairs, lambda kv: F.struct(
        F.substring_index(kv, "=", 1).alias("key"),
        F.substr(kv, F.length(F.substring_index(kv, "=", 1)) + 2)
        .alias("value"),
    )))
    def hdr(i):
        return F.when(matched, F.regexp_extract(m, _LEEF_HDR, i))
    return (
        df.withColumn(prefix + "version", hdr(1))
        .withColumn(prefix + "vendor", hdr(2))
        .withColumn(prefix + "product", hdr(3))
        .withColumn(prefix + "product_version", hdr(4))
        .withColumn(prefix + "event_id", hdr(5))
        .withColumn(prefix + "fields", F.when(matched, fields))
        .withColumn(prefix + "matched", matched)
    )


def pmsnare(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """Snare cleanup (ref: contrib/pmsnare/pmsnare.c): Snare agents
    send ``hostname<tab>MSWinEventLog<tab>...`` (non-syslog mode) or a
    3164 header whose tag is followed by a tab. The reference rewrites
    the offending tab to a space so the normal parser chain succeeds;
    we do the same rewrite and flag the rows."""
    m = F.col(msg_col)
    is_snare = m.rlike(r"^[^\t ]+\t") | m.rlike(r"^\S+\[?\d*\]?:?\t")
    fixed = F.when(is_snare, F.regexp_replace(m, r"\t", " ")).otherwise(m)
    return df.withColumn("snare_detected", is_snare) \
             .withColumn(msg_col, fixed)


def pmaixforwardedfrom(df: DataFrame, msg_col: str = "msg",
                       hostname_col: str = "hostname") -> DataFrame:
    """AIX mangled-forward cleanup (ref: contrib/pmaixforwardedfrom/
    pmaixforwardedfrom.c:69-104): strip the ``Message forwarded from
    <host>: `` wrapper and restore the real source hostname."""
    m = F.col(msg_col)
    pat = r"^Message forwarded from (\S+?):? (.*)$"
    host = F.regexp_extract(m, pat, 1)
    matched = m.startswith("Message forwarded from ") & (host != "")
    return (
        df.withColumn(hostname_col,
                      F.when(matched, host).otherwise(F.col(hostname_col)))
        .withColumn(msg_col,
                    F.when(matched, F.regexp_extract(m, pat, 2))
                    .otherwise(m))
    )


def pmcisconames(df: DataFrame, msg_col: str = "msg",
                 hostname_col: str = "hostname") -> DataFrame:
    """Cisco-names cleanup (ref: contrib/pmcisconames/pmcisconames.c):
    messages shaped ``Mmm dd [yyyy ]HH:MM:SS <name> : %MNEMONIC...``
    carry the device name between timestamp and the ``: %`` marker;
    promote it to hostname and strip it from the body."""
    m = F.col(msg_col)
    pat = (r"^\s*([A-Z][a-z]{2} [ 0-9]\d(?: \d{4})? \d{2}:\d{2}:\d{2})"
           r" (\S+) : (%.*)$")
    name = F.regexp_extract(m, pat, 2)
    matched = name != ""
    return (
        df.withColumn(hostname_col,
                      F.when(matched, name).otherwise(F.col(hostname_col)))
        .withColumn(msg_col,
                    F.when(matched, F.regexp_extract(m, pat, 3))
                    .otherwise(m))
    )


# split commas NOT inside double quotes (quote-aware CSV, the state
# machine of ref contrib/pmpanngfw/pmpanngfw.c:55-140 as one regex)
_CSV_SPLIT = r',(?=(?:[^"]*"[^"]*")*[^"]*$)'


def pmpanngfw(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """Palo Alto Networks NGFW cleanup (ref: contrib/pmpanngfw/
    pmpanngfw.c): PAN-OS bodies are quoted CSV whose 4th field is the
    log type (TRAFFIC/THREAT/CONFIG/SYSTEM). The reference rewrites
    the delimiters to tabs for downstream field extraction; we emit
    the quote-aware field array (``pan_fields``), the detected type
    (``pan_type``), and the tab-rewritten msg."""
    m = F.col(msg_col)
    fields = F.split(m, _CSV_SPLIT)
    ftype = F.try_element_at(fields, F.lit(4))
    matched = ftype.isin("TRAFFIC", "THREAT", "CONFIG", "SYSTEM")
    return (
        df.withColumn("pan_fields", F.when(matched, fields))
        .withColumn("pan_type", F.when(matched, ftype))
        .withColumn(msg_col,
                    F.when(matched, F.concat_ws("\t", fields)).otherwise(m))
    )


def pmdb2diag(
    df: DataFrame, msg_col: str = "msg",
    timeformat: str = "yyyy-MM-dd-HH.mm.ss.SSSSSS",
) -> DataFrame:
    """DB2 diagnostic-log parse (ref: contrib/pmdb2diag/pmdb2diag.c:
    96-176): fixed-position level token after the header, PID after
    the first ':' past the level, program from the PID-shift. We parse
    the documented layout ``<ts><tz> <recno> LEVEL: ... PID : <pid>
    ... PROG : <prog>`` with regexes (positions vary too much across
    DB2 versions for byte offsets to be the Spark-side contract)."""
    m = F.col(msg_col)
    ts = F.regexp_extract(m, r"^(\d{4}-\d{2}-\d{2}-\d{2}\.\d{2}\.\d{2}\.\d+)", 1)
    level = F.regexp_extract(
        m, r"\b(CRITICAL|SEVERE|ERROR|WARNING|EVENT|INFO|DEBUG)\b", 1)
    pid = F.regexp_extract(m, r"PID\s*:\s*(\d+)", 1)
    tid = F.regexp_extract(m, r"TID\s*:\s*(\d+)", 1)
    prog = F.regexp_extract(m, r"PROC\s*:\s*(\S+)", 1)
    matched = (ts != "") & (level != "")
    sev_map = {"CRITICAL": 2, "SEVERE": 3, "ERROR": 3, "WARNING": 4,
               "EVENT": 5, "INFO": 6, "DEBUG": 7}
    sev = F.lit(None).cast("int")
    for k, v in sev_map.items():
        sev = F.when(level == k, F.lit(v)).otherwise(sev)
    return (
        df.withColumn("db2_time",
                      F.when(matched, F.try_to_timestamp(
                          ts, F.lit(timeformat))))
        .withColumn("db2_level", F.when(matched, level))
        .withColumn("db2_severity", F.when(matched, sev))
        .withColumn("db2_pid", F.when(matched & (pid != ""),
                                      pid.cast("long")))
        .withColumn("db2_tid", F.when(matched & (tid != ""),
                                      tid.cast("long")))
        .withColumn("db2_proc", F.when(matched & (prog != ""), prog))
    )


def pmnull(df: DataFrame, line_col: str = "line",
           tag: str = "", hostname_col: str | None = None) -> DataFrame:
    """pmnull (ref: plugins/pmnull): accept everything verbatim — the
    whole line becomes msg; PRI defaults to 13 (user.notice) unless a
    leading <PRI> is present."""
    line = F.col(line_col)
    pri_s = F.regexp_extract(line, r"^<(\d{1,3})>", 1)
    pri = F.when(
        (pri_s != "") & (pri_s.cast("int") <= 191), pri_s.cast("int")
    ).otherwise(F.lit(13))
    body = F.regexp_replace(line, r"^<\d{1,3}>", "")
    return df.select(
        *[c for c in df.columns if c != line_col],
        line.alias("rawmsg"),
        body.alias("msg"),
        pri.alias("pri"),
        (pri / 8).cast("int").alias("syslogfacility"),
        (pri % 8).cast("int").alias("syslogseverity"),
        F.lit(tag).alias("syslogtag"),
        (F.col(hostname_col) if hostname_col else F.lit(None).cast("string"))
        .alias("hostname"),
        # parsers never set bParseSuccess (msg.c:2183)
        F.lit(False).alias("parsesuccess"),
    )


def pmnormalize(df: DataFrame, rulebase: str,
                line_col: str = "line", **kw) -> DataFrame:
    """pmnormalize (ref: plugins/pmnormalize/pmnormalize.c): the
    liblognorm rulebase applied as a PARSER over the raw line instead
    of as a message-modification stage — same compiler
    (operators/normalize.py), different position in the chain."""
    from rsyslog_spark.operators.normalize import normalize

    return normalize(df, rulebase, msg_col=line_col, **kw)

"""RFC5424 parser (ref: tools/pmrfc5424.c, 347 LoC).

Wire: ``<PRI>1 TIMESTAMP HOSTNAME APP-NAME PROCID MSGID SD [MSG]``
with NILVALUE "-". Parsing strategy: one cheap ``split(limit=7)``
over the header (no per-field regex scans), then a single regex to
separate STRUCTURED-DATA from MSG — the header fields cannot contain
spaces (RFC5424 §6), so the split is exact, and Catalyst codegens the
whole thing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import rs_str
from rsyslog_spark.parsers.pri import pri_col, strip_pri

_SD_MSG_RE = r"^((?:\[.*\])+|-)(?: (.*))?$"


def _nil(c: Column) -> Column:
    return F.when(c == "-", F.lit(None).cast("string")).otherwise(c)


def accepts_rfc5424(line) -> Column:
    """Header sniff: ``<PRI>1 `` (ref pmrfc5424 checks version '1')."""
    return rs_str(line).rlike(r"^<\d{1,3}>1 ")


def rfc5424_fields(line) -> Column:
    raw = rs_str(line)
    pri = pri_col(raw)
    # char-set rtrim, not regex — this subtree feeds every field
    rest = F.rtrim(strip_pri(raw), F.lit("\n\r\x00"))
    # rest = "1 TS HOST APP PROC MSGID SD[ MSG]"
    parts = F.split(rest, " ", 7)
    ts = _nil(F.element_at(parts, 2))
    hostname = _nil(F.element_at(parts, 3))
    app_name = _nil(F.element_at(parts, 4))
    procid = _nil(F.element_at(parts, 5))
    msgid = _nil(F.element_at(parts, 6))
    tail = F.coalesce(F.try_element_at(parts, F.lit(7)), F.lit("-"))
    sd = F.regexp_extract(tail, _SD_MSG_RE, 1)
    msg = F.regexp_extract(tail, _SD_MSG_RE, 2)
    # BOM strip (RFC5424 allows UTF-8 BOM before MSG; ref pmrfc5424)
    msg = F.regexp_replace(msg, "^﻿", "")
    timereported = F.coalesce(
        F.try_to_timestamp(ts, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        F.try_to_timestamp(ts, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(ts, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )
    # syslogtag emulation: "app[procid]" / bare "app" when PROCID is
    # NIL — NO trailing colon for protocol-1 messages (ref:
    # runtime/msg.c tryEmulateTAG:2337-2345; golden
    # contains-longer-needle.sh '$syslogtag == "app"')
    syslogtag = F.concat(
        F.coalesce(app_name, F.lit("-")),
        F.when(procid.isNotNull(), F.concat(F.lit("["), procid, F.lit("]")))
        .otherwise(F.lit("")),
    )
    return F.struct(
        pri.alias("pri"),
        F.shiftright(pri, 3).alias("syslogfacility"),
        pri.bitwiseAND(F.lit(7)).alias("syslogseverity"),
        timereported.alias("timereported"),
        hostname.alias("hostname"),
        app_name.alias("app_name"),
        procid.alias("procid"),
        msgid.alias("msgid"),
        _nil(sd).alias("structured_data"),
        msg.alias("msg"),
        syslogtag.alias("syslogtag"),
        F.coalesce(app_name, F.lit("")).alias("programname"),
        # bParseSuccess is only set by mm modules (msg.c:2183)
        F.lit(False).alias("parsesuccess"),
    )


def parse_structured_data(sd) -> Column:
    """RFC5424 STRUCTURED-DATA → MAP<STRING, MAP<STRING,STRING>>
    (mmpstrucdata analog, ref: plugins/mmpstrucdata/mmpstrucdata.c).

    ``[id k="v" k2="v2"][id2 ...]`` — element ids become outer keys,
    param maps inner. Pure higher-order-function pipeline: split into
    elements, then per element regex-extract id and k="v" pairs.
    """
    c = rs_str(sd)
    # an element body may contain ']' ESCAPED as '\]' inside param
    # values (RFC5424 §6.3.3 escapes: '"', '\', ']'; golden
    # mmpstrucdata-escaping.sh bracket="1\]2").
    # UNROLLED-LOOP + POSSESSIVE quantifiers: the naive
    # (?:[^X\\]|\\.)* alternation recurses per character in Java's
    # regex engine — a 70k-char param value StackOverflowErrors the
    # executor (mmpstrucdata-large-sd.sh blob). The unrolled form
    # iterates the group only per ESCAPE, so arbitrary-size values
    # scan flat — the 100 TB shape too.
    elements = F.regexp_extract_all(
        c, F.lit(r"\[([^\]\\]*+(?:\\.[^\]\\]*+)*+)\]"), F.lit(1))

    def elem_to_entry(e: Column):
        sd_id = F.regexp_extract(e, r"^(\S+)", 1)
        # keys and values extract from the SAME pair matches (one
        # pattern, two groups) so their counts can never diverge —
        # separate key/value scans desynced on values containing
        # escaped quotes
        pair = r'(\S+?)="([^"\\]*+(?:\\.[^"\\]*+)*+)"'
        keys = F.regexp_extract_all(e, F.lit(pair), F.lit(1))
        vals = F.transform(
            F.regexp_extract_all(e, F.lit(pair), F.lit(2)),
            # unescape the RFC5424 PARAM-VALUE escapes \" \\ \]
            lambda v: F.regexp_replace(v, r'\\(["\\\]])', r"$1"))
        params = F.map_from_arrays(keys, vals)
        return F.struct(sd_id.alias("key"), params.alias("value"))
    entries = F.transform(elements, elem_to_entry)
    return F.map_from_entries(entries)

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


#: mmsnareparse description SECTION headers (mmsnareparse.c section
#: tables; the description tokenizes on 2+-space runs, a known header
#: token opens a section, everything else is Key/Value pairs)
_SNARE_SECTIONS = {
    "Subject": "Subject",
    "Logon Information": "LogonInformation",
    "New Logon": "NewLogon",
    "Process Information": "Process",
    "Network Information": "Network",
    "Detailed Authentication Information": "DetailedAuthentication",
    "Filter Information": "Filter",
    "Application Information": "Application",
    "TLS Inspection": "TLSInspection",
    "Account Information": "AccountInformation",
    "Account For Which Logon Failed": "AccountForWhichLogonFailed",
    "Failure Information": "FailureInformation",
}

#: LogonType → canonical name (mmsnareparse.c fieldValueLogonType)
_SNARE_LOGON_TYPES = {
    "2": "Interactive", "3": "Network", "4": "Batch", "5": "Service",
    "7": "Unlock", "8": "NetworkCleartext", "9": "NewCredentials",
    "10": "RemoteInteractive", "11": "CachedInteractive",
}


def mmsnareparse(df: DataFrame, msg_col: str = "msg", *,
                 ignore_trailing_pattern: str | None = None
                 ) -> DataFrame:
    """Structured Snare/NXLog Windows-event parser (ref: plugins/
    mmsnareparse/mmsnareparse.c — the 5.7k-LoC original; this is the
    documented CORE SUBSET: tab header → ``$!win!Event``, description
    sections → per-section containers, root pairs → ``EventData`` or
    the source-specific WDAC/WUFB containers, LAPS Context k=v,
    Remote Credential Guard → ``$!win!Logon``, LogonType
    canonicalization — everything mmsnareparse-basic.sh checks).

    The tab-separated Snare payload after ``MSWinEventLog``:
    criticality, Channel, counter, date, EventID, SourceName, user,
    sidtype, EventLogType, Computer, Category, <reserved>,
    description, checksum. The DESCRIPTION tokenizes on 2+-space
    runs: a known section-header token opens a section; ``Key:``
    tokens take the next token as value; ``Key: value`` single-space
    tokens are inline pairs. Pure column ops — the token walk is an
    O(tokens²) higher-order-function scan per row, bounded by the
    event text (~40 tokens).

    ``ignore_trailing_pattern``: text from the first occurrence of
    the pattern onward is cut BEFORE parsing and stored in
    ``$!extradata_section`` (mmsnareparse-trailing-extradata.sh).
    """
    from rsyslog_spark.plans.ruleset import fold_var

    from rsyslog_spark.expr import rs_str

    m = rs_str(F.col(msg_col))
    # the Snare marker may have been eaten by the HEADER parse (a
    # 3164 TAG 'MSWinEventLog' followed by a tab) — fall back to the
    # raw line from the marker on, like the reference's marker search
    if "rawmsg" in df.columns:
        raw = rs_str(F.col("rawmsg"))
        m = F.when(m.contains("MSWinEventLog"), m).otherwise(
            F.when(raw.contains("MSWinEventLog"),
                   F.expr("substring(rawmsg, "
                          "locate('MSWinEventLog', rawmsg))"))
            .otherwise(m))
    out = df
    if ignore_trailing_pattern:
        # with-tabs path (detect_and_truncate_trailing_extradata:
        # 5150-5210): the pattern must appear in the LAST tab token —
        # that WHOLE token becomes $!extradata_section and the
        # message truncates AT the last tab
        last_tok = F.element_at(F.split(m, "\t"), -1)
        has = F.locate(ignore_trailing_pattern, last_tok) > 0
        out = out.withColumn("cee_extradata_section",
                             F.when(has, last_tok).alias(
                                 "cee_extradata_section",
                                 metadata={"rs_path":
                                           "$!extradata_section"}))
        m = F.when(has, m.substr(
            F.lit(1), F.length(m) - F.length(last_tok) - 1)) \
            .otherwise(m)

    tabs = F.split(m, "\t")
    base = F.array_position(tabs, "MSWinEventLog").cast("int")
    ok = base > 0

    def fld(off: int):
        return F.when(ok, F.element_at(tabs, base + off))

    event_id = fld(5)
    source = fld(6)
    # TimeCreated.Normalized: the event time normalized to ISO8601
    # (mmsnareparse.c time normalization; mmsnareparse-json.sh
    # '"timecreatednormalized":"2025-02-18T06:42:17...')
    tnorm = (F.date_format("timereported",
                           "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
             if "timereported" in df.columns
             else F.lit(None).cast("string"))
    event_obj = F.to_json(F.struct(
        event_id.alias("EventID"),
        F.struct(tnorm.alias("Normalized")).alias("TimeCreated"),
        fld(2).alias("Channel"),
        fld(3).alias("SnareCounter"),
        fld(9).alias("EventLogType"),
        # reference spellings exposed by mmsnareparse-syslog.sh:
        # EventType (= the Snare audit-type field) and CategoryText
        fld(9).alias("EventType"),
        source.alias("SourceName"),
        fld(10).alias("Computer"),
        fld(11).alias("Category"),
        fld(11).alias("CategoryText"),
    ))
    desc = F.coalesce(fld(13), F.lit(""))

    # ---- tokenize + section walk (all higher-order column fns) ----
    # NB: transform(arr, F.trim) would call trim(elem, INDEX) — the
    # two-arg TRIM strips the index's DIGITS off the token ends
    toks = F.filter(
        F.transform(F.split(desc, r"\s{2,}"), lambda t: F.trim(t)),
        lambda t: t != "")
    n = F.size(toks)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)) \
        .otherwise(F.array().cast("array<int>"))
    sec_names = list(_SNARE_SECTIONS)

    def tok(i):
        return F.element_at(toks, i)

    def is_section(t):
        return F.rtrim(t).isin(*[s + ":" for s in sec_names])

    def section_of(i):
        # last section header at or before i (O(n) filter per token)
        prior = F.filter(idx, lambda j: (j <= i)
                         & is_section(F.element_at(toks, j)))
        return F.when(
            F.size(prior) > 0,
            F.rtrim(F.element_at(toks, F.element_at(prior, -1)))
        ).otherwise(F.lit("Root:"))

    # per-token (section, key, value) — null when the token is a
    # section header or a consumed value
    def entry_of(i):
        t = tok(i)
        nxt = F.element_at(toks, F.least(i + 1, n))
        prev = F.element_at(toks, F.greatest(i - 1, F.lit(1)))
        inline = t.rlike(r"^[A-Za-z][^:]*: \S")
        key_only = t.rlike(r"^[A-Za-z][^:]*:$") & ~is_section(t)
        # a bare token is a VALUE if the previous token was key-only
        consumed = prev.rlike(r"^[A-Za-z][^:]*:$") \
            & ~is_section(prev) & (i > 1)
        key = F.when(inline,
                     F.regexp_extract(t, r"^([^:]*):", 1)) \
            .when(key_only, F.rtrim(F.regexp_replace(t, ":$", "")))
        val = F.when(inline, F.regexp_extract(t, r"^[^:]*: (.*)$", 1)) \
            .when(key_only & (i < n)
                  & ~nxt.rlike(r"^[A-Za-z][^:]*:( \S.*)?$"),
                  nxt) \
            .when(key_only, F.lit(""))
        return F.when(
            key.isNotNull() & ~consumed,
            F.struct(F.regexp_replace(section_of(i), ":$", "")
                     .alias("sec"),
                     F.regexp_replace(
                         F.regexp_replace(key, r"\s*\([^)]*\)", ""),
                         r"\s+", "").alias("k"),
                     F.coalesce(val, F.lit("")).alias("v")))

    # MATERIALIZE the token-walk result as one column: every section
    # container references it, and inlining the O(tokens²) walk into
    # each of the ~12 container expressions multiplied the plan tree
    # ~12x (minutes of analyzer time per query)
    out = out.withColumn(
        "__snare_entries",
        F.filter(F.transform(idx, entry_of),
                 lambda e: e.isNotNull()))
    entries = F.col("__snare_entries")

    def section_map(section: str):
        sec = F.filter(entries, lambda e: e["sec"] == section)
        return F.when(
            F.size(sec) > 0,
            F.to_json(F.map_from_entries(F.transform(
                sec, lambda e: F.struct(e["k"], e["v"])))))

    def container(colname: str, path: str, col):
        nonlocal out
        out = out.withColumn(colname, col.alias(
            colname, metadata={"rs_path": path, "rs_json": True}))

    container("cee_win_event", "$!win!Event", F.when(ok, event_obj))
    for ref_sec, cont in _SNARE_SECTIONS.items():
        container(f"cee_win_{cont.lower()}", f"$!win!{cont}",
                  _snare_section_post(cont, section_map(ref_sec)))
    root_map = F.filter(entries, lambda e: (e["sec"] == "Root")
                        & (e["k"] != "LAPSContext")
                        & (e["k"] != "RemoteCredentialGuard"))
    root_obj = F.when(F.size(root_map) > 0, F.to_json(
        F.map_from_entries(F.transform(
            root_map, lambda e: F.struct(e["k"], e["v"])))))
    # source-specific root containers (mmsnareparse.c event tables):
    # CodeIntegrity → WDAC, WindowsUpdateClient → WUFB, else the
    # generic EventData bucket
    container("cee_win_wdac", "$!win!WDAC",
              F.when(source == "Microsoft-Windows-CodeIntegrity",
                     root_obj))
    container("cee_win_wufb", "$!win!WUFB",
              F.when(source == "Microsoft-Windows-WindowsUpdateClient",
                     root_obj))
    container("cee_win_eventdata", "$!win!EventData",
              F.when(~source.isin("Microsoft-Windows-CodeIntegrity",
                                  "Microsoft-Windows-WindowsUpdateClient"),
                     root_obj))
    # Remote Credential Guard root pair → $!win!Logon (boolean)
    rcg = F.filter(entries,
                   lambda e: e["k"] == "RemoteCredentialGuard")
    container("cee_win_logon", "$!win!Logon", F.when(
        F.size(rcg) > 0,
        F.concat(F.lit('{"RemoteCredentialGuard":"'),
                 F.when(F.lower(F.element_at(rcg, 1)["v"])
                        .isin("enabled", "true", "yes", "1"),
                        F.lit("true")).otherwise(F.lit("false")),
                 F.lit('"}'))))
    # LAPS Context: 'K=V; K2=V2' root pair → $!win!LAPS, True/False
    # lowercased (fieldValueBoolean canonical form)
    laps = F.filter(entries, lambda e: e["k"] == "LAPSContext")
    laps_pairs = F.filter(
        F.transform(
            F.split(F.element_at(laps, F.least(F.size(laps),
                                               F.lit(1)))["v"],
                    r";\s*"),
            lambda kv: F.when(
                kv.contains("="),
                F.struct(
                    F.trim(F.split_part(kv, F.lit("="), F.lit(1)))
                    .alias("k"),
                    F.when(F.lower(F.trim(F.split_part(
                        kv, F.lit("="), F.lit(2))))
                        .isin("true", "false"),
                        F.lower(F.trim(F.split_part(
                            kv, F.lit("="), F.lit(2)))))
                    .otherwise(F.trim(F.split_part(
                        kv, F.lit("="), F.lit(2)))).alias("v")))),
        lambda e: e.isNotNull())
    container("cee_win_laps", "$!win!LAPS", F.when(
        F.size(laps) > 0,
        F.to_json(F.map_from_entries(laps_pairs))))
    return out.drop("__snare_entries")


def _snare_section_post(container: str, obj_json):
    """Section post-processing: LogonInformation gains the canonical
    LogonTypeName derived from LogonType (mmsnareparse.c
    fieldValueLogonType)."""
    if container != "LogonInformation":
        return obj_json
    lt = F.get_json_object(obj_json, "$.LogonType")
    name = None
    for num, nm in _SNARE_LOGON_TYPES.items():
        c = F.when(lt == num, F.lit(nm))
        name = c if name is None else F.coalesce(name, c)
    return F.when(
        obj_json.isNotNull() & lt.isNotNull() & name.isNotNull(),
        F.concat(F.regexp_replace(obj_json, r"\}$", ""),
                 F.lit(',"LogonTypeName":"'), name, F.lit('"}'))
    ).otherwise(obj_json)

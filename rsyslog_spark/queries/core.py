"""Core-engine queries: parse/render roundtrip, PRI & property
filters, expression coercion, scalar-function batteries, templates.

Shared derivation (events table as a syslog stream):
  sev  = event_id % 8          facility-severity from stable ids
  fac  = user_id % 24
  host = 'h' || user_id % 10
  app  = 'app' || user_id % 5
  msg  = event_type || ' code=' || event_id % 100
The oracle recomputes these directly — the Spark side must arrive at
the same numbers through the full render→parse→filter→aggregate
pipeline, which is what makes the roundtrip a real test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import rsyslog_spark.functions as rf
from rsyslog_spark.expr import prifilt, rs_cmp, rs_div, rs_concat
from rsyslog_spark.parsers import parse_syslog
from rsyslog_spark.queries import Query, load
from rsyslog_spark.templates import csv_line, jsonf

QUERIES: list[Query] = []


def q(name, oracle, doc=""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn
    return deco


from rsyslog_spark.session import register_session_cache as _reg_cache

#: keyed by (applicationId,): JVM-backed Columns go stale across
#: session restarts; registered so dead-session entries are swept
_RENDER_CACHE: dict = _reg_cache({})


def _events_syslog_lines(spark, sf_dir):
    """Render events as RFC5424 wire lines (the omfwd template path)."""
    from rsyslog_spark.session import session_cache_key

    ev = load(spark, sf_dir, "events")
    sk = session_cache_key()
    if sk and (sk,) in _RENDER_CACHE:
        return ev.select(_RENDER_CACHE[(sk,)].alias("line"))
    sev = (F.col("event_id") % 8).cast("int")
    fac = (F.col("user_id") % 24).cast("int")
    pri = fac * 8 + sev
    host = F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"))
    app = F.concat(F.lit("app"), (F.col("user_id") % 5).cast("string"))
    msg = F.concat(F.col("event_type"), F.lit(" code="),
                   (F.col("event_id") % 100).cast("string"))
    ts = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
                  F.lit("Z"))
    line = F.concat(
        F.lit("<"), pri.cast("string"), F.lit(">1 "), ts, F.lit(" "),
        host, F.lit(" "), app, F.lit(" "),
        F.col("user_id").cast("string"), F.lit(" ID"),
        (F.col("event_id") % 10).cast("string"), F.lit(" - "), msg,
    )
    if sk:
        _RENDER_CACHE[(sk,)] = line
    return ev.select(line.alias("line"))


@q(
    "flagship_parse_route",
    """
    SELECT CAST(event_id % 8 AS BIGINT) AS severity,
           'app' || CAST(user_id % 5 AS VARCHAR) AS app_name,
           COUNT(*) AS cnt,
           CAST(SUM(event_id % 100) AS BIGINT) AS sum_code
    FROM events
    WHERE (event_id % 8) <= 4 AND event_type LIKE '%error%'
    GROUP BY 1, 2
    """,
    doc="End-to-end: template-render events to RFC5424 lines, parse "
        "back through the parser chain, PRI-filter *.warning, property-"
        "filter msg contains 'error', re_extract the code, aggregate. "
        "SURVEY §7 milestone-0 slice.",
)
def flagship_parse_route(spark, sf_dir):
    lines = _events_syslog_lines(spark, sf_dir)
    parsed = parse_syslog(lines)
    routed = parsed.filter(prifilt("*.warning")).filter(
        F.col("msg").contains("error")
    )
    code = rf.re_extract("msg", r"code=(\d+)", 0, 1, "0")
    return (
        routed.withColumn("code", code.cast("long"))
        .groupBy(
            F.col("syslogseverity").cast("long").alias("severity"),
            F.col("app_name"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("code").cast("long").alias("sum_code"))
    )


@q(
    "rfc5424_roundtrip_fields",
    """
    SELECT 'h' || CAST(user_id % 10 AS VARCHAR) AS hostname,
           CAST(user_id AS VARCHAR) AS procid,
           'ID' || CAST(event_id % 10 AS VARCHAR) AS msgid,
           date_trunc('hour', ts) AS hr,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
    doc="RFC5424 parse fidelity incl. fractional-second timestamps: "
        "every header field and the event-time hour must survive the "
        "render→parse roundtrip (ref: tools/pmrfc5424.c).",
)
def rfc5424_roundtrip_fields(spark, sf_dir):
    parsed = parse_syslog(_events_syslog_lines(spark, sf_dir))
    return parsed.groupBy(
        "hostname", "procid", "msgid",
        F.date_trunc("hour", "timereported").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "pri_filter_selectors",
    """
    SELECT CAST(user_id % 24 AS BIGINT) AS facility,
           CAST(event_id % 8 AS BIGINT) AS severity,
           COUNT(*) AS cnt
    FROM events
    WHERE (event_id % 8) <= 3
       OR (user_id % 24) = 4
       OR ((user_id % 24) = 2 AND (event_id % 8) = 6)
    GROUP BY 1, 2
    """,
    doc="Compiled PRI-mask filter: '*.err;auth.*;mail.=info' — three "
        "selectors merged into one 25x8 bitmask at plan time "
        "(ref: runtime/ruleset.c:403-417, rainerscript.c:5659-5679).",
)
def pri_filter_selectors(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    fac = (F.col("user_id") % 24).cast("int")
    sev = (F.col("event_id") % 8).cast("int")
    df = ev.select(fac.alias("facility"), sev.alias("severity"))
    return (
        df.filter(prifilt("*.err;auth.*;mail.=info", "facility", "severity"))
        .groupBy(F.col("facility").cast("long").alias("facility"),
                 F.col("severity").cast("long").alias("severity"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@q(
    "pri_filter_negated",
    """
    SELECT CAST(user_id % 24 AS BIGINT) AS facility,
           CAST(event_id % 8 AS BIGINT) AS severity,
           COUNT(*) AS cnt
    FROM events
    WHERE ((user_id % 24) = 20 AND (event_id % 8) <> 7)
       OR ((user_id % 24) = 4 AND (event_id % 8) >= 3)
       OR ((user_id % 24) = 2)
    GROUP BY 1, 2
    """,
    doc="Negated priority selectors (conf.c:402-422 "
        "TABLE_NOPRI→TABLE_ALLPRI; ChangeLog 2026-06-22 fix): "
        "standalone 'local4.!=debug' matches every severity except "
        "debug, 'auth.!crit' excludes crit-and-more-severe "
        "(leaving 3..7), 'mail.!none' fills the facility.",
)
def pri_filter_negated(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    fac = (F.col("user_id") % 24).cast("int")
    sev = (F.col("event_id") % 8).cast("int")
    df = ev.select(fac.alias("facility"), sev.alias("severity"))
    return (
        df.filter(prifilt("local4.!=debug;auth.!crit;mail.!none",
                          "facility", "severity"))
        .groupBy(F.col("facility").cast("long").alias("facility"),
                 F.col("severity").cast("long").alias("severity"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@q(
    "rs_expr_battery",
    """
    SELECT event_type,
           CAST(SUM(CASE WHEN COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) >= 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_k_ge_50,
           CAST(SUM(CASE WHEN event_type = '9' THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_str9,
           CAST(SUM(CASE WHEN (event_id % 5) = 0 THEN 0
                    ELSE CAST(TRUNC(CAST(FLOOR(value * 100) AS BIGINT)
                              / (event_id % 5)) AS BIGINT) END) AS BIGINT) AS sum_div,
           CAST(SUM(CASE WHEN (event_id % 5) = 0 THEN 0
                    ELSE CAST(FLOOR(value * 100) AS BIGINT) % (event_id % 5) END) AS BIGINT) AS sum_mod,
           CAST(SUM(CASE WHEN event_type LIKE '%rror%' THEN 1 ELSE 0 END) AS BIGINT)  AS n_contains,
           CAST(SUM(CASE WHEN event_type LIKE 'sign%' THEN 1 ELSE 0 END) AS BIGINT)   AS n_startswith,
           CAST(SUM(CASE WHEN event_type LIKE '%ase' THEN 1 ELSE 0 END) AS BIGINT)    AS n_endswith,
           CAST(SUM(CASE WHEN regexp_matches(event_type, '^(view|click)$') THEN 1 ELSE 0 END) AS BIGINT) AS n_regex,
           CAST(SUM(CASE WHEN event_type = '' THEN 1 ELSE 0 END) AS BIGINT)           AS n_isempty,
           CAST(SUM(CASE WHEN event_type NOT LIKE '%rror%' THEN 1 ELSE 0 END) AS BIGINT) AS n_negated
    FROM events
    GROUP BY event_type
    """,
    doc="RainerScript expression battery, one row per event_type: "
        "numeric-first comparison coercion ('$!k' JSON string vs "
        "'50', string fallback when non-numeric — ref: grammar/"
        "rainerscript.c:3839-3960), division/modulo by zero -> 0 "
        "(rainerscript.c:3803-3812), and the property-filter compare "
        "ops contains/startswith/endswith/regex/isempty + negation "
        "(runtime/typedefs.h:172-179, ruleset.c:424-500).",
)
def rs_expr_battery(spark, sf_dir):
    from rsyslog_spark.expr import rs_mod

    ev = load(spark, sf_dir, "events")
    k = rf.json_get("props", "k")
    t = F.col("event_type")
    num = F.floor(F.col("value") * 100).cast("long")
    den = (F.col("event_id") % 5).cast("long")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return ev.groupBy("event_type").agg(
        cnt(rs_cmp(k, F.lit("50"), ">=")).alias("n_k_ge_50"),
        cnt(rs_cmp(t, F.lit(9), "==")).alias("n_eq_str9"),
        F.sum(rs_div(num, den)).cast("long").alias("sum_div"),
        F.sum(rs_mod(num, den)).cast("long").alias("sum_mod"),
        cnt(t.contains("rror")).alias("n_contains"),
        cnt(t.startswith("sign")).alias("n_startswith"),
        cnt(t.endswith("ase")).alias("n_endswith"),
        cnt(t.rlike("^(view|click)$")).alias("n_regex"),
        cnt(F.length(t) == 0).alias("n_isempty"),
        cnt(~t.contains("rror")).alias("n_negated"),
    )


@q(
    "field_extract",
    """
    SELECT CASE WHEN len(string_split(text, ' ')) >= 3
                THEN string_split(text, ' ')[3]
                ELSE '***FIELD NOT FOUND***' END AS w3,
           COUNT(*) AS cnt
    FROM documents
    GROUP BY 1
    """,
    doc="field(msg, 32, 3) — 3rd space-delimited field with the "
        "reference's FIELD-NOT-FOUND sentinel "
        "(ref: doc/source/rainerscript/functions/rs-field.rst).",
)
def field_extract(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(rf.field("text", " ", 3).alias("w3")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@q(
    "template_render",
    """
    SELECT event_id,
           '"' || CAST(event_id AS VARCHAR) || '","'
               || replace(event_type, '"', '""') || '","'
               || replace(props, '"', '""') || '"' AS csv,
           to_json(struct_pack(id := event_id, etype := event_type,
                               host := 'h' || CAST(user_id % 10 AS VARCHAR))) AS j
    FROM events
    WHERE event_id < 500
    """,
    doc="Template output modes: CSV line (RFC4180 quoting, ref: "
        "template.h:160-166 OPT_CSV — props contains quote characters "
        "so escaping is actually exercised) and jsonf typed-field JSON "
        "object per row (template.h:165-178).",
)
def template_render(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    host = F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"))
    return ev.select(
        "event_id",
        csv_line([F.col("event_id").cast("string"),
                  F.col("event_type"), F.col("props")]).alias("csv"),
        jsonf({"id": F.col("event_id"), "etype": F.col("event_type"),
               "host": host}).alias("j"),
    )


@q(
    "scalar_battery",
    """
    WITH ips AS (
      SELECT *,
             user_id % 256 AS o2,
             '10.' || CAST(user_id % 256 AS VARCHAR) || '.'
                   || CAST(event_id % 256 AS VARCHAR) || '.'
                   || CAST((event_id * 7) % 256 AS VARCHAR) AS ip,
             CAST(10 * 16777216 + (user_id % 256) * 65536
                  + (event_id % 256) * 256 + (event_id * 7) % 256 AS BIGINT) AS ipnum
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           length(event_type) AS len,
           upper(event_type) AS up,
           substr(event_type, 2, 3) AS sub,
           replace(event_type, 'e', 'E') AS repl,
           lower(to_hex(event_id)) AS hexid,
           event_type AS b64rt,
           ltrim(rtrim(' ' || event_type || ' ')) AS trimmed,
           ip, ipnum AS ip2num, ip AS roundtrip,
           CASE WHEN o2 < 128 THEN TRUE ELSE FALSE END AS in_subnet,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS unixts,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+00:00' AS rfc3339,
           CASE WHEN day(ts) < 10
                THEN strftime(ts, '%b  ') || CAST(day(ts) AS VARCHAR) || strftime(ts, ' %H:%M:%S')
                ELSE strftime(ts, '%b %-d %H:%M:%S') END AS rfc3164,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS parsed_back,
           'CEF:0|acme|engine|1.0|' || CAST(event_id % 10 AS VARCHAR)
             || '|' || event_type || '|' || CAST(event_id % 8 AS VARCHAR)
             || '|k\\=' || replace(replace(props, '\\', '\\\\'), '=', '\\=') AS cef
    FROM ips
    """,
    doc="Scalar function battery over one frame: strlen/toupper/"
        "substring/replace/int2hex/b64 roundtrip/trim (ref registry "
        "grammar/rainerscript.c:4467-4510), ipv42num/num2ipv4/"
        "is_in_subnet (rs-ip42num.rst, rs-num2ip.rst), format_time/"
        "parse_time RFC3339+RFC3164 roundtrip (rs-format_time.rst), "
        "and tocef/cef_ext_escape (SURVEY §2.5). All JVM Column "
        "factories — zero Python in the row path.",
)
def scalar_battery(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    t = F.col("event_type")
    ip = F.concat_ws(
        ".", F.lit("10"), (F.col("user_id") % 256).cast("string"),
        (F.col("event_id") % 256).cast("string"),
        ((F.col("event_id") * 7) % 256).cast("string"),
    )
    unixts = F.unix_timestamp("ts")
    ext = F.concat(F.lit("k="), F.col("props"))
    df = ev.withColumn("ip", ip)
    return df.select(
        "event_id",
        rf.strlen(t).cast("long").alias("len"),
        rf.toupper(t).alias("up"),
        rf.substring(t, 1, 3).alias("sub"),
        rf.replace(t, "e", "E").alias("repl"),
        rf.int2hex("event_id").alias("hexid"),
        rf.b64_decode(F.base64(t.cast("binary"))).alias("b64rt"),
        rf.ltrim(rf.rtrim(F.concat(F.lit(" "), t, F.lit(" ")))).alias("trimmed"),
        "ip",
        rf.ipv42num("ip").alias("ip2num"),
        rf.num2ipv4(rf.ipv42num("ip")).alias("roundtrip"),
        rf.is_in_subnet("ip", "10.0.0.0/9").alias("in_subnet"),
        unixts.cast("long").alias("unixts"),
        rf.format_time(unixts, "date-rfc3339").alias("rfc3339"),
        rf.format_time(unixts, "date-rfc3164").alias("rfc3164"),
        rf.parse_time(rf.format_time(unixts, "date-rfc3339"))
        .cast("long").alias("parsed_back"),
        rf.tocef(
            F.lit("0"), F.lit("acme"), F.lit("engine"), F.lit("1.0"),
            (F.col("event_id") % 10).cast("string"), t,
            (F.col("event_id") % 8).cast("string"),
            rf.cef_ext_escape(ext),
        ).alias("cef"),
    )


@q(
    "scalar_battery_misc",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN TRUE
                WHEN doc_id % 3 = 1 THEN FALSE
                ELSE doc_id % 2 <> 0 END AS as_bool,
           '"' || replace('v"' || lang, '"', '\\"') || '"' AS wrapped,
           doc_id % 2 = 0 AS unix_ok,
           doc_id % 2 = 0 AS r3164_ok,
           lang IN ('en', 'fr') AS pcre_hit,
           '{"a":"x' || CAST(doc_id AS VARCHAR)
             || '","b":"2","c":"' || lang || '"}' AS merged,
           '{"a":{"b":' || CAST(doc_id AS VARCHAR)
             || ',"c":2}}' AS unflat
    FROM documents WHERE doc_id < 400
    """,
    doc="Misc scalar battery — the functions the per-family "
        "batteries don't reach: cbool coercion ('on'/'false'/number, "
        "rs coercion), wrap(str, '\\\"', escape) "
        "(rs-wrap.rst), is_time date-unix + date-rfc3164 validity "
        "incl. rejection of garbage (rs-is_time.rst), fmpcre "
        "pcre_match (fmpcre.c:93), append_json shallow merge with "
        "src-wins key order (variable_property_types.rst:37-70), and "
        "fmunflatten dotted-key nesting (fmunflatten.c:206-209 — the "
        "one Arrow-batched UDF here). Oracle = golden expected "
        "values per constructed input, the reference testbench "
        "style.",
)
def scalar_battery_misc(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    did = F.col("doc_id")
    onoff = (F.when(did % 3 == 0, F.lit("on"))
             .when(did % 3 == 1, F.lit("false"))
             .otherwise((did % 2).cast("string")))
    unix_s = F.when(did % 2 == 0, did.cast("string")) \
        .otherwise(F.lit("notanumber"))
    r3164_s = F.when(did % 2 == 0, F.lit("Mar 1 10:00:00")) \
        .otherwise(F.lit("garbage date"))
    dst = F.concat(F.lit('{"a":"x'), did.cast("string"),
                   F.lit('","b":"1"}'))
    src = F.concat(F.lit('{"b":"2","c":"'), F.col("lang"),
                   F.lit('"}'))
    flat = F.concat(F.lit('{"a.b":'), did.cast("string"),
                    F.lit(',"a.c":2}'))
    return docs.select(
        "doc_id",
        rf.cbool(onoff).alias("as_bool"),
        rf.wrap(F.concat(F.lit('v"'), F.col("lang")), '"', '\\"')
        .alias("wrapped"),
        rf.is_time(unix_s, "date-unix").alias("unix_ok"),
        rf.is_time(r3164_s, "date-rfc3164").alias("r3164_ok"),
        rf.pcre_match(F.col("lang"), "^(en|fr)$").alias("pcre_hit"),
        rf.append_json(dst, src).alias("merged"),
        rf.unflatten(flat).alias("unflat"),
    )


@q(
    "faup_url_decompose",
    """
    SELECT source,
           'https' AS scheme,
           source || '.example.com' AS host,
           'example.com' AS domain,
           'com' AS tld,
           source AS subdomain,
           'example' AS domain_no_tld,
           COUNT(*) AS cnt
    FROM documents
    GROUP BY source
    """,
    doc="ffaup URL decomposition (ref: contrib/ffaup/ffaup.c:306-315) "
        "over synthesized URLs.",
)
def faup_url_decompose(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/p?q=1"))
    df = docs.select("source", url.alias("u"))
    return df.groupBy(
        "source",
        rf.faup_scheme("u").alias("scheme"),
        rf.faup_host("u").alias("host"),
        rf.faup_domain("u").alias("domain"),
        rf.faup_tld("u").alias("tld"),
        rf.faup_subdomain("u").alias("subdomain"),
        rf.faup_domain_without_tld("u").alias("domain_no_tld"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "ruleset_route_fanout",
    """
    WITH ev AS (
      SELECT event_id % 8 AS sev, user_id % 24 AS fac, event_type
      FROM events
    ), routed AS (
      SELECT CASE WHEN sev <= 3 THEN 'errors'
                  WHEN fac = 2 THEN 'mail'
                  ELSE 'catchall' END AS action_name,
             CASE WHEN sev <= 3 THEN 'sev-route'
                  WHEN fac = 2 THEN 'mail-route'
                  ELSE 'default' END AS route,
             event_type
      FROM ev
    )
    SELECT action_name, route, event_type, COUNT(*) AS cnt
    FROM routed
    GROUP BY 1, 2, 3
    """,
    doc="Ruleset statement-list compilation: if/set/stop + PRI filter "
        "+ action fan-out as one narrow-transform DAG (ref: "
        "runtime/ruleset.c:536-598; plans/ruleset.py). Each action's "
        "DataFrame shares the scan; no shuffle before the final agg.",
)
def ruleset_route_fanout(spark, sf_dir):
    from rsyslog_spark.plans import (
        Action, If, PriFilt, Ruleset, RulesetEngine, Set, Stop, varname,
    )

    ev = load(spark, sf_dir, "events").select(
        (F.col("event_id") % 8).cast("int").alias("syslogseverity"),
        (F.col("user_id") % 24).cast("int").alias("syslogfacility"),
        "event_type",
    )
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Set("$.route", F.lit("default")),
        If(F.col("syslogseverity") <= 3, then=[
            Set("$.route", F.lit("sev-route")),
            Action("errors"),
            Stop(),
        ]),
        PriFilt("mail.*", then=[
            Set("$.route", F.lit("mail-route")),
            Action("mail"),
            Stop(),
        ]),
        Action("catchall"),
    ])])
    actions, _ = eng.run(ev)
    route = varname("$.route")
    parts = [
        df.select(F.lit(name).alias("action_name"),
                  F.col(route).alias("route"), "event_type")
        for name, df in actions
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("action_name", "route", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@q(
    "property_replacer_battery",
    """
    SELECT substr(event_type || ' code=' || CAST(event_id % 100 AS VARCHAR), 1, 3)
               AS head3,
           COALESCE(NULLIF(regexp_extract(
               event_type || ' code=' || CAST(event_id % 100 AS VARCHAR),
               'code=([0-9]+)', 1), ''), '0') AS code,
           split_part(event_type || ' code=' || CAST(event_id % 100 AS VARCHAR),
                      ' ', 1) AS f1,
           upper(event_type) AS etype_uc,
           strftime(ts, '%Y%m%d%H%M%S') AS ts_mysql,
           CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) AS ts_unix,
           rpad(substr(event_type, 1, 10), 10, ' ') AS etype_fw,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3, 4, 5, 6, 7
    """,
    doc="Template property-replacer options end-to-end "
        "(ref: template.h:97-182, property_replacer.rst): substring "
        "from/to, regex extract w/ nomatch=zero, field extraction, "
        "case conversion, MySQL + unix-ts date formats, fixed width.",
)
def property_replacer_battery(spark, sf_dir):
    from rsyslog_spark.templates import Prop

    ev = load(spark, sf_dir, "events")
    msg = F.concat(F.col("event_type"), F.lit(" code="),
                   (F.col("event_id") % 100).cast("string"))
    df = ev.select(msg.alias("msg"), "event_type", "ts")
    return df.select(
        Prop("msg", frm=1, to=3).col().alias("head3"),
        Prop("msg", regex=r"code=([0-9]+)", regex_submatch=1,
             regex_nomatch="zero").col().alias("code"),
        Prop("msg", field_delim=" ", field_num=1).col().alias("f1"),
        Prop("event_type", case="upper").col().alias("etype_uc"),
        Prop("ts", date_format="mysql").col().alias("ts_mysql"),
        Prop("ts", date_format="unixtimestamp").col().alias("ts_unix"),
        Prop("event_type", frm=1, to=10,
             fixed_width=True).col().alias("etype_fw"),
    ).groupBy("head3", "code", "f1", "etype_uc", "ts_mysql", "ts_unix",
              "etype_fw").agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "json_tree_battery",
    """
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           CAST(SUM(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k_mm,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_parsed
    FROM events GROUP BY event_type
    """,
    doc="$! JSON tree, two access paths cross-checked on one frame: "
        "(a) Spark 4 VARIANT — parse_json once, variant_get per path "
        "(ref: runtime/msg.c:240,3099 jsonPathFindParent/"
        "getJSONPropVal; SURVEY §1.1 json column; amortizes repeated "
        "deep access vs get_json_object re-parsing per path) and "
        "(b) the mmjsonparse operator (CEE/JSON payload -> $! tree, "
        "ref: plugins/mmjsonparse/mmjsonparse.c) with json_get field "
        "extraction.",
)
def json_tree_battery(spark, sf_dir):
    from rsyslog_spark.operators.mm import mmjsonparse

    ev = load(spark, sf_dir, "events")
    parsed = mmjsonparse(ev, msg_col="props", out_col="cee")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "long")
    kmm = rf.json_get("cee", "k")
    return parsed.select(
        "event_type", k.alias("k"), kmm.alias("kmm_s"),
        rf.json_get_num("cee", "k").alias("kmm_n"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("long")
        .alias("n_big"),
        F.sum("kmm_n").cast("long").alias("sum_k_mm"),
        F.count("kmm_s").cast("long").alias("n_parsed"),
    )


@q(
    "imkafka_split_records",
    """
    WITH src AS (
      SELECT event_id FROM events WHERE event_id % 37 = 0
    ), expanded AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN NULL
                  ELSE event_id END AS n
      FROM src
      UNION ALL
      SELECT event_id + 1 AS n FROM src WHERE event_id % 2 <> 0
    )
    SELECT CAST(n % 7 AS BIGINT) AS bucket,
           COUNT(*) AS cnt,
           CAST(SUM(n) AS BIGINT) AS total
    FROM expanded GROUP BY 1
    """,
    doc="imkafka split.json.records (ref: plugins/imkafka/imkafka.c "
        "splitJsonRecords:446-556; goldens imkafka-json-split-*.sh): "
        "{'records':[...]} payloads fan out one message per element "
        "(compact re-serialization), unparseable payloads forward "
        "as-is (NULL bucket). Pure variant-parse + explode — "
        "a narrow per-row transform, no shuffle before the final "
        "partial-agg; at 100 TB the fan-out multiplies rows inside "
        "the scan stage without a repartition.",
)
def imkafka_split_records(spark, sf_dir):
    from rsyslog_spark.streaming.sources import split_json_records

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_id") % 37 == 0)
    eid = F.col("event_id")
    line = F.when(
        eid % 2 == 0, F.lit("not json")
    ).otherwise(F.concat(
        F.lit('{"records":[{"n":'), eid.cast("string"),
        F.lit('},{"n":'), (eid + 1).cast("string"), F.lit("}]}")))
    out = split_json_records(ev.select(line.alias("line")))
    n = F.get_json_object("line", "$.n").cast("long")
    return (out.select(n.alias("n"))
            .groupBy((F.col("n") % 7).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("n").alias("total")))


@q(
    "timestamp_render_battery",
    """
    WITH w AS (
      SELECT ts,
             event_id % 3 AS prec,
             CAST(isoyear(ts) AS BIGINT) AS wky,
             lpad(CAST(week(ts) AS VARCHAR), 2, '0') AS wk
      FROM events
    ), r AS (
      SELECT wky, wk,
             strftime(ts, '%Y-%m-%dT%H:%M:%S')
               || CASE WHEN prec = 1
                       THEN '.' || substr(strftime(ts, '%f'), 1, 3)
                       WHEN prec = 2
                       THEN '.' || strftime(ts, '%f')
                       ELSE '' END
               || 'Z' AS rfc3339,
             CAST(floor(epoch(ts)) AS BIGINT) AS ux,
             lpad(CAST(dayofyear(ts) AS VARCHAR), 3, '0') AS ord,
             CASE WHEN prec = 1 THEN substr(strftime(ts, '%f'), 1, 3)
                  WHEN prec = 2 THEN strftime(ts, '%f')
                  ELSE '0' END AS ss,
             strftime(ts, '%Y%m%d%H%M%S') AS my
      FROM w
    )
    SELECT wky, wk, COUNT(*) AS cnt,
           MIN(rfc3339) AS rfc_min, MAX(rfc3339) AS rfc_max,
           MIN(ux) AS ux_min, MAX(ux) AS ux_max,
           MIN(ord) AS ord_min, MAX(ord) AS ord_max,
           MAX(ss) AS ss_max, MIN(my) AS my_min
    FROM r GROUP BY wky, wk
    """,
    doc="Timestamp render battery: events.ts re-rendered as RFC5424 "
        "wire lines at THREE wire precisions (none/.SSS/.SSSSSS), "
        "parsed back, then rendered through date-rfc3339 (wire-exact "
        "'Z' + parsed-precision fraction), date-unixtimestamp, "
        "date-iso-week{,-year} (getISOWeek Thursday rule), "
        "date-ordinal (3-digit), date-subseconds, date-mysql — "
        "grouped by ISO week (ref: runtime/datetime.c "
        "formatTimestamp3339/getISOWeek; tests/timestamp-*.sh, "
        "timegenerated-*.sh).",
)
def timestamp_render_battery(spark, sf_dir):
    from rsyslog_spark.templates import compile_template_string

    ev = load(spark, sf_dir, "events")
    ts = F.col("ts")
    us = F.date_format(ts, "SSSSSS")
    base = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    prec = (F.col("event_id") % 3).cast("int")
    frac = (F.when(prec == 1,
                   F.concat(F.lit("."), F.substring(us, 1, 3)))
            .when(prec == 2, F.concat(F.lit("."), us))
            .otherwise(F.lit("")))
    line = F.concat(F.lit("<34>1 "), base, frac, F.lit("Z"),
                    F.lit(" host app - ID47 - msgnum"))
    parsed = parse_syslog(ev.select(line.alias("line")))

    def render(tpl):
        return compile_template_string(tpl).col(parsed)

    r = parsed.select(
        render("%timestamp:::date-iso-week-year%").cast("long")
        .alias("wky"),
        render("%timestamp:::date-iso-week%").alias("wk"),
        render("%timestamp:::date-rfc3339%").alias("rfc3339"),
        render("%timestamp:::date-unixtimestamp%").cast("long")
        .alias("ux"),
        render("%timestamp:::date-ordinal%").alias("ord"),
        render("%timestamp:::date-subseconds%").alias("ss"),
        render("%timestamp:::date-mysql%").alias("my"),
    )
    return r.groupBy("wky", "wk").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("rfc3339").alias("rfc_min"),
        F.max("rfc3339").alias("rfc_max"),
        F.min("ux").alias("ux_min"), F.max("ux").alias("ux_max"),
        F.min("ord").alias("ord_min"), F.max("ord").alias("ord_max"),
        F.max("ss").alias("ss_max"), F.min("my").alias("my_min"),
    )

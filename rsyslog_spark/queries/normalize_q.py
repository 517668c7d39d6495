"""Queries for the normalize/grok/vendor-parse operator family.

Same roundtrip pattern as queries/core.py: render wire-format lines
from the events table with Column expressions, push them through the
operator under test, aggregate; the DuckDB oracle recomputes the
aggregate directly from the events columns, so a parse bug cannot
cancel out.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark.operators.grok import mmgrok
from rsyslog_spark.operators.normalize import normalize
from rsyslog_spark.parsers.vendors import (
    mmleefparse, pmaixforwardedfrom, pmcisconames, pmpanngfw, pmsnare,
)
from rsyslog_spark.operators.mm import mmrm1stspace, mmtaghostname, mmutf8fix
from rsyslog_spark.plans.ruleset import Action, Foreach, Ruleset, RulesetEngine
from rsyslog_spark.queries import Query, load

QUERIES: list[Query] = []


def q(name, oracle, doc=""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn
    return deco


_NORM_RB = """
version=2
rule=login:user u%user:number% logged in from %ip:ipv4% port %port:number%
rule=logout:user u%user:number% logged out after %secs:number% seconds
"""


@q(
    "mmnormalize_extract",
    """
    SELECT CASE WHEN event_id % 2 = 0 THEN 'login' ELSE 'logout' END
               AS event_tag,
           COUNT(*) AS cnt,
           CAST(SUM(CASE WHEN event_id % 2 = 0 THEN event_id % 100 END)
                AS BIGINT) AS sum_port,
           CAST(SUM(CASE WHEN event_id % 2 = 1 THEN event_id % 1000 END)
                AS BIGINT) AS sum_secs
    FROM events GROUP BY 1
    """,
    doc="mmnormalize: liblognorm rulebase compiled to regex dispatch "
        "(ref: plugins/mmnormalize/mmnormalize.c; first-match-wins, "
        "typed captures).",
)
def mmnormalize_extract(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id")
    eid = F.col("event_id")
    line = F.when(
        eid % 2 == 0,
        F.concat(F.lit("user u"), uid.cast("string"),
                 F.lit(" logged in from 10.0."),
                 (uid % 256).cast("string"), F.lit("."),
                 (eid % 256).cast("string"), F.lit(" port "),
                 (eid % 100).cast("string")),
    ).otherwise(
        F.concat(F.lit("user u"), uid.cast("string"),
                 F.lit(" logged out after "),
                 (eid % 1000).cast("string"), F.lit(" seconds")),
    )
    msgs = ev.select(line.alias("msg"))
    out = normalize(msgs, _NORM_RB)
    return out.groupBy("event_tag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("port").cast("long").alias("sum_port"),
        F.sum("secs").cast("long").alias("sum_secs"),
    )


@q(
    "mmgrok_access_log",
    """
    SELECT event_type AS method,
           COUNT(*) AS cnt,
           CAST(SUM(event_id % 1000) AS BIGINT) AS sum_bytes
    FROM events GROUP BY event_type
    """,
    doc="mmgrok: grok dictionary expansion to one compiled regex "
        "(ref: contrib/mmgrok/mmgrok.c); typed :int capture.",
)
def mmgrok_access_log(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    line = F.concat(
        F.lit("10."), (F.col("user_id") % 128).cast("string"),
        F.lit(".0."), (F.col("event_id") % 256).cast("string"),
        F.lit(" - "), F.col("event_type"), F.lit(" "),
        (F.col("event_id") % 1000).cast("string"),
    )
    msgs = ev.select(line.alias("msg"))
    out = mmgrok(msgs,
                 r"%{IPV4:client} - %{WORD:method} %{NUMBER:bytes:int}")
    return (
        out.filter(F.col("grok_matched"))
        .groupBy(F.col("method"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("bytes").cast("long").alias("sum_bytes"))
    )


@q(
    "mmleefparse_fields",
    """
    SELECT CAST(event_id % 50 AS VARCHAR) AS leef_event_id,
           COUNT(*) AS cnt,
           CAST(SUM(event_id % 10) AS BIGINT) AS sum_sev
    FROM events GROUP BY 1
    """,
    doc="mmleefparse: LEEF header + tab-separated k=v extensions "
        "into header columns + fields map (ref: plugins/mmleefparse/"
        "mmleefparse.c:249-310).",
)
def mmleefparse_fields(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    line = F.concat(
        F.lit("LEEF:2.0|Vendor|Product|1.0|"),
        (F.col("event_id") % 50).cast("string"),
        F.lit("|src=10.0.0."), (F.col("user_id") % 200).cast("string"),
        F.lit("\tsev="), (F.col("event_id") % 10).cast("string"),
        F.lit("\tmsg=payload"),
    )
    msgs = ev.select(line.alias("msg"))
    out = mmleefparse(msgs)
    return out.groupBy("leef_event_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.element_at("leef_fields", "sev").cast("long"))
        .alias("sum_sev"),
    )


@q(
    "vendor_cleanup_battery",
    """
    SELECT CAST(SUM(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_snare,
           CAST(SUM(CASE WHEN event_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_aix,
           CAST(SUM(CASE WHEN event_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cisco,
           CAST(SUM(CASE WHEN event_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_pan,
           COUNT(DISTINCT CASE WHEN event_id % 4 IN (1, 2)
                 THEN 'h' || CAST(user_id % 10 AS VARCHAR) END) AS n_hosts
    FROM events
    """,
    doc="pmsnare + pmaixforwardedfrom + pmcisconames + pmpanngfw "
        "cleanup chain over a mixed stream; each stage detects only "
        "its own shape (ref: contrib/pm*/).",
)
def vendor_cleanup_battery(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    host = F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"))
    line = (
        F.when(eid % 4 == 0, F.concat(
            host, F.lit("\tMSWinEventLog\t1\tSecurity\t"),
            eid.cast("string")))
        .when(eid % 4 == 1, F.concat(
            F.lit("Message forwarded from "), host, F.lit(": payload "),
            F.col("event_type")))
        .when(eid % 4 == 2, F.concat(
            F.lit("Mar  1 01:02:03 "), host, F.lit(" : %ASA-1-101001: "),
            F.col("event_type")))
        .otherwise(F.concat(
            F.lit("1,2026/08/13 10:00:00,0011C103117,TRAFFIC,end,\"a,b\","),
            F.col("event_type")))
    )
    msgs = ev.select(line.alias("msg"),
                     F.lit(None).cast("string").alias("hostname"))
    out = pmpanngfw(pmcisconames(pmaixforwardedfrom(pmsnare(msgs))))
    return out.agg(
        F.sum(F.col("snare_detected").cast("long")).alias("n_snare"),
        F.sum((F.col("hostname").isNotNull()
               & F.col("msg").startswith("payload")).cast("long"))
        .alias("n_aix"),
        F.sum(F.col("msg").startswith("%ASA-").cast("long"))
        .alias("n_cisco"),
        F.sum(F.col("pan_type").isNotNull().cast("long")).alias("n_pan"),
        F.countDistinct("hostname").alias("n_hosts"),
    )


@q(
    "mm_fixups",
    """
    SELECT 'h' || CAST(user_id % 10 AS VARCHAR) AS hostname,
           COUNT(*) AS cnt,
           CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fixed
    FROM events GROUP BY 1
    """,
    doc="mmrm1stspace (erroneous leading space drop, ref: plugins/"
        "mmrm1stspace) + mmtaghostname (ref: contrib/mmtaghostname) "
        "over a rendered stream.",
)
def mm_fixups(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    had_space = F.col("event_id") % 2 == 0
    msg = F.when(had_space, F.concat(F.lit(" "), F.col("event_type"))) \
        .otherwise(F.col("event_type"))
    host = F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"))
    df = ev.select("event_id", msg.alias("msg"), host.alias("fromhost"),
                   F.lit(None).cast("string").alias("hostname"),
                   F.lit("tag:").alias("syslogtag"))
    fixed = mmtaghostname(mmutf8fix(mmrm1stspace(df)),
                          hostname=F.col("fromhost"))
    was_fixed = (F.col("event_id") % 2 == 0) \
        & ~F.col("msg").startswith(" ")
    return fixed.groupBy("hostname").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(was_fixed.cast("long")).alias("n_fixed"),
    )


@q(
    "foreach_explode_sum",
    """
    SELECT event_type,
           COUNT(*) AS n_elems,
           CAST(SUM(c) AS BIGINT) AS sum_c
    FROM (SELECT event_type,
                 UNNEST([event_id % 5, user_id % 7, 3]) AS c
          FROM events) t
    GROUP BY event_type
    """,
    doc="foreach ($.c in ARRAY) statement: explode the collection, "
        "body sees one row per element (ref: runtime/ruleset.c:"
        "310-401 execForeach*).",
)
def foreach_explode_sum(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    arr = F.array(F.col("event_id") % 5, F.col("user_id") % 7, F.lit(3))
    rs = Ruleset("main", [
        Foreach(var="$.c", array=arr, body=[
            Action("out"),
        ]),
    ])
    eng = RulesetEngine([rs])
    actions, _ = eng.run(ev, "main")
    exploded = dict(actions)["out"]
    return exploded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_elems"),
        F.sum(F.col("local_c").cast("long")).alias("sum_c"),
    )


@q(
    "multiline_reassembly",
    """
    WITH lines AS (
      SELECT CAST(event_id % 8 AS BIGINT) AS f,
             event_id AS line_no,
             CASE WHEN event_id % 3 = 0
                  THEN 'START ' || event_type
                  ELSE '  cont ' || CAST(event_id % 7 AS VARCHAR) END AS line
      FROM events
    ), tagged AS (
      SELECT f, line_no, line,
             SUM(CASE WHEN line LIKE 'START %' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY f ORDER BY line_no
                       ROWS UNBOUNDED PRECEDING) AS msg_seq
      FROM lines
    )
    SELECT f AS srcfile_bucket,
           COUNT(*) AS n_msgs,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines,
           CAST(SUM(length(line)) AS BIGINT) AS total_chars
    FROM (SELECT f, msg_seq,
                 COUNT(*) AS n_lines,
                 string_agg(line, chr(10) ORDER BY line_no) AS line
          FROM tagged WHERE msg_seq > 0
          GROUP BY f, msg_seq) m
    GROUP BY f
    """,
    doc="imfile multiline readMode (startmsg.regex) as a windowed "
        "reassembly: running count of start-lines per file assigns "
        "continuations, order preserved inside the group (ref: "
        "plugins/imfile/imfile.c:382-416; SURVEY hard-part 5).",
)
def multiline_reassembly(spark, sf_dir):
    from rsyslog_spark.streaming.sources import reassemble_multiline

    ev = load(spark, sf_dir, "events")
    lines = ev.select(
        (F.col("event_id") % 8).cast("long").alias("srcfile"),
        F.col("event_id").alias("line_no"),
        F.when(F.col("event_id") % 3 == 0,
               F.concat(F.lit("START "), F.col("event_type")))
        .otherwise(F.concat(F.lit("  cont "),
                            (F.col("event_id") % 7).cast("string")))
        .alias("line"),
    )
    msgs = reassemble_multiline(lines, r"^START ")
    return msgs.groupBy(F.col("srcfile").alias("srcfile_bucket")).agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum("n_lines").cast("long").alias("n_lines"),
        F.sum(F.length("line")).cast("long").alias("total_chars"),
    )


_DEMO_CONF = r"""
ruleset(name="main") {
    set $.route = "default";
    if $syslogseverity <= 3 and $msg contains "error" then {
        set $.route = "err";
        action(type="omfile" name="errors")
        stop
    }
    if prifilt("mail.*") then {
        set $.route = "mail";
        action(type="omfile" name="maillog")
        stop
    }
    :programname, startswith, "app1" action(type="omfile" name="app1log")
    action(type="omfile" name="catchall")
}
"""


@q(
    "config_driven_routing",
    """
    WITH frame AS (
      SELECT CAST(event_id % 8 AS INT) AS sev,
             CAST(user_id % 24 AS INT) AS fac,
             'app' || CAST(user_id % 5 AS VARCHAR) AS prog,
             event_type || ' code=' || CAST(event_id % 100 AS VARCHAR) AS msg
      FROM events
    )
    SELECT action_name, route, COUNT(*) AS cnt FROM (
      SELECT CASE WHEN sev <= 3 AND msg LIKE '%error%' THEN 'errors'
                  WHEN fac = 2 THEN 'maillog' END AS action_name,
             CASE WHEN sev <= 3 AND msg LIKE '%error%' THEN 'err'
                  WHEN fac = 2 THEN 'mail' END AS route
      FROM frame
      WHERE (sev <= 3 AND msg LIKE '%error%') OR fac = 2
      UNION ALL
      SELECT 'app1log', 'default' FROM frame
      WHERE NOT (sev <= 3 AND msg LIKE '%error%') AND fac <> 2
        AND prog LIKE 'app1%'
      UNION ALL
      SELECT 'catchall', 'default' FROM frame
      WHERE NOT (sev <= 3 AND msg LIKE '%error%') AND fac <> 2
    ) t GROUP BY action_name, route
    """,
    doc="THE parity demo: an actual rsyslog.conf (RainerScript v2 "
        "subset — ruleset/if/set/stop/prifilt/property-filter/"
        "action) parsed by config/rainerscript.py, compiled to a "
        "DataFrame DAG, run against a rendered frame; the oracle "
        "recomputes the routing in SQL (ref: grammar/grammar.y, "
        "runtime/ruleset.c scriptExec).",
)
def config_driven_routing(spark, sf_dir):
    from rsyslog_spark.config.rainerscript import load_config
    from rsyslog_spark.plans.ruleset import varname

    ev = load(spark, sf_dir, "events")
    frame = ev.select(
        (F.col("event_id") % 8).cast("int").alias("syslogseverity"),
        (F.col("user_id") % 24).cast("int").alias("syslogfacility"),
        F.concat(F.lit("app"), (F.col("user_id") % 5).cast("string"))
        .alias("programname"),
        F.concat(F.col("event_type"), F.lit(" code="),
                 (F.col("event_id") % 100).cast("string")).alias("msg"),
    )
    eng, _cfg = load_config(_DEMO_CONF)
    actions, _ = eng.run(frame, "main")
    route = varname("$.route")
    parts = [df.select(F.lit(name).alias("action_name"),
                       F.col(route).alias("route"))
             for name, df in actions]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("action_name", "route").agg(
        F.count(F.lit(1)).alias("cnt"))


@q(
    "mmaudit_records",
    """
    SELECT 'T' || CAST(event_id % 3 AS VARCHAR) AS audit_type,
           COUNT(*) AS cnt,
           CAST(SUM(event_id % 7) AS BIGINT) AS sum_uid,
           CAST(MAX(event_id % 1000) AS BIGINT) AS max_seq
    FROM events GROUP BY 1
    """,
    doc="mmaudit: type=..msg=audit(ts:seq): k=v normalization into "
        "header columns + field map (ref: plugins/mmaudit/"
        "mmaudit.c:164-259).",
)
def mmaudit_records(spark, sf_dir):
    from rsyslog_spark.operators.mm import mmaudit

    ev = load(spark, sf_dir, "events")
    line = F.concat(
        F.lit("type=T"), (F.col("event_id") % 3).cast("string"),
        F.lit(" msg=audit(1407923239.775:"),
        (F.col("event_id") % 1000).cast("string"),
        F.lit("): uid="), (F.col("event_id") % 7).cast("string"),
        F.lit(' exe="/bin/app"'),
    )
    out = mmaudit(ev.select(line.alias("msg")))
    return out.groupBy("audit_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.element_at("audit_fields", "uid").cast("long"))
        .alias("sum_uid"),
        F.max("audit_seq").alias("max_seq"),
    )

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
    "vendor_kv_battery",
    """
    SELECT 'leef' AS kind,
           CAST(event_id % 50 AS VARCHAR) AS key,
           COUNT(*) AS cnt,
           CAST(SUM(event_id % 10) AS BIGINT) AS m1,
           CAST(NULL AS BIGINT) AS m2
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'audit' AS kind,
           'T' || CAST(event_id % 3 AS VARCHAR) AS key,
           COUNT(*) AS cnt,
           CAST(SUM(event_id % 7) AS BIGINT) AS m1,
           CAST(MAX(event_id % 1000) AS BIGINT) AS m2
    FROM events GROUP BY 2
    """,
    doc="Key=value vendor parsers on one union: mmleefparse — LEEF "
        "header + tab-separated k=v extensions into header columns + "
        "fields map (ref: plugins/mmleefparse/mmleefparse.c:249-310) "
        "— and mmaudit — type=..msg=audit(ts:seq): k=v normalization "
        "into header columns + field map (ref: plugins/mmaudit/"
        "mmaudit.c:164-259).",
)
def vendor_kv_battery(spark, sf_dir):
    from rsyslog_spark.operators.mm import mmaudit

    ev = load(spark, sf_dir, "events")
    leef_line = F.concat(
        F.lit("LEEF:2.0|Vendor|Product|1.0|"),
        (F.col("event_id") % 50).cast("string"),
        F.lit("|src=10.0.0."), (F.col("user_id") % 200).cast("string"),
        F.lit("\tsev="), (F.col("event_id") % 10).cast("string"),
        F.lit("\tmsg=payload"),
    )
    leef = mmleefparse(ev.select(leef_line.alias("msg"))).groupBy(
        F.col("leef_event_id").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.element_at("leef_fields", "sev").cast("long")).alias("m1"),
        F.lit(None).cast("long").alias("m2"),
    )

    audit_line = F.concat(
        F.lit("type=T"), (F.col("event_id") % 3).cast("string"),
        F.lit(" msg=audit(1407923239.775:"),
        (F.col("event_id") % 1000).cast("string"),
        F.lit("): uid="), (F.col("event_id") % 7).cast("string"),
        F.lit(' exe="/bin/app"'),
    )
    audit = mmaudit(ev.select(audit_line.alias("msg"))).groupBy(
        F.col("audit_type").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.element_at("audit_fields", "uid").cast("long")).alias("m1"),
        F.max("audit_seq").cast("long").alias("m2"),
    )

    return (
        leef.select(F.lit("leef").alias("kind"), "key", "cnt", "m1", "m2")
        .unionByName(audit.select(F.lit("audit").alias("kind"), "key",
                                  "cnt", "m1", "m2"))
    )


@q(
    "vendor_cleanup_battery",
    """
    SELECT 'cleanup' AS part, CAST(NULL AS VARCHAR) AS key,
           CAST(SUM(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN event_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
           CAST(SUM(CASE WHEN event_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
           CAST(SUM(CASE WHEN event_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
           COUNT(DISTINCT CASE WHEN event_id % 4 IN (1, 2)
                 THEN 'h' || CAST(user_id % 10 AS VARCHAR) END) AS c5
    FROM events
    UNION ALL
    SELECT 'fixups' AS part, 'h' || CAST(user_id % 10 AS VARCHAR) AS key,
           COUNT(*) AS c1,
           CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS c2,
           CAST(NULL AS BIGINT) AS c3, CAST(NULL AS BIGINT) AS c4,
           CAST(NULL AS BIGINT) AS c5
    FROM events GROUP BY 2
    """,
    doc="Vendor cleanup + fixup chains on one union: (cleanup) "
        "pmsnare + pmaixforwardedfrom + pmcisconames + pmpanngfw over "
        "a mixed stream, each stage detecting only its own shape "
        "(ref: contrib/pm*/) — c1..c5 = n_snare/n_aix/n_cisco/n_pan/"
        "n_hosts; (fixups) mmrm1stspace erroneous-leading-space drop "
        "(ref: plugins/mmrm1stspace) + mmutf8fix + mmtaghostname "
        "(ref: contrib/mmtaghostname) — c1=cnt, c2=n_fixed per host.",
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
    cleanup = out.agg(
        F.sum(F.col("snare_detected").cast("long")).alias("c1"),
        F.sum((F.col("hostname").isNotNull()
               & F.col("msg").startswith("payload")).cast("long"))
        .alias("c2"),
        F.sum(F.col("msg").startswith("%ASA-").cast("long"))
        .alias("c3"),
        F.sum(F.col("pan_type").isNotNull().cast("long")).alias("c4"),
        F.countDistinct("hostname").alias("c5"),
    ).select(F.lit("cleanup").alias("part"),
             F.lit(None).cast("string").alias("key"),
             "c1", "c2", "c3", "c4", "c5")

    had_space = eid % 2 == 0
    fx_msg = F.when(had_space, F.concat(F.lit(" "), F.col("event_type"))) \
        .otherwise(F.col("event_type"))
    fx = ev.select("event_id", fx_msg.alias("msg"),
                   host.alias("fromhost"),
                   F.lit(None).cast("string").alias("hostname"),
                   F.lit("tag:").alias("syslogtag"))
    fixed = mmtaghostname(mmutf8fix(mmrm1stspace(fx)),
                          hostname=F.col("fromhost"))
    was_fixed = (F.col("event_id") % 2 == 0) \
        & ~F.col("msg").startswith(" ")
    fixups = fixed.groupBy(F.col("hostname").alias("key")).agg(
        F.count(F.lit(1)).alias("c1"),
        F.sum(was_fixed.cast("long")).alias("c2"),
    ).select(F.lit("fixups").alias("part"), "key", "c1", "c2",
             F.lit(None).cast("long").alias("c3"),
             F.lit(None).cast("long").alias("c4"),
             F.lit(None).cast("long").alias("c5"))

    return cleanup.unionByName(fixups)


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


_FN_CONF = r"""
template(name="greet" type="string" string="hi %hostname%")
ruleset(name="even") { set $.tag = "E"; action(type="omfile" name="out_even") }
ruleset(name="odd")  { set $.tag = "O"; action(type="omfile" name="out_odd") }
ruleset(name="main") {
    set $.b = b64_decode("d29yZA==");
    set $.t = format_time(1723500000, "date-rfc3339");
    set $.rt = parse_time($.t);
    set $.env = getenv("SPARK_GRAFT_NOT_SET_ENV", "dflt");
    set $.z = hash64mod($msg, 1);
    set $.r = random(1);
    set $.g = exec_template("greet");
    foreach ($.w in split($msg, " ")) do { set $.lastw = $.w; }
    if $syslogseverity % 2 == 0 then { set $.route = "even"; }
    else { set $.route = "odd"; }
    call_indirect $.route;
}
"""


@q(
    "config_functions_battery",
    """
    WITH frame AS (
      SELECT event_id % 2 AS par,
             'h' || CAST(user_id % 10 AS VARCHAR) AS host,
             'code=' || CAST(event_id % 100 AS VARCHAR) AS lastw
      FROM events
    )
    SELECT CASE WHEN par = 0 THEN 'E' ELSE 'O' END AS tag,
           'word' AS b,
           strftime(make_timestamp(1723500000000000),
                    '%Y-%m-%dT%H:%M:%S') || '+00:00' AS t,
           CAST(1723500000 AS BIGINT) AS rt,
           'dflt' AS env,
           CAST(0 AS BIGINT) AS z,
           CAST(0 AS BIGINT) AS r,
           'hi ' || host AS g,
           lastw,
           COUNT(*) AS cnt
    FROM frame GROUP BY 1, 8, 9
    """,
    doc="Config-compiled function registry battery: an rsyslog.conf "
        "whose expressions call b64_decode, format_time, parse_time "
        "(roundtrip), getenv (default fallback), hash64mod, random, "
        "exec_template, and split — plus foreach over the split "
        "result (last-iteration variable carry, ref: runtime/"
        "ruleset.c:310-401) and call_indirect routing on a computed "
        "ruleset name (ref: grammar/rainerscript.h:112-181 "
        "S_CALL_INDIRECT; runtime/ruleset.c:236-275; function "
        "registry grammar/rainerscript.c:4467-4510). hash64mod(x,1) "
        "and random(1) are identically 0, which keeps the xxhash64/"
        "rand calls oracle-checkable.",
)
def config_functions_battery(spark, sf_dir):
    from rsyslog_spark.config.rainerscript import load_config
    from rsyslog_spark.plans.ruleset import varname

    ev = load(spark, sf_dir, "events")
    frame = ev.select(
        (F.col("event_id") % 8).cast("int").alias("syslogseverity"),
        F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"))
        .alias("hostname"),
        F.concat(F.col("event_type"), F.lit(" code="),
                 (F.col("event_id") % 100).cast("string")).alias("msg"),
    )
    eng, _cfg = load_config(_FN_CONF)
    actions, _ = eng.run(frame, "main")
    parts = [
        df.select(
            F.col(varname("$.tag")).alias("tag"),
            F.col(varname("$.b")).alias("b"),
            F.col(varname("$.t")).alias("t"),
            F.col(varname("$.rt")).cast("long").alias("rt"),
            F.col(varname("$.env")).alias("env"),
            F.col(varname("$.z")).cast("long").alias("z"),
            F.col(varname("$.r")).cast("long").alias("r"),
            F.col(varname("$.g")).alias("g"),
            F.col(varname("$.lastw")).alias("lastw"),
        )
        for _name, df in actions
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(
        "tag", "b", "t", "rt", "env", "z", "r", "g", "lastw"
    ).agg(F.count(F.lit(1)).alias("cnt"))


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
    "mmaitag_classify",
    """
    SELECT doc_id,
           CASE WHEN lower(text) LIKE '%error%'
                  OR lower(text) LIKE '%fail%'
                  OR lower(text) LIKE '%denied%'
                  OR lower(text) LIKE '%attack%'
                THEN 'IMPORTANT' ELSE 'REGULAR' END AS aitag
    FROM documents WHERE doc_id < 400
    """,
    doc="mmaitag classification through the REAL provider bridge "
        "(Arrow pandas_udf batch contract, operators/mm.py mmaitag — "
        "ref plugins/mmaitag/mmaitag.c) with the deterministic stub "
        "classifier; the oracle reproduces the stub's keyword "
        "heuristic, so the Arrow round trip, batching, and the "
        "default label set are all pinned. The production path swaps "
        "in GeminiProvider (same callable contract, mock-server e2e "
        "tested).",
)
def mmaitag_classify(spark, sf_dir):
    from rsyslog_spark.operators.mm import mmaitag

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    out = mmaitag(docs.select("doc_id", F.col("text").alias("msg")))
    return out.select("doc_id", "aitag")


@q(
    "mmjsontransform_unflatten",
    """
    SELECT event_id,
           CASE WHEN user_id % 11 = 0 THEN
             '{"e":{"ty":"' || event_type || '","u":' || user_id
             || ',"s":{"q":' || event_id || '}}}'
           ELSE
             '{"e":{"ty":"' || event_type || '","u":' || user_id
             || ',"s":{"q":' || event_id || '}},"keep":1}'
           END AS unflat
    FROM events
    """,
    doc="mmjsontransform unflatten: dotted keys rebuild their "
        "nesting, dropKeys removes, renameRules renames during the "
        "rewrite (ref: plugins/mmjsontransform/mmjsontransform.c:"
        "63-66,116-192). Input JSON synthesized from events columns; "
        "the oracle builds the expected nested text directly, so the "
        "flatten→rename→drop→unflatten path is byte-pinned "
        "(json.dumps compact separators).",
)
def mmjsontransform_unflatten(spark, sf_dir):
    from rsyslog_spark.operators.mm import mmjsontransform

    ev = load(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        F.concat(
            F.lit('{"e.t":"'), F.col("event_type"),
            F.lit('","e.u":'), F.col("user_id").cast("string"),
            F.lit(',"e.s.q":'), F.col("event_id").cast("string"),
            F.lit(',"drop.me":1'),
            F.when(F.col("user_id") % 11 == 0, F.lit(""))
            .otherwise(F.lit(',"keep":1')),
            F.lit("}"),
        ).alias("json"),
    )
    out = mmjsontransform(
        src, input_col="json", output_col="unflat",
        drop_keys=["drop.me"], rename_rules={"e.t": "e.ty"})
    return out.select("event_id", "unflat")


@q(
    "mmaudit_parse",
    """
    SELECT event_id,
           CASE WHEN user_id % 7 = 0 THEN NULL ELSE 'SYSCALL' END
             AS audit_type,
           CASE WHEN user_id % 7 = 0 THEN NULL ELSE
             make_timestamp((1700000000 + event_id % 100000) * 1000000
                            + (event_id % 1000) * 1000)
           END AS audit_time,
           CASE WHEN user_id % 7 = 0 THEN NULL
                ELSE CAST(event_id AS BIGINT) END AS audit_seq,
           CASE WHEN user_id % 7 = 0 THEN NULL
                ELSE CAST(user_id AS VARCHAR) END AS uid,
           CASE WHEN user_id % 7 = 0 THEN NULL ELSE event_type END
             AS comm
    FROM events
    """,
    doc="mmaudit header + k=v field map (ref: plugins/mmaudit/"
        "mmaudit.c:164-259): type=..., msg=audit(SECS.MS:SEQ), "
        "quoted and bare values; non-audit rows yield NULLs (the "
        "reference leaves non-matching messages untouched). Lines "
        "synthesized from events; the oracle recomputes every field "
        "from the source columns.",
)
def mmaudit_parse(spark, sf_dir):
    from rsyslog_spark.operators.mm import mmaudit

    ev = load(spark, sf_dir, "events")
    secs = (F.lit(1700000000) + F.col("event_id") % 100000)
    msec = F.lpad((F.col("event_id") % 1000).cast("string"), 3, "0")
    audit_line = F.concat(
        F.lit("type=SYSCALL msg=audit("), secs.cast("string"),
        F.lit("."), msec, F.lit(":"), F.col("event_id").cast("string"),
        F.lit("): uid="), F.col("user_id").cast("string"),
        F.lit(' comm="'), F.col("event_type"), F.lit('"'),
    )
    src = ev.select(
        "event_id",
        F.when(F.col("user_id") % 7 == 0,
               F.concat(F.lit("plain message "),
                        F.col("event_id").cast("string")))
        .otherwise(audit_line).alias("msg"),
    )
    out = mmaudit(src)
    return out.select(
        "event_id", "audit_type", "audit_time",
        F.col("audit_seq").cast("long").alias("audit_seq"),
        F.col("audit_fields")["uid"].alias("uid"),
        F.col("audit_fields")["comm"].alias("comm"),
    )


@q(
    "mmsnmptrapd_rewrite",
    """
    SELECT event_id,
           CASE WHEN user_id % 3 = 0 OR user_id % 5 = 0
                THEN 'snmptrapd:'
                ELSE 'app[' || user_id || ']:' END AS syslogtag,
           CASE WHEN user_id % 3 = 0 OR user_id % 5 = 0
                THEN 'trap' || user_id
                ELSE 'h' || (user_id % 4) END AS hostname,
           CAST(CASE WHEN user_id % 3 = 0 THEN 4
                     ELSE user_id % 8 END AS BIGINT) AS severity
    FROM events
    """,
    doc="mmsnmptrapd tag rewrite (ref: plugins/mmsnmptrapd/"
        "mmsnmptrapd.c): tags shaped snmptrapd/severity/realhost: "
        "promote the trap's original host + severity and reduce the "
        "tag; unknown severity names still promote host/tag but keep "
        "the message severity; non-matching tags untouched.",
)
def mmsnmptrapd_rewrite(spark, sf_dir):
    from rsyslog_spark.operators.mm import mmsnmptrapd

    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id")
    tag = (
        F.when(uid % 3 == 0,
               F.concat(F.lit("snmptrapd/warning/trap"),
                        uid.cast("string"), F.lit(":")))
        .when(uid % 5 == 0,
              F.concat(F.lit("snmptrapd/bogus/trap"),
                       uid.cast("string"), F.lit(":")))
        .otherwise(F.concat(F.lit("app["), uid.cast("string"),
                            F.lit("]:"))))
    src = ev.select(
        "event_id",
        tag.alias("syslogtag"),
        F.concat(F.lit("h"), (uid % 4).cast("string"))
        .alias("hostname"),
        (uid % 8).cast("int").alias("syslogseverity"),
    )
    out = mmsnmptrapd(src)
    return out.select(
        "event_id", "syslogtag", "hostname",
        F.col("syslogseverity").cast("long").alias("severity"))


@q(
    "pmdb2diag_parse",
    """
    SELECT event_id,
           CASE WHEN user_id % 9 = 0 THEN NULL ELSE
             strptime(
               '2024-03-01-12.30.' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')
               || '.' || lpad(CAST(event_id % 1000000 AS VARCHAR), 6, '0'),
               '%Y-%m-%d-%H.%M.%S.%f')
           END AS db2_time,
           CASE WHEN user_id % 9 = 0 THEN NULL
                ELSE CASE user_id % 4 WHEN 0 THEN 'CRITICAL'
                     WHEN 1 THEN 'ERROR' WHEN 2 THEN 'WARNING'
                     ELSE 'INFO' END END AS db2_level,
           CAST(CASE WHEN user_id % 9 = 0 THEN NULL
                ELSE CASE user_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 3
                     WHEN 2 THEN 4 ELSE 6 END END AS BIGINT)
             AS db2_severity,
           CASE WHEN user_id % 9 = 0 THEN NULL
                ELSE CAST(user_id AS BIGINT) END AS db2_pid,
           CASE WHEN user_id % 9 = 0 THEN NULL
                ELSE CAST(event_id % 100 AS BIGINT) END AS db2_tid,
           CASE WHEN user_id % 9 = 0 THEN NULL
                ELSE 'db2sysc_' || event_type END AS db2_proc
    FROM events
    """,
    doc="pmdb2diag DB2 diagnostic-log parse (ref: contrib/pmdb2diag/"
        "pmdb2diag.c:96-176): microsecond timestamp, LEVEL token → "
        "severity map, PID/TID/PROC extraction; non-DB2 lines yield "
        "NULLs. Lines synthesized from events; oracle recomputes "
        "each field (strptime %f = microseconds, matching Spark's "
        "SSSSSS).",
)
def pmdb2diag_parse(spark, sf_dir):
    from rsyslog_spark.parsers.vendors import pmdb2diag

    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id")
    level = (F.when(uid % 4 == 0, "CRITICAL")
             .when(uid % 4 == 1, "ERROR")
             .when(uid % 4 == 2, "WARNING").otherwise("INFO"))
    line = F.concat(
        F.lit("2024-03-01-12.30."),
        F.lpad((F.col("event_id") % 60).cast("string"), 2, "0"),
        F.lit("."),
        F.lpad((F.col("event_id") % 1000000).cast("string"), 6, "0"),
        F.lit(" I123A45 LEVEL: "), level,
        F.lit(" PID : "), uid.cast("string"),
        F.lit(" TID : "), (F.col("event_id") % 100).cast("string"),
        F.lit(" PROC : db2sysc_"), F.col("event_type"),
    )
    src = ev.select(
        "event_id",
        F.when(uid % 9 == 0,
               F.concat(F.lit("not a db2 line "),
                        F.col("event_id").cast("string")))
        .otherwise(line).alias("msg"),
    )
    out = pmdb2diag(src)
    return out.select(
        "event_id", "db2_time",
        F.col("db2_level").alias("db2_level"),
        F.col("db2_severity").cast("long").alias("db2_severity"),
        "db2_pid", "db2_tid", "db2_proc")


@q(
    "imjournal_field_map",
    """
    SELECT event_id,
           'evt ' || event_type AS msg,
           CAST(user_id % 8 AS BIGINT) AS severity,
           CAST(3 AS BIGINT) AS facility,
           CASE WHEN user_id % 2 = 0 THEN 'comm' || (user_id % 10)
                ELSE 'ident' || (user_id % 10) END AS tag,
           'host' || (user_id % 5) AS hostname,
           CAST(user_id AS VARCHAR) AS procid,
           make_timestamp(1700000000000000 + event_id) AS timereported
    FROM events
    """,
    doc="imjournal journal-export field mapping (ref: plugins/"
        "imjournal/imjournal.c readJSONfromJournalMsg:434-470): "
        "MESSAGE/PRIORITY/SYSLOG_FACILITY/_HOSTNAME/_PID/"
        "__REALTIME_TIMESTAMP promotion and the SYSLOG_IDENTIFIER→"
        "_COMM tag fallback, exercised through the real export-entry "
        "text parse (journal_entry_map — the same path imjournal "
        "feeds).",
)
def imjournal_field_map(spark, sf_dir):
    from rsyslog_spark.streaming.bridges import journal_entry_map

    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id")
    nl = F.lit("\n")
    ident = (
        # odd user_ids carry SYSLOG_IDENTIFIER; even ones only _COMM
        # (exercises the reference's fallback)
        F.when(uid % 2 == 0,
               F.concat(F.lit("_COMM=comm"),
                        (uid % 10).cast("string")))
        .otherwise(F.concat(
            F.lit("SYSLOG_IDENTIFIER=ident"),
            (uid % 10).cast("string"), nl,
            F.lit("_COMM=comm"), (uid % 10).cast("string"))))
    entry = F.concat(
        F.lit("MESSAGE=evt "), F.col("event_type"), nl,
        F.lit("PRIORITY="), (uid % 8).cast("string"), nl,
        F.lit("SYSLOG_FACILITY=3"), nl,
        ident, nl,
        F.lit("_HOSTNAME=host"), (uid % 5).cast("string"), nl,
        F.lit("_PID="), uid.cast("string"), nl,
        F.lit("__REALTIME_TIMESTAMP="),
        (F.lit(1700000000000000) + F.col("event_id")).cast("string"),
    )
    src = ev.select("event_id", entry.alias("entry"))
    out = journal_entry_map(src, "entry")
    return out.select(
        "event_id", "msg",
        F.col("syslogseverity").cast("long").alias("severity"),
        F.col("syslogfacility").cast("long").alias("facility"),
        "tag", "hostname", "procid", "timereported")


@q(
    "imbeats_seq_metadata",
    """
    WITH src AS (
      SELECT event_id,
             CAST(user_id % 4 AS BIGINT) AS conn,
             event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id % 4
                                ORDER BY event_id) AS seq,
             COUNT(*) OVER (PARTITION BY user_id % 4) AS n_conn
      FROM events
    )
    SELECT event_id, conn, CAST(seq AS BIGINT) AS seq,
           'filebeat' AS beat,
           'evt ' || event_type AS message,
           'a' || CAST(user_id % 7 AS VARCHAR) AS agent_id,
           CASE WHEN CAST(CEIL(seq / 25.0) * 25 AS BIGINT) <= n_conn
                THEN CAST(CEIL(seq / 25.0) * 25 AS BIGINT)
           END AS ack_seq
    FROM src
    """,
    doc="imbeats lumberjack-v2 sequence + @metadata semantics (ref: "
        "plugins/imbeats/lj_parser.h frame types W/J/A; imbeats.c "
        "ACK timing — the server acks 2A+highest-seq once a full "
        "window of J frames landed; partial tail windows stay "
        "unacked until more data arrives). Payload JSON decodes "
        "through the REAL mmjsonparse path (imbeats emits the event "
        "JSON verbatim into `line` for downstream mmjsonparse, as "
        "the reference feeds its JSON decoder); seq/ack bookkeeping "
        "is per-connection window math (window=25). One window-fn "
        "pass partitioned by connection, no extra shuffle for the "
        "JSON reads.",
)
def imbeats_seq_metadata(spark, sf_dir):
    from pyspark.sql import Window

    from rsyslog_spark.functions.json_fns import tree_get
    from rsyslog_spark.operators.mm import mmjsonparse

    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id")
    conn = (uid % 4).cast("long")
    payload = F.concat(
        F.lit('{"@metadata":{"beat":"filebeat","version":"8.17"},'
              '"message":"evt '),
        F.col("event_type"),
        F.lit('","agent":{"id":"a'), (uid % 7).cast("string"),
        F.lit('"}}'))
    w = Window.partitionBy(conn).orderBy("event_id")
    src = ev.select(
        "event_id", conn.alias("conn"),
        payload.alias("msg"),
        F.row_number().over(w).cast("long").alias("seq"),
        F.count("*").over(Window.partitionBy(conn)).alias("n_conn"))
    parsed = mmjsonparse(src, msg_col="msg", out_col="json")
    full_win = (F.ceil(F.col("seq") / 25.0) * 25).cast("long")
    return parsed.select(
        "event_id", "conn", "seq",
        tree_get("json", "$!@metadata!beat").alias("beat"),
        tree_get("json", "$!message").alias("message"),
        tree_get("json", "$!agent!id").alias("agent_id"),
        F.when(full_win <= F.col("n_conn"), full_win).alias("ack_seq"))


@q(
    "impcap_l7_battery",
    """
    SELECT event_id,
           CASE WHEN event_id % 4 = 0 THEN 'GET' END AS http_method,
           CASE WHEN event_id % 4 = 0
                THEN '/p' || CAST(event_id AS VARCHAR) END AS http_uri,
           CASE WHEN event_id % 4 IN (0, 1) THEN 'HTTP/1.1'
           END AS http_version,
           CASE WHEN event_id % 4 = 1 THEN '200' END AS http_status,
           CASE WHEN event_id % 4 = 1 THEN 'OK' END AS http_reason,
           CASE WHEN event_id % 4 = 0
                THEN 'h' || CAST(user_id % 5 AS VARCHAR)
           END AS host_hdr,
           CASE WHEN event_id % 4 = 2
                THEN CAST(220 AS BIGINT) END AS ftp_response,
           CASE WHEN event_id % 4 = 3 THEN 'USER' END AS ftp_request
    FROM events
    """,
    doc="impcap L7 extraction battery (ref: contrib/impcap/"
        "http_parser.c request/status line + header fields; "
        "ftp_parser.c 3-digit reply vs command word). Packet rows "
        "synthesized from events (TCP proto 6, ports 80/21) run "
        "through the REAL impcap_http + impcap_ftp column pipelines "
        "(streaming/pcap.py:454,489 — pure column ops, no Python "
        "walker); the oracle recomputes each field from the "
        "generator keys. No shuffle: per-row string ops only.",
)
def impcap_l7_battery(spark, sf_dir):
    from rsyslog_spark.streaming.pcap import impcap_ftp, impcap_http

    ev = load(spark, sf_dir, "events")
    k = F.col("event_id") % 4
    uid = F.col("user_id")
    crlf = F.lit("\r\n")
    txt = (
        F.when(k == 0, F.concat(
            F.lit("GET /p"), F.col("event_id").cast("string"),
            F.lit(" HTTP/1.1"), crlf,
            F.lit("Host: h"), (uid % 5).cast("string"), crlf,
            F.lit("User-Agent: ua"), crlf, crlf))
        .when(k == 1, F.concat(
            F.lit("HTTP/1.1 200 OK"), crlf,
            F.lit("Content-Type: text/plain"), crlf, crlf,
            F.lit("hello")))
        .when(k == 2, F.concat(F.lit("220 svc ready"), crlf))
        .otherwise(F.concat(F.lit("USER u"), uid.cast("string"),
                            crlf)))
    pkts = ev.select(
        "event_id",
        F.lit(6).alias("IP_proto"),
        F.when(k == 1, 80).when(k == 2, 21).otherwise(40000)
        .alias("net_src_port"),
        F.when(k == 0, 80).when(k == 3, 21).otherwise(40000)
        .alias("net_dst_port"),
        F.encode(txt, "utf-8").alias("payload"))
    out = impcap_ftp(impcap_http(pkts))
    return out.select(
        "event_id",
        F.col("HTTP_method").alias("http_method"),
        F.col("HTTP_request_URI").alias("http_uri"),
        F.col("HTTP_version").alias("http_version"),
        F.col("HTTP_status_code").alias("http_status"),
        F.col("HTTP_reason").alias("http_reason"),
        F.col("HTTP_header_fields")["Host"].alias("host_hdr"),
        F.col("FTP_response").cast("long").alias("ftp_response"),
        F.col("FTP_request").alias("ftp_request"))


@q(
    "imdocker_jsonlog_parse",
    r"""
    WITH raw AS (
      SELECT event_id,
             '{"log":"evt ' || event_type || ' #' || event_id ||
             '\n","stream":"' ||
             CASE WHEN event_id % 2 = 0 THEN 'stdout'
                  ELSE 'stderr' END ||
             '","time":"2026-01-01T00:' ||
             lpad(CAST((event_id // 60) % 60 AS VARCHAR), 2, '0') ||
             ':' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0') ||
             '.123456789Z"}' AS line
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           regexp_replace(json_extract_string(line, '$.log'),
                          '\n$', '') AS msg,
           json_extract_string(line, '$.stream') AS stream,
           strftime(strptime(
               regexp_replace(json_extract_string(line, '$.time'),
                              '(\.\d{6})\d*Z$', '\1Z'),
               '%Y-%m-%dT%H:%M:%S.%fZ'),
             '%Y-%m-%d %H:%M:%S.%f') AS ts
    FROM raw
    """,
    doc="docker json-file log-driver record parse (ref: contrib/"
        "imdocker/imdocker.c + contrib/imkubernetes docker_json "
        "branch; golden imkubernetes-dockerjson-basic.sh): MSG = "
        "log minus trailing newline, stream, RFC3339Nano time "
        "trimmed to microseconds — through the exact column logic "
        "imdocker/imkubernetes_dockerjson read files with "
        "(bridges.dockerjson_cols).",
)
def imdocker_jsonlog_parse(spark, sf_dir):
    from rsyslog_spark.streaming.bridges import dockerjson_cols

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    eid = F.col("event_id")
    line = F.concat(
        F.lit('{"log":"evt '), F.col("event_type"), F.lit(" #"),
        eid.cast("string"), F.lit('\\n","stream":"'),
        F.when(eid % 2 == 0, F.lit("stdout"))
        .otherwise(F.lit("stderr")),
        F.lit('","time":"2026-01-01T00:'),
        F.lpad(((eid / 60).cast("long") % 60).cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((eid % 60).cast("string"), 2, "0"),
        F.lit('.123456789Z"}'))
    src = ev.select("event_id", line.alias("value"))
    parsed = src.select("event_id",
                        *dockerjson_cols(F.col("value")))
    return parsed.select(
        "event_id",
        F.col("line").alias("msg"),
        "stream",
        F.date_format("timegenerated",
                      "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"))


@q(
    "imkmsg_header_parse",
    r"""
    SELECT event_id,
           'kernel ' || event_type AS msg,
           CAST((event_id % 192) // 8 AS BIGINT) AS facility,
           CAST((event_id % 192) % 8 AS BIGINT) AS severity,
           CAST(event_id AS BIGINT) AS seq,
           CAST(event_id * 1000 AS BIGINT) AS usec,
           CASE WHEN event_id % 3 = 0 THEN event_type
                ELSE '' END AS subsystem,
           CASE WHEN event_id % 3 = 0
                THEN '+pci:0000:00:' ||
                     lpad(CAST(event_id % 32 AS VARCHAR), 2, '0')
                ELSE '' END AS device
    FROM events WHERE event_id < 3000
    """,
    doc="/dev/kmsg structured record parse (ref: contrib/imkmsg/"
        "kmsg.c:64-140): 'pri,seq,usec,flags;message' header split, "
        "PRI decompose, and indented SUBSYSTEM=/DEVICE= "
        "continuation-line property lift — through the exact "
        "record-level column logic imkmsg reads /dev/kmsg with "
        "(bridges.kmsg_record_cols).",
)
def imkmsg_header_parse(spark, sf_dir):
    from rsyslog_spark.streaming.bridges import kmsg_record_cols

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    eid = F.col("event_id")
    cont = F.when(
        eid % 3 == 0,
        F.concat(F.lit("\n SUBSYSTEM="), F.col("event_type"),
                 F.lit("\n DEVICE=+pci:0000:00:"),
                 F.lpad((eid % 32).cast("string"), 2, "0"))
    ).otherwise(F.lit(""))
    rec = F.concat(
        (eid % 192).cast("string"), F.lit(","),
        eid.cast("string"), F.lit(","),
        (eid * 1000).cast("string"),
        F.lit(",-;kernel "), F.col("event_type"), cont)
    src = ev.select("event_id", rec.alias("rec"))
    parsed = src.select("event_id", *kmsg_record_cols(F.col("rec")))
    return parsed.select(
        "event_id", "msg",
        F.col("syslogfacility").cast("long").alias("facility"),
        F.col("syslogseverity").cast("long").alias("severity"),
        F.col("sequnum").alias("seq"),
        F.col("usec_since_boot").alias("usec"),
        F.coalesce(F.col("kmsg_props")["SUBSYSTEM"], F.lit(""))
        .alias("subsystem"),
        F.coalesce(F.col("kmsg_props")["DEVICE"], F.lit(""))
        .alias("device"))


@q(
    "imkubernetes_cri_reassembly",
    r"""
    SELECT 'pod' || CAST(event_id % 7 AS VARCHAR) AS srcfile,
           CASE WHEN event_id % 2 = 0 THEN 'stdout'
                ELSE 'stderr' END AS stream,
           CAST(ROW_NUMBER() OVER (
                    PARTITION BY event_id % 7, event_id % 2
                    ORDER BY event_id) - 1 AS BIGINT) AS grp,
           event_type || ' payload ' || event_id AS full_msg,
           CAST(event_id % 3 + 1 AS BIGINT) AS n_frags
    FROM events WHERE event_id < 2000
    """,
    doc="CRI partial-line reassembly (ref: contrib/imkubernetes/"
        "imkubernetes.c partialAppend; goldens imkubernetes-cri-"
        "partial-*.sh): messages split into k P-fragments + closing "
        "F reassemble through the SAME gaps-and-islands window core "
        "imkubernetes reads pod logs with (bridges.cri_reassemble) — "
        "island id = count of prior F records per (file, stream), "
        "windows partitioned per file so islands never cross "
        "executors at scale. Oracle reconstructs analytically.",
)
def imkubernetes_cri_reassembly(spark, sf_dir):
    from rsyslog_spark.streaming.bridges import cri_reassemble

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    eid = F.col("event_id")
    full = F.concat(F.col("event_type"), F.lit(" payload "),
                    eid.cast("string"))
    k = (eid % 3 + 1).cast("int")
    step = F.ceil(F.length(full) / k).cast("int")
    frags = ev.select(
        F.concat(F.lit("pod"), (eid % 7).cast("string"))
        .alias("srcfile"),
        F.when(eid % 2 == 0, F.lit("stdout")).otherwise(
            F.lit("stderr")).alias("stream"),
        (eid * 4).alias("base_pos"), eid.alias("eid"),
        full.alias("full"), k.alias("k"), step.alias("step"),
        F.explode(F.sequence(F.lit(0), k - 1)).alias("i"),
    ).select(
        "srcfile", "stream",
        (F.col("base_pos") + F.col("i")).alias("pos"),
        F.when(F.col("i") == F.col("k") - 1, F.lit("F"))
        .otherwise(F.lit("P")).alias("tag"),
        F.col("full").substr(
            F.col("i") * F.col("step") + 1, F.col("step"))
        .alias("msg"),
    )
    out = cri_reassemble(frags)
    return out.select(
        "srcfile", "stream", F.col("grp").cast("long").alias("grp"),
        "full_msg", F.col("n_frags").cast("long").alias("n_frags"))


@q(
    "mmsnareparse_win_event",
    """
    SELECT CASE WHEN event_id % 2 = 0 THEN 'success' ELSE 'failure'
           END AS outcome,
           COUNT(*) AS cnt,
           CAST(SUM(50000 + event_id % 999) AS BIGINT) AS sum_port,
           CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS bad_guids,
           CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_badraw,
           COUNT(DISTINCT event_id % 4) AS n_ltn,
           CAST(SUM(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_interactive,
           COUNT(DISTINCT event_id % 16) AS n_topt,
           COUNT(DISTINCT CAST(user_id % 200 AS VARCHAR) || '.'
                 || CAST(event_id % 250 AS VARCHAR)) AS n_ip
    FROM events GROUP BY 1
    """,
    doc="mmsnareparse end-to-end: rendered Snare tab headers + a full "
        "description section walk per row — EventID→Outcome mapping "
        "(g_eventMappings), LogonType canonicalization, NewLogon GUID "
        "validation (invalid → raw string + Validation!Errors), "
        "Network int64 SourcePort, ip typing, and the Additional "
        "Information → Kerberos section escape (ref: plugins/"
        "mmsnareparse/mmsnareparse.c:197-383,3472; tests/"
        "mmsnareparse-{basic,kerberos,value-types}.sh).",
)
def mmsnareparse_win_event(spark, sf_dir):
    from rsyslog_spark.parsers.vendors import mmsnareparse

    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    uid = F.col("user_id")
    win_id = F.when(eid % 2 == 0, F.lit("4624")) \
        .otherwise(F.lit("4625"))
    lt = ((eid % 4) + 2).cast("string")
    port = (eid % 999 + 50000).cast("string")
    ip = F.concat(F.lit("10."), (uid % 200).cast("string"),
                  F.lit(".0."), (eid % 250).cast("string"))
    guid = F.when(eid % 3 == 0, F.lit("not-a-guid")).otherwise(
        F.concat(F.lit("{5a8f0679-9b23-4cb7-a8c7-"),
                 F.lpad((eid % 100000).cast("string"), 12, "0"),
                 F.lit("}")))
    topt = F.concat(F.lit("0x"),
                    F.conv((eid % 16).cast("string"), 10, 16))
    msg = F.concat(
        F.lit("MSWinEventLog\t1\tSecurity\t"), eid.cast("string"),
        F.lit("\tTue Feb 18 06:42:17 2025\t"), win_id,
        F.lit("\tMicrosoft-Windows-Security-Auditing\tN/A\tN/A\t"),
        F.when(eid % 2 == 0, F.lit("Success Audit"))
        .otherwise(F.lit("Failure Audit")),
        F.lit("\tHOST-01\tLogon\t\tAn account logon was processed."
              "    Subject:   Security ID:  S-1-5-18"
              "    Logon Information:   Logon Type:  "), lt,
        F.lit("    New Logon:   Account Name:  U"),
        (uid % 50).cast("string"),
        F.lit("   Logon GUID:  "), guid,
        F.lit("    Network Information:"
              "   Source Network Address: "), ip,
        F.lit("   Source Port:  "), port,
        F.lit("    Additional Information:   Ticket Options:  "),
        topt,
        # real Snare descriptions end with trailing spaces before the
        # checksum tab; without them the multi-token description join
        # (parse_snare_text concat loop) would fold the numeric
        # checksum into the last value — exactly what the reference
        # does too (see the trailing-extradata-regex-anchor golden)
        F.lit("   \t"), eid.cast("string"))
    parsed = mmsnareparse(ev.select(msg.alias("msg")))

    def j(c, p):
        return F.get_json_object(F.col(c), p)

    return parsed.select(
        j("cee_win_event", "$.Outcome").alias("outcome"),
        j("cee_win_logoninformation", "$.LogonTypeName").alias("ltn"),
        j("cee_win_newlogon", "$.LogonGUID").alias("guid"),
        j("cee_win_network", "$.SourcePort").cast("long")
        .alias("port"),
        j("cee_win_network", "$.SourceNetworkAddress").alias("srcip"),
        j("cee_win_kerberos", "$.TicketOptions").alias("topt"),
        # Validation now always renders (Errors=[] when clean, like
        # initialize_observability) — flag rows whose array is
        # non-empty
        F.get_json_object(F.col("cee_win_validation"),
                          "$.Errors[0]").isNotNull().cast("long")
        .alias("bad"),
    ).groupBy("outcome").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("port").alias("sum_port"),
        F.sum("bad").alias("bad_guids"),
        F.sum((F.col("guid") == "not-a-guid").cast("long"))
        .alias("n_badraw"),
        F.countDistinct("ltn").alias("n_ltn"),
        F.sum((F.col("ltn") == "Interactive").cast("long"))
        .alias("n_interactive"),
        F.countDistinct("topt").alias("n_topt"),
        F.countDistinct("srcip").alias("n_ip"),
    )


@q(
    "tcp_compression_roundtrip",
    """
    WITH lines AS (
      SELECT event_id % 8 AS bucket,
             '<13>Mar  1 01:00:00 h app: ev ' || event_type
               || ' #' || CAST(event_id AS VARCHAR) || ' '
               || repeat('x', CAST(event_id % 90 AS INT)) AS line
      FROM events
    )
    SELECT bucket,
           COUNT(*) AS n,
           COUNT(*) AS stream_ok,
           COUNT(*) AS single_ok,
           CAST(SUM(length(line)) AS BIGINT) AS total_chars
    FROM lines GROUP BY bucket
    """,
    doc="TCP compression round trip (imtcp.c:376-411 stream modes; "
        "omfwd.c:153-157 single + stream:always; parser.c:262 "
        "uncompressMessage): each partition deflates its lines as "
        "ONE zlib stream with Z_SYNC_FLUSH per octet-counted frame "
        "(the omfwd stream:always wire shape), inflates it back "
        "through split_tcp_frames; the legacy path runs _z_single "
        "(>60-byte + only-if-gain rule) + inflate_legacy_z per "
        "message. The oracle assumes LOSSLESSNESS — any framing/"
        "inflate/threshold bug breaks the equality counts.",
)
def tcp_compression_roundtrip(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    src = ev.select(
        (F.col("event_id") % 8).cast("long").alias("bucket"),
        F.concat(
            F.lit("<13>Mar  1 01:00:00 h app: ev "),
            F.col("event_type"), F.lit(" #"),
            F.col("event_id").cast("string"), F.lit(" "),
            F.expr("repeat('x', cast(event_id % 90 as int))"),
        ).alias("line"),
    )

    def roundtrip(pdfs):
        import pandas as pd
        import zlib

        from rsyslog_spark.streaming.bridges import (
            inflate_legacy_z, split_tcp_frames)
        from rsyslog_spark.streaming.sinks import _z_single

        for pdf in pdfs:
            lines = pdf["line"].tolist()
            if not lines:
                continue
            # omfwd stream:always sender shape: one deflate stream,
            # Z_SYNC_FLUSH per transmit, octet-counted framing
            comp = zlib.compressobj(6)
            wire = bytearray()
            for l in lines:
                p = l.encode("utf-8")
                frame = str(len(p)).encode() + b" " + p
                wire += comp.compress(frame)
                wire += comp.flush(zlib.Z_SYNC_FLUSH)
            wire += comp.flush()
            # imtcp receiver shape: inflate the CONNECTION stream,
            # then per-frame split (framing autodetect)
            plain = zlib.decompressobj().decompress(bytes(wire))
            msgs, rest = split_tcp_frames(plain, 200 * 1024)
            stream_rt = [m.decode("utf-8") for m in msgs]
            if rest or len(stream_rt) != len(lines):
                stream_rt = [""] * len(lines)   # loss → all mismatch
            # legacy single-message path per line
            single_rt = []
            for l in lines:
                r = inflate_legacy_z(_z_single(l.encode("utf-8"), 6))
                single_rt.append("" if r is None
                                 else r.decode("utf-8"))
            yield pd.DataFrame({
                "bucket": pdf["bucket"],
                "orig": lines,
                "stream_rt": stream_rt,
                "single_rt": single_rt,
            })

    rt = src.mapInPandas(
        roundtrip,
        "bucket long, orig string, stream_rt string, single_rt string")
    return rt.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("stream_rt") == F.col("orig")).cast("long"))
        .alias("stream_ok"),
        F.sum((F.col("single_rt") == F.col("orig")).cast("long"))
        .alias("single_ok"),
        F.sum(F.length("orig")).cast("long").alias("total_chars"),
    )


#: cert-name × permitted-peer matrix rows (10 names × 12 peers —
#: every combination appears for event_id % 120 coverage). Shared
#: between the Spark query and its oracle so both sides index the
#: SAME vectors.
_TLS_NAMES = [
    "client.example.net", "a.b.example.net", "server1.example.net",
    "host.example.org", "example.net", "CLIENT.example.net",
    "client.example.net.", "clientX.example.net",
    "deep.sub.domain.example.net", "localhost",
]
_TLS_PEERS = [
    "client.example.net", "*.example.net", "*client.example.net",
    "client*.example.net", "*", "*.*.example.net",
    "client.example.*", "a*b.example.net", "*.example.net.",
    "localhost", "*.sub.domain.example.net", "host.*.org",
]


def _tls_sql_list(vals):
    return "[" + ", ".join("'" + v + "'" for v in vals) + "]"


@q(
    "tls_peer_wildcard_matrix",
    f"""
    WITH pairs AS (
      SELECT ({_tls_sql_list(_TLS_NAMES)})[
               CAST(event_id % 10 AS INT) + 1] AS cert_name,
             ({_tls_sql_list(_TLS_PEERS)})[
               CAST((event_id // 10) % 12 AS INT) + 1] AS peer
      FROM events
    )
    SELECT cert_name, peer,
           COUNT(*) AS n,
           CAST(MAX(CASE WHEN
             CASE WHEN strpos(peer, '*') = 0 THEN cert_name = peer
             ELSE (
               len(string_split(cert_name, '.'))
                 = len(string_split(peer, '.'))
               AND list_aggregate(
                 list_transform(
                   list_zip(string_split(peer, '.'),
                            string_split(cert_name, '.')),
                   t -> CASE
                     WHEN t[1] = '*' THEN TRUE
                     WHEN t[1] = '' THEN t[2] = ''
                     WHEN strpos(t[1], '*') = 0 THEN t[2] = t[1]
                     WHEN starts_with(t[1], '*')
                          AND strpos(substr(t[1], 2), '*') = 0
                       THEN ends_with(t[2], substr(t[1], 2))
                     WHEN ends_with(t[1], '*')
                          AND strpos(substr(t[1], 1, len(t[1]) - 1),
                                     '*') = 0
                       THEN starts_with(
                              t[2], substr(t[1], 1, len(t[1]) - 1))
                     ELSE FALSE END),
                 'bool_and')
             ) END
           THEN 1 ELSE 0 END) AS BIGINT) AS accepted
    FROM pairs GROUP BY cert_name, peer
    """,
    doc="TLS x509/name peer-authorization matrix (runtime/net.c:150-"
        "460 AddPermittedPeerWildcard/PermittedPeerWildcardMatch, "
        "driven through streaming/gtls.py check_peer's matcher): "
        "PermittedPeer wildcards are COMPONENT-WISE — '*' never "
        "crosses a dot, '*suffix'/'prefix*' match within one domain "
        "part, component counts must agree exactly, empty components "
        "(trailing dot) must pair with empty, no-'*' peers strcmp, "
        "invalid wildcards ('a*b') fail closed. The oracle "
        "reimplements the component algebra in SQL over the same "
        "name×peer matrix, so a glob-library shortcut (fnmatch would "
        "let '*.example.net' accept 'a.b.example.net') hash-"
        "mismatches.",
)
def tls_peer_wildcard_matrix(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    pairs = ev.select(
        F.element_at(
            F.array(*[F.lit(x) for x in _TLS_NAMES]),
            (F.col("event_id") % 10).cast("int") + 1
        ).alias("cert_name"),
        F.element_at(
            F.array(*[F.lit(x) for x in _TLS_PEERS]),
            F.expr("cast(event_id div 10 % 12 as int)") + 1
        ).alias("peer"),
    )

    def judge(pdfs):
        from functools import lru_cache

        import pandas as pd

        from rsyslog_spark.streaming.gtls import permitted_peer_match

        # the matrix has ~120 distinct (name, peer) pairs but the
        # stream carries one row per event — memoize per task so the
        # matcher runs once per distinct pair, not once per row
        @lru_cache(maxsize=None)
        def verdict(n: str, p: str) -> int:
            return int(permitted_peer_match(n, p))

        for pdf in pdfs:
            yield pd.DataFrame({
                "cert_name": pdf["cert_name"],
                "peer": pdf["peer"],
                "ok": [
                    verdict(n, p)
                    for n, p in zip(pdf["cert_name"].tolist(),
                                    pdf["peer"].tolist())
                ],
            })

    judged = pairs.mapInPandas(
        judge, "cert_name string, peer string, ok long")
    return judged.groupBy("cert_name", "peer").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("ok").alias("accepted"),
    )


@q(
    "tcp_framing_roundtrip",
    """
    WITH lines AS (
      SELECT event_id % 8 AS bucket,
             '<13>' || event_type || ' #'
               || CAST(event_id AS VARCHAR) || ' '
               || repeat('y', CAST(event_id % 50 AS INT))
               || CASE WHEN event_id % 4 = 3
                       THEN chr(10) || ' cont '
                            || CAST(event_id AS VARCHAR)
                       ELSE '' END AS payload
      FROM events
    )
    SELECT bucket,
           COUNT(*) AS n,
           COUNT(*) AS ok_n,
           CAST(SUM(length(payload)) AS BIGINT) AS total_chars
    FROM lines GROUP BY bucket
    """,
    doc="TCP framing battery roundtrip (tcps_sess.c processDataRcvd "
        "state machine: RFC6587 octet-counted + LF octet-stuffing, "
        "framingfix.cisco.asa stray-SP tolerance (:615-621), "
        "MultiLine continuation frames (:592-650)): each partition "
        "frames its payloads on the wire — event_id%4 selects "
        "octet-counted / LF / SP-prefixed-LF / multiline-"
        "continuation — and splits the bytes back through the "
        "PRODUCTION splitter (two session wires per partition: "
        "octet+SP under sp_framing_fix, LF+continuation under "
        "MultiLine — per-listener options the reference never "
        "combines), fed in adversarial 7-byte chunks to prove "
        "chunk-boundary invariance. The oracle assumes "
        "LOSSLESSNESS: any framing bug (frame merge/split/boundary "
        "loss) breaks the ok_n or total_chars equality.",
)
def tcp_framing_roundtrip(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    src = ev.select(
        (F.col("event_id") % 8).cast("long").alias("bucket"),
        (F.col("event_id") % 4).cast("int").alias("kind"),
        F.concat(
            F.lit("<13>"), F.col("event_type"), F.lit(" #"),
            F.col("event_id").cast("string"), F.lit(" "),
            F.expr("repeat('y', cast(event_id % 50 as int))"),
            F.when(F.col("event_id") % 4 == 3,
                   F.concat(F.lit("\n cont "),
                            F.col("event_id").cast("string")))
            .otherwise(F.lit("")),
        ).alias("payload"),
    )

    def roundtrip(pdfs):
        import pandas as pd

        from rsyslog_spark.streaming.bridges import split_tcp_frames

        def drain(wire: bytes, **kw) -> list[str]:
            # adversarial chunking: feed 7 bytes at a time to prove
            # chunk-boundary invariance of every framing feature
            msgs, buf = [], b""
            for off in range(0, len(wire), 7):
                buf += wire[off:off + 7]
                got, buf = split_tcp_frames(buf, 200 * 1024, **kw)
                msgs += got
            if buf.strip():
                msgs.append(buf.rstrip(b"\n"))
            return [m.decode("utf-8") for m in msgs]

        for pdf in pdfs:
            if not len(pdf):
                continue
            # TWO session wires per partition — MultiLine and the
            # cisco-asa SP fix are per-listener options the
            # reference never combines (a '\\n ' sequence is
            # CONTINUATION under MultiLine): wire1 = octet-counted +
            # SP-prefixed LF frames under sp_framing_fix; wire2 =
            # plain LF + multiline-continuation frames under
            # MultiLine, closed by a '<' sentinel so the final
            # continuation decision resolves
            w1, w2 = bytearray(), bytearray()
            # zip over plain lists, not iterrows(): iterrows builds a
            # pandas Series per row (~100x the cost of tuple
            # iteration) and this loop runs once per corpus row
            for payload, kind in zip(pdf["payload"].tolist(),
                                     pdf["kind"].tolist()):
                p = payload.encode("utf-8")
                k = int(kind)
                if k == 0:
                    w1 += str(len(p)).encode() + b" " + p
                elif k == 2:
                    w1 += b" " + p + b"\n"
                else:           # LF (1) and multiline (3)
                    w2 += p + b"\n"
            out = drain(bytes(w1), sp_framing_fix=True)
            out += [m for m in drain(bytes(w2) + b"<EOS>\n",
                                     multiline=True)
                    if m != "<EOS>"]
            ok = int(sorted(out)
                     == sorted(pdf["payload"].tolist()))
            yield pd.DataFrame({
                "bucket": pdf["bucket"],
                "payload": pdf["payload"],
                "ok": [ok] * len(pdf),
            })

    rt = src.mapInPandas(
        roundtrip, "bucket long, payload string, ok long")
    return rt.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ok").alias("ok_n"),
        F.sum(F.length("payload")).cast("long")
        .alias("total_chars"),
    )


@q(
    "omfile_dynafile_zip",
    """
    WITH msgs AS (
      SELECT CASE WHEN event_id % 5 = 4 THEN 'bad_host'
                  ELSE 'h' || CAST(event_id % 4 AS VARCHAR)
             END AS pt_hostname,
             CAST(event_id % 8 AS VARCHAR) AS pt_syslogseverity,
             'app' || CAST(event_id % 3 AS VARCHAR) || ': evt '
               || event_type || ' #'
               || CAST(event_id AS VARCHAR) AS line
      FROM events
    )
    SELECT pt_hostname, pt_syslogseverity,
           COUNT(*) AS n,
           COUNT(*) AS ok_n,
           CAST(SUM(length(line)) AS BIGINT) AS total_chars
    FROM msgs
    GROUP BY pt_hostname, pt_syslogseverity
    """,
    doc="omfile dynafile + zipLevel end-to-end (tools/omfile.c "
        "dynafile cache :133-140, cflineParseDynaFile line "
        "templates, iZipLevel zip writer, secpath=replace "
        "sanitizer; rotation boundaries per outchannel.c uSizeLimit "
        "/ omfile.c:497-500): renders a '?dynfile;outfmt'-shaped "
        "stream through the PRODUCTION template compiler + "
        "dynafile_partition_spec + omfile_dynafile_batch with "
        "gzip output into a fresh directory, reads the compressed "
        "partition tree back, and checks per-dynafile counts/"
        "sizes in DuckDB. 'bad/host' proves the secure-path "
        "sanitizer maps to the bad_host FILE (never a "
        "subdirectory). ok_n additionally pins the rotation "
        "boundary calculator (rotation_cut_points): every closed "
        "file must exceed the size limit while shedding its last "
        "record drops it back under — a lossless write, a "
        "mis-partitioned path, an undecompressable gzip part, or "
        "a wrong cut point all break the equality.",
)
def omfile_dynafile_zip(spark, sf_dir):
    import tempfile

    from rsyslog_spark.streaming.sinks import omfile_dynafile_batch
    from rsyslog_spark.templates import compile_template_string

    ev = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    src = ev.select(
        F.when(eid % 5 == 4, F.lit("bad/host"))
        .otherwise(F.concat(F.lit("h"),
                            (eid % 4).cast("string")))
        .alias("hostname"),
        (eid % 8).cast("int").alias("syslogseverity"),
        F.concat(F.lit("app"), (eid % 3).cast("string"),
                 F.lit(":")).alias("syslogtag"),
        F.concat(F.lit(" evt "), F.col("event_type"),
                 F.lit(" #"), eid.cast("string")).alias("msg"),
    )
    tmp = tempfile.mkdtemp(prefix="rsyslog_spark_dynafile_")
    line = compile_template_string("%syslogtag%%msg%\n").col(src)
    omfile_dynafile_batch(
        src, tmp + "/%hostname%/sev-%syslogseverity%.log",
        line=line, secure_paths=True, zip_level=6)

    back = spark.read.text(tmp)

    def check(pdf):
        import pandas as pd

        from rsyslog_spark.streaming.sinks import rotation_cut_points

        LIMIT = 4096
        lines = sorted(pdf["value"].tolist())
        sizes = [len(ln) + 1 for ln in lines]   # +1: newline on disk
        cuts = rotation_cut_points(sizes, LIMIT)
        ok = 1
        for a, b in zip(cuts, cuts[1:]):
            seg = sum(sizes[a:b])
            if not (seg > LIMIT and seg - sizes[b - 1] <= LIMIT):
                ok = 0
        if cuts and cuts[0] != 0:
            ok = 0
        return pd.DataFrame([{
            "pt_hostname": str(pdf["pt_hostname"].iloc[0]),
            "pt_syslogseverity":
                str(pdf["pt_syslogseverity"].iloc[0]),
            "n": len(lines),
            "ok_n": len(lines) * ok,
            "total_chars": sum(len(ln) for ln in lines),
        }])

    return back.groupBy("pt_hostname", "pt_syslogseverity") \
        .applyInPandas(
            check,
            "pt_hostname string, pt_syslogseverity string, "
            "n long, ok_n long, total_chars long")

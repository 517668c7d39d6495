"""Lookup-table and message-modification queries.

Lookup tables are config objects in the reference — collecting a
25-row dimension at plan time to build a literal-map lookup is the
operator's own semantics (runtime/lookup.c loads the whole file into
memory), not a driver-side shortcut. The DataFrame-join forms are
exercised alongside for dims that should stay distributed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import rsyslog_spark.functions as rf
from rsyslog_spark.operators.lookup import (
    LookupTable, lookup_join, sparse_lookup_join,
)
from rsyslog_spark.operators.mm import (
    anon_ipv4_col, mmfields, mmjsonparse, mmpstrucdata,
)
from rsyslog_spark.queries import Query, load

QUERIES: list[Query] = []


def q(name, oracle, doc=""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn
    return deco


@q(
    "lookup_string_broadcast",
    """
    SELECT r.r_name AS region, COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="string-type lookup as broadcast equi-join chain "
        "(ref: runtime/lookup.c lookupKey_str; fact side never "
        "shuffles for the join — only for the final agg).",
)
def lookup_string_broadcast(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    df = lookup_join(cust, nation.select("n_nationkey", "n_regionkey"),
                     "c_nationkey", "n_nationkey")
    df = lookup_join(df, region, "n_regionkey", "r_regionkey")
    return df.groupBy(F.col("r_name").alias("region")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@q(
    "lookup_array_literal",
    """
    SELECT n.n_name AS nation_name, COUNT(*) AS cnt
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="array-type lookup: dense int index → literal array "
        "element_at, zero join (ref: lookup_tables.rst array type; "
        "lookupKey_arr direct indexing).",
)
def lookup_array_literal(spark, sf_dir):
    nation = load(spark, sf_dir, "nation")
    entries = [(r["n_nationkey"], r["n_name"])
               for r in nation.select("n_nationkey", "n_name").collect()]
    table = LookupTable(type="array", nomatch="unknown", entries=entries)
    cust = load(spark, sf_dir, "customer")
    return cust.groupBy(
        table.lookup("c_nationkey").alias("nation_name")
    ).agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "lookup_sparse_asof",
    """
    SELECT CASE WHEN CAST(FLOOR(value) AS BIGINT) >= 200 THEN 'vip'
                WHEN CAST(FLOOR(value) AS BIGINT) >= 100 THEN 'high'
                WHEN CAST(FLOOR(value) AS BIGINT) >= 50  THEN 'mid'
                WHEN CAST(FLOOR(value) AS BIGINT) >= 0   THEN 'low'
                ELSE 'none' END AS tier,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1
    """,
    doc="sparseArray lookup: largest index <= key (as-of semantics, "
        "ref: lookup_tables.rst sparseArray; lookupKey_sparseArr "
        "binary search).",
)
def lookup_sparse_asof(spark, sf_dir):
    table = LookupTable(
        type="sparseArray", nomatch="none",
        entries=[(0, "low"), (50, "mid"), (100, "high"), (200, "vip")],
    )
    ev = load(spark, sf_dir, "events")
    key = F.floor(F.col("value")).cast("long")
    return ev.groupBy(table.lookup(key).alias("tier")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@q(
    "lookup_sparse_join",
    """
    WITH dim AS (
      SELECT * FROM (VALUES (0, 'low'), (50, 'mid'), (100, 'high'),
                            (200, 'vip')) AS t(lo, tier)
    )
    SELECT d.tier AS tier, COUNT(*) AS cnt,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e
    LEFT JOIN dim d
      ON CAST(FLOOR(e.value) AS BIGINT) >= d.lo
     AND (d.lo = 200 OR CAST(FLOOR(e.value) AS BIGINT) <
          CASE d.lo WHEN 0 THEN 50 WHEN 50 THEN 100 WHEN 100 THEN 200 END)
    GROUP BY d.tier
    """,
    doc="sparseArray as a broadcast RANGE JOIN (DataFrame-sized dim): "
        "lo <= key < lead(lo) — the scale path for big as-of tables.",
)
def lookup_sparse_join(spark, sf_dir):
    dim = spark.createDataFrame(
        [(0, "low"), (50, "mid"), (100, "high"), (200, "vip")],
        "lo long, tier string",
    )
    ev = load(spark, sf_dir, "events").withColumn(
        "vkey", F.floor(F.col("value")).cast("long")
    )
    joined = sparse_lookup_join(ev, dim, "vkey", "lo", value_col="tier")
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@q(
    "lookup_regex_chain",
    """
    SELECT CASE WHEN regexp_matches(event_type, '^err') THEN 'incident'
                WHEN regexp_matches(event_type, '^(purchase|signup)') THEN 'conversion'
                WHEN regexp_matches(event_type, 'ick') THEN 'engagement'
                ELSE 'other' END AS category,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1
    """,
    doc="regex-type lookup: first matching pattern wins "
        "(ref: lookup_tables.rst regex type; ordered scan).",
)
def lookup_regex_chain(spark, sf_dir):
    table = LookupTable(
        type="regex", nomatch="other",
        entries=[("^err", "incident"), ("^(purchase|signup)", "conversion"),
                 ("ick", "engagement")],
    )
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(table.lookup("event_type").alias("category")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@q(
    "mmjsonparse_extract",
    """
    SELECT event_type,
           CAST(SUM(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_parsed
    FROM events
    GROUP BY event_type
    """,
    doc="mmjsonparse: CEE/JSON payload → $! tree, field extraction "
        "(ref: plugins/mmjsonparse/mmjsonparse.c).",
)
def mmjsonparse_extract(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    parsed = mmjsonparse(ev, msg_col="props", out_col="cee")
    k = rf.json_get("cee", "k")
    return parsed.groupBy("event_type").agg(
        F.sum(rf.json_get_num("cee", "k")).cast("long").alias("sum_k"),
        F.count(k).cast("long").alias("n_parsed"),
    )


@q(
    "mmfields_split",
    """
    SELECT string_split(text, ' ')[2] AS f2,
           COUNT(*) AS cnt,
           CAST(COUNT(string_split(text, ' ')[4]) AS BIGINT) AS n_f4
    FROM documents
    GROUP BY 1
    """,
    doc="mmfields: delimiter split into $!f1..fN columns "
        "(ref: plugins/mmfields/mmfields.c; f1 = before 1st delim).",
)
def mmfields_split(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    split = mmfields(docs, msg_col="text", delim=" ", max_fields=4)
    return split.groupBy("f2").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count("f4").cast("long").alias("n_f4"),
    )


@q(
    "mmanon_embedded",
    """
    SELECT 'src=10.' || CAST(user_id % 256 AS VARCHAR) || '.'
               || CAST(event_id % 256 AS VARCHAR) || '.0 done' AS anon_msg,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1
    """,
    doc="mmanon embedded IPv4 anonymization, zero mode, 8 bits "
        "(ref: plugins/mmanon/mmanon.c).",
)
def mmanon_embedded(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    msg = F.concat(
        F.lit("src=10."), (F.col("user_id") % 256).cast("string"),
        F.lit("."), (F.col("event_id") % 256).cast("string"),
        F.lit("."), ((F.col("event_id") * 7) % 256).cast("string"),
        F.lit(" done"),
    )
    df = ev.select(msg.alias("msg"))
    return df.groupBy(
        anon_ipv4_col(F.col("msg"), bits=8).alias("anon_msg")
    ).agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "mmpstrucdata_parse",
    """
    SELECT 'evt@1' AS sd_id,
           json_extract_string(props, '$.k') AS kval,
           COUNT(*) AS cnt
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 2
    """,
    doc="mmpstrucdata: RFC5424 SD → map<sdid, map<param,value>> "
        "(ref: plugins/mmpstrucdata/mmpstrucdata.c).",
)
def mmpstrucdata_parse(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    sd = F.concat(F.lit('[evt@1 k="'), rf.json_get("props", "k"),
                  F.lit('"]'))
    df = ev.select(sd.alias("structured_data")).filter(
        rf.json_get("props", "k").isNotNull()
    )
    parsed = mmpstrucdata(df)
    m = F.col("rfc5424_sd")
    return parsed.select(
        F.map_keys(m)[0].alias("sd_id"),
        F.element_at(F.element_at(m, F.map_keys(m)[0]), "k").alias("kval"),
    ).groupBy("sd_id", "kval").agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "pmciscoios_parse",
    """
    SELECT 'EVT' AS cisco_facility,
           CAST(event_id % 8 AS BIGINT) AS cisco_severity,
           upper(event_type) AS cisco_mnemonic,
           COUNT(*) AS cnt,
           CAST(SUM(event_id) AS BIGINT) AS sum_seq
    FROM events
    GROUP BY 2, 3
    """,
    doc="Cisco IOS parser: seq + %FAC-SEV-MNEMONIC header extraction "
        "(ref: plugins/pmciscoios). Lines synthesized from events, "
        "parsed back, aggregated on the extracted fields.",
)
def pmciscoios_parse(spark, sf_dir):
    from rsyslog_spark.parsers.vendors import pmciscoios

    ev = load(spark, sf_dir, "events")
    line = F.concat(
        F.col("event_id").cast("string"), F.lit(": Mar  1 09:15:01.123: %EVT-"),
        (F.col("event_id") % 8).cast("string"), F.lit("-"),
        F.upper("event_type"), F.lit(": code="),
        (F.col("event_id") % 100).cast("string"),
    )
    parsed = pmciscoios(ev.select(line.alias("msg")))
    return (
        parsed.groupBy("cisco_facility",
                       F.col("cisco_severity").cast("long").alias("cisco_severity"),
                       "cisco_mnemonic")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("cisco_seq").cast("long").alias("sum_seq"))
    )


@q(
    "pmlastmsg_expand",
    """
    WITH src AS (
      SELECT user_id % 10 AS host, event_id AS ord,
             CASE WHEN event_id % 10 = 0
                  THEN 'last message repeated 2 times' ELSE event_type
             END AS msg,
             event_id % 10 = 0 AS is_summary
      FROM events
    ), resolved AS (
      SELECT host,
             CASE WHEN is_summary THEN last_value(
                    CASE WHEN NOT is_summary THEN msg END IGNORE NULLS
                  ) OVER (PARTITION BY host ORDER BY ord
                          ROWS UNBOUNDED PRECEDING)
                  ELSE msg END AS msg,
             CASE WHEN is_summary THEN 2 ELSE 1 END AS copies
      FROM src
    )
    SELECT CAST(host AS BIGINT) AS host, msg,
           CAST(SUM(copies) AS BIGINT) AS n
    FROM resolved
    GROUP BY 1, 2
    """,
    doc="pmlastmsg inverse: expand 'last message repeated n times' "
        "rows into n copies of the preceding real message per host "
        "(ref: plugins/pmlastmsg/pmlastmsg.c:1-6; one window pass + "
        "sequence explode).",
)
def pmlastmsg_expand_q(spark, sf_dir):
    from rsyslog_spark.parsers.vendors import pmlastmsg_expand

    ev = load(spark, sf_dir, "events")
    src = ev.select(
        (F.col("user_id") % 10).alias("hostname"),
        F.col("event_id").alias("timereported"),
        F.when(F.col("event_id") % 10 == 0,
               F.lit("last message repeated 2 times"))
        .otherwise(F.col("event_type")).alias("msg"),
    )
    out = pmlastmsg_expand(src)
    return out.groupBy(
        F.col("hostname").cast("long").alias("host"), "msg"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@q(
    "geoip_range_enrich",
    """
    WITH facts AS (
      SELECT event_id,
             CAST(10 * 16777216 + (user_id % 256) * 65536
                  + (event_id % 256) * 256 + (event_id * 7) % 256 AS BIGINT) AS ipnum
      FROM events
    )
    SELECT CASE WHEN ipnum BETWEEN 167772160 AND 171966463 THEN 'dc-west'
                WHEN ipnum BETWEEN 171966464 AND 176160767 THEN 'dc-east'
                ELSE NULL END AS region,
           COUNT(*) AS cnt
    FROM facts
    GROUP BY 1
    """,
    doc="mmdblookup analog: IP-in-range broadcast join against a "
        "GeoIP-style dim (ref: plugins/mmdblookup). The fact side "
        "never shuffles; BroadcastNestedLoopJoin over the tiny dim.",
)
def geoip_range_enrich(spark, sf_dir):
    from rsyslog_spark.operators.lookup import geoip_range_join

    ev = load(spark, sf_dir, "events")
    ip = F.concat_ws(
        ".", F.lit("10"), (F.col("user_id") % 256).cast("string"),
        (F.col("event_id") % 256).cast("string"),
        ((F.col("event_id") * 7) % 256).cast("string"),
    )
    facts = ev.select("event_id", ip.alias("ip"))
    # 10.0.0.0-10.63.255.255 west, 10.64.0.0-10.127.255.255 east
    ranges = spark.createDataFrame(
        [(167772160, 171966463, "dc-west"), (171966464, 176160767, "dc-east")],
        "range_lo long, range_hi long, region string",
    )
    out = geoip_range_join(facts, "ip", ranges)
    return out.groupBy("region").agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "mmexternal_bridge",
    """
    SELECT event_type AS msg,
           '{"n_words": ' ||
           CAST(length(trim(event_type))
                - length(replace(trim(event_type), ' ', '')) + 1
                AS VARCHAR) || '}' AS json,
           COUNT(*) AS cnt
    FROM events WHERE event_id < 200
    GROUP BY 1, 2
    """,
    doc="mmexternal JSON-over-stdio subprocess bridge via mapInPandas "
        "(ref: plugins/mmexternal/mmexternal.c). One child per "
        "partition; the deterministic word-count child lets the "
        "oracle recompute the bridge output in SQL.",
)
def mmexternal_bridge(spark, sf_dir):
    import sys as _sys

    from rsyslog_spark.operators.mm import mmexternal

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    child = (
        "import sys, json\n"
        "for line in sys.stdin:\n"
        "    m = json.loads(line)['msg']\n"
        "    print(json.dumps({'n_words': len(m.split())}), flush=True)\n"
    )
    df = ev.select(F.col("event_type").alias("msg")).repartition(4)
    out = mmexternal(df, [_sys.executable, "-c", child])
    return out.groupBy("msg", "json").agg(F.count(F.lit(1)).alias("cnt"))


@q(
    "kubernetes_dim_enrich",
    """
    SELECT n.n_name AS pod_ns, COUNT(*) AS cnt,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e LEFT JOIN nation n
      ON CAST(e.user_id % 25 AS INT) = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="mmkubernetes-shape enrichment: TTL-cached dimension loader + "
        "broadcast stream-static join (ref: contrib/mmkubernetes/"
        "mmkubernetes.c; operators/dimension.py RefreshingDim).",
)
def kubernetes_dim_enrich(spark, sf_dir):
    from rsyslog_spark.operators.dimension import (
        RefreshingDim, refreshing_dim_join,
    )

    ev = load(spark, sf_dir, "events").withColumn(
        "n_nationkey", (F.col("user_id") % 25).cast("int"))
    dim = RefreshingDim(
        lambda s: load(s, sf_dir, "nation")
        .select("n_nationkey", F.col("n_name").alias("pod_ns")),
        ttl_seconds=3600,
    )
    joined = refreshing_dim_join(ev, dim, on="n_nationkey")
    return joined.groupBy("pod_ns").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@q(
    "dnscache_resolution",
    """
    SELECT 'host-' || CAST(user_id % 200 AS VARCHAR) || '.example'
               AS fromhost,
           COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
    doc="dnscache (ref: runtime/dnscache.c): distinct-IP dimension "
        "resolved once through the (injected, here deterministic) "
        "resolver, broadcast-joined back — a million rows from one "
        "sender cost one resolution.",
)
def dnscache_resolution(spark, sf_dir):
    from rsyslog_spark.operators.dimension import dnscache_enrich

    ev = load(spark, sf_dir, "events").select(
        F.concat(F.lit("10.0.0."), (F.col("user_id") % 200).cast("string"))
        .alias("fromhost_ip"),
        F.lit(None).cast("string").alias("fromhost"),
    )
    out = dnscache_enrich(ev)
    return out.groupBy("fromhost").agg(F.count(F.lit(1)).alias("cnt"))

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
    anon_ipv4_col, mmfields, mmpstrucdata,
)
from rsyslog_spark.queries import Query, load

QUERIES: list[Query] = []


def q(name, oracle, doc=""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn
    return deco


@q(
    "lookup_battery",
    """
    SELECT 'string' AS ltype, r.r_name AS key, COUNT(*) AS cnt
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    UNION ALL
    SELECT 'array' AS ltype, n.n_name AS key, COUNT(*) AS cnt
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    UNION ALL
    SELECT 'regex' AS ltype,
           CASE WHEN regexp_matches(event_type, '^err') THEN 'incident'
                WHEN regexp_matches(event_type, '^(purchase|signup)') THEN 'conversion'
                WHEN regexp_matches(event_type, 'ick') THEN 'engagement'
                ELSE 'other' END AS key,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 2
    """,
    doc="lookup() table types on one frame-per-type union: string "
        "type as broadcast equi-join chain (ref: runtime/lookup.c "
        "lookupKey_str; fact side never shuffles for the join), array "
        "type as dense-int-index literal element_at with zero join "
        "(lookup_tables.rst array; lookupKey_arr), regex type as "
        "first-matching-pattern-wins chain (lookup_tables.rst regex; "
        "ordered scan).",
)
def lookup_battery(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    ev = load(spark, sf_dir, "events")

    df = lookup_join(cust, nation.select("n_nationkey", "n_regionkey"),
                     "c_nationkey", "n_nationkey")
    df = lookup_join(df, region, "n_regionkey", "r_regionkey")
    s = df.groupBy(F.col("r_name").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"))

    entries = [(r["n_nationkey"], r["n_name"])
               for r in nation.select("n_nationkey", "n_name").collect()]
    arr_table = LookupTable(type="array", nomatch="unknown",
                            entries=entries)
    a = cust.groupBy(arr_table.lookup("c_nationkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"))

    rx_table = LookupTable(
        type="regex", nomatch="other",
        entries=[("^err", "incident"), ("^(purchase|signup)", "conversion"),
                 ("ick", "engagement")],
    )
    r = ev.groupBy(rx_table.lookup("event_type").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"))

    return (
        s.select(F.lit("string").alias("ltype"), "key", "cnt")
        .unionByName(a.select(F.lit("array").alias("ltype"), "key", "cnt"))
        .unionByName(r.select(F.lit("regex").alias("ltype"), "key", "cnt"))
    )


@q(
    "lookup_sparse",
    """
    WITH dim AS (
      SELECT * FROM (VALUES (0, 'low'), (50, 'mid'), (100, 'high'),
                            (200, 'vip')) AS t(lo, tier)
    )
    SELECT 'asof' AS variant,
           CASE WHEN CAST(FLOOR(value) AS BIGINT) >= 200 THEN 'vip'
                WHEN CAST(FLOOR(value) AS BIGINT) >= 100 THEN 'high'
                WHEN CAST(FLOOR(value) AS BIGINT) >= 50  THEN 'mid'
                WHEN CAST(FLOOR(value) AS BIGINT) >= 0   THEN 'low'
                ELSE 'none' END AS tier,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 2
    UNION ALL
    SELECT 'join' AS variant, d.tier AS tier, COUNT(*) AS cnt
    FROM events e
    LEFT JOIN dim d
      ON CAST(FLOOR(e.value) AS BIGINT) >= d.lo
     AND (d.lo = 200 OR CAST(FLOOR(e.value) AS BIGINT) <
          CASE d.lo WHEN 0 THEN 50 WHEN 50 THEN 100 WHEN 100 THEN 200 END)
    GROUP BY d.tier
    """,
    doc="sparseArray lookup, both forms cross-checked: largest index "
        "<= key as a compiled expression (as-of semantics, ref: "
        "lookup_tables.rst sparseArray; lookupKey_sparseArr binary "
        "search) and as a broadcast RANGE JOIN (lo <= key < lead(lo)) "
        "— the scale path for as-of tables too big to inline.",
)
def lookup_sparse(spark, sf_dir):
    entries = [(0, "low"), (50, "mid"), (100, "high"), (200, "vip")]
    table = LookupTable(type="sparseArray", nomatch="none",
                        entries=entries)
    ev = load(spark, sf_dir, "events")
    key = F.floor(F.col("value")).cast("long")
    asof = ev.groupBy(table.lookup(key).alias("tier")).agg(
        F.count(F.lit(1)).alias("cnt"))

    dim = spark.createDataFrame(entries, "lo long, tier string")
    joined = sparse_lookup_join(
        ev.withColumn("vkey", key), dim, "vkey", "lo", value_col="tier")
    j = joined.groupBy("tier").agg(F.count(F.lit(1)).alias("cnt"))

    return (
        asof.select(F.lit("asof").alias("variant"), "tier", "cnt")
        .unionByName(j.select(F.lit("join").alias("variant"), "tier", "cnt"))
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
    "vendor_parse_pair",
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
    SELECT 'cisco' AS kind,
           'EVT-' || CAST(event_id % 8 AS VARCHAR) AS k1,
           upper(event_type) AS k2,
           COUNT(*) AS cnt,
           CAST(SUM(event_id) AS BIGINT) AS extra
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'lastmsg' AS kind, CAST(host AS VARCHAR) AS k1, msg AS k2,
           CAST(SUM(copies) AS BIGINT) AS cnt,
           CAST(NULL AS BIGINT) AS extra
    FROM resolved
    GROUP BY 2, 3
    """,
    doc="Vendor parser pair on one union: pmciscoios seq + "
        "%FAC-SEV-MNEMONIC header extraction (ref: plugins/"
        "pmciscoios) and the pmlastmsg inverse — expand 'last message "
        "repeated n times' rows into n copies of the preceding real "
        "message per host (ref: plugins/pmlastmsg/pmlastmsg.c:1-6; "
        "one window pass + sequence explode).",
)
def vendor_parse_pair(spark, sf_dir):
    from rsyslog_spark.parsers.vendors import pmciscoios, pmlastmsg_expand

    ev = load(spark, sf_dir, "events")
    line = F.concat(
        F.col("event_id").cast("string"), F.lit(": Mar  1 09:15:01.123: %EVT-"),
        (F.col("event_id") % 8).cast("string"), F.lit("-"),
        F.upper("event_type"), F.lit(": code="),
        (F.col("event_id") % 100).cast("string"),
    )
    parsed = pmciscoios(ev.select(line.alias("msg")))
    cisco = parsed.groupBy(
        F.concat(F.col("cisco_facility"), F.lit("-"),
                 F.col("cisco_severity").cast("string")).alias("k1"),
        F.col("cisco_mnemonic").alias("k2"),
    ).agg(F.count(F.lit(1)).alias("cnt"),
          F.sum("cisco_seq").cast("long").alias("extra"))

    src = ev.select(
        (F.col("user_id") % 10).alias("hostname"),
        F.col("event_id").alias("timereported"),
        F.when(F.col("event_id") % 10 == 0,
               F.lit("last message repeated 2 times"))
        .otherwise(F.col("event_type")).alias("msg"),
    )
    lastmsg = pmlastmsg_expand(src).groupBy(
        F.col("hostname").cast("string").alias("k1"),
        F.col("msg").alias("k2"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"),
          F.lit(None).cast("long").alias("extra"))

    return (
        cisco.select(F.lit("cisco").alias("kind"), "k1", "k2", "cnt",
                     "extra")
        .unionByName(lastmsg.select(F.lit("lastmsg").alias("kind"),
                                    "k1", "k2", "cnt", "extra"))
    )


@q(
    "enrich_dims",
    """
    WITH facts AS (
      SELECT event_id,
             CAST(10 * 16777216 + (user_id % 256) * 65536
                  + (event_id % 256) * 256 + (event_id * 7) % 256 AS BIGINT) AS ipnum
      FROM events
    )
    SELECT 'geoip' AS kind,
           CASE WHEN ipnum BETWEEN 167772160 AND 171966463 THEN 'dc-west'
                WHEN ipnum BETWEEN 171966464 AND 176160767 THEN 'dc-east'
                ELSE NULL END AS key,
           COUNT(*) AS cnt,
           CAST(NULL AS DOUBLE) AS sum_value
    FROM facts
    GROUP BY 2
    UNION ALL
    SELECT 'k8s' AS kind, n.n_name AS key, COUNT(*) AS cnt,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e LEFT JOIN nation n
      ON CAST(e.user_id % 25 AS INT) = n.n_nationkey
    GROUP BY n.n_name
    UNION ALL
    SELECT 'dns' AS kind,
           'host-' || CAST(user_id % 200 AS VARCHAR) || '.example' AS key,
           COUNT(*) AS cnt,
           CAST(NULL AS DOUBLE) AS sum_value
    FROM events GROUP BY 2
    """,
    doc="Dimension-enrichment battery, three join shapes on one "
        "union: mmdblookup analog — IP-in-range broadcast join "
        "against a GeoIP-style dim, fact side never shuffles (ref: "
        "plugins/mmdblookup); mmkubernetes-shape TTL-cached refresh "
        "dimension + broadcast stream-static join (ref: contrib/"
        "mmkubernetes/mmkubernetes.c; operators/dimension.py "
        "RefreshingDim); dnscache — distinct-IP dimension resolved "
        "once through the injected resolver and broadcast-joined "
        "back, a million rows from one sender cost one resolution "
        "(ref: runtime/dnscache.c).",
)
def enrich_dims(spark, sf_dir):
    from rsyslog_spark.operators.dimension import (
        RefreshingDim, dnscache_enrich, refreshing_dim_join,
    )
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
    geo = geoip_range_join(facts, "ip", ranges).groupBy(
        F.col("region").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.lit(None).cast("double").alias("sum_value"))

    k8s_facts = ev.withColumn(
        "n_nationkey", (F.col("user_id") % 25).cast("int"))
    dim = RefreshingDim(
        lambda s: load(s, sf_dir, "nation")
        .select("n_nationkey", F.col("n_name").alias("pod_ns")),
        ttl_seconds=3600,
    )
    k8s = refreshing_dim_join(k8s_facts, dim, on="n_nationkey").groupBy(
        F.col("pod_ns").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"))

    dns_src = ev.select(
        F.concat(F.lit("10.0.0."), (F.col("user_id") % 200).cast("string"))
        .alias("fromhost_ip"),
        F.lit(None).cast("string").alias("fromhost"),
    )
    dns = dnscache_enrich(dns_src).groupBy(
        F.col("fromhost").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.lit(None).cast("double").alias("sum_value"))

    return (
        geo.select(F.lit("geoip").alias("kind"), "key", "cnt", "sum_value")
        .unionByName(k8s.select(F.lit("k8s").alias("kind"), "key", "cnt",
                                "sum_value"))
        .unionByName(dns.select(F.lit("dns").alias("kind"), "key", "cnt",
                                "sum_value"))
    )


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



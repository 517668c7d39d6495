"""Stateful/aggregation operator queries: dynstats, percentiles,
rate limiting, repeated-message reduction, sender tracking, counters,
action exec controls (batch forms; streaming forms in streaming/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark.operators.stats import (
    action_every_nth, dynstats_counts, exec_once_every_interval,
    mmcount_ordered, mmsequence, percentile_stats, ratelimit_batch,
    repeated_msg_reduction,
)
from rsyslog_spark.queries import Query, load

QUERIES: list[Query] = []


def q(name, oracle, doc=""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn
    return deco


@q(
    "dynstats_hourly",
    """
    SELECT event_type, date_trunc('hour', ts) AS window_start,
           COUNT(*) AS cnt,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM events GROUP BY 1, 2
    """,
    doc="dyn_stats counter bucket keyed by event type, 1h windows "
        "(ref: runtime/dynstats.c:43-46,303-351; dyn_inc), with the "
        "first message per key per interval computed in the SAME "
        "aggregation (one shuffle, single Exchange — the "
        "execOnlyOnceEveryInterval operator itself stays covered by "
        "action_exec_controls).",
)
def dynstats_hourly(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return dynstats_counts(
        ev, "event_type", "ts", "1 hour",
        extra_aggs=(F.min("event_id").cast("long").alias("first_event"),))


@q(
    "dynstats_maxcard_overflow",
    """
    WITH counted AS (
      SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1
    ), ranked AS (
      SELECT event_type, cnt, DENSE_RANK() OVER (ORDER BY event_type) AS rk
      FROM counted
    )
    SELECT CASE WHEN rk <= 3 THEN event_type ELSE 'ops_overflow' END AS event_type,
           CAST(SUM(cnt) AS BIGINT) AS cnt
    FROM ranked GROUP BY 1
    """,
    doc="dynstats maxCardinality overflow: keys beyond the cap fold "
        "into ops_overflow (ref: dynstats.c:303-351 ops_overflow).",
)
def dynstats_maxcard_overflow(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return dynstats_counts(ev, "event_type", max_cardinality=3) \
        .withColumn("cnt", F.col("cnt").cast("long"))


@q(
    "percentile_stats_values",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99,
           ROUND(MIN(value), 6) AS min,
           ROUND(MAX(value), 6) AS max,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type
    """,
    doc="perctile_stats buckets: exact percentiles + min/max/count "
        "(ref: runtime/perctile_stats.h:52-77; percentile_observe). "
        "Streaming/sketch path uses percentile_approx (t-digest).",
)
def percentile_stats_values(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = percentile_stats(ev, "event_type", "value", [0.5, 0.95, 0.99],
                           exact=True)
    return out.select(
        "event_type",
        F.round("p50", 6).alias("p50"),
        F.round("p95", 6).alias("p95"),
        F.round("p99", 6).alias("p99"),
        F.round("min", 6).alias("min"),
        F.round("max", 6).alias("max"),
        F.col("cnt"),
    )


@q(
    "sendertrack_ratelimit",
    """
    WITH bucketed AS (
      SELECT user_id, event_id, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, FLOOR(epoch(ts) / 600)
               ORDER BY event_id) AS rn
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS msg_count,
           MIN(ts) AS first_seen, MAX(ts) AS last_seen,
           CAST(SUM(CASE WHEN rn <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS passed,
           CAST(SUM(CASE WHEN rn > 2 THEN 1 ELSE 0 END) AS BIGINT) AS dropped
    FROM bucketed GROUP BY user_id
    """,
    doc="Per-sender battery on one shuffle: omsendertrack stats — "
        "count/first/last per sender (ref: plugins/omsendertrack/"
        "omsendertrack.c:1-8) — and ratelimit interval=10min burst=2 "
        "per source (ref: runtime/ratelimit.h:62-108, per-source "
        "shards).",
)
def sendertrack_ratelimit(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # ONE exchange end to end (r11; was 4 + a join): repartition on
    # the sender key — HashPartitioning(user_id) satisfies the
    # ratelimit window's (user_id, bucket) clustering, and Window
    # preserves it, so the sendertrack/passed/dropped aggregation
    # runs on the SAME partitioning with no further shuffle. The
    # former two-branch form (sendertrack ⋈ ratelimit counts) is
    # algebraically one groupBy over the flagged frame: every sender
    # in the track branch appears in the ratelimit branch (same
    # source rows), so the left join is the identity merge.
    flagged = ratelimit_batch(ev.repartition("user_id"), ["user_id"],
                              "ts", "10 minutes", burst=2,
                              order_col="event_id")
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("msg_count"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.sum(F.when(F.col("rl_pass"), 1).otherwise(0)).cast("long")
        .alias("passed"),
        F.sum(F.when(~F.col("rl_pass"), 1).otherwise(0)).cast("long")
        .alias("dropped"),
    )


@q(
    "repeated_msg_reduction_runs",
    """
    WITH flagged AS (
      SELECT user_id, event_type, event_id,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS new_run
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ), runs AS (
      SELECT user_id, event_type, event_id,
             SUM(new_run) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    )
    SELECT user_id, event_type,
           COUNT(*) AS repeat_count,
           CAST(MIN(event_id) AS BIGINT) AS first_seen,
           CAST(MAX(event_id) AS BIGINT) AS last_seen
    FROM runs GROUP BY user_id, event_type, run_id
    """,
    doc="$RepeatedMsgReduction: collapse consecutive identical "
        "messages per sender into count rows (ref: runtime/action.h:"
        "63,88; pmlastmsg is the inverse op).",
)
def repeated_msg_reduction_runs(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return repeated_msg_reduction(ev, ["user_id"], "event_type", "event_id")


@q(
    "mm_seq_count",
    """
    SELECT event_id, event_type,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS BIGINT) AS seq,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS BIGINT) AS mmcount
    FROM events WHERE event_id < 500
    """,
    doc="mmsequence per-key counters (ref: contrib/mmsequence/"
        "mmsequence.c:1-2) and mmcount per-key running message count "
        "(ref: contrib/mmcount/mmcount.c:1-2,44) attached to each row "
        "— independent operator code paths cross-checked on one "
        "frame, one window partitioning.",
)
def mm_seq_count(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    seq = mmsequence(ev, "event_id", key_col="event_type")
    out = mmcount_ordered(seq, "event_type", "event_id")
    return out.select(
        "event_id", "event_type",
        F.col("seq").cast("long").alias("seq"),
        F.col("mmcount").cast("long").alias("mmcount"),
    )


@q(
    "action_exec_controls",
    """
    WITH nth AS (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
      FROM events
    ),
    every3 AS (
      SELECT event_type, COUNT(*) AS n_every_3rd
      FROM nth WHERE rn % 3 = 0 GROUP BY event_type
    ),
    once AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_first_hourly,
             CAST(SUM(event_id) AS BIGINT) AS sum_first_ids
      FROM (
        SELECT event_type, event_id,
               ROW_NUMBER() OVER (
                 PARTITION BY event_type, date_trunc('hour', ts)
                 ORDER BY event_id) AS rn
        FROM events)
      WHERE rn = 1 GROUP BY event_type
    )
    SELECT every3.event_type, n_every_3rd, n_first_hourly, sum_first_ids
    FROM every3 JOIN once ON every3.event_type = once.event_type
    """,
    doc="execOnlyEveryNthTime sampling (ref: runtime/action.h:82-84) "
        "plus execOnlyOnceEveryInterval — first message per key per "
        "1h interval (ref: runtime/action.h:68); both exec-control "
        "operators verified in one query.",
)
def action_exec_controls(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # one exchange for both exec-control branches and the final join:
    # hash(event_type) satisfies the every-nth window, the
    # (event_type, hour) once-per-interval window, both groupBys and
    # the join distribution (see sendertrack_ratelimit)
    ev = ev.repartition("event_type")
    sampled = action_every_nth(ev, 3, ["event_type"], "event_id")
    every3 = sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_every_3rd")
    )
    firsts = exec_once_every_interval(ev, "1 hour", "ts",
                                      ["event_type"], "event_id")
    once = firsts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_first_hourly"),
        F.sum("event_id").cast("long").alias("sum_first_ids"),
    )
    return every3.join(once, "event_type")




@q(
    "sessionize_stats",
    """
    WITH lagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_id
      FROM lagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts)))
                AS BIGINT) AS duration_s
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Gaps-and-islands sessionization + per-session aggregates "
        "(operators/stats.py sessionize/session_stats — the "
        "log-analytics staple the reference leaves to downstream "
        "SQL, SURVEY §2.10). ONE shuffle on the key: lag gap-detect "
        "and running-sum island numbering share the partitioning, "
        "the groupBy rides it. Streaming twin uses native "
        "session_window (e2e-tested in test_streaming).",
)
def sessionize_stats(spark, sf_dir):
    from rsyslog_spark.operators.stats import session_stats

    ev = load(spark, sf_dir, "events")
    out = session_stats(ev, ["user_id"], "ts", gap="10 minutes")
    return out.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "n_events", "session_start", "session_end",
        F.col("duration_s").cast("long").alias("duration_s"))


@q(
    "dynstats_lifecycle_totals",
    """
    WITH per AS (
      SELECT event_type AS key, date_trunc('hour', ts) AS w,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), seg AS (
      SELECT key, w, cnt,
             CASE WHEN lag(w) OVER win IS NULL
                    OR w > lag(w) OVER win + INTERVAL 1 HOUR
                  THEN 1 ELSE 0 END AS s
      FROM per
      WINDOW win AS (PARTITION BY key ORDER BY w)
    )
    SELECT key, CAST(SUM(cnt) AS BIGINT) AS cnt, COUNT(*) AS n_windows,
           CAST(SUM(s) AS BIGINT) AS new_metric_add,
           MIN(w) AS first_window, MAX(w) AS last_window,
           CAST(SUM(s) AS BIGINT) AS metrics_purged
    FROM seg GROUP BY key
    """,
    doc="dyn_stats metric lifecycle totals (ref: runtime/dynstats.c "
        "unusedMetricLife + new_metric_add/metrics_purged counters; "
        "golden scenario tests/dynstats_reset.sh): appearance "
        "windows split into segments at idle gaps past the metric "
        "life — each segment is one add and one purge, and segment "
        "sums match the reference's per-flush counter totals. One "
        "(key,window) partial-agg shuffle; the lag+final agg runs "
        "over the reduced per-window frame.",
)
def dynstats_lifecycle_totals(spark, sf_dir):
    from rsyslog_spark.operators.stats import dynstats_lifecycle

    ev = load(spark, sf_dir, "events")
    return dynstats_lifecycle(ev, "event_type", "ts",
                              interval="1 hour", life_windows=1)


@q(
    "impstats_action_counters",
    """
    WITH agg AS (
      SELECT 'act_' || event_type AS action,
             COUNT(*) AS submitted
      FROM events GROUP BY 1
    )
    SELECT action,
           CAST(LEAST(submitted, 1000) AS BIGINT) AS processed,
           CAST(0 AS BIGINT) AS failed,
           CAST(0 AS BIGINT) AS suspended,
           CAST(0 AS BIGINT) AS resumed,
           CAST(submitted - LEAST(submitted, 1000) AS BIGINT)
               AS ratelimit_dropped,
           action || ': origin=core.action processed=' ||
           CAST(LEAST(submitted, 1000) AS VARCHAR) ||
           ' failed=0 suspended=0 suspended.duration=0 resumed=0' ||
           ' ratelimit.dropped=' ||
           CAST(submitted - LEAST(submitted, 1000) AS VARCHAR)
               AS line
    FROM agg
    """,
    doc="impstats per-action counter snapshot in the reference's "
        "LEGACY line format (ref: runtime/action.c:485-515 statsobj "
        "counter set; plugins/impstats format=legacy rendering "
        "`name: origin=core.action k=v ...`; output-ratelimit "
        "counters per ChangeLog 2026-07-06). Events route to one "
        "action per event_type; burst=1000 exercises the "
        "allowed/dropped split. One partial-agg shuffle on the "
        "action key; the line render is column concat over the "
        "aggregated tiny frame.",
)
def impstats_action_counters(spark, sf_dir):
    from rsyslog_spark.streaming.impstats import action_counters_frame

    ev = load(spark, sf_dir, "events")
    routed = ev.select(
        F.concat(F.lit("act_"), F.col("event_type")).alias("action"))
    return action_counters_frame(routed, "action", burst=1000)

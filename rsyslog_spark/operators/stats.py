"""Aggregation & stateful operators — batch (window-function) forms.

Streaming (transformWithState) forms live in rsyslog_spark/streaming/.
These batch forms define the exact semantics (and serve as the
DuckDB-oracle-checkable surface); the streaming forms reuse them per
micro-batch where possible.

Scale notes: every groupBy here shuffles on its key — the keys chosen
(bucket, sender, type) are the reference's own sharding keys
(ratelimit per-source shards, dynstats buckets), which are
high-cardinality and well distributed in real log traffic, so the
shuffle partitions evenly; AQE skew-join/partition-coalescing handles
the hot-key tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dynstats_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str | None = None,
    window: str | None = None,
    max_cardinality: int | None = None,
    extra_aggs: tuple = (),
) -> DataFrame:
    """dyn_stats counter buckets (ref: runtime/dynstats.c:43-46,303-351):
    named counters keyed by an arbitrary string, optionally windowed.

    Output: (key [, window_start]) → cnt. maxCardinality overflow is
    modeled by ranking keys by first-seen order and folding the
    overflow into key='ops_overflow' (ref dynstats ops_overflow
    counter).

    ``extra_aggs``: additional aggregate Columns computed in the SAME
    groupBy — callers needing e.g. first-message-per-bucket get it
    for free in the one shuffle instead of a second agg + join.
    Incompatible with max_cardinality (the overflow fold re-aggregates
    and can't merge arbitrary aggs).
    """
    if extra_aggs and max_cardinality is not None:
        raise ValueError("extra_aggs cannot be combined with "
                         "max_cardinality (overflow fold re-aggregates)")
    g = [F.col(key_col)]
    if window is not None:
        assert ts_col is not None
        g.append(F.window(F.col(ts_col), window)["start"].alias("window_start"))
    counted = df.groupBy(*g).agg(F.count(F.lit(1)).alias("cnt"),
                                 *extra_aggs)
    if max_cardinality is not None:
        w = Window.orderBy(F.col(key_col))
        ranked = counted.withColumn("__rank", F.dense_rank().over(w))
        counted = (
            ranked.withColumn(
                key_col,
                F.when(F.col("__rank") <= max_cardinality, F.col(key_col))
                .otherwise(F.lit("ops_overflow")),
            )
            .groupBy(*[F.col(c) for c in ([key_col, "window_start"] if window else [key_col])])
            .agg(F.sum("cnt").alias("cnt"))
        )
    return counted


def dynstats_lifecycle(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    interval: str = "1 hour",
    life_windows: int = 1,
) -> DataFrame:
    """dyn_stats metric lifecycle (ref: runtime/dynstats.c
    unusedMetricLife eviction + the new_metric_add / metrics_purged
    lifecycle counters impstats reports; golden scenario:
    tests/dynstats_reset.sh — bursts separated by idle > life yield
    one add AND one purge per burst segment, and the per-flush
    counter SUMS equal the true totals).

    Batch form over event time: a key's appearance windows split into
    SEGMENTS wherever the idle gap exceeds ``life_windows`` full
    intervals; each segment is one metric add and (once idle) one
    purge. Output per key: total cnt, n_windows, new_metric_add
    (= segments = metrics_purged), first/last window.

    Plan: one (key, window) partial-agg shuffle over events, then a
    lag window + final agg over the REDUCED per-window frame (rows =
    active keys × windows, not events) — the second exchange carries
    near-nothing at any scale.
    """
    win = F.window(F.col(ts_col), interval)["start"]
    per = df.groupBy(F.col(key_col).alias("key"),
                     win.alias("w")) \
        .agg(F.count(F.lit(1)).alias("cnt"))
    lw = F.lag("w").over(Window.partitionBy("key").orderBy("w"))
    n, unit = interval.split()
    gap_limit = F.expr(f"INTERVAL {life_windows * int(n)} {unit}")
    seg_start = F.when(
        lw.isNull() | (F.col("w") > lw + gap_limit), 1).otherwise(0)
    return (per.withColumn("__seg", seg_start)
            .groupBy("key")
            .agg(F.sum("cnt").alias("cnt"),
                 F.count(F.lit(1)).alias("n_windows"),
                 F.sum("__seg").alias("new_metric_add"),
                 F.min("w").alias("first_window"),
                 F.max("w").alias("last_window"))
            .withColumn("metrics_purged", F.col("new_metric_add")))


def percentile_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    percentiles: list[float] = (0.5, 0.95, 0.99),
    exact: bool = True,
    window_size: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """perctile_stats buckets (ref: runtime/perctile_stats.h:52-77):
    per-key percentiles + min/max/count.

    exact=True uses ``percentile`` (exact, needs a per-key sort —
    fine for dashboard-sized key counts); exact=False uses
    ``percentile_approx`` (t-digest sketch, one pass, mergeable —
    the 100 TB path; bounded memory per key).

    ``window_size`` reproduces the reference's per-key ring buffer
    (runtime/perctile_ringbuf.c): only the LAST ``window_size``
    observations per key (by ``order_col``, required) enter the
    stats — a row_number window over the same key partitioning the
    aggregation shuffles on anyway.
    """
    if window_size is not None:
        if order_col is None:
            raise ValueError("window_size needs order_col (recency)")
        w = Window.partitionBy(F.col(key_col)) \
            .orderBy(F.col(order_col).desc())
        df = df.withColumn("__rb_rn", F.row_number().over(w)) \
            .filter(F.col("__rb_rn") <= window_size).drop("__rb_rn")
    if exact == "ref":
        # the reference's NEAREST-RANK pick (perctile_stats.c:434:
        # index = max(0, (p/100 * count) - 1) into the SORTED window)
        # — not interpolating. collect_list is bounded by the window
        # size (the ring buffer's analog), so per-key memory is
        # capped like the reference's.
        sarr = F.sort_array(F.collect_list(F.col(value_col)))
        cnt = F.size(sarr)
        aggs = []
        for p in percentiles:
            idx = F.greatest(
                F.lit(0),
                F.floor(F.lit(float(p)) / 100.0 * cnt - 1)
            ).cast("int") + 1
            aggs.append(F.try_element_at(sarr, idx)
                        .alias(f"p{int(p)}"))
        aggs += [
            F.min(value_col).alias("window_min"),
            F.max(value_col).alias("window_max"),
            F.sum(value_col).alias("window_sum"),
            F.count(F.lit(1)).alias("window_count"),
        ]
        return df.groupBy(key_col).agg(*aggs)
    fn = F.percentile if exact else F.percentile_approx
    aggs = [
        fn(F.col(value_col), F.lit(p)).alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    aggs += [
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
        F.count(F.lit(1)).alias("cnt"),
    ]
    return df.groupBy(key_col).agg(*aggs)


def ratelimit_batch(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    interval: str,
    burst: int,
    order_col: str | None = None,
) -> DataFrame:
    """Token-bucket rate limit, batch form (ref: runtime/ratelimit.h:
    62-108: interval+burst, per-source shards).

    Within each (key, interval-window) the first ``burst`` rows pass;
    the rest are dropped. Adds boolean ``rl_pass``. Ordering inside
    the window follows ``order_col`` (default: ts, then arbitrary but
    deterministic tiebreak is caller's job).
    """
    bucket = F.window(F.col(ts_col), interval)["start"]
    order = [F.col(order_col)] if order_col else [F.col(ts_col)]
    w = Window.partitionBy(*[F.col(k) for k in key_cols], bucket).orderBy(*order)
    return df.withColumn("rl_pass", F.row_number().over(w) <= burst)


def ratelimit_notices(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    interval: str,
    burst: int,
    msg_col: str = "msg",
    order_col: str | None = None,
) -> DataFrame:
    """Rate limit WITH the reference's drop notices (ref: runtime/
    ratelimit.c ratelimitMsg — 'begin to drop messages' on first
    excess, '<n> messages lost' when the interval rolls over).

    Returns the passing rows plus one same-schema summary row per
    (key, window) that dropped anything, carrying the dropped count
    in its message — the operational breadcrumb operators rely on.
    One shuffle on (key, window); the notice aggregation reuses it.
    """
    bucket = F.window(F.col(ts_col), interval)["start"]
    order = [F.col(order_col)] if order_col else [F.col(ts_col)]
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys, bucket).orderBy(*order)
    flagged = df.withColumn("rl_pass", F.row_number().over(w) <= burst) \
        .withColumn("__bucket", bucket)
    passed = flagged.filter(F.col("rl_pass"))
    key_desc = F.concat_ws("/", *[F.col(k).cast("string")
                                  for k in key_cols])
    notices = (
        flagged.filter(~F.col("rl_pass"))
        .groupBy(*keys, F.col("__bucket"))
        .agg(F.min_by(F.struct(*flagged.columns), F.col(ts_col))
             .alias("__first"),
             F.count(F.lit(1)).alias("__n"),
             F.max(ts_col).alias("__last"))
        .select(F.col("__first")
                .withField(msg_col, F.format_string(
                    "%d messages lost due to rate-limiting (%s)",
                    F.col("__n"), key_desc))
                .withField(ts_col, F.col("__last"))
                .withField("rl_pass", F.lit(True))
                .alias("__s"))
        .select("__s.*")
    )
    return passed.unionByName(notices).drop("__bucket", "rl_pass")


def repeated_msg_reduction(
    df: DataFrame,
    key_cols: list[str],
    msg_col: str,
    order_col: str,
) -> DataFrame:
    """$RepeatedMsgReduction (ref: runtime/action.h:63,88): collapse
    runs of consecutive identical messages per key into one row with a
    repeat count (the sink renders 'last message repeated n times').

    Classic gaps-and-islands: flag run starts with lag(), prefix-sum
    the flags into run ids, aggregate per run. Two window passes over
    the same (key, order) partitioning — one shuffle, reused.
    """
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(F.col(order_col))
    flagged = df.withColumn(
        "__new_run",
        F.when(
            F.lag(F.col(msg_col)).over(w).isNull()
            | (F.lag(F.col(msg_col)).over(w) != F.col(msg_col)),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn("__run", F.sum("__new_run").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    return (
        runs.groupBy(*[F.col(k) for k in key_cols], F.col("__run"), F.col(msg_col))
        .agg(
            F.count(F.lit(1)).alias("repeat_count"),
            F.min(order_col).alias("first_seen"),
            F.max(order_col).alias("last_seen"),
        )
        .drop("__run")
    )


def repeated_msg_collapse(
    df: DataFrame,
    key_cols: list[str],
    msg_col: str = "msg",
    order_col: str = "timereported",
) -> DataFrame:
    """$RepeatedMsgReduction in OUTPUT shape (ref: runtime/action.h:
    63,88 and classic sysklogd behavior): runs of consecutive
    identical messages per key collapse to the FIRST row of the run,
    followed — when the run length n > 1 — by a same-schema row whose
    message is 'last message repeated n times' stamped with the run's
    last timestamp. Unlike :func:`repeated_msg_reduction` (an
    aggregation view), this keeps the frame's schema so it can sit
    inline in a ruleset pipeline before the actions.

    Same gaps-and-islands shape: one shuffle on (key), two window
    passes reusing it, then a map-side-combinable groupBy per run.
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col))
    flagged = df.withColumn(
        "__new_run",
        F.when(
            F.lag(F.col(msg_col)).over(w).isNull()
            | (F.lag(F.col(msg_col)).over(w) != F.col(msg_col)),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn("__run", F.sum("__new_run").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    agg = runs.groupBy(*keys, F.col("__run")).agg(
        F.min_by(F.struct(*df.columns), F.col(order_col)).alias("__first"),
        F.count(F.lit(1)).alias("__n"),
        F.max(order_col).alias("__last"),
    )
    first_rows = agg.select("__first.*")
    summaries = (
        agg.filter(F.col("__n") > 1)
        .select(
            F.col("__first")
            # N = the SUPPRESSED count (run length minus the first
            # row already emitted) — sysklogd's convention, and what
            # pmlastmsg_expand inverts: first + N copies = run length
            .withField(msg_col, F.format_string(
                "last message repeated %d times", F.col("__n") - 1))
            .withField(order_col, F.col("__last"))
            .alias("__s"))
        .select("__s.*")
    )
    return first_rows.unionByName(summaries)


def sendertrack(
    df: DataFrame, sender_col: str, ts_col: str
) -> DataFrame:
    """omsendertrack (ref: plugins/omsendertrack/omsendertrack.c:1-8):
    per-sender message count + first/last seen. Plain partial-agg
    groupBy — map-side combine makes this cheap at any scale."""
    return df.groupBy(sender_col).agg(
        F.count(F.lit(1)).alias("msg_count"),
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
    )


def mmcount(df: DataFrame, key_col: str, out_col: str = "mmcount") -> DataFrame:
    """mmcount (ref: contrib/mmcount/mmcount.c:1-2,44): running count
    of messages per key value, attached to each row. In the reference
    this is an incrementing counter as messages flow; the batch
    equivalent numbers rows per key in arrival order."""
    w = Window.partitionBy(key_col).orderBy(F.monotonically_increasing_id())
    return df.withColumn(out_col, F.row_number().over(w))


def mmcount_ordered(df: DataFrame, key_col: str, order_col: str,
                    out_col: str = "mmcount") -> DataFrame:
    """Deterministic mmcount for testing: explicit arrival order."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col))
    return df.withColumn(out_col, F.row_number().over(w))


def mmsequence(df: DataFrame, order_col: str, key_col: str | None = None,
               out_col: str = "seq") -> DataFrame:
    """mmsequence (ref: contrib/mmsequence/mmsequence.c:1-2):
    monotonically increasing sequence, optionally per key.

    Note: a global row_number() forces all data through ONE partition —
    unusable at scale. Global mode therefore uses zipWithIndex-style
    ``monotonically_increasing_id`` ordering only when order_col is a
    natural monotone (the per-key form is the scalable one the
    reference is actually used for)."""
    if key_col is not None:
        w = Window.partitionBy(key_col).orderBy(F.col(order_col))
    else:
        w = Window.orderBy(F.col(order_col))
    return df.withColumn(out_col, F.row_number().over(w))


def action_every_nth(df: DataFrame, n: int, key_cols: list[str],
                     order_col: str) -> DataFrame:
    """execOnlyEveryNthTime (ref: runtime/action.h:82-84): keep every
    n-th message per key."""
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(F.col(order_col))
    return df.withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") % n == 0).drop("__rn")


def exec_once_every_interval(df: DataFrame, interval: str, ts_col: str,
                             key_cols: list[str], order_col: str) -> DataFrame:
    """execOnlyOnceEveryInterval (ref: runtime/action.h:68): first
    message per key per time interval."""
    bucket = F.window(F.col(ts_col), interval)["start"]
    w = Window.partitionBy(*[F.col(k) for k in key_cols], bucket) \
        .orderBy(F.col(order_col))
    return df.withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") == 1).drop("__rn")


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: assign each row a per-key
    session number that increments whenever the gap to the previous
    event exceeds ``gap`` — the log-analytics staple (user sessions,
    incident windows, connection episodes) the reference leaves to
    downstream SQL (SURVEY §2.10 extensions).

    Batch shape: ONE shuffle on the key (both window functions share
    the same partitioning: lag to detect gap starts, running sum to
    number the islands). For the streaming form use
    :func:`session_stats` with ``streaming=True`` — Spark's native
    ``session_window`` keeps watermark-bounded state.
    """
    w = Window.partitionBy(*[F.col(k) for k in key_cols]) \
        .orderBy(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str = "30 minutes",
    *,
    streaming: bool = False,
    watermark: str | None = None,
) -> DataFrame:
    """Per-session aggregates: (keys, session bounds, event count,
    duration seconds).

    ``streaming=True`` uses Spark's native ``session_window`` (state
    merges adjacent windows within gap; watermark bounds state) —
    give ``watermark`` for the event-time column. Batch mode derives
    the same result via :func:`sessionize` + groupBy.
    """
    if streaming:
        src = df
        if watermark is not None:
            src = src.withWatermark(ts_col, watermark)
        g = src.groupBy(F.session_window(F.col(ts_col), gap),
                        *[F.col(k) for k in key_cols])
        return g.agg(F.count(F.lit(1)).alias("n_events")).select(
            *key_cols,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events")
    with_sid = sessionize(df, key_cols, ts_col, gap)
    return (with_sid.groupBy(*key_cols, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"))
            .withColumn(
                "duration_s",
                F.unix_timestamp("session_end")
                - F.unix_timestamp("session_start")))


# --- dynstats state persistence (ref: runtime/dynstats.c:382-520
# persistBucketState/loadPersistedState; dyn_stats params
# persistStateInterval + statefile.directory; golden
# tests/dynstats-persist.sh) ------------------------------------------

def dynstats_state_path(bucket: str, directory: str) -> str:
    """State file path: ``<dir>/dynstats-state:<bucket>`` — slashes in
    the bucket name sanitize to '_' (dynstats.c getStateFileName
    path-traversal protection)."""
    import os
    return os.path.join(directory,
                        "dynstats-state:" + bucket.replace("/", "_"))


def dynstats_load_state(bucket: str, directory: str) -> dict:
    """Read persisted counters; missing/unreadable file → {} (the
    reference warns and continues fresh, dynstats.c:441-448).
    Format: ``{"name": "<bucket>", "values": {"foo": 1}}``."""
    import json
    try:
        with open(dynstats_state_path(bucket, directory),
                  encoding="utf-8") as fh:
            obj = json.load(fh)
        return {str(k): int(v)
                for k, v in (obj.get("values") or {}).items()}
    except (OSError, ValueError):
        return {}


def dynstats_save_state(bucket: str, directory: str,
                        values: dict) -> str:
    """Write the bucket's counters in the reference's exact JSON
    shape (persistBucketState: name + int64 values)."""
    import json
    import os
    os.makedirs(directory, exist_ok=True)
    path = dynstats_state_path(bucket, directory)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump({"name": bucket,
                   "values": {k: int(v) for k, v in values.items()}},
                  fh)
    return path

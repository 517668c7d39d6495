"""Query registry: every implemented operator exposed as a
(spark_fn, oracle_sql) pair for the driver's DuckDB correctness gate.

Each module registers Query objects; ALL_QUERIES collects them.
Convention: column names are aliased identically in the Spark plan
and the oracle SQL; float outputs are rounded (the driver hashes
values); integer outputs are BIGINT on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # None → driver's weaker rows-only check
    doc: str = ""


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a driver table; normalizes the events table's
    TIMESTAMP(NANOS) column (Spark reads nanos as long via the legacy
    conf — set at runtime so the driver's own session works too).

    Parallelism: the driver's test parquet is one file with ONE row
    group per table, so the scan yields a single task no matter how
    many cores exist. For fact-sized tables we repartition up to the
    cluster's default parallelism — a few-MB shuffle that unlocks all
    cores for the regex/string-heavy pipelines. On a real cluster the
    scan already has >= cores partitions (many files / row groups) and
    this is a no-op; dimension tables stay single-partition so they
    keep broadcasting.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{table}.parquet"
    df = spark.read.parquet(path)
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    try:
        big_enough = os.path.getsize(path) > 256 * 1024
    except OSError:
        big_enough = False
    if big_enough:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def collect_all() -> dict[str, Query]:
    from rsyslog_spark.queries import core, enrich, stats_q, llm, tpch

    out: dict[str, Query] = {}
    for mod in (core, enrich, stats_q, llm, tpch):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    return out

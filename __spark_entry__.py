"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship render→parse→route pipeline on sf0.001;
queries()/oracle_sql() expose every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline operators) for the
driver's DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rsyslog_spark.queries import collect_all  # noqa: E402

_ALL = collect_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _ALL["flagship_parse_route"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in _ALL.items() if q.oracle is not None}

"""PRI parsing: ``<165>`` prefix → pri/facility/severity.

ref: runtime/parser.c:575 (ParsePRI). Missing/invalid PRI defaults to
13 = user.notice (LOG_USER|LOG_NOTICE), the reference's DEFUPRI.
Facility = pri >> 3, severity = pri & 7 — pure integer ops, no
string work survives past the single regexp_extract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_str

DEFAULT_PRI = 13  # user.notice (ref: tools/rsyslogd.c DEFUPRI)


def pri_col(line: ColumnOrName) -> Column:
    """Extract PRI number; DEFAULT_PRI when absent or out of range."""
    raw = F.regexp_extract(rs_str(line), r"^<(\d{1,3})>", 1)
    n = (raw).try_cast("int")
    return (
        F.when(n.isNotNull() & (n <= 191), n).otherwise(F.lit(DEFAULT_PRI))
    )


def strip_pri(line: ColumnOrName) -> Column:
    """Line with the ``<PRI>`` prefix removed (if present)."""
    return F.regexp_replace(rs_str(line), r"^<\d{1,3}>", "")


def parse_pri(df, line_col: str = "line"):
    """Add pri/syslogfacility/syslogseverity columns from a raw line."""
    pri = pri_col(line_col)
    return (
        df.withColumn("pri", pri)
        .withColumn("syslogfacility", F.shiftright(F.col("pri"), 3))
        .withColumn("syslogseverity", F.col("pri").bitwiseAND(F.lit(7)))
    )

"""PRI parsing: ``<165>`` prefix → pri/facility/severity.

ref: runtime/parser.c:543-608 (compute_off_after_pri +
parserParsePRI). A line with NO leading '<' gets DEFUPRI (13 =
user.notice). A line that STARTS with '<' but fails PRI parsing —
malformed bracket, 4+ digits, or a 3-digit value above 191 — gets
LOG_PRI_INVLD = 199 (facility 24 "invld", severity 7), and the
bracket is NOT stripped (msgSetAfterPRIOffs(pMsg, 0)): the header
parse sees the raw line. Facility = pri >> 3, severity = pri & 7 —
pure integer ops, no string work survives past the single
regexp_extract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_str

DEFAULT_PRI = 13   # user.notice (ref: tools/rsyslogd.c DEFUPRI)
INVLD_PRI = 199    # LOG_PRI_INVLD = (24 << 3) | 7 (rsyslog.h:320)

#: a VALID PRI prefix: 1-3 digits valued 0..191 (compute_off_after_pri
#: accepts leading zeros — "<013>" is 13)
PRI_VALID_RE = r"^<(?:\d{1,2}|0\d\d|1[0-8]\d|19[01])>"


def pri_col(line: ColumnOrName) -> Column:
    """PRI number; INVLD_PRI for '<'-leading lines that fail the
    parse, DEFAULT_PRI when there is no bracket at all."""
    raw = F.regexp_extract(rs_str(line), r"^<(\d{1,3})>", 1)
    n = (raw).try_cast("int")
    return (
        F.when(n.isNotNull() & (n <= 191), n)
        .when(rs_str(line).startswith("<"), F.lit(INVLD_PRI))
        .otherwise(F.lit(DEFAULT_PRI))
    )


def strip_pri(line: ColumnOrName) -> Column:
    """Line with a VALID ``<PRI>`` prefix removed; an invalid or
    out-of-range bracket stays in place (AfterPRIOffs = 0)."""
    return F.regexp_replace(rs_str(line), PRI_VALID_RE, "")


def parse_pri(df, line_col: str = "line"):
    """Add pri/syslogfacility/syslogseverity columns from a raw line."""
    pri = pri_col(line_col)
    return (
        df.withColumn("pri", pri)
        .withColumn("syslogfacility", F.shiftright(F.col("pri"), 3))
        .withColumn("syslogseverity", F.col("pri").bitwiseAND(F.lit(7)))
    )

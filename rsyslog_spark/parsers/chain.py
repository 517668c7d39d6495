"""Parser chain: first parser that accepts wins.

ref: runtime/parser.c:615-660 (SelectParser loop) with the default
chain rfc5424 → rfc3164 (runtime/parser.c:150-156). rfc3164 is
permissive and accepts anything, so parsesuccess is always true for
the default chain — matching the reference, whose pmrfc3164 never
rejects.

Physical shape: the per-parser field structs are merged with ONE
``when`` at the struct level (the accepted branch is evaluated once
per row), and the merged struct is materialized behind a Generate
barrier (``explode(array(struct))``) before field extraction.
Without the barrier, Catalyst's CollapseProject inlines the struct
into every output column and the whole regex/split/timestamp parse
runs once PER FIELD — ~20x the work; with it, parse cost is
independent of how many of the 22 canonical columns are selected.
Column pruning still reaches the scan (only ``line`` is read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.parsers.rfc3164 import rfc3164_fields
from rsyslog_spark.parsers.rfc5424 import accepts_rfc5424, rfc5424_fields
from rsyslog_spark.schema import SYSLOG_COLUMNS


def _canonical(fields: Column, have: set[str], *, line: Column,
               tgen: Column, proto: int, inputname: str,
               keep_raw: bool, with_uuid: bool) -> Column:
    """Build the full canonical struct from one parser's field struct."""
    null_s = F.lit(None).cast("string")

    def get(name: str) -> Column:
        return fields[name] if name in have else null_s

    return F.struct(
        (line if keep_raw else null_s).alias("rawmsg"),
        get("msg").alias("msg"),
        get("pri").cast("int").alias("pri"),
        get("syslogfacility").cast("int").alias("syslogfacility"),
        get("syslogseverity").cast("int").alias("syslogseverity"),
        get("hostname").alias("hostname"),
        get("hostname").alias("fromhost"),
        null_s.alias("fromhost_ip"),
        F.lit(None).cast("int").alias("fromhost_port"),
        get("syslogtag").alias("syslogtag"),
        get("programname").alias("programname"),
        get("app_name").alias("app_name"),
        get("procid").alias("procid"),
        get("msgid").alias("msgid"),
        F.lit(inputname).alias("inputname"),
        F.coalesce(get("timereported").cast("timestamp"), tgen)
        .alias("timereported"),
        tgen.alias("timegenerated"),
        F.lit(proto).alias("protocol_version"),
        get("structured_data").alias("structured_data"),
        null_s.alias("json"),
        (F.expr("uuid()") if with_uuid else null_s).alias("uuid"),
        F.coalesce(get("parsesuccess"), F.lit(False)).alias("parsesuccess"),
    )


_RFC5424_FIELDS = {
    "pri", "syslogfacility", "syslogseverity", "timereported",
    "hostname", "app_name", "procid", "msgid", "structured_data",
    "msg", "syslogtag", "programname", "parsesuccess",
}
_RFC3164_FIELDS = {
    "pri", "syslogfacility", "syslogseverity", "timereported",
    "hostname", "syslogtag", "programname", "procid", "msg",
    "parsesuccess",
}


def parse_syslog(
    df: DataFrame,
    line_col: str = "line",
    inputname: str = "imfile",
    keep_raw: bool = True,
    with_uuid: bool = False,
) -> DataFrame:
    """Raw lines → canonical syslog frame (SYSLOG_COLUMNS order).

    timegenerated = reception time (we use current_timestamp at parse,
    matching the reference's ttGenTime-at-ingest); timereported falls
    back to timegenerated when the wire timestamp is absent/invalid
    (ref: parser TIME_NOGEN handling).
    """
    line = F.col(line_col)
    tgen = F.current_timestamp()
    common = dict(line=line, tgen=tgen, inputname=inputname,
                  keep_raw=keep_raw, with_uuid=with_uuid)
    s5424 = _canonical(rfc5424_fields(line), _RFC5424_FIELDS, proto=1,
                       **common)
    s3164 = _canonical(rfc3164_fields(line), _RFC3164_FIELDS, proto=0,
                       **common)
    merged = F.when(accepts_rfc5424(line), s5424).otherwise(s3164)

    keep_others = [c for c in df.columns if c != line_col]
    # Generate barrier: one-element explode materializes the struct
    # once per row; CollapseProject cannot inline through Generate.
    exploded = df.select(
        *keep_others, F.explode(F.array(merged)).alias("_parsed")
    )
    return exploded.select(
        *keep_others,
        *[F.col(f"_parsed.{c}").alias(c) for c in SYSLOG_COLUMNS],
    )

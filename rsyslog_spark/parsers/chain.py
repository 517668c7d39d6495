"""Parser chain: first parser that accepts wins.

ref: runtime/parser.c:615-660 (SelectParser loop) with the default
chain rfc5424 → rfc3164 (runtime/parser.c:150-156). rfc3164 is
permissive and accepts anything, so parsesuccess is always true for
the default chain — matching the reference, whose pmrfc3164 never
rejects.

The whole parse is ONE projection (select) over the raw-line frame:
both candidate structs are built lazily inside a ``when`` chain, so
per row only the accepted branch is evaluated; no shuffle, fully
codegen'd, and column pruning drops unused fields at the parquet/text
scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.parsers.rfc3164 import rfc3164_fields
from rsyslog_spark.parsers.rfc5424 import accepts_rfc5424, rfc5424_fields
from rsyslog_spark.schema import SYSLOG_COLUMNS


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
    p5424 = rfc5424_fields(line)
    p3164 = rfc3164_fields(line)
    is5424 = accepts_rfc5424(line)

    def pick(field: str) -> Column:
        in5424 = field in (
            "pri", "syslogfacility", "syslogseverity", "timereported",
            "hostname", "app_name", "procid", "msgid", "structured_data",
            "msg", "syslogtag", "programname", "parsesuccess",
        )
        in3164 = field in (
            "pri", "syslogfacility", "syslogseverity", "timereported",
            "hostname", "syslogtag", "programname", "procid", "msg",
            "parsesuccess",
        )
        if in5424 and in3164:
            return F.when(is5424, p5424[field]).otherwise(p3164[field])
        if in5424:
            return F.when(is5424, p5424[field])
        if in3164:
            return F.when(~is5424, p3164[field])
        return F.lit(None).cast("string")

    tgen = F.current_timestamp()
    cols: dict[str, Column] = {
        "rawmsg": line if keep_raw else F.lit(None).cast("string"),
        "msg": pick("msg"),
        "pri": pick("pri").cast("int"),
        "syslogfacility": pick("syslogfacility").cast("int"),
        "syslogseverity": pick("syslogseverity").cast("int"),
        "hostname": pick("hostname"),
        "fromhost": pick("hostname"),
        "fromhost_ip": F.lit(None).cast("string"),
        "fromhost_port": F.lit(None).cast("int"),
        "syslogtag": pick("syslogtag"),
        "programname": pick("programname"),
        "app_name": pick("app_name"),
        "procid": pick("procid"),
        "msgid": pick("msgid"),
        "inputname": F.lit(inputname),
        "timereported": F.coalesce(pick("timereported").cast("timestamp"), tgen),
        "timegenerated": tgen,
        "protocol_version": F.when(is5424, F.lit(1)).otherwise(F.lit(0)),
        "structured_data": pick("structured_data"),
        "json": F.lit(None).cast("string"),
        "uuid": F.expr("uuid()") if with_uuid else F.lit(None).cast("string"),
        "parsesuccess": F.coalesce(pick("parsesuccess"), F.lit(False)),
    }
    keep_others = [c for c in df.columns if c != line_col]
    return df.select(*keep_others, *[cols[c].alias(c) for c in SYSLOG_COLUMNS])

"""Vendor/special-case parsers (pm* family beyond the RFC pair).

Each is a pure-Column stage applied to the canonical parsed frame —
the Spark analog of inserting the parser into a ruleset's parser
chain (ref: runtime/parser.c:615-660).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# "last message repeated n times" (ref: plugins/pmlastmsg/pmlastmsg.c:1-6)
_REPEAT_RE = r"^\s*last message repeated (\d+) times\s*$"


def pmlastmsg_detect(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """Flag repeat-summary rows and extract their count.

    Adds ``repeat_count`` (NULL for normal rows). The reference parser
    short-circuits the chain for these rows so later parsers don't
    mangle them; here they are already parsed, we just type them.
    """
    cnt = F.regexp_extract(F.col(msg_col), _REPEAT_RE, 1)
    return df.withColumn(
        "repeat_count",
        F.when(cnt != "", cnt.cast("long")),
    )


def pmlastmsg_expand(
    df: DataFrame,
    key_col: str = "hostname",
    order_col: str = "timereported",
    msg_col: str = "msg",
) -> DataFrame:
    """Inverse of repeated-msg reduction: replace each summary row with
    ``repeat_count`` copies of the preceding real message from the same
    host. One window pass (last non-summary msg) + an explode —
    shuffles once by host, no Python.
    """
    flagged = pmlastmsg_detect(df, msg_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_real = F.last(
        F.when(F.col("repeat_count").isNull(), F.col(msg_col)),
        ignorenulls=True,
    ).over(w)
    expanded = flagged.withColumn(
        msg_col,
        F.when(F.col("repeat_count").isNotNull(), prev_real)
        .otherwise(F.col(msg_col)),
    ).withColumn(
        "_copies",
        F.explode(
            F.sequence(F.lit(1), F.coalesce("repeat_count", F.lit(1)))
        ),
    )
    return expanded.drop("_copies", "repeat_count")


# Cisco IOS: "%FACILITY-SEVERITY-MNEMONIC: text", optional "seq: " and
# timestamp prefix (ref: plugins/pmciscoios/pmciscoios.c)
_CISCO_RE = r"^(?:(\d+):\s+)?(?:[*.]?(\w{3}\s+\d+\s+[\d:.]+)(?:\s+\w+)?:\s+)?%(\w+)-(\d)-(\w+):\s*(.*)$"


def pmciscoios(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """Parse Cisco IOS message bodies into typed columns:
    ``cisco_seq``, ``cisco_facility``, ``cisco_mnemonic``,
    ``cisco_severity`` (overrides syslogseverity when present, as the
    reference does), and rewrites ``msg`` to the text after the
    mnemonic. Non-matching rows pass through untouched."""
    m = F.col(msg_col)
    fac = F.regexp_extract(m, _CISCO_RE, 3)
    matched = fac != ""
    return (
        df.withColumn(
            "cisco_seq",
            F.when(matched,
                   F.nullif(F.regexp_extract(m, _CISCO_RE, 1), F.lit(""))
                   .cast("long")),
        )
        .withColumn("cisco_facility", F.when(matched, fac))
        .withColumn(
            "cisco_severity",
            F.when(matched, F.regexp_extract(m, _CISCO_RE, 4).cast("int")),
        )
        .withColumn(
            "cisco_mnemonic",
            F.when(matched, F.regexp_extract(m, _CISCO_RE, 5)),
        )
        .withColumn(
            msg_col,
            F.when(matched, F.regexp_extract(m, _CISCO_RE, 6)).otherwise(m),
        )
    )


def pmnull(df: DataFrame, line_col: str = "line",
           tag: str = "", hostname_col: str | None = None) -> DataFrame:
    """pmnull (ref: plugins/pmnull): accept everything verbatim — the
    whole line becomes msg; PRI defaults to 13 (user.notice) unless a
    leading <PRI> is present."""
    line = F.col(line_col)
    pri_s = F.regexp_extract(line, r"^<(\d{1,3})>", 1)
    pri = F.when(
        (pri_s != "") & (pri_s.cast("int") <= 191), pri_s.cast("int")
    ).otherwise(F.lit(13))
    body = F.regexp_replace(line, r"^<\d{1,3}>", "")
    return df.select(
        *[c for c in df.columns if c != line_col],
        line.alias("rawmsg"),
        body.alias("msg"),
        pri.alias("pri"),
        (pri / 8).cast("int").alias("syslogfacility"),
        (pri % 8).cast("int").alias("syslogseverity"),
        F.lit(tag).alias("syslogtag"),
        (F.col(hostname_col) if hostname_col else F.lit(None).cast("string"))
        .alias("hostname"),
        F.lit(True).alias("parsesuccess"),
    )

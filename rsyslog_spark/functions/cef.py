"""ArcSight CEF formatting (ref: tocef/cef_ext_escape in the reference
function registry, SURVEY §2.5) — pure format/escape Column chains.

CEF line: ``CEF:0|vendor|product|version|sigid|name|severity|ext``.
Header fields escape ``\\`` and ``|``; extension values escape ``\\``,
``=`` and newlines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_str


def _hdr_escape(c: Column) -> Column:
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    return F.replace(c, F.lit("|"), F.lit("\\|"))


def cef_ext_escape(s: ColumnOrName) -> Column:
    c = rs_str(s)
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit("="), F.lit("\\="))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    return F.replace(c, F.lit("\r"), F.lit("\\r"))


def tocef(
    version: ColumnOrName,
    vendor: ColumnOrName,
    product: ColumnOrName,
    product_version: ColumnOrName,
    signature_id: ColumnOrName,
    name: ColumnOrName,
    severity: ColumnOrName,
    extensions: ColumnOrName,
) -> Column:
    """tocef(...) 8-arg CEF line builder. ``extensions`` is a
    pre-rendered ``k=v k2=v2`` string (escape values with
    cef_ext_escape)."""
    hdr = [_hdr_escape(rs_str(x)) for x in
           (vendor, product, product_version, signature_id, name, severity)]
    return F.concat(
        F.lit("CEF:"), rs_str(version), F.lit("|"),
        F.concat_ws("|", *hdr), F.lit("|"), rs_str(extensions),
    )

"""Parser chain: first parser that accepts wins.

ref: runtime/parser.c:615-660 (SelectParser loop) with the default
chain rfc5424 → rfc3164 (runtime/parser.c:150-156). rfc3164 is
permissive and accepts anything, so parsesuccess is always true for
the default chain — matching the reference, whose pmrfc3164 never
rejects.

Physical shape — measured on 100k cached lines, local[32]:

The chain is emitted as ONE PROJECTION of 22 independent per-field
expressions, each a small ``CASE WHEN accepts_rfc5424 THEN
<rfc5424 field expr> ELSE <rfc3164 field expr> END``. Within a
projection, whole-stage codegen's subexpression elimination evaluates
the shared subtrees (PRI strip, the header ``split``, the TAG regex)
once per row, so 22 fields cost barely more than one. When Catalyst
inlines a field into a downstream Filter (predicate pushdown through
the projection), only that FIELD's small tree is duplicated — never
the whole parse.

Two rejected alternatives, kept here as a warning:

* One merged 22-field struct per parser behind ``when()``: struct
  field extraction through CASE WHEN re-evaluates the entire struct
  per extracted field (SimplifyExtractValueOps cannot push an extract
  through CaseWhen), ~20× the work.
* A Generate barrier (``explode(array(struct))``) to force
  materialization: GenerateExec evaluates its generator with
  INTERPRETED expression eval (no codegen), which is ~7× slower than
  the codegen'd projection for this expression — and a Filter between
  the downstream Project and the Generate defeats nested-column
  pruning, forcing the full 2-parser parse (measured 1.5s vs 0.3s
  per 100k rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.parsers.rfc3164 import rfc3164_fields
from rsyslog_spark.parsers.rfc5424 import accepts_rfc5424, rfc5424_fields
from rsyslog_spark.schema import SYSLOG_COLUMNS

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

# plan-build memo: (line_col, inputname, keep_raw, with_uuid, cols) →
# list[Column]; Columns are immutable unresolved trees, safe to share
_CHAIN_CACHE: dict[tuple, list[Column]] = {}


def parse_syslog(
    df: DataFrame,
    line_col: str = "line",
    inputname: str = "imfile",
    keep_raw: bool = True,
    with_uuid: bool = False,
    columns: list[str] | None = None,
) -> DataFrame:
    """Raw lines → canonical syslog frame (SYSLOG_COLUMNS order).

    timegenerated = reception time (we use current_timestamp at parse,
    matching the reference's ttGenTime-at-ingest); timereported falls
    back to timegenerated when the wire timestamp is absent/invalid
    (ref: parser TIME_NOGEN handling).

    ``columns`` restricts the emitted canonical columns (callers that
    know their referenced properties can prune at the source — the
    liblognorm-"turbo" analog, ref runtime/msg.h:116-125). Catalyst's
    column pruning makes this mostly cosmetic in batch plans, but it
    keeps hand-written streaming DAGs lean.
    """
    want = columns if columns is not None else SYSLOG_COLUMNS
    key = (line_col, inputname, keep_raw, with_uuid, tuple(want))
    cached = _CHAIN_CACHE.get(key)
    if cached is not None:
        keep_others = [c for c in df.columns
                       if c != line_col and c not in want]
        return df.select(*keep_others, *cached)

    line = F.col(line_col)
    tgen = F.current_timestamp()
    null_s = F.lit(None).cast("string")

    f5424 = rfc5424_fields(line)
    f3164 = rfc3164_fields(line)
    acc = accepts_rfc5424(line)

    def chained(name: str) -> Column:
        """CASE over the two parsers for one raw parser field."""
        a = f5424[name] if name in _RFC5424_FIELDS else null_s
        b = f3164[name] if name in _RFC3164_FIELDS else null_s
        return F.when(acc, a).otherwise(b)

    def canonical(name: str) -> Column:
        if name == "rawmsg":
            return line if keep_raw else null_s
        if name == "fromhost":
            return chained("hostname")
        if name in ("fromhost_ip",):
            return null_s
        if name == "fromhost_port":
            return F.lit(None).cast("int")
        if name == "inputname":
            return F.lit(inputname)
        if name == "timereported":
            return F.coalesce(chained("timereported").cast("timestamp"),
                              tgen)
        if name == "timegenerated":
            return tgen
        if name == "protocol_version":
            return F.when(acc, F.lit(1)).otherwise(F.lit(0))
        if name == "json":
            return null_s
        if name == "uuid":
            return F.expr("uuid()") if with_uuid else null_s
        if name == "parsesuccess":
            return F.coalesce(chained("parsesuccess"), F.lit(False))
        if name in ("pri", "syslogfacility", "syslogseverity",
                    "fromhost_port"):
            return chained(name).cast("int")
        return chained(name)

    cols = [canonical(c).alias(c) for c in want]
    # Column objects only hold unresolved expression trees (attributes
    # by name), so they're reusable across DataFrames — memoize to
    # skip ~1000 Py4J round-trips per plan build. uuid() stays
    # per-evaluation-unique (nondeterministic expr, not a cached value).
    _CHAIN_CACHE[key] = cols
    keep_others = [c for c in df.columns if c != line_col]
    return df.select(*keep_others, *cols)

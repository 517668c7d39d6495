"""mmnormalize / pmnormalize: liblognorm rulebase → compiled regex
dispatch (ref: plugins/mmnormalize/mmnormalize.c:1-5, 962 LoC;
plugins/pmnormalize/pmnormalize.c, 258 LoC).

The reference delegates to liblognorm: a *rulebase* file declares
rules as literal text interleaved with typed field captures
(``%field:type%``); the first rule that matches a message wins and
its fields land in the ``$!`` tree. We compile each rule ONCE at plan
build into an anchored Java regex (field → capture group), then emit
a first-match-wins CASE chain of ``regexp_extract`` columns — all
JVM-side, no UDFs, so the dispatch whole-stage-codegens and a
same-pattern prefilter (``rlike``) is shared across the per-field
extracts by codegen subexpression elimination.

Supported field types (the working subset of liblognorm v1 syntax —
doc: https://www.liblognorm.com, format ``%name:type[:extra]%``):

=============   =============================================
word            ``\\S+``
number          ``[0-9]+`` (cast long)
float           ``[0-9.]+`` (cast double)
alpha           ``[A-Za-z]+``
hexnumber       ``0x[0-9a-fA-F]+``
rest            ``.*`` (to end of line)
quoted-string   ``"..."`` (quotes stripped)
char-to:C       everything up to (not incl.) literal char C
char-sep:C      like char-to but C may be absent (end of line)
ipv4            dotted quad
date-rfc3164    ``Mmm dd hh:mm:ss``
date-rfc5424    RFC3339 timestamp token
time-24hr       ``hh:mm:ss``
-               (dash name) match but discard
=============   =============================================

mmnormalize's "turbo" zero-JSON path (runtime/msg.h:116-125) maps to
requesting only the fields you need: ``normalize(df, rb,
fields=[...])`` prunes untouched captures at plan time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TYPE_RE = {
    "word": r"\S+",
    "number": r"[0-9]+",
    "float": r"[0-9]*\.?[0-9]+",
    "alpha": r"[A-Za-z]+",
    "hexnumber": r"0x[0-9a-fA-F]+",
    "rest": r".*",
    "ipv4": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
    "date-rfc3164": r"[A-Z][a-z]{2} [ 0-9][0-9] [0-9:]{8}",
    "date-rfc5424": r"[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9:.]+(?:Z|[+-][0-9:]+)?",
    "time-24hr": r"[0-9]{2}:[0-9]{2}:[0-9]{2}",
}
_TYPE_CAST = {"number": "long", "float": "double"}

_FIELD_TOKEN = re.compile(r"%([^:%]*):([a-z0-9-]+)(?::([^%]*))?%")


@dataclass
class Rule:
    """One compiled rulebase rule."""

    tags: list[str]
    pattern: str                       # anchored Java regex
    fields: list[tuple[str, int, str]] = dfield(default_factory=list)
    # (field name, capture group index, rulebase type)


def compile_rule(tags: list[str], body: str) -> Rule:
    """Compile one ``rule=`` body into an anchored regex.

    Literal text is regex-escaped; each ``%name:type%`` becomes a
    capture group (discard fields ``%-:type%`` become non-capturing).
    """
    out: list[str] = []
    fields: list[tuple[str, int, str]] = []
    group = 0
    pos = 0
    for m in _FIELD_TOKEN.finditer(body):
        out.append(re.escape(body[pos:m.start()]))
        name, ftype, extra = m.group(1), m.group(2), m.group(3)
        if ftype == "char-to":
            if not extra:
                raise ValueError("char-to needs :C extra")
            pat = rf"[^{re.escape(extra)}]+"
        elif ftype == "char-sep":
            if not extra:
                raise ValueError("char-sep needs :C extra")
            pat = rf"[^{re.escape(extra)}]*"
        elif ftype == "quoted-string":
            pat = r'"(?:[^"\\]|\\.)*"'
        elif ftype in _TYPE_RE:
            pat = _TYPE_RE[ftype]
        else:
            raise ValueError(f"unsupported field type {ftype!r}")
        if name == "-" or not name:
            out.append(f"(?:{pat})")
        else:
            group += 1
            out.append(f"({pat})")
            fields.append((name, group, ftype))
        pos = m.end()
    out.append(re.escape(body[pos:]))
    return Rule(tags=tags, pattern="^" + "".join(out) + "$",
                fields=fields)


def parse_rulebase(text: str) -> list[Rule]:
    """Parse rulebase text: ``rule=[tag,tag]:BODY`` lines; ``#``
    comments, ``version=``/``prefix=`` headers tolerated."""
    rules: list[Rule] = []
    prefix = ""
    for raw in text.splitlines():
        line = raw.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        if line.startswith("version=") :
            continue
        if line.startswith("prefix="):
            prefix = line[len("prefix="):]
            continue
        if line.startswith("rule="):
            spec = line[len("rule="):]
            tagpart, _, body = spec.partition(":")
            tags = [t for t in tagpart.split(",") if t]
            rules.append(compile_rule(tags, prefix + body))
    return rules


def _rule_value(c: Column, rule: Rule, name: str) -> Column | None:
    for fname, gidx, ftype in rule.fields:
        if fname != name:
            continue
        v = F.regexp_extract(c, rule.pattern, gidx)
        if ftype == "quoted-string":
            v = F.regexp_replace(v, r'^"|"$', "")
        cast = _TYPE_CAST.get(ftype)
        return v.cast(cast) if cast else v
    return None


def normalize(
    df: DataFrame,
    rulebase: str | list[Rule],
    msg_col: str = "msg",
    fields: list[str] | None = None,
    rule_col: str = "event_tag",
    prefix: str = "",
) -> DataFrame:
    """First-match-wins normalize: adds one column per extracted field
    (``prefix + name``) plus ``rule_col`` = tags of the winning rule
    (comma-joined; NULL when unparsed, mirroring liblognorm's
    ``unparsed-data`` marker).

    Typed fields arrive casted (number → long, float → double); a
    field missing from the winning rule is NULL.
    """
    rules = (parse_rulebase(rulebase)
             if isinstance(rulebase, str) else list(rulebase))
    if not rules:
        raise ValueError("empty rulebase")
    c = F.col(msg_col)
    matches = [c.rlike(r.pattern) for r in rules]

    if fields is None:
        seen: dict[str, None] = {}
        for r in rules:
            for fname, _, _ in r.fields:
                seen.setdefault(fname)
        fields = list(seen)

    # ONE first-match CASE decides the winning rule; every field then
    # extracts only `when(winner == i)`. Gating each field on its own
    # rlike chain would let a LATER rule fill a field on a row won by
    # an EARLIER rule that lacks the field — liblognorm leaves those
    # unset (first match wins for the whole message, not per field).
    winner = F.lit(None).cast("int")
    for i, m in zip(range(len(rules) - 1, -1, -1), reversed(matches)):
        winner = F.when(m, F.lit(i)).otherwise(winner)
    wcol = "__nrm_winner"
    out = df.withColumn(wcol, winner)
    w = F.col(wcol)

    for name in fields:
        expr = F.lit(None).cast("string")
        for i in range(len(rules) - 1, -1, -1):
            v = _rule_value(c, rules[i], name)
            if v is None:
                continue
            expr = F.when(w == i, v).otherwise(expr)
        out = out.withColumn(prefix + name, expr)

    tag_expr = F.lit(None).cast("string")
    for i in range(len(rules) - 1, -1, -1):
        tag_expr = F.when(
            w == i, F.lit(",".join(rules[i].tags))).otherwise(tag_expr)
    return out.withColumn(rule_col, tag_expr).drop(wcol)

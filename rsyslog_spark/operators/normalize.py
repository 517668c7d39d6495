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
tokenized:S:T   list of T items separated by S (recursive; value is
                an ``array<string>`` split on the top-level S, cast
                to ``array<long>`` when the leaf type is number)
regex:P         ERE pattern P matched as-is (inner groups made
                non-capturing)
-               (dash name) match but discard
=============   =============================================

``\\xNN`` escapes in extras (``char-to:\\x3a`` …) decode to their
character first, as liblognorm does. ``annotate=TAG:+field="v"``
lines attach constant fields to messages won by a TAG-tagged rule
(liblognorm annotations).

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
    fields: list[tuple[str, int, str, str | None]] = \
        dfield(default_factory=list)
    # (field name, capture group index, rulebase type, extra)
    annotations: list[tuple[str, str]] = dfield(default_factory=list)
    # constant (field, value) pairs from annotate= lines
    literal_len: int = 0
    # total literal characters — the specificity score for
    # match="specific" (liblognorm's parse tree prefers literal text
    # over field matches at each position; longest-total-literal is
    # the rule-level approximation of that)


_HEX_ESC = re.compile(r"\\x([0-9a-fA-F]{2})")


def _decode_extra(extra: str) -> str:
    """liblognorm extras spell metacharacters as ``\\xNN`` (the ':'
    that would end the token, ']', ')', ...) — decode them first."""
    return _HEX_ESC.sub(lambda m: chr(int(m.group(1), 16)), extra)


def _uncapture(pat: str) -> str:
    """Turn every plain capturing ``(`` into ``(?:`` so embedded
    patterns (regex / tokenized item types) don't shift the rule's
    field group numbering."""
    return re.sub(r"(?<!\\)\((?![?])", "(?:", pat)


def _type_pattern(ftype: str, extra: str | None) -> str:
    """Regex for one field type (no outer capture group)."""
    if ftype == "char-to":
        if not extra:
            raise ValueError("char-to needs :C extra")
        return rf"[^{re.escape(_decode_extra(extra))}]+"
    if ftype == "char-sep":
        if not extra:
            raise ValueError("char-sep needs :C extra")
        return rf"[^{re.escape(_decode_extra(extra))}]*"
    if ftype == "quoted-string":
        return r'"[^"\\]*+(?:\\.[^"\\]*+)*+"'
    if ftype == "regex":
        if not extra:
            raise ValueError("regex needs :pattern extra")
        return _uncapture(_decode_extra(extra))
    if ftype == "tokenized":
        sep, item_type, item_extra = _split_tokenized_extra(extra)
        item = _type_pattern(item_type, item_extra)
        s = re.escape(sep)
        return rf"(?:{item})(?:{s}(?:{item}))*"
    if ftype in _TYPE_RE:
        return _TYPE_RE[ftype]
    raise ValueError(f"unsupported field type {ftype!r}")


def _split_tokenized_extra(extra: str | None) -> tuple[str, str, str | None]:
    """``tokenized:SEP:TYPE[:TYPE-EXTRA]`` — the separator runs to the
    FIRST ':'; everything after is the item type spec (which may
    itself be tokenized — liblognorm recursion)."""
    if not extra or ":" not in extra:
        raise ValueError("tokenized needs :SEP:TYPE extra")
    sep, _, spec = extra.partition(":")
    item_type, _, item_extra = spec.partition(":")
    return _decode_extra(sep), item_type, (item_extra or None)


def compile_rule(tags: list[str], body: str) -> Rule:
    """Compile one ``rule=`` body into an anchored regex.

    Literal text is regex-escaped; each ``%name:type%`` becomes a
    capture group (discard fields ``%-:type%`` become non-capturing).
    """
    out: list[str] = []
    fields: list[tuple[str, int, str, str | None]] = []
    group = 0
    pos = 0
    lit = 0
    for m in _FIELD_TOKEN.finditer(body):
        out.append(re.escape(body[pos:m.start()]))
        lit += m.start() - pos
        name, ftype, extra = m.group(1), m.group(2), m.group(3)
        pat = _type_pattern(ftype, extra)
        if name == "-" or not name:
            out.append(f"(?:{pat})")
        else:
            group += 1
            out.append(f"({pat})")
            fields.append((name, group, ftype, extra))
        pos = m.end()
    out.append(re.escape(body[pos:]))
    lit += len(body) - pos
    return Rule(tags=tags, pattern="^" + "".join(out) + "$",
                fields=fields, literal_len=lit)


_ANNOTATE_FIELD = re.compile(r'\+([A-Za-z0-9_.-]+)="((?:[^"\\]|\\.)*)"')


def parse_rulebase(text: str) -> list[Rule]:
    """Parse rulebase text: ``rule=[tag,tag]:BODY`` lines; ``#``
    comments, ``version=``/``prefix=`` headers tolerated;
    ``annotate=TAG:+field="value"`` lines attach constant fields to
    every rule carrying TAG (liblognorm annotations — order-free,
    like the reference fixtures interleave them)."""
    rules: list[Rule] = []
    annotations: list[tuple[str, str, str]] = []   # (tag, field, val)
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
        if line.startswith("annotate="):
            spec = line[len("annotate="):]
            tag, _, rest = spec.partition(":")
            for m in _ANNOTATE_FIELD.finditer(rest):
                annotations.append((tag, m.group(1), m.group(2)))
            continue
        if line.startswith("rule="):
            spec = line[len("rule="):]
            tagpart, _, body = spec.partition(":")
            tags = [t for t in tagpart.split(",") if t]
            rules.append(compile_rule(tags, prefix + body))
    for tag, fname, val in annotations:
        for r in rules:
            if tag in r.tags:
                r.annotations.append((fname, val))
    return rules


def _tokenized_value(v: Column, extra: str | None) -> Column:
    """Tokenized field value: nested arrays mirroring liblognorm's
    JSON output (items stay STRINGS at every depth — the reference
    emits ``[ [ "10" ] ]`` even for :number leaves, see
    tests/mmnormalize_tokenized.sh content_check lines)."""
    sep, item_type, item_extra = _split_tokenized_extra(extra)
    arr = F.split(v, re.escape(sep))
    if item_type == "tokenized":
        arr = F.transform(arr,
                          lambda x: _tokenized_value(x, item_extra))
    return arr


def _rule_value(c: Column, rule: Rule, name: str) -> Column | None:
    for fname, gidx, ftype, extra in rule.fields:
        if fname != name:
            continue
        v = F.regexp_extract(c, rule.pattern, gidx)
        if ftype == "quoted-string":
            v = F.regexp_replace(v, r'^"|"$', "")
        if ftype == "tokenized":
            return _tokenized_value(v, extra)
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
    match: str = "first",
) -> DataFrame:
    """Rulebase normalize: adds one column per extracted field
    (``prefix + name``) plus ``rule_col`` = tags of the winning rule
    (comma-joined; NULL when unparsed, mirroring liblognorm's
    ``unparsed-data`` marker).

    ``match``: ``"first"`` (default) — first rule in file order that
    matches wins, whole-message. ``"specific"`` — the matching rule
    with the MOST literal text wins (ties → file order): liblognorm
    builds a parse tree where literal text beats a field match at
    each position, so of two matching rules the more literal one
    wins — e.g. the reference's processing rulebase relies on
    ``Process2:`` (literal) beating ``%v_tag:char-to::%`` (field)
    (tests/testsuites/mmnormalize_processing_tests.rulebase FromFile
    vs LNX). Longest-total-literal is the rule-level approximation;
    a divergence is constructible with rules whose specificity
    inverts mid-pattern, but none of the reference fixtures do that.

    Typed fields arrive casted (number → long, float → double); a
    field missing from the winning rule is NULL.
    """
    rules = (parse_rulebase(rulebase)
             if isinstance(rulebase, str) else list(rulebase))
    if not rules:
        raise ValueError("empty rulebase")
    if match == "specific":
        order = sorted(range(len(rules)),
                       key=lambda i: (-rules[i].literal_len, i))
        rules = [rules[i] for i in order]
    elif match != "first":
        raise ValueError(f"unknown match mode {match!r}")
    c = F.col(msg_col)
    matches = [c.rlike(r.pattern) for r in rules]

    if fields is None:
        seen: dict[str, None] = {}
        for r in rules:
            for fname, _, _, _ in r.fields:
                seen.setdefault(fname)
            for fname, _ in r.annotations:
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
        expr = None
        for i, rule in enumerate(rules):
            v = _rule_value(c, rule, name)
            if v is None:
                # annotate= constants apply when this rule wins
                ann = [val for f, val in rule.annotations if f == name]
                if not ann:
                    continue
                v = F.lit(ann[-1])
            expr = (F.when(w == i, v) if expr is None
                    else expr.when(w == i, v))
        out = out.withColumn(
            prefix + name,
            expr if expr is not None else F.lit(None).cast("string"))

    tag_expr = F.lit(None).cast("string")
    for i in range(len(rules) - 1, -1, -1):
        tag_expr = F.when(
            w == i, F.lit(",".join(rules[i].tags))).otherwise(tag_expr)
    return out.withColumn(rule_col, tag_expr).drop(wcol)

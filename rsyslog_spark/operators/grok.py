"""mmgrok: grok-pattern field extraction (ref: contrib/mmgrok/
mmgrok.c — grok patterns into the ``$!`` tree).

Grok syntax ``%{PATTERN}`` / ``%{PATTERN:name}`` /
``%{PATTERN:name:int|float}`` over a pattern dictionary; patterns
may reference other patterns recursively. We expand the dictionary at
plan build into ONE Java regex with numbered capture groups, then
extract per-field with ``regexp_extract`` — the same
codegen-friendly shape as operators/normalize.py (no UDFs).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The standard grok core dictionary (subset; public logstash-patterns)
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?(?:[0-9]+)",
    "NUMBER": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "IPV4": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
    "IP": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}"
                r"(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|"
                r"[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|"
                r"WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|"
                r"CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|"
                r"EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "TIMESTAMP_ISO8601": r"[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:"
                         r"[0-9]{2}(?::[0-9]{2}(?:\.[0-9]+)?)?"
                         r"(?:Z|[+-][0-9]{2}:?[0-9]{2})?",
    "SYSLOGTIMESTAMP": r"[A-Z][a-z]{2} +[0-9]{1,2} [0-9]{2}:[0-9]{2}:"
                       r"[0-9]{2}",
    "QUOTEDSTRING": r'"[^"\\]*+(?:\\.[^"\\]*+)*+"',
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "PATH": r"(?:/[\w_%!$@:.,~-]+)+",
}

_GROK_TOKEN = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(int|float))?\}")
_CAST = {"int": "long", "float": "double"}


def grok_compile(
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
) -> tuple[str, list[tuple[str, int, str | None]]]:
    """Expand a grok expression → (java_regex, [(name, group, cast)]).

    Unnamed pattern references become non-capturing groups; literal
    text outside ``%{}`` passes through verbatim (it is regex in grok,
    as in the original)."""
    dictionary = dict(BASE_PATTERNS)
    if extra_patterns:
        dictionary.update(extra_patterns)

    fields: list[tuple[str, int, str | None]] = []
    group_n = 0

    def count_caps(chunk: str) -> int:
        """Capture groups a literal regex chunk opens: unescaped ``(``
        outside a character class, not followed by ``?``. Grok literal
        text IS regex, so ``(foo|bar)`` in passthrough shifts every
        later index — they must be counted."""
        n = 0
        i = 0
        in_class = False
        while i < len(chunk):
            ch = chunk[i]
            if ch == "\\":
                i += 2
                continue
            if in_class:
                if ch == "]":
                    in_class = False
            elif ch == "[":
                in_class = True
            elif ch == "(" and chunk[i + 1:i + 2] != "?":
                n += 1
            i += 1
        return n

    def expand(p: str, depth: int) -> str:
        nonlocal group_n
        if depth > 10:
            raise ValueError("grok pattern recursion too deep")
        out: list[str] = []
        pos = 0
        for m in _GROK_TOKEN.finditer(p):
            text = p[pos:m.start()]
            out.append(text)
            group_n += count_caps(text)
            pname, fname, cast = m.group(1), m.group(2), m.group(3)
            if pname not in dictionary:
                raise ValueError(f"unknown grok pattern {pname!r}")
            if fname:
                # the parent's "(" opens BEFORE any group inside the
                # body — number it now, then expand (Java numbers
                # groups by open-paren position)
                group_n += 1
                fields.append((fname, group_n, _CAST.get(cast or "")))
                body = expand(dictionary[pname], depth + 1)
                out.append(f"({body})")
            else:
                body = expand(dictionary[pname], depth + 1)
                out.append(f"(?:{body})")
            pos = m.end()
        tail = p[pos:]
        out.append(tail)
        group_n += count_caps(tail)
        return "".join(out)

    regex = expand(pattern, 0)
    return regex, fields


def mmgrok(
    df: DataFrame,
    pattern: str,
    msg_col: str = "msg",
    prefix: str = "",
    extra_patterns: dict[str, str] | None = None,
    anchor: bool = True,
    matched_col: str = "grok_matched",
) -> DataFrame:
    """Extract grok fields as columns; ``matched_col`` is False when
    the pattern does not match (fields then NULL — mirroring mmgrok's
    unmatched behavior of leaving ``$!`` untouched)."""
    regex, fields = grok_compile(pattern, extra_patterns)
    if anchor and not regex.startswith("^"):
        regex = f"^{regex}$"
    c = F.col(msg_col)
    matched = c.rlike(regex)
    out = df
    for name, gidx, cast in fields:
        v = F.when(matched, F.regexp_extract(c, regex, gidx))
        out = out.withColumn(prefix + name,
                             v.cast(cast) if cast else v)
    return out.withColumn(matched_col, matched)

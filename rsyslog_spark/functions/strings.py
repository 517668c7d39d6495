"""String built-ins (ref: grammar/rainerscript.c:4467-4510 registry).

All pure Column expressions; semantics match the reference's dynamic
typing (missing → '' / 0) via the expr-layer coercers.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, _c, rs_num, rs_str

#: Sentinel returned by field() when the requested field is absent
#: (ref: doc/source/rainerscript/functions/rs-field.rst).
FIELD_NOT_FOUND = "***FIELD NOT FOUND***"


def strlen(s: ColumnOrName) -> Column:
    return F.length(rs_str(s))


def substring(s: ColumnOrName, start: int | Column, length: int | Column) -> Column:
    """0-based substring with the reference's edge semantics
    (grammar/rainerscript.c doFunct_Substring:2586-2615; goldens
    func-substring-{invld-startpos,relative-endpos,large-endpos,
    large-neg-endpos}.sh): negative start clamps to 0; start past the
    string yields ''; a NEGATIVE length is relative to the SOURCE
    length (len = lenSrc + length, floored at 0); oversized lengths
    clamp to the remainder. Spark substr is 1-based."""
    src = rs_str(s)
    start_c = _c(start) if isinstance(start, Column) else F.lit(start)
    len_c = _c(length) if isinstance(length, Column) else F.lit(length)
    start_c = F.greatest(start_c.cast("long"), F.lit(0))
    n = F.length(src).cast("long")
    eff_len = F.when(len_c < 0,
                     F.greatest(n + len_c.cast("long"), F.lit(0))) \
        .otherwise(len_c.cast("long"))
    eff_len = F.least(eff_len, n - start_c)
    return F.when(start_c >= n, F.lit("")) \
        .otherwise(src.substr(start_c + 1,
                              F.greatest(eff_len, F.lit(0))))


def ltrim(s: ColumnOrName) -> Column:
    return F.ltrim(rs_str(s))


def rtrim(s: ColumnOrName) -> Column:
    return F.rtrim(rs_str(s))


def tolower(s: ColumnOrName) -> Column:
    return F.lower(rs_str(s))


def toupper(s: ColumnOrName) -> Column:
    return F.upper(rs_str(s))


def cstr(x: ColumnOrName) -> Column:
    return rs_str(x)


def cnum(x: ColumnOrName) -> Column:
    return rs_num(x)


def cbool(x: ColumnOrName) -> Column:
    """cbool: 'on'/'true'/nonzero → true (ref rscript cbool coercion)."""
    s = F.lower(rs_str(x))
    return F.when(s.isin("on", "true", "yes"), F.lit(True)).otherwise(rs_num(x) != 0)


#: POSIX bracket classes → Java regex equivalents. The reference
#: compiles patterns with POSIX regcomp(REG_EXTENDED), where
#: ``[[:space:]]`` is a class inside a bracket expression; Java
#: regex (Spark rlike/regexp_*) spells these ``\p{...}``
#: (golden mmsnareparse-trailing-extradata-regex.sh uses
#: ``[[:space:]]+``).
_POSIX_CLASSES = {
    "alpha": r"\p{Alpha}", "digit": r"\d", "alnum": r"\p{Alnum}",
    "space": r"\s", "upper": r"\p{Upper}", "lower": r"\p{Lower}",
    "punct": r"\p{Punct}", "blank": r"\p{Blank}",
    "cntrl": r"\p{Cntrl}", "xdigit": r"\p{XDigit}",
    "print": r"\p{Print}", "graph": r"\p{Graph}",
}


def posix_ere_to_java(pattern: str) -> str:
    """Rewrite POSIX ``[:class:]`` atoms to Java ``\\p{...}``
    equivalents (legal inside Java character classes), leaving the
    rest of the ERE untouched — Java regex is otherwise an ERE
    superset."""
    import re as _re

    return _re.sub(
        r"\[:(\w+):\]",
        lambda m: _POSIX_CLASSES.get(m.group(1), m.group(0)),
        pattern)


def re_match(s: ColumnOrName, pattern: str) -> Column:
    """ERE match (ref: doFunc re_match; Java regex is an ERE superset
    modulo POSIX bracket classes, translated here)."""
    return rs_str(s).rlike(posix_ere_to_java(pattern))


def re_match_i(s: ColumnOrName, pattern: str) -> Column:
    return rs_str(s).rlike(f"(?i){posix_ere_to_java(pattern)}")


def re_extract(
    s: ColumnOrName,
    pattern: str,
    match: int = 0,
    submatch: int = 0,
    nomatch: str = "",
) -> Column:
    """Extract the ``match``-th occurrence's ``submatch``-th group, or
    ``nomatch`` default (ref: grammar/rainerscript.c:1696-1766).

    Compiled to ``try_element_at(regexp_extract_all(...))`` — the regex
    is compiled once by Catalyst, not per row.
    """
    all_matches = F.regexp_extract_all(rs_str(s), F.lit(pattern), F.lit(submatch))
    got = F.try_element_at(all_matches, F.lit(match + 1))
    return F.coalesce(got, F.lit(nomatch))


def re_extract_i(s: ColumnOrName, pattern: str, match: int = 0,
                 submatch: int = 0, nomatch: str = "") -> Column:
    return re_extract(s, f"(?i){pattern}", match, submatch, nomatch)


def _delim_str(delim: int | str) -> str:
    # field() historically takes a decimal char code (e.g. 44 = ','),
    # or a string delimiter (ref: rs-field.rst).
    return chr(delim) if isinstance(delim, int) else delim


def field(s: ColumnOrName, delim: int | str, n: int,
          not_found: str = FIELD_NOT_FOUND) -> Column:
    """n-th field (1-based) split by delimiter; absent → sentinel
    (ref: doc/source/rainerscript/functions/rs-field.rst;
    rainerscript.c:2655 '***FIELD NOT FOUND***'). The template
    F-field uses a DIFFERENT sentinel (msg.c:4153, two asterisks) —
    callers pass it via ``not_found``."""
    d = _re.escape(_delim_str(delim))
    parts = F.split(rs_str(s), d, -1)
    return F.when(F.size(parts) >= n, F.element_at(parts, n)).otherwise(
        F.lit(not_found)
    )


def split_fn(s: ColumnOrName, delim: int | str) -> Column:
    """split() → array, consumed by foreach/explode (ref
    rs-split.rst). Empty separator → EMPTY array, not per-char split
    (golden rscript_split.sh case 7: split("abc","") == [ ])."""
    d = _delim_str(delim)
    if d == "":
        return F.array().cast("array<string>")
    return F.split(rs_str(s), _re.escape(d), -1)


def replace(s: ColumnOrName, find: str | Column, repl: str | Column) -> Column:
    """Literal replace-all (ref: grammar/rainerscript.c:1809+)."""
    find_c = find if isinstance(find, Column) else F.lit(find)
    repl_c = repl if isinstance(repl, Column) else F.lit(repl)
    return F.replace(rs_str(s), find_c, repl_c)


def wrap(s: ColumnOrName, wrapper: str | Column,
         escape: str | Column | None = None) -> Column:
    """wrap(str, wrapper[, escape]): quote a string; occurrences of
    the wrapper inside are replaced with ``escape`` when given (ref:
    doc/source/rainerscript/functions/rs-wrap.rst; goldens
    rscript_wrap{2,3}.sh — both accept expression-valued wrapper/
    escape args, e.g. wrap(..., "bc" & "def" & "bc", "ES" & "C"))."""
    wrap_c = wrapper if isinstance(wrapper, Column) else F.lit(wrapper)
    inner = rs_str(s)
    if escape is not None:
        esc_c = escape if isinstance(escape, Column) else F.lit(escape)
        inner = F.replace(inner, wrap_c, esc_c)
    return F.concat(wrap_c, inner, wrap_c)


def getenv_fn(name: str, default: str = "") -> Column:
    """getenv() resolves at plan time — config-load semantics match the
    reference (env read once at startup)."""
    return F.lit(os.environ.get(name, default))


def random_fn(max_value: int) -> Column:
    """random(max) — uniform int in [0, max). Non-deterministic; the
    reference docs warn about weak RNG, ours is Spark's XORShift."""
    return F.floor(F.rand() * max_value).cast("long")


def pcre_match(c, regex: str):
    """fmpcre pcre_match (ref: plugins/fmpcre/fmpcre.c:93). Java
    regex is a near-superset of PCRE for the subset configs use;
    differences (possessive quantifiers, \\K) are documented here
    rather than emulated."""
    return rs_str(c).rlike(regex)


def get_property(name: str, json_col=None):
    """get_property(root, name) (ref: rainerscript registry):
    dynamic property read resolved at plan time — a core column by
    name, or a ``$!`` path when ``json_col`` is given."""
    if name.startswith(("$!", "$.")):
        from rsyslog_spark.functions.json_fns import json_get

        return json_get(json_col if json_col is not None else "json", name)
    return F.col(name.lstrip("$"))


#: C-style control escapes (runtime/parser.c SanitizeMsg:455-495:
#: named escapes for the C set, \xHH for the rest)
_CSTYLE_NAMED = {0: "\\0", 7: "\\a", 8: "\\b", 27: "\\e", 12: "\\f",
                 10: "\\n", 13: "\\r", 9: "\\t", 11: "\\v"}


def escape_on_receive(line: ColumnOrName, *, controlchars: bool = True,
                      bit8: bool = False, tab: bool = True,
                      prefix: str = "#", cstyle: bool = False) -> Column:
    """Receive-time message sanitization (ref: runtime/parser.c
    SanitizeMsg:430-520): control characters (< 32; TAB only when
    ``parser.escapeControlCharacterTab``) and/or 8-bit characters
    escape to ``#OOO`` per BYTE — a UTF-8 'ä' becomes '#303#244'
    (golden parsertest-parse_8bit_escape.sh).

    Pure column transform: per-char array transform; multi-byte
    chars expand via encode→hex-pairs→octal. Only compiled when a
    config enables the option, so the parse hot path never pays it.
    The engine default differs from the reference's (control-char
    escaping ON there): line-framed Spark sources cannot carry the
    framing control bytes the reference guards against, so the
    transform is opt-in (COVERAGE §2.2 divergent-default row)."""
    s = rs_str(line)

    def esc_bytes(c: Column) -> Column:
        pairs = F.regexp_extract_all(
            F.hex(F.encode(c, "UTF-8")), F.lit("(..)"), 1)
        if cstyle:
            # parser.escapeControlCharactersCStyle: \xHH per byte
            # for anything without a named C escape
            return F.array_join(F.transform(
                pairs, lambda p: F.concat(F.lit("\\x"), p)), "")
        return F.array_join(F.transform(
            pairs,
            lambda p: F.concat(F.lit(prefix),
                               F.lpad(F.conv(p, 16, 8), 3, "0"))), "")

    def one(c: Column) -> Column:
        cp = F.ascii(c)
        cond = F.lit(False)
        if controlchars:
            tabcond = F.lit(True) if tab else (cp != 9)
            cond = cond | ((cp < 32) & tabcond)
        if bit8:
            cond = cond | (cp > 127)
        esc = esc_bytes(c)
        if cstyle:
            named = esc
            for code, rep in sorted(_CSTYLE_NAMED.items()):
                named = F.when(cp == code, F.lit(rep)).otherwise(named)
            esc = named
        return F.when(cond, esc).otherwise(c)

    return F.array_join(
        F.transform(F.split(s, ""), one), "")

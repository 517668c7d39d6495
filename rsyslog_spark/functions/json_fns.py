"""JSON built-ins: parse_json, variable-path access, append_json,
unflatten.

The ``$!`` tree (ref: runtime/msg.h:114, path access
runtime/msg.c:240,3099) is carried as a JSON STRING column; access
compiles to ``get_json_object`` (JVM-side, codegen). Spark 4's VARIANT
is offered as an opt-in via parse_json_variant for repeated deep
access.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_str


def _json_path(path: str) -> str:
    """rsyslog variable path ``$!a!b`` / ``a!b`` → JSONPath ``$.a.b``."""
    p = path.lstrip("$")
    p = p.lstrip("!.")
    return "$." + ".".join(seg for seg in p.replace("!", ".").split(".") if seg)


def json_get(json_col: ColumnOrName, path: str) -> Column:
    """Read ``$!path`` from the JSON tree; missing → NULL (callers
    wanting rsyslog missing-var semantics wrap with rs_str/rs_num)."""
    return F.get_json_object(rs_str(json_col), _json_path(path))


def json_get_ci(json_col: ColumnOrName, path: str) -> Column:
    """Case-insensitive tree read: each path segment matches the
    FIRST key (object order) whose lowercase equals the segment's —
    libfastjson's case-insensitive comparison, the reference default
    (glbl.c variables.casesensitive=off). Level-by-level
    map<string,string> walk (nested objects surface as their raw
    JSON text, so chaining works); leaf semantics match
    get_json_object (scalars unquoted, objects as JSON text)."""
    segs = [s for s in path.lstrip("$").lstrip("!.")
            .replace("!", ".").split(".") if s]
    def key_match(low: str):
        return lambda k, _v: F.lower(k) == low

    cur = rs_str(json_col)
    for seg in segs:
        m = F.from_json(cur, "map<string,string>")
        hits = F.map_filter(m, key_match(seg.lower()))
        cur = F.try_element_at(F.map_values(hits), F.lit(1))
    return cur


def tree_get(json_col: ColumnOrName, path: str) -> Column:
    """$!-tree read honoring variables.casesensitive: exact
    (codegen'd get_json_object) when case-sensitive; in the default
    case-insensitive mode the path is pre-folded by the caller and
    the exact probe is backed by the case-insensitive walk, which
    only evaluates on rows where the exact lookup misses (coalesce
    is lazy per row) — the hot path stays get_json_object.

    DOCUMENTED DIVERGENCE (duplicate case-variant keys): libfastjson's
    case-insensitive lookup returns the FIRST key in object order
    whose lowercase matches, so for ``{"ABC":1,"abc":2}`` the
    reference's ``$!abc`` reads 1; the exact-probe-first shape here
    reads 2 (the exact-case key wins regardless of order). Making the
    ordered walk the sole path would double every tree read (measured
    2x, SCALE.md case-insensitive table) to serve a corpus shape —
    same object, two keys equal under lowercase — that any sane
    producer avoids; pinned by test_tree_get_dup_case_divergence."""
    from rsyslog_spark.plans.ruleset import var_case_sensitive

    if var_case_sensitive():
        return json_get(json_col, path)
    return F.coalesce(json_get(json_col, path),
                      json_get_ci(json_col, path))


def json_get_num(json_col: ColumnOrName, path: str) -> Column:
    return F.coalesce((json_get(json_col, path)).try_cast("long"), F.lit(0))


def parse_json_variant(s: ColumnOrName) -> Column:
    """parse_json(str) → VARIANT (Spark 4). Invalid JSON → NULL, the
    engine's script_error analog (ref doFunc_parse_json errno).
    Strict: the ENTIRE input must be one JSON value (ChangeLog
    2025-12-24) — try_parse_json alone accepts trailing garbage, so
    it is gated on :func:`json_strict_ok`."""
    c = rs_str(s)
    return F.when(json_strict_ok(c), F.try_parse_json(c))


def json_strict_ok(s: ColumnOrName) -> Column:
    """Whole-input JSON validity — parse_json succeeds ONLY if the
    ENTIRE string is one JSON value (ChangeLog 2025-12-24:
    'rainerscript: ensure parse_json consumes entire input string' —
    prevents false positives when a non-JSON string merely STARTS
    with a valid value, e.g. '{"a":1}xx', '12 34', '"str"extra').
    Spark's try_parse_json validates only a prefix, so full
    consumption is checked here, all JVM-side:

    - scalar roots validate against the complete JSON scalar grammar
      (number/true/false/null) as one regex;
    - string roots must BE one string literal (the string-stripped
      text is exactly the placeholder);
    - container roots run a depth walk (aggregate over chars of the
      string-stripped text): the root must close exactly at the last
      non-whitespace character, never dip below zero, and nothing
      but whitespace may follow.
    """
    t = F.trim(rs_str(s))
    variant_ok = F.try_parse_json(t).isNotNull()
    first = F.substring(t, 1, 1)
    # string literals (escapes included) collapse to '#', which
    # carries no structural characters
    stripped = F.regexp_replace(t, r'"(?:[^"\\]|\\.)*"', "#")
    scalar_ok = t.rlike(
        r"^(?:-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|true|false|null)$")
    string_ok = stripped == "#"

    def step(acc, c):
        delta = (F.when(c.isin("{", "["), F.lit(1))
                 .when(c.isin("}", "]"), F.lit(-1))
                 .otherwise(F.lit(0)))
        ndepth = acc.depth + delta
        closes = c.isin("}", "]") & (ndepth == 0) & (~acc.done)
        is_ws = c.isin(" ", "\t", "\r", "\n", "")
        nbad = acc.bad | (ndepth < 0) | (acc.done & ~is_ws)
        return F.struct(ndepth.alias("depth"),
                        (acc.done | closes).alias("done"),
                        nbad.alias("bad"))

    st = F.aggregate(
        F.split(stripped, ""),
        F.struct(F.lit(0).alias("depth"), F.lit(False).alias("done"),
                 F.lit(False).alias("bad")),
        step)
    container_ok = st.done & ~st.bad & (st.depth == 0)
    full = (F.when(first.isin("{", "["), container_ok)
            .when(first == '"', string_ok)
            .otherwise(scalar_ok))
    return variant_ok & full


def append_json(dst_json: ColumnOrName, src_json: ColumnOrName) -> Column:
    """Shallow merge of two JSON objects (src keys win), the engine's
    append_json / variable-subtree merge analog (ref:
    doc/source/rainerscript/variable_property_types.rst:37-70).

    Pure-SQL implementation: explode both to maps of raw JSON values,
    map_concat, re-assemble. Key order follows map_concat (dst keys
    first, then new src keys) — deterministic for a given input.
    """
    dst_m = F.from_json(rs_str(dst_json), "map<string,string>")
    src_m = F.from_json(rs_str(src_json), "map<string,string>")
    merged = F.map_concat(
        F.map_filter(F.coalesce(dst_m, F.expr("map()")),
                     lambda k, _: ~F.map_contains_key(F.coalesce(src_m, F.expr("map()")), k)),
        F.coalesce(src_m, F.expr("map()")),
    )
    return F.to_json(merged)


#: fmunflatten segment buffer: 256-byte kbuf holds 255 chars + NUL
#: (ref: contrib/fmunflatten/fmunflatten.c:39 FMUNFLATTEN_KBUFLEN)
_UNFLATTEN_SEG_MAX = 255


def _unflatten_add(dst: dict, key: str, value, delim: str) -> None:
    """One flat key into the nested tree (ref: fmunflatten.c:56-132
    unflatten_add): segments >255 chars truncate; a non-object node
    in the way is DELETED and re-added (key moves to end of object
    order, like json_object_object_del + _add); object values
    recurse so nested trees unflatten too."""
    p = 0
    while True:
        q = key.find(delim, p)
        seg = key[p:] if q < 0 else key[p:q]
        if len(seg) > _UNFLATTEN_SEG_MAX:
            seg = seg[:_UNFLATTEN_SEG_MAX]
        exists = seg in dst
        if q >= 0:  # intermediate node
            o = dst.get(seg)
            if exists and isinstance(o, dict):
                pass
            else:
                if exists:          # override: del + add, key → end
                    del dst[seg]
                o = {}
                dst[seg] = o
            dst = o
            p = q + 1
        else:  # final node
            if isinstance(value, dict):
                o = dst.get(seg)
                if not (exists and isinstance(o, dict)):
                    if exists:
                        del dst[seg]
                    o = {}
                    dst[seg] = o
                _unflatten_obj(value, o, delim)
            else:
                if exists:
                    del dst[seg]
                dst[seg] = value
            return


def _unflatten_obj(src: dict, dst: dict, delim: str) -> None:
    for k, v in src.items():
        _unflatten_add(dst, str(k), v, delim)


def unflatten(json_col: ColumnOrName, sep: str = ".") -> Column:
    """fmunflatten unflatten(src, delim) (ref: contrib/fmunflatten/
    fmunflatten.c:148-198): NULL/unset src → NULL (the caller maps
    that to the reference's number-0-with-script_error return); a
    JSON *object* unflattens deeply; any other non-null value — JSON
    scalar or plain text — passes through verbatim (the reference
    deep-copies non-object json values, errno OK).

    Python implementation over Arrow batches (pandas_udf) — this is a
    config-rare operator, not a hot-path one; flagged as the UDF
    escape hatch it is.
    """
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _unflatten_series(s):
        def one(txt):
            if not txt:
                # NULL/empty tree root ≡ the reference's never-
                # touched $! (datatype not 'J' → EINVAL return)
                return None
            flat = None
            if txt[:1] == "{":
                try:
                    flat = _json.loads(txt)
                except ValueError:
                    flat = None
            if not isinstance(flat, dict):
                return txt
            root: dict = {}
            _unflatten_obj(flat, root, sep)
            return _json.dumps(root, separators=(",", ":"))

        return s.map(one)

    _unflatten_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _unflatten = pandas_udf(_unflatten_series, "string")
    return _unflatten(rs_str(json_col))


def json_deep_set(json_col: ColumnOrName, path: str,
                  value: Column) -> Column:
    """``set $!a!b = value`` with subtree-merge semantics (ref:
    runtime/ruleset.c:189-203; merge rules doc/source/rainerscript/
    variable_property_types.rst:37-70): intermediate objects are
    created, an existing scalar at an intermediate step is replaced by
    an object, and sibling keys survive.

    Arrow-batched pandas UDF: arbitrary-depth JSON mutation has no
    Column-expression form (VARIANT is read-only in Spark 4) — flagged
    slow path; for FIXED schemas prefer withField on a struct column.
    """
    import json as _json

    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    segs = [s for s in
            path.lstrip("$").lstrip("!.").replace("!", ".").split(".") if s]
    if not segs:
        raise ValueError(f"empty JSON path {path!r}")

    @pandas_udf("string")
    def _set(js: "pd.Series", vals: "pd.Series") -> "pd.Series":
        out = []
        for txt, v in zip(js, vals):
            try:
                root = _json.loads(txt) if txt else {}
            except (ValueError, TypeError):
                root = {}
            if not isinstance(root, dict):
                root = {}
            node = root
            for s in segs[:-1]:
                nxt = node.get(s)
                if not isinstance(nxt, dict):   # scalar → object
                    nxt = {}
                    node[s] = nxt
                node = nxt
            node[segs[-1]] = None if v is None else (
                _json.loads(v) if isinstance(v, str)
                and v[:1] in "{[" else v)
            out.append(_json.dumps(root, separators=(",", ":")))
        return pd.Series(out)

    return _set(rs_str(json_col), value.cast("string"))


def json_unset(json_col: ColumnOrName, path: str) -> Column:
    """``unset $!a!b`` — remove a key from the JSON tree (ref:
    runtime/ruleset.c unset). Same flagged UDF path as json_deep_set."""
    import json as _json

    import pandas as pd  # noqa: F401
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    segs = [s for s in
            path.lstrip("$").lstrip("!.").replace("!", ".").split(".") if s]

    @pandas_udf("string")
    def _unset(js: "pd.Series") -> "pd.Series":
        out = []
        for txt in js:
            try:
                root = _json.loads(txt) if txt else {}
            except (ValueError, TypeError):
                root = {}
            node = root
            ok = isinstance(node, dict)
            for s in segs[:-1]:
                if not (ok and isinstance(node, dict) and s in node):
                    ok = False
                    break
                node = node[s]
            if ok and isinstance(node, dict):
                node.pop(segs[-1], None)
            out.append(_json.dumps(root, separators=(",", ":")))
        return pd.Series(out)

    return _unset(rs_str(json_col))


#: a JSON string literal (quote-safe tokenizer for jsonc_spaced)
_JSTR_RE = r'"[^"\\]*+(?:\\.[^"\\]*+)*+"'


def jsonc_spaced(c: ColumnOrName) -> Column:
    """Re-render compact JSON text in json-c's
    JSON_C_TO_STRING_SPACED form — the reference's default render for
    object/array-valued variable reads (glbl.c:104 glblJsonFormatOpt;
    golden json_array_subscripting.sh: ``{ "baz": "other_msg" }``):
    spaces inside braces/brackets and after ':'/',' with forward
    slashes escaped, empty containers as ``{ }`` / ``[ ]``.

    Pure column ops, quote-safe: string literals are extracted with
    one regex pass, punctuation respacing happens on the
    string-free skeleton (literal replaces, no regex), and the
    literals re-inject via split+zip — contents of strings are never
    touched (other than the json-c '/'→'\\/' escape)."""
    s = rs_str(c)
    strs = F.regexp_extract_all(s, F.lit(f"({_JSTR_RE})"), 1)
    skel = F.regexp_replace(s, _JSTR_RE, "\x01")
    skel = F.regexp_replace(skel, r"\s+", "")   # normalize compact
    for a, b in (("{}", "\x02"), ("[]", "\x03"),
                 ("{", "{ "), ("}", " }"), ("[", "[ "), ("]", " ]"),
                 (",", ", "), (":", ": "),
                 ("\x02", "{ }"), ("\x03", "[ ]")):
        skel = F.replace(skel, F.lit(a), F.lit(b))
    parts = F.split(skel, "\x01", -1)
    esc = F.transform(
        strs,
        # escape '/' like json-c, idempotently: an already-escaped
        # \/ (input previously rendered spaced) must not double
        lambda x: F.replace(
            F.replace(F.replace(x, F.lit("\\/"), F.lit("\x04")),
                      F.lit("/"), F.lit("\\/")),
            F.lit("\x04"), F.lit("\\/")))
    rest = F.zip_with(
        esc, F.slice(parts, 2, F.greatest(F.size(parts) - 1,
                                          F.lit(0))),
        lambda m, p: F.concat(m, p))
    return F.concat(F.element_at(parts, 1), F.array_join(rest, ""))


def render_var_value(c: ColumnOrName) -> Column:
    """Variable-read render: object/array values re-render json-c
    SPACED (the reference's json node → string conversion), scalars
    pass through. Gated on BOTH the first char and an actual JSON
    parse — plain log text that merely starts with '['/'{' must pass
    through untouched. Lazy CASE arms: scalar reads pay one
    first-char compare, brace-leading rows one try_parse_json.

    Corner divergence (documented): a STRING-typed variable whose
    text is itself valid JSON ('set $!v = "[1]"') re-renders spaced
    here — the flat column cannot distinguish it from an array node;
    the reference keeps string nodes verbatim."""
    s = rs_str(c)
    first = F.substring(s, 1, 1)
    return F.when(first.isin("{", "[") &
                  F.try_parse_json(s).isNotNull(),
                  jsonc_spaced(s)).otherwise(s)

"""RainerScript expression semantics as Spark Column builders.

The reference's expression language is dynamically typed with exactly
four runtime datatypes (ref: grammar/rainerscript.h:64-74) and coercion
rules that differ from SQL (ref: grammar/rainerscript.c:3803-3960):

- Comparisons try numeric first: if BOTH sides convert to integers the
  comparison is numeric, else both are compared as strings.
- Division / modulo by zero yield 0, never error/NULL
  (ref: grammar/rainerscript.c:3803-3812).
- ``&`` is string concatenation; ``+ - * /`` are integer arithmetic
  (ref: grammar/grammar.y:123-125; the expression core has no floats).
- Missing variables read as empty string / 0.

We *compile* these rules once into Column trees (Catalyst then codegens
them) rather than interpreting per row — all builders below are pure
``pyspark.sql.functions`` compositions, no UDFs, so they stay inside
whole-stage codegen and remain constant-foldable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.schema import FACILITIES, SEVERITIES

ColumnOrName = Column | str


def memo_column_factory(fn):
    """Session-keyed memo for PURE Column factories (r11 perf).

    Building a large Column tree costs one Py4J round-trip per
    ``F.*`` call (~2 ms each) — a factory like ``is_in_subnet``
    (~250 calls) burned ~0.65 s per plan BUILD, dominating its
    query's wall at bench scale and billing every repeated plan
    construction at any scale. Column objects are immutable
    expression trees, so a factory that is a pure function of its
    arguments can hand back the SAME Column for the same arguments.

    Key: primitive args by value; Column (or other unhashable) args
    by object identity — the args tuple is pinned in the cache entry
    so an id() can never be recycled while its key lives. Entries are
    keyed by the active SparkContext's applicationId (see
    session_cache_key) so a restarted JVM misses cleanly, and the
    cache is registered for the dead-session sweep (entries owned by
    a stopped application are dropped when a new one becomes active,
    so long-lived multi-session drivers don't accumulate py4j refs).
    Apply ONLY to deterministic factories (never anything
    seeded/random).
    """
    import functools

    from rsyslog_spark.session import register_session_cache

    cache: dict = register_session_cache({})

    def keypart(a):
        try:
            hash(a)
            return ("v", a)
        except TypeError:
            return ("id", id(a))

    @functools.wraps(fn)
    def wrapped(*args, **kw):
        from rsyslog_spark.session import session_cache_key

        sk = session_cache_key()
        if sk is None:
            return fn(*args, **kw)
        key = (sk, tuple(keypart(a) for a in args),
               tuple((k, keypart(v)) for k, v in sorted(kw.items())))
        hit = cache.get(key)
        if hit is None:
            hit = (fn(*args, **kw), args, kw)   # pin arg refs
            cache[key] = hit
        return hit[0]

    return wrapped


def _c(x: ColumnOrName | int | float) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def rs_num(x: ColumnOrName | int) -> Column:
    """Coerce to RainerScript number (long long); non-numeric → 0.

    Mirrors var2Number semantics: strings that don't parse as integers
    read as 0; missing (NULL) reads as 0.
    """
    return F.coalesce((_c(x)).try_cast("long"), F.lit(0).cast("long"))


def rs_str(x: ColumnOrName | int) -> Column:
    """Coerce to RainerScript string; missing (NULL) reads as ''."""
    return F.coalesce(_c(x).cast("string"), F.lit(""))


def qcol(name: str) -> Column:
    """Column ref by LITERAL name: backtick-quoted so variable
    columns whose flat name contains dots ('set $!a.b.c' →
    ``cee_a.b.c``) don't parse as struct-field access."""
    return F.col("`" + name.replace("`", "``") + "`")


def rs_bool(x: ColumnOrName | int) -> Column:
    """RainerScript truthiness: nonzero number is true (cbool rules)."""
    return rs_num(x) != 0


_CMP = {
    "==": Column.__eq__,
    "!=": Column.__ne__,
    "<": Column.__lt__,
    "<=": Column.__le__,
    ">": Column.__gt__,
    ">=": Column.__ge__,
}


def rs_cmp(left: ColumnOrName, right: ColumnOrName | int | str, op: str) -> Column:
    """Comparison with rsyslog's numeric-first coercion.

    If both sides try_cast to long → numeric comparison, else string
    comparison (ref: eval_strcmp_like, grammar/rainerscript.c:3839-3866;
    CMP_EQ special cases 3893-3960). NULL inputs behave as missing
    variables: empty string / 0.
    """
    if op not in _CMP:
        raise ValueError(f"unknown comparison op {op!r}")
    lc, rc = _c(left), _c(right) if not isinstance(right, (int, str)) else F.lit(right)
    ln, rn = (lc).try_cast("long"), (rc).try_cast("long")
    cmp_fn = _CMP[op]
    numeric = cmp_fn(F.coalesce(ln, F.lit(0)), F.coalesce(rn, F.lit(0)))
    stringy = cmp_fn(rs_str(lc), rs_str(rc))
    return F.when(ln.isNotNull() & rn.isNotNull(), numeric).otherwise(stringy)


def rs_eq_array(left: ColumnOrName, values: list[str]) -> Column:
    """``$x == ["a","b"]`` array comparison → Catalyst In/InSet.

    The reference sorts the array for binary search at optimize time
    (ref: grammar/rainerscript.c:5685-5688); Spark's InSet hash set is
    the equivalent physical strategy.
    """
    return rs_str(left).isin(*values)


def rs_add(l: ColumnOrName, r: ColumnOrName) -> Column:
    return rs_num(l) + rs_num(r)


def rs_sub(l: ColumnOrName, r: ColumnOrName) -> Column:
    return rs_num(l) - rs_num(r)


def rs_mul(l: ColumnOrName, r: ColumnOrName) -> Column:
    return rs_num(l) * rs_num(r)


def rs_div(l: ColumnOrName, r: ColumnOrName) -> Column:
    """Integer division; division by zero yields 0 (not NULL/error).

    ref: grammar/rainerscript.c:3803-3812 and the constant-fold
    equivalents at 5719-5739.
    """
    rn = rs_num(r)
    return F.when(rn == 0, F.lit(0).cast("long")).otherwise(
        F.try_divide(rs_num(l), rn).cast("long")
    )


def rs_mod(l: ColumnOrName, r: ColumnOrName) -> Column:
    """Modulo; by zero yields 0 (ref: grammar/rainerscript.c:3803-3812)."""
    rn = rs_num(r)
    return F.when(rn == 0, F.lit(0).cast("long")).otherwise(rs_num(l) % rn)


def rs_neg(x: ColumnOrName) -> Column:
    return -rs_num(x)


def rs_concat(*parts: ColumnOrName | str | int) -> Column:
    """``&`` operator: string concatenation with number→string coercion."""
    return F.concat(*[rs_str(_c(p)) for p in parts])


def exists(col: ColumnOrName) -> Column:
    """``exists($!x)`` presence test (ref: grammar/grammar.y:78,
    runtime/msg.h:286)."""
    return _c(col).isNotNull()


# ---------------------------------------------------------------------------
# PRI filters — "mail.info;*.err" selector compilation
# ---------------------------------------------------------------------------


class PriFilter:
    """Compiled PRI filter: 25 per-facility severity bitmasks.

    The reference compiles selector syntax ("mail.*", "*.=err",
    "kern.!info") to ``pmask[25]`` at config load (ref:
    grammar/rainerscript.c cnfstmtNewPRIFILT, rainerscript.h:421;
    exec runtime/ruleset.c:403-417). We do the same at plan time and
    emit a single cheap integer test. AND/OR/NOT of two PriFilters
    merge masks plan-side (ref: rainerscript.c:5643-5679), so chained
    filters cost one array lookup regardless of selector count.
    """

    __slots__ = ("pmask",)

    def __init__(self, pmask: list[int] | None = None):
        self.pmask = list(pmask) if pmask is not None else [0] * 25

    # -- construction -------------------------------------------------
    @classmethod
    def parse(cls, spec: str) -> "PriFilter":
        """Parse classic selector syntax: ``fac[,fac].prio`` joined by ``;``.

        Priority forms: ``*`` (all), ``none``, ``prio`` (that severity
        and more severe, i.e. numerically <=), ``=prio`` (exactly),
        ``!prio`` (exclude prio and more severe), ``!=prio`` (exclude
        exactly). Mirrors doc/source/configuration/filters.rst.
        """
        flt = cls()
        for selector in spec.split(";"):
            selector = selector.strip()
            if not selector:
                continue
            fac_part, _, prio_part = selector.rpartition(".")
            if not fac_part:
                raise ValueError(f"bad selector {selector!r}")
            facilities: list[int] = []
            for fac in fac_part.split(","):
                fac = fac.strip()
                if fac == "*":
                    facilities = list(range(25))
                    break
                if fac not in FACILITIES:
                    raise ValueError(f"unknown facility {fac!r}")
                facilities.append(FACILITIES[fac])
            prio = prio_part.strip()
            negate = prio.startswith("!")
            if negate:
                prio = prio[1:]
            exact = prio.startswith("=")
            if exact:
                prio = prio[1:]
            if prio == "*":
                bits = (1 << 8) - 1
            elif prio == "none":
                # '.none' clears; '.!none' fills (conf.c:402-406
                # INTERNAL_NOPRI: ignorepri → TABLE_ALLPRI)
                for f_ in facilities:
                    flt.pmask[f_] = 0xFF if negate else 0
                continue
            else:
                if prio not in SEVERITIES:
                    raise ValueError(f"unknown severity {prio!r}")
                sev = SEVERITIES[prio]
                if exact:
                    bits = 1 << sev
                else:
                    # prio and more-severe == severities 0..sev
                    bits = (1 << (sev + 1)) - 1
            for f_ in facilities:
                if negate:
                    # standalone negated selectors ('local4.!=debug')
                    # fill the untouched facility mask BEFORE
                    # clearing, so they match everything except the
                    # excluded priorities (conf.c:409,422
                    # 'if pmask==TABLE_NOPRI → TABLE_ALLPRI';
                    # ChangeLog 2026-06-22)
                    if flt.pmask[f_] == 0:
                        flt.pmask[f_] = 0xFF
                    flt.pmask[f_] &= ~bits & 0xFF
                else:
                    flt.pmask[f_] |= bits
        return flt

    # -- plan-time mask algebra (ref: rainerscript.c:5643-5679) --------
    def __and__(self, other: "PriFilter") -> "PriFilter":
        return PriFilter([a & b for a, b in zip(self.pmask, other.pmask)])

    def __or__(self, other: "PriFilter") -> "PriFilter":
        return PriFilter([a | b for a, b in zip(self.pmask, other.pmask)])

    def __invert__(self) -> "PriFilter":
        return PriFilter([~m & 0xFF for m in self.pmask])

    # -- emission ------------------------------------------------------
    def col(self, facility: ColumnOrName, severity: ColumnOrName) -> Column:
        """Boolean Column: does (facility, severity) pass the mask?

        Emitted as ``element_at(bitarray, fac*8+sev+1)`` over a flat
        200-element boolean literal — one integer index per row, fully
        codegen'd; no string comparisons survive to runtime (the
        reference's facility-text→mask rewrite, rainerscript.c:5596-5641).
        """
        bits = F.array(*[
            F.lit(bool((self.pmask[f] >> s) & 1))
            for f in range(25) for s in range(8)
        ])
        fac = F.coalesce((_c(facility)).try_cast("int"), F.lit(24))
        sev = F.coalesce((_c(severity)).try_cast("int"), F.lit(7))
        fac = F.when((fac >= 0) & (fac <= 24), fac).otherwise(F.lit(24))
        sev = F.when((sev >= 0) & (sev <= 7), sev).otherwise(F.lit(7))
        return F.element_at(bits, fac * 8 + sev + 1)


from rsyslog_spark.session import register_session_cache as _reg_cache

_PRIFILT_CACHE: dict[tuple, Column] = _reg_cache({})


def prifilt(spec: str, facility: ColumnOrName = "syslogfacility",
            severity: ColumnOrName = "syslogseverity") -> Column:
    """``prifilt("mail.*")`` scalar function (ref:
    grammar/rainerscript.c:4467-4510 registry).

    The 200-element mask literal costs ~200 Py4J calls to build, so
    compiled masks are memoized per (spec, columns) — the analog of
    the reference compiling the mask once at config load."""
    if isinstance(facility, str) and isinstance(severity, str):
        from rsyslog_spark.session import session_cache_key

        sk = session_cache_key()   # JVM-restart-safe memo key
        key = (sk, spec, facility, severity)
        got = _PRIFILT_CACHE.get(key) if sk else None
        if got is None:
            got = PriFilter.parse(spec).col(facility, severity)
            if sk:
                _PRIFILT_CACHE[key] = got
        return got
    return PriFilter.parse(spec).col(facility, severity)

"""Ruleset DSL: rsyslog's statement-list execution model compiled to a
single declarative DataFrame DAG.

The reference walks a per-ruleset linked list of statements for each
message (ref: runtime/ruleset.c:536-598 scriptExec; statement enum
grammar/rainerscript.h:112-181). We compile the SAME program shape
into Column expressions instead of interpreting per row:

- Each row carries an implicit "live" predicate (a Column, not a
  materialized column). ``If`` narrows it for its branches; ``Stop``
  removes the branch's rows from everything downstream (ref:
  S_STOP, grammar/rainerscript.h:112; omdiscard→STOP optimization
  rainerscript.c:5889-5898).
- ``Set``/``Unset`` become conditional ``withColumn`` — only rows
  whose live-predicate holds observe the assignment, which is exactly
  the interpreter's branch semantics (ref: runtime/ruleset.c:189-203).
- ``Action`` snapshots the rows live at that point — the fan-out
  edge. Compilation returns one DataFrame per action; all of them
  share the same scan (Spark caches/fuses common lineage; at scale
  this is one pass over the source with N filtered projections).
- ``Call`` inlines the target ruleset's statements (sync call,
  depth-limited 10 — ref: runtime/ruleset.c:205-294). Async queued
  calls are modeled by the streaming layer as separate queries.
- ``Foreach`` explodes a JSON array into per-element rows within the
  branch (ref: runtime/ruleset.c:310-401) — elements become a column
  bound to the loop variable; downstream statements in the body see
  one row per element.

Scale note: the compiled plan is pure narrow transformations
(filter/project) — no shuffle, fully whole-stage-codegen'd, and
Catalyst collapses the filter chains (equivalent of the reference's
NOP-removal + filter fusion, rainerscript.c:5803-5919). At 100 TB
the fan-out does not re-scan: use ``engine.run(df)`` once and write
each action's DataFrame in a single ``foreachBatch`` (streaming) or
rely on parquet scan reuse (batch).

Variable namespaces (ref: runtime/typedefs.h:244-248): ``$!name``
(message JSON tree) and ``$.name`` (local) map to flat columns via
``varname`` — ``$.x`` → ``local_x``, ``$!x`` → ``cee_x``, ``$/x`` →
``global_x``. Sinks must drop ``local_*`` columns ($.-vars are never
serialized — ref doc variable_property_types.rst).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.expr import prifilt as prifilt_col

MAX_CALL_DEPTH = 10  # ref: runtime/ruleset.c:222 (call depth limit)

CondLike = Union[Column, Callable[[DataFrame], Column]]


def varname(name: str) -> str:
    """Map a RainerScript variable name to its engine column name."""
    if name.startswith("$!"):
        return "cee_" + name[2:].replace("!", "_")
    if name.startswith("$."):
        return "local_" + name[2:].replace("!", "_")
    if name.startswith("$/"):
        return "global_" + name[2:].replace("!", "_")
    return name.lstrip("$")


# --------------------------------------------------------------------------
# Statement nodes
# --------------------------------------------------------------------------


@dataclass
class Set:
    """set $.x = EXPR; — conditional column assignment."""
    name: str
    value: Union[Column, Callable[[DataFrame], Column]]


@dataclass
class Unset:
    name: str


@dataclass
class Stop:
    """stop / discard (~): remove row from all downstream statements."""


@dataclass
class Action:
    """action(...): snapshot rows live here, optionally transformed
    (template projection, omdiscard-style no-op, etc.). ``params``
    carries config-file action parameters verbatim (omfile file=...,
    omfwd target=..., ...) for the sink layer to interpret."""
    name: str
    transform: Callable[[DataFrame], DataFrame] | None = None
    params: dict | None = None


@dataclass
class If:
    cond: CondLike
    then: Sequence["Stmt"] = dc_field(default_factory=list)
    orelse: Sequence["Stmt"] = dc_field(default_factory=list)


@dataclass
class PriFilt:
    """Classic selector filter ("mail.info;*.err") statement."""
    spec: str
    then: Sequence["Stmt"] = dc_field(default_factory=list)


@dataclass
class PropFilt:
    """:prop, op, "value" filter (ref ops enum runtime/typedefs.h:172-179,
    eval runtime/ruleset.c:424-500)."""
    prop: str
    op: str            # contains|isequal|startswith|endswith|regex|isempty
    value: str = ""
    negate: bool = False
    then: Sequence["Stmt"] = dc_field(default_factory=list)


@dataclass
class Call:
    ruleset: str


@dataclass
class CallIndirect:
    """call_indirect EXPR — ruleset name computed per row at runtime
    (ref: runtime/ruleset.c:236-275). Compiled as one guarded inline
    expansion per KNOWN ruleset: rows whose computed name matches no
    ruleset pass through unchanged, mirroring the reference's
    error-and-continue behavior."""
    name_expr: Union[Column, Callable[[DataFrame], Column]]


@dataclass
class Foreach:
    """foreach ($.elem in EXPR) — explode a JSON array column into the
    loop variable; body statements see one row per element."""
    var: str
    array: Union[Column, Callable[[DataFrame], Column]]
    body: Sequence["Stmt"] = dc_field(default_factory=list)


Stmt = Union[Set, Unset, Stop, Action, If, PriFilt, PropFilt, Call,
             CallIndirect, Foreach]


@dataclass
class Ruleset:
    name: str
    stmts: Sequence[Stmt]


# --------------------------------------------------------------------------
# Compiler
# --------------------------------------------------------------------------


def _prop_cond(df: DataFrame, s: PropFilt) -> Column:
    c = F.col(s.prop)
    if s.op == "contains":
        cond = c.contains(s.value)
    elif s.op == "isequal":
        cond = c == s.value
    elif s.op == "startswith":
        cond = c.startswith(s.value)
    elif s.op == "endswith":
        cond = c.endswith(s.value)
    elif s.op in ("regex", "ereregex"):
        cond = c.rlike(s.value)
    elif s.op == "isempty":
        cond = F.coalesce(F.length(c), F.lit(0)) == 0
    else:
        raise ValueError(f"unknown propfilt op {s.op!r}")
    # missing property compares false, like the reference's empty-string read
    cond = F.coalesce(cond, F.lit(False))
    return ~cond if s.negate else cond


class _Compiler:
    def __init__(self, rulesets: dict[str, Ruleset]):
        self.rulesets = rulesets
        self.actions: list[tuple[str, DataFrame]] = []
        self._stack: list[str] = []

    def run(self, rs: Ruleset, df: DataFrame) -> DataFrame:
        self.df = df
        self._stack = [rs.name]
        live = self._exec(rs.stmts, F.lit(True), depth=0)
        # rows surviving the whole ruleset (not stopped)
        return self.df.filter(live)

    # Executes stmts under `live`; returns the survivor predicate
    # (live minus rows that hit a Stop).
    def _exec(self, stmts: Sequence[Stmt], live: Column, depth: int) -> Column:
        for s in stmts:
            if isinstance(s, Set):
                v = s.value(self.df) if callable(s.value) else s.value
                name = varname(s.name)
                prev = F.col(name) if name in self.df.columns else F.lit(None)
                self.df = self.df.withColumn(name, F.when(live, v).otherwise(prev))
            elif isinstance(s, Unset):
                name = varname(s.name)
                if name in self.df.columns:
                    self.df = self.df.withColumn(
                        name, F.when(live, F.lit(None)).otherwise(F.col(name))
                    )
            elif isinstance(s, Stop):
                # All rows live here stop; later statements in this
                # block still compile (their actions register) but see
                # no rows — matches interpreter unreachability.
                live = F.lit(False)
            elif isinstance(s, Action):
                snap = self.df.filter(live)
                if s.transform is not None:
                    snap = s.transform(snap)
                self.actions.append((s.name, snap))
            elif isinstance(s, If):
                cond = s.cond(self.df) if callable(s.cond) else s.cond
                cond = F.coalesce(cond, F.lit(False))
                t = self._exec(s.then, live & cond, depth)
                e = self._exec(s.orelse, live & ~cond, depth)
                live = t | e
            elif isinstance(s, PriFilt):
                t = self._exec(s.then, live & prifilt_col(s.spec), depth)
                live = t | (live & ~prifilt_col(s.spec))
            elif isinstance(s, PropFilt):
                cond = _prop_cond(self.df, s)
                t = self._exec(s.then, live & cond, depth)
                live = t | (live & ~cond)
            elif isinstance(s, Call):
                if depth >= MAX_CALL_DEPTH:
                    raise RecursionError(
                        f"call depth > {MAX_CALL_DEPTH} (ref ruleset.c:222)"
                    )
                target = self.rulesets[s.ruleset]
                self._stack.append(s.ruleset)
                live = self._exec(target.stmts, live, depth + 1)
                self._stack.pop()
            elif isinstance(s, CallIndirect):
                if depth >= MAX_CALL_DEPTH:
                    raise RecursionError(
                        f"call depth > {MAX_CALL_DEPTH} (ref ruleset.c:222)"
                    )
                nm = s.name_expr(self.df) if callable(s.name_expr) \
                    else s.name_expr
                out_live = F.lit(False)
                matched_any = F.lit(False)
                # static expansion cannot unroll cycles: rulesets
                # already on the call stack are skipped (the reference
                # bounds re-entry at depth 10 dynamically; a config
                # relying on indirect SELF-recursion is out of scope)
                for rname, target in self.rulesets.items():
                    if rname in self._stack:
                        continue
                    sel = F.coalesce(nm == F.lit(rname), F.lit(False))
                    matched_any = matched_any | sel
                    self._stack.append(rname)
                    out_live = out_live | self._exec(
                        target.stmts, live & sel, depth + 1)
                    self._stack.pop()
                # unmatched names: row continues in the caller
                live = out_live | (live & ~matched_any)
            elif isinstance(s, Foreach):
                arr = s.array(self.df) if callable(s.array) else s.array
                name = varname(s.var)
                # explode only rows that are live; dead rows keep one
                # null-element copy so the live predicate stays valid
                # dead rows get a null element (explode_outer keeps
                # them as single rows) so outer statements still see them
                self.df = self.df.withColumn(
                    name, F.explode_outer(F.when(live, arr))
                )
                live_body = live & F.col(name).isNotNull()
                self._exec(s.body, live_body, depth)
            else:
                raise TypeError(f"unknown statement {s!r}")
        return live


class RulesetEngine:
    """Holds named rulesets; compiles one entry ruleset against a
    DataFrame into per-action output DataFrames.

    Returns (actions, survivors): ``actions`` is an ordered list of
    (action_name, DataFrame) fan-out edges; ``survivors`` the rows
    that ran off the end of the statement list.
    """

    def __init__(self, rulesets: Sequence[Ruleset]):
        self.rulesets = {r.name: r for r in rulesets}

    def run(
        self, df: DataFrame, entry: str = "RSYSLOG_DefaultRuleset"
    ) -> tuple[list[tuple[str, DataFrame]], DataFrame]:
        comp = _Compiler(self.rulesets)
        survivors = comp.run(self.rulesets[entry], df)
        return comp.actions, survivors

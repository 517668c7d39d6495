"""Config translation: rsyslog.conf (RainerScript / legacy) ⇄ YAML
(the ``rsyslogd -o <out> -F {yaml|rainerscript}`` feature — ref:
runtime/translate.c; goldens tests/config-translate-*.sh, all
cmp_exact).

The translator keeps its own STRUCTURAL parse (param lists with
source datatypes, statement ASTs) because the execution parser
compiles statements to Column closures. Expression parsing reuses
the engine `_Parser`; emission follows the reference's canonical
formatting exactly:

* params sort by preferred-key rank (name < type < load < rest) then
  strcmp (translate.c nvlstSortComesBefore);
* every binary operator renders parenthesized ``(l op r)``, ``not``
  and unary minus unparenthesized (exprToString);
* rulesets classify as actions-only / filter+actions / statements /
  script exactly like captureYamlRulesetBody, with legacy selector
  shorthands mapped through legacyActionToNvlst and
  buildPriFilterExpr;
* warnings surface as ``# TRANSLATION WARNING: ...`` comments.

CLI: ``python tools/config_translate.py -f in.conf -F yaml -o out``.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

from rsyslog_spark.config.rainerscript import _Parser, _lex, _unquote

# value = ("S", str) | ("N", int) | ("A", [str, ...])
Param = tuple[str, tuple]

#: object keywords → (yaml section, rs keyword); order = emission order
_SECTIONS = [
    ("global", "global"), ("main_queue", "mainqueue"),
    ("module", "modules"), ("input", "inputs"),
    ("template", "templates"), ("lookup_table", "lookup_tables"),
    ("parser", "parsers"), ("timezone", "timezones"),
    ("dyn_stats", "dyn_stats"), ("perctile_stats", "perctile_stats"),
    ("ratelimit", "ratelimits"),
]
_RS_ORDER = ["global", "main_queue", "module", "input", "template",
             "lookup_table", "parser", "timezone", "dyn_stats",
             "perctile_stats", "ratelimit", "ruleset"]
_YAML_ORDER = ["modules", "inputs", "templates", "rulesets",
               "lookup_tables", "parsers", "timezones", "dyn_stats",
               "perctile_stats", "ratelimits"]


@dataclass
class TItem:
    params: list[Param] = dfield(default_factory=list)
    stmts: list | None = None            # rulesets: statement ASTs
    subobjs: list = dfield(default_factory=list)  # template elements
    warnings: list[str] = dfield(default_factory=list)


@dataclass
class TConfig:
    sections: dict[str, list[TItem]] = dfield(default_factory=dict)
    rulesets: list[TItem] = dfield(default_factory=list)
    warnings: list[str] = dfield(default_factory=list)

    def add(self, kind: str, item: TItem) -> None:
        self.sections.setdefault(kind, []).append(item)


def _rank(name: str) -> int:
    return {"name": 0, "type": 1, "load": 2}.get(name, 3)


def _sort_params(params: list[Param]) -> list[Param]:
    return sorted(params, key=lambda kv: (_rank(kv[0]), kv[0]))


# ------------------------------------------------------------ frontend

class _TxParser:
    """Structural parse for translation, over the engine token
    stream; expressions delegate to the engine parser (ASTs)."""

    def __init__(self, src: str):
        self.p = _Parser(_lex(src))

    # -- params with datatypes (the engine's parse_param_block
    #    stringifies; translation must keep N/A/S apart)
    def param_block(self) -> list[Param]:
        p = self.p
        p.expect("(")
        out: list[Param] = []
        while not p.accept(")"):
            key = p.next().text
            while p.accept("."):
                key += "." + p.next().text
            p.expect("=")
            t = p.peek()
            if t.text == "[":
                p.next()
                items = []
                while not p.accept("]"):
                    tok = p.next()
                    items.append(_unquote(tok.text)
                                 if tok.kind == "string" else tok.text)
                    p.accept(",")
                out.append((key, ("A", items)))
            elif t.kind == "number":
                p.next()
                out.append((key, ("N", int(t.text))))
            else:
                p.next()
                out.append((key, ("S", _unquote(t.text)
                                  if t.kind == "string" else t.text)))
            p.accept(",")
        return out

    def parse(self) -> TConfig:
        cfg = TConfig()
        p = self.p
        top_stmts: list = []
        while p.peek().kind != "eof":
            t = p.peek()
            if t.kind == "name" and t.text == "ruleset" \
                    and p.peek(1).text == "(":
                p.next()
                it = TItem(params=self.param_block())
                p.expect("{")
                it.stmts = self.stmt_list("}")
                cfg.rulesets.append(it)
                continue
            if t.kind == "name" and t.text == "template" \
                    and p.peek(1).text == "(":
                p.next()
                it = TItem(params=self.param_block())
                if p.accept("{"):
                    while not p.accept("}"):
                        kind = p.next().text   # property | constant
                        it.subobjs.append(
                            (kind, self.param_block()))
                cfg.add("template", it)
                continue
            matched = False
            for kw, _sec in _SECTIONS:
                if t.kind == "name" and t.text == kw \
                        and p.peek(1).text == "(":
                    p.next()
                    cfg.add(kw, TItem(params=self.param_block()))
                    matched = True
                    break
            if matched:
                continue
            if t.text.startswith("$"):
                self._legacy_directive(cfg)
                continue
            # top-level statement (legacy selector line etc.)
            got = self.stmt()
            if got is not None:
                top_stmts.append(got)
        if top_stmts:
            it = TItem(params=[("name", ("S",
                                         "RSYSLOG_DefaultRuleset"))])
            it.stmts = top_stmts
            it.warnings.append(
                "top-level statements normalized into explicit "
                "RSYSLOG_DefaultRuleset")
            cfg.rulesets.insert(0, it)
        return cfg

    def _legacy_directive(self, cfg: TConfig) -> None:
        p = self.p
        d = p.next()
        name = d.text[1:].lower()
        args = []
        while p.peek().kind != "eof" and p.peek().line == d.line:
            args.append(p.next().text)
        raw = "".join(args)
        if name == "modload":
            cfg.add("module", TItem(params=[("load", ("S", raw))]))
        else:
            cfg.warnings.append(
                f"legacy directive ${d.text[1:]} has no structured "
                "translation; dropped")

    # -- statements -----------------------------------------------------
    def stmt_list(self, closer: str) -> list:
        out = []
        while not self.p.accept(closer):
            got = self.stmt()
            if got is not None:
                out.append(got)
        return out

    def block(self) -> list:
        if self.p.accept("{"):
            return self.stmt_list("}")
        s = self.stmt()
        return [s] if s is not None else []

    def stmt(self):
        p = self.p
        t = p.peek()
        if t.text == "if":
            p.next()
            cond = p.parse_expr()
            p.expect("then")
            then = self.block()
            els = self.block() if p.accept("else") else None
            return ("if", cond, then, els)
        if t.text in ("set", "reset"):
            reset = t.text == "reset"
            p.next()
            var = p.next().text
            p.expect("=")
            expr = p.parse_expr()
            p.accept(";")
            return ("set", var, expr, reset)
        if t.text == "unset":
            p.next()
            var = p.next().text
            p.accept(";")
            return ("unset", var)
        if t.text in ("stop", "~"):
            p.next()
            p.accept(";")
            return ("stop",)
        if t.text == "continue":
            p.next()
            p.accept(";")
            return ("continue",)
        if t.text == "call":
            p.next()
            return ("call", p.next().text)
        if t.text == "call_indirect":
            p.next()
            expr = p.parse_expr()
            p.accept(";")
            return ("callind", expr)
        if t.text == "foreach":
            p.next()
            p.expect("(")
            var = p.next().text
            p.expect("in")
            arr = p.parse_expr()
            p.expect(")")
            p.accept("do")
            body = self.block()
            return ("foreach", var, arr, body)
        if t.text == "action":
            p.next()
            return ("act", self.param_block())
        if t.text == "&":
            p.next()
            tgt = self._selector_target()
            return ("amp", tgt)
        if t.text == ":":
            # property filter  :prop, [!]op, "value"  TARGET
            start = t.pos
            p.next()
            prop = p.next().text
            p.expect(",")
            neg = "!" if p.accept("!") else ""
            op = p.next().text
            p.expect(",")
            val = p.next().text
            printable = f":{prop},{neg}{op},{val}"
            tgt = self._selector_target()
            return ("propfilt", printable, [tgt])
        sel = p._try_selector()
        if sel is not None:
            tgt = self._selector_target()
            return ("prifilt", sel, [tgt], None)
        raise SyntaxError(
            f"translate: unsupported statement at {t.text!r} "
            f"(line {t.line})")

    def _selector_target(self):
        p = self.p
        t = p.peek()
        if t.text == "action":
            p.next()
            return ("act", self.param_block())
        if t.text in ("~", "stop"):
            p.next()
            return ("stop",)
        raw = p._rest_of_line(t.line)
        return ("legacy_act", raw.strip())


def _splice_amp(stmts: list) -> list:
    """'&' continuations splice into the previous selector's action
    list (conf.c cfline '&'). Non-mutating: the previous statement is
    rebuilt with a copied action list so repeated calls over the same
    statements (warning scan + classification) don't double-splice."""
    out: list = []
    for s in stmts:
        if s[0] == "amp" and out and out[-1][0] in ("prifilt",
                                                    "propfilt"):
            prev = list(out[-1])
            prev[2] = list(prev[2]) + [s[1]]
            out[-1] = type(out[-1])(prev) \
                if isinstance(out[-1], tuple) else prev
        else:
            out.append(s)
    return out


# ------------------------------------------------------------- emitters

def _quote(s: str) -> str:
    out = ['"']
    for ch in s:
        if ch in ('"', "\\"):
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _value_str(v: tuple) -> str:
    kind, val = v
    if kind == "N":
        return str(val)
    if kind == "A":
        return "[" + ", ".join(_quote(x) for x in val) + "]"
    return _quote(val)


def _var_name(name: str) -> str:
    return name if name.startswith("$") else "$" + name


def _expr_str(ast) -> str:
    """Canonical expression render (translate.c exprToString): every
    binary op parenthesized, not/unary-minus bare."""
    kind = ast[0]
    if kind == "lit":
        v = ast[1]
        return str(v) if isinstance(v, int) else _quote(v)
    if kind == "var":
        return _var_name(ast[1])
    if kind == "array":
        return "[" + ", ".join(
            str(x) if isinstance(x, int) else _quote(x)
            for x in ast[1]) + "]"
    if kind == "neg":
        return "-" + _expr_str(ast[1])
    if kind == "not":
        return "not " + _expr_str(ast[1])
    if kind == "callfn":
        return ast[1] + "(" + ", ".join(
            _expr_str(a) for a in ast[2]) + ")"
    if kind == "cmp":
        return f"({_expr_str(ast[2])} {ast[1]} {_expr_str(ast[3])})"
    if kind in ("and", "or"):
        return f"({_expr_str(ast[1])} {kind} {_expr_str(ast[2])})"
    if kind == "concat":
        return f"({_expr_str(ast[1])} & {_expr_str(ast[2])})"
    if kind in ("+", "-", "*", "/", "%"):
        return f"({_expr_str(ast[1])} {kind} {_expr_str(ast[2])})"
    raise ValueError(f"translate: unsupported expression {kind!r}")


def _legacy_to_params(raw: str) -> list[Param] | None:
    """legacyActionToNvlst: '-/path' / '/path' → omfile,
    ':omusrmsg:users' → omusrmsg; anything else unsupported."""
    s = raw.lstrip(" \t")
    if s.startswith("/") or s.startswith("-/"):
        return [("type", ("S", "omfile")),
                ("file", ("S", s.lstrip("-")))]
    if s.startswith(":omusrmsg:"):
        return [("type", ("S", "omusrmsg")),
                ("users", ("S", s[len(":omusrmsg:"):]))]
    return None


def _act_params(stmt) -> list[Param] | None:
    if stmt[0] == "act":
        return stmt[1]
    if stmt[0] == "legacy_act":
        return _legacy_to_params(stmt[1])
    return None


def _legacy_script_warnings(stmts: list) -> list[str]:
    """Warnings for legacy actions that survive only as script text
    (ref: translate.c:1076 emitActionSingleline — one warning when
    legacyActionToNvlst can't structure the raw target, e.g.
    ``:omstdout:``). Walks nested filter/if bodies."""
    found = []

    def walk(seq):
        for s in seq:
            if s[0] == "legacy_act" and _legacy_to_params(s[1]) is None:
                found.append(
                    "legacy action syntax preserved as script text")
            for sub in s[2:]:
                if isinstance(sub, list):
                    walk(sub)

    walk(stmts)
    return found   # one warning PER occurrence (addWarning appends)


def _prifilt_expr(selector: str) -> str:
    if "'" not in selector:
        return f"prifilt('{selector}')"
    return "prifilt(" + _quote(selector) + ")"


def _stmts_to_script(stmts: list, indent: int = 1) -> str:
    """Canonical RainerScript statement render (stmtListToString)."""
    out: list[str] = []
    pad = "  " * indent

    def single(s) -> str:
        if s[0] == "act":
            return "action(" + " ".join(
                f"{k}={_value_str(v)}"
                for k, v in _sort_params(s[1])) + ")"
        if s[0] == "legacy_act":
            params = _legacy_to_params(s[1])
            if params is not None:
                return "action(" + " ".join(
                    f"{k}={_value_str(v)}" for k, v in
                    _sort_params(params)) + ")"
            return s[1]
        if s[0] == "stop":
            return "stop"
        if s[0] == "continue":
            return "continue"
        if s[0] == "call":
            return "call " + s[1]
        if s[0] == "callind":
            return "call_indirect " + _expr_str(s[1]) + ";"
        raise ValueError(f"not a single-line stmt {s[0]!r}")

    for s in stmts:
        k = s[0]
        if k in ("act", "legacy_act", "stop", "continue", "call",
                 "callind"):
            out.append(pad + single(s) + "\n")
        elif k == "set":
            kw = "reset" if s[3] else "set"
            out.append(f"{pad}{kw} {_var_name(s[1])} = "
                       f"{_expr_str(s[2])};\n")
        elif k == "unset":
            out.append(f"{pad}unset {_var_name(s[1])};\n")
        elif k == "if":
            out.append(f"{pad}if {_expr_str(s[1])} then {{\n")
            out.append(_stmts_to_script(s[2], indent + 1))
            if s[3] is not None:
                out.append(pad + "} else {\n")
                out.append(_stmts_to_script(s[3], indent + 1))
            out.append(pad + "}\n")
        elif k == "foreach":
            out.append(f"{pad}foreach ({_var_name(s[1])} in "
                       f"{_expr_str(s[2])}) do {{\n")
            out.append(_stmts_to_script(s[3], indent + 1))
            out.append(pad + "}\n")
        elif k in ("prifilt", "propfilt"):
            sel = s[1]
            then = s[2]
            els = s[3] if k == "prifilt" else None
            selector_ok = all(
                x[0] in ("act", "legacy_act", "stop", "call",
                         "callind", "continue") for x in then)
            if els is None and selector_ok:
                first = True
                for x in then:
                    prefix = (sel + " ") if first else "& "
                    out.append(pad + prefix + single(x) + "\n")
                    first = False
            else:
                out.append(f"{pad}if {_prifilt_expr(sel)} then {{\n")
                out.append(_stmts_to_script(then, indent + 1))
                if els is not None:
                    out.append(pad + "} else {\n")
                    out.append(_stmts_to_script(els, indent + 1))
                out.append(pad + "}\n")
        else:
            raise ValueError(f"translate: unsupported statement {k!r}")
    return "".join(out)


def to_rainerscript(cfg: TConfig) -> str:
    out: list[str] = []
    for w in cfg.warnings:
        out.append(f"# TRANSLATION WARNING: {w}\n")
    for kw in _RS_ORDER:
        if kw == "ruleset":
            items = cfg.rulesets
        else:
            items = cfg.sections.get(kw, [])
        for it in items:
            extra = (_legacy_script_warnings(
                _splice_amp(it.stmts or []))
                if kw == "ruleset" else [])
            for w in list(it.warnings) + extra:
                out.append(f"# TRANSLATION WARNING: {w}\n")
            params = " ".join(f"{k}={_value_str(v)}"
                              for k, v in _sort_params(it.params))
            if kw == "ruleset":
                body = _stmts_to_script(_splice_amp(it.stmts or []))
                out.append(f"ruleset({params}) {{\n{body}}}\n\n")
            elif kw == "template" and it.subobjs:
                out.append(f"template({params}) {{\n")
                for okind, oparams in it.subobjs:
                    op = " ".join(f"{k}={_value_str(v)}"
                                  for k, v in _sort_params(oparams))
                    out.append(f"  {okind}({op})\n")
                out.append("}\n\n")
            else:
                out.append(f"{kw}({params})\n\n")
    return "".join(out)


# -- YAML ---------------------------------------------------------------

def _yaml_entry(k: str, v: tuple, indent: int,
                list_prefix: bool) -> str:
    pad = "  " * indent
    prefix = "- " if list_prefix else ""
    return f"{pad}{prefix}{k}: {_value_str(v)}\n"


def _yaml_item(params: list[Param], indent: int) -> list[str]:
    """One '- k: v' list item: lowest-rank key leads, rest as the
    mapping below (writeYamlListSection/writeYamlActionList)."""
    params = _sort_params(params)
    if not params:
        return ["  " * indent + "-\n"]
    first, rest = params[0], params[1:]
    out = [_yaml_entry(first[0], first[1], indent, True)]
    for k, v in rest:
        out.append(_yaml_entry(k, v, indent + 1, False))
    return out


def _classify_ruleset(stmts: list):
    """captureYamlRulesetBody: actions-only → ('actions', acts);
    single filter over structured actions → ('filter', sel, acts);
    all-selector lists → ('statements', [(ifexpr, acts), ...]);
    else → ('script', stmts)."""
    stmts = _splice_amp(stmts)

    def acts_only(lst):
        out = []
        for s in lst:
            params = _act_params(s)
            if params is None:
                return None
            out.append(params)
        return out

    top = acts_only(stmts)
    if top is not None:
        return ("actions", top)
    if len(stmts) == 1 and stmts[0][0] in ("prifilt", "propfilt"):
        then_acts = acts_only(stmts[0][2])
        els = stmts[0][3] if stmts[0][0] == "prifilt" else None
        if then_acts is not None and els is None:
            return ("filter", stmts[0][1], then_acts)
    statements = []
    for s in stmts:
        if s[0] != "prifilt" or s[3] is not None:
            return ("script", stmts)
        then_acts = acts_only(s[2])
        if then_acts is None:
            return ("script", stmts)
        statements.append((_prifilt_expr(s[1]), then_acts))
    if statements:
        return ("statements", statements)
    return ("script", stmts)


def to_yaml(cfg: TConfig) -> str:
    out: list[str] = ["version: 2\n\n"]
    for w in cfg.warnings:
        out.append(f"# TRANSLATION WARNING: {w}\n")
    for kw, section in (("global", "global"),
                        ("main_queue", "mainqueue")):
        items = cfg.sections.get(kw, [])
        for it in items:
            for w in it.warnings:
                out.append(f"# TRANSLATION WARNING: {w}\n")
            out.append(f"{section}:\n")
            for k, v in _sort_params(it.params):
                out.append(_yaml_entry(k, v, 1, False))
            out.append("\n")

    def list_section(name: str, items: list[TItem],
                     ruleset: bool = False) -> None:
        if not items:
            return
        out.append(f"{name}:\n")
        for it in items:
            extra = (_legacy_script_warnings(
                _splice_amp(it.stmts or [])) if ruleset else [])
            for w in list(it.warnings) + extra:
                out.append(f"  # TRANSLATION WARNING: {w}\n")
            out.extend(_yaml_item(it.params, 1))
            if it.subobjs:
                out.append("    elements:\n")
                for okind, oparams in it.subobjs:
                    out.append(f"      - {okind}:\n")
                    for k, v in _sort_params(oparams):
                        out.append(_yaml_entry(k, v, 4, False))
            if not ruleset:
                continue
            kind = _classify_ruleset(it.stmts or [])
            if kind[0] == "actions":
                out.append("    actions:\n")
                for params in kind[1]:
                    out.extend(_yaml_item(params, 3))
            elif kind[0] == "filter":
                out.append(f"    filter: {_quote(kind[1])}\n")
                out.append("    actions:\n")
                for params in kind[2]:
                    out.extend(_yaml_item(params, 3))
            elif kind[0] == "statements":
                out.append("    statements:\n")
                for if_expr, acts in kind[1]:
                    out.append(f"      - if: {_quote(if_expr)}\n")
                    if len(acts) == 1:
                        out.append("        action:\n")
                        for k, v in _sort_params(acts[0]):
                            out.append(_yaml_entry(k, v, 5, False))
                    else:
                        out.append("        then:\n")
                        for params in acts:
                            out.extend(_yaml_item(params, 5))
            else:
                out.append("    script: |\n")
                body = _stmts_to_script(kind[1], 0)
                for ln in body.splitlines():
                    out.append("      " + ln + "\n")
        return

    sec_items = {kw: cfg.sections.get(kw, [])
                 for kw, _n in _SECTIONS}
    name_of = dict(_SECTIONS)
    for yname in _YAML_ORDER:
        if yname == "rulesets":
            list_section("rulesets", cfg.rulesets, ruleset=True)
            continue
        kw = next(k for k, n in _SECTIONS if n == yname)
        list_section(yname, sec_items[kw])
    return "".join(out)


# -- YAML frontend ------------------------------------------------------

def _pyval_to_tval(v) -> tuple:
    if isinstance(v, bool):
        return ("S", "on" if v else "off")
    if isinstance(v, int):
        return ("N", v)
    if isinstance(v, list):
        return ("A", [str(x) for x in v])
    return ("S", str(v))


def from_yaml(text: str) -> TConfig:
    import yaml

    doc = yaml.safe_load(text) or {}
    cfg = TConfig()
    for kw, section in _SECTIONS:
        data = doc.get(section)
        if data is None:
            continue
        if isinstance(data, dict):      # global / mainqueue
            cfg.add(kw, TItem(params=[(k, _pyval_to_tval(v))
                                      for k, v in data.items()]))
            continue
        for entry in data:
            it = TItem(params=[
                (k, _pyval_to_tval(v)) for k, v in entry.items()
                if k not in ("elements",)])
            for el in entry.get("elements", []) or []:
                for okind, op in el.items():
                    it.subobjs.append((okind, [
                        (k, _pyval_to_tval(v)) for k, v in op.items()]))
            cfg.add(kw, it)
    for rs in doc.get("rulesets", []) or []:
        it = TItem(params=[(k, _pyval_to_tval(v))
                           for k, v in rs.items()
                           if k not in ("actions", "filter",
                                        "statements", "script")])
        stmts: list = []
        if "script" in rs:
            stmts = _parse_script(rs["script"])
        elif "filter" in rs:
            acts = [("act", [(k, _pyval_to_tval(v))
                             for k, v in a.items()])
                    for a in rs.get("actions", [])]
            stmts = [("prifilt", rs["filter"], acts, None)]
        elif "statements" in rs:
            for st in rs["statements"]:
                acts_src = ([st["action"]] if "action" in st
                            else st.get("then", []))
                acts = [("act", [(k, _pyval_to_tval(v))
                                 for k, v in a.items()])
                        for a in acts_src]
                sel = _unwrap_prifilt(st.get("if", ""))
                stmts.append(("prifilt", sel, acts, None))
        else:
            stmts = [("act", [(k, _pyval_to_tval(v))
                              for k, v in a.items()])
                     for a in rs.get("actions", [])]
        it.stmts = stmts
        cfg.rulesets.append(it)
    return cfg


def _parse_script(text: str) -> list:
    tx = _TxParser(text)
    out = []
    while tx.p.peek().kind != "eof":
        got = tx.stmt()
        if got is not None:
            out.append(got)
    return out


def _unwrap_prifilt(expr: str) -> str:
    """'prifilt('mail.info')' → the selector text; other expressions
    keep the raw text (re-rendered as an if at rs emission)."""
    e = expr.strip()
    if e.startswith("prifilt('") and e.endswith("')"):
        return e[len("prifilt('"):-2]
    if e.startswith('prifilt("') and e.endswith('")'):
        return e[len('prifilt("'):-2]
    return e


# -- entry points -------------------------------------------------------

def parse_source(text: str) -> TConfig:
    """rsyslog.conf (RainerScript + legacy) or YAML (detected by the
    'version:' document key) → TConfig."""
    head = text.lstrip()
    if head.startswith("version:") or head.startswith("---"):
        return from_yaml(text)
    return _TxParser(text).parse()


def translate(text: str, fmt: str) -> str:
    cfg = parse_source(text)
    if fmt in ("yaml", "yml"):
        return to_yaml(cfg)
    if fmt in ("rainerscript", "rs", "conf"):
        return to_rainerscript(cfg)
    raise ValueError(f"unknown translation format {fmt!r}")


def full_config(text: str, base_dir: str = ".") -> str:
    """The ``rsyslogd -o <path>`` merged-config output (ref:
    grammar/lexer.l:569-573 fp_rs_full_conf_output): the config text
    with every include() / $IncludeConfig splice expanded inline,
    each included fragment prefixed by the lexer's
    '##### BEGIN CONFIG: <file> (put on stack)' marker. Glob
    includes expand one fragment per matching file (golden
    config_output-o-option.sh)."""
    import glob as _glob
    import os as _os
    import re as _re

    def expand_file(path: str) -> str:
        out = [f"\n##### BEGIN CONFIG: {path} (put on stack)\n"]
        with open(path, encoding="utf-8") as fh:
            out.append(expand(fh.read(),
                              _os.path.dirname(path) or "."))
        return "".join(out)

    def expand(src: str, bdir: str) -> str:
        def repl_obj(m):
            pat = m.group(1)
            if not _os.path.isabs(pat):
                pat = _os.path.join(bdir, pat)
            return "".join(expand_file(p)
                           for p in sorted(_glob.glob(pat)))
        src = _re.sub(
            r'include\(\s*file="([^"]+)"[^)]*\)', repl_obj, src)
        src = _re.sub(
            r'^\$IncludeConfig\s+(\S+)\s*$',
            lambda m: repl_obj(type("M", (), {
                "group": lambda self, _i: m.group(1)})()),
            src, flags=_re.MULTILINE)
        return src

    return expand(text, base_dir)

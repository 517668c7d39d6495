"""YAML configuration loader (ref: runtime/yamlconf.c).

The reference's YAML front-end does not reimplement config logic: it
converts each YAML block back into RainerScript object syntax and
feeds the result to the one true parser (yamlconf.c:1-30 — "drives
the same processing pipeline that the RainerScript lex/bison parser
uses"). We mirror that exactly: :func:`yaml_to_conf` renders the YAML
schema to rsyslog.conf text and :func:`load_yaml_config` hands it to
``load_config``.

Supported schema (ref: yamlconf.c:11-27):

    global:     { key: value, ... }          → legacy $-directives
    modules:    [ { load: name, ... }, ... ] → module(...)
    inputs:     [ { type: name, ... }, ... ] → input(...)
    templates:  [ { name:, type:, ... } ]    → template(...)
    rulesets:   [ { name:, script: "..." } ] → ruleset(name){script}
              | [ { name:, statements: [...] } ]  (structured form)
    lookup_table: [ { name:, file: } ]       → lookup_table(...)
    mainqueue:  { size:, discardmark:, discardseverity:, ... }
                                             → $MainMsgQueue* lines
    include:    [ { path:, optional: } ]     → include(file=...)

Structured ``statements`` entries (ref: yamlconf.c statements form):
``{if: EXPR, then: [...], else: [...]}``, ``{action: {params}}``,
``{set: {var:, value:}}``, ``{unset: var}``, ``{stop: true}``,
``{call: name}``, ``{foreach: {var:, in:, do: [...]}}`` — each
rendered to its RainerScript spelling.
"""

from __future__ import annotations

from typing import Any

try:
    import yaml as _yaml
except ImportError:  # pragma: no cover - baked into the test image
    _yaml = None


def _q(v: Any) -> str:
    """Render a param value as a double-quoted config string."""
    s = str(v)
    if isinstance(v, bool):
        s = "on" if v else "off"
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _params(d: dict, skip: tuple = ()) -> str:
    return " ".join(f"{k}={_q(v)}" for k, v in d.items() if k not in skip)


def _stmt(s: dict, indent: str) -> str:
    if not isinstance(s, dict) or len(s) < 1:
        raise ValueError(f"bad statement {s!r}")
    out: list[str] = []
    if "if" in s:
        out.append(f"{indent}if {s['if']} then {{")
        # the reference accepts a SIBLING action: next to if: as the
        # one-statement then-branch (yamlconf.c:1129 — the
        # yaml-statements-basic.sh shape)
        body = s.get("then")
        if body is None and "action" in s:
            body = [{"action": s["action"]}]
        for sub in body or []:
            out.append(_stmt(sub, indent + "    "))
        out.append(indent + "}")
        if s.get("else"):
            out.append(indent + "else {")
            for sub in s["else"]:
                out.append(_stmt(sub, indent + "    "))
            out.append(indent + "}")
    elif "action" in s:
        out.append(f"{indent}action({_params(s['action'])})")
    elif "set" in s:
        # yamlconf.c:1002 reads var/expr; value: tolerated as an alias
        var = s["set"]["var"]
        value = s["set"].get("expr", s["set"].get("value"))
        out.append(f"{indent}set {var} = {value};")
    elif "unset" in s:
        out.append(f"{indent}unset {s['unset']};")
    elif "stop" in s:
        out.append(indent + "stop")
    elif "call" in s:
        out.append(f"{indent}call {s['call']}")
    elif "foreach" in s:
        fe = s["foreach"]
        out.append(f"{indent}foreach ({fe['var']} in {fe['in']}) do {{")
        for sub in fe.get("do", []):
            out.append(_stmt(sub, indent + "    "))
        out.append(indent + "}")
    elif "type" in s:
        # a bare mapping with type: is an action object
        # (yamlconf.c:1318 has_type — '- type: mmjsonparse' form)
        out.append(f"{indent}action({_params(s)})")
    else:
        raise ValueError(f"unknown statement key in {s!r}")
    return "\n".join(out)


def yaml_to_conf(src: str) -> str:
    """Render a YAML config document to rsyslog.conf text."""
    if _yaml is None:
        raise ImportError("pyyaml is required for YAML configs")
    doc = _yaml.safe_load(src) or {}
    parts: list[str] = []
    for k, v in (doc.get("global") or {}).items():
        parts.append(f"${k} {v}")
    mq = doc.get("mainqueue") or {}
    for k, v in mq.items():
        parts.append(f"$MainMsgQueue{k.capitalize()} {v}")
    for m in doc.get("modules") or []:
        parts.append(f"module({_params(m)})")
    for t in doc.get("templates") or []:
        head = _params(t, skip=("elements",))
        if t.get("elements"):
            # list template (ref: yamlconf.c parse_template_sequence
            # "elements:" → property/constant block)
            body = []
            for el in t["elements"]:
                (kind, ps), = el.items()
                body.append(f"    {kind}({_params(ps)})")
            parts.append(f"template({head}) {{\n" +
                         "\n".join(body) + "\n}")
        else:
            parts.append(f"template({head})")
    for lt in doc.get("lookup_table") or []:
        parts.append(f"lookup_table({_params(lt)})")
    for inc in doc.get("include") or []:
        p = {"file": inc["path"]} if "path" in inc else dict(inc)
        if inc.get("optional"):
            p["mode"] = "optional"
            p.pop("optional", None)
        parts.append(f"include({_params(p)})")
    for i in doc.get("inputs") or []:
        parts.append(f"input({_params(i)})")
    for rs in doc.get("rulesets") or []:
        head = _params(rs, skip=("script", "statements"))
        parts.append(f"ruleset({head}) {{")
        if "script" in rs:
            parts.append(rs["script"])
        for s in rs.get("statements") or []:
            parts.append(_stmt(s, "    "))
        parts.append("}")
    return "\n".join(parts) + "\n"


def load_yaml_config(src: str, tables: dict | None = None):
    """YAML text → (engine, ParsedConfig), via the RainerScript
    parser (the reference's cnfAddConfigBuffer path)."""
    from rsyslog_spark.config.rainerscript import load_config

    return load_config(yaml_to_conf(src), tables=tables)

"""Byte-exact goldens for the fmunflatten family (reference:
tests/rscript_unflatten_{object,object_exclamation,non_object,
arg1_unsuitable,arg2_invalid,conflict1,conflict2,conflict3,
key_truncated}.sh; semantics contrib/fmunflatten/fmunflatten.c).
Every EXPECTED string is copied verbatim from the reference script.

Also the first exercise of script_error() as a live errno read (ref:
runtime/wti.c wtiSetScriptErrno) — unflatten/parse_json record a
row-level errno expression the next script_error() call returns."""

from __future__ import annotations

import os

from rsyslog_spark.config.runtime import run_config_batch

MSG = "<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:00000000:\n"

# reference parser default keeps the MSG leading space
# (pmrfc3164.c:121 bRemoveMsgFirstSpace=0) — the EXPECTED lines
# depend on it ('%msg%' renders " msgnum:...")
TPL = ('global(parser.removeMsgFirstSpace="off")\n'
       'template(name="outfmt" type="string" '
       'string="%msg% %$.ret% %$.unflatten%\\n")')


def _run(spark, tmp_path, body: str, sub: str = "o") -> str:
    src = tmp_path / f"in_{sub}.log"
    src.write_text(MSG)
    conf = (TPL + f'\nruleset(name="m_{sub}") {{\n' + body
            + f'\n  action(type="omfile" file="{tmp_path}/out_{sub}" '
            'template="outfmt")\n}\n'
            + f'input(type="imfile" file="{src}" ruleset="m_{sub}")\n')
    run_config_batch(spark, conf)
    d = tmp_path / f"out_{sub}"
    return "".join(
        open(d / p).read()
        for p in sorted(os.listdir(d)) if p.startswith("part"))


def test_unflatten_object(spark, tmp_path):
    """rscript_unflatten_object.sh: flat dotted keys become a nested
    tree, json-c spaced render, script_error 0."""
    out = _run(spark, tmp_path, '''
  set $!source.ip = "1.2.3.4";
  set $!source.bytes = 3258;
  set $!source.geo.country_iso_code = "FR";
  set $!destination.ip = "4.3.2.1";
  set $.unflatten = unflatten($!, ".");
  set $.ret = script_error();
''')
    assert out == (' msgnum:00000000: 0 { "source": { "ip": "1.2.3.4",'
                   ' "bytes": 3258, "geo": { "country_iso_code": "FR" }'
                   ' }, "destination": { "ip": "4.3.2.1" } }\n')


def test_unflatten_object_exclamation(spark, tmp_path):
    """rscript_unflatten_object_exclamation.sh: parse_json into $!
    (statement splice: container store + errcode), then unflatten on
    '!' separators."""
    out = _run(spark, tmp_path, '''
  set $.ret = parse_json("{\\"source!ip\\":\\"1.2.3.4\\",\\"source!port\\":53}", "\\$!");
  set $.unflatten = unflatten($!, "!");
  set $.ret = script_error();
''', sub="x")
    assert out == (' msgnum:00000000: 0 '
                   '{ "source": { "ip": "1.2.3.4", "port": 53 } }\n')


def test_unflatten_non_object(spark, tmp_path):
    """rscript_unflatten_non_object.sh: a non-object $! (json string /
    number) deep-copies through unchanged with errno 0 (the reference
    drives both shapes via a $/ counter over two messages; same
    semantics, one message per shape here)."""
    out = _run(spark, tmp_path, '''
  set $! = "string";
  set $.unflatten = unflatten($!, ".");
  set $.ret = script_error();
''', sub="s")
    assert out == ' msgnum:00000000: 0 string\n'
    out = _run(spark, tmp_path, '''
  set $! = 42;
  set $.unflatten = unflatten($!, ".");
  set $.ret = script_error();
''', sub="n")
    assert out == ' msgnum:00000000: 0 42\n'


def test_unflatten_arg1_unsuitable(spark, tmp_path):
    """rscript_unflatten_arg1_unsuitable.sh: $! never touched →
    number 0 returned, script_error()=1."""
    out = _run(spark, tmp_path, '''
  set $.unflatten = unflatten($!, ".");
  set $.ret = script_error();
''', sub="u")
    assert out == ' msgnum:00000000: 1 0\n'


def test_unflatten_arg2_invalid(spark, tmp_path):
    """rscript_unflatten_arg2_invalid.sh: delimiter must be a single
    char → number 0, script_error()=1, src untouched."""
    out = _run(spark, tmp_path, '''
  set $!a.b.c = "foobar";
  set $.unflatten = unflatten($!, "too many chars");
  set $.ret = script_error();
''', sub="i")
    assert out == ' msgnum:00000000: 1 0\n'


def test_unflatten_conflict1(spark, tmp_path):
    """rscript_unflatten_conflict1.sh: an existing string at an
    INTERMEDIATE node is overridden by an object (del + re-add)."""
    out = _run(spark, tmp_path, '''
  set $!a!b = "foo";
  set $!a.b.c = "bar";
  set $.unflatten = unflatten($!, ".");
  set $.ret = script_error();
''', sub="c1")
    assert out == ' msgnum:00000000: 0 { "a": { "b": { "c": "bar" } } }\n'


def test_unflatten_conflict2(spark, tmp_path):
    """rscript_unflatten_conflict2.sh: a FINAL node holding a string
    is overridden by an object value (here read from the $. local
    tree — 'set $!a.b = $.x' deep-copies the subtree node)."""
    out = _run(spark, tmp_path, '''
  set $.x!a = 21;
  set $!a!b = "foo";
  set $!a.b = $.x;
  set $.unflatten = unflatten($!, ".");
  set $.ret = script_error();
''', sub="c2")
    assert out == ' msgnum:00000000: 0 { "a": { "b": { "a": 21 } } }\n'


def test_unflatten_conflict3(spark, tmp_path):
    """rscript_unflatten_conflict3.sh: FINAL-node scalar override —
    last writer wins, key re-added in place of the old one."""
    out = _run(spark, tmp_path, '''
  set $!a!b = "foo";
  set $!a.b = "bar";
  set $.unflatten = unflatten($!, ".");
  set $.ret = script_error();
''', sub="c3")
    assert out == ' msgnum:00000000: 0 { "a": { "b": "bar" } }\n'


def test_unflatten_key_truncated(spark, tmp_path):
    """rscript_unflatten_key_truncated.sh: a path segment longer than
    255 chars truncates to the 255-char prefix (FMUNFLATTEN_KBUFLEN
    256 incl. NUL)."""
    big = "b" * 252 + "255ccccc"       # 260 chars, truncates to ...255
    kept = big[:255]
    assert kept.endswith("255")
    out = _run(spark, tmp_path, f'''
  set $!a.{big}.d = "bar";
  set $.unflatten = unflatten($!, ".");
  set $.ret = script_error();
''', sub="t")
    assert out == (' msgnum:00000000: 0 { "a": { "' + kept
                   + '": { "d": "bar" } } }\n')

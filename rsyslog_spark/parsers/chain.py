"""Parser chain: first parser that accepts wins.

ref: runtime/parser.c:615-660 (SelectParser loop) with the default
chain rfc5424 → rfc3164 (runtime/parser.c:150-156). rfc3164 is
permissive and accepts anything, so parsesuccess is always true for
the default chain — matching the reference, whose pmrfc3164 never
rejects.

Physical shape — LAYERED projections (measured on 20M cached lines,
local[32]: 38s → ~4s full parse):

Codegen's subexpression elimination refuses to hoist subtrees that
sit inside CASE WHEN branches, so a single projection of per-field
``when(accepts, f5424).otherwise(f3164)`` re-evaluates the shared
strip/split/regex work once PER FIELD (~20x). Instead, the shared
intermediates are materialized as real columns across a few stacked
SELECTs, each layer's expressions unconditional (computed once per
row), and the final layer emits the canonical fields as small CASEs
over plain column references. CollapseProject keeps the layers
separate because each alias is non-cheap and referenced many times.

The final layer is also a PUSHDOWN BARRIER (r5, measured): pushing a
parsed-field predicate through the layers substitutes the full parse
trees into the predicate with a copy per column reference — 2.7 MB
of generated code for the flagship, a janino method-size compile
failure (interpreted fallback), and ~+0.7s per execution from
per-run source generation. Since no derived-field predicate can
reach the parquet scan anyway (the scan reads `line`), every
canonical column carries a nondeterministic-identity wrapper
(when(monotonically_increasing_id() >= 0, col)), which stops
PushPredicateThroughNonJoin at the final projection: predicates
evaluate over materialized columns, generated code shrank 20x
(133 KB) and the flagship runs ~2x faster than even the pre-r5
plan. Column pruning still drops unused fields.

A Generate barrier (explode(array(struct))) is NOT used: GenerateExec
evaluates its generator interpreted (no codegen), ~7x slower, and a
Filter between the downstream Project and the Generate defeats
nested-column pruning.

The standalone field builders in rfc5424.py / rfc3164.py remain the
single-message reference implementations (used by pmnull-style entry
points and tests); this module is the fused two-parser hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.parsers.pri import DEFAULT_PRI, INVLD_PRI
from rsyslog_spark.parsers.rfc3164 import (
    TS3164_FAST_RE, TS3164_RE, TS3339_RE, _ts3164_to_timestamp)
from rsyslog_spark.parsers.rfc5424 import _SD_MSG_RE
from rsyslog_spark.schema import SYSLOG_COLUMNS
from rsyslog_spark.session import now_col as _now_col
from rsyslog_spark.session import register_session_cache as _reg_cache


# plan-build memo: Columns are immutable unresolved trees, safe to
# share across DataFrames; rebuilding costs ~1500 Py4J round-trips
_CHAIN_CACHE: dict[tuple, list[list[Column]]] = _reg_cache({})


def _nil(c: Column) -> Column:
    return F.when(c == "-", F.lit(None).cast("string")).otherwise(c)


def _build_layers(line_col: str, inputname: str, keep_raw: bool,
                  with_uuid: bool, want: list[str],
                  parsers: tuple = ("pmrfc5424", "pmrfc3164"),
                  permit_slashes_in_programname: bool = False,
                  remove_msg_first_space: bool = True,
                  force_tag_colon: bool = False,
                  headerless: tuple | None = None,
                  permit_at_hostname: bool = False,
                  permit_slashes_hostname: bool = False,
                  permit_brackets_hostname: bool = False,
                  ) -> list[list[Column]]:
    line = F.col(line_col)
    tgen = _now_col()
    null_s = F.lit(None).cast("string")
    has_5424 = "pmrfc5424" in parsers
    has_3164 = "pmrfc3164" in parsers

    # layer A — ONE regex over the raw line. The PRI digits drive
    # everything else arithmetically: __rest via substr (not a second
    # regexp_replace), the RFC5424 accept via a 2-char compare of
    # __rest (not an rlike) — the pre-r6 shape ran three regexes over
    # the raw line for the same three columns (relay A/B in SCALE.md).
    layer_a = [
        line.alias("__line"),
        F.regexp_extract(line, r"^<(\d{1,3})>", 1).alias("__pris"),
    ]

    pris = F.col("__pris")
    lcol = F.col("__line")
    prin = pris.try_cast("int")
    # a VALID PRI (0..191) strips; an out-of-range/malformed bracket
    # stays in place — the header parse sees the raw line (ref:
    # parserParsePRI sets AfterPRIOffs = 0 on compute_off failure,
    # parser.c:588-598)
    pri_ok = prin.isNotNull() & (prin <= 191)
    layer_a2 = [
        prin.alias("__pri"),
        F.rtrim(F.when(pri_ok,
                       F.substr(lcol, F.length(pris) + 3,
                                F.lit(1 << 30)))
                .otherwise(lcol),
                F.lit("\n\r\x00")).alias("__rest"),
    ]

    # RFC5424 accept = VALID PRI + version "1 " right after it (ref
    # pmrfc5424 checks version '1' at AfterPRIOffs — an invalid-PRI
    # line parses from offset 0 and fails the version check)
    rest = F.col("__rest")
    layer_a3 = [
        ((F.coalesce(pri_ok, F.lit(False))
          & (F.substring(rest, 1, 2) == "1 "))
         if has_5424 else F.lit(False)).alias("__acc"),
    ]

    # HOSTNAME charset like the reference (pmrfc3164.c:402-447):
    # alnum . _ - chars (options add '@', '/', and a '[...]' bracket
    # form), last char alnum. Validation is FUSED into the single
    # header regex below — an invalid token simply fails the optional
    # hostname group and stays in place for the TAG scan (the
    # reference's rewind), hostname falls back to the receiver stamp
    # (goldens pmrfc3164-AtSignsInHostname{,_off}.sh).
    hn_chars = r"A-Za-z0-9._\-"
    if permit_at_hostname:
        hn_chars += "@"
    if permit_slashes_hostname:
        hn_chars += "/"
    hn_core = rf"[{hn_chars}]*[A-Za-z0-9]"
    hn_re = (rf"(?:\[[{hn_chars}]+\]|{hn_core})"
             if permit_brackets_hostname else hn_core)

    # layer B — ONE regex pass for the whole RFC3164 header (the
    # reference scans the header exactly once, pmrfc3164.c:402-494;
    # the pre-r6 shape ran _REST_RE three times + an rlike = 4 regex
    # executions). Spark's regexp_extract yields one group per regex
    # execution, so the multi-group extract is expressed as
    # regexp_replace into NUL-delimited groups + one plain split:
    #   ^(TS) (?=\S+ )(?:(HN) )?([^: ]*)(.*)$  →  $1␀$2␀$3␀$4
    # groups: 1=timestamp, 2=valid hostname (empty when the token
    # fails validation — it then stays inside groups 3/4, which IS
    # the rewind-into-TAG-scan semantics), 3=TAG token (up to ':' or
    # SP, pmrfc3164.c:470-498), 4=rest after the token. The lookahead
    # preserves the legacy requirement of a SP-terminated token after
    # the timestamp (header without it → no timestamp at all).
    # "matched" is detected as output != input (the replacement maps
    # two header spaces to NULs, so a match always differs).
    # Interior NUL bytes in the message would shift the split — the
    # reference never sees them either (SanitizeMsg escapes control
    # chars to #000 before parsing, runtime/parser.c), and our text
    # sources are line-framed.
    acc_b = F.col("__acc")
    m3_gate = (~acc_b) & F.lit(has_3164)
    # ' ?' before TS3164 only: the HP-Procurve accommodation — ONE
    # leading space is skipped before retrying the 3164 parse, never
    # the 3339 one (pmrfc3164.c:346-360; golden
    # parsertest-parse-3164-buggyday.sh sends "<38> Mar  7 ...")
    # TS terminator is ' ' OR end-of-line (datetime.c:121-126 — a
    # bare timestamp is a valid header; hostname then falls back to
    # the receiver stamp). The hostname group accepts a token
    # terminated by ' ' (eaten) or line end (pmrfc3164.c:422-455 —
    # "empty immediately after the hostname ... is valid"). The TS
    # itself is OPTIONAL: hostname+TAG parse runs even without one
    # (pmrfc3164.c:383 bParseHOSTNAMEandTAG is unconditional; golden
    # parsertest-parse-nodate.sh 'This is a message!' → hostname
    # 'This', tag 'is').
    hdr_tail = rf"(?:({hn_re})(?: |$))?([^: ]*)(.*)$"
    hdr_fast = (rf"^((?: ?{TS3164_FAST_RE}|{TS3339_RE})(?: |$))?"
                + hdr_tail)
    hdr_full = (rf"^((?: ?{TS3164_RE}|{TS3339_RE})(?: |$))?"
                + hdr_tail)
    layer_b = [
        F.when(acc_b, F.split(rest, " ", 7)).alias("__p5"),
        F.when(m3_gate,
               F.regexp_replace(rest, hdr_fast,
                                "$1\x00$2\x00$3\x00$4")).alias("__m3r"),
    ]

    # layer C — decode the fused header: split on NUL (plain scan,
    # not a regex engine pass in practice), matched ⇔ changed
    m3r = F.col("__m3r")
    layer_c = [
        F.when(acc_b, F.coalesce(
            F.try_element_at(F.col("__p5"), F.lit(7)), F.lit("-")))
        .alias("__tail"),
        F.split(m3r, "\x00", 4).alias("__m3a"),
    ]

    # layer C2 — full-grammar RETRY: when the fast pattern saw no
    # timestamp, re-scan with the complete ParseTIMESTAMP3164 grammar
    # (year/case/frac/colon variants). Lazy per row — canonical
    # headers pay exactly ONE regex pass, variants and headerless
    # lines two. __m3a is rebound to the retried groups.
    m3a0 = F.col("__m3a")
    layer_c2 = [
        F.when(m3_gate & (F.element_at(m3a0, 1) == ""),
               F.split(F.regexp_replace(rest, hdr_full,
                                        "$1\x00$2\x00$3\x00$4"),
                       "\x00", 4))
        .otherwise(m3a0).alias("__m3b"),
    ]
    m3a = F.col("__m3b")
    # layer C3 — TS presence = non-empty group 1 (the optional-TS
    # pattern matches every line, so changed-detection no longer
    # works); own layer so the split isn't re-evaluated
    layer_c3 = [
        F.coalesce(m3_gate & (F.element_at(m3a, 1) != ""),
                   F.lit(False)).alias("__hts"),
    ]

    has_ts = F.col("__hts")

    # layer D — per-parser extracts (null inputs short-circuit the
    # regex calls to null on the other parser's rows). The TAG token
    # comes from the fused header groups for timestamped rows; only
    # the no-timestamp fallback still runs the tiny anchored scan.
    # completely-headerless heuristic (pmrfc3164.c:315-326, ALWAYS
    # on): after the PRI, optional whitespace then '{' or '[' means
    # no header at all. First-char dispatch keeps the common case
    # regex-free; materialized as a LAYER column so the predicate is
    # one column ref in every consumer instead of an inlined tree
    # (codegen-size regression measured otherwise).
    c1 = F.substring(rest, 1, 1)
    brace_expr = c1.isin("{", "[") | (
        c1.isin(" ", "\t") & rest.rlike(r"^[ \t]*[\{\[]"))
    hl_expr = brace_expr
    if headerless is not None:
        # headerless OPTION (detect.headerless, pmrfc3164.c:362-369):
        # no timestamp → headerless too
        hl_expr = hl_expr | ~has_ts
    layer_d = [
        F.regexp_extract(F.col("__tail"), _SD_MSG_RE, 1).alias("__sd"),
        F.regexp_extract(F.col("__tail"), _SD_MSG_RE, 2).alias("__msg5"),
        F.when(m3_gate, F.element_at(m3a, 3)).alias("__tok"),
        # one boolean column when the option is off (__hl == brace)
        *([F.when(m3_gate, brace_expr).otherwise(F.lit(False))
           .alias("__brhl")] if headerless is not None else []),
        F.when(m3_gate, hl_expr).otherwise(F.lit(False))
        .alias("__hl"),
    ]

    # layer D2 — everything after the TAG token (fused group 4 for
    # timestamped rows; substr for the no-timestamp fallback)
    layer_d2 = [
        F.when(m3_gate, F.element_at(m3a, 4)).alias("__aft"),
    ]

    # final layer — canonical fields over plain column refs
    acc = F.col("__acc")

    def p5(i: int) -> Column:
        return _nil(F.element_at(F.col("__p5"), i))

    # over-long fractions (7-9 digits) truncate to micros before the
    # parse — the reference accepts any precision and
    # getNormalizedSecFracPower divides down to 6 for rendering
    # (golden timestamp-3339.sh '…41.000006930Z' → '…41.000006Z')
    ts5_txt = F.regexp_replace(
        F.coalesce(p5(2), F.lit("")),
        r"(\.\d{6})\d+", "$1")
    ts5424 = F.coalesce(
        F.try_to_timestamp(ts5_txt,
                           F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        F.try_to_timestamp(ts5_txt,
                           F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(ts5_txt, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )
    # protocol-1 TAG emulation: "app[procid]" / bare "app" on NIL
    # PROCID — no trailing colon (ref: runtime/msg.c
    # tryEmulateTAG:2337-2345; golden contains-longer-needle.sh)
    syslogtag5 = F.concat(
        F.coalesce(p5(4), F.lit("-")),
        F.when(p5(5).isNotNull(),
               F.concat(F.lit("["), p5(5), F.lit("]"))).otherwise(F.lit("")),
    )
    tok = F.col("__tok")
    after3 = F.col("__aft")
    colon_term = after3.startswith(":")
    brace_hdrless = (F.col("__brhl") if headerless is not None
                     else F.col("__hl"))
    opt_hdrless = F.col("__hl")

    def _strip1sp(c: Column) -> Column:
        # drop ONE leading space (regexp_replace(c, "^ ", "") shape,
        # expressed as substr — no regex engine on the hot path)
        return F.when(c.startswith(" "),
                      F.substr(c, F.lit(2), F.lit(1 << 30))) \
            .otherwise(c)

    # an empty TAG is valid and renders empty (pmrfc3164.c:497-499
    # "no TAG can only be detected if the message immediately ends,
    # in which case an empty TAG is considered OK"; golden
    # parsertest-parse1.sh '<14>Aug 30 23:00:05 X4711 ' → ',,,')
    syslogtag3 = F.when(colon_term, F.concat(tok, F.lit(":"))) \
        .otherwise(F.lit("-") if force_tag_colon else tok)
    # MSG leading-space policy (pmrfc3164.c:510 bRemoveMsgFirstSpace;
    # reference default = 0, keep the space — our ENGINE default
    # strips it, see parsers/rfc3164.py module note / COVERAGE row):
    # when stripping, one optional whitespace char after ':' and the
    # single SP terminator itself are removed; when keeping, MSG
    # starts right after the ':' (space included) and a SP-terminated
    # tag's space stays content
    if remove_msg_first_space:
        # ":\s?" strip without a regex: drop the ':' plus one
        # following whitespace char (Java \s set) if present
        c2 = F.substring(after3, 2, 1)
        colon_msg = F.when(
            c2.isin(" ", "\t", "\n", "\x0b", "\f", "\r"),
            F.substr(after3, F.lit(3), F.lit(1 << 30))) \
            .otherwise(F.substr(after3, F.lit(2), F.lit(1 << 30)))
        msg3 = F.when(colon_term, colon_msg).otherwise(_strip1sp(after3))
    else:
        msg3 = F.when(colon_term, F.substr(after3, F.lit(2),
                                           F.lit(1 << 30))) \
            .otherwise(after3)
    if force_tag_colon:
        # force.tagEndingByColon (pmrfc3164.c:480-494): a token not
        # ended by ':' is NOT a tag — rewind it (incl. its leading
        # space) into MSG, TAG becomes '-'
        tagmsg = F.concat(tok, after3)
        # the rewind re-includes the SP the TS/hostname parse ate
        # when one directly precedes the token (pmrfc3164.c:487
        # pTagStart[-1] == ' '; golden pmrfc3164-defaultTag.sh
        # 'Hostname1  msgnum:1' → msg '  msgnum:1')
        ate_sp = has_ts | (F.element_at(m3a, 2) != "")
        nocolon_msg = F.when(ate_sp, F.concat(F.lit(" "), tagmsg)) \
            .otherwise(tagmsg)
        if remove_msg_first_space:
            nocolon_msg = _strip1sp(nocolon_msg)
        msg3 = F.when(colon_term, msg3).otherwise(nocolon_msg)
    # headerless overlays: MSG is the whole after-PRI rest
    hdrless_msg = (_strip1sp(rest)
                   if remove_msg_first_space else rest)
    msg3 = F.when(opt_hdrless, hdrless_msg).otherwise(msg3)
    hl_tag = (headerless[1] if headerless and headerless[1]
              else "headerless")
    tag3_hdr = (F.when(brace_hdrless, F.lit("-"))
                .otherwise(F.lit(hl_tag))
                if headerless is not None else F.lit("-"))
    syslogtag3 = F.when(opt_hdrless, tag3_hdr).otherwise(syslogtag3)
    # programname terminators (msg.c acquireProgramName): ':', '[',
    # any non-printable char (isprint — a raw TAB in a no-timestamp
    # Snare tag ends the name, parsertest-snare_ccoff_udp.sh), and
    # '/' unless global(parser.permitSlashesInProgramname="on")
    prog_re = (r"^([^:\[\x00-\x1F\x7F]*)"
               if permit_slashes_in_programname
               else r"^([^:\[/\x00-\x1F\x7F]*)")
    prog3 = F.regexp_extract(tok, prog_re, 1)
    if force_tag_colon:
        prog3 = F.when(colon_term, prog3).otherwise(F.lit("-"))
    prog3 = F.when(opt_hdrless,
                   F.regexp_extract(tag3_hdr, prog_re, 1)) \
        .otherwise(prog3)
    procid3 = F.when(~opt_hdrless,
                     F.regexp_extract(tok, r"\[(\d+)\]$", 1))
    # chain-exhausted fallback (ref: runtime/parser.c:615-660 — if no
    # parser accepts, message passes raw with bParseSuccess=0; pmnull
    # accepts everything and leaves MSG as the PRI-stripped line)
    has_null = "pmnull" in parsers
    if not has_3164:
        msg3 = F.col("__rest") if has_null else F.col("__line")
    msg5 = F.regexp_replace(F.col("__msg5"), "^﻿", "")

    # invalid-PRI policy (parserParsePRI, parser.c:575-608): a line
    # STARTING with '<' whose PRI fails the parse gets LOG_PRI_INVLD
    # (facility 24 "invld", severity 7); no bracket at all → DEFUPRI
    pri_valid = F.col("__pri").isNotNull() & (F.col("__pri") <= 191)
    pri = F.when(pri_valid, F.col("__pri")) \
        .when(F.col("__line").startswith("<"), F.lit(INVLD_PRI)) \
        .otherwise(F.lit(DEFAULT_PRI))

    def ab(a: Column, b: Column) -> Column:
        return F.when(acc, a).otherwise(b)

    # layer E — MSG materialized as a column. msg is the one field
    # hot-path FILTERS reference (contains/regex routing); if it were
    # built in the final projection, predicate pushdown would inline
    # the whole CASE into the Filter node and the surviving rows
    # would compute it AGAIN in the projection (measured: the
    # flagship's contains-filter stage re-derived the chain). As a
    # layer column both the pushed predicate and the canonical field
    # reference __msgv, which the multi-reference check keeps
    # CollapseProject from re-inlining.
    layer_e = [ab(msg5, msg3).alias("__msgv")]

    # fused group 2 is empty when the hostname token failed
    # validation (it stayed in the TAG scan) — nullif covers both
    host3 = F.when(m3_gate, F.nullif(F.element_at(m3a, 2), F.lit("")))
    if headerless is not None and headerless[0]:
        # headerless.hostname substitutes for headerless rows
        # (handleHeaderlessMessage; default falls back to the
        # receiver stamp like getRcvFrom)
        host3 = F.when(opt_hdrless & ~brace_hdrless,
                       F.lit(headerless[0])).otherwise(host3)
    hostname = ab(p5(3), host3)
    # RFC3339 in the 3164 slot parses directly (pmrfc3164 tries
    # ParseTIMESTAMP3339 first) — dispatched by first char (digit ⇔
    # 3339 per the header regex alternation) so each row attempts
    # exactly ONE timestamp parse, not a failed-ISO-then-3164 pair
    # ltrim: the HP-Procurve single leading space (hdr_re ' ?') is
    # part of group 1 but not of the timestamp text
    ts_txt = F.trim(F.element_at(m3a, 1))
    # ISO-in-3164-slot ⇔ 'yyyy-' prefix (a digit first char with a
    # SPACE at offset 5 is the Brocade leading-year 3164 form) — two
    # char compares, no regex on the hot path
    ts3_iso = F.substring(ts_txt, 1, 1).between("0", "9") \
        & (F.substring(ts_txt, 5, 1) == "-")
    timereported = ab(ts5424,
                      F.when(has_ts,
                             F.when(ts3_iso,
                                    F.try_to_timestamp(ts_txt))
                             .otherwise(_ts3164_to_timestamp(
                                 ts_txt))))

    def _off_secs(txt: Column) -> Column:
        # wire UTC offset → seconds ('Z' → 0; NO suffix → NULL: the
        # reference fills zone-less timestamps with the daemon's
        # LOCAL zone — datetime.c ParseTIMESTAMP3164 inherits the
        # reception offset — and the template layer renders NULL as
        # session-local); evaluated only on rows with an
        # RFC3339-shaped timestamp
        o = F.regexp_extract(txt, r"(Z|[+-]\d{2}:?\d{2})$", 1)
        sec = (F.substring(o, 2, 2).try_cast("int") * 3600
               + F.substring(o, -2, 2).try_cast("int") * 60)
        return F.when(o == "", F.lit(None).cast("int")) \
            .when(o == "Z", F.lit(0)) \
            .otherwise(F.when(o.startswith("-"), -sec).otherwise(sec))

    null_i = F.lit(None).cast("int")
    tz_offset = ab(
        _off_secs(F.coalesce(p5(2), F.lit(""))),
        F.when(has_ts & ts3_iso, _off_secs(ts_txt))
        .otherwise(null_i)).cast("int")

    def canonical(name: str) -> Column:
        if name == "headerless":
            # marker for headerless.ruleset routing / headerless.drop
            return (~acc) & F.coalesce(opt_hdrless, F.lit(False))
        if name == "rawmsg":
            return F.col("__line") if keep_raw else null_s
        if name == "msg":
            return F.col("__msgv")
        if name == "pri":
            return pri
        if name == "syslogfacility":
            return F.shiftright(pri, 3)
        if name == "syslogseverity":
            return pri.bitwiseAND(F.lit(7))
        if name in ("hostname", "fromhost"):
            return hostname
        if name == "fromhost_ip":
            return null_s
        if name == "fromhost_port":
            return F.lit(None).cast("int")
        if name == "syslogtag":
            return ab(syslogtag5, syslogtag3)
        if name == "programname":
            # programname derives from the TAG for BOTH parsers
            # (msg.c acquireProgramName runs on the final TAG) — the
            # 5424 app-name gets the same terminator cuts; a NIL
            # app-name means TAG "-" so programname is "-" too
            # (transformations golden shape_programname=-)
            prog5 = F.regexp_extract(
                F.coalesce(p5(4), F.lit("-")), prog_re, 1)
            return ab(prog5, prog3)
        if name == "app_name":
            # protocol 0 emulates app-name from programname
            # (msg.c prepareAPPNAME:2518-2528). Column stays NULL for
            # NIL like the other header fields; the property LAYER
            # renders NIL/empty as "-" (templates.prop_col — golden
            # empty-app-name.sh)
            return ab(p5(4), F.nullif(prog3, F.lit("")))
        if name == "procid":
            return ab(p5(5), F.when(procid3 != "", procid3))
        if name == "msgid":
            return ab(p5(6), null_s)
        if name == "inputname":
            return F.lit(inputname)
        if name == "timereported":
            return F.coalesce(timereported.cast("timestamp"), tgen)
        if name == "timegenerated":
            return tgen
        if name == "tz_offset_sec":
            return tz_offset
        if name in ("tz_zulu", "secfrac_prec"):
            # wire-timestamp metadata (syslogTime OffsetMode /
            # secfracPrecision): 'Z' re-renders as 'Z' (datetime.c
            # formatTimestamp3339:945) and the fraction renders at
            # its PARSED digit count (getNormalizedSecFracPower,
            # capped at 6). NULL = no wire timestamp (reception-time
            # fallback rows keep engine-default rendering).
            wire_ts = ab(
                F.coalesce(F.nullif(p5(2), F.lit("-")), F.lit("")),
                F.when(has_ts, ts_txt).otherwise(F.lit("")))
            if name == "tz_zulu":
                return F.when(wire_ts == "",
                              F.lit(None).cast("boolean")) \
                    .otherwise(wire_ts.endswith("Z"))
            return F.when(wire_ts == "", F.lit(None).cast("int")) \
                .otherwise(F.length(
                    F.regexp_extract(wire_ts, r"\.(\d+)", 1)))
        if name == "protocol_version":
            return F.when(acc, F.lit(1)).otherwise(F.lit(0))
        if name == "structured_data":
            return ab(_nil(F.col("__sd")), null_s)
        if name == "json":
            return null_s
        if name == "uuid":
            return F.expr("uuid()") if with_uuid else null_s
        if name == "parsesuccess":
            # bParseSuccess starts 0 and NO header parser sets it —
            # only mm modules call MsgSetParseSuccess (msg.c:685,
            # :2183; setters: mmjsonparse/mmleefparse/mmsnareparse/
            # mmnormalize/mmaudit). $parsesuccess renders FAIL on a
            # freshly parsed message even when RFC5424 accepted
            # (template-property-transformations.sh parsesuccess=FAIL)
            return F.lit(False)
        raise KeyError(f"unknown canonical column {name!r}")

    # PUSHDOWN BARRIER: filters on parsed fields gain NOTHING from
    # being pushed through the parse (the scan reads `line` either
    # way — no derived predicate ever reaches parquet), but the
    # push-through substitution INLINES the layered parse trees into
    # the predicate with a copy per column reference — measured 2x
    # generated-code size, a janino compile FAILURE (method too
    # large → interpreted fallback), and ~+0.7s per execution on the
    # flagship. A nondeterministic-but-identity wrapper
    # (when(spark_partition_id() >= 0, col)) on the canonical
    # columns makes
    # PushPredicateThroughNonJoin stop at this projection
    # (fields.forall(_.deterministic) gate), so predicates evaluate
    # over the MATERIALIZED columns: one evaluation, no tree copies.
    # Every column is wrapped because column pruning keeps only the
    # referenced ones — whichever survive must carry the barrier.
    # spark_partition_id is the cheapest nondeterministic-flagged
    # expression (reads the partition index; no RNG, and unlike
    # monotonically_increasing_id it IS allowed in streaming
    # queries); Spark 4 bounds-folds rand()-based guards away, this
    # one survives the optimizer.
    import os as _os
    if _os.environ.get("RSYSLOG_SPARK_NO_BARRIER"):
        final = [canonical(c).alias(c) for c in want]
    else:
        final = [F.when(F.spark_partition_id() >= 0,
                        canonical(c)).alias(c)
                 for c in want]
    return [layer_a, layer_a2, layer_a3, layer_b, layer_c,
            layer_c2, layer_c3, layer_d, layer_d2, layer_e, final]


def parse_syslog(
    df: DataFrame,
    line_col: str = "line",
    inputname: str = "imfile",
    keep_raw: bool = True,
    with_uuid: bool = False,
    columns: list[str] | None = None,
    parsers: tuple = ("pmrfc5424", "pmrfc3164"),
    permit_slashes_in_programname: bool = False,
    remove_msg_first_space: bool = True,
    force_tag_colon: bool = False,
    headerless: tuple | None = None,
    permit_at_hostname: bool = False,
    permit_slashes_hostname: bool = False,
    permit_brackets_hostname: bool = False,
) -> DataFrame:
    """Raw lines → canonical syslog frame (SYSLOG_COLUMNS order).

    timegenerated = reception time (we use current_timestamp at parse,
    matching the reference's ttGenTime-at-ingest); timereported falls
    back to timegenerated when the wire timestamp is absent/invalid
    (ref: parser TIME_NOGEN handling).

    ``columns`` restricts the emitted canonical columns (callers that
    know their referenced properties can prune at the source — the
    liblognorm-"turbo" analog, ref runtime/msg.h:116-125).

    ``parsers`` is the per-ruleset parser chain (ref: runtime/
    parser.c:615-660 first-accept-wins; default list parser.c:
    150-156): any subset/order of pmrfc5424, pmrfc3164, pmnull.
    Without a permissive tail parser, non-matching lines exhaust the
    chain: raw message, parsesuccess=false.
    """
    from rsyslog_spark.session import (fake_now_key,
                                        session_cache_key)

    want = columns if columns is not None else list(SYSLOG_COLUMNS)
    if headerless is not None and "headerless" not in want:
        want = want + ["headerless"]
    # keyed by applicationId so a JVM restart misses instead of
    # resolving Columns against a dead gateway
    sk = session_cache_key()
    key = (sk, fake_now_key(), line_col, inputname, keep_raw, with_uuid, tuple(want),
           tuple(parsers), permit_slashes_in_programname,
           remove_msg_first_space, force_tag_colon, headerless,
           permit_at_hostname, permit_slashes_hostname,
           permit_brackets_hostname)
    layers = _CHAIN_CACHE.get(key) if sk else None
    if layers is None:
        layers = _build_layers(line_col, inputname, keep_raw,
                               with_uuid, want, tuple(parsers),
                               permit_slashes_in_programname,
                               remove_msg_first_space,
                               force_tag_colon, headerless,
                               permit_at_hostname,
                               permit_slashes_hostname,
                               permit_brackets_hostname)
        if sk:
            _CHAIN_CACHE[key] = layers
    # Receiver-stamped properties: the input module owns fromhost/
    # fromhost_ip/fromhost_port/inputname/timegenerated (ref: the
    # input sets msg_t pRcvFrom/pszInputName/ttGenTime at submit,
    # runtime/msg.c MsgSetRcvFrom — parsers never overwrite them).
    # When the incoming frame already carries one (imudp/imuxsock/
    # imhttp bridges, imkafka), prefer it over the synthesized value.
    # (json rides along for inputs that deliver a pre-built $! tree —
    # imhiredis stream entries, enqueueRedisStreamReply)
    recv = [c for c in ("fromhost", "fromhost_ip", "fromhost_port",
                        "inputname", "timegenerated", "json")
            if c in df.columns and c in want]
    if recv:
        df = df.withColumnsRenamed({c: f"__in_{c}" for c in recv})
    keep_others = [c for c in df.columns
                   if c != line_col and c not in want]
    cur = df
    for layer in layers[:-1]:
        cur = cur.select("*", *layer) if cur is not df else \
            df.select(*keep_others, *layer)
    out = cur.select(*keep_others, *layers[-1])
    for c in recv:
        out = out.withColumn(
            c, F.coalesce(F.col(f"__in_{c}"), F.col(c))
        ).drop(f"__in_{c}")
    # HOSTNAME falls back to the receiver stamp when the header has
    # none (ref: runtime/msg.c getHOSTNAME:2398-2414 — pszHOSTNAME
    # NULL → RcvFrom; local inputs stamp the daemon host). The
    # fromhost column itself gets the same default for local inputs.
    if "hostname" in want or "fromhost" in want:
        import socket as _socket

        from rsyslog_spark.session import local_hostname
        local = F.lit(local_hostname())
        rcv = F.coalesce(F.col("fromhost"), local) \
            if "fromhost" in out.columns else local
        if "hostname" in want:
            out = out.withColumn(
                "hostname", F.coalesce(F.col("hostname"), rcv))
        if "fromhost" in want:
            out = out.withColumn(
                "fromhost", F.coalesce(F.col("fromhost"), local))
    return out

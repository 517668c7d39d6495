"""RFC3164 (legacy BSD syslog) parser — permissive, like the
reference's pmrfc3164 (ref: tools/pmrfc3164.c, 585 LoC).

Wire shape: ``<PRI>Mmm dd hh:mm:ss HOSTNAME TAG[pid]: MSG``.
Permissive behaviors reproduced:
- RFC3339 timestamps accepted in the 3164 TIMESTAMP slot (pmrfc3164
  tries ParseTIMESTAMP3339 first — '<133>2011-03-01T11:22:12Z host
  tag ...' parses; golden tests/prop-programname.sh).
- no timestamp → whole rest is TAG+MSG, timereported = NULL
  (caller substitutes reception time, ref parser.c).
- TAG terminates at ':' (colon is PART of the tag) or SP (the SP is
  content, tag carries no colon) — pmrfc3164.c:470-498; no charset
  restriction inside the tag.
- programname = TAG up to the first ':', '[' or '/'
  (runtime/msg.c acquireProgramName; permitSlashesInProgramname off,
  the default — golden: 'tag/with/slashes' → 'tag').
- year inference: RFC3164 has no year; we attach the current year
  (ref pmrfc3164 year guess).
- the MSG's single leading space after the tag is stripped by the
  ENGINE default (``remove_msg_first_space=True``). NOTE: the
  reference's own default is bRemoveMsgFirstSpace=0 — keep the
  space (pmrfc3164.c:121,510); pass ``remove_msg_first_space=False``
  (config: ``parser.removeMsgFirstSpace="off"``) for reference-exact
  raw %msg% reads. Template OUTPUT parity holds either way via
  sp-if-no-1st-sp; the divergent default is documented in
  COVERAGE.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import rs_str
from rsyslog_spark.parsers.pri import pri_col, strip_pri
from rsyslog_spark.session import now_col as _now_col

# RFC3164 timestamp, full reference grammar (datetime.c
# ParseTIMESTAMP3164:440-640; goldens parsertest-parse1.sh):
# optional leading year (Brocade), case-INSENSITIVE 3-letter month,
# 1-2-digit day with optional space pad, optional inline year before
# the time (value 1971-2099 heuristic), 1-2-digit time fields,
# optional fractional seconds (Cisco IOS), optional stray ':' after
# the time. Terminator (' ' or end) is checked by the caller's
# pattern, not here.
_YEAR_RE = r"(?:19[7-9]\d|20\d\d)"
TS3164_RE = (rf"(?:{_YEAR_RE} )?"
             r"(?i:J(?:an|u[nl])|Feb|Ma[ry]|A(?:pr|ug)|Sep|Oct|Nov|Dec)"
             rf"  ?\d{{1,2}}(?: {_YEAR_RE})?"
             r" \d{1,2}:\d{1,2}:\d{1,2}(?:\.\d+)?:?")

#: strict fast-lane shape — the canonical RFC3164 timestamp with
#: exact-case month and no year/frac/colon variants; the parse chain
#: tries this first and falls back to the full grammar above (one
#: regex pass on the hot path, two only on variant headers)
TS3164_FAST_RE = r"[A-Z][a-z]{2} [ 0-9]\d \d{2}:\d{2}:\d{2}"
# RFC3339 in the 3164 slot (pmrfc3164 tries 3339 first)
TS3339_RE = (r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
             r"(?:Z|[+-]\d{2}:\d{2})")
# header after timestamp: hostname, then tag
_REST_RE = rf"^({TS3164_RE}|{TS3339_RE}) (\S+) (.*)$"


def _ts3164_to_timestamp(ts: Column) -> Column:
    """TS3164 text (full grammar above) → timestamp: one
    regexp_replace canonicalizes every year/pad/frac/colon variant
    into 'yyyy MMM d HH:mm:ss' ('' year when absent → current year
    injected, the reference's year guess), initcap fixes
    case-variant months ('AUG' → 'Aug'), then ONE try_to_timestamp
    — same single-regex-pass budget as before on the parse hot
    path."""
    year = F.date_format(_now_col(), "yyyy")
    # hot-path fast lane: the canonical 15-char "Mon dd hh:mm:ss"
    # shape converts with one literal replace + one to_timestamp
    # (the pre-r6 cost); year/case/frac/colon variants take the
    # normalizing regex below only when the fast parse misses
    fast = F.when(
        F.length(ts) == 15,
        F.try_to_timestamp(
            F.concat(year, F.lit(" "),
                     F.replace(ts, F.lit("  "), F.lit(" "))),
            F.lit("yyyy MMM d HH:mm:ss")))
    norm = F.regexp_replace(
        ts,
        r"^(?:(\d{4}) )?([A-Za-z]{3})  ?(\d{1,2})(?: (\d{4}))?"
        r" (\d{1,2}:\d{1,2}:\d{1,2})(?:\.\d+)?:?$",
        "$1$4 $2 $3 $5")
    norm = F.when(norm.startswith(" "), F.concat(year, norm)) \
        .otherwise(norm)
    slow = F.try_to_timestamp(
        F.initcap(norm), F.lit("yyyy MMM d H:m:s"))
    return F.coalesce(fast, slow)


def rfc3164_fields(line, permit_slashes_in_programname: bool = False,
                   remove_msg_first_space: bool = True) -> Column:
    """Parse a raw RFC3164 line into a struct of canonical fields.

    Returned struct: pri, syslogfacility, syslogseverity, timereported,
    hostname, syslogtag, programname, procid, msg, parsesuccess.

    Both parser options take the same values as chain.parse_syslog
    (``parser.permitSlashesInProgramname``,
    ``parser.removeMsgFirstSpace``) so direct callers of this module
    see them too, not just the chain.
    """
    raw = rs_str(line)
    pri = pri_col(raw)
    # strip trailing LF/NUL the wire may carry (ref parser trims);
    # char-set rtrim, not regex — this subtree feeds every field
    rest = F.rtrim(strip_pri(raw), F.lit("\n\r\x00"))

    has_ts = rest.rlike(f"^(?:{TS3164_RE}|{TS3339_RE}) ")
    is_iso = rest.rlike(f"^{TS3339_RE} ")
    ts_txt = F.regexp_extract(rest, _REST_RE, 1)
    hostname = F.regexp_extract(rest, _REST_RE, 2)
    tagmsg = F.regexp_extract(rest, _REST_RE, 3)
    # without timestamp: no hostname either (reference treats such
    # lines as TAG MSG from the sender)
    tagmsg_nots = rest
    tagmsg_eff = F.when(has_ts, tagmsg).otherwise(tagmsg_nots)

    # TAG scan (pmrfc3164.c:470-498): chars up to the first ':' or
    # SP. ':' terminates AND joins the tag; SP terminates and stays
    # content; end-of-message terminates (one-word message = tag).
    tok = F.regexp_extract(tagmsg_eff, r"^([^: ]+)", 1)
    after = F.substr(tagmsg_eff, F.length(tok) + 1, F.lit(1 << 30))
    colon_term = after.startswith(":")
    syslogtag = F.when(tagmsg_eff == "", F.lit("-")) \
        .otherwise(F.when(colon_term, F.concat(tok, F.lit(":")))
                   .otherwise(tok))
    # MSG: after ':' (one optional SP stripped when
    # remove_msg_first_space — see module note) or after the SP
    # terminator (same single-space policy)
    if remove_msg_first_space:
        msg = F.when(colon_term,
                     F.regexp_replace(after, r"^:\s?", "")) \
            .otherwise(F.regexp_replace(after, r"^ ", ""))
    else:
        msg = F.when(colon_term,
                     F.substr(after, F.lit(2), F.lit(1 << 30))) \
            .otherwise(after)
    # programname/procid derive from the tag (msg.c
    # acquireProgramName; pid = [NNN] suffix when present; '/' cuts
    # unless permitSlashesInProgramname)
    prog_re = (r"^([^:\[]*)" if permit_slashes_in_programname
               else r"^([^:\[/]*)")
    programname = F.regexp_extract(tok, prog_re, 1)
    procid = F.regexp_extract(tok, r"\[(\d+)\]$", 1)

    return F.struct(
        pri.alias("pri"),
        F.shiftright(pri, 3).alias("syslogfacility"),
        pri.bitwiseAND(F.lit(7)).alias("syslogseverity"),
        F.when(has_ts & is_iso, F.try_to_timestamp(ts_txt))
        .when(has_ts, _ts3164_to_timestamp(ts_txt))
        .alias("timereported"),
        F.when(has_ts, hostname).alias("hostname"),
        syslogtag.alias("syslogtag"),
        programname.alias("programname"),
        F.when(procid != "", procid).alias("procid"),
        msg.alias("msg"),
        # bParseSuccess is only set by mm modules (msg.c:2183);
        # a header parse leaves it FAIL
        F.lit(False).alias("parsesuccess"),
    )

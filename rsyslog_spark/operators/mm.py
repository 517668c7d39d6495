"""Message-modification operators (``mm*``) — per-row transforms.

Each is a DataFrame→DataFrame stage or a Column factory, pure
JVM-side expressions (SURVEY §2.6). No UDFs in any of these.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_str
from rsyslog_spark.functions.net import IPV4_RE
from rsyslog_spark.parsers.rfc5424 import parse_structured_data


def _balanced_json_re(depth: int = 8) -> str:
    """Regex matching a braces-balanced, string-aware JSON object up
    to ``depth`` nesting levels (regular expressions can't balance
    unboundedly; 8 levels covers real log payloads — deeper objects
    simply aren't found, like a scan-window miss).

    Built with UNROLLED POSSESSIVE quantifiers (``x*+(?:y x*+)*+``
    instead of ``(?:x|y)*``): java.util.regex pushes a stack frame
    per '*' iteration, so the naive per-character alternation
    overflows the JVM stack on multi-KB payloads (observed on the
    2.4 KB qradar line); the unrolled form frames per TOKEN (string
    or nested object). The grammar is deterministic — exactly one
    alternative applies at each character — so possessive matching
    is semantics-preserving."""
    s = r'"[^"\\]*+(?:\\.[^"\\]*+)*+"'
    pat = rf'\{{[^{{}}"]*+(?:{s}[^{{}}"]*+)*+\}}'
    for _ in range(depth - 1):
        pat = rf'\{{[^{{}}"]*+(?:(?:{s}|{pat})[^{{}}"]*+)*+\}}'
    return pat


def mmjsonparse(df: DataFrame, msg_col: str = "msg", out_col: str = "json",
                cookie: str = "@cee:", mode: str = "cookie",
                max_scan_bytes: int = 65536,
                allow_trailing: bool = True) -> DataFrame:
    """Parse JSON payloads into the ``$!`` tree (ref: plugins/
    mmjsonparse/mmjsonparse.c).

    ``mode="cookie"`` (default): the payload must follow the
    ``@cee:`` cookie (or the message must BE the object).
    ``mode="find-json"`` (mmjsonparse.c PARSE_MODE_FIND_JSON,
    golden: tests/mmjsonparse-find-json-*.sh): scan the first
    ``max_scan_bytes`` for the first position where a valid JSON
    OBJECT parses and ends within the window; ``allow_trailing=False``
    additionally requires only whitespace after the object (checked
    against the FULL message). Candidate positions are tried
    left-to-right exactly like the reference's memchr loop — a
    balanced-but-invalid outer object falls through to an inner one
    (overlapping-lookahead extraction + validity filter).

    Sets ``json_parsed`` (the $parsesuccess analog). On ANY failure
    the tree becomes ``{"msg": "<original>"}`` — the reference's
    failure container (golden: parsesuccess=FAIL json={ "msg": ... }).
    """
    msg = rs_str(F.col(msg_col))
    if mode == "cookie":
        # strip the LEADING cookie only — substring_index(..., -1)
        # would split on a '@cee:' inside the JSON body itself
        payload = F.when(
            msg.startswith(cookie),
            F.ltrim(F.substr(msg, F.lit(len(cookie) + 1)))
        ).otherwise(F.when(msg.startswith("{"), msg))
        ok = F.try_parse_json(payload).isNotNull()
        found = payload
    elif mode == "find-json":
        window = F.substring(msg, 1, max_scan_bytes)
        cands = F.regexp_extract_all(
            window, F.lit(f"(?=({_balanced_json_re()}))"), 1)
        if not allow_trailing:
            # the trailing check needs the FIRST-valid candidate's
            # actual offset — re-searching the matched text finds an
            # earlier duplicate occurrence of the same substring.
            # Fold true offsets instead: candidate k's start is the
            # first occurrence of its text past candidate k-1's
            # start (the lookahead scan emits a candidate at EVERY
            # balanced-object position, so no occurrence of any
            # candidate's text lies strictly between two consecutive
            # candidate starts — the incremental locate is exact).
            poss = F.aggregate(
                cands, F.array(F.lit(0)),
                lambda acc, x: F.concat(acc, F.array(F.position(
                    x, msg, F.element_at(acc, F.lit(-1)) + 1))))
            zipped = F.arrays_zip(
                cands.alias("txt"),
                F.slice(poss, 2, F.size(cands)).alias("pos"))
            valid = F.filter(zipped, lambda s: F.try_parse_json(
                s["txt"]).isNotNull())
            first = F.try_element_at(valid, F.lit(1))
            after = F.substr(
                msg, first["pos"] + F.length(first["txt"]))
            found = F.when(F.trim(after) == "", first["txt"])
        else:
            valid = F.filter(
                cands, lambda x: F.try_parse_json(x).isNotNull())
            found = F.try_element_at(valid, F.lit(1))
        ok = found.isNotNull()
    else:
        raise ValueError(f"unknown mmjsonparse mode {mode!r}")
    failure_tree = F.to_json(F.struct(msg.alias("msg")))
    return (
        df.withColumn(out_col, F.when(ok, found)
                      .otherwise(failure_tree))
        .withColumn("json_parsed", F.coalesce(ok, F.lit(False)))
    )


def mmfields(df: DataFrame, msg_col: str = "msg", delim: str = ",",
             prefix: str = "f", max_fields: int = 8) -> DataFrame:
    """Split message on a delimiter into ``$!f1..$!fN`` columns
    (ref: plugins/mmfields/mmfields.c:1-4; fields are 1-origin with
    f1 = text before the first delimiter).

    Emits a fixed set of columns (schema must be static); absent
    fields are NULL. One split() evaluation shared across fields.
    """
    import re as _re

    parts = F.split(rs_str(F.col(msg_col)), _re.escape(delim), -1)
    out = df.withColumn("__parts", parts)
    for i in range(1, max_fields + 1):
        out = out.withColumn(f"{prefix}{i}", F.try_element_at("__parts", F.lit(i)))
    return out.drop("__parts")


def mmpstrucdata(df: DataFrame, sd_col: str = "structured_data",
                 out_col: str = "rfc5424_sd") -> DataFrame:
    """RFC5424 SD → MAP<sdid, MAP<param,value>> (ref:
    plugins/mmpstrucdata/mmpstrucdata.c:1-4)."""
    return df.withColumn(out_col, parse_structured_data(F.col(sd_col)))


_ANON_RANDOM_MODES = ("random", "random-consistent",
                      "random-consistent-unique")


def _anon_rand_bits(mode: str, key: Column, idx: Column,
                    seed: int | None) -> Column:
    """Random fill for mmanon RANDOMINT modes as a long Column.

    random: fresh draw per MATCH (rand() evaluates per element inside
    the transform — two occurrences of the same IP differ, like the
    reference's rand_r stream; tests/mmanon_random_32_ipv4.sh).
    random-consistent(-unique): seeded keyed hash of the ORIGINAL
    address text — the same input IP maps to the same output within a
    run (the reference's per-instance consistency table,
    tests/mmanon_random_cons_32_ipv4.sh), different runs differ via
    the run seed. -unique maps to the same path: a 64-bit keyed hash
    is collision-free for practical cardinalities where the
    reference retries on collision (documented divergence)."""
    import random as _random

    if seed is None:
        seed = _random.getrandbits(62)
    if mode == "random":
        return F.xxhash64((F.rand() * (2 ** 62)).cast("long"),
                          idx, F.lit(seed))
    return F.xxhash64(key, F.lit(seed))


def anon_ipv4_col(c: ColumnOrName, bits: int = 8, mode: str = "zero",
                  seed: int | None = None,
                  replace_char: str = "x") -> Column:
    """mmanon ipv4 embedded anonymization (ref: plugins/mmanon/mmanon.c:
    1-3): mask the low ``bits`` of every IPv4 in the text.

    mode="zero": masked bits → 0 (octet-aligned widths as one
    regexp_replace; arbitrary widths via the integer round-trip).
    mode="random"/"random-consistent"/"random-consistent-unique":
    the masked low bits refill from the RNG (code_ipv4_int
    RANDOMINT, mmanon.c:902-910) — see _anon_rand_bits for the
    consistency semantics; ``seed`` pins the run for tests.
    """
    s = rs_str(c)
    bits = min(max(bits, 0), 32)    # ref clamps (mmanon_zero_33 test)
    if bits == 0:
        return s
    o = _octet()
    # NO word-boundary anchors: the reference's recognizer is a plain
    # left-to-right scan that fires at ANY position where four valid
    # octets parse (mmanon.c recognizer; golden: tests/
    # mmanon_recognize_ipv4.sh — '256.0.0.0' -> '20.0.0.0' because
    # '56.0.0.0' matches after the '2', and IPs embedded mid-word
    # anonymize too). The leftmost-match regex scan reproduces it.
    if mode == "simple":
        # simple mode corrects bits UP to a whole-octet boundary
        # (mmanon.c:512-529 "corrected to N") and overwrites EVERY
        # DIGIT of the masked octets with the replacement char —
        # length-preserving (simpleAnon:1127-1146; goldens
        # mmanon_simple_{8,12,33}_ipv4.sh: '172.0.234.255' @12→16 is
        # '172.0.xxx.xxx', @8 '...234.xxx'; 33→32; replacechar '*')
        n = min((bits + 7) // 8, 4)
        if n == 4:
            # full-width: simpleAnon's backward digit walk EXTENDS
            # past the match start through the adjoining digit run
            # ('256.0.0.0' matches at '56...' but renders
            # '***.*.*.*'; '1111.1.1.8.1' → '****.*.*.*.1' —
            # mmanon_simple_33_ipv4.sh). The leading \d* absorbs it.
            pat = rf"\d*(?:{o}\.){{3}}{o}"
            return _rewrite_ips(
                s, pat,
                lambda ip, _i: F.regexp_replace(ip, r"\d",
                                                replace_char))
        pat = rf"(?:{o}\.){{3}}{o}"

        def simple_ip(ip: Column, _idx: Column) -> Column:
            octs = F.split(ip, r"\.")
            outs = []
            for i in range(4):
                oc = F.element_at(octs, i + 1)
                if i >= 4 - n:
                    oc = F.regexp_replace(oc, r"\d", replace_char)
                outs.append(oc)
            return F.concat_ws(".", *outs)

        return _rewrite_ips(s, pat, simple_ip)
    if mode not in ("zero",) + _ANON_RANDOM_MODES:
        raise ValueError(f"mmanon ipv4 mode {mode!r}")
    if mode == "zero" and bits % 8 == 0:
        keep = 4 - bits // 8
        if keep == 0:
            return F.regexp_replace(s, rf"(?:{o}\.){{3}}{o}",
                                    "0.0.0.0")
        kept = r"\.".join([o] * keep)
        masked = r"\.".join([o] * (4 - keep))
        zeros = ".".join(["0"] * (4 - keep))
        return F.regexp_replace(s, rf"({kept})\.{masked}",
                                f"$1.{zeros}")
    # arbitrary widths and random modes (golden: mmanon_zero_12_ipv4
    # — 172.0.234.255 @12 -> 172.0.224.0): regexp_replace has no
    # compute-per-match, so split the text on the recognizer,
    # numerically rewrite each extracted match, and stitch text and
    # rewritten IPs back together — all column exprs.
    pat = rf"(?:{o}\.){{3}}{o}"

    def mask_ip(ip: Column, idx: Column) -> Column:
        octs = F.split(ip, r"\.")
        v = F.lit(0).cast("long")
        for i in range(4):
            v = v * 256 + F.element_at(octs, i + 1).cast("long")
        masked = F.shiftleft(F.shiftright(v, bits), bits)
        if mode in _ANON_RANDOM_MODES:
            lowmask = (1 << bits) - 1
            masked = masked + _anon_rand_bits(mode, ip, idx, seed) \
                .bitwiseAND(F.lit(lowmask))
        return F.concat_ws(".", *[
            F.shiftright(masked, sh).bitwiseAND(F.lit(255))
            .cast("string") for sh in (24, 16, 8, 0)])

    return _rewrite_ips(s, pat, mask_ip)


def _rewrite_ips(s: Column, pat: str, fn) -> Column:
    """Rewrite every regex match of ``pat`` in ``s`` through ``fn``
    (Column→Column): split on the pattern, transform the extracted
    matches, stitch back — all column exprs, no per-row Python."""
    parts = F.split(s, pat, -1)
    ips = F.regexp_extract_all(s, F.lit(f"({pat})"), 1)
    masked_ips = F.transform(ips, fn)
    rest = F.zip_with(
        masked_ips,
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
        lambda m, p: F.concat(m, p))
    return F.concat(F.element_at(parts, 1), F.array_join(rest, ""))


def _octet() -> str:
    return r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"


#: one IPv6 hex group
_HEXG = r"[0-9A-Fa-f]{1,4}"


def _ipv6_scan_re() -> str:
    """The reference's IPv6 walker (mmanon.c syntax_ipv6:757-838) as
    an exact regex, r6 rewrite byte-matched against the FULL
    mmanon_ipv6_port.sh golden (incl. its >8-group and 5-digit-port
    quirk rows, issue #4856):

    * tokens are POSSESSIVE — the walker never backtracks: a 5+-hex
      token is never shortened into a 4-hex group, and a failed
      offset is rejected outright (the scan advances one byte, so
      matches may start mid-token, e.g. inside '49225').
    * no-abbrev form accepts at EXACTLY the 8th group, whatever
      follows (walker accepts immediately at ipParts==8).
    * '::' forms cap total groups at 7; an 8th group REJECTS the
      whole offset (no shorter re-match). Acceptance needs a
      boundary (next char neither ':' nor hex) or the 5-hex-digit
      PORT tail (':' + >=5 hex, excluded from the match —
      the walker's rewind-6; requires >=2 groups).

    Known divergence (not exercised by any reference golden): '::'
    immediately followed by >=5 hex digits — the walker's rewind
    eats the second ':' of the abbrev and re-parses a broken
    address; we reject the offset instead."""
    h = "[0-9A-Fa-f]"
    g = rf"{h}{{1,4}}+(?!{h})"
    bnd = rf"(?!:)(?!{h})"
    port = rf"(?=:{h}{{5}})"
    alts = [rf"{g}(?::{g}){{7}}+"]          # 8 groups, no abbrev
    for a in range(7, -1, -1):              # groups before '::'
        pre = (g + (rf"(?::{g}){{{a - 1}}}+" if a > 1 else "")) \
            if a else ""
        maxb = 7 - a
        if a >= 2:
            sfx = (rf"(?:{g}(?::{g}){{0,{maxb - 1}}}+)?"
                   if maxb >= 1 else "")
            alts.append(f"{pre}::{sfx}(?:{port}|{bnd})")
        elif a == 1:
            # port tail needs total>=2 → at least 1 suffix group
            both = rf"{g}(?::{g}){{0,{maxb - 1}}}+(?:{port}|{bnd})"
            alts.append(f"{pre}::(?:{both}|{bnd})")
        else:
            big = rf"{g}:{g}(?::{g}){{0,{maxb - 2}}}+(?:{port}|{bnd})"
            small = rf"(?:{g})?+{bnd}"
            alts.append(f"::(?:{big}|{small})")
    return "|".join(alts)


#: the walker-exact recognizer (see _ipv6_scan_re). No word anchors —
#: mid-word addresses anonymize, like ipv4 and like the reference's
#: every-byte-offset scan.
IPV6_SCAN_RE = _ipv6_scan_re()


def _expand_hex_groups(head: Column, slots: int) -> Column:
    """'::'-compressed hex-group text → array of ``slots`` LONG group
    values (the reference's ipv6 split into halves, mmanon.c:78;
    expansion inserts the elided zero groups)."""
    has_dc = head.contains("::")
    def grp(x):
        return F.filter(F.split(x, ":"), lambda g: g != "")
    left = grp(F.substring_index(head, "::", 1))
    right = grp(F.substring_index(head, "::", -1))
    mids = F.lit(slots) - F.size(left) - F.size(right)
    txt = F.when(has_dc, F.concat(
        left, F.array_repeat(F.lit("0"), mids), right)) \
        .otherwise(grp(head))
    return F.transform(txt, lambda g: F.conv(g, 16, 10).cast("long"))


def _anon_group(g: Column, z: int, width: int, mode: str,
                key: Column, idx: Column, seed: int | None,
                salt: int) -> Column:
    """Mask the low ``z`` bits of one ``width``-bit group, refilling
    from the RNG in the RANDOMINT modes (code_ipv6_int/code_ipv4_int
    masking shape)."""
    if z <= 0:
        return g
    z = min(z, width)
    out = F.shiftleft(F.shiftright(g, z), z)
    if mode in _ANON_RANDOM_MODES:
        import random as _random

        if seed is None:
            seed = _random.getrandbits(62)
        if mode == "random":
            rnd = F.xxhash64((F.rand() * (2 ** 62)).cast("long"),
                             idx, F.lit(seed), F.lit(salt))
        else:
            rnd = F.xxhash64(key, F.lit(seed), F.lit(salt))
        out = out + rnd.bitwiseAND(F.lit((1 << z) - 1))
    return out


def _splice(s: Column, pat: str, rewrite) -> Column:
    """Split text on the recognizer, rewrite each match (rewrite(ip,
    idx) -> Column), stitch back — the compute-per-match splice all
    the partial/random mmanon paths share."""
    parts = F.split(s, pat, -1)
    ips = F.regexp_extract_all(s, F.lit(f"({pat})"), 1)
    new = F.transform(ips, rewrite)
    rest = F.zip_with(
        new,
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
        lambda m, p: F.concat(m, p))
    return F.concat(F.element_at(parts, 1), F.array_join(rest, ""))


def _hexg_render(g: Column) -> Column:
    return F.lower(F.conv(g.cast("string"), 10, 16))


def anon_ipv6_col(c: ColumnOrName, bits: int = 128,
                  mode: str = "zero",
                  seed: int | None = None) -> Column:
    """mmanon ipv6 anonymization (ref: plugins/mmanon
    ipv6.anonmode/ipv6.bits; bits over 128 clamp to 128 like the
    reference's mmanon_zero_128 test which passes 129).

    All widths: partial bits expand the '::'-compressed text to 8
    groups, mask the low ``bits``, and re-render every group from
    its integer (lowercase, no padding, no re-compression — golden
    mmanon_zero_96_ipv6.sh: 'FFFF:FFFF::…' @96 ->
    'ffff:ffff:0:0:0:0:0:0'). RANDOMINT modes refill the masked bits
    (code_ipv6_int, mmanon.c:1218-1297) — consistency semantics in
    _anon_rand_bits."""
    s = rs_str(c)
    bits = min(max(bits, 0), 128)
    if bits == 0:
        return s
    if mode not in ("zero",) + _ANON_RANDOM_MODES:
        raise ValueError(f"mmanon ipv6 mode {mode!r}")
    if mode == "zero" and bits >= 128:
        # full-width zero stays a single regexp_replace (fast path)
        return F.regexp_replace(s, f"(?:{IPV6_SCAN_RE})",
                                "0:0:0:0:0:0:0:0")

    def rewrite(ip: Column, idx: Column) -> Column:
        groups = _expand_hex_groups(ip, 8)
        outs = []
        for i in range(8):
            z = bits - 16 * (7 - i)
            g = F.element_at(groups, i + 1)
            outs.append(_hexg_render(
                _anon_group(g, z, 16, mode, ip, idx, seed, i)))
        return F.concat_ws(":", *outs)

    return _splice(s, f"(?:{IPV6_SCAN_RE})", rewrite)


def _embedded_ipv4_re() -> str:
    """IPv4-embedded-in-IPv6 recognizer (ref: mmanon embeddedipv4.*;
    golden tests/mmanon_recognize_ipembedded.sh): either the full
    form — exactly 6 hex groups then the dotted quad — or a
    '::'-compressed form where (left groups + right groups) <= 5,
    since the v4 tail takes two of the 8 slots and '::' must stand
    for at least one zero group. The slot arithmetic is enumerated
    exactly (L+R <= 5), which is what makes
    '13:abd:45:1:1:1::1:0.0.0.0' match only from 'abd' onward."""
    h = _HEXG
    v4 = r"\.".join([_octet()] * 4)
    alts = [rf"(?:{h}:){{6}}{v4}"]
    for total in range(5, -1, -1):           # longest forms first
        for left in range(total, -1, -1):
            right = total - left
            lpat = rf"{h}(?::{h}){{{left - 1}}}" if left else ""
            rpat = rf"(?:{h}:){{{right}}}"
            alts.append(rf"{lpat}::{rpat}{v4}")
    return "|".join(alts)


def anon_ipv6_embedded_col(c: ColumnOrName, bits: int = 128,
                           mode: str = "zero",
                           seed: int | None = None) -> Column:
    """mmanon embeddedipv4 anonymization — every IPv4-in-IPv6
    address rewrites with its low ``bits`` zeroed (or RNG-refilled
    in the RANDOMINT modes); the rendering keeps the v4 tail dotted
    (``0:0:0:0:0:0:0.0.0.0`` at full width). Partial widths expand
    the '::'-compressed hex head to 6 slots; the dotted quad covers
    bits 31..0 (code_ipv6_int over the split halves with the
    embeddedIPv4 config, mmanon.c:1218)."""
    s = rs_str(c)
    bits = min(max(bits, 0), 128)
    if bits == 0:
        return s
    if mode not in ("zero",) + _ANON_RANDOM_MODES:
        raise ValueError(f"mmanon embeddedipv4 mode {mode!r}")
    if mode == "zero" and bits >= 128:
        return F.regexp_replace(s, f"(?:{_embedded_ipv4_re()})",
                                "0:0:0:0:0:0:0.0.0.0")

    def rewrite(ip: Column, idx: Column) -> Column:
        v4 = F.substring_index(ip, ":", -1)
        head = F.substr(ip, F.lit(1),
                        F.length(ip) - F.length(v4))
        groups = _expand_hex_groups(head, 6)
        outs = []
        for i in range(6):          # hex slots: bits 127..32
            z = bits - 16 * (5 - i) - 32
            g = F.element_at(groups, i + 1)
            outs.append(_hexg_render(
                _anon_group(g, z, 16, mode, ip, idx, seed, i)))
        octs = F.split(v4, r"\.")
        o_out = []
        for j in range(4):          # v4 octets: bits 31..0
            z = bits - 8 * (3 - j)
            o = F.element_at(octs, j + 1).cast("long")
            o_out.append(_anon_group(o, z, 8, mode, ip, idx, seed,
                                     6 + j).cast("string"))
        return F.concat(F.concat_ws(":", *outs), F.lit(":"),
                        F.concat_ws(".", *o_out))

    return _splice(s, f"(?:{_embedded_ipv4_re()})", rewrite)


def mmanon(df: DataFrame, msg_col: str = "msg", bits: int = 8,
           mode: str = "zero", *,
           ipv6_bits: int | None = None,
           ipv6_mode: str = "zero",
           embedded_bits: int | None = None,
           embedded_mode: str = "zero",
           seed: int | None = None,
           replace_char: str = "x") -> DataFrame:
    out = df.withColumn(
        msg_col, anon_ipv4_col(F.col(msg_col), bits, mode, seed,
                               replace_char=replace_char))
    if embedded_bits is not None:
        # embedded v4-in-v6 runs BEFORE plain v6 so the dotted tail
        # is still present to recognize (the reference checks
        # embedded first too)
        out = out.withColumn(
            msg_col, anon_ipv6_embedded_col(F.col(msg_col),
                                            embedded_bits,
                                            embedded_mode, seed))
    if ipv6_bits is not None:
        out = out.withColumn(
            msg_col, anon_ipv6_col(F.col(msg_col), ipv6_bits,
                                   ipv6_mode, seed))
    return out


def mmrm1stspace(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """Remove erroneous leading space in MSG (ref: plugins/mmrm1stspace)."""
    return df.withColumn(
        msg_col, F.regexp_replace(F.col(msg_col), "^ ", "")
    )


def mmutf8fix(df: DataFrame, msg_col: str = "msg",
              replacement: str = " ") -> DataFrame:
    """Replace invalid UTF-8 (ref: plugins/mmutf8fix/mmutf8fix.c:1-8).

    Spark strings are already UTF-8-validated on read; wire bytes that
    were invalid arrive as U+FFFD. We map those (and raw control
    chars) to the replacement char.
    """
    return df.withColumn(
        msg_col,
        F.regexp_replace(F.col(msg_col), "[�\x00-\x08\x0b\x0c\x0e-\x1f]",
                         replacement),
    )


def mmtaghostname(df: DataFrame, tag: str | Column | None = None,
                  hostname: str | Column | None = None) -> DataFrame:
    """Set tag/hostname from a literal or from message properties
    (ref: contrib/mmtaghostname — e.g. hostname := fromhost for
    cloud-relayed messages)."""
    out = df
    if tag is not None:
        out = out.withColumn(
            "syslogtag", tag if isinstance(tag, Column) else F.lit(tag))
    if hostname is not None:
        out = out.withColumn(
            "hostname",
            hostname if isinstance(hostname, Column) else F.lit(hostname))
    return out


def mmexternal(
    df: DataFrame,
    argv: list[str],
    *,
    msg_col: str = "msg",
    batch_size: int = 1024,
    interface_output: str = "json",
    response_timeout: float | None = None,
    max_response_size: int = 128 * 1024,
) -> DataFrame:
    """External message-modification program bridge (ref:
    plugins/mmexternal/mmexternal.c — JSON-over-stdio, one request per
    message, response is the full modified '$!' tree).

    Spark shape: ``mapInPandas`` keeps Arrow batching; each partition
    starts ONE subprocess and streams newline-delimited JSON through
    it (the reference starts one child per worker thread — same
    amortization). The child must echo one JSON object per input line;
    its output replaces the ``json`` column. This is the engine's
    UDTF escape hatch — anything Spark can't express natively can run
    here at the cost of the pipe hop.

    ``interface_output="none"`` (ChangeLog 2026-05-22): side-effect-
    only helpers — requests are written but no response is read and
    the ``json`` column passes through untouched.

    ``response_timeout`` / ``max_response_size`` follow the
    reference's RESTART-AND-SKIP contract (mmexternal.c:326-400 +
    readPipeLine: 'will be restarted and current message skipped'):
    a helper that stalls past the timeout, closes stdout, or answers
    longer than the cap is terminated and RESPAWNED, the current
    message passes through with its ``json`` UNCHANGED, and the
    batch keeps flowing — a misbehaving helper never fails the
    pipeline, it just stops modifying messages."""
    import json as _json
    import os as _os
    import select as _select
    import subprocess
    import time as _time

    if interface_output not in ("json", "none"):
        raise ValueError(
            f"mmexternal: interface.output {interface_output!r} "
            "- supported: 'json', 'none'")

    out_fields = [f for f in df.schema.fields]
    out_schema = df.schema
    if "json" not in df.columns:
        from pyspark.sql.types import StringType, StructField, StructType
        out_schema = StructType(out_fields + [StructField("json", StringType())])

    col_names = [f.name for f in out_schema.fields]

    def run(batches):
        import warnings as _warnings

        # one-way helpers must not accumulate unread stdout: a child
        # that writes anyway would fill the ~64K pipe buffer and
        # deadlock the batch, so discard it at the OS level (the
        # reference likewise never reads output=none children)
        stdout_target = (
            subprocess.DEVNULL if interface_output == "none"
            else subprocess.PIPE)
        st = {"proc": None, "rbuf": bytearray()}

        def spawn():
            st["proc"] = subprocess.Popen(
                argv, stdin=subprocess.PIPE, stdout=stdout_target,
                text=True)
            st["rbuf"] = bytearray()

        def terminate(reason: str) -> None:
            # restart-and-skip (mmexternal.c terminateChild call
            # sites: 'will be restarted and current message
            # skipped') — the pipeline keeps flowing
            _warnings.warn(
                f"mmexternal: program {argv[0]!r} {reason}; will be "
                "restarted and current message skipped",
                RuntimeWarning, stacklevel=2)
            p = st["proc"]
            st["proc"] = None
            if p is None:
                return
            try:
                p.kill()
            except OSError:
                pass
            p.wait()

        # Response reads go through the raw fd, NOT the TextIOWrapper:
        # select() only sees the kernel pipe, so a line already sitting
        # in a buffered reader would look like "no data" (spurious
        # timeout), and readline() on a partial line blocks past the
        # deadline.  A raw-fd loop makes the timeout cover the WHOLE
        # line, not just time-to-first-byte.
        def read_line() -> str | None:
            """One response line; None = helper was restarted and
            this message must pass through unchanged."""
            rbuf = st["rbuf"]
            deadline = (
                None if response_timeout is None
                else _time.monotonic() + response_timeout)
            fd = st["proc"].stdout.fileno()
            while True:
                nl = rbuf.find(b"\n")
                if nl >= 0:
                    line = rbuf[:nl].decode("utf-8", "replace")
                    del rbuf[:nl + 1]
                    return line
                if len(rbuf) > max_response_size:
                    # mmexternal.c:355-364: response longer than the
                    # cap → restart helper, skip message
                    terminate("returned a response longer than "
                              f"maxResponseSize ({max_response_size}"
                              " bytes)")
                    return None
                if deadline is None:
                    wait = None
                else:
                    wait = deadline - _time.monotonic()
                    if wait <= 0:
                        terminate("did not respond within timeout "
                                  f"({response_timeout}s)")
                        return None
                ready, _, _ = _select.select([fd], [], [], wait)
                if not ready:
                    terminate("did not respond within timeout "
                              f"({response_timeout}s)")
                    return None
                chunk = _os.read(fd, 65536)
                if chunk == b"":
                    # EOF = the child died or stopped answering;
                    # silently assigning '' would corrupt every
                    # remaining row as if it succeeded
                    terminate("closed stdout unexpectedly")
                    return None
                rbuf.extend(chunk)

        spawn()
        try:
            for pdf in batches:
                if "json" not in pdf.columns:
                    pdf = pdf.assign(json=None)
                if interface_output == "none":
                    # one-way helper: requests only, json untouched
                    for m in pdf[msg_col]:
                        if st["proc"] is None:
                            spawn()
                        try:
                            st["proc"].stdin.write(
                                _json.dumps({"msg": m}) + "\n")
                            st["proc"].stdin.flush()
                        except (BrokenPipeError, OSError):
                            terminate("stdin pipe broke")
                    yield pdf[col_names]
                    continue
                outs = []
                for m, prev in zip(pdf[msg_col], pdf["json"]):
                    if st["proc"] is None:
                        spawn()
                    try:
                        st["proc"].stdin.write(
                            _json.dumps({"msg": m}) + "\n")
                        st["proc"].stdin.flush()
                        line = read_line()
                    except (BrokenPipeError, OSError):
                        terminate("stdin pipe broke")
                        line = None
                    outs.append(prev if line is None else line)
                pdf = pdf.assign(json=outs)
                yield pdf[col_names]
        finally:
            p = st["proc"]
            if p is not None:
                p.stdin.close()
                rc = p.wait()
                if rc not in (0, None):
                    raise RuntimeError(
                        f"mmexternal child {argv[0]!r} exited {rc}")

    return df.mapInPandas(run, schema=out_schema)


def mmrfc5424addhmac(df: DataFrame, key: bytes,
                     msg_col: str = "msg",
                     sd_col: str = "structured_data",
                     sd_id: str = "hmac@32473") -> DataFrame:
    """Append an HMAC-SHA256 SD-element over MSG to STRUCTURED-DATA
    (ref: contrib/mmrfc5424addhmac/mmrfc5424addhmac.c)."""
    from rsyslog_spark.functions.hashing import hmac_sha256

    elem = F.concat(F.lit(f"[{sd_id} hash=\""),
                    hmac_sha256(key, F.col(msg_col)), F.lit("\"]"))
    merged = F.when(
        F.col(sd_col).isNull() | (F.col(sd_col) == "-"), elem
    ).otherwise(F.concat(F.col(sd_col), elem))
    return df.withColumn(sd_col, merged)


#: default classification prompt (ref: plugins/mmaitag/mmaitag.c:110-113
#: setInstParamDefaults)
MMAITAG_DEFAULT_PROMPT = (
    "Task: Classify the log message that follows. "
    "Output: Exactly one label from this list: NOISE, REGULAR, "
    "IMPORTANT, CRITICAL. "
    "Restrictions: No other text, explanations, formatting, or "
    "newline characters.")

#: tag used when the provider call fails (ref: ai_provider_gemini.c —
#: every error path strdup's "REGULAR")
MMAITAG_FALLBACK_TAG = "REGULAR"


class GeminiProvider:
    """The reference's Gemini REST provider contract (ref: plugins/
    mmaitag/ai_provider_gemini.c:137-253 gemini_classify_batch), as a
    picklable callable usable as :func:`mmaitag`'s ``classifier``:

    - one POST per message to ``{base_url}/models/{model}:
      generateContent`` with body ``{"contents": [{"role": "user",
      "parts": [{"text": prompt + "\\n" + msg}]}]}``,
    - headers ``Content-Type: application/json`` and
      ``x-goog-api-key: <apikey>`` (apikey_file read like mmaitag.c's
      apikey_file param),
    - response text at ``candidates[0].content.parts[0].text``,
      trailing whitespace stripped (gemini.c
      strip_trailing_whitespace — LLMs append newlines),
    - ANY failure (transport, HTTP != 200, shape) yields the
      "REGULAR" fallback tag for that message, after ``max_retries``
      re-posts.

    ``base_url`` is overridable so tests (and self-hosted gateways)
    can point it at a mock; stdlib urllib only — no client library.
    """

    def __init__(self, apikey: str | None = None, *,
                 model: str = "gemini-2.0-flash",
                 prompt: str = MMAITAG_DEFAULT_PROMPT,
                 base_url: str =
                 "https://generativelanguage.googleapis.com/v1beta",
                 apikey_file: str | None = None,
                 timeout: float = 10.0, max_retries: int = 1):
        if apikey is None and apikey_file:
            with open(apikey_file, encoding="utf-8") as fh:
                apikey = fh.read().strip()
        if not apikey:
            raise ValueError("mmaitag gemini provider needs apikey or "
                             "apikey_file (mmaitag.c checks the same)")
        self.apikey = apikey
        self.model = model
        self.prompt = prompt
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.max_retries = max_retries

    def __call__(self, msgs):
        import json as _json
        import urllib.request

        url = f"{self.base_url}/models/{self.model}:generateContent"
        tags = []
        for m in msgs:
            body = _json.dumps({"contents": [{
                "role": "user",
                "parts": [{"text": f"{self.prompt}\n{m or ''}"}],
            }]}).encode()
            tag = MMAITAG_FALLBACK_TAG
            for _ in range(self.max_retries + 1):
                try:
                    req = urllib.request.Request(url, data=body, headers={
                        "Content-Type": "application/json",
                        "x-goog-api-key": self.apikey,
                    })
                    with urllib.request.urlopen(
                            req, timeout=self.timeout) as resp:
                        parsed = _json.loads(resp.read().decode())
                    text = parsed["candidates"][0]["content"][
                        "parts"][0]["text"]
                    tag = str(text).rstrip()
                    break
                except Exception:
                    continue
            tags.append(tag)
        return tags


def mmaitag(
    df: DataFrame,
    msg_col: str = "msg",
    out_col: str = "aitag",
    classifier=None,
    labels: tuple[str, ...] = ("REGULAR", "IMPORTANT"),
) -> DataFrame:
    """AI-provider message classification (ref: plugins/mmaitag/
    mmaitag.c:1-10 — external provider tags each message into
    ``$.aitag``).

    ``classifier(list[str]) -> list[str]`` is the injected provider
    call (batched); :class:`GeminiProvider` implements the
    reference's real HTTP contract. Default is a deterministic STUB
    (no network in this container): keyword heuristic over the
    reference's label set — the Spark-side contract (Arrow batching,
    column shape) is identical either way.
    """
    import pandas as pd  # noqa: F401
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    if classifier is None:
        def classifier(msgs):  # STUB provider
            return [labels[1] if any(w in (m or "").lower() for w in
                                     ("error", "fail", "denied", "attack"))
                    else labels[0] for m in msgs]

    @pandas_udf("string")
    def _tag(s: "pd.Series") -> "pd.Series":
        import pandas as _pd
        return _pd.Series(classifier(list(s)))

    return df.withColumn(out_col, _tag(F.col(msg_col)))


class DarwinScorer:
    """The real Darwin filter wire protocol (ref: contrib/mmdarwin/
    protocol.h darwin_filter_packet_t; mmdarwin.c:740-820 doAction),
    as a picklable callable usable as :func:`mmdarwin`'s ``scorer``:

    - connect to the filter's AF_UNIX socket (mmdarwin.c openSocket),
    - per message: 56-byte little-endian header (type=OTHER,
      response=BACK, filter_code, body_size, 16-byte event id,
      certitude_size=1, certitude_list[1], trailing pad — the x86-64
      struct layout) followed by the body
      ``[["field1","field2"]]\\0`` (add_field_to_body/end_body: each
      field double-quoted, comma-joined, trailing comma folded into
      the closing brackets, NUL-terminated and counted in body_size),
    - read the 56-byte response packet back; the score is
      ``certitude_list[0]``.

    One socket per pandas batch (the reference reuses one per worker;
    socketMaxUse rotation is a server-affinity knob we don't need).
    Failures raise — mmdarwin is an enrichment stage, and a silent
    zero-certitude would look like a clean verdict.
    """

    HEADER_FMT = "<iiqQ16sQI4x"          # 56 bytes

    DARWIN_PACKET_OTHER = 0
    DARWIN_RESPONSE_SEND_BACK = 1

    def __init__(self, socket_path: str, *, filter_code: int = 0,
                 timeout: float = 10.0):
        self.socket_path = socket_path
        self.filter_code = filter_code
        self.timeout = timeout

    def _recv_exact(self, sock, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("mmdarwin: filter closed mid-"
                                      "response")
            buf += chunk
        return buf

    def __call__(self, pdf):
        import socket
        import struct
        import uuid

        import pandas as pd

        hsize = struct.calcsize(self.HEADER_FMT)
        out = []
        sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        sock.settimeout(self.timeout)
        sock.connect(self.socket_path)
        try:
            for _, row in pdf.iterrows():
                body = ("[[" + ",".join(f'"{v}"' for v in row)
                        + "]]").encode() + b"\x00"
                header = struct.pack(
                    self.HEADER_FMT, self.DARWIN_PACKET_OTHER,
                    self.DARWIN_RESPONSE_SEND_BACK, self.filter_code,
                    len(body), uuid.uuid4().bytes, 1, 0)
                sock.sendall(header)
                sock.sendall(body)
                resp = struct.unpack(
                    self.HEADER_FMT, self._recv_exact(sock, hsize))
                out.append(float(resp[6]))   # certitude_list[0]
        finally:
            sock.close()
        return pd.Series(out, index=pdf.index)


def mmdarwin(
    df: DataFrame,
    feature_cols: list[str],
    out_col: str = "darwin_score",
    scorer=None,
) -> DataFrame:
    """Darwin ML-scoring enrich (ref: contrib/mmdarwin — sends selected
    fields to a Darwin filter, stores the returned certitude score).

    ``scorer(pandas.DataFrame) -> pandas.Series[float]`` is injected;
    :class:`DarwinScorer` speaks the real Darwin socket protocol
    (mock-server e2e tested). Default STUB hashes the features to a
    stable [0,1) score so the plumbing is testable without the
    service.
    """
    import pandas as pd  # noqa: F401
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    if scorer is None:
        def scorer(pdf):
            import hashlib
            return pdf.apply(
                lambda r: int(hashlib.sha256(
                    "|".join(str(v) for v in r).encode()
                ).hexdigest()[:8], 16) / 0xFFFFFFFF, axis=1)

    @pandas_udf("double")
    def _score(*cols: "pd.Series") -> "pd.Series":
        import pandas as _pd
        pdf = _pd.concat(cols, axis=1)
        return _pd.Series(scorer(pdf))

    return df.withColumn(out_col, _score(*[F.col(c) for c in feature_cols]))


def mmaudit(df: DataFrame, msg_col: str = "msg",
            prefix: str = "audit_") -> DataFrame:
    """Linux audit record normalization (ref: plugins/mmaudit/
    mmaudit.c:164-259): messages shaped
    ``type=T msg=audit(SECS.MSECS:SEQ): k=v k2="v2" ...`` yield the
    header (type, timestamp, sequence) and a map of the k=v fields —
    the Spark shape of the reference's hdr/fields JSON subtree."""
    m = rs_str(F.col(msg_col))
    hdr = r"^type=(\S+) msg=audit\((\d+)\.(\d+):(\d+)\):\s*(.*)$"
    rtype = F.regexp_extract(m, hdr, 1)
    matched = rtype != ""
    body = F.regexp_extract(m, hdr, 5)
    pairs = F.regexp_extract_all(
        body, F.lit(r'(\S+?=(?:"[^"]*"|\S+))'), F.lit(1))
    fields = F.map_from_entries(F.transform(pairs, lambda kv: F.struct(
        F.substring_index(kv, "=", 1).alias("key"),
        F.regexp_replace(
            F.substr(kv, F.length(F.substring_index(kv, "=", 1)) + 2),
            r'^"|"$', "").alias("value"),
    )))
    ts = F.timestamp_seconds(
        F.regexp_extract(m, hdr, 2).cast("long")) \
        + F.make_interval(secs=F.regexp_extract(m, hdr, 3)
                          .cast("double") / 1000)
    return (
        df.withColumn(prefix + "type", F.when(matched, rtype))
        .withColumn(prefix + "time", F.when(matched, ts))
        .withColumn(prefix + "seq",
                    F.when(matched, F.regexp_extract(m, hdr, 4)
                           .cast("long")))
        .withColumn(prefix + "fields", F.when(matched, fields))
    )


_SEV_NAMES = {"emerg": 0, "alert": 1, "crit": 2, "error": 3, "err": 3,
              "warning": 4, "warn": 4, "notice": 5, "info": 6,
              "debug": 7}


def mmsnmptrapd(df: DataFrame, tag_col: str = "syslogtag",
                hostname_col: str = "hostname",
                severity_col: str = "syslogseverity",
                tag_prefix: str = "snmptrapd") -> DataFrame:
    """snmptrapd tag rewrite (ref: plugins/mmsnmptrapd/mmsnmptrapd.c;
    doc mmsnmptrapd.rst): tags shaped ``snmptrapd/severity/realhost:``
    carry the ORIGINAL host and severity of the trap — promote both
    and reduce the tag to ``snmptrapd:``."""
    t = rs_str(F.col(tag_col))
    pat = rf"^{tag_prefix}/([a-z]+)/([^:/]+):?$"
    sevname = F.regexp_extract(t, pat, 1)
    host = F.regexp_extract(t, pat, 2)
    matched = host != ""
    sev = F.lit(None).cast("int")
    for name, num in _SEV_NAMES.items():
        sev = F.when(sevname == name, F.lit(num)).otherwise(sev)
    return (
        df.withColumn(hostname_col,
                      F.when(matched, host).otherwise(F.col(hostname_col)))
        .withColumn(severity_col,
                    F.when(matched & sev.isNotNull(), sev)
                    .otherwise(F.col(severity_col)))
        .withColumn(tag_col,
                    F.when(matched, F.lit(tag_prefix + ":"))
                    .otherwise(F.col(tag_col)))
    )


def _jsonc_dumps(val) -> str:
    """Serialize like json-c's JSON_C_TO_STRING_SPACED — the
    reference's default JSON render (glbl.c:104 glblJsonFormatOpt;
    global(compactJsonString="on") flips to PLAIN): spaces inside
    braces/brackets and after ':'/',', forward slashes escaped
    (cmp_exact golden: tests/data_pipeline-qradar.sh EXPECTED)."""
    import json as _json

    def scalar(v):
        return _json.dumps(v, ensure_ascii=False).replace("/", "\\/")

    def walk(v):
        if isinstance(v, dict):
            if not v:
                return "{ }"
            inner = ", ".join(f"{scalar(str(k))}: {walk(x)}"
                              for k, x in v.items())
            return "{ " + inner + " }"
        if isinstance(v, list):
            if not v:
                return "[ ]"
            return "[ " + ", ".join(walk(x) for x in v) + " ]"
        return scalar(v)

    return walk(val)


class _Conflict(Exception):
    """mmjsontransform hierarchy conflict — see mmjsontransform()."""


def mmjsontransform(
    df: DataFrame,
    input_col: str = "json",
    output_col: str = "json_transformed",
    mode: str = "unflatten",
    sep: str = ".",
    drop_keys: list[str] | None = None,
    rename_rules: dict[str, str] | None = None,
    render: str = "compact",
) -> DataFrame:
    """Flatten/unflatten dotted JSON keys (ref: plugins/
    mmjsontransform/mmjsontransform.c:63-66 modes; dotted-path
    insert :116-156, flatten :157-192; dropKeys/renameRules applied
    during the rewrite, here on the flat-key representation both
    modes share).

    ``render="spaced"`` emits json-c SPACED text (the reference's
    default subtree/variable render — see _jsonc_dumps); the config
    binding uses it so subtree templates render byte-exact.

    Arrow-batched pandas UDF — a config-rare structural rewrite, not
    a hot-path operator (same policy note as functions.unflatten).
    """
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if render not in ("compact", "spaced"):
        raise ValueError(f"mmjsontransform render {render!r}")
    dump = (_jsonc_dumps if render == "spaced"
            else lambda v: _json.dumps(v, separators=(",", ":")))
    drop = set(drop_keys or ())
    ren = dict(rename_rules or {})

    def _series(s):
        def flatten_obj(obj, prefix=""):
            out = {}
            for k, v in obj.items():
                key = f"{prefix}{sep}{k}" if prefix else str(k)
                if isinstance(v, dict) and v:
                    out.update(flatten_obj(v, key))
                else:
                    out[key] = v
            return out

        def one(txt):
            if txt is None:
                return None
            try:
                val = _json.loads(txt)
            except ValueError:
                return None
            if not isinstance(val, dict):
                return txt
            flat = flatten_obj(val)
            flat = {ren.get(k, k): v for k, v in flat.items()
                    if k not in drop}
            if mode == "flatten":
                return dump(flat)
            # unflatten with the reference's conflict semantics
            # (jsontransformInsertDotted, mmjsontransform.c:1011-1110;
            # doAction:557-565): an empty dotted segment, a scalar in
            # the way of a path, or a leaf collision with unequal
            # values is a HIERARCHY CONFLICT — the output property is
            # never set for that message (the reference LogErrors the
            # detail and aborts the action; golden
            # mmjsontransform-policy-basic.sh phase 4 keeps the
            # malformed '{"a.": ...}' message out of the output).
            # Equal-valued leaf collisions dedupe; object-over-object
            # merges recursively (jsontransformMergeObjects).
            def merge(dst, src):
                for mk, mv in src.items():
                    if mk in dst:
                        if isinstance(dst[mk], dict) \
                                and isinstance(mv, dict):
                            merge(dst[mk], mv)
                        elif dst[mk] != mv:
                            raise _Conflict(mk)
                    else:
                        dst[mk] = mv

            root: dict = {}
            try:
                for k, v in flat.items():
                    parts = str(k).split(sep)
                    if any(p == "" for p in parts):
                        raise _Conflict(k)   # empty segment
                    cur = root
                    for p in parts[:-1]:
                        nxt = cur.get(p)
                        if nxt is None:
                            nxt = {}
                            cur[p] = nxt
                        elif not isinstance(nxt, dict):
                            raise _Conflict(k)   # scalar in the way
                        cur = nxt
                    leaf = parts[-1]
                    if leaf in cur:
                        have = cur[leaf]
                        if isinstance(have, dict) \
                                and isinstance(v, dict):
                            merge(have, v)
                        elif have != v:
                            raise _Conflict(k)
                    else:
                        cur[leaf] = v
            except _Conflict:
                return None
            return dump(root)

        return s.map(one)

    _series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    if mode not in ("flatten", "unflatten"):
        raise ValueError(f"mmjsontransform mode {mode!r}")
    udf = pandas_udf(_series, "string")
    return df.withColumn(output_col, udf(rs_str(F.col(input_col))))

"""Network/number built-ins: ipv42num, num2ipv4, int2hex, b64_decode,
is_in_subnet — all pure integer/bit Column expressions (no UDFs).

ref: doc/source/rainerscript/functions/rs-ip42num.rst, rs-num2ip.rst,
rs-int2hex.rst; fmhash/is_in_subnet per SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import (
    ColumnOrName, memo_column_factory, rs_num, rs_str,
)

_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}"


@memo_column_factory
def ipv42num(ip: ColumnOrName) -> Column:
    """Dotted quad → uint32 (ref rs-ip42num). Invalid input → 0
    (script_error semantics)."""
    s = rs_str(ip)
    parts = F.split(s, r"\.", -1)
    valid = s.rlike(f"^{IPV4_RE}$")
    val = (
        (F.element_at(parts, 1)).try_cast("long") * F.lit(16777216)
        + (F.element_at(parts, 2)).try_cast("long") * F.lit(65536)
        + (F.element_at(parts, 3)).try_cast("long") * F.lit(256)
        + (F.element_at(parts, 4)).try_cast("long")
    )
    return F.when(valid, val).otherwise(F.lit(0)).cast("long")


def _strict_int_ok(s: Column) -> Column:
    """str2num validity as the reference's functions see it: empty
    reads as 0 WITHOUT error, any other non-integer text errors
    (golden rscript_int2Hex.sh: int2hex('')='0' but int2hex('a')=
    'NAN'; rscript_num2ipv4.sh: '2839.' → '-1')."""
    return s.rlike(r"^-?[0-9]*$")


@memo_column_factory
def num2ipv4(n: ColumnOrName) -> Column:
    """uint32 → dotted quad; non-integer input or out-of-range →
    "-1" (ref rs-num2ip; byte-exact golden rscript_num2ipv4.sh)."""
    s = rs_str(n)
    v = rs_num(n)
    octets = F.concat_ws(
        ".",
        (F.shiftright(v, 24).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(v, 16).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(v, 8).bitwiseAND(F.lit(255))).cast("string"),
        (v.bitwiseAND(F.lit(255))).cast("string"),
    )
    return F.when(_strict_int_ok(s) & (v >= 0) & (v <= 4294967295),
                  octets).otherwise(F.lit("-1"))


@memo_column_factory
def int2hex(n: ColumnOrName) -> Column:
    """Integer → lowercase hex string; non-integer input → "NAN"
    (ref rs-int2hex.rst; byte-exact golden rscript_int2Hex.sh,
    incl. int2hex('') = '0')."""
    return F.when(_strict_int_ok(rs_str(n)),
                  F.lower(F.hex(rs_num(n)))).otherwise(F.lit("NAN"))


def b64_decode(s: ColumnOrName) -> Column:
    """Base64 decode → string; invalid input → '' (script_error).
    The decode stops at the first padding like the reference's
    decoder — an early-ended payload ("dGVzdA==dGVzdA==") yields the
    first segment (golden rscript_b64_decode.sh)."""
    head = F.regexp_extract(rs_str(s), r"^([A-Za-z0-9+/]*={0,2})", 1)
    return F.coalesce(
        F.try_to_binary(head, F.lit("base64")).cast("string"),
        F.lit(""))


_H = "[0-9A-Fa-f]{1,4}"
#: anchored full-string IPv6 (the standard 9-alternative form: full
#: 8-group plus every '::' elision arity)
IPV6_RE = (
    rf"(?:{_H}:){{7}}{_H}"
    rf"|(?:{_H}:){{1,7}}:"
    rf"|(?:{_H}:){{1,6}}:{_H}"
    rf"|(?:{_H}:){{1,5}}(?::{_H}){{1,2}}"
    rf"|(?:{_H}:){{1,4}}(?::{_H}){{1,3}}"
    rf"|(?:{_H}:){{1,3}}(?::{_H}){{1,4}}"
    rf"|(?:{_H}:){{1,2}}(?::{_H}){{1,5}}"
    rf"|{_H}:(?::{_H}){{1,6}}"
    rf"|:(?:(?::{_H}){{1,7}}|:)"
)


def _shr(v: Column, bits: Column) -> Column:
    """v >> bits with a COLUMN shift amount (F.shiftright only takes
    a Python int). Exact for v < 2^52: floor-divide by 2^bits."""
    return F.floor(v / F.pow(F.lit(2.0), bits.cast("double"))) \
            .cast("long")


@memo_column_factory
def is_in_subnet(ip: ColumnOrName, cidr: ColumnOrName | str) -> Column:
    """CIDR containment test — IPv4 and IPv6, both arguments may be
    columns (ref: net.c should_use_so_bsdcompat / fmhttp
    is_in_subnet; byte-exact golden rscript_is_in_subnet.sh).

    Never raises: any invalid ip, network, or prefix (garbage text,
    embedded NULs, cross-family compare, /33 on v4) is FALSE, the
    reference's 0-with-script_error. When ``cidr`` is a config
    literal Catalyst constant-folds the whole network side; the
    per-row work is one masked integer compare (v4) or eight 16-bit
    group compares (v6) — no UDFs, no shuffle."""
    from rsyslog_spark.operators.mm import _expand_hex_groups

    s = rs_str(ip)
    cc = F.lit(cidr) if isinstance(cidr, str) else rs_str(cidr)
    net = F.substring_index(cc, "/", 1)
    pfx = F.when(cc.contains("/"),
                 F.substring_index(cc, "/", -1)).try_cast("int")

    v4_ok = (s.rlike(f"^{IPV4_RE}$") & net.rlike(f"^{IPV4_RE}$")
             & pfx.isNotNull() & (pfx >= 0) & (pfx <= 32))
    sh4 = F.lit(32) - pfx
    v4_hit = _shr(ipv42num(s), sh4) == _shr(ipv42num(net), sh4)

    v6_ok = (s.rlike(f"^(?:{IPV6_RE})$") & net.rlike(f"^(?:{IPV6_RE})$")
             & pfx.isNotNull() & (pfx >= 0) & (pfx <= 128))
    gip = _expand_hex_groups(s, 8)
    gnet = _expand_hex_groups(net, 8)
    hits = []
    for i in range(8):
        bits = F.greatest(F.least(pfx - F.lit(16 * i), F.lit(16)),
                          F.lit(0))
        sh = F.lit(16) - bits
        hits.append(_shr(gip[i], sh) == _shr(gnet[i], sh))
    v6_hit = hits[0]
    for h in hits[1:]:
        v6_hit = v6_hit & h

    return F.when(v4_ok, v4_hit).when(v6_ok, v6_hit) \
            .otherwise(F.lit(False))

"""Network/number built-ins: ipv42num, num2ipv4, int2hex, b64_decode,
is_in_subnet — all pure integer/bit Column expressions (no UDFs).

ref: doc/source/rainerscript/functions/rs-ip42num.rst, rs-num2ip.rst,
rs-int2hex.rst; fmhash/is_in_subnet per SURVEY §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_num, rs_str

_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}"


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


def num2ipv4(n: ColumnOrName) -> Column:
    """uint32 → dotted quad; out-of-range → "-1" (ref rs-num2ip)."""
    v = rs_num(n)
    octets = F.concat_ws(
        ".",
        (F.shiftright(v, 24).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(v, 16).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(v, 8).bitwiseAND(F.lit(255))).cast("string"),
        (v.bitwiseAND(F.lit(255))).cast("string"),
    )
    return F.when((v >= 0) & (v <= 4294967295), octets).otherwise(F.lit("-1"))


def int2hex(n: ColumnOrName) -> Column:
    """Integer → lowercase hex string (ref rs-int2hex.rst)."""
    return F.lower(F.hex(rs_num(n)))


def b64_decode(s: ColumnOrName) -> Column:
    """Base64 decode → string; invalid input → '' (script_error).
    The decode stops at the first padding like the reference's
    decoder — an early-ended payload ("dGVzdA==dGVzdA==") yields the
    first segment (golden rscript_b64_decode.sh)."""
    head = F.regexp_extract(rs_str(s), r"^([A-Za-z0-9+/]*={0,2})", 1)
    return F.coalesce(
        F.try_to_binary(head, F.lit("base64")).cast("string"),
        F.lit(""))


def is_in_subnet(ip: ColumnOrName, cidr: str) -> Column:
    """CIDR containment test, compiled to a mask compare at plan time.

    The network address and prefix are parsed in Python (config-load
    time, like the reference's function initFunc); the per-row work is
    one subtraction-free integer compare.
    """
    net, _, prefix_s = cidr.partition("/")
    prefix = int(prefix_s) if prefix_s else 32
    if not 0 <= prefix <= 32:
        raise ValueError(f"bad prefix in {cidr!r}")
    octets = [int(o) for o in net.split(".")]
    if len(octets) != 4 or any(not 0 <= o <= 255 for o in octets):
        raise ValueError(f"bad network in {cidr!r}")
    net_num = (octets[0] << 24) | (octets[1] << 16) | (octets[2] << 8) | octets[3]
    shift = 32 - prefix
    want = net_num >> shift
    s = rs_str(ip)
    return s.rlike(f"^{IPV4_RE}$") & (
        F.shiftright(ipv42num(s), shift) == F.lit(want)
    )

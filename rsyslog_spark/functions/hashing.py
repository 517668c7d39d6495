"""fmhash built-ins: hash32/hash64[mod] (ref: contrib/fmhash/fmhash.c:350-356).

The reference uses xxHash. Spark ships xxHash64 natively (`xxhash64`),
which we use for hash64 — exact same family, JVM-side, codegen'd. For
hash32 we derive a stable 32-bit value from xxhash64 (the reference's
hash32 is xxH32; bit-identical parity is NOT claimed — the contract we
preserve is "stable well-distributed hash of the string", which is what
configs use it for: sharding, sampling, bucketing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_str


def hash64(*cols: ColumnOrName) -> Column:
    return F.xxhash64(*[rs_str(c) for c in cols])


def hash64mod(mod: int, *cols: ColumnOrName) -> Column:
    return F.pmod(hash64(*cols), F.lit(mod))


def hash32(*cols: ColumnOrName) -> Column:
    return F.pmod(F.xxhash64(*[rs_str(c) for c in cols]),
                  F.lit(4294967296)).cast("long")


def hash32mod(mod: int, *cols: ColumnOrName) -> Column:
    return F.pmod(hash32(*cols), F.lit(mod))


def hmac_sha256(key: bytes, c: ColumnOrName) -> Column:
    """HMAC-SHA256 of a string column (ref: contrib/mmrfc5424addhmac —
    the reference appends an HMAC SD-element to RFC5424 messages).

    Arrow-batched pandas UDF (Python hmac/hashlib): HMAC's ipad/opad
    byte-XOR construction has no Column-expression equivalent, so this
    is a flagged slow-path — batched, not per-row Python.
    """
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _hmac(s: "pd.Series") -> "pd.Series":
        import hashlib
        import hmac as hmac_mod

        return s.map(
            lambda v: hmac_mod.new(
                key, (v or "").encode("utf-8"), hashlib.sha256
            ).hexdigest()
        )

    return _hmac(rs_str(c))

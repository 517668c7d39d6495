"""Property-based check of the RainerScript coercion layer.

The reference's comparison semantics (grammar/rainerscript.c:
3839-3960): try numeric first — if BOTH sides convert to integers,
compare numerically; otherwise compare as strings, with missing
values reading as empty string / 0. ``rs_cmp`` must reproduce this
for arbitrary inputs, not just the fixtures — hypothesis generates
the cases, a pure-Python model supplies the expected truth, and one
Spark job evaluates a whole batch of cases at once.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from rsyslog_spark.expr import rs_cmp

_INT_RE = re.compile(r"^[+-]?\d+$")
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1

OPS = ["==", "!=", "<", "<=", ">", ">="]
_PY_OPS = {
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
}


def _to_long(v):
    """Model of Spark try_cast(string->long) over rs inputs: trimmed
    optional-sign integers within int64; anything else is NULL."""
    if v is None:
        return None
    s = str(v).strip()
    if not _INT_RE.match(s):
        return None
    n = int(s)
    return n if _I64_MIN <= n <= _I64_MAX else None


def model_cmp(l, r, op):
    ln, rn = _to_long(l), _to_long(r)
    if ln is not None and rn is not None:
        return _PY_OPS[op](ln, rn)
    ls = "" if l is None else str(l)
    rs = "" if r is None else str(r)
    return _PY_OPS[op](ls, rs)


# values that stress the numeric/string boundary: ints, int-strings
# with whitespace/sign, overflow, floats-as-strings (NOT numeric for
# the long cast), plain words, empties, None
_value = st.one_of(
    st.integers(min_value=-(1 << 64), max_value=1 << 64),
    st.integers(-5, 5).map(str),
    st.integers(-5, 5).map(lambda n: f"  {n} "),
    st.sampled_from(["+7", "-0", "007", "1.5", "1e3", "", " ", "abc",
                     "abc1", "10abc", "0x10", "9223372036854775808",
                     "-9223372036854775809", None]),
    st.text(alphabet="abz019 +-", max_size=6),
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cases=st.lists(st.tuples(_value, _value, st.sampled_from(OPS)),
                      min_size=40, max_size=60))
def test_rs_cmp_matches_reference_model(spark, cases):
    rows = [(str(l) if l is not None else None,
             str(r) if r is not None else None, op)
            for l, r, op in cases]
    df = spark.createDataFrame(rows, "l string, r string, op string")
    out = df.select(
        "l", "r", "op",
        *[rs_cmp(F.col("l"), F.col("r"), op).alias(f"c_{i}")
          for i, op in enumerate(OPS)],
    ).collect()
    for row in out:
        for i, op in enumerate(OPS):
            want = model_cmp(row["l"], row["r"], op)
            got = row[f"c_{i}"]
            assert got == want, (
                f"rs_cmp({row['l']!r}, {row['r']!r}, {op!r}) = "
                f"{got}, reference model says {want}")

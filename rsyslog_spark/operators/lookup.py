"""Lookup tables — the engine's enrichment joins.

The reference supports four lookup-table types (ref: runtime/lookup.h:
26-28,103; runtime/lookup.c; doc/source/configuration/lookup_tables.rst:
20-140): string (exact hash), array (dense int index), sparseArray
(first index <= key — an as-of/range join), regex (first matching
pattern wins). All are file-backed, reloadable, with a ``nomatch``
default.

Spark strategy, sized for 100 TB fact sides:
- Lookup tables are dimension-sized (config files). We compile them to
  **literal map expressions** when small (pure codegen, zero shuffle,
  no broadcast round-trip) and to **broadcast hash/range joins** when
  given as DataFrames. Either way the fact side never shuffles.
- sparseArray becomes a broadcast range join (value BETWEEN lo AND hi),
  which Spark executes as BroadcastNestedLoopJoin over the tiny dim —
  at dim sizes lookup tables have (<= thousands of entries) this is
  the right physical plan; for large dims use a sort-merge as-of.
- regex type compiles to an ordered CASE/when chain (first match wins),
  exactly the reference's scan order.
- ``reload_lookup_table`` ≈ rebuilding the plan with a fresh dim
  (stream-static joins re-read the static side per micro-batch).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, _c, rs_num, rs_str


@dataclass
class LookupTable:
    """Parsed lookup table (reference JSON file format,
    lookup_tables.rst:75-140)."""

    type: str                      # string | array | sparseArray | regex
    nomatch: str = ""
    entries: list[tuple] = field(default_factory=list)  # (index, value)

    @classmethod
    def from_json_file(cls, path: str) -> "LookupTable":
        """Bad table FILES (empty, invalid JSON, rows missing the
        index key) degrade to an EMPTY table — every lookup returns
        nomatch — instead of failing the config (lookup.c
        lookupReadFile error path; golden lookup_table_bad_configs.sh
        phases: empty/invalid-json/no-index tables serve no foo/bar/
        baz values while the daemon keeps running)."""
        import warnings
        with open(path) as fh:   # missing file still raises (the
            text = fh.read()     # stub-mode trigger, load_config)
        try:
            return cls.from_dict(json.loads(text))
        except (ValueError, KeyError, TypeError) as e:
            warnings.warn(
                f"lookup table file {path!r} could not be loaded "
                f"({e!r:.120}) - table is empty")
            return cls(type="string")

    @classmethod
    def from_dict(cls, doc: dict) -> "LookupTable":
        typ = doc.get("type", "string")
        entries = []
        for row in doc.get("table", []):
            if typ == "regex":
                entries.append((row["regex"], row.get("tag", row.get("value", ""))))
            else:
                entries.append((row["index"], row["value"]))
        return cls(type=typ, nomatch=doc.get("nomatch", ""), entries=entries)

    # ------------------------------------------------------------------
    def lookup(self, key: ColumnOrName) -> Column:
        """lookup(table, key) → value Column (ref lookup.c lookupKey_*)."""
        if self.type == "string":
            return self._lookup_string(key)
        if self.type == "array":
            return self._lookup_array(key)
        if self.type == "sparseArray":
            return self._lookup_sparse(key)
        if self.type == "regex":
            return self._lookup_regex(key)
        raise ValueError(f"unknown lookup table type {self.type!r}")

    def _lookup_string(self, key: ColumnOrName) -> Column:
        # literal map → Catalyst folds to a hash probe per row, no join
        if not self.entries:
            return F.lit(self.nomatch)
        pairs: list[Column] = []
        for k, v in self.entries:
            pairs.append(F.lit(str(k)))
            pairs.append(F.lit(str(v)))
        m = F.create_map(*pairs)
        return F.coalesce(F.element_at(m, rs_str(key)), F.lit(self.nomatch))

    def _lookup_array(self, key: ColumnOrName) -> Column:
        # dense uint index: element_at over a literal array, offset by
        # the first index (ref lookupKey_arr direct indexing)
        if not self.entries:
            return F.lit(self.nomatch)
        idxs = sorted(int(k) for k, _ in self.entries)
        first, last = idxs[0], idxs[-1]
        by_idx = {int(k): str(v) for k, v in self.entries}
        values = F.array(*[F.lit(by_idx.get(i, self.nomatch))
                           for i in range(first, last + 1)])
        k = rs_num(key)
        return F.when(
            (k >= first) & (k <= last),
            F.element_at(values, (k - F.lit(first) + 1).cast("int")),
        ).otherwise(F.lit(self.nomatch))

    def _lookup_sparse(self, key: ColumnOrName) -> Column:
        """First index <= key (as-of semantics, ref lookupKey_sparseArr
        binary search). Compiled to a descending when-chain for literal
        tables; use sparse_lookup_join for DataFrame-sized tables."""
        if not self.entries:
            return F.lit(self.nomatch)
        k = rs_num(key)
        expr: Column = F.lit(self.nomatch)
        for idx, val in sorted(((int(i), str(v)) for i, v in self.entries)):
            # ascending order: later (larger) thresholds override
            expr = F.when(k >= idx, F.lit(val)).otherwise(expr)
        return expr

    def _lookup_regex(self, key: ColumnOrName) -> Column:
        """First matching pattern wins (ref lookupKey_re scan order)."""
        s = rs_str(key)
        expr: Column = F.lit(self.nomatch)
        for pat, val in reversed(self.entries):
            expr = F.when(s.rlike(str(pat)), F.lit(val)).otherwise(expr)
        return expr


def lookup_join(
    df: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    value_cols: list[str] | None = None,
    nomatch: str | None = None,
) -> DataFrame:
    """string-type lookup as an explicit **broadcast** equi-join, for
    dims too big to inline as literals. The fact side (df) does not
    shuffle; at 100 TB this is the only acceptable plan for
    dimension enrichment."""
    value_cols = value_cols or [c for c in dim.columns if c != dim_key]
    joined = df.join(F.broadcast(dim), df[key] == dim[dim_key], "left")
    # drop by COLUMN, not name: when fact and dim share the key name,
    # drop("name") would remove the fact side's key too
    out = joined.drop(dim[dim_key])
    if nomatch is not None:
        for c in value_cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(nomatch)))
    return out


def sparse_lookup_join(
    df: DataFrame,
    dim: DataFrame,
    key: str,
    dim_lo: str,
    dim_hi: str | None = None,
    value_col: str = "value",
    nomatch: str | None = None,
) -> DataFrame:
    """sparseArray lookup as a broadcast **range join**: first dim row
    with lo <= key (< hi). Pre-compute hi = lead(lo) when absent so the
    join predicate is a closed interval and each fact row matches at
    most one dim row (no post-aggregation needed).

    Physical plan: BroadcastNestedLoopJoin — fine for config-sized
    dims; for large dims switch to a sort-merge as-of (sort both on
    the key and merge per partition).
    """
    from pyspark.sql import Window

    if dim_hi is None:
        w = Window.orderBy(F.col(dim_lo))
        dim = dim.withColumn(
            "__hi", F.lead(dim_lo).over(w)
        )
        dim_hi = "__hi"
    cond = (df[key] >= dim[dim_lo]) & (
        dim[dim_hi].isNull() | (df[key] < dim[dim_hi])
    )
    joined = df.join(F.broadcast(dim), cond, "left").drop(dim_lo, dim_hi)
    if nomatch is not None:
        joined = joined.withColumn(
            value_col, F.coalesce(F.col(value_col), F.lit(nomatch))
        )
    return joined


def geoip_range_join(
    df: DataFrame,
    ip_col: str,
    ranges: DataFrame,
    *,
    lo_col: str = "range_lo",
    hi_col: str = "range_hi",
    how: str = "left",
) -> DataFrame:
    """mmdblookup analog (ref: plugins/mmdblookup/mmdblookup.c): enrich
    rows whose IP falls in [range_lo, range_hi] from a GeoIP-style
    range table.

    The fact side converts the dotted quad to an int (pure expression)
    and joins BETWEEN against the broadcast dim. Spark executes this as
    BroadcastNestedLoopJoin — correct for MaxMind-sized dims on a
    100 TB fact side because the fact never shuffles. If the dim out-
    grows broadcast, pre-bucket both sides by ip >> 16 and equi-join
    on the bucket before the range predicate (turns NLJ into hash join).
    """
    from rsyslog_spark.functions.net import ipv42num

    fact = df.withColumn("_ipnum", ipv42num(ip_col))
    cond = (F.col("_ipnum") >= ranges[lo_col]) & (F.col("_ipnum") <= ranges[hi_col])
    return fact.join(F.broadcast(ranges), cond, how).drop("_ipnum")


def salted_join(
    df: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side's key into
    ``salt_buckets`` shards and replicate the right side per shard, so
    one hot key spreads across ``salt_buckets`` tasks instead of
    pinning a single reducer.

    AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles
    most cases at runtime; explicit salting remains for (a) streaming
    joins where AQE does not apply and (b) deterministic layouts for
    repeated pipelines. Cost: right side is duplicated salt_buckets×,
    so use it for dimension-sized right sides only — for fact-fact
    skew prefer AQE.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                  F.lit(salt_buckets)).cast("int")
    left = df.withColumn("__salt", salt)
    rep = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return left.join(rep, on=[key, "__salt"], how=how).drop("__salt")

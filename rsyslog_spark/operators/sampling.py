"""Deterministic sampling & data-mixing operators for training-data
pipelines.

Training corpora are sampled by STABLE KEY, not by Bernoulli draw —
re-running the pipeline (or running it on another engine) must pick
the same documents, holdout membership must be derivable from the id
alone, and per-domain mixing rates must hold exactly under
repartitioning. All operators here are pure column expressions over a
key hash: no RNG state, no driver coordination, embarrassingly
parallel at any scale.

Two hash families:

* ``hash_sample`` — xxhash64(key, seed): the production path (64-bit
  avalanche, same family the dedup operators use).
* ``*_portable`` — Knuth multiplicative hashing over integer keys
  ((key*2654435761 + seed) mod 2^32): bit-identical in any engine
  with 64-bit integer arithmetic (DuckDB, Trino, BigQuery), which is
  what makes the driver's cross-engine oracle possible. Weaker
  avalanche than xxhash64 — fine for rate control, not for
  adversarial keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761       # golden-ratio multiplier, fits uint32
_MOD = 1 << 32


def _portable_unit(key: Column, seed: int) -> Column:
    """Map an integer key to [0, 1) identically in any 64-bit-int
    engine: ((key * 2654435761 + seed) mod 2^32) / 2^32."""
    return (((key.cast("long") * _KNUTH + seed) % _MOD + _MOD) % _MOD) \
        / F.lit(float(_MOD))


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                seed: int = 0) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash.

    Same key → same verdict across runs, partitions, and engines
    sharing xxhash64. Use for holdout splits and corpus downsampling
    where membership must be reproducible.
    """
    u = (F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                F.lit(_MOD))) / F.lit(float(_MOD))
    return df.filter(u < fraction)


def hash_sample_portable(df: DataFrame, key_col: str, fraction: float,
                         seed: int = 0) -> DataFrame:
    """`hash_sample` with the engine-portable multiplicative hash
    (integer keys only)."""
    return df.filter(_portable_unit(F.col(key_col), seed) < fraction)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float],
    key_col: str, *, default_fraction: float = 0.0, seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 100% of books, 30% of web, 5% of logs).

    ``fractions`` maps stratum value → keep rate; unlisted strata get
    ``default_fraction``. The rate lookup is a broadcast-free CASE
    chain (strata counts are small by definition); the keep decision
    is the same per-key hash as :func:`hash_sample`, so a document
    keeps/drops identically regardless of which strata split it lands
    in — mixing rates compose with dedup and sharding.
    """
    rate: Column = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))) \
                .otherwise(rate)
    if portable:
        u = _portable_unit(F.col(key_col), seed)
    else:
        u = (F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                    F.lit(_MOD))) / F.lit(float(_MOD))
    return df.filter(u < rate)


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float = 0.01,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout) split by key hash — disjoint and exhaustive,
    stable under re-runs; the pattern for decontaminating eval sets
    from training corpora."""
    u = (F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                F.lit(_MOD))) / F.lit(float(_MOD))
    return df.filter(u >= holdout_fraction), df.filter(u < holdout_fraction)


def pack_sequences(
    df: DataFrame, id_col: str, token_count: Column, *,
    window_tokens: int, shard_col: str | None = None,
) -> DataFrame:
    """Sequence packing for training: concatenate documents in
    deterministic ``id_col`` order and cut fixed-size context windows
    of ``window_tokens`` — the GPT-style "packed sequences" layout
    where document boundaries may cross window edges.

    Each doc gets ``bin_id = floor((cumsum - tokens) / window)`` — the
    window its FIRST token lands in — plus its token offset within
    the global stream. The window function partitions by
    ``shard_col`` (pack per shard); passing None packs one global
    stream, which serializes the scan through a single partition —
    always shard at scale (the per-shard layout is also what data
    loaders consume).
    """
    from pyspark.sql import Window

    part = (Window.partitionBy(shard_col) if shard_col
            else Window.partitionBy())
    w = part.orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, 0)
    cum = F.sum(token_count).over(w)
    start = (cum - token_count).cast("long")
    out = [F.col(c) for c in df.columns]
    return df.select(
        *out,
        token_count.cast("long").alias("n_tokens"),
        start.alias("token_offset"),
        F.floor(start / window_tokens).cast("long").alias("bin_id"),
    )

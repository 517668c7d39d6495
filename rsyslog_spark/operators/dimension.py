"""Stream-static dimension enrichment: mmkubernetes and dnscache.

mmkubernetes (ref: contrib/mmkubernetes/mmkubernetes.c, 2058 LoC)
enriches messages with pod metadata fetched from the k8s API and
cached with a TTL. The Spark shape is a broadcast **stream-static
join** against a dimension DataFrame that a loader callable refreshes
when stale — re-resolved per micro-batch via ``refreshing_dim_join``.

dnscache (ref: runtime/dnscache.c) is the same pattern with a
resolver: reverse-DNS results become a (ip, hostname) dimension built
from the distinct IPs in the batch, resolved through an injected
callable (production: socket.gethostbyaddr; default: deterministic
fake, clearly flagged — this container has no DNS).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RefreshingDim:
    """TTL-cached dimension table (mmkubernetes cache semantics:
    entries live until the TTL forces a re-fetch).

    ``loader(spark) -> DataFrame`` is called at most once per
    ``ttl_seconds``; between refreshes every ``get`` returns the same
    cached (and persisted) DataFrame, so repeated micro-batches reuse
    the broadcast.
    """

    def __init__(self, loader: Callable[[SparkSession], DataFrame],
                 ttl_seconds: float = 60.0):
        self.loader = loader
        self.ttl = ttl_seconds
        self._df: DataFrame | None = None
        self._loaded_at = 0.0

    def get(self, spark: SparkSession) -> DataFrame:
        now = time.monotonic()
        if self._df is None or now - self._loaded_at > self.ttl:
            if self._df is not None:
                self._df.unpersist()
            self._df = self.loader(spark).persist()
            self._loaded_at = now
        return self._df

    def invalidate(self) -> None:
        if self._df is not None:
            self._df.unpersist()
            self._df = None


def refreshing_dim_join(
    df: DataFrame,
    dim: RefreshingDim,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast stream-static join against a TTL-refreshed dimension
    (mmkubernetes pod-metadata enrich). Call inside foreachBatch for
    per-batch refresh, or once at plan build for static dims."""
    d = dim.get(df.sparkSession)
    return df.join(F.broadcast(d), on=on, how=how)


def _fake_resolver(ips: list[str]) -> list[str | None]:
    """Deterministic stand-in for reverse DNS (no DNS in this
    container — STUB, flagged): host-<last octet>.example."""
    out: list[str | None] = []
    for ip in ips:
        parts = (ip or "").rsplit(".", 1)
        out.append(f"host-{parts[-1]}.example" if len(parts) == 2 else None)
    return out


def dnscache_enrich(
    df: DataFrame,
    ip_col: str = "fromhost_ip",
    out_col: str = "fromhost",
    resolver: Callable[[list[str]], list[str | None]] | None = None,
    max_batch: int = 10_000,
    max_cardinality: int | None = None,
) -> DataFrame:
    """Reverse-DNS enrich with a cache (ref: runtime/dnscache.c).

    Distinct IPs in the frame are resolved ONCE through ``resolver``
    (batched list-in/list-out) and joined back — the cache is the
    dimension itself, so a million rows from one sender cost one
    resolution, same as the reference's hash-table cache.

    The dimension never touches the driver: one partial-agg shuffle
    of 4-16-byte keys builds the distinct set, resolution runs
    EXECUTOR-side over Arrow batches (mapInPandas), and the join back
    is a plain equi-join — AQE turns it into a broadcast join when
    the resolved dim is small, and falls back to a shuffle join for
    the IPv6-spray / DDoS-log cardinalities where a broadcast (or the
    old driver-side collect) would OOM. ``max_cardinality`` caps
    resolution like the reference cache's entry bound: only the first
    N distinct IPs (sorted — deterministic) resolve, the overflow
    passes through with ``out_col`` untouched.
    """
    resolver = resolver or _fake_resolver

    ips = (df.select(F.col(ip_col))
           .where(F.col(ip_col).isNotNull()).distinct())
    if max_cardinality is not None:
        # deterministic cap (an unordered limit() would resolve an
        # arbitrary subset, varying run to run)
        ips = ips.orderBy(ip_col).limit(max_cardinality)

    def resolve_batches(batches):
        import pandas as pd

        for pdf in batches:
            vals = pdf[ip_col].tolist()
            names: list = []
            for off in range(0, len(vals), max_batch):
                names.extend(resolver(vals[off:off + max_batch]))
            yield pd.DataFrame({ip_col: vals, "__resolved": names})

    dim = ips.mapInPandas(resolve_batches,
                          f"{ip_col} string, __resolved string")
    joined = df.join(dim, on=ip_col, how="left")
    return joined.withColumn(
        out_col, F.coalesce(F.col("__resolved"), F.col(out_col))
    ).drop("__resolved")

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
) -> DataFrame:
    """Reverse-DNS enrich with a cache (ref: runtime/dnscache.c).

    Distinct IPs in the frame are resolved ONCE through ``resolver``
    (batched list-in/list-out) and joined back broadcast — the cache
    is the dimension itself, so a million rows from one sender cost
    one resolution, same as the reference's hash-table cache.
    """
    resolver = resolver or _fake_resolver
    spark = df.sparkSession
    # deterministic batching: resolve ALL distinct IPs in max_batch
    # chunks (an unordered limit() would resolve an arbitrary subset
    # and leave the rest silently unresolved, varying run to run)
    distinct_ips = sorted(
        r[0] for r in df.select(ip_col).distinct().collect()
        if r[0] is not None)
    names = []
    for off in range(0, len(distinct_ips), max_batch):
        names.extend(resolver(distinct_ips[off:off + max_batch]))
    dim = spark.createDataFrame(
        list(zip(distinct_ips, names)) or [(None, None)],
        f"{ip_col} string, __resolved string",
    )
    joined = df.join(F.broadcast(dim), on=ip_col, how="left")
    return joined.withColumn(
        out_col, F.coalesce(F.col("__resolved"), F.col(out_col))
    ).drop("__resolved")

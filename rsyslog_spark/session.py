"""SparkSession factory with engine defaults.

Scale notes (100 TB target): AQE on (runtime coalesce + skew-join
splitting), UTC session timezone for deterministic timestamp semantics,
Arrow enabled for the few Pandas-UDF escape hatches. Shuffle-partition
default is sized for local tests; on a real cluster set
``spark.sql.shuffle.partitions`` ≈ 2-3× total cores (AQE coalesces the
tail) and raise ``maxPartitionBytes`` for wide parquet scans.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


#: Every module-level memo of JVM-backed Column trees registers here.
#: Convention: each entry is a dict whose keys are tuples whose FIRST
#: element is the owning applicationId (what session_cache_key
#: returned when the entry was written). Entries keyed by a dead
#: application pin py4j references into a stopped gateway for the
#: life of the process — harmless in one-shot jobs, a leak in a
#: long-lived multi-session driver — so they are swept as soon as a
#: DIFFERENT application becomes active (see session_cache_key).
_SESSION_CACHES: list[dict] = []
_ACTIVE_APP_ID: list = [None]


def register_session_cache(cache: dict) -> dict:
    """Register a session-keyed Column memo for stale-entry sweeping.

    Returns the dict unchanged so modules can write
    ``_MY_CACHE = register_session_cache({})``.
    """
    _SESSION_CACHES.append(cache)
    return cache


def _sweep_session_caches(live_app_id: str) -> None:
    """Drop every registered memo entry owned by an application other
    than ``live_app_id`` (their Columns resolve against a dead py4j
    gateway and can never be read again)."""
    for cache in _SESSION_CACHES:
        stale = [k for k in cache
                 if not (isinstance(k, tuple) and k and
                         k[0] == live_app_id)]
        for k in stale:
            del cache[k]


def session_cache_key() -> str | None:
    """Cache-key component for memoized JVM-backed Column trees.

    Module-level caches of Columns go stale when the backing JVM
    restarts (a Column holds a Py4J reference into one gateway).
    Keying entries by the active context's applicationId makes a
    restarted session miss cleanly instead of resolving against a
    dead gateway. Returns None (→ don't cache) when no session is
    active on this thread.

    A change of applicationId also triggers a one-time sweep of every
    registered memo (register_session_cache): entries owned by the
    previous application are unreachable by key and would otherwise
    pin their Column/py4j references for the life of the process.
    """
    s = SparkSession.getActiveSession()
    if s is None:
        return None
    try:
        app_id = s.sparkContext.applicationId
    except Exception:  # context already stopped
        return None
    if app_id != _ACTIVE_APP_ID[0]:
        _sweep_session_caches(app_id)
        _ACTIVE_APP_ID[0] = app_id
    return app_id


def get_spark(
    app_name: str = "rsyslog_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Local test mode: ``local[$SPARK_GRAFT_CPUS or *]``. On a cluster,
    pass ``master=None`` with a pre-configured environment and only the
    semantic confs below apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Syslog timestamps (RFC3164 "Mar  1 01:00:00") need lenient parsing.
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # driver testdata events.parquet carries TIMESTAMP(NANOS)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def write_bucketed(
    df,
    table: str,
    key: str,
    buckets: int,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table — the
    co-located-join layout for fact-to-fact joins at 100 TB.

    Two tables bucketed on their join keys with the SAME bucket count
    sort-merge join with NO Exchange on either side (and with
    ``sort=True`` no per-task Sort either): the shuffle that would
    dominate a fact⋈fact join at scale is paid ONCE at write time and
    amortized over every subsequent join/groupBy on the key.
    Spark-native bucketing (``bucketBy``) requires a catalog table —
    hence saveAsTable, not a bare path.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


# global(localhostname="...") — overrides the OS hostname everywhere
# the engine stamps/falls back to the local host ($myhostname,
# receiver-stamp fallbacks, mmtaghostname forcelocalhostname — ref:
# runtime/glbl.c LocalHostName; golden mmtaghostname_server.sh)
_LOCAL_HOSTNAME: list = [None]
# $PreserveFQDN (glbl.c:81 bPreserveFQDN, default 0): locally-stamped
# hostnames use the SHORT name (the FQDN up to the first dot,
# tools/rsyslogd.c queryLocalHostname) unless preservefqdn is on
_PRESERVE_FQDN: list = [False]


#: faketime analog — the reference's timing goldens run the daemon
#: under libfaketime (tests/faketime_common.sh, FAKETIME='2017-03-08
#: 14:23:51'); pinning the engine's reception clock reproduces them
#: byte-exact ($year/$month/$day, timegenerated, rfc3164 year
#: inference). The string is interpreted in the SESSION timezone,
#: exactly like FAKETIME is interpreted in the daemon's TZ.
_FAKE_NOW: list = [None]


def set_fake_now(ts: str | None) -> None:
    _FAKE_NOW[0] = ts or None


def fake_now_key() -> str | None:
    """Current fake-now value, for memo-cache keys of Column trees
    that bake now_col() in (parsers.chain layer cache)."""
    return _FAKE_NOW[0]


def now_col():
    """The engine's 'now': ``current_timestamp()`` normally, the
    pinned faketime instant when set (session-tz wall clock, like
    the daemon's localtime under TZ=...)."""
    from pyspark.sql import functions as F

    if _FAKE_NOW[0] is None:
        return F.current_timestamp()
    return F.to_timestamp(F.lit(_FAKE_NOW[0]))


def set_local_hostname(name: str | None) -> None:
    _LOCAL_HOSTNAME[0] = name or None


def set_preserve_fqdn(on: bool) -> None:
    _PRESERVE_FQDN[0] = bool(on)


def local_fqdn() -> str:
    """The unstripped locally-resolved name (glbl LocalFQDNName)."""
    import socket
    # gethostname() returning "" has been seen in practice; the
    # reference hardcodes this fallback (net.c getLocalHostname;
    # golden empty-hostname.sh)
    return socket.gethostname() or "localhost-empty-hostname"


def local_domain() -> str:
    """Everything after the first dot of the FQDN (glbl LocalDomain,
    '' when the name is unqualified)."""
    fq = local_fqdn()
    return fq.split(".", 1)[1] if "." in fq else ""


def local_hostname() -> str:
    """glblGetLocalHostName (glbl.c:888): the $LocalHostName override
    wins; otherwise the FQDN with PreserveFQDN on, the domain-stripped
    short name by default."""
    if _LOCAL_HOSTNAME[0]:
        return _LOCAL_HOSTNAME[0]
    fq = local_fqdn()
    return fq if _PRESERVE_FQDN[0] else fq.split(".", 1)[0]

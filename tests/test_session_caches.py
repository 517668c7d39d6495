"""Dead-session sweep of the module-level Column memo caches.

r11 ADVICE: memo caches keyed by applicationId were unbounded — an
entry written under a stopped SparkContext's applicationId could never
be read again (its key can't be produced by a live session) but pinned
its JVM-backed Column/py4j references for the life of the process.
Every registered cache is now swept when a DIFFERENT application
becomes active (rsyslog_spark.session.session_cache_key).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark import session as sess
from rsyslog_spark.expr import _PRIFILT_CACHE, memo_column_factory, prifilt


def test_sweep_drops_dead_session_entries_keeps_live(spark):
    # live entry under the real applicationId
    prifilt("mail.info")
    sk = sess.session_cache_key()
    assert sk is not None
    live = [k for k in _PRIFILT_CACHE if k[0] == sk]
    assert live, "prifilt should have memoized under the live appId"

    # fake entries owned by a stopped application, in two different
    # registered caches (prifilt + a fresh memo_column_factory)
    dead_key = ("application_dead_0000", "kern.*",
                "syslogfacility", "syslogseverity")
    _PRIFILT_CACHE[dead_key] = F.lit(True)

    calls = []

    @memo_column_factory
    def fake_factory(x: int):
        calls.append(x)
        return F.lit(x)

    fake_factory(7)   # live entry
    fcache = sess._SESSION_CACHES[-1]
    fcache[("application_dead_0000", ("v", 9))] = (F.lit(9), (9,), {})

    # simulate "a new application became active": the sweep fires on
    # the first session_cache_key() call whose appId differs from the
    # last one seen
    sess._ACTIVE_APP_ID[0] = None
    assert sess.session_cache_key() == sk

    assert dead_key not in _PRIFILT_CACHE
    assert all(k[0] == sk for k in _PRIFILT_CACHE)
    assert all(k[0] == sk for k in fcache)
    # live entries survived: the memoized factory still hits
    n_calls = len(calls)
    fake_factory(7)
    assert len(calls) == n_calls, "live memo entry should still hit"


def test_registered_caches_all_conform(spark):
    """Every registered cache holds only tuple keys led by an appId
    string — the convention the sweep relies on."""
    prifilt("auth.err")   # populate at least one
    for cache in sess._SESSION_CACHES:
        for k in cache:
            assert isinstance(k, tuple) and k, k
            assert isinstance(k[0], str), k

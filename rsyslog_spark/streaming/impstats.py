"""impstats: periodic engine counters (ref: plugins/impstats, 1915 LoC
— queue depths, action counts, resource usage emitted as log lines).

Spark shape: a StreamingQueryListener collecting per-batch progress
(rows/sec, batch duration, state-store size) — the same counters the
reference exposes, sourced from the engine instead of hand-maintained
atomics. Pair with ``df.observe()`` for per-operator row counts.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class ImpstatsListener(StreamingQueryListener):
    """Collects micro-batch progress events as impstats-style dicts.

    ``stats`` grows one entry per completed batch:
    {name, batch_id, input_rows, rows_per_sec, duration_ms, state_rows}.
    Attach with ``spark.streams.addListener(listener)``; emit to a log
    sink or metrics system from a timer, as impstats does with its
    interval setting.
    """

    def __init__(self) -> None:
        self.stats: list[dict[str, Any]] = []
        self._queue = {"size": 0, "enqueued": 0, "full": 0,
                       "discarded.full": 0, "discarded.nf": 0,
                       "maxqsize": 0}

    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        self.stats.append({"event": "started", "id": str(event.id),
                           "name": event.name})

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        state_rows = 0
        state_mem = 0
        try:
            for so in p.stateOperators:
                state_rows += so.numRowsTotal
                state_mem += getattr(so, "memoryUsedBytes", 0) or 0
        except Exception:  # noqa: BLE001 — shape varies by query type
            pass
        rec = {
            "event": "progress",
            "name": p.name,
            "batch_id": p.batchId,
            "input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": state_rows,
            "state_memory_bytes": state_mem,
        }
        self.stats.append(rec)
        # queue-gauge analog (ref: runtime/queue.c statsobj counter
        # set size/enqueued/maxqsize): the micro-batch engine's
        # "main Q" is the pending-input window — size = this batch's
        # rows in flight, enqueued = cumulative rows, maxqsize = the
        # largest batch seen. full/discarded stay 0: Spark
        # backpressures instead of dropping.
        q = self._queue
        q["enqueued"] += int(p.numInputRows or 0)
        q["size"] = int(p.numInputRows or 0)
        q["maxqsize"] = max(q["maxqsize"], q["size"])

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        self.stats.append({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def queue_line(self, name: str = "main Q") -> str:
        """The queue statsobj in legacy line form (runtime/queue.c:
        4013-4043 counter set — size/enqueued/full/discarded.full/
        discarded.nf/maxqsize). full/discarded are structurally 0
        here: Spark's micro-batch engine backpressures the source
        instead of dropping at a bounded queue."""
        q = self._queue
        kv = " ".join(f"{k}={q[k]}" for k in (
            "size", "enqueued", "full", "discarded.full",
            "discarded.nf", "maxqsize"))
        return f"{name}: origin=core.queue {kv}"

    @staticmethod
    def resource_usage_line() -> str:
        """The impstats resource-usage statsobj (plugins/impstats/
        impstats.c:680-700: utime/stime in usec, maxrss, minflt,
        majflt, inblock, oublock, nvcsw, nivcsw, openfiles) from
        getrusage + /proc/self/fd, in the legacy line form."""
        import os
        import resource

        ru = resource.getrusage(resource.RUSAGE_SELF)
        try:
            openfiles = len(os.listdir("/proc/self/fd"))
        except OSError:
            openfiles = 0
        vals = {
            "utime": int(ru.ru_utime * 1_000_000),
            "stime": int(ru.ru_stime * 1_000_000),
            "maxrss": int(ru.ru_maxrss),
            "minflt": int(ru.ru_minflt),
            "majflt": int(ru.ru_majflt),
            "inblock": int(ru.ru_inblock),
            "oublock": int(ru.ru_oublock),
            "nvcsw": int(ru.ru_nvcsw),
            "nivcsw": int(ru.ru_nivcsw),
            "openfiles": openfiles,
        }
        kv = " ".join(f"{k}={v}" for k, v in vals.items())
        return f"resource-usage: origin=impstats {kv}"

    def as_log_lines(self) -> list[str]:
        """Render collected stats as impstats-style JSON log lines."""
        return [json.dumps(s, default=str) for s in self.stats
                if s.get("event") == "progress"]

    def snapshot(self) -> list[dict[str, Any]]:
        """Current counters as impstats JSON objects (the shape the
        reference's impstats emits and its sidecar exporter parses:
        one object per named resource with ``name``/``origin`` plus
        numeric counters — sidecar/rsyslog_exporter.py
        parse_json_object). One object per streaming query, origin
        ``core.queue`` (each query IS the queue analog here):
        ``enqueued`` cumulative rows (counter), ``size`` current
        state rows, ``rows_per_sec``/``duration_ms`` latest batch."""
        out: dict[str, dict[str, Any]] = {}
        for s in self.stats:
            if s.get("event") != "progress":
                continue
            name = s.get("name") or "query"
            o = out.setdefault(name, {
                "name": name, "origin": "core.queue",
                "enqueued": 0, "size": 0, "rows_per_sec": 0.0,
                "duration_ms": 0, "batches": 0,
            })
            o["enqueued"] += int(s.get("input_rows") or 0)
            o["size"] = int(s.get("state_rows") or 0)
            o["rows_per_sec"] = float(s.get("rows_per_sec") or 0.0)
            o["duration_ms"] = int(s.get("duration_ms") or 0)
            o["batches"] += 1
        return list(out.values())


# ------------------------------------------------------- exporter
# Prometheus surface for the collected counters (ref: the reference
# ships sidecar/rsyslog_exporter.py, impstats -> /metrics; naming and
# counter-vs-gauge rules below mirror its build_metric_name /
# is_counter_key / build_base_labels).

import re as _re

_COUNTER_KEYS = {
    "processed", "failed", "submitted", "utime", "stime", "resumed",
    "enqueued", "discarded.full", "discarded.nf", "bytes.rcvd",
    "bytes.sent",
}
_COUNTER_PREFIXES = ("called.",)
_COUNTER_SUFFIXES = (".rcvd", ".sent", ".enqueued")


def _sanitize(name: str) -> str:
    name = _re.sub(r"[^a-zA-Z0-9_]", "_", name)
    if name and not _re.match(r"^[a-zA-Z_]", name):
        name = "_" + name
    return name.lower()


def _is_counter(key: str) -> bool:
    return (key in _COUNTER_KEYS or key.startswith(_COUNTER_PREFIXES)
            or key.endswith(_COUNTER_SUFFIXES))


def impstats_to_prometheus(objs: list[dict[str, Any]]) -> str:
    """Render impstats JSON objects in Prometheus exposition format —
    metric ``rsyslog_<origin>_<key>`` with labels rsyslog_component=
    origin, rsyslog_resource=name, counter/gauge decided by the
    reference's key heuristic."""
    by_metric: dict[str, tuple[str, list[str]]] = {}
    for obj in objs:
        name = str(obj.get("name", "unknown"))
        origin = str(obj.get("origin", "unknown"))
        labels = (f'rsyslog_component="{origin}",'
                  f'rsyslog_resource="{_sanitize(name)}"')
        for key, value in obj.items():
            if key in ("name", "origin"):
                continue
            try:
                num = float(value)
            except (TypeError, ValueError):
                continue
            mname = f"rsyslog_{_sanitize(origin)}_{_sanitize(key)}"
            mtype = "counter" if _is_counter(key) else "gauge"
            _, rows = by_metric.setdefault(mname, (mtype, []))
            val = int(num) if num == int(num) else num
            rows.append(f"{mname}{{{labels}}} {val}")
    lines: list[str] = []
    for mname in sorted(by_metric):
        mtype, rows = by_metric[mname]
        lines.append(f"# TYPE {mname} {mtype}")
        lines.extend(rows)
    return "\n".join(lines) + ("\n" if lines else "")


#: origins that emit both a module-global and per-instance lines —
#: Zabbix grouping splits them (impstats.c:895-898 is_dual_origin)
ZBX_DUAL_ORIGINS = ("imkafka", "omkafka", "imtcp", "imudp")


def impstats_zabbix(objs: list[dict[str, Any]],
                    now: float | None = None) -> str:
    """format="zabbix" (ChangeLog 2025-11-07; plugins/impstats/
    impstats.c:894-1105 generateZabbixStats): ONE RFC 8259 JSON line
    grouping the cycle's stat objects for Zabbix low-level
    discovery —

    ``{"timedate": "<%a %b %d %H:%M:%S %Y>", "stats_<origin>":
    [obj, ...], ...}``

    with '.' in origins sanitized to '_' (sanitize_origin), dual
    global/local origins split into ``stats_<o>_global`` (name ==
    origin) vs ``_local``, and core.action entries whose name
    mentions omkafka remapped into ``stats_omkafka_local``
    (is_core_action_omkafka). Groups keep insertion order."""
    import time as _time

    groups: dict[str, list] = {}
    for o in objs:
        origin = str(o.get("origin", "unknown"))
        name = str(o.get("name", ""))
        if origin == "core.action" and "omkafka" in name:
            key = "stats_omkafka_local"
        elif origin in ZBX_DUAL_ORIGINS:
            which = "global" if name == origin else "local"
            key = f"stats_{origin.replace('.', '_')}_{which}"
        else:
            key = f"stats_{origin.replace('.', '_')}"
        groups.setdefault(key, []).append(o)
    out: dict[str, Any] = {
        "timedate": _time.strftime(
            "%a %b %d %H:%M:%S %Y",
            _time.localtime(now if now is not None
                            else _time.time()))}
    out.update(groups)
    return json.dumps(out)


class PrometheusExporter:
    """Serve an :class:`ImpstatsListener`'s counters at ``/metrics``
    (the reference's sidecar exporter surface, in-process). Scrapes
    render the CURRENT snapshot — no background thread beyond the
    stdlib HTTP server.

    >>> listener = ImpstatsListener()
    >>> spark.streams.addListener(listener)
    >>> exporter = PrometheusExporter(listener)
    >>> host, port = exporter.start()       # http://host:port/metrics
    """

    def __init__(self, listener: ImpstatsListener,
                 host: str = "127.0.0.1", port: int = 0) -> None:
        self.listener = listener
        self._host = host
        self._port = port
        self._httpd = None
        self._thread = None

    def render(self) -> str:
        return impstats_to_prometheus(self.listener.snapshot())

    def start(self) -> tuple[str, int]:
        import http.server
        import threading

        exporter = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802
                pass

            def do_GET(self):  # noqa: N802
                if self.path.split("?")[0] not in ("/metrics", "/"):
                    self.send_response(404)
                    self.end_headers()
                    return
                body = exporter.render().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = http.server.ThreadingHTTPServer(
            (self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[:2]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None


def action_counters_frame(df, action_col: str, burst: int = 0):
    """Batch statsobj snapshot per action, rendered in the impstats
    LEGACY line format (ref: runtime/action.c:485-515 counter set —
    processed/failed/suspended/suspended.duration/resumed — emitted
    by plugins/impstats format="legacy" as `name: origin=core.action
    k=v ...`). ``burst`` > 0 adds the output-ratelimit counters
    (ratelimit.allowed / ratelimit.dropped, ChangeLog 2026-07-06)
    with batch semantics: the first ``burst`` rows per action pass.

    One partial-agg shuffle on the action key; the line render is a
    pure column concat over the aggregated (tiny) frame.
    """
    from pyspark.sql import functions as F

    agg = df.groupBy(F.col(action_col).alias("action")) \
        .agg(F.count("*").alias("submitted"))
    allowed = (F.least(F.col("submitted"), F.lit(int(burst)))
               if burst > 0 else F.col("submitted"))
    out = agg.select(
        "action",
        allowed.cast("long").alias("processed"),
        F.lit(0).cast("long").alias("failed"),
        F.lit(0).cast("long").alias("suspended"),
        F.lit(0).cast("long").alias("resumed"),
        *([(F.col("submitted") - allowed).cast("long")
           .alias("ratelimit_dropped")] if burst > 0 else []),
    )
    line = F.concat(
        F.col("action"), F.lit(": origin=core.action processed="),
        F.col("processed").cast("string"),
        F.lit(" failed=0 suspended=0 suspended.duration=0 resumed=0"),
        *([F.lit(" ratelimit.dropped="),
           F.col("ratelimit_dropped").cast("string")]
          if burst > 0 else []),
    )
    return out.withColumn("line", line)


class ImpstatsFileSink:
    """The impstats log.file lifecycle (plugins/impstats/impstats.c
    doSubmitToFile + initConfigSettings 'log.file' / 'log.file.
    overwrite', doHUP reopen; push.* remote-write params).

    - default mode APPENDS each stats cycle to ``path`` and keeps the
      handle OPEN between cycles (impstats-no-overwrite.sh: >= 2
      cycles accumulate);
    - ``overwrite=True`` truncates the file at every cycle so it
      always holds exactly the LAST snapshot (impstats-overwrite.sh:
      exactly one 'resource-usage' after many cycles);
    - :meth:`hup` closes the handle so the next cycle reopens by
      path — after an external rename the old file keeps the pre-HUP
      cycles and a fresh file receives the rest (impstats-hup.sh);
    - ``push_url`` POSTs the prometheus text rendering of each cycle
      with the configured constant labels; a dead endpoint logs the
      failure and never blocks local emission
      (impstats-push-basic.sh runs without a listener on purpose).
    """

    def __init__(self, path: str, *, overwrite: bool = False,
                 push_url: str | None = None,
                 push_labels: list[str] | None = None,
                 push_timeout_ms: int = 2000) -> None:
        self.path = path
        self.overwrite = overwrite
        self.push_url = push_url
        self.push_labels = list(push_labels or [])
        self.push_timeout_ms = push_timeout_ms
        self._fh = None
        self.push_errors: list[str] = []
        self.pushes = 0

    def emit_cycle(self, lines: list[str]) -> None:
        if self.overwrite:
            # truncate-and-rewrite: the file holds ONE snapshot
            with open(self.path, "w", encoding="utf-8") as fh:
                fh.write("".join(ln + "\n" for ln in lines))
        else:
            if self._fh is None:
                self._fh = open(self.path, "a", encoding="utf-8")
            self._fh.write("".join(ln + "\n" for ln in lines))
            self._fh.flush()
        if self.push_url:
            self._push(lines)

    def hup(self) -> None:
        """HUP analog: close so the next cycle reopens by path
        (impstats.c doHUP → closeLogFile)."""
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def close(self) -> None:
        self.hup()

    def _push(self, lines: list[str]) -> bool:
        """POST the cycle to push.url as prometheus exposition text
        with the constant push.labels (impstats.c push path). Errors
        record and return False — emission never fails on push."""
        import urllib.request

        labels = ",".join(f'{k}="{v}"' for k, v in
                          (s.split("=", 1) for s in self.push_labels))
        metrics = []
        for ln in lines:
            if ": origin=" not in ln:
                continue
            name, rest = ln.split(": origin=", 1)
            parts = rest.split()
            origin = parts[0]
            for kv in parts[1:]:
                if "=" not in kv:
                    continue
                k, v = kv.split("=", 1)
                if not v.lstrip("-").isdigit():
                    continue
                mname = _sanitize(f"rsyslog_{origin}_{k}")
                lab = (f'name="{_sanitize(name)}"'
                       + ("," + labels if labels else ""))
                metrics.append(f"{mname}{{{lab}}} {v}")
        body = "\n".join(metrics) + "\n"
        try:
            req = urllib.request.Request(
                self.push_url, data=body.encode(),
                headers={"Content-Type":
                         "text/plain; version=0.0.4"})
            with urllib.request.urlopen(
                    req, timeout=self.push_timeout_ms / 1000.0):
                pass
            self.pushes += 1
            return True
        except Exception as ex:  # noqa: BLE001 — push is best-effort
            self.push_errors.append(str(ex))
            return False

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

    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        self.stats.append({"event": "started", "id": str(event.id),
                           "name": event.name})

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        state_rows = 0
        try:
            for so in p.stateOperators:
                state_rows += so.numRowsTotal
        except Exception:  # noqa: BLE001 — shape varies by query type
            pass
        self.stats.append({
            "event": "progress",
            "name": p.name,
            "batch_id": p.batchId,
            "input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": state_rows,
        })

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        self.stats.append({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def as_log_lines(self) -> list[str]:
        """Render collected stats as impstats-style JSON log lines."""
        return [json.dumps(s, default=str) for s in self.stats
                if s.get("event") == "progress"]

"""Debounced policy-file watching — the engine's analog of the
reference's rswatch helper (runtime/rswatch.c; ChangeLog 2026-04-08
"ratelimit: watch YAML policy files with debounce" + 2026-04-13
"runtime: move watched ratelimit reloads into main loop").

The reference registers inotify watches serviced from the main loop;
this engine has no resident main loop — batch runs and streaming
micro-batches ARE the loop ticks — so a watched policy is re-STATed
per tick instead. Semantics preserved:

- a changed file reloads automatically once the change is older than
  the debounce window (rswatch coalesces rapid successive writes the
  same way),
- an INVALID reload keeps serving the last good policy and logs the
  failure once per file version,
- only the very first load may fail hard (config-load error).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Callable

#: per (tag, path) watch state: mtime_ns of the last applied (or
#: last-attempted) version + the parsed policy object
_STATE: dict[tuple[str, str], dict] = {}


def watched_load(path: str, loader: Callable[[str], object], *,
                 debounce_ms: int = 5000, tag: str = "policy",
                 logger: str = "rsyslog_spark.rswatch"):
    """Return the current policy for ``path``, reloading via
    ``loader`` when the file changed and the change is at least
    ``debounce_ms`` old. ``loader`` must raise on an invalid file."""
    key = (tag, path)
    log = logging.getLogger(logger)
    st = _STATE.get(key)
    if st is None:
        pol = loader(path)  # first-ever load failure = config error
        try:
            mt = os.stat(path).st_mtime_ns
        except OSError:
            mt = None
        _STATE[key] = {"mtime": mt, "policy": pol}
        return pol
    try:
        s = os.stat(path)
    except OSError as e:
        log.warning("failed to stat watched %s file %s: %s - "
                    "keeping previous policy", tag, path, e)
        return st["policy"]
    if s.st_mtime_ns == st["mtime"]:
        return st["policy"]
    if (time.time() - s.st_mtime) * 1000.0 < debounce_ms:
        # change younger than the debounce window — let the writer
        # finish; the next tick picks it up
        return st["policy"]
    try:
        pol = loader(path)
    except Exception as e:  # noqa: BLE001 — any parse/validate error
        log.warning("failed to reload %s file %s: %s - keeping "
                    "previous policy", tag, path, e)
        # record the seen version so the same bad file does not
        # re-attempt (and re-log) every tick
        st["mtime"] = s.st_mtime_ns
        return st["policy"]
    st["mtime"] = s.st_mtime_ns
    st["policy"] = pol
    log.info("reloaded %s file %s", tag, path)
    return pol


def duration_ms(value) -> int:
    """parseDurationMillis (runtime/ratelimit.c:456-497): bare number
    or 's' suffix = seconds; 'ms', 'm', 'h' scale accordingly;
    negative or garbage is a config error."""
    import re

    s = str(value).strip()
    m = re.fullmatch(r"(\d+)\s*(ms|s|m|h)?", s)
    if not m:
        raise ValueError(f"invalid duration {value!r}")
    mult = {"ms": 1, "s": 1000, None: 1000,
            "m": 60_000, "h": 3_600_000}[m.group(2)]
    return int(m.group(1)) * mult


def reset() -> None:
    """Test hook: forget all watch state."""
    _STATE.clear()

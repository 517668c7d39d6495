"""operatingStateFile — the crash-forensics state journal (ref:
runtime/operatingstate.c; goldens operatingstate-{basic,empty,
unclean}.sh).

``global(operatingStateFile="...")`` appends one line per state
transition / internal message:

    YYYYMMDD-HHMMSS: TAG   line

(TAG printf'd ``%-5.5s``). On open, an EXISTING file whose last line
is not ``STATE CLEAN CLOSE`` indicates an unclean shutdown: it is
renamed to ``<file>.previous`` and an error is logged naming the
offending tail (osf_checkOnStartup:60-120); a clean file is simply
appended to. The run writes ``STATE INITIALIZING <version>`` on open
and ``STATE CLEAN CLOSE`` on close.
"""

from __future__ import annotations

import os
import time
import warnings

STATE_INITIALIZING = "INITIALIZING"
STATE_CLEAN_CLOSE = "CLEAN CLOSE"
TAG_STATE = "STATE"
TAG_MSG = "MSG"


class OperatingStateFile:
    def __init__(self, path: str):
        self.path = path
        self._check_on_startup()
        self._fh = open(path, "a", encoding="utf-8", errors="replace")
        from rsyslog_spark import __version__
        self.write(TAG_STATE, f"{STATE_INITIALIZING} {__version__}")

    def _check_on_startup(self) -> None:
        try:
            with open(self.path, "rb") as fh:
                data = fh.read()
        except OSError:
            return                       # no existing file: fresh
        # the reference reads the last len("CLEAN CLOSE")+1 bytes
        # BEFORE the trailing LF and compares (operatingstate.c:85-98)
        tail = data.rstrip(b"\n")
        want = STATE_CLEAN_CLOSE.encode()
        got = tail[-len(want):] if len(tail) >= len(want) \
            else tail
        if got == want:
            return                       # clean: append to it
        warnings.warn(
            f"existing operatingStateFile '{self.path}' does not "
            f"end with '{STATE_CLEAN_CLOSE}, instead it has "
            f"'{got.decode(errors='replace')}' - this probably "
            "indicates an improper shutdown")
        try:
            os.rename(self.path, self.path + ".previous")
        except OSError:
            pass

    def write(self, tag: str, line: str) -> None:
        ts = time.strftime("%Y%m%d-%H%M%S", time.localtime())
        self._fh.write(f"{ts}: {tag:<5.5s} {line}\n")
        self._fh.flush()

    def msg(self, line: str) -> None:
        self.write(TAG_MSG, line)

    def close(self) -> None:
        if self._fh.closed:
            return
        self.write(TAG_STATE, STATE_CLEAN_CLOSE)
        self._fh.close()

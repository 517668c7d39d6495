#!/usr/bin/env python3
"""Verify omfile hash-chain signatures (the tools/logsigner.c
verification role for the Spark engine's sigprov — see
rsyslog_spark/streaming/sigprov.py).

Usage: python tools/logverify.py <file-or-directory> [...]
Exit 0 when every chain verifies, 1 otherwise.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_spark.streaming.sigprov import verify_directory, verify_file


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rc = 0
    for target in sys.argv[1:]:
        if os.path.isdir(target):
            ok, details = verify_directory(target)
            for d in details:
                print(f"{target}/{d}")
            rc |= 0 if ok else 1
        else:
            ok, detail = verify_file(target)
            print(f"{target}: {detail}")
            rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

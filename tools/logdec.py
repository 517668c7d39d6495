#!/usr/bin/env python3
"""Decrypt logs written with cry.provider="gcry" (rscryutil analog).

ref: tools/rscryutil.c — reads the ``.encinfo`` side file next to
each encrypted log, decrypts block by block, prints plaintext to
stdout (or --write to restore files in place, which also removes the
side file, like ``rscryutil --decrypt``'s file mode).

Usage:
  python tools/logdec.py --keyfile KF [--algo AES128] [--mode CBC]
         [--write] FILE_OR_DIR [...]
  python tools/logdec.py --key HEXKEY ...          (literal key, hex)
  python tools/logdec.py --keyprogram CMD ...      (key from stdout)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_spark.streaming.cryprov import (   # noqa: E402
    ENCINFO_SUFFIX, CryProvider)


def iter_targets(paths):
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                f = os.path.join(p, name)
                if os.path.isfile(f + ENCINFO_SUFFIX):
                    yield f
        elif os.path.isfile(p + ENCINFO_SUFFIX):
            yield p
        else:
            raise SystemExit(f"{p}: no {ENCINFO_SUFFIX} side file")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--keyfile")
    ap.add_argument("--key", help="literal key as hex")
    ap.add_argument("--keyprogram")
    ap.add_argument("--algo", default="AES128")
    ap.add_argument("--mode", default="CBC")
    ap.add_argument("--write", action="store_true",
                    help="restore plaintext in place, drop side files")
    ap.add_argument("paths", nargs="+")
    args = ap.parse_args()

    prov = CryProvider(
        key=bytes.fromhex(args.key) if args.key else None,
        keyfile=args.keyfile, keyprogram=args.keyprogram,
        algo=args.algo, mode=args.mode)
    rc = 0
    for f in iter_targets(args.paths):
        try:
            plain = prov.decrypt_file(f)
        except Exception as exc:
            print(f"{f}: decrypt failed: {exc}", file=sys.stderr)
            rc = 1
            continue
        if args.write:
            with open(f, "wb") as fh:
                fh.write(plain)
            os.unlink(f + ENCINFO_SUFFIX)
        else:
            sys.stdout.buffer.write(plain)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

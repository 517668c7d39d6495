#!/usr/bin/env python3
"""Translate rsyslog configs between RainerScript/legacy and YAML —
the ``rsyslogd -f in -F {yaml|rainerscript} -o out`` feature (ref:
runtime/translate.c; see rsyslog_spark/config/translate.py).

Usage: python tools/config_translate.py -f IN -F yaml|rainerscript [-o OUT]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_spark.config.translate import translate


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("-F", "--format", required=False,
                    choices=["yaml", "rainerscript", "full"])
    ap.add_argument("-o", "--out", default="-")
    args = ap.parse_args()
    with open(args.file, encoding="utf-8") as fh:
        src = fh.read()
    if not args.format or args.format == "full":
        # rsyslogd -o <path> without -F: merged-config echo with
        # include markers (grammar/lexer.l:572)
        import os as _os

        from rsyslog_spark.config.translate import full_config
        out = full_config(src, _os.path.dirname(args.file) or ".")
    else:
        out = translate(src, args.format)
    if args.out == "-":
        sys.stdout.write(out)
    else:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

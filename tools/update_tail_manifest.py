#!/usr/bin/env python3
"""Regenerate rsyslog_spark/queries/_tail_manifest.json — the body-hash
pin for queries parked past the driver's 50-row correctness window.

RUN THIS ONLY WHEN ROTATING THE TAIL SET, and only for queries that are
(a) driver-green in >=2 recorded CORRECTNESS_r*.json rounds under their
current name and (b) byte-identical to the version the driver last
verified. The tool enforces (a) mechanically from the CORRECTNESS files
and refuses to pin anything without that history; (b) is on you — run
it from a tree whose tail-query bodies are untouched since the last
driver round (git diff shows this).
"""
from __future__ import annotations

import json
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def green_rounds(name: str) -> list[str]:
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rows = json.load(open(path))
        row = rows.get(name)
        if row and row.get("hash_match") and not row.get("err"):
            out.append(os.path.basename(path)[len("CORRECTNESS_"):-len(".json")])
    return out


def main() -> int:
    # collect_all() itself verifies the manifest, so bootstrap by
    # reading the registry pieces directly
    import rsyslog_spark.queries as qr
    from rsyslog_spark.queries import core, enrich, stats_q, llm, tpch, \
        normalize_q

    all_q = {}
    for mod in (core, enrich, stats_q, llm, tpch, normalize_q):
        for q in mod.QUERIES:
            all_q[q.name] = q

    manifest = {}
    for name in qr._TAIL:
        rounds = green_rounds(name)
        if len(rounds) < 2:
            print(f"REFUSED: {name} is driver-green in {len(rounds)} "
                  f"round(s) {rounds} — needs >=2; keep it inside the "
                  "window", file=sys.stderr)
            return 1
        manifest[name] = {
            "sha256": qr.tail_body_hash(all_q[name]),
            "green_rounds": rounds,
        }
    path = os.path.join(REPO, "rsyslog_spark", "queries",
                        "_tail_manifest.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"pinned {len(manifest)} tail queries -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Run an rsyslog.conf (the supported RainerScript subset) on Spark.

    python tools/run_conf.py CONF [--input GLOB] [--stream]
                             [--checkpoint DIR] [--main RULESET]

Batch mode reads the input files once and executes every ruleset
action; --stream tails the glob with the imfile source and drains
with an availableNow trigger (omit --once semantics by editing the
call site — the runtime returns the StreamingQuery).

Actions of type omfile with file= write text (template=) or parquet;
other action types are listed for host wiring (omkafka, omfwd, ...).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsyslog_spark import get_spark  # noqa: E402
from rsyslog_spark.config.runtime import (  # noqa: E402
    run_config_batch, run_config_stream,
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("conf", help="rsyslog.conf path")
    ap.add_argument("--input", default=None,
                    help="override input(type=imfile file=...) glob")
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--checkpoint", default="/tmp/rsyslog_spark_ck")
    ap.add_argument("--main", default=None, help="entry ruleset name")
    args = ap.parse_args()

    with open(args.conf) as fh:
        src = fh.read()
    if args.conf.endswith((".yaml", ".yml")):
        # YAML configs render to RainerScript and reuse the parser
        # (the reference's yamlconf design)
        from rsyslog_spark.config.yamlconf import yaml_to_conf
        src = yaml_to_conf(src)
    spark = get_spark("run_conf")
    spark.sparkContext.setLogLevel("WARN")

    if args.stream:
        run_config_stream(spark, src, checkpoint=args.checkpoint,
                          input_path=args.input, main=args.main)
        print("stream drained (availableNow)")
        return 0

    run = run_config_batch(spark, src, input_path=args.input,
                           main=args.main)
    for name, path in run.written.items():
        print(f"action {name!r} -> {path}")
    for name, _df, params in run.unbound:
        print(f"action {name!r} (type={params.get('type', '?')}) "
              f"needs host wiring — see rsyslog_spark/streaming/sinks.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Config runtime: execute a parsed rsyslog.conf end-to-end.

The reference's activation sequence (runtime/rsconf.c:1228-1268 —
start actions, queues, then inputs) maps to: build each input's
DataFrame, parse, run the bound ruleset's DAG, then start one write
per action. Batch mode reads the same files with ``spark.read`` (for
tests and backfills); streaming mode uses the imfile source with an
``availableNow``-style trigger left to the caller.

Supported action types at the runtime level: omfile (text lines via
the named template, or parquet when ``template`` is absent),
omdiscard (compiled away as Stop at parse time). Other action types
are returned to the caller as (name, DataFrame, params) so hosts wire
omkafka/omelasticsearch/omfwd etc. through streaming/sinks.py —
transports need endpoints only the host knows.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rsyslog_spark.config.rainerscript import ParsedConfig, load_config
from rsyslog_spark.parsers import parse_syslog


@dataclass
class ConfigRun:
    """Outcome of a batch config run."""

    written: dict[str, str] = dfield(default_factory=dict)   # action → path
    unbound: list[tuple[str, DataFrame, dict]] = dfield(
        default_factory=list)                                # host-wired
    survivors: DataFrame | None = None


def run_config_batch(
    spark: SparkSession,
    conf_src: str,
    *,
    input_path: str | None = None,
    tables: dict[str, Any] | None = None,
    main: str | None = None,
) -> ConfigRun:
    """Parse + execute a config against file input in batch mode.

    ``input_path`` overrides the config's ``input(type="imfile"
    file=...)`` path (tests point it at a tmp dir). Every omfile
    action with a ``file`` param writes there (text when the action
    names a template, parquet otherwise).
    """
    eng, cfg = load_config(conf_src, tables=tables)
    path = input_path
    ruleset_name = main
    for inp in cfg.inputs:
        if inp.get("type") == "imfile" and path is None:
            path = inp.get("file")
        if ruleset_name is None and inp.get("ruleset"):
            ruleset_name = inp["ruleset"]
    if path is None:
        raise ValueError("no imfile input in config and no input_path")
    if ruleset_name is None:
        ruleset_name = next(iter(cfg.rulesets))

    lines = spark.read.text(path).withColumnRenamed("value", "line")
    frame = parse_syslog(lines)
    actions, survivors = eng.run(frame, ruleset_name)

    run = ConfigRun(survivors=survivors)
    for name, df in actions:
        params = _action_params(cfg, ruleset_name, name)
        if params.get("type") == "omfile" and params.get("file"):
            out_path = params["file"]
            tpl = cfg.templates.get(params.get("template", ""))
            if tpl is not None:
                df.select(tpl.col().alias("value")) \
                    .write.mode("append").text(out_path)
            else:
                df.write.mode("append").parquet(out_path)
            run.written[name] = out_path
        else:
            run.unbound.append((name, df, params))
    return run


def _action_params(cfg: ParsedConfig, ruleset: str, name: str) -> dict:
    from rsyslog_spark.plans.ruleset import Action

    def walk(stmts):
        for s in stmts:
            if isinstance(s, Action) and s.name == name:
                return s.params or {}
            for sub in (getattr(s, "then", None), getattr(s, "orelse", None),
                        getattr(s, "body", None)):
                if sub:
                    got = walk(sub)
                    if got is not None:
                        return got
        return None

    for rs in cfg.rulesets.values():
        got = walk(rs.stmts)
        if got is not None:
            return got
    return {}


def run_config_stream(
    spark: SparkSession,
    conf_src: str,
    *,
    checkpoint: str,
    input_path: str | None = None,
    tables: dict[str, Any] | None = None,
    main: str | None = None,
    available_now: bool = True,
):
    """Streaming execution of a config: imfile readStream → parse →
    ruleset DAG re-applied per micro-batch → all actions written from
    ONE query via fanout_sink (the reference's direct-action batch
    commit, ruleset.c:632 — the batch is persisted once, each action
    filters from it).

    ``available_now=True`` drains existing files and stops (test /
    backfill mode); False leaves the query running (caller owns
    lifecycle). Returns the StreamingQuery.
    """
    from rsyslog_spark.config.rainerscript import load_config as _load
    from rsyslog_spark.streaming.sources import imfile

    eng, cfg = _load(conf_src, tables=tables)
    path = input_path
    ruleset_name = main
    for inp in cfg.inputs:
        if inp.get("type") == "imfile" and path is None:
            path = inp.get("file")
        if ruleset_name is None and inp.get("ruleset"):
            ruleset_name = inp["ruleset"]
    if path is None:
        raise ValueError("no imfile input in config and no input_path")
    if ruleset_name is None:
        ruleset_name = next(iter(cfg.rulesets))

    lines = imfile(spark, path)
    frame = parse_syslog(lines)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            actions, _surv = eng.run(batch_df, ruleset_name)
            for name, df in actions:
                params = _action_params(cfg, ruleset_name, name)
                if params.get("type") == "omfile" and params.get("file"):
                    tpl = cfg.templates.get(params.get("template", ""))
                    if tpl is not None:
                        df.select(tpl.col().alias("value")) \
                            .write.mode("append").text(params["file"])
                    else:
                        df.write.mode("append").parquet(params["file"])
        finally:
            batch_df.unpersist()

    writer = frame.writeStream.foreachBatch(sink) \
        .option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination(120)
    return q

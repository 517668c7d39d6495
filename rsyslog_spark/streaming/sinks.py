"""Output modules as Structured Streaming sinks.

Delivery semantics: the reference is at-least-once with per-action
retry/suspend/resume (ref: runtime/action.h:62-128). Spark gives
at-least-once per micro-batch via checkpointing; ``retrying_foreach_
batch`` adds the reference's bounded-retry-then-suspend behavior for
non-idempotent external sinks (ES/HTTP/JDBC analogs).

Scale notes: one ruleset fan-out = ONE query with a persist()'d batch
inside foreachBatch, not N queries re-reading the source. Dynafile
templates become partition columns so the writer scales with the
partition count instead of an fd cache (ref omfile dynafiles,
tools/omfile.c:133-140).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def omfile_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    dynafile_cols: Sequence[str] = (),
    fmt: str = "parquet",
    compression: str | None = None,
) -> DataStreamWriter:
    """omfile (ref: tools/omfile.c:133-140,296-299). Static file =
    plain path; dynafile template = ``partitionBy`` on the
    template-derived columns (the LRU fd cache disappears — the
    committer handles concurrent partitions). ``iZipLevel`` → codec."""
    writer = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if compression:
        writer = writer.option("compression", compression)
    if dynafile_cols:
        writer = writer.partitionBy(*dynafile_cols)
    return writer


def omkafka_sink(
    df: DataFrame,
    brokers: str,
    topic_col: str | Column,
    value_col: str | Column,
    checkpoint: str,
) -> DataStreamWriter:
    """omkafka with dynatopic (ref: plugins/omkafka): the topic is a
    per-row column, which is Spark's native kafka-sink contract."""
    topic = F.col(topic_col) if isinstance(topic_col, str) else topic_col
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    out = df.select(topic.alias("topic"), value.cast("string").alias("value"))
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )


def retrying_foreach_batch(
    write_fn: Callable[[DataFrame, int], None],
    *,
    max_retries: int = 3,
    resume_interval_s: float = 1.0,
    on_suspend: Callable[[DataFrame, int, Exception], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch writer with the reference's action retry
    loop (ref: runtime/action.h:77-80 iResumeInterval/iResumeRetryCount):
    bounded retries with pause, then 'suspend' — route the failed batch
    to an error handler (≈ per-action error file, action.h:104-108)
    instead of failing the query."""

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        attempt = 0
        while True:
            try:
                write_fn(batch_df, batch_id)
                return
            except Exception as exc:  # noqa: BLE001 — sink errors are data
                attempt += 1
                if attempt > max_retries:
                    if on_suspend is not None:
                        on_suspend(batch_df, batch_id, exc)
                        return
                    raise
                time.sleep(resume_interval_s * attempt)

    return wrapped


def fanout_sink(
    actions: Sequence[tuple[str, Callable[[DataFrame], DataFrame],
                            Callable[[DataFrame, int], None]]],
) -> Callable[[DataFrame, int], None]:
    """Multi-action fan-out in ONE streaming query (ref: ruleset batch
    commit, runtime/ruleset.c:632 actionCommitAllDirect). Each action
    is (name, transform, writer). The micro-batch is persisted once;
    every action filters/projects from the cached batch — the Spark
    analog of N direct-queue actions sharing one dequeued batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for _name, transform, writer in actions:
                writer(transform(batch_df), batch_id)
        finally:
            batch_df.unpersist()

    return sink

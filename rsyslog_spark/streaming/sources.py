"""Input modules as Structured Streaming sources.

The reference's ~30 im* plugins reduce to four Spark source shapes:
file tail (imfile), Kafka (imkafka/imrelp analog), socket (imtcp/
imudp demo path), and generated streams (immark heartbeat). Everything
else (imjournal, imdocker, imhttp, ...) lands via a file/Kafka bridge
— the production pattern for a 1000-executor cluster is files-or-Kafka
in, never per-executor sockets.

Scale notes: imfile uses maxFilesPerTrigger to bound micro-batch size
(the analog of the reference's main-queue dequeue batch, ref
runtime/queue.c:2690-2729); Kafka uses maxOffsetsPerTrigger. Multiline
reassembly shuffles by file so a message split across lines stays
together — at 100 TB keep startmsg regexes anchored and files sized
to partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rsyslog_spark.parsers import parse_syslog


def imfile(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int | None = None,
    startmsg_regex: str | None = None,
    inputname: str = "imfile",
) -> DataFrame:
    """Tail files under a glob (ref: plugins/imfile/imfile.c:382-416).

    Returns a streaming DataFrame of raw ``line`` rows plus the source
    file path. With ``startmsg_regex``, consecutive lines are owned by
    the message they follow (multiline readMode, ref imfile
    startmsg.regex) — reassembly happens in :func:`reassemble_multiline`
    on a per-file group so ordering is preserved.
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if startmsg_regex:
        # Multiline readMode: read each file whole and split on a
        # lookahead of the start-of-message regex. Pure JVM split +
        # explode — no shuffle, no per-row Python, and line order is
        # preserved by construction (a message never spans files).
        # Memory note: one row per file; keep rotated files bounded,
        # as imfile's own state-file model assumes.
        content = (
            reader.option("wholetext", True)
            .load(path)
            .select(
                F.col("value").alias("content"),
                F.input_file_name().alias("srcfile"),
            )
        )
        pat = startmsg_regex.lstrip("^")
        return content.select(
            F.explode(
                F.transform(
                    F.split("content", f"(?m)(?=^{pat})"),
                    lambda x: F.regexp_replace(x, r"\n+$", ""),
                )
            ).alias("line"),
            "srcfile",
            F.lit(inputname).alias("inputname"),
        ).filter(F.length("line") > 0)
    return (
        reader.load(path)
        .select(
            F.col("value").alias("line"),
            F.input_file_name().alias("srcfile"),
            F.lit(inputname).alias("inputname"),
        )
    )


def immark(
    spark: SparkSession, interval_seconds: int = 20, mark_text: str = "-- MARK --"
) -> DataFrame:
    """Heartbeat stream (ref: plugins/immark/immark.c:260-274).

    One MARK row per interval from the rate source; union it with the
    main stream so sinks can prove liveness.
    """
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .filter(F.col("value") % interval_seconds == 0)
        .select(
            F.lit(mark_text).alias("line"),
            F.lit("immark").alias("inputname"),
            F.col("timestamp").alias("timegenerated"),
        )
    )


def imkafka(
    spark: SparkSession,
    brokers: str,
    topics: str,
    *,
    max_offsets_per_trigger: int | None = None,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka consumer (ref: plugins/imkafka/imkafka.c). Value bytes →
    ``line``; key/partition/offset kept for at-least-once bookkeeping."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load().select(
        F.col("value").cast("string").alias("line"),
        F.col("key").cast("string").alias("kafka_key"),
        "topic", "partition", "offset",
        F.col("timestamp").alias("timegenerated"),
        F.lit("imkafka").alias("inputname"),
    )


def imtcp(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP line server (ref: plugins/imtcp/imtcp.c) — the socket source
    is single-receiver and for demos only; production ingest is
    imfile/imkafka (see module docstring)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(F.col("value").alias("line"), F.lit("imtcp").alias("inputname"))
    )


def parse_stream(lines: DataFrame) -> DataFrame:
    """Run the parser chain over a streaming line frame — identical
    Column logic to the batch path (parsers are pure expressions, so
    batch/streaming parity is structural, not re-implemented)."""
    return parse_syslog(lines)


def reassemble_multiline(
    df: DataFrame,
    startmsg_regex: str,
    *,
    file_col: str = "srcfile",
    order_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Multiline reassembly over an ordered line table (ref: imfile
    readMode/startmsg.regex, plugins/imfile/imfile.c:382-416).

    Batch shape of the wholetext split in :func:`imfile`: a running
    count of start-of-message matches per file (window, ordered by the
    line number) assigns each continuation line to its message; one
    groupBy concatenates. Shuffles once on (file, msg_seq) — at 100 TB
    the window partitions by file, so skew is bounded by the largest
    single file, same operational envelope as imfile's per-file state.
    """
    from pyspark.sql import Window

    is_start = F.col(line_col).rlike(startmsg_regex).cast("long")
    w = Window.partitionBy(file_col).orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, 0)
    seq = F.sum(is_start).over(w)
    tagged = df.withColumn("__msgseq", seq)
    return (
        tagged.filter(F.col("__msgseq") > 0)   # leading junk dropped
        .groupBy(file_col, F.col("__msgseq").alias("msg_seq"))
        .agg(
            # collect_list order is NOT deterministic post-shuffle:
            # sort by line number inside the group before joining
            F.concat_ws("\n", F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(order_col).alias("o"),
                    F.col(line_col).alias("l")))),
                lambda s: s["l"],
            )).alias(line_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.min(order_col).alias("first_line_no"),
        )
    )

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
    endmsg_regex: str | None = None,
    read_mode: int = 0,
    inputname: str = "imfile",
    escapelf_replacement: str | None = None,
) -> DataFrame:
    """Tail files under a glob (ref: plugins/imfile/imfile.c:382-416).

    Returns a streaming DataFrame of raw ``line`` rows plus the source
    file path. Multiline messages follow the reference's four modes:

    * ``startmsg_regex`` — a line matching the regex STARTS a new
      message; lines until the next match belong to it.
    * ``endmsg_regex`` — a line matching the regex ENDS the current
      message (the match is included); the next line starts fresh.
    * ``read_mode=1`` — indented continuation: a line beginning with
      space/tab continues the previous message (classic syslog
      continuation).
    * ``read_mode=2`` — paragraph mode: an empty line terminates the
      message.

    All four are a wholetext read + JVM-side split/explode — no
    shuffle, no per-row Python, and line order is preserved by
    construction (a message never spans files). Memory note: one row
    per file; keep rotated files bounded, as imfile's own state-file
    model assumes. Batch-table equivalents (and the same mode
    semantics over an ordered line table) live in
    :func:`reassemble_multiline`.
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    multiline = bool(startmsg_regex or endmsg_regex) or read_mode in (1, 2)
    if multiline:
        content = (
            reader.option("wholetext", True)
            .load(path)
            .select(
                F.col("value").alias("content"),
                F.input_file_name().alias("srcfile"),
            )
        )
        return _split_multiline(content, startmsg_regex, endmsg_regex,
                                read_mode, escapelf_replacement,
                                inputname)
    return (
        reader.load(path)
        .select(
            F.col("value").alias("line"),
            F.input_file_name().alias("srcfile"),
            F.lit(inputname).alias("inputname"),
        )
    )


def _split_multiline(content: DataFrame, startmsg_regex, endmsg_regex,
                     read_mode: int, escapelf_replacement,
                     inputname: str) -> DataFrame:
    """Wholetext content → multiline-reassembled line rows (the four
    imfile modes; shared by the streaming reader and imfile_batch)."""
    if startmsg_regex:
        pat = startmsg_regex.lstrip("^")
        parts = F.split("content", f"(?m)(?=^{pat})")
    elif endmsg_regex:
        # no variable-length lookbehind in Java regex: stamp a
        # sentinel after each end-matching line, split on it
        marked = F.regexp_replace(
            F.col("content"),
            f"(?m)({endmsg_regex})\\n?", "$1\u0000")
        parts = F.split(marked, "\u0000\\n?")
    elif read_mode == 1:
        parts = F.split("content", "(?m)(?=^[^ \\t])")
    else:  # read_mode == 2: empty-line separated paragraphs
        parts = F.split("content", "(?m)\\n(?:[ \\t]*\\n)+")
    out = content.select(
        F.explode(
            F.transform(parts,
                        lambda x: F.regexp_replace(x, r"\n+$", ""))
        ).alias("line"),
        "srcfile",
        F.lit(inputname).alias("inputname"),
    ).filter(F.length(F.trim("line")) > 0)
    if escapelf_replacement is not None:
        # escapelf.replacement (imfile.c escapeLF*): the joined
        # message's inner newlines render as the given string
        # (golden: imfile-escapelf.replacement.sh '[LF]').
        # Divergence note: the reference holds a final
        # startmsg-mode message until more lines or a timeout
        # arrive; the batch/file model treats EOF as complete and
        # emits it.
        out = out.withColumn("line", F.replace(
            F.col("line"), F.lit("\n"),
            F.lit(escapelf_replacement)))
    return out


def ignore_older_than_paths(path: str, seconds: int) -> list[str]:
    """imfile ``ignoreOlderThan`` (imfile.c:1715 ignore_old_file /
    stream strmSetIgnoreOlderThan): a file whose mtime at DISCOVERY
    is older than N seconds is skipped; 0 disables. A later write
    refreshes the mtime, so the file becomes eligible and reads from
    the START (golden imfile-ignore-old-file-2.sh expects the full
    0..1999 sequence after appending to an old file). Returns the
    eligible concrete paths for the glob — possibly empty."""
    import glob as _glob
    import os
    import time

    cutoff = time.time() - seconds
    out = []
    for p in _glob.glob(path):
        try:
            if os.path.getmtime(p) >= cutoff:
                out.append(p)
        except OSError:
            pass
    return out


def imfile_batch(
    spark: SparkSession,
    path: str,
    *,
    startmsg_regex: str | None = None,
    endmsg_regex: str | None = None,
    read_mode: int = 0,
    inputname: str = "imfile",
    escapelf_replacement: str | None = None,
    add_metadata: bool = False,
) -> DataFrame:
    """Batch form of :func:`imfile` (same four multiline modes +
    escapelf.replacement) for the config batch runtime.

    ``add_metadata`` (imfile addMetadata="on", ref imfile.c
    msgAddMetadata; golden imfile-metadata-line-number.sh): stamps
    ``$!metadata!filename`` and ``$!metadata!line_number`` (1-based
    per file) — plain line mode; multiline messages carry reassembly
    metadata through :func:`reassemble_multiline` instead."""
    multiline = (bool(startmsg_regex or endmsg_regex)
                 or read_mode in (1, 2))
    if not multiline and add_metadata:
        content = (spark.read.format("text")
                   .option("wholetext", True).load(path)
                   .select(F.col("value").alias("content"),
                           F.input_file_name().alias("srcfile")))
        out = content.select(
            F.posexplode(F.split(
                F.regexp_replace("content", r"\n$", ""), "\n"))
            .alias("__ln0", "line"),
            "srcfile",
            F.lit(inputname).alias("inputname"),
        ).select(
            "line", "srcfile", "inputname",
            F.regexp_replace("srcfile", r"^file:/*", "/")
            .alias("cee_metadata_filename"),
            (F.col("__ln0") + 1).cast("string")
            .alias("cee_metadata_line_number"),
        )
        out = out.withMetadata(
            "cee_metadata_filename",
            {"rs_path": "$!metadata!filename"}).withMetadata(
            "cee_metadata_line_number",
            {"rs_path": "$!metadata!line_number"})
        return out
    if not multiline:
        return (spark.read.text(path)
                .select(F.col("value").alias("line"),
                        F.input_file_name().alias("srcfile"),
                        F.lit(inputname).alias("inputname")))
    content = (spark.read.format("text").option("wholetext", True)
               .load(path)
               .select(F.col("value").alias("content"),
                       F.input_file_name().alias("srcfile")))
    return _split_multiline(content, startmsg_regex, endmsg_regex,
                            read_mode, escapelf_replacement, inputname)


def mark_message_cols(mark_text: str = "-- MARK --") -> list:
    """The fields of one MARK message (ref: plugins/immark/
    immark.c injectMarkMessage:235-250): rawmsg/msg = the
    markMessageText, TAG 'rsyslogd:', PRI = syslog.info (46), local
    hostname, inputname 'immark'. Shared by the streaming source and
    tests (goldens immark-ruleset{,-custom-msg}.sh,
    immark-inputname.sh: the file render is
    '... <host> rsyslogd: -- MARK --')."""
    import socket as _socket

    host = _socket.gethostname()
    return [
        F.lit(mark_text).alias("line"),
        F.lit(mark_text).alias("rawmsg"),
        F.lit(mark_text).alias("msg"),
        F.lit("rsyslogd:").alias("syslogtag"),
        F.lit("rsyslogd").alias("programname"),
        F.lit(46).alias("pri"),                 # LOG_SYSLOG|LOG_INFO
        F.lit(5).alias("syslogfacility"),
        F.lit(6).alias("syslogseverity"),
        F.lit(host).alias("hostname"),
        F.lit(host).alias("fromhost"),
        F.lit("immark").alias("inputname"),
    ]


def immark(
    spark: SparkSession, interval_seconds: int = 20,
    mark_text: str = "-- MARK --", ruleset: str | None = None,
) -> DataFrame:
    """Heartbeat stream (ref: plugins/immark/immark.c:260-274;
    module params interval / markMessageText / ruleset —
    immark.c:76-78, use.syslogcall="off" injection shape).

    One MARK row per interval from the rate source, already in
    parsed-message shape (mark_message_cols); union it with the main
    stream so sinks can prove liveness. ``ruleset`` tags the row for
    engine-level routing (the reference binds the injected message
    to the configured ruleset, immark.c:249)."""
    cols = mark_message_cols(mark_text) + [
        F.col("timestamp").alias("timegenerated"),
        F.col("timestamp").alias("timereported"),
    ]
    if ruleset:
        cols.append(F.lit(ruleset).alias("ruleset"))
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .filter(F.col("value") % interval_seconds == 0)
        .select(*cols)
    )


#: split.json.records fan-out ceiling (ref: plugins/imkafka/
#: imkafka.c:175 IMKAFKA_MAX_JSON_SPLIT_RECORDS)
_MAX_JSON_SPLIT_RECORDS = 10000


def split_json_records(df: DataFrame, line_col: str = "line",
                       ts_col: str = "timegenerated") -> DataFrame:
    """imkafka ``split.json.records="on"`` (ref: plugins/imkafka/
    imkafka.c splitJsonRecords:446-556): a payload shaped
    ``{"records":[...]}`` fans out to one message per element, each
    re-serialized compactly; everything else — unparseable JSON, no
    ``records`` key, non-array, empty array, >10000 elements, or all
    elements JSON-null — forwards as-is. Null elements are skipped
    (the reference's NULL-pointer continue). A record's ``time`` key
    (ISO 8601, fractional seconds dropped — the reference's strptime
    stops at '.') becomes the message reception time.

    Pure Column transform (variant parse + explode), shared by the
    streaming imkafka frame and batch tests. Divergence (documented):
    variant re-serialization sorts object keys, where fjson keeps
    insertion order — same JSON value, different byte order.
    """
    recs = F.from_json(F.get_json_object(F.col(line_col), "$.records"),
                       "array<variant>")
    ok = (recs.isNotNull() & (F.size(recs) > 0)
          & (F.size(recs) <= _MAX_JSON_SPLIT_RECORDS)
          & F.exists(recs, lambda e: e.isNotNull()
                     & ~F.is_variant_null(e)))
    el = "__kjs_el"
    ok_c = "__kjs_ok"
    out = (df.withColumn(ok_c, ok)
           .withColumn(el, F.explode(
               F.when(F.col(ok_c), recs)
               .otherwise(F.array(F.lit(None).cast("variant")))))
           .filter(~F.col(ok_c)
                   | (F.col(el).isNotNull()
                      & ~F.is_variant_null(F.col(el)))))
    rec_ts = F.try_to_timestamp(
        F.regexp_extract(
            F.try_variant_get(F.col(el), "$.time", "string"),
            r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})", 1),
        F.lit("yyyy-MM-dd'T'HH:mm:ss"))
    out = out.withColumn(
        line_col,
        F.when(F.col(ok_c), F.to_json(F.col(el)))
        .otherwise(F.col(line_col)))
    if ts_col in df.columns:
        out = out.withColumn(
            ts_col, F.when(F.col(ok_c),
                           F.coalesce(rec_ts, F.col(ts_col)))
            .otherwise(F.col(ts_col)))
    return out.drop(ok_c, el)


def imkafka(
    spark: SparkSession,
    brokers: str,
    topics: str,
    *,
    consumergroup: str | None = None,
    conf_params: list | None = None,
    max_offsets_per_trigger: int | None = None,
    starting_offsets: str = "latest",
    split_json: bool = False,
) -> DataFrame:
    """Kafka consumer (ref: plugins/imkafka/imkafka.c). Value bytes →
    ``line``; key/partition/offset kept for at-least-once bookkeeping.
    ``split_json``: the split.json.records batch fan-out (see
    split_json_records). ``consumergroup`` maps to kafka ``group.id``
    (imkafka.c:775); ``conf_params`` is the config's
    ``confParam=["k=v", ...]`` list, passed through as ``kafka.k``
    reader options (imkafka.c:753-763 rd_kafka_conf_set
    pass-through)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if consumergroup:
        reader = reader.option("kafka.group.id", consumergroup)
    for ent in conf_params or []:
        k, _, v = str(ent).partition("=")
        if k:
            reader = reader.option(f"kafka.{k}", v)
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    out = reader.load().select(
        F.col("value").cast("string").alias("line"),
        F.col("key").cast("string").alias("kafka_key"),
        "topic", "partition", "offset",
        F.col("timestamp").alias("timegenerated"),
        F.lit("imkafka").alias("inputname"),
    )
    return split_json_records(out) if split_json else out


def imtcp_socket_source(spark: SparkSession, host: str,
                        port: int) -> DataFrame:
    """Spark socket-source TCP reader (demo-only, single receiver, LF
    framing). The full imtcp server — RFC6587 framing autodetect,
    multi-connection — is streaming/bridges.imtcp."""
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
    startmsg_regex: str | None = None,
    *,
    endmsg_regex: str | None = None,
    read_mode: int = 0,
    file_col: str = "srcfile",
    order_col: str = "line_no",
    line_col: str = "line",
    escapelf_replacement: str | None = None,
) -> DataFrame:
    """Multiline reassembly over an ordered line table (ref: imfile
    readMode 0/1/2 + startmsg.regex/endmsg.regex,
    plugins/imfile/imfile.c:382-416).

    Batch shape of the wholetext split in :func:`imfile`, with the
    same four mode semantics (see there). Start-of-message detection
    per mode, then a running count of starts per file (window, ordered
    by the line number) assigns each continuation line to its message;
    one groupBy concatenates. Shuffles once on (file, msg_seq) — at
    100 TB the window partitions by file, so skew is bounded by the
    largest single file, same operational envelope as imfile's
    per-file state.
    """
    from pyspark.sql import Window

    w_lag = Window.partitionBy(file_col).orderBy(order_col)
    if startmsg_regex is not None:
        is_start = F.col(line_col).rlike(startmsg_regex)
    elif endmsg_regex is not None:
        # a line AFTER an end-match starts the next message; the end
        # line itself stays with its message
        prev = F.lag(F.col(line_col)).over(w_lag)
        is_start = prev.isNull() | prev.rlike(endmsg_regex)
    elif read_mode == 1:
        # indented continuation: non-indented lines start messages
        is_start = ~F.col(line_col).rlike(r"^[ \t]")
    elif read_mode == 2:
        # paragraph mode: first line after a blank starts a message;
        # blank separator lines are dropped below
        prev = F.lag(F.col(line_col)).over(w_lag)
        is_start = prev.isNull() | (F.trim(prev) == "")
    else:
        is_start = F.lit(True)
    w = w_lag.rowsBetween(Window.unboundedPreceding, 0)
    seq = F.sum(is_start.cast("long")).over(w)
    tagged = df.withColumn("__msgseq", seq)
    if read_mode == 2 and startmsg_regex is None and endmsg_regex is None:
        tagged = tagged.filter(F.trim(F.col(line_col)) != "")
    return (
        tagged.filter(F.col("__msgseq") > 0)   # leading junk dropped
        .groupBy(file_col, F.col("__msgseq").alias("msg_seq"))
        .agg(
            # collect_list order is NOT deterministic post-shuffle:
            # sort by line number inside the group before joining
            F.concat_ws(escapelf_replacement
                        if escapelf_replacement is not None
                        else "\n", F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col(order_col).alias("o"),
                    F.col(line_col).alias("l")))),
                lambda s: s["l"],
            )).alias(line_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.min(order_col).alias("first_line_no"),
        )
    )

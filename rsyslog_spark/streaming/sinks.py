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

import os
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


class EsRetryableBatchError(RuntimeError):
    """Whole-bulk retryable failure (ref: plugins/omelasticsearch/
    omelasticsearch.c:1520-1528, ChangeLog 2026-06-29): when a bulk
    response contains ONLY retryable item errors (no successes, no
    permanent failures) the reference suspends the action with
    RS_RET_SUSPENDED so the unmodified batch is retried instead of
    being dumped to the error file. In the Spark engine this raises
    through the per-partition writer so ``retrying_foreach_batch`` /
    ``action.resumeRetryCount`` replays the micro-batch."""


def es_item_retryable(status: int, error_type: str | None = None) -> bool:
    """isRetryableBulkStatus (ref: omelasticsearch.c:1359-1374):
    HTTP 429 and 5xx are retryable; 403 is retryable ONLY when the
    item error type is ``cluster_block_exception`` (a read-only
    index block that an operator will lift); everything else is a
    permanent data failure."""
    if status == 429 or status >= 500:
        return True
    if status != 403:
        return False
    return error_type == "cluster_block_exception"


def omelasticsearch_sink(
    index_col: str,
    id_col: str | None,
    doc_col: str,
    *,
    transport: Callable[[str], list] | None = None,
    max_bytes: int = 5 * 1024 * 1024,
    write_operation: str = "index",
    error_file: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """omelasticsearch bulk mode (ref: plugins/omelasticsearch/
    omelasticsearch.c:158-179 bulkmode/maxbytes, 227-253
    retryfailures): build NDJSON ``{"index": ...}\\n{doc}`` bulk
    bodies capped at ``max_bytes``, POST via ``transport(body) ->
    [failed items]``; failed lines raise so the task retries
    (at-least-once, like the reference's retry-with-response-parse).

    The transport returns, per failed bulk item, either a bare line
    number (legacy — classified permanent) or an ``(index,
    retryable)`` pair. Classification follows ChangeLog 2026-06-29
    (omelasticsearch.c:1505-1535): if EVERY item in the bulk failed
    and every failure is retryable (429/5xx/read-only
    cluster_block_exception — see :func:`es_item_retryable`), the
    whole batch can be resubmitted safely, so the sink raises
    :class:`EsRetryableBatchError` (≈ RS_RET_SUSPENDED) instead of
    recording the items as data failures. Mixed responses keep
    per-item data-failure handling (errorfile / raise).

    ``write_operation`` (omelasticsearch.c writeoperation param;
    golden es-writeoperation.sh): ``index`` (default, upsert) or
    ``create`` — the bulk action line becomes ``{"create": ...}``
    and existing ids conflict instead of overwriting.
    ``error_file`` (errorfile param; es-*-errfile-* goldens): failed
    docs are APPENDED as one JSON record per line instead of
    raising — the reference's record-and-continue mode.

    The transport is injected — tests pass a recorder; production
    passes an HTTP POST to ``_bulk``. No network happens here.
    """
    if transport is None:
        raise ValueError("omelasticsearch_sink needs a transport "
                         "(no default network client in this build)")
    if write_operation not in ("index", "create"):
        raise ValueError(
            f"omelasticsearch: unknown writeoperation "
            f"{write_operation!r} - use 'index' or 'create'")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        header = F.to_json(F.struct(F.struct(
            F.col(index_col).alias("_index"),
            *([F.col(id_col).alias("_id")] if id_col else []),
        ).alias(write_operation)))
        lines = batch_df.select(
            F.concat(header, F.lit("\n"), F.col(doc_col)).alias("l"),
            F.length(F.col(doc_col)).alias("n"),
        )

        def per_partition(rows):
            import json as _json

            buf: list[str] = []
            size = 0
            def flush():
                nonlocal buf, size
                if not buf:
                    return
                raw = transport("\n".join(buf) + "\n")
                failed = []
                retryable_set = set()
                for item in raw or []:
                    if isinstance(item, int):
                        failed.append(item)        # legacy: permanent
                    else:
                        idx, retry_ok = item[0], bool(item[1])
                        failed.append(int(idx))
                        if retry_ok:
                            retryable_set.add(int(idx))
                if failed:
                    saw_success = len(set(failed)) < len(buf)
                    saw_permanent = any(i not in retryable_set
                                        for i in failed)
                    if retryable_set and not saw_permanent \
                            and not saw_success:
                        # only-retryable bulk → suspend, retry whole
                        # batch (omelasticsearch.c:1520-1528)
                        raise EsRetryableBatchError(
                            "omelasticsearch: suspending action "
                            "because bulk response contains only "
                            f"retryable item errors "
                            f"({len(failed)} items)")
                    if error_file is not None:
                        # record-and-continue (writeDataError —
                        # one {"request":..,"reply-sketch":..}-style
                        # JSON record per failed doc)
                        with open(error_file, "a",
                                  encoding="utf-8") as fh:
                            for i in failed:
                                if 0 <= i < len(buf):
                                    hdr, _, doc = \
                                        buf[i].partition("\n")
                                    fh.write(_json.dumps(
                                        {"request": hdr,
                                         "doc": doc}) + "\n")
                    else:
                        raise RuntimeError(
                            "bulk index failed for "
                            f"{len(failed)} docs")
                buf, size = [], 0
            for r in rows:
                buf.append(r.l)
                size += r.n + 64
                if size >= max_bytes:
                    flush()
            flush()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


def omclickhouse_sink(
    line_col: str = "line",
    *,
    transport: Callable[[bytes], tuple[int, str]] | None = None,
    server: str = "localhost",
    port: int = 8123,
    use_https: bool = False,
    uid: str | None = None,
    pwd: str | None = None,
    bulkmode: bool = True,
    max_bytes: int = 0,
    error_file: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """ClickHouse HTTP insert (ref: plugins/omclickhouse/
    omclickhouse.c — the template renders a full ``INSERT INTO ...
    VALUES (...)`` statement per message, POSTed to the HTTP
    endpoint, default :8123).

    Faithful semantics:
    - a message NOT containing 'INSERT INTO' is an error that fails
      the batch (omclickhouse.c:468-474 'Message is no Insert
      query');
    - bulkmode (default on, omclickhouse.c:603): the FIRST message
      of a batch contributes the whole statement, subsequent ones
      only from the '(' after VALUES (computeBulkMessage:414-431) —
      appended verbatim; ``max_bytes`` flushes early;
    - a reply with HTTP >= 400 or a DB::{,Net,Parsing}Exception text
      records the request to ``error_file`` and CONTINUES
      (checkResult:361-379 'we have handled the problem'); transport
      -level failures raise → the action suspends.

    ``transport(body) -> (http_status, reply_text)`` is injectable;
    the default POSTs via urllib with optional basic auth."""
    if transport is None:
        scheme = "https" if use_https else "http"
        base = f"{scheme}://{server}:{port}/"

        def transport(body: bytes) -> tuple[int, str]:
            import base64
            import urllib.error
            import urllib.request

            hdrs = {"Content-Type": "text/plain"}
            if uid is not None:
                cred = base64.b64encode(
                    f"{uid}:{pwd or ''}".encode()).decode()
                hdrs["Authorization"] = f"Basic {cred}"
            req = urllib.request.Request(base, data=body,
                                         headers=hdrs)
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status, r.read(65536).decode(
                        "utf-8", "replace")
            except urllib.error.HTTPError as e:
                return e.code, e.read(65536).decode(
                    "utf-8", "replace")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(
            F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            import json as _json

            batch: list[str] = []
            size = 0

            def record_error(body: str, status: int,
                             reply: str) -> None:
                if error_file is None:
                    raise RuntimeError(
                        "omclickhouse: ClickHouse request failed "
                        f"with HTTP status {status}: {reply[:200]}")
                with open(error_file, "a", encoding="utf-8") as fh:
                    fh.write(_json.dumps(
                        {"request": body, "status": status,
                         "reply": reply[:1000]}) + "\n")

            def flush():
                nonlocal batch, size
                if not batch:
                    return
                body = "".join(batch)
                status, reply = transport(body.encode("utf-8"))
                if status >= 400 or " = DB::Exception" in reply \
                        or "DB::NetException" in reply \
                        or "DB::ParsingException" in reply:
                    record_error(body, status, reply)
                batch, size = [], 0

            for r in rows:
                stmt = r.l or ""
                if "INSERT INTO" not in stmt:
                    raise RuntimeError(
                        "omclickhouse: Message is no Insert query: "
                        f"Message suspended: {stmt[:200]}")
                if not bulkmode:
                    batch = [stmt]
                    flush()
                    continue
                part = stmt
                if batch:
                    v = stmt.find("VALUES")
                    p = stmt.find("(", v) if v >= 0 else -1
                    if p >= 0:
                        part = stmt[p:]
                if max_bytes > 0 and batch \
                        and size + len(part) > max_bytes:
                    flush()
                    part = stmt   # new batch restarts the statement
                batch.append(part)
                size += len(part)
            flush()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


def omhttp_serialize(chunk: list[str], fmt: str) -> tuple[bytes, str]:
    """omhttp batch serializers (contrib/omhttp/omhttp.c:1446-1726):
    newline = raw lines joined; jsonarray = '[msg,…]' of parsed
    messages; kafkarest = '{"records":[{"value":msg},…]}'; lokirest =
    '{"streams":[msg,…]}' (each message is a pre-rendered Loki
    stream object). Messages that fail JSON parsing are DROPPED from
    the three JSON formats — the reference's serializeBatch* log
    'failed to parse %s as json ignoring it' and skip
    (omhttp.c:1659,1709,1757). Returns (body, content_type)."""
    import json as _json
    import warnings as _warnings

    def parsed(fname: str):
        out = []
        for m in chunk:
            try:
                out.append(_json.loads(m))
            except ValueError:
                _warnings.warn(
                    f"omhttp: {fname} failed to parse {m!r} as "
                    "json, ignoring it", stacklevel=3)
        return out

    if fmt == "jsonarray":
        return (_json.dumps(parsed("serializeBatchJsonArray"),
                            separators=(",", ":")).encode(),
                "application/json")
    if fmt == "kafkarest":
        return (_json.dumps(
            {"records": [{"value": v}
                         for v in parsed("serializeBatchKafkaRest")]},
            separators=(",", ":")).encode(),
                "application/vnd.kafka.json.v2+json")
    if fmt == "lokirest":
        return (_json.dumps(
            {"streams": parsed("serializeBatchLokiRest")},
            separators=(",", ":")).encode(),
                "application/json")
    return "\n".join(chunk).encode(), "text/plain"


def omhttp_sink(
    doc_col: str,
    *,
    transport: Callable[..., None],
    batch_size: int = 500,
    path_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """omhttp batched POST (ref: contrib/omhttp/omhttp.c): group rows
    into ``batch_size`` payload lists per partition; transport is the
    injected HTTP client (retry via retrying_foreach_batch).
    ``path_col`` = dynrestpath: rows carry their rendered REST path
    and batches group by it (omhttp.c dynrestpath)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        cols = [F.col(doc_col).alias("d")]
        if path_col:
            cols.append(F.col(path_col).alias("p"))
        docs = batch_df.select(*cols)

        def per_partition(rows):
            chunks: dict = {}
            for r in rows:
                key = r.p if path_col else None
                chunk = chunks.setdefault(key, [])
                chunk.append(r.d)
                if len(chunk) >= batch_size:
                    if path_col:
                        transport(chunk, key)
                    else:
                        transport(chunk)
                    chunks[key] = []
            for key, chunk in chunks.items():
                if chunk:
                    if path_col:
                        transport(chunk, key)
                    else:
                        transport(chunk)
            return iter(())

        docs.rdd.mapPartitions(per_partition).count()

    return write


def omjdbc_sink(
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    mode: str = "append",
) -> Callable[[DataFrame, int], None]:
    """ommysql/ompgsql/omlibdbi analog (ref: plugins/ommysql etc.):
    template-projected rows appended via Spark's JDBC writer per
    micro-batch (transactional per batch — the reference's
    beginTransaction/commitTransaction maps to the JDBC batch
    commit)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.jdbc(url, table, mode=mode,
                            properties=properties or {})

    return write


def omprog_sink(
    argv: Sequence[str],
    line_col: str = "line",
    *,
    confirm_messages: bool = False,
    confirm_timeout: float = 10.0,
    output: str | None = None,
    close_timeout: float = 5.0,
    kill_unresponsive: bool = True,
    signal_on_close: bool = False,
    resume_retry_count: int = 0,
    resume_interval: float = 1.0,
) -> Callable[[DataFrame, int], None]:
    """omprog (ref: plugins/omprog): pipe template-rendered lines to an
    external program's stdin, one process per partition per batch
    (restart-on-next-batch ≈ the reference's restart management).

    ``confirm_messages`` (omprog.c:126,417-430 confirmMessages): the
    child answers one status line per message on stdout — 'OK'
    succeeds; anything else is a recoverable error that fails the
    batch (the reference suspends/retries). The child also confirms
    STARTUP with a first 'OK' before any message is sent.
    ``output`` (omprog.c:138,165-175): capture the child's stdout
    (+stderr) to a file; with confirm_messages on, stdout carries
    the feedback protocol so only stderr is captured.
    ``close_timeout``/``kill_unresponsive``/``signal_on_close``
    (omprog.c:301-320 waitForChild): on close, optionally SIGTERM
    first, wait up to the timeout, then SIGKILL unresponsive
    children (golden omprog-close-unresponsive.sh).

    ``resume_retry_count`` > 0 enables the paced transaction retry
    splitter (ChangeLog 2026-07-05, issue 5016; runtime/action.c:
    1738-1758 actionSleepBeforeRetryingTransaction + 1761-1817
    actionTryRemoveHardErrorsFromBatch): a mid-batch confirm failure
    no longer fails the whole batch in a tight loop. The failed
    message waits ``resume_interval`` (action.resumeInterval) and is
    retried individually; if it STILL fails, it and ALL remaining
    messages are deferred to the next paced cycle — later messages
    are never classified by attempts made while the action needed a
    retry delay for the current one. Already-confirmed messages are
    never resent. After ``resume_retry_count`` paced cycles the
    action suspends (raises). With the default 0 the pre-fix
    behavior remains: first confirm failure fails the batch."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            import signal as _signal
            import subprocess

            out_fh = open(output, "ab") if output else None
            stdout_tgt = (subprocess.PIPE if confirm_messages
                          else (out_fh or subprocess.DEVNULL))
            stderr_tgt = out_fh if out_fh else None
            proc = subprocess.Popen(
                list(argv), stdin=subprocess.PIPE,
                stdout=stdout_tgt, stderr=stderr_tgt, text=True)

            def read_status() -> str:
                import select as _select
                ready, _, _ = _select.select(
                    [proc.stdout], [], [], confirm_timeout)
                if not ready:
                    raise RuntimeError(
                        "omprog: program gave no confirmation "
                        f"within {confirm_timeout}s")
                return (proc.stdout.readline() or "").strip()

            try:
                if confirm_messages:
                    # startup confirmation precedes any message
                    st = read_status()
                    if st != "OK":
                        raise RuntimeError(
                            f"omprog: program startup returned: "
                            f"{st!r}")

                OK_STATES = ("OK", "DEFER_COMMIT",
                             "PREVIOUS_COMMITTED")

                def send_one(text: str) -> str:
                    proc.stdin.write(text + "\n")
                    proc.stdin.flush()
                    return read_status()

                if confirm_messages and resume_retry_count > 0:
                    # paced retry splitter (action.c:1761-1817)
                    def splitter_pass(msgs: list[str]) -> list[str]:
                        for idx, m in enumerate(msgs):
                            st = send_one(m)
                            if st in OK_STATES:
                                continue
                            # the action needs a retry delay before
                            # attempting the CURRENT message: sleep
                            # resumeInterval once, retry it alone
                            # (actionSleepBeforeRetrying-
                            # Transaction, action.c:1738-1758)
                            time.sleep(resume_interval)
                            st = send_one(m)
                            if st in OK_STATES:
                                continue
                            # still failing: defer it AND all
                            # remaining messages — do not classify
                            # later messages during the delay
                            return msgs[idx:]
                        return []

                    pending = [(r.l or "") for r in rows]
                    cycle = 0
                    while pending:
                        pending = splitter_pass(pending)
                        if not pending:
                            break
                        cycle += 1
                        if cycle > resume_retry_count:
                            raise RuntimeError(
                                "omprog: suspending - "
                                f"{len(pending)} messages still "
                                "unconfirmed after "
                                f"{resume_retry_count} paced "
                                "retries")
                        time.sleep(resume_interval)
                else:
                    for r in rows:
                        proc.stdin.write((r.l or "") + "\n")
                        if confirm_messages:
                            proc.stdin.flush()
                            st = read_status()
                            if st not in OK_STATES:
                                raise RuntimeError(
                                    "omprog: program returned: "
                                    f"{st!r}")
                try:
                    proc.stdin.close()
                except OSError:
                    pass
                if signal_on_close and proc.poll() is None:
                    proc.send_signal(_signal.SIGTERM)
                try:
                    rc = proc.wait(timeout=close_timeout)
                except subprocess.TimeoutExpired:
                    if not kill_unresponsive:
                        raise RuntimeError(
                            "omprog: program did not terminate "
                            f"within closeTimeout={close_timeout}s")
                    proc.kill()
                    proc.wait()
                    rc = 0   # killed on request — not a failure
                if rc not in (0, None):
                    raise RuntimeError(f"omprog exited {rc}")
            finally:
                if proc.poll() is None:
                    proc.kill()
                if out_fh:
                    out_fh.close()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


def omshell_sink(
    program: str,
    line_col: str = "line",
) -> Callable[[DataFrame, int], None]:
    """omshell (ref: tools/omshell.c:105-110; legacy ``^program``
    selector): run ``program`` once PER MESSAGE with the rendered
    line as its single argument (execProg); any nonzero exit raises,
    so :func:`retrying_foreach_batch` applies the reference's
    retry-then-suspend loop.

    The reference docs call this module inadvisable for volume (one
    fork per message) — same caveat here; the processes at least run
    inside the partitions, so the forks distribute across executors.
    omprog (stdin pipeline, one process per partition) is the
    scalable external-program path.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            import subprocess

            for r in rows:
                rc = subprocess.call([program, r.l or ""])
                if rc != 0:
                    raise RuntimeError(
                        f"omshell: {program!r} exited {rc}")
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


def omtesting_sink(
    mode: str = "fail",
    *,
    fail_frequency: int = 2,
    resume_after: int = 2,
    echo: list | None = None,
    line_col: str = "line",
) -> Callable[[DataFrame, int], None]:
    """omtesting (ref: plugins/omtesting/omtesting.c:69-330) — the
    failure-injection sink the reference uses to exercise action
    retry/suspend handling, formalized so OUR retry tests use the
    same tool.

    ``mode='fail'`` (ref 'fail fail-frequency resume-after'): every
    ``fail_frequency``-th delivery call enters failed state and keeps
    failing until ``resume_after`` further attempts have been made
    (omtesting.c:123-169 doFailure/tryResume). ``mode='always_
    suspend'`` fails every call (MD_ALWAYS_SUSPEND). The reference's
    'randfail' is deliberately NOT reproduced — tests need the
    deterministic modes. ``echo`` collects successfully delivered
    lines (bEchoStdout analog).
    """
    if mode not in ("fail", "always_suspend", "sleep"):
        raise ValueError(f"omtesting: unknown mode {mode!r}")
    state = {"call": 0, "failed": False, "retries": 0}

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if mode == "always_suspend":
            raise RuntimeError("omtesting: always_suspend")
        if mode == "fail":
            if state["failed"]:
                state["retries"] += 1
                if state["retries"] < resume_after:
                    raise RuntimeError("omtesting: suspended (retry "
                                       f"{state['retries']})")
                state["failed"] = False     # resumed; deliver below
            else:
                state["call"] += 1
                if state["call"] % fail_frequency == 0:
                    state["failed"] = True
                    state["retries"] = 0
                    raise RuntimeError("omtesting: fail injection at "
                                       f"call {state['call']}")
        if echo is not None:
            echo.extend(
                r.l for r in batch_df.select(
                    F.col(line_col).cast("string").alias("l")).collect())

    return write


def failover_sink(
    primary: Callable[[DataFrame, int], None],
    secondary: Callable[[DataFrame, int], None],
    *,
    max_retries: int = 2,
    resume_after_batches: int = 10,
) -> Callable[[DataFrame, int], None]:
    """execOnlyWhenPreviousIsSuspended failover chain (ref:
    runtime/action.h:82-84, wti.h:143-151 previous_action_suspended).

    Engine-level sink health, re-evaluated per micro-batch: while the
    primary is suspended, batches route to the secondary; after
    ``resume_after_batches`` the primary gets a retry (the reference's
    iResumeInterval, counted in batches instead of seconds so behavior
    is deterministic under test).
    """
    state = {"suspended_at": None}

    def write(batch_df: DataFrame, batch_id: int) -> None:
        sus = state["suspended_at"]
        if sus is not None and batch_id - sus < resume_after_batches:
            secondary(batch_df, batch_id)
            return
        attempt = 0
        while True:
            try:
                primary(batch_df, batch_id)
                state["suspended_at"] = None
                return
            except Exception:  # noqa: BLE001 — sink health, not data
                attempt += 1
                if attempt > max_retries:
                    state["suspended_at"] = batch_id
                    secondary(batch_df, batch_id)
                    return

    return write


def dequeue_window_gate(
    from_hour: int, to_hour: int,
) -> Callable[[DataFrame, int], bool]:
    """Queue dequeue time window (ref: runtime/queue.h:136-146
    iDeqtWinFromHr/ToHr): only process batches inside the local
    time-of-day window. Returns a predicate for foreachBatch wrappers.

    Contract: a wrapper must NOT return normally when the predicate
    is False — Structured Streaming commits the epoch the moment
    foreachBatch returns, which would DROP the out-of-window batch.
    Either raise (the retry wrapper re-runs the batch until the
    window opens) or block until in-window; the reference's queue
    holds messages, it never discards them."""
    import datetime

    def in_window(_batch_df: DataFrame, _batch_id: int) -> bool:
        h = datetime.datetime.now().hour
        if from_hour <= to_hour:
            return from_hour <= h < to_hour
        return h >= from_hour or h < to_hour   # crosses midnight

    return in_window


def _z_single(payload: bytes, level: int) -> bytes:
    """Legacy single-message compression (tools/omfwd.c:1781-1806):
    only messages longer than CONF_MIN_SIZE_FOR_COMPRESS (60,
    runtime/rsyslog.h:244) are compressed, and the 'z'+deflate form
    is used only when it is actually SMALLER than the original —
    otherwise the plain payload goes out (receivers handle both)."""
    if len(payload) <= 60:
        return payload
    import zlib
    z = b"z" + zlib.compress(payload, level)
    return z if len(z) < len(payload) else payload


def _pool_send(rows, targets, *, framing, tls, comp, cdrv, level,
               flush_on_txend, keepalive=None, zcodec=None,
               tuner=None, stats=None):
    """omfwd native LB pool (omfwd.c doTryResume/pool walk): each
    message goes to ONE target, round-robin over healthy targets;
    connect/send failure suspends the target for the rest of the
    batch and its share re-routes to the survivors; all targets
    dead → raise (the action retry/suspend wrapper takes over).

    ``stats``: per-target ``[connects, msgs, bytes]`` rows filled in
    place (omfwd.c target_stats — num.connects counts every TCP
    connect incl. re-routes/rebinds, ChangeLog 2026-04-13)."""
    import socket as _socket

    n = len(targets)
    conns: list = [None] * n
    cobjs: list = [None] * n
    dead = [False] * n
    if stats is None:
        stats = [[0, 0, 0] for _ in range(n)]

    def conn_for(i):
        if conns[i] is None:
            s = _socket.create_connection(targets[i], timeout=10)
            stats[i][0] += 1
            if tuner is not None:
                tuner(s)
            if keepalive:
                from rsyslog_spark.streaming.bridges import (
                    apply_keepalive)
                apply_keepalive(s, True, *keepalive)
            if tls is not None:
                from rsyslog_spark.streaming.gtls import (
                    check_peer, client_context)
                s = client_context(tls).wrap_socket(
                    s, server_hostname=targets[i][0])
                check_peer(s, tls)
            conns[i] = s
            if comp == "stream:always":
                if cdrv == "zstd":
                    cobjs[i] = zcodec.ZstdCompressor(
                        level=level).compressobj()
                else:
                    import zlib
                    cobjs[i] = zlib.compressobj(level)
        return conns[i]

    def send(i, data: bytes) -> None:
        # Connect (which also creates the stream compressor) BEFORE
        # consulting cobjs[i] — otherwise the first frame on every
        # pooled connection would bypass the zlib stream and the
        # receiver's inflate fails on it ('incorrect header check').
        s = conn_for(i)
        if cobjs[i] is not None:
            import zlib
            out = cobjs[i].compress(data)
            if flush_on_txend and cdrv == "zlib":
                out += cobjs[i].flush(zlib.Z_SYNC_FLUSH)
            if not out:
                return
            data = out
        s.sendall(data)
        stats[i][2] += len(data)

    rr = 0
    try:
        for r in rows:
            payload = (r.l or "").encode("utf-8")
            if comp == "single":
                payload = _z_single(payload, level)
            if framing == "octet-counted":
                frame = str(len(payload)).encode() + b" " + payload
            else:
                frame = payload + b"\n"
            start, rr = rr, rr + 1
            for k in range(n):
                i = (start + k) % n
                if dead[i]:
                    continue
                try:
                    send(i, frame)
                    stats[i][1] += 1
                    break
                except OSError:
                    dead[i] = True
                    if conns[i] is not None:
                        try:
                            conns[i].close()
                        except OSError:
                            pass
                        conns[i] = None
            else:
                raise OSError("omfwd: all pool targets failed")
    finally:
        for i, s in enumerate(conns):
            if s is None:
                continue
            try:
                if cobjs[i] is not None:
                    tail = cobjs[i].flush()
                    if tail:
                        s.sendall(tail)
                        stats[i][2] += len(tail)
                s.close()
            except OSError:
                pass


def omfwd_sink(
    host: str | list[str],
    port: int | list[int],
    line_col: str = "line",
    *,
    framing: str = "octet-counted",
    protocol: str = "tcp",
    tls=None,
    compression: str = "none",
    compression_driver: str = "zlib",
    compression_level: int = 6,
    flush_on_txend: bool = True,
    keepalive: bool = False,
    keepalive_probes: int = 0,
    keepalive_time: int = 0,
    keepalive_intvl: int = 0,
    tcp_user_timeout: int = 0,
    stats_out: dict | None = None,
) -> Callable[[DataFrame, int], None]:
    """omfwd TCP forward (ref: tools/omfwd.c): RFC6587 framing —
    octet-counted (``LEN SP MSG``) or non-transparent (LF-terminated).
    One connection per partition per batch (the reference rebinds per
    interval; micro-batches give the same periodic rebind). UDP mode
    sends one datagram per message (lossy by contract, like the
    reference). ``tls`` is a ``streaming.gtls.TLSConfig`` — the
    StreamDriver gtls client side (cert/CA paths must be readable on
    every executor).

    ``stats_out``: when given, per-target statsobj counters in the
    reference's shape (omfwd.c:2091-2116 — name
    ``{TCP|UDP}-<target>-<port>``, counters ``bytes.sent``,
    ``messages.sent``, ``num.connects``; num.connects counts every
    TCP connect incl. pool re-routes, omfwd.c:1481 / ChangeLog
    2026-04-13) are summed into it across batches. Executors report
    the counts as mapPartitions output rows — no driver-side
    accumulators or collect of data rows needed."""
    if framing not in ("octet-counted", "lf"):
        raise ValueError(f"unknown framing {framing!r}")
    if protocol not in ("tcp", "udp"):
        raise ValueError(f"unknown protocol {protocol!r}")
    if tls is not None and protocol != "tcp":
        raise ValueError("tls requires protocol='tcp'")
    # compression.mode (tools/omfwd.c:153-157,243-245):
    # 'single' = legacy per-message zlib, payload 'z'+deflate BEFORE
    # framing (the '@@(zN)' selector form); 'stream:always' = the
    # connection byte stream is ONE deflate stream, Z_SYNC_FLUSH per
    # transmit when compression.stream.flushOnTXEnd is on so the
    # receiver can decode incrementally.
    comp = (compression or "none").lower()
    if comp not in ("none", "single", "stream:always"):
        raise ValueError(f"unknown compression.mode {compression!r}")
    if comp == "stream:always" and protocol != "tcp":
        raise ValueError(
            "omfwd: compression.mode='stream:always' is a TCP "
            "connection-stream mode; use 'single' with udp")
    cdrv = (compression_driver or "zlib").lower()
    zcodec = None
    if cdrv == "zstd":
        # resolve the codec ON THE DRIVER and close over it — the
        # injection never reaches Spark's Python workers by itself
        from rsyslog_spark.streaming.zstdcodec import get_codec
        zcodec = get_codec()
        if zcodec is None:
            raise ValueError(
                "omfwd: compression.driver='zstd' requires a zstd "
                "codec (the reference requires libzstd)")
    elif cdrv != "zlib":
        raise ValueError(
            f"unknown compression.driver {compression_driver!r}")
    # native load-balancing pool (omfwd.c target/port eCmdHdlrArray
    # :233,237; golden omfwd-lb-2target-basic.sh): N targets, one
    # message to ONE target, round-robin → an even split across
    # healthy targets; a failed target's share re-routes to the
    # survivors (omfwd-lb-2target-one_fail.sh). Round-robin here is
    # per PARTITION — exact 50/50 on one partition like the golden,
    # statistically even at cluster scale without serial state.
    hosts = list(host) if isinstance(host, (list, tuple)) else [host]
    ports = list(port) if isinstance(port, (list, tuple)) else [port]
    if len(ports) == 1 and len(hosts) > 1:
        ports = ports * len(hosts)
    if len(hosts) != len(ports):
        raise ValueError(
            f"omfwd: {len(hosts)} targets but {len(ports)} ports")
    targets = [(h, int(p)) for h, p in zip(hosts, ports)]
    host, port = targets[0]

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            import socket

            ka = ((keepalive_probes, keepalive_time,
                   keepalive_intvl) if keepalive else None)

            def tune(s) -> None:
                # tcp_user_timeout (ChangeLog 2026-06-29: bound how
                # long the kernel retransmits unACKed data before
                # the connection counts as failed) — Linux-only
                # option, recorded no-op elsewhere
                if tcp_user_timeout > 0 and hasattr(
                        socket, "TCP_USER_TIMEOUT"):
                    try:
                        s.setsockopt(socket.IPPROTO_TCP,
                                     socket.TCP_USER_TIMEOUT,
                                     int(tcp_user_timeout))
                    except OSError:
                        pass
            if protocol == "tcp" and len(targets) > 1:
                st = [[0, 0, 0] for _ in targets]
                _pool_send(rows, targets, framing=framing, tls=tls,
                           comp=comp, cdrv=cdrv,
                           level=compression_level,
                           flush_on_txend=flush_on_txend,
                           keepalive=ka, zcodec=zcodec, tuner=tune,
                           stats=st)
                return iter((i, *c) for i, c in enumerate(st))
            if protocol == "udp":
                # the reference's COMPRESS_SINGLE_MSG path runs
                # BEFORE the UDP/TCP fork (omfwd.c:1781,1810) — the
                # legacy '@(zN)host' selector compresses UDP
                # datagrams too (ActionSendZipLevel semantics)
                sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
                st = [[0, 0, 0] for _ in targets]
                try:
                    rr = 0
                    for r in rows:
                        payload = (r.l or "").encode("utf-8")
                        if comp == "single":
                            payload = _z_single(
                                payload, compression_level)
                        ti = rr % len(targets)
                        sock.sendto(payload, targets[ti])
                        # num.connects stays 0 — connectionless
                        st[ti][1] += 1
                        st[ti][2] += len(payload)
                        rr += 1
                finally:
                    sock.close()
                return iter((i, *c) for i, c in enumerate(st))
            st = [[0, 0, 0]]
            sock = socket.create_connection((host, port), timeout=30)
            st[0][0] += 1
            tune(sock)
            if ka is not None:
                # actionsendtcpkeepalive* / keepalive.* action params
                # (omfwd.c:215-218; applied nsd_ptcp.c EnableKeepAlive)
                from rsyslog_spark.streaming.bridges import (
                    apply_keepalive)
                apply_keepalive(sock, True, *ka)
            if tls is not None:
                from rsyslog_spark.streaming.gtls import (
                    check_peer, client_context)
                sock = client_context(tls).wrap_socket(
                    sock, server_hostname=host)
                check_peer(sock, tls)
            cobj = None
            if comp == "stream:always":
                if cdrv == "zstd":
                    cobj = zcodec.ZstdCompressor(
                        level=compression_level).compressobj()
                else:
                    import zlib
                    cobj = zlib.compressobj(compression_level)

            def send(data: bytes, *, final: bool = False) -> None:
                if cobj is None:
                    sock.sendall(data)
                    st[0][2] += len(data)
                    return
                out = cobj.compress(data)
                if final:
                    out += cobj.flush()
                elif flush_on_txend:
                    import zlib
                    out += cobj.flush(zlib.Z_SYNC_FLUSH) \
                        if cdrv == "zlib" else b""
                if out:
                    sock.sendall(out)
                    st[0][2] += len(out)
            try:
                buf = bytearray()
                for r in rows:
                    payload = (r.l or "").encode("utf-8")
                    if comp == "single":
                        payload = _z_single(
                            payload, compression_level)
                    if framing == "octet-counted":
                        buf += str(len(payload)).encode() + b" " + payload
                    else:
                        buf += payload + b"\n"
                    st[0][1] += 1
                    if len(buf) >= 256 * 1024:
                        send(bytes(buf))
                        buf.clear()
                send(bytes(buf), final=True)
            finally:
                sock.close()
            return iter((i, *c) for i, c in enumerate(st))

        # each partition reports (target_idx, connects, msgs, bytes)
        # rows — tiny (#partitions × #targets tuples), summed here
        # into the per-target statsobj counters
        counts = lines.rdd.mapPartitions(per_partition).collect()
        if stats_out is not None:
            pfx = "TCP" if protocol == "tcp" else "UDP"
            for i, conn_n, msg_n, byte_n in counts:
                tname = f"{pfx}-{targets[i][0]}-{targets[i][1]}"
                ctr = stats_out.setdefault(tname, {
                    "bytes.sent": 0, "messages.sent": 0,
                    "num.connects": 0})
                ctr["num.connects"] += conn_n
                ctr["messages.sent"] += msg_n
                ctr["bytes.sent"] += byte_n

    return write


def dynafile_partition_spec(template_str: str,
                            secure_paths: bool = False):
    """omfile dynafile template → (base_dir, partition_cols, col_exprs)
    (SURVEY §4.1 custom rewrite (c): template→partitionBy extraction).

    ``/var/log/%hostname%/%syslogfacility-text%.log`` becomes base
    ``/var/log`` partitioned by the referenced properties — the LRU
    dynafile fd cache (tools/omfile.c:133-140 iDynaFileCacheSize)
    disappears: the committer handles concurrent partition dirs.
    Returns Column expressions so callers do
    ``df.withColumns(...).write.partitionBy(*cols)``.

    ``secure_paths`` applies the secpath=replace sanitizer to every
    property value ('/'→'_', '..'→'_') — the
    global(compatibility.defaults.secure="strict") dynafile default
    (goldens: compat-defaults-secure-dynafile-*.sh — 'a/b' lands in
    the a_b file, never a subdirectory).
    """
    from rsyslog_spark.templates import (
        Prop, compile_template_string, secpath_sanitize)

    tpl = compile_template_string(template_str)
    consts: list[str] = []
    cols: dict = {}
    for part in tpl.parts:
        if isinstance(part, Prop):
            c = part.col()
            if secure_paths:
                c = secpath_sanitize(c, "replace")
            cols[f"pt_{part.name.replace('!', '_').lstrip('$.')}"] = c
        elif not cols:          # constants before the first property
            consts.append(part)
    base = "".join(consts)
    base = base.rstrip("/") or "."
    # Resolve relative bases against the *Python* CWD at spec time:
    # Spark would otherwise anchor "." to the JVM's launch directory,
    # which a caller's chdir can never move.
    if not base.startswith(("/", "file:", "hdfs:", "s3")):
        base = os.path.abspath(base)
    return base, list(cols), cols


def omfile_dynafile_batch(
    df: DataFrame,
    template_str: str,
    fmt: str = "parquet",
    secure_paths: bool = False,
    line: Column | None = None,
    zip_level: int = 0,
) -> None:
    """Batch dynafile write: derive partition columns from the
    template and write under the constant prefix. With ``line`` (the
    action's rendered line template — '?dynfile;outfmt', ref:
    tools/omfile.c cflineParseDynaFile) the output is TEXT lines
    like the reference's, still partitioned by the dynafile's
    property columns. ``zip_level`` > 0 is omfile's iZipLevel
    (tools/omfile.c zipLevel param): the per-dynafile output files
    compress with the gzip codec — the Spark container analog of
    the reference's zlib-compressed log writer."""
    base, names, exprs = dynafile_partition_spec(
        template_str, secure_paths=secure_paths)
    out = df
    for n, c in exprs.items():
        out = out.withColumn(n, c)
    # Cluster rows by the dynafile partition columns before the
    # partitioned write (AQE REBALANCE): without it every write task
    # opens a file in every partition dir it sees — T tasks × P
    # dynafiles files, measured 512 gzip files of ~380 bytes median
    # for a 40-dynafile sf0.1 stream. Rebalance makes each partition
    # value land in as few tasks as possible (T×P → ~P files) while
    # AQE still SPLITS an oversized partition value across tasks, so
    # a hot dynafile (one giant host) never serializes onto a single
    # writer at scale — the skew-safe form of repartition(cols).
    if line is not None:
        # render BEFORE the rebalance exchange so the shuffle carries
        # exactly (value, partition cols) — nothing else crosses
        out = out.select(
            F.regexp_replace(line, r"\n$", "").alias("value"), *names)
        if names:
            out = out.hint("rebalance", *names)
        w = out.write.mode("append")
        if zip_level > 0:
            w = w.option("compression", "gzip")
        if names:
            w = w.partitionBy(*names)
        w.format("text").save(base)
        return
    if names:
        out = out.hint("rebalance", *names)
    w = out.write.mode("append").partitionBy(*names)
    if zip_level > 0:
        w = w.option("compression", "gzip")
    w.format(fmt).save(base)


def rotation_cut_points(sizes: Sequence[int], limit: int) -> list[int]:
    """omfile size-capped rotation boundary calculator (ref:
    runtime/outchannel.c uSizeLimit + tools/omfile.c:497-500: after
    each write the current file size is checked; once it EXCEEDS the
    limit the file rotates, so the crossing record stays in the old
    file). Given per-record byte sizes in write order, returns the
    indices that START a new file. limit<=0 → no rotation (index 0
    only). Every closed (non-final) file's size therefore exceeds
    ``limit`` while its size minus its last record does not — the
    invariant the dynafile/zip oracle checks."""
    cuts = [0] if sizes else []
    acc = 0
    for i, s in enumerate(sizes):
        if limit > 0 and acc > limit:
            cuts.append(i)
            acc = 0
        acc += int(s)
    return cuts


def discard_watermark_gate(
    write_fn: Callable[[DataFrame, int], None],
    *,
    high_watermark_rows: int,
    discard_severity: int = 8,
) -> Callable[[DataFrame, int], None]:
    """Queue discard mark (ref: runtime/queue.h:119-122 iDiscardMrk /
    iDiscardSeverity): when a micro-batch exceeds the high watermark,
    rows AT OR ABOVE the discard severity (numerically >=, i.e. less
    important) are dropped before the write — the reference's
    overload-shedding policy made explicit. discard_severity=8 never
    drops (severities are 0-7), matching the reference default."""

    def gated(batch_df: DataFrame, batch_id: int) -> None:
        if discard_severity <= 7:
            n = batch_df.count()
            if n > high_watermark_rows:
                batch_df = batch_df.filter(
                    F.col("syslogseverity") < discard_severity)
        write_fn(batch_df, batch_id)

    return gated

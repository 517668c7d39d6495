"""Network/system input bridges: imudp, imuxsock, imhttp, imjournal,
imdocker.

The reference's socket-style inputs (plugins/imudp/imudp.c,
plugins/imuxsock/imuxsock.c, contrib/imhttp/imhttp.c) run an OS
receive loop that feeds the main message queue. Spark's analog of the
main queue is the file/Kafka source — so each bridge here is a small
receive loop that spools complete files into a directory which a
Structured Streaming ``json``/``text`` source tails. This is the
production cluster shape too: per-executor listening sockets don't
exist on a 1000-node cluster; a fleet of lightweight receivers writes
to object storage / Kafka and Spark consumes that. The bridge IS that
receiver, colocated for the single-node case.

Spool protocol: each flush writes one NDJSON file atomically
(tmp-name + rename) so the file source never sees partial files —
the same contract the reference's imfile state-file tracking assumes
(plugins/imfile/imfile.c polling complete lines only).

imjournal / imdocker need no receive loop at all: journald's export
format and Docker's json-file log driver are already durable files,
parsed here as pure Spark column expressions (no UDF).
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def inflate_legacy_z(m: bytes) -> bytes | None:
    """Legacy single-message decompression (parser.c:262
    uncompressMessage): payload 'z' + zlib stream inflates; inflate
    failure → None (the reference drops the message, "Message
    ignored"). Guarded on the zlib CMF byte so ordinary text
    starting with 'z' passes through untouched (a protective
    narrowing of the reference's first-byte-only check)."""
    if m[:1] != b"z" or m[1:2] != b"\x78":
        return m
    import zlib
    try:
        return zlib.decompress(m[1:])
    except zlib.error:
        return None


def apply_keepalive(sock, enable: bool, probes: int = 0,
                    idle_time: int = 0, intvl: int = 0) -> dict:
    """TCP keepalive tuning (nsd_ptcp.c:904 EnableKeepAlive;
    imtcp.c/imptcp.c/omfwd.c keepalive{,.probes,.time,.interval}
    params): SO_KEEPALIVE on, then each TCP_* knob where the value
    is >0 AND the platform defines the option — absence or a
    setsockopt failure is a recorded no-op, exactly the reference's
    ``#if defined(...)`` guards + dbgprintf-and-continue. Returns
    what was actually applied (None = attempted but refused)."""
    applied: dict = {}
    if not enable:
        return applied
    try:
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_KEEPALIVE, 1)
        applied["keepalive"] = True
    except OSError:
        applied["keepalive"] = False
    for optname, val, key in (
            ("TCP_KEEPCNT", probes, "probes"),
            ("TCP_KEEPIDLE", idle_time, "time"),
            ("TCP_KEEPINTVL", intvl, "interval")):
        if val and hasattr(socket, optname):
            try:
                sock.setsockopt(socket.IPPROTO_TCP,
                                getattr(socket, optname), int(val))
                applied[key] = int(val)
            except OSError:
                applied[key] = None
    return applied


class SpoolBridge:
    """Receive-loop → atomic NDJSON spool files → streaming source.

    Subclasses implement ``_serve`` to push dicts via ``self.emit``.
    ``stream(spark)`` returns the streaming frame over the spool;
    ``flush()`` forces a spool rotation (tests call it before an
    availableNow drain). Ref analog: the listener thread pool in
    runtime/wtp.c feeding runtime/queue.c — here the queue is the
    spool directory and Spark's own micro-batching replaces dequeue
    batching.
    """

    #: columns every bridge emits (subclasses may add more)
    schema = "line string, fromhost string, timegenerated timestamp"

    #: per-input ruleset binding (input(... ruleset="x") —
    #: imtcp.c:140 pszBindRuleset): when set, every record this
    #: bridge spools carries it in the 'binding' column so a shared
    #: spool can fan out per input's ruleset downstream
    ruleset: str | None = None

    def __init__(self, spool_dir: str, *, inputname: str,
                 flush_every: int = 512, flush_secs: float = 0.5,
                 allowed_senders: list[str] | None = None):
        self.spool_dir = spool_dir
        self.inputname = inputname
        self.flush_every = flush_every
        self.flush_secs = flush_secs
        os.makedirs(spool_dir, exist_ok=True)
        self._buf: list[dict] = []
        self._lock = threading.Lock()
        self._seq = 0
        # several bridges may SHARE one spool directory (multi-input
        # configs — each input() starts its own listener, rsconf.c
        # activates them all); the instance token keeps their spool
        # files collision-free
        self._uid = f"{id(self):x}"
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        #: pending internal messages (severity, text) — lifecycle
        #: notifications (e.g. imptcp connection open/close,
        #: imptcp.c:951,1835) the config runtime drains per
        #: micro-batch and routes through the internalmsg gate
        self._internal_msgs: list[tuple[int, str]] = []
        # $AllowedSender ACL (ref: runtime/net.c AllowedSenders —
        # IPs and CIDR nets; None = allow all, the reference default)
        self._acl = None
        if allowed_senders is not None:
            import ipaddress

            self._acl = [
                ipaddress.ip_network(e, strict=False)
                for e in allowed_senders
            ]

    def sender_allowed(self, ip: str) -> bool:
        if self._acl is None:
            return True
        import ipaddress

        try:
            a = ipaddress.ip_address(ip)
        except ValueError:
            return False
        return any(a in net for net in self._acl)

    # -- receive side -------------------------------------------------
    _ts_cache: tuple[int, str] = (0, "")

    def _now_str(self) -> str:
        """Receive timestamp, memoized per wall-clock second —
        second resolution is the spool stamp's own granularity, so
        re-running strftime per message only burned CPU. Explicit
        +00:00 offset: without it the json source parses the UTC wall
        time as SESSION-local time, shifting every bridge timestamp
        on non-UTC sessions."""
        t = int(time.time())
        if t != self._ts_cache[0]:
            self._ts_cache = (
                t, time.strftime("%Y-%m-%dT%H:%M:%S+00:00",
                                 time.gmtime(t)))
        return self._ts_cache[1]

    def emit(self, rec: dict) -> None:
        rec.setdefault("timegenerated", self._now_str())
        with self._lock:
            self._buf.append(rec)
            if len(self._buf) >= self.flush_every:
                self._flush_locked()

    def emit_many(self, recs: list[dict]) -> None:
        """Batch emit: one receive-time stamp and ONE lock round trip
        for a whole parsed chunk — the hot path for stream inputs
        (per-record emit() was the imtcp ingest bottleneck: 400k
        one-record lock+strftime trips cost more than the socket
        reads themselves)."""
        ts = self._now_str()
        for r in recs:
            r.setdefault("timegenerated", ts)
        with self._lock:
            self._buf.extend(recs)
            if len(self._buf) >= self.flush_every:
                self._flush_locked()

    def emit_internal(self, severity: int, text: str) -> None:
        """Queue a lifecycle internal message (LogMsg analog)."""
        with self._lock:
            self._internal_msgs.append((int(severity), text))

    def drain_internal_msgs(self) -> list[tuple[int, str]]:
        with self._lock:
            out, self._internal_msgs = self._internal_msgs, []
        return out

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buf:
            return
        self._seq += 1
        name = (f"{self.inputname}-{os.getpid()}-{self._uid}-"
                f"{self._seq:08d}.ndjson")
        # stamp the record's origin so shared-spool streams can
        # route per input (%inputname% property) and per bound
        # ruleset (imtcp.c ruleset= → 'binding')
        for rec in self._buf:
            rec.setdefault("inputname", self.inputname)
            if self.ruleset:
                rec.setdefault("binding", self.ruleset)
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        dumps = json.dumps
        with open(tmp, "w") as f:
            f.write("\n".join(dumps(rec, ensure_ascii=False)
                              for rec in self._buf) + "\n")
        os.rename(tmp, os.path.join(self.spool_dir, name))
        self._buf = []

    def _flusher(self) -> None:
        while not self._stop.wait(self.flush_secs):
            self.flush()
        self.flush()

    def start(self) -> "SpoolBridge":
        t = threading.Thread(target=self._serve, daemon=True)
        f = threading.Thread(target=self._flusher, daemon=True)
        self._threads = [t, f]
        t.start()
        f.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._shutdown()
        for t in self._threads:
            t.join(timeout=5)
        self.flush()

    def _serve(self) -> None:  # pragma: no cover - subclass hook
        raise NotImplementedError

    def _shutdown(self) -> None:
        """Unblock the serve loop (subclass hook)."""

    # -- Spark side ---------------------------------------------------
    def stream(self, spark: SparkSession,
               max_files_per_trigger: int | None = None,
               schema: str | None = None) -> DataFrame:
        """``schema`` override: the UNION schema when several bridges
        share this spool (missing NDJSON keys read as null)."""
        sch = schema or self.schema
        if "inputname" not in sch:
            sch += ", inputname string"
        if "binding" not in sch:
            sch += ", binding string"
        reader = spark.readStream.schema(sch).format("json")
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger",
                                   max_files_per_trigger)
        return (
            reader.load(self.spool_dir)
            .withColumn("inputname",
                        F.coalesce(F.col("inputname"),
                                   F.lit(self.inputname)))
        )

    def batch(self, spark: SparkSession,
              schema: str | None = None) -> DataFrame:
        """Batch read of everything spooled so far (test drains)."""
        sch = schema or self.schema
        if "inputname" not in sch:
            sch += ", inputname string"
        if "binding" not in sch:
            sch += ", binding string"
        return (
            spark.read.schema(sch).format("json")
            .load(self.spool_dir)
            .withColumn("inputname",
                        F.coalesce(F.col("inputname"),
                                   F.lit(self.inputname)))
        )


class imudp(SpoolBridge):
    """UDP syslog receiver (ref: plugins/imudp/imudp.c).

    The reference receives with ``recvmmsg`` in batches of
    ``batchSize`` datagrams (imudp.c:145-170) and stamps fromhost from
    the peer address; the bridge mirrors both: a bounded ``recvfrom``
    loop batching into one spool flush, fromhost = sender IP. One
    datagram = one message (no framing — UDP syslog's defining
    property, RFC 5426 §3.1).
    """

    def __init__(self, spool_dir: str, *, host: str = "127.0.0.1",
                 port: int = 0, rcvbuf: int = 8 * 1024 * 1024,
                 support_compression_extension: bool = True, **kw):
        super().__init__(spool_dir, inputname="imudp", **kw)
        #: legacy 'z'+zlib datagrams inflate here — the reference
        #: decompresses at the PARSER stage for every transport
        #: (runtime/parser.c:262 uncompressMessage,
        #: bSupportCompressionExtension), so '@(zN)host' UDP
        #: senders round-trip
        self.support_compression_extension = \
            support_compression_extension
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # big kernel receive buffer absorbs sender bursts while the
        # userspace loop drains (the reference's $UDPRcvBufSize /
        # rcvbufsize knob — UDP has no backpressure, the buffer IS
        # the loss margin)
        try:
            self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                                 rcvbuf)
        except OSError:
            pass
        self.sock.bind((host, port))
        self.sock.setblocking(False)
        self.port = self.sock.getsockname()[1]

    #: recvmmsg-analog batch bound (imudp.c batchSize default 32;
    #: ours is higher because the Python syscall is the costly part)
    BATCH = 1024

    def _serve(self) -> None:
        import select

        while not self._stop.is_set():
            try:
                ready, _, _ = select.select([self.sock], [], [], 0.2)
            except OSError:
                break
            if not ready:
                continue
            # drain whatever is queued (the reference's recvmmsg
            # batch, imudp.c:145-170): one emit_many per wakeup
            # instead of one lock+stamp per datagram
            batch = []
            recvfrom = self.sock.recvfrom
            while len(batch) < self.BATCH:
                try:
                    batch.append(recvfrom(65535))
                except BlockingIOError:
                    break
                except OSError:
                    return
            if self.support_compression_extension:
                batch = [(b, a) for b, a in
                         ((inflate_legacy_z(d), a) for d, a in batch)
                         if b is not None]
            recs = [
                {"line": d.decode("utf-8", errors="replace")
                         .rstrip("\n"),
                 "fromhost": a[0]}
                for d, a in batch if self.sender_allowed(a[0])
            ]  # unlisted senders silently dropped (net.c
               # isAllowedSender)
            if recs:
                self.emit_many(recs)

    def _shutdown(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class imuxsock(SpoolBridge):
    """Unix datagram socket receiver — the /dev/log path (ref:
    plugins/imuxsock/imuxsock.c). SOCK_DGRAM like the reference
    (imuxsock.c creates a DGRAM socket; one datagram = one message);
    fromhost is the local hostname, as imuxsock sets it.

    Per-PID rate limiting (imuxsock.c:640-694: SCM_CREDENTIALS pid
    keys a per-sender ratelimiter; defaults interval 0 = off, burst
    200): with ``ratelimit_interval`` > 0, SO_PASSCRED is enabled
    and each sender pid gets ``ratelimit_burst`` messages per
    interval, excess dropped. The cache is BOUNDED (ChangeLog
    2026-04-13 "imuxsock: bound per-pid ratelimiter cache"): before
    inserting a new pid, dead senders are pruned
    (prunePidRatelimiters — kill(pid,0) liveness) and the table is
    capped at MAX_DYNAMIC_RATELIMITERS=4096 entries
    (enforcePidRatelimiterCap evicts one) so short-lived senders
    cannot grow state for the daemon's lifetime.
    """

    #: imuxsock.c:193 MAX_DYNAMIC_RATELIMITERS
    MAX_DYNAMIC_RATELIMITERS = 4096

    def __init__(self, spool_dir: str, *, sock_path: str,
                 ratelimit_interval: int = 0,
                 ratelimit_burst: int = 200, **kw):
        super().__init__(spool_dir, inputname="imuxsock", **kw)
        if os.path.exists(sock_path):
            os.unlink(sock_path)
        self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
        self.sock.bind(sock_path)
        self.sock.settimeout(0.2)
        self.sock_path = sock_path
        self._localhost = socket.gethostname()
        self.rl_interval = int(ratelimit_interval)
        self.rl_burst = int(ratelimit_burst)
        #: pid → [window_start, admitted_in_window]
        self._pid_rl: dict[int, list] = {}
        if self.rl_interval > 0 and hasattr(socket, "SO_PASSCRED"):
            self.sock.setsockopt(socket.SOL_SOCKET,
                                 socket.SO_PASSCRED, 1)

    def _prune_pid_ratelimiters(self) -> None:
        """Drop state for dead senders (imuxsock.c:696-723: kill(pid,
        0) == 0 or EPERM means alive; everything else is reaped)."""
        dead = []
        for pid in self._pid_rl:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                dead.append(pid)
            except PermissionError:
                pass  # alive, owned by someone else
            except OSError:
                dead.append(pid)
        for pid in dead:
            del self._pid_rl[pid]

    def _pid_admitted(self, pid: int | None) -> bool:
        if self.rl_interval <= 0 or pid is None:
            return True
        rl = self._pid_rl.get(pid)
        if rl is None:
            # new sender: prune the dead, then cap (imuxsock.c:
            # 643-644 — prune THEN enforce, both before insert)
            self._prune_pid_ratelimiters()
            if len(self._pid_rl) >= self.MAX_DYNAMIC_RATELIMITERS:
                # evict one arbitrary entry to stay bounded
                self._pid_rl.pop(next(iter(self._pid_rl)))
            rl = self._pid_rl[pid] = [time.monotonic(), 0]
        now = time.monotonic()
        if now - rl[0] >= self.rl_interval:
            rl[0], rl[1] = now, 0
        rl[1] += 1
        return rl[1] <= self.rl_burst

    def _recv_with_pid(self) -> tuple[bytes, int | None]:
        if self.rl_interval <= 0 or not hasattr(socket,
                                                "SO_PASSCRED"):
            return self.sock.recv(65535), None
        import struct as _struct
        data, anc, _flags, _addr = self.sock.recvmsg(
            65535, socket.CMSG_SPACE(_struct.calcsize("3i")))
        pid = None
        for lvl, typ, cd in anc:
            if lvl == socket.SOL_SOCKET and \
                    typ == socket.SCM_CREDENTIALS:
                pid = _struct.unpack("3i", cd[:12])[0]
        return data, pid

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                data, pid = self._recv_with_pid()
            except socket.timeout:
                continue
            except OSError:
                break
            if not self._pid_admitted(pid):
                continue
            self.emit({
                "line": data.decode("utf-8", errors="replace")
                            .rstrip("\n"),
                "fromhost": self._localhost,
            })

    def _shutdown(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass
        if os.path.exists(self.sock_path):
            try:
                os.unlink(self.sock_path)
            except OSError:
                pass


def _apr1_crypt(password: str, salt: str) -> str:
    """Apache's apr1 MD5 password scheme (the htpasswd default) —
    the public APR algorithm (apr_md5_encode): 1000-round MD5 with
    the password/salt interleave, custom base64 alphabet. Needed
    because stdlib crypt(3) never supported apr1 and is removed in
    Python 3.13."""
    import hashlib

    pw = password.encode()
    sl = salt.encode()[:8]
    ctx = hashlib.md5(pw + b"$apr1$" + sl)
    inner = hashlib.md5(pw + sl + pw).digest()
    plen = len(pw)
    ctx.update((inner * (plen // 16 + 1))[:plen])
    i = plen
    while i:
        ctx.update(b"\0" if i & 1 else pw[:1])
        i >>= 1
    digest = ctx.digest()
    for r in range(1000):
        c = hashlib.md5()
        c.update(pw if r & 1 else digest)
        if r % 3:
            c.update(sl)
        if r % 7:
            c.update(pw)
        c.update(digest if r & 1 else pw)
        digest = c.digest()
    itoa64 = (b"./0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
              b"abcdefghijklmnopqrstuvwxyz")
    out = []
    for a, b, c_ in ((0, 6, 12), (1, 7, 13), (2, 8, 14),
                     (3, 9, 15), (4, 10, 5)):
        v = (digest[a] << 16) | (digest[b] << 8) | digest[c_]
        for _ in range(4):
            out.append(itoa64[v & 0x3F])
            v >>= 6
    v = digest[11]
    out.append(itoa64[v & 0x3F])
    out.append(itoa64[(v >> 6) & 0x3F])
    return "$apr1$" + sl.decode() + "$" + bytes(out).decode()


class imhttp(SpoolBridge):
    """HTTP message intake (ref: contrib/imhttp/imhttp.c, a civetweb
    server with a configurable ``endpoint``).

    POST <endpoint> with newline-framed messages in the body — each
    line becomes a message (the reference's default framing). Other
    paths get 404; GET /healthz returns 200 like the reference's
    liveness probe support.
    """

    #: request-body hardening defaults (ref: contrib/imhttp —
    #: 2026-04-24 hardening: bound accepted bodies and decompression
    #: expansion so a hostile client can't make the server allocate)
    DEFAULT_MAX_BODY = 8 * 1024 * 1024          # 8 MiB wire bytes
    DEFAULT_MAX_EXPANSION = 64 * 1024 * 1024    # 64 MiB decompressed

    def __init__(self, spool_dir: str, *, host: str = "127.0.0.1",
                 port: int = 0, endpoint: str = "/postrequest",
                 basic_auth_file: str | None = None,
                 api_key_file: str | None = None,
                 healthcheck_basic_auth_file: str | None = None,
                 metrics_basic_auth_file: str | None = None,
                 stats_provider=None,
                 max_body_bytes: int | None = None,
                 max_expanded_bytes: int | None = None, **kw):
        super().__init__(spool_dir, inputname="imhttp", **kw)
        self.endpoint = endpoint
        #: health/metrics endpoint gating + stats source (ChangeLog
        #: 2025-09-03: healthCheckBasicAuthFile /
        #: metricsBasicAuthFile module params; /metrics exports
        #: Prometheus-format stats with Content-Length).
        #: ``stats_provider() -> list[dict]`` supplies impstats JSON
        #: objects (e.g. ImpstatsListener.snapshot)
        self.healthcheck_basic_auth_file = healthcheck_basic_auth_file
        self.metrics_basic_auth_file = metrics_basic_auth_file
        self.stats_provider = stats_provider
        self.max_body_bytes = (
            self.DEFAULT_MAX_BODY if max_body_bytes is None
            else int(max_body_bytes))
        self.max_expanded_bytes = (
            self.DEFAULT_MAX_EXPANSION if max_expanded_bytes is None
            else int(max_expanded_bytes))
        #: route auth (imhttp.c:196-198 basicauthfile/apikeyfile;
        #: routeAuthHandler:1216 — explicit Basic wins when its
        #: header is presented, API key 'Authorization: ApiKey tok'
        #: is the fallback; 2026-04-17 refactor + 2026-06-26
        #: fallback-after-Basic-failure fix)
        self.basic_auth_file = basic_auth_file
        self.api_key_file = api_key_file
        import http.server

        bridge = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                # health/metrics hardening (ChangeLog 2025-09-03):
                # both endpoints can be htpasswd-gated independently
                # (healthCheckBasicAuthFile / metricsBasicAuthFile);
                # /metrics exports Prometheus stats with an explicit
                # Content-Length plus the imhttp_up gauge
                if self.path == "/healthz":
                    if not bridge._basic_ok(
                            self.headers.get("Authorization"),
                            bridge.healthcheck_basic_auth_file):
                        self.send_response(401)
                        self.send_header(
                            "WWW-Authenticate",
                            'Basic realm="User Visible Realm"')
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.end_headers()
                    return
                if self.path == "/metrics":
                    if not bridge._basic_ok(
                            self.headers.get("Authorization"),
                            bridge.metrics_basic_auth_file):
                        self.send_response(401)
                        self.send_header(
                            "WWW-Authenticate",
                            'Basic realm="User Visible Realm"')
                        self.end_headers()
                        return
                    try:
                        from rsyslog_spark.streaming.impstats import (
                            impstats_to_prometheus)
                        objs = (bridge.stats_provider()
                                if bridge.stats_provider else [])
                        body = impstats_to_prometheus(objs)
                    except Exception:  # noqa: BLE001 — unified 500
                        self.send_response(500)
                        self.end_headers()
                        return
                    body += ("# TYPE imhttp_up gauge\n"
                             "imhttp_up 1\n")
                    raw = body.encode("utf-8")
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(raw)))
                    self.end_headers()
                    self.wfile.write(raw)
                    return
                self.send_response(404)
                self.end_headers()

            def do_POST(self):
                if self.path != bridge.endpoint:
                    self.send_response(404)
                    self.end_headers()
                    return
                if not bridge._authorized(
                        self.headers.get("Authorization")):
                    # sendUnauthorized (imhttp.c:1186-1204): Basic
                    # challenge only when htpasswd auth is configured
                    self.send_response(401)
                    if bridge.basic_auth_file:
                        self.send_header(
                            "WWW-Authenticate",
                            'Basic realm="User Visible Realm"')
                    self.end_headers()
                    return
                # oversized Content-Length is rejected BEFORE any
                # read/allocation (2026-04-24 hardening: 413,
                # Connection: close — reading the body would let a
                # hostile client pick our allocation size)
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    self.send_response(400)
                    self.end_headers()
                    return
                if n < 0 or n > bridge.max_body_bytes:
                    self.send_response(413)
                    self.send_header("Connection", "close")
                    self.end_headers()
                    self.close_connection = True
                    return
                raw = self.rfile.read(n)
                # Content-Encoding: gzip / deflate POST bodies
                # (imhttp.c handles compressed payloads via civetweb;
                # golden imhttp-post-payload-compress.sh). A body
                # that fails to decode answers 400 and is dropped;
                # expansion is bounded with an incremental
                # decompressobj(max_length) loop so a zip bomb is
                # refused at the cap instead of allocated (413).
                enc = (self.headers.get("Content-Encoding") or "") \
                    .lower()
                if enc in ("gzip", "deflate", "x-gzip"):
                    import zlib as _zl
                    wbits = (_zl.MAX_WBITS | 16 if "gzip" in enc
                             else _zl.MAX_WBITS)
                    d = _zl.decompressobj(wbits)
                    out, cap = [], bridge.max_expanded_bytes
                    got, data = 0, raw
                    try:
                        while True:
                            chunk = d.decompress(data, 65536)
                            got += len(chunk)
                            if got > cap:
                                self.send_response(413)
                                self.send_header("Connection",
                                                 "close")
                                self.end_headers()
                                self.close_connection = True
                                return
                            out.append(chunk)
                            data = b""
                            if d.unconsumed_tail:
                                data = d.unconsumed_tail
                            elif d.eof or not chunk:
                                break
                        raw = b"".join(out)
                    except _zl.error:
                        self.send_response(400)
                        self.end_headers()
                        return
                body = raw.decode("utf-8", errors="replace")
                for ln in body.splitlines():
                    if ln.strip():
                        bridge.emit({
                            "line": ln,
                            "fromhost": self.client_address[0],
                        })
                self.send_response(200)
                self.end_headers()

        self.httpd = http.server.ThreadingHTTPServer((host, port),
                                                     Handler)
        self.port = self.httpd.server_address[1]

    @staticmethod
    def _pw_ok(presented: str, stored: str) -> bool:
        """htpasswd entry check (read_auth_file → apr_password_
        validate, imhttp.c:1008-1044): '{SHA}' base64-SHA1, crypt(3)
        '$'-prefixed hashes where the platform supports the scheme,
        else plain comparison. Comments/blank lines skipped by the
        caller."""
        if stored.startswith("{SHA}"):
            import base64
            import hashlib
            return base64.b64encode(
                hashlib.sha1(presented.encode()).digest()
            ).decode() == stored[5:]
        if stored.startswith("$apr1$"):
            # apr1 (htpasswd's default MD5 scheme) implemented
            # directly — the stdlib 'crypt' module is removed in
            # Python 3.13 and never supported apr1 anyway
            parts = stored.split("$")
            if len(parts) < 4:
                return False
            return _apr1_crypt(presented, parts[2]) == stored
        if stored.startswith("$"):
            try:
                import crypt  # removed in Python 3.13
            except ImportError:
                import warnings
                warnings.warn(
                    "imhttp basicAuthFile: '$'-prefixed htpasswd "
                    f"hash {stored[:4]!r}... needs the stdlib crypt "
                    "module, which this Python lacks (removed in "
                    "3.13) - auth fails closed for this entry",
                    RuntimeWarning, stacklevel=2)
                return False
            try:
                return crypt.crypt(presented, stored) == stored
            except Exception:  # noqa: BLE001 — unsupported scheme
                return False
        return presented == stored

    def _basic_ok(self, auth_header: str | None,
                  htpasswd_file: str | None) -> bool:
        """Basic-auth gate for the health/metrics endpoints — open
        when no file is configured (the reference attaches the auth
        handler only when the param is set)."""
        if not htpasswd_file:
            return True
        hdr = auth_header or ""
        if not hdr.lower().startswith("basic "):
            return False
        import base64
        try:
            user, _, pw = base64.b64decode(
                hdr[6:].strip()).decode().partition(":")
        except Exception:  # noqa: BLE001 — malformed header
            return False
        if not user:
            return False
        try:
            with open(htpasswd_file, encoding="utf-8") as fh:
                for ln in fh:
                    ln = ln.strip()
                    if not ln or ln.startswith("#"):
                        continue
                    u, _, stored = ln.partition(":")
                    if u.lower() == user.lower():
                        return self._pw_ok(pw, stored)
        except OSError:
            pass
        return False

    def _authorized(self, auth_header: str | None) -> bool:
        if not self.basic_auth_file and not self.api_key_file:
            return True
        hdr = auth_header or ""
        # explicit Basic wins when configured AND presented
        if self.basic_auth_file and hdr.lower().startswith("basic "):
            import base64
            try:
                user, _, pw = base64.b64decode(
                    hdr[6:].strip()).decode().partition(":")
            except Exception:  # noqa: BLE001 — malformed header
                user = pw = ""
            if user:
                try:
                    with open(self.basic_auth_file,
                              encoding="utf-8") as fh:
                        for ln in fh:
                            ln = ln.strip()
                            if not ln or ln.startswith("#"):
                                continue
                            u, _, stored = ln.partition(":")
                            if u.lower() == user.lower():
                                if self._pw_ok(pw, stored):
                                    return True
                                break
                except OSError:
                    pass
        # API key fallback: 'Authorization: ApiKey <token>' vs the
        # one-token-per-line file (read_api_key_file)
        if self.api_key_file and hdr.lower().startswith("apikey "):
            token = hdr[7:].strip()
            if token:
                try:
                    with open(self.api_key_file,
                              encoding="utf-8") as fh:
                        for ln in fh:
                            ln = ln.strip()
                            if ln and not ln.startswith("#") \
                                    and ln == token:
                                return True
                except OSError:
                    pass
        return False

    def _serve(self) -> None:
        self.httpd.serve_forever(poll_interval=0.2)

    def _shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


# ---------------------------------------------------------------------
# File-format inputs: pure Spark column parsing, no receive loop.
# ---------------------------------------------------------------------

def imjournal(spark: SparkSession, path: str, *,
              streaming: bool = False,
              namespace: str | None = None,
              remote: bool = False) -> DataFrame:
    """systemd journal intake via the journal **export format**
    (ref: plugins/imjournal/imjournal.c, which maps journal fields to
    message properties in readJSONfromJournalMsg, imjournal.c:434-470).

    The sd-journal C API isn't a Spark-able source; the public,
    durable representation is ``journalctl -o export`` — blank-line
    separated entries of ``FIELD=value`` lines. Parsing is all JVM
    column work: wholetext → paragraph split → map_from_entries.
    Field mapping follows the reference: MESSAGE→msg,
    PRIORITY→syslogseverity, SYSLOG_FACILITY→syslogfacility,
    SYSLOG_IDENTIFIER→tag (fallback _COMM), _HOSTNAME→hostname,
    _PID→procid, __REALTIME_TIMESTAMP (µs)→timereported.
    Divergence: binary journal fields (length-prefixed) are skipped —
    they contain no ``=`` in their first line and drop out of the
    key=value filter; the reference base64s them.

    ``namespace`` (ChangeLog 2026-06-29; imjournal.c:134 "namespace"
    modpblk + 1426-1438 checkCnf): reads a specific journal
    namespace. journald stores a namespace's journal under
    ``<dir>.<namespace>/`` (sd_journal_open_namespace's
    SD_JOURNAL_TAKE_DIRECTORY layout), so the export-file analog
    reads ``<path>.<namespace>`` instead of ``path``. Validation is
    the reference's: an empty Namespace is rejected, and Namespace
    together with ``remote`` (journal-remote intake) is rejected.
    """
    if namespace is not None:
        if namespace == "":
            raise ValueError("imjournal: Namespace must not be empty")
        if remote:
            raise ValueError(
                "imjournal: Namespace and Remote cannot be enabled "
                "together")
        path = path.rstrip("/") + "." + namespace
    reader = (spark.readStream if streaming else spark.read)
    raw = (reader.format("text").option("wholetext", True).load(path)
           .select(F.col("value").alias("content")))
    entry = F.explode(
        F.split("content", r"\n(?:[ \t]*\n)+")).alias("entry")
    ent = raw.select(entry).filter(F.trim("entry") != "")
    return journal_entry_map(ent, "entry")


def journal_entry_map(df: DataFrame, entry_col: str = "entry"
                      ) -> DataFrame:
    """One journal export-format entry (``FIELD=value`` lines) →
    mapped message properties. The field mapping IS imjournal's
    (readJSONfromJournalMsg, imjournal.c:434-470): MESSAGE→msg,
    PRIORITY→syslogseverity, SYSLOG_FACILITY→syslogfacility,
    SYSLOG_IDENTIFIER→tag (fallback _COMM), _HOSTNAME→hostname,
    _PID→procid, __REALTIME_TIMESTAMP (µs)→timereported. Split out
    of :func:`imjournal` so the map itself is oracle-checkable
    (queries/normalize_q.imjournal_field_map)."""
    kv = F.filter(
        F.split(F.col(entry_col), "\n"),
        lambda ln: ln.contains("="))
    pairs = F.transform(
        kv,
        lambda ln: F.struct(
            F.substring_index(ln, "=", 1).alias("key"),
            F.substr(ln, F.instr(ln, "=") + 1).alias("value"),
        ))
    m = F.map_from_entries(pairs)
    keep = [c for c in df.columns if c != entry_col]
    ent = df.select(*keep, m.alias("j"))
    g = F.col("j")
    return ent.select(
        *keep,
        g["MESSAGE"].alias("msg"),
        g["PRIORITY"].cast("int").alias("syslogseverity"),
        g["SYSLOG_FACILITY"].cast("int").alias("syslogfacility"),
        F.coalesce(g["SYSLOG_IDENTIFIER"], g["_COMM"]).alias("tag"),
        g["_HOSTNAME"].alias("hostname"),
        g["_PID"].alias("procid"),
        F.timestamp_micros(
            g["__REALTIME_TIMESTAMP"].cast("long")
        ).alias("timereported"),
        F.to_json(g).alias("journal_all"),
        F.lit("imjournal").alias("inputname"),
    )


class JournalTail:
    """Live journal tail with rotation/invalidation recovery (ref:
    plugins/imjournal/imjournal.c:880-924 reopenJournal /
    pollJournal; ChangeLog 2026-07-15).

    Models the sd-journal handle over a journald export-format file:
    ``poll()`` reads newly completed entries (blank-line separated
    ``FIELD=value`` paragraphs); rotation or in-place invalidation
    (inode change / truncation — the SD_JOURNAL_INVALIDATE analog)
    triggers EXACTLY ONE reopen-and-seek per event, counted in
    ``reopen_count``.

    The 2026-07-15 busy-loop fix is mirrored structurally: a reopen
    initializes its change-notification state (the stored inode)
    BEFORE cursor restoration — the reference consumes the fresh
    handle's initial ``sd_journal_wait()`` there, because otherwise
    every INVALIDATE-triggered reopen immediately reports another
    INVALIDATE and imjournal spins on a full core. Here the analog
    invariant is that a poll after a reopen with an unchanged file
    performs no further reopen (pinned by the rotation golden).

    ``state_file`` persists the byte cursor (imjournal stateFile /
    persistStateInterval); ``ignore_previous`` starts at the tail
    like IgnorePreviousMessages (imjournal.c skipOldMessages:927).
    An incomplete trailing paragraph stays buffered until its
    terminating blank line arrives — like the reference, only
    complete entries are delivered.
    """

    def __init__(self, path: str, *, state_file: str | None = None,
                 ignore_previous: bool = False):
        self.path = path
        self.state_file = state_file
        self.reopen_count = 0
        self._fh = None
        self._ino: int | None = None
        self._cursor = 0
        self._partial = b""
        if state_file and os.path.exists(state_file):
            try:
                with open(state_file, encoding="utf-8") as fh:
                    self._cursor = int(json.load(fh)["cursor"])
            except (ValueError, KeyError, OSError):
                self._cursor = 0        # corrupt state → head
        elif ignore_previous:
            try:
                self._cursor = os.stat(path).st_size
            except FileNotFoundError:
                self._cursor = 0
        self._open()

    def _open(self) -> None:
        # openJournal + the reopenJournal wait-consume: stash the
        # change-notification identity (inode) FIRST, restore the
        # cursor after — never the other way around (imjournal.c:
        # 887-893)
        self._fh = open(self.path, "rb")
        st = os.fstat(self._fh.fileno())
        self._ino = st.st_ino
        if self._cursor > st.st_size:
            # cursor points past the (new/truncated) journal — the
            # saved position no longer exists, resume at head (the
            # reference's cursor-restore fallback in loadJournalState)
            self._cursor = 0
        self._partial = b""
        self._fh.seek(self._cursor)

    def _reopen(self) -> None:
        try:
            self._fh.close()
        except OSError:
            pass
        self.reopen_count += 1
        self._open()

    def poll(self) -> list[str]:
        """One pollJournal pass: detect invalidation, reopen at most
        once, return the newly completed entries."""
        try:
            st = os.stat(self.path)
        except FileNotFoundError:
            return []        # mid-rotation window; reopen next poll
        if st.st_ino != self._ino or st.st_size < self._cursor:
            if st.st_ino != self._ino:
                # rotated-away file: the byte cursor belongs to the
                # OLD inode; the successor journal is all-new
                # entries, so restoration lands at its head
                self._cursor = 0
            self._reopen()
        data = self._fh.read()
        if not data:
            return []
        buf = self._partial + data
        # complete entries end at a blank line; the tail fragment
        # waits for its terminator
        cut = buf.rfind(b"\n\n")
        if cut < 0:
            self._partial = buf
            self._cursor = self._fh.tell() - len(self._partial)
            return []
        complete, self._partial = buf[:cut + 2], buf[cut + 2:]
        self._cursor = self._fh.tell() - len(self._partial)
        self._save_state()
        return [e for e in
                complete.decode("utf-8", errors="replace")
                .split("\n\n") if e.strip()]

    def _save_state(self) -> None:
        if not self.state_file:
            return
        tmp = self.state_file + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"cursor": self._cursor}, fh)
        os.replace(tmp, self.state_file)

    def close(self) -> None:
        self._save_state()
        try:
            self._fh.close()
        except OSError:
            pass


def imdocker(spark: SparkSession, path: str, *,
             streaming: bool = False) -> DataFrame:
    """Docker container log intake (ref: contrib/imdocker/imdocker.c,
    which tails the engine's log endpoint).

    Consumes the json-file log driver's on-disk format — one JSON
    object per line: {"log": "...\\n", "stream": "stdout"|"stderr",
    "time": RFC3339Nano} — the same records imdocker receives over
    the API socket. The container id comes from the file path
    (…/containers/<id>/<id>-json.log), mirroring imdocker's
    container-id tagging (imdocker.c DOCKER_CONTAINER_ID_PARSE_NAME).
    """
    reader = (spark.readStream if streaming else spark.read)
    raw = (reader
           .schema("log string, stream string, time string")
           .format("json").load(path)
           .withColumn("srcfile", F.input_file_name()))
    return raw.select(
        F.regexp_replace("log", r"\n$", "").alias("line"),
        F.col("stream"),
        F.to_timestamp(
            # RFC3339Nano: trim to µs for Spark timestamp
            F.regexp_replace(
                "time", r"(\.\d{6})\d*(Z|[+-]\d\d:\d\d)$", "$1$2")
        ).alias("timegenerated"),
        F.regexp_extract("srcfile", r"([0-9a-f]{12,64})[^/]*\.log$", 1)
         .alias("container_id"),
        F.lit("imdocker").alias("inputname"),
    )


def cri_reassemble(parsed: DataFrame, *,
                   max_message_size: int | None = None) -> DataFrame:
    """CRI P/F partial reassembly core (imkubernetes.c partialAppend)
    over a frame of (srcfile, stream, pos, tag, msg): gaps-and-islands
    per (srcfile, stream) — count of prior ``F`` records is the island
    id — concat_ws close on the ``F`` row, optional 10x hard cap on
    the P-only prefix. Shared by :func:`imkubernetes` and the oracle
    query ``imkubernetes_cri_reassembly``. Scale shape: two window
    passes partitioned by (file, stream) — at 100 TB each log file is
    its own partition key, so islands never cross executors and the
    sort is per-file."""
    w = (Window.partitionBy("srcfile", "stream").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, -1))
    grp = parsed.withColumn(
        "grp", F.coalesce(
            F.sum((F.col("tag") == "F").cast("int")).over(w),
            F.lit(0)))
    wg = Window.partitionBy("srcfile", "stream", "grp").orderBy("pos")
    wg_all = wg.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    closed = (grp
              .withColumn("full_msg",
                          F.concat_ws("", F.collect_list("msg")
                                      .over(wg_all)))
              # P-only prefix of the island — the hard-cap check runs
              # on PARTIAL appends only (partialAppend), the closing
              # F append always submits
              .withColumn("p_concat", F.concat_ws(
                  "", F.collect_list(
                      F.when(F.col("tag") == "P", F.col("msg")))
                  .over(wg_all)))
              .withColumn("n_frags",
                          F.count(F.lit(1)).over(wg_all))
              .withColumn("first_ts",
                          F.first("ts_raw").over(wg)
                          if "ts_raw" in parsed.columns
                          else F.lit(None).cast("string"))
              .filter(F.col("tag") == "F"))
    if max_message_size is not None:
        cap = 10 * max_message_size
        closed = closed.withColumn(
            "full_msg",
            F.when(F.length("p_concat") >= cap,
                   F.col("p_concat").substr(1, cap))
            .otherwise(F.col("full_msg")))
    return closed


def imkubernetes(spark: SparkSession, path: str, *,
                 max_message_size: int | None = None) -> DataFrame:
    """Kubernetes pod-log intake (ref: contrib/imkubernetes/
    imkubernetes.c): parse CRI-format container logs
    (``TIMESTAMP STREAM P|F MSG``) with partial-line reassembly
    (consecutive ``P`` records concatenate into the closing ``F``
    record, imkubernetes.c partialAppend), and lift the pod metadata
    the reference reads from the kubelet path convention
    ``.../pods/<namespace>_<pod>_<uid>/<container>/N.log``.

    ``max_message_size`` enables the PARTIAL HARD CAP: a run of ``P``
    fragments reaching 10x maxMessageSize is force-submitted as the
    first 10*N bytes and the REST OF THAT LOGICAL RECORD — further
    fragments and its closing ``F`` — is discarded (goldens
    imkubernetes-cri-partial-hard-cap.sh: the closing tail must not
    appear standalone nor in the capped record). The accumulator
    itself never truncates at maxMessageSize — completed records
    reach the core oversize policy whole, so truncate/split/accept
    apply THERE (imkubernetes-cri-partial-{bound,split,accept}.sh).

    Pure column ops end-to-end: wholetext read keeps in-file record
    order (posexplode index), the P/F reassembly is a gaps-and-islands
    window per (file, stream) — count of prior ``F`` records is the
    island id — and a concat_ws close.  API-server metadata
    enrichment is the already-implemented refreshing dim join
    (operators/dimension.py mmkubernetes); docker json-file records
    go through :func:`imdocker`.
    """
    raw = (spark.read.text(path, wholetext=True)
           .withColumn("srcfile", F.input_file_name()))
    lines = raw.select(
        "srcfile",
        F.posexplode(F.split(F.col("value"), "\n"))
        .alias("pos", "rec"),
    ).filter(F.length("rec") > 0)
    parts = F.split(F.col("rec"), " ", 4)
    parsed = lines.select(
        "srcfile", "pos",
        F.element_at(parts, 1).alias("ts_raw"),
        F.element_at(parts, 2).alias("stream"),
        F.element_at(parts, 3).alias("tag"),
        F.element_at(parts, 4).alias("msg"),
    ).filter(F.col("tag").isin("P", "F"))
    closed = cri_reassemble(parsed,
                            max_message_size=max_message_size)
    meta = r"pods/([^/_]+)_([^/_]+)_([^/]+)/([^/]+)/[^/]+\.log$"
    return closed.select(
        F.col("full_msg").alias("line"),
        F.col("stream"),
        # $!kubernetes!log_format (imkubernetes.c sets "cri" on this
        # parse path; docker json-file records say "docker-json")
        F.lit("cri").alias("log_format"),
        F.to_timestamp(
            F.regexp_replace(
                "first_ts", r"(\.\d{6})\d*(Z|[+-]\d\d:\d\d)$", "$1$2")
        ).alias("timegenerated"),
        F.regexp_extract("srcfile", meta, 1).alias("namespace"),
        F.regexp_extract("srcfile", meta, 2).alias("pod"),
        F.regexp_extract("srcfile", meta, 3).alias("pod_uid"),
        F.regexp_extract("srcfile", meta, 4).alias("container"),
        F.lit("imkubernetes").alias("inputname"),
    )


def dockerjson_cols(line: Column) -> list[Column]:
    """Parsed columns of ONE docker json-file record — the
    record-level core shared by :func:`imdocker` /
    :func:`imkubernetes_dockerjson` and the oracle query
    ``imdocker_jsonlog_parse``: MSG = ``log`` minus its trailing
    newline, ``stream``, and RFC3339Nano ``time`` trimmed to µs
    (contrib/imkubernetes docker_json branch; json-file log driver
    format)."""
    rec = F.from_json(
        line, "struct<log:string, stream:string, time:string>")
    return [
        F.regexp_replace(rec["log"], r"\n$", "").alias("line"),
        rec["stream"].alias("stream"),
        F.to_timestamp(
            F.regexp_replace(rec["time"],
                             r"(\.\d{6})\d*(Z|[+-]\d\d:\d\d)$",
                             "$1$2")).alias("timegenerated"),
    ]


def imkubernetes_dockerjson(spark: SparkSession,
                            path: str) -> DataFrame:
    """imkubernetes docker json-file log format (ref: contrib/
    imkubernetes/imkubernetes.c docker_json branch; golden
    imkubernetes-dockerjson-basic.sh): each line is
    ``{"log":..,"stream":..,"time":..}`` — MSG is ``log`` minus its
    trailing newline; pod metadata comes from the
    ``/var/log/containers/<pod>_<namespace>_<container>-<id>.log``
    symlink naming convention; ``log_format`` is ``docker_json``.
    Pure column ops: from_json + path regex, no shuffle."""
    raw = (spark.read.text(path)
           .withColumn("srcfile", F.input_file_name())
           .filter(F.length("value") > 0))
    meta = r"([^/_]+)_([^/_]+)_([^/]+)-([0-9a-f]+)\.log$"
    return raw.select(
        *dockerjson_cols(F.col("value")),
        F.regexp_extract("srcfile", meta, 1).alias("pod"),
        F.regexp_extract("srcfile", meta, 2).alias("namespace"),
        F.regexp_extract("srcfile", meta, 3).alias("container"),
        F.regexp_extract("srcfile", meta, 4).alias("container_id"),
        F.lit("docker_json").alias("log_format"),
        F.lit("imkubernetes").alias("inputname"),
    )


class imfifo(SpoolBridge):
    """Named-pipe input (ref: plugins/imfifo/imfifo.c): open the FIFO,
    read newline-framed messages, spool. The reader reopens on writer
    close (EOF), like the reference keeps the fifo readable across
    writers."""

    def __init__(self, spool_dir: str, *, fifo_path: str, **kw):
        super().__init__(spool_dir, inputname="imfifo", **kw)
        if not os.path.exists(fifo_path):
            os.mkfifo(fifo_path)
        self.fifo_path = fifo_path
        self._localhost = socket.gethostname()

    def _serve(self) -> None:
        import errno

        try:
            # O_RDWR held for the bridge lifetime: the fifo never
            # reaches EOF while writers come and go, so a single
            # open serves every writer (no reopen loop needed)
            fd = os.open(self.fifo_path,
                         os.O_RDWR | os.O_NONBLOCK)
        except OSError:
            return
        buf = b""
        try:
            while not self._stop.is_set():
                try:
                    chunk = os.read(fd, 65536)
                except OSError as e:
                    if e.errno in (errno.EAGAIN,
                                   errno.EWOULDBLOCK):
                        time.sleep(0.05)
                        continue
                    raise
                if not chunk:
                    time.sleep(0.05)
                    continue
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if line.strip():
                        self.emit({
                            "line": line.decode(
                                "utf-8", errors="replace"),
                            "fromhost": self._localhost,
                        })
        finally:
            os.close(fd)


def _resp_read(f):
    """Minimal RESP2 reply parser over a socket file object."""
    hdr = f.readline()
    if not hdr:
        raise ConnectionError("redis closed")
    t, rest = hdr[:1], hdr[1:-2]
    if t in (b"+", b"-"):
        if t == b"-":
            raise RuntimeError(f"redis error: {rest.decode()}")
        return rest.decode()
    if t == b":":
        return int(rest)
    if t == b"$":
        n = int(rest)
        if n < 0:
            return None
        data = f.read(n + 2)
        return data[:n].decode("utf-8", errors="replace")
    if t == b"*":
        n = int(rest)
        if n < 0:
            return None
        return [_resp_read(f) for _ in range(n)]
    raise RuntimeError(f"bad RESP type byte {t!r}")


class imhiredis(SpoolBridge):
    """Redis input speaking RESP natively (ref: contrib/imhiredis/
    imhiredis.c modes :72,408-419): mode='queue' polls RPOP by
    default (FIFO for LPUSH producers — imhiredis.c:300 useLPop=0),
    LPOP with ``use_lpop=True``, queue mode only); mode='subscribe'
    consumes SUBSCRIBE push messages."""

    #: stream-mode records carry the entry's field dict as a JSON
    #: tree (enqueueRedisStreamReply builds $! from the XADD fields
    #: and $.redis metadata) — the spool exposes both
    schema = ("line string, json string, fromhost string, "
              "timegenerated timestamp")

    def __init__(self, spool_dir: str, *, host: str = "127.0.0.1",
                 port: int = 6379, key: str, mode: str = "queue",
                 use_lpop: bool = False, poll_secs: float = 0.2,
                 stream_consumer_group: str | None = None,
                 stream_consumer_name: str | None = None,
                 stream_read_from: str = "$",
                 stream_autoclaim_idle_time: int = 0,
                 stream_ack: bool = True, **kw):
        if mode not in ("queue", "subscribe", "stream"):
            raise ValueError(f"imhiredis mode {mode!r}")
        if len(stream_read_from or "") >= 44:
            # STREAM_INDEX_STR_BUFSZ 44 guard (imhiredis.c:70;
            # golden imhiredis-stream-readfrom-too-long.sh)
            raise ValueError(
                "imhiredis: stream.readFrom exceeds the maximum "
                "stream index length (43 characters)")
        if stream_autoclaim_idle_time and not stream_consumer_group:
            raise ValueError(
                "imhiredis: 'stream.autoclaimIdleTime' requires a "
                "consumer group (imhiredis.c:426)")
        super().__init__(spool_dir, inputname="imhiredis", **kw)
        self.host, self.port = host, port
        self.key, self.mode = key, mode
        self.use_lpop = use_lpop
        self.poll_secs = poll_secs
        self.group = stream_consumer_group
        self.consumer = stream_consumer_name or "rsyslog"
        self.read_from = stream_read_from or "$"
        self.autoclaim_ms = int(stream_autoclaim_idle_time)
        self.ack = stream_ack
        self._sock = None

    def _serve(self) -> None:
        from rsyslog_spark.streaming.transports import _resp

        try:
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=5)
        except OSError:
            return
        f = self._sock.makefile("rb")
        try:
            if self.mode == "subscribe":
                self._sock.sendall(_resp("SUBSCRIBE", self.key))
                _resp_read(f)          # subscribe ack
                while not self._stop.is_set():
                    got = _resp_read(f)
                    if (isinstance(got, list) and len(got) == 3
                            and got[0] == "message"):
                        self.emit({"line": got[2],
                                   "fromhost": self.host})
            elif self.mode == "stream":
                self._stream_loop(f)
            else:
                cmd = "LPOP" if self.use_lpop else "RPOP"
                while not self._stop.is_set():
                    self._sock.sendall(_resp(cmd, self.key))
                    got = _resp_read(f)
                    if got is None:
                        time.sleep(self.poll_secs)
                    else:
                        self.emit({"line": got,
                                   "fromhost": self.host})
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                self._sock.close()
            except OSError:
                pass

    def _stream_loop(self, f) -> None:
        """Redis Streams intake (imhiredis.c workerLoop stream arm):
        without a consumer group, XREAD from ``stream.readFrom``
        ('$' = only entries arriving after startup — golden
        imhiredis-stream.sh skips pre-existing messages; '0' = from
        the beginning); with a group, XGROUP CREATE … MKSTREAM then
        XREADGROUP '>' per batch, XACK after enqueue when
        ``stream.ack`` (default on), and XAUTOCLAIM re-claims pending
        entries idle past ``stream.autoclaimIdleTime`` ms. Each
        entry becomes one message whose $! tree is the field dict
        and $.redis carries stream/index/group/consumer
        (enqueueRedisStreamReply)."""
        import json as _json

        from rsyslog_spark.streaming.transports import _resp

        def emit_entry(entry_id: str, fields: list) -> None:
            d = {}
            for i in range(0, len(fields) - 1, 2):
                d[fields[i]] = fields[i + 1]
            rec = {"line": _json.dumps(d, separators=(",", ":")),
                   "json": _json.dumps(d, separators=(",", ":")),
                   "fromhost": self.host}
            self.emit(rec)
            if self.group and self.ack:
                self._sock.sendall(_resp(
                    "XACK", self.key, self.group, entry_id))
                _resp_read(f)

        def handle_xread(got) -> None:
            # [[stream, [[id, [k, v, ...]], ...]], ...]
            if not isinstance(got, list):
                return
            for stream in got:
                if not (isinstance(stream, list) and len(stream) == 2):
                    continue
                for ent in stream[1] or []:
                    if isinstance(ent, list) and len(ent) == 2:
                        emit_entry(ent[0], ent[1] or [])

        if self.group:
            self._sock.sendall(_resp(
                "XGROUP", "CREATE", self.key, self.group,
                self.read_from, "MKSTREAM"))
            try:
                _resp_read(f)
            except RuntimeError:
                pass            # BUSYGROUP: the group already exists
            autoclaim_cursor = "0-0"
            while not self._stop.is_set():
                if self.autoclaim_ms:
                    self._sock.sendall(_resp(
                        "XAUTOCLAIM", self.key, self.group,
                        self.consumer, str(self.autoclaim_ms),
                        autoclaim_cursor, "COUNT", "10"))
                    got = _resp_read(f)
                    if isinstance(got, list) and len(got) >= 2:
                        autoclaim_cursor = got[0] or "0-0"
                        for ent in got[1] or []:
                            if isinstance(ent, list) and len(ent) == 2:
                                emit_entry(ent[0], ent[1] or [])
                self._sock.sendall(_resp(
                    "XREADGROUP", "GROUP", self.group, self.consumer,
                    "COUNT", "10", "STREAMS", self.key, ">"))
                got = _resp_read(f)
                if got is None:
                    time.sleep(self.poll_secs)
                else:
                    handle_xread(got)
        else:
            last = self.read_from
            if last == "$":
                # resolve '$' ONCE at startup to the stream's newest
                # id — entries already in the stream never deliver
                # (imhiredis-stream.sh: message1-3 skipped)
                self._sock.sendall(_resp(
                    "XREVRANGE", self.key, "+", "-", "COUNT", "1"))
                try:
                    got = _resp_read(f)
                except RuntimeError:
                    got = None
                last = (got[0][0] if isinstance(got, list) and got
                        and isinstance(got[0], list) else "0-0")
            while not self._stop.is_set():
                self._sock.sendall(_resp(
                    "XREAD", "COUNT", "10", "STREAMS",
                    self.key, last))
                got = _resp_read(f)
                if got is None:
                    time.sleep(self.poll_secs)
                    continue
                if isinstance(got, list):
                    for stream in got:
                        if (isinstance(stream, list)
                                and len(stream) == 2 and stream[1]):
                            last = stream[1][-1][0]
                    handle_xread(got)

    def _shutdown(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass


def imkmsg(spark: SparkSession, path: str, *,
           streaming: bool = False) -> DataFrame:
    """Structured kernel log intake — /dev/kmsg record format (ref:
    contrib/imkmsg/kmsg.c:64-140): ``pri,seq,usec[,flags];message``
    with optional indented ``KEY=value`` continuation lines
    (SUBSYSTEM/DEVICE). Pure column parse: indented-continuation
    reassembly (readMode-1 shape) then header split; appended
    properties land in a ``kmsg_props`` map."""
    reader = (spark.readStream if streaming else spark.read)
    raw = (reader.format("text").option("wholetext", True).load(path)
           .select(F.col("value").alias("content")))
    rec = F.explode(F.split("content", r"\n(?=[^ \t])")).alias("rec")
    recs = raw.select(rec).filter(F.trim("rec") != "")
    return recs.select(
        *kmsg_record_cols(F.col("rec")),
        F.lit("imkmsg").alias("inputname"),
    ).filter(F.col("sequnum").isNotNull())


def kmsg_record_cols(rec: Column) -> list[Column]:
    """Parsed columns of ONE /dev/kmsg record (header + indented
    KEY=value continuation lines already reassembled into ``rec``) —
    the record-level core of :func:`imkmsg`, shared with the oracle
    query ``imkmsg_header_parse`` (kmsg.c:64-140 header split,
    PRI decompose, appended-property lift)."""
    hdr = r"^(\d+),(\d+),(\d+)[^;]*;"
    pri = F.regexp_extract(rec, hdr, 1).try_cast("int")
    first = F.substring_index(rec, "\n", 1)
    props = F.map_from_entries(F.transform(
        F.filter(F.split(rec, "\n"),
                 lambda ln: ln.startswith(" ") & ln.contains("=")),
        lambda ln: F.struct(
            F.substring_index(F.trim(ln), "=", 1).alias("key"),
            F.substr(ln, F.instr(ln, "=") + 1).alias("value"))))
    return [
        F.regexp_replace(first, hdr, "").alias("msg"),
        F.shiftright(pri, 3).alias("syslogfacility"),
        pri.bitwiseAND(F.lit(7)).alias("syslogseverity"),
        F.regexp_extract(rec, hdr, 2).try_cast("long")
         .alias("sequnum"),
        F.regexp_extract(rec, hdr, 3).try_cast("long")
         .alias("usec_since_boot"),
        props.alias("kmsg_props"),
    ]


def imklog(spark: SparkSession, path: str, *,
           permit_non_kernel_facility: bool = False,
           streaming: bool = False) -> DataFrame:
    """Classic kernel log intake — /proc/kmsg line format (ref:
    plugins/imklog/imklog.c): ``<pri>[seconds.usec] message``; the
    bracketed monotonic timestamp is optional (kernel printk.time).
    Default ``permitnonkernelfacility=off`` SILENTLY DROPS records
    whose PRI carries a non-kern facility (imklog.c:272 'silently
    ignore'; golden imklog_permitnonkernelfacility_root.sh enables
    it)."""
    reader = (spark.readStream if streaming else spark.read)
    raw = (reader.format("text").load(path)
           .select(F.col("value").alias("line")))
    pri = F.regexp_extract("line", r"^<(\d{1,3})>", 1).try_cast("int")
    mono = F.regexp_extract("line", r"^<\d{1,3}>\[ *(\d+\.\d+)\]", 1)
    body = F.regexp_replace(
        "line", r"^<\d{1,3}>(\[ *\d+\.\d+\] )?", "")
    keep = pri.isNotNull()
    if not permit_non_kernel_facility:
        keep = keep & (F.shiftright(pri, 3) == 0)
    return raw.filter(keep).select(
        body.alias("msg"),
        F.shiftright(pri, 3).alias("syslogfacility"),
        pri.bitwiseAND(F.lit(7)).alias("syslogseverity"),
        mono.try_cast("double").alias("secs_since_boot"),
        F.lit("imklog").alias("inputname"),
    )


class improg(SpoolBridge):
    """Program-output input (ref: contrib/improg/improg.c:135-140
    ``binary`` param): spawn the command, each stdout line becomes a
    message; with ``confirm_messages`` an ACK line is written to the
    child's stdin per message (improg.c:225-262,394).

    Child stdout EOF STOPS the reader and reaps the child — it does
    NOT respawn or keep polling the closed pipe (improg.c:588-592:
    ``readRet == RS_RET_EOF → terminateChild``; ChangeLog 2026-05-05
    / issue 6791 — a killed child used to leave the fd readable
    forever and the input thread spun a full CPU re-selecting it).
    ``restart_on_exit=True`` opts into a supervision loop for callers
    that want the pre-fix respawn convenience."""

    def __init__(self, spool_dir: str, *, binary: str,
                 confirm_messages: bool = False,
                 restart_on_exit: bool = False,
                 restart_delay: float = 1.0, **kw):
        super().__init__(spool_dir, inputname="improg", **kw)
        self.binary = binary
        self.confirm = confirm_messages
        self.restart_on_exit = restart_on_exit
        self.restart_delay = restart_delay
        self._proc = None
        self._localhost = socket.gethostname()

    def _serve(self) -> None:
        import subprocess

        while not self._stop.is_set():
            self._proc = subprocess.Popen(
                self.binary, shell=True,
                stdin=subprocess.PIPE if self.confirm else None,
                stdout=subprocess.PIPE, text=True, bufsize=1)
            try:
                # iteration ends at child-stdout EOF — the closed
                # pipe is never re-polled (issue 6791 fix semantics)
                for line in self._proc.stdout:
                    if self._stop.is_set():
                        break
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    self.emit({"line": line,
                               "fromhost": self._localhost})
                    if self.confirm:
                        try:
                            self._proc.stdin.write("OK\n")
                            self._proc.stdin.flush()
                        except (BrokenPipeError, ValueError):
                            break
            finally:
                self._proc.terminate()
                self._proc.wait()
            if not self.restart_on_exit:
                # reference behavior: EOF → terminateChild, reader
                # done for this instance (improg.c:588-592)
                break
            if not self._stop.is_set():
                time.sleep(self.restart_delay)

    def _shutdown(self) -> None:
        if self._proc is not None and self._proc.poll() is None:
            try:
                self._proc.terminate()
            except ProcessLookupError:
                pass


class imbatchreport:
    """Batch-report input (ref: contrib/imbatchreport/
    imbatchreport.c:9-14,94-122): each file matching the glob is ONE
    message (reports are inherently whole-document); after a
    successful run files are renamed with the ``rename``
    (search, replace) pair so they are not re-read, and files larger
    than ``max_size`` are renamed with ``reject`` instead of being
    submitted — the reference's oversize handling.

    Usage: ``df = b.read(spark)`` → process/sink → ``b.commit()``.
    Commit runs AFTER the action writes durably, the same
    at-least-once order the reference's rename-on-success gives.
    """

    def __init__(self, pattern: str, *,
                 rename: tuple[str, str] = (".report", ".ok"),
                 reject: tuple[str, str] = (".report", ".rejected"),
                 max_size: int = 8 * 1024 * 1024):
        self.pattern = pattern
        self.rename = rename
        self.reject = reject
        self.max_size = max_size
        self._accepted: list[str] = []
        self._rejected: list[str] = []

    def read(self, spark: SparkSession) -> DataFrame:
        import glob as _glob

        self._accepted, self._rejected = [], []
        for p in sorted(_glob.glob(self.pattern)):
            (self._rejected if os.path.getsize(p) > self.max_size
             else self._accepted).append(p)
        if not self._accepted:
            return spark.createDataFrame(
                [], "msg string, srcfile string, inputname string")
        return (
            spark.read.format("text").option("wholetext", True)
            .load(self._accepted)
            .select(
                F.regexp_replace("value", r"\n+$", "").alias("msg"),
                F.input_file_name().alias("srcfile"),
                F.lit("imbatchreport").alias("inputname"),
            )
        )

    def commit(self) -> dict[str, str]:
        """Rename accepted → done and oversize → rejected; returns
        {old: new} for audit."""
        moved: dict[str, str] = {}

        def mv(path, pair):
            search, repl = pair
            new = (path[: -len(search)] + repl
                   if path.endswith(search) else path + repl)
            os.rename(path, new)
            moved[path] = new

        for p in self._accepted:
            mv(p, self.rename)
        for p in self._rejected:
            mv(p, self.reject)
        self._accepted, self._rejected = [], []
        return moved


def apply_max_message_size(msgs: list[bytes], max_size: int,
                           discard_truncated: bool) -> list[bytes]:
    """$MaxMessageSize truncation over framed messages (ref:
    tcps_sess.c / imptcp discardTruncatedMsg; golden:
    tests/imptcp-discard-truncated-msg.sh): an oversize message is
    CUT at the cap; the remainder either continues as further
    message(s) (default) or is discarded with the option."""
    out: list[bytes] = []
    for m in msgs:
        if len(m) <= max_size:
            out.append(m)
            continue
        out.append(m[:max_size])
        if not discard_truncated:
            rest = m[max_size:]
            while rest:
                out.append(rest[:max_size])
                rest = rest[max_size:]
    return out


class RegexFramer:
    """``framing.delimiter.regex`` — regex-delimited TCP framing
    (ref: plugins/imptcp/imptcp.c
    processDataRcvd_regexFraming:1039-1086): the regex marks the
    START of a new frame. The byte walk keeps ``icurr`` = offset of
    the current LINE inside the frame buffer; on a non-newline byte
    the line-so-far is regex-tested, and a match mid-buffer closes
    the previous frame (minus the newline that ended it) and restarts
    the buffer at the matching line. A frame reaching 2x the max
    message size without a delimiter is force-submitted ("assuming
    end of frame", imptcp.c:1053-1062) — the later oversize policy
    truncates it. Per-byte regex on the current line mirrors the
    reference's own per-byte regexec; regex framing is inherently a
    slow path on both sides.
    """

    def __init__(self, pattern: str, max_line: int = 8 * 1024):
        import re as _re

        self.re = _re.compile(pattern.encode("utf-8", "replace"))
        self.max = max_line
        self.buf = bytearray()
        self.icurr = 0

    def feed(self, data: bytes) -> list[bytes]:
        out: list[bytes] = []
        for b in data:
            self.buf.append(b)
            if len(self.buf) == 2 * self.max:
                out.append(bytes(self.buf))
                self.buf.clear()
                self.icurr = 0
                continue
            if b == 0x0A:                 # '\n'
                self.icurr = len(self.buf)
            elif self.icurr > 0 and self.re.match(
                    bytes(self.buf[self.icurr:])):
                out.append(bytes(self.buf[:self.icurr - 1]))
                del self.buf[:self.icurr]
                self.icurr = 1
        return out

    def flush(self) -> bytes | None:
        """Connection close: the remaining buffer is the last frame."""
        if self.buf:
            m = bytes(self.buf)
            self.buf.clear()
            self.icurr = 0
            return m
        return None


def split_tcp_frames(buf: bytes,
                     max_frame_size: int,
                     octet_counted: bool = True,
                     addtl_delim: int | None = None,
                     multiline: bool = False,
                     sp_framing_fix: bool = False,
                     ) -> tuple[list[bytes], bytes]:
    """RFC6587 frame split with per-frame autodetect (ref:
    tcps_sess.c): a frame starting with 1-9 digits followed by SP is
    octet-counted (``LEN SP MSG``); anything else reads to LF. An
    octet count above ``max_frame_size`` falls back to LF framing for
    that frame instead of buffering unbounded (iMaxFrameSize).

    ``octet_counted=False`` = supportOctetCountedFraming="off"
    (imptcp.c bSuppOctetFram; imptcp_no_octet_counted.sh): leading
    digits are DATA, every frame reads to the delimiter.
    ``addtl_delim`` = addtlFrameDelimiter (tcps_sess.c:635 /
    imptcp.c:1186, "e.g. for netscreen"): a frame ends at '\\n' OR
    that byte, whichever comes first.

    ``multiline`` = the imtcp MultiLine param (ChangeLog 2026-01-31;
    tcps_sess.c:592-650 eInMsgCheckMultiLine): in LF framing a
    delimiter ends the frame ONLY when the NEXT byte starts a new
    header (``<``); otherwise the delimiter is message CONTENT
    (continuation line). When the delimiter is the last byte of the
    buffer the decision defers to the next chunk — the tail stays
    unconsumed, exactly like the reference's check-next-packet
    state. Octet-counted frames are unaffected.

    Returns (complete messages, unconsumed tail). Pure function over
    the buffer — the walk is index-based (zero per-frame copies) and
    chunk-boundary invariant: feeding any chunking of the same byte
    stream yields the same message sequence (property-tested).
    """
    def find_delim(b: bytes, start: int) -> int:
        k = b.find(b"\n", start)
        if addtl_delim is not None:
            k2 = b.find(bytes([addtl_delim]), start)
            if k2 >= 0 and (k < 0 or k2 < k):
                return k2
        return k

    def find_frame_end(b: bytes, start: int) -> int:
        k = find_delim(b, start)
        if not multiline:
            return k
        while k >= 0:
            if k + 1 >= len(b):
                return -1       # decision needs the next chunk
            if b[k + 1] == 0x3C:  # next byte starts a '<PRI>' header
                return k
            k = find_delim(b, k + 1)   # continuation — LF is data
        return k

    pos = 0
    blen = len(buf)
    msgs: list[bytes] = []
    while pos < blen:
        if sp_framing_fix and buf[pos] == 0x20:
            # framing.fix.cisco-asa (tcps_sess.c:615-621
            # bSPFramingFix; golden imptcp_spframingfix.sh): Cisco
            # ASA occasionally sends SP after LF — permit a space
            # IN FRONT of the next frame and ignore it
            pos += 1
            continue
        j = pos
        if octet_counted:
            stop = min(blen, pos + 10)
            while j < stop and 0x30 <= buf[j] <= 0x39:
                j += 1
        if j > pos and j < blen and buf[j] == 0x20:
            n = int(buf[pos:j])
            if n > max_frame_size:
                k = find_frame_end(buf, pos)
                if k < 0:
                    break
                msgs.append(buf[pos:k])
                pos = k + 1
            elif blen >= j + 1 + n:             # full frame
                msgs.append(buf[j + 1:j + 1 + n])
                pos = j + 1 + n
            else:                               # incomplete
                break
        else:
            k = find_frame_end(buf, pos)
            if k < 0:
                break
            msgs.append(buf[pos:k])
            pos = k + 1
    return msgs, (buf[pos:] if pos else buf)


def _zlib_auto_detect(buf: bytes) -> bool | None:
    """imptcp.c compressionAutoDetect: RFC1950 header check (CMF
    0x78, FCHECK mod-31, no FDICT) then a throw-away inflate probe.
    True/False = verdict; None = need more bytes."""
    import zlib

    if len(buf) < 2:
        return None
    cmf, flg = buf[0], buf[1]
    if cmf != 0x78 or ((cmf << 8) + flg) % 31 != 0 or (flg & 0x20):
        return False
    probe = zlib.decompressobj()
    try:
        out = probe.decompress(buf, 4096)
    except zlib.error:
        return False
    if out or probe.eof:
        return True
    if len(buf) >= 4096:
        return True
    return None


class imtcp(SpoolBridge):
    """TCP syslog server (ref: plugins/imtcp/imtcp.c; the epoll
    variant imptcp differs only in I/O strategy, which Python's
    selector-based accept loop subsumes). Both RFC6587 framings are
    auto-detected per message, exactly like the reference's
    framing-detection (tcps_sess.c): a frame starting with digits
    followed by SP is octet-counted; anything else is read to LF."""

    #: imtcp also records the sender's source port ($fromhost-port —
    #: msg.c PROP_FROMHOST_PORT; golden fromhost-port-tuple.sh) and
    #: the sender IP ($fromhost-ip — msg.c PROP_FROMHOST_IP; the
    #: peer address verbatim, while fromhost may resolve to a name)
    schema = ("line string, fromhost string, fromhost_ip string, "
              "fromhost_port int, timegenerated timestamp")

    def __init__(self, spool_dir: str, *, host: str = "127.0.0.1",
                 port: int = 0, max_frame_size: int = 200 * 1024,
                 max_message_size: int | None = None,
                 discard_truncated: bool = False,
                 framing_regex: str | None = None,
                 compression_mode: str = "none",
                 compression_driver: str = "zlib",
                 compression_max_expansion_ratio: int = 1024,
                 support_compression_extension: bool = True,
                 keepalive: bool = False,
                 keepalive_probes: int = 0,
                 keepalive_time: int = 0,
                 keepalive_intvl: int = 0,
                 addtl_frame_delimiter: int | None = None,
                 support_octet_counted: bool = True,
                 multiline: bool = False,
                 sp_framing_fix: bool = False,
                 max_sessions: int | None = None,
                 notify_on_connection_open: bool = False,
                 notify_on_connection_close: bool = False,
                 path: str | None = None,
                 unlink: bool = False,
                 tls=None, **kw):
        super().__init__(spool_dir, inputname="imtcp", **kw)
        #: addtlFrameDelimiter (tcps_sess.c:635 / imptcp.c:1186 —
        #: "e.g. for netscreen"; imptcp_addtlframedelim.sh sends
        #: NUL-delimited with delimiter 0)
        self.addtl_frame_delimiter = (
            None if addtl_frame_delimiter is None
            else int(addtl_frame_delimiter))
        #: supportOctetCountedFraming="off" (imptcp.c bSuppOctetFram;
        #: imptcp_no_octet_counted.sh): leading digits are data
        self.support_octet_counted = bool(support_octet_counted)
        #: MultiLine (imtcp.c:676,1042 bMultiLine; ChangeLog
        #: 2026-01-31): LF ends a frame only before a '<' header —
        #: other LFs are continuation content
        self.multiline = bool(multiline)
        #: framingfix.cisco.asa (imptcp.c:219; tcps_sess.c:615-621):
        #: ignore a stray SP in front of the next frame
        self.sp_framing_fix = bool(sp_framing_fix)
        #: compression.maxExpansionRatio (imtcp.c:277; default
        #: tcps_sess.h:39 = 1024, 0 = unlimited) — negative is a
        #: config error (eCmdHdlrNonNegInt)
        if int(compression_max_expansion_ratio) < 0:
            raise ValueError(
                "imtcp: invalid compression.maxExpansionRatio "
                f"{compression_max_expansion_ratio!r} (must be a "
                "non-negative integer; 0 = unlimited)")
        self.compression_max_expansion_ratio = int(
            compression_max_expansion_ratio)
        #: maxSessions (tcpsrv.c:754): over-limit connects are
        #: dropped with the reference's diagnostic; invalid limits
        #: are config-load errors (ChangeLog 2026-04-12 imtcp limit
        #: validation hardening)
        if max_sessions is not None and int(max_sessions) < 0:
            raise ValueError(
                f"imtcp: invalid maxSessions {max_sessions!r} "
                "(must be a positive integer; 0/absent = unlimited)")
        if int(max_frame_size) <= 0:
            raise ValueError(
                f"imtcp: invalid maxFrameSize {max_frame_size!r}")
        self.max_sessions = (None if not max_sessions
                             else int(max_sessions))
        #: notifyOnConnection{Open,Close} (imptcp.c:221-222, both
        #: default off): LOG_INFO internals at session open/close
        #: (imptcp.c:951 'connection established with host',
        #: imptcp.c:1835 'session on socket %d closed')
        self.notify_on_connection_open = bool(
            notify_on_connection_open)
        self.notify_on_connection_close = bool(
            notify_on_connection_close)
        self._live_sessions = 0
        self._sess_lock = threading.Lock()
        self.dropped_sessions = 0
        # keepalive/keepalive.{probes,time,interval} (imtcp.c:269-272
        # inppdescr; applied per accepted session like
        # nsd_ptcp.c EnableKeepAlive)
        self.keepalive = bool(keepalive)
        self.keepalive_probes = int(keepalive_probes or 0)
        self.keepalive_time = int(keepalive_time or 0)
        self.keepalive_intvl = int(keepalive_intvl or 0)
        self.keepalive_applied: dict = {}
        self.max_frame_size = max_frame_size
        self.max_message_size = max_message_size
        self.discard_truncated = discard_truncated
        self.framing_regex = framing_regex
        # compression.mode none|stream:always|auto +
        # compression.driver zlib|zstd (imtcp.c:376-411; imptcp.c
        # DataRcvd). 'stream:always' inflates the CONNECTION byte
        # stream before framing; 'auto' sniffs the zlib header
        # (imptcp.c compressionAutoDetect: CMF 0x78, FCHECK mod-31,
        # no FDICT, probe inflate) and locks the session mode.
        # 'zstd' needs a zstd codec, which this environment lacks —
        # same config-time error as an un-built libzstd.
        cm = (compression_mode or "none").lower()
        if cm not in ("none", "stream:always", "auto"):
            raise ValueError(
                f"imtcp: invalid compression.mode {compression_mode!r}"
                " - supported: 'none', 'stream:always', 'auto'")
        cd = (compression_driver or "zlib").lower()
        self._zstd = None
        if cd == "zstd":
            from rsyslog_spark.streaming.zstdcodec import get_codec
            self._zstd = get_codec()
            if self._zstd is None:
                raise ValueError(
                    "imtcp: compression.driver='zstd' requires a "
                    "zstd codec (the reference requires rsyslog "
                    "built with libzstd)")
        elif cd != "zlib":
            raise ValueError(
                f"imtcp: invalid compression.driver "
                f"{compression_driver!r}, supported values are "
                "'zlib' and 'zstd'")
        self.compression_mode = cm
        self.compression_driver = cd
        #: legacy single-message 'z' frames (parser.c
        #: uncompressMessage: bSupportCompressionExtension) — frames
        #: whose payload starts 'z'+zlib-header inflate per frame;
        #: DISABLED on stream-decompressed sessions
        #: (NO_LEGACY_Z_DECOMPRESS, golden
        #: imtcp-stream-always-zlib-z-prefix.sh)
        self.support_compression_extension = \
            support_compression_extension
        self.tls = tls
        self._tls_ctx = None
        if tls is not None:  # StreamDriver gtls (streaming/gtls.py)
            from rsyslog_spark.streaming.gtls import server_context
            self._tls_ctx = server_context(tls)
        #: unix-domain stream listener (imptcp.c:203-204,464-480
        #: path=/unlink=; goldens imptcp_uds.sh, imptcp_uds_unlink.sh)
        #: — same framing/session machinery over AF_UNIX; fromhost
        #: is the local hostname (no peer address on UDS)
        self.uds_path = path
        if path is not None:
            if unlink and os.path.exists(path):
                os.unlink(path)
            self.srv = socket.socket(socket.AF_UNIX,
                                     socket.SOCK_STREAM)
            self.srv.bind(path)
            self.port = 0
        else:
            self.srv = socket.socket()
            self.srv.setsockopt(socket.SOL_SOCKET,
                                socket.SO_REUSEADDR, 1)
            self.srv.bind((host, port))
            self.port = self.srv.getsockname()[1]
        self.srv.listen(16)
        self.srv.settimeout(0.2)

    def _serve(self) -> None:
        conns = []
        while not self._stop.is_set():
            try:
                conn, addr = self.srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            if self.uds_path is not None:
                # UDS peers carry no address — the reference uses
                # the local host (imptcp.c UDS sessions)
                addr = (socket.gethostname(), 0)
            if not self.sender_allowed(addr[0]):
                # connection from unlisted sender: refuse the session
                # (net.c isAllowedSender2 at accept time)
                try:
                    conn.close()
                except OSError:
                    pass
                continue
            if self.keepalive:
                self.keepalive_applied = apply_keepalive(
                    conn, True, self.keepalive_probes,
                    self.keepalive_time, self.keepalive_intvl)
            if self.max_sessions is not None:
                with self._sess_lock:
                    if self._live_sessions >= self.max_sessions:
                        # tcpsrv.c:754 LogError — refuse the session
                        self.dropped_sessions += 1
                        import warnings as _w
                        _w.warn("too many tcp sessions - dropping "
                                "incoming request")
                        try:
                            conn.close()
                        except OSError:
                            pass
                        continue
                    self._live_sessions += 1
            if self._tls_ctx is not None:
                from rsyslog_spark.streaming.gtls import check_peer
                try:
                    conn.settimeout(5.0)
                    conn = self._tls_ctx.wrap_socket(
                        conn, server_side=True)
                    check_peer(conn, self.tls)
                except (OSError, PermissionError):
                    # failed handshake / unauthorized peer: drop the
                    # session, keep serving (nsd_gtls.c behavior)
                    try:
                        conn.close()
                    except OSError:
                        pass
                    if self.max_sessions is not None:
                        with self._sess_lock:
                            self._live_sessions -= 1
                    continue
            conn.settimeout(0.2)
            if self.notify_on_connection_open:
                # imptcp.c:951 LogMsg LOG_INFO
                self.emit_internal(
                    6, "imptcp: connection established with "
                       f"host: {addr[0]}")
            t = threading.Thread(target=self._conn_loop,
                                 args=(conn, addr[0], addr[1]),
                                 daemon=True)
            t.start()
            conns.append((conn, t))
        for conn, t in conns:
            try:
                conn.close()
            except OSError:
                pass
            t.join(timeout=2)

    def _conn_loop(self, conn, peer,
                   peer_port: int | None = None) -> None:
        # Framing autodetect is PER FRAME (tcps_sess.c): see
        # split_tcp_frames. Each parsed chunk emits as ONE batch (the
        # per-message emit + per-frame buffer slicing of the naive
        # loop held ingest to ~23k msgs/s; this shape measures ~214k).
        framer = (RegexFramer(self.framing_regex,
                              self.max_message_size or 8 * 1024)
                  if self.framing_regex else None)
        buf = b""
        # per-session stream decompression state (imptcp.c DataRcvd):
        # 'stream:always' → inflate everything; 'auto' → sniff, then
        # lock the session to compressed or plain
        mode = self.compression_mode
        decomp = None
        sniff = b""
        legacy_z = self.support_compression_extension
        if mode == "stream:always":
            decomp = self._new_decompressor()
            legacy_z = False

        # compression.maxExpansionRatio (imtcp.c:277; tcps_sess.c:
        # 877-893, default TCPSRV_COMPRESS_MAX_EXPANSION_RATIO_
        # DEFAULT=1024, 0 = unlimited): per-session CUMULATIVE
        # decompressed bytes may not exceed compressed-in bytes ×
        # ratio — a zlib/zstd bomb errors out before its output is
        # submitted (golden imtcp-stream-always-zlib-expansion-guard)
        comp_in = comp_out = 0

        def inflate(chunk: bytes) -> bytes | None:
            # None → corrupt stream: drop session remainder like the
            # reference's inflate() failure path (golden
            # imtcp-stream-always-zlib-corrupt.sh: messages decoded
            # before the corruption survive)
            nonlocal comp_in, comp_out
            import zlib as _z

            comp_in += len(chunk)
            ratio = self.compression_max_expansion_ratio
            cap = comp_in * ratio if ratio else None
            out = bytearray()
            over = False
            try:
                if hasattr(decomp, "unconsumed_tail"):   # zlib
                    data = chunk
                    while True:
                        # incremental inflate so the cap trips
                        # BEFORE a bomb's output is materialized
                        got = decomp.decompress(data, 262144)
                        out += got
                        if cap is not None and \
                                comp_out + len(out) > cap:
                            over = True
                            break
                        data = decomp.unconsumed_tail
                        if not data or not got:
                            break
                else:   # zstd decompressobj: no max_length API
                    out += decomp.decompress(chunk)
                    over = (cap is not None
                            and comp_out + len(out) > cap)
            except (_z.error, Exception):
                return None
            if over:
                self.emit_internal(
                    3, "received invalid compressed stream: "
                    "decompressed bytes exceeded configured "
                    "expansion ratio")
                return None
            comp_out += len(out)
            return bytes(out)

        closed = False
        # TLS-on-plain-listener probe (ChangeLog 2025-09-17; tcps_
        # sess.c: sample the first 5 session bytes — record type
        # 0x16, version 0x03.00-0x04, length 40-16384 means a TLS
        # ClientHello hit a plain port): one explicit error per
        # mismatched connection instead of silent binary gibberish;
        # the session is otherwise left untouched. Only armed when
        # the listener has NO TLS config (streamDriver.mode=0).
        tls_probe_pending = self.tls is None
        probe_buf = b""

        def _tls_probe(data: bytes) -> bool:
            """True once a verdict was reached (stop probing)."""
            nonlocal probe_buf
            probe_buf += data
            if len(probe_buf) < 5:
                return False
            b5 = probe_buf[:5]
            rec_len = (b5[3] << 8) | b5[4]
            if b5[0] == 0x16 and b5[1] == 0x03 \
                    and b5[2] <= 0x04 and 40 <= rec_len <= 16384:
                self.emit_internal(
                    3, "imtcp: TLS handshake (ClientHello) received "
                    f"on plain tcp listener from {peer} - sender "
                    "appears to use TLS while this listener has no "
                    "StreamDriver.Mode=1; see rsyslog TLS "
                    "troubleshooting documentation")
            return True

        while not self._stop.is_set() and not closed:
            if framer is None:
                msgs, buf = split_tcp_frames(
                    buf, self.max_frame_size,
                    octet_counted=self.support_octet_counted,
                    addtl_delim=self.addtl_frame_delimiter,
                    multiline=self.multiline,
                    sp_framing_fix=self.sp_framing_fix)
                if msgs:
                    self._emit_msgs(msgs, peer, peer_port,
                                    legacy_z=legacy_z)
            try:
                chunk = conn.recv(262144)
            except socket.timeout:
                continue
            except OSError:
                break
            closed = not chunk
            if tls_probe_pending and chunk:
                tls_probe_pending = not _tls_probe(chunk)
            if mode == "auto":
                # buffer session-start bytes until the zlib sniff
                # decides (imptcp.c compressionAutoDetect); session
                # close before a verdict → treat buffered bytes as
                # plain
                sniff += chunk
                verdict = _zlib_auto_detect(sniff)
                if verdict is None and len(sniff) < 4096 \
                        and not closed:
                    continue
                mode = "stream:always" if verdict else "none"
                if verdict:
                    decomp = self._new_decompressor()
                    legacy_z = False
                chunk, sniff = sniff, b""
            if chunk and decomp is not None:
                chunk = inflate(chunk)
                if chunk is None:
                    # corrupt compressed stream: drop the session
                    # remainder (reference logs + stops inflating)
                    closed = True
                    chunk = b""
            if chunk:
                if framer is not None:
                    msgs = framer.feed(chunk)
                    if msgs:
                        self._emit_msgs(msgs, peer, peer_port,
                                        legacy_z=legacy_z)
                else:
                    buf += chunk
            if closed:
                # regex framing: the trailing partial frame is
                # DROPPED at session close — no delimiter ever proves
                # the frame complete (observable in
                # imptcp_framing_regex-oversize.sh: the testdata's
                # final 'test end' message is absent from EXPECTED).
                # LF framing keeps the flush-on-close behavior.
                if framer is None:
                    msgs, buf = split_tcp_frames(
                        buf, self.max_frame_size,
                        octet_counted=self.support_octet_counted,
                        addtl_delim=self.addtl_frame_delimiter,
                        multiline=self.multiline,
                        sp_framing_fix=self.sp_framing_fix)
                    if msgs:
                        self._emit_msgs(msgs, peer, peer_port,
                                        legacy_z=legacy_z)
                    if buf.strip():
                        # MultiLine defers the final LF decision to a
                        # next chunk that never comes - close flushes
                        # the pending frame without its trailing LF
                        if self.multiline:
                            buf = buf.rstrip(b"\n")
                        self._emit_msgs([buf], peer, peer_port,
                                        legacy_z=legacy_z)
        fd = -1
        try:
            fd = conn.fileno()
            conn.close()
        except OSError:
            pass
        if self.notify_on_connection_close:
            # imptcp.c:1835 LogMsg LOG_INFO
            self.emit_internal(
                6, f"imptcp: session on socket {fd} closed "
                   "with iRet 0.")
        if self.max_sessions is not None:
            with self._sess_lock:
                self._live_sessions -= 1

    def _new_decompressor(self):
        if self.compression_driver == "zstd":
            return self._zstd.ZstdDecompressor().decompressobj()
        import zlib
        return zlib.decompressobj()

    def _emit_msgs(self, msgs: list[bytes], peer: str,
                   peer_port: int | None = None, *,
                   legacy_z: bool | None = None) -> None:
        if self.max_message_size is not None:
            msgs = apply_max_message_size(
                msgs, self.max_message_size, self.discard_truncated)
        if legacy_z is None:
            legacy_z = self.support_compression_extension
        if legacy_z:
            # legacy single-message compression (omfwd
            # compression.mode="single" / '@@(zN)'): see
            # inflate_legacy_z
            msgs = [d for d in (inflate_legacy_z(m) for m in msgs)
                    if d is not None]
        recs = []
        for m in msgs:
            s = m.decode("utf-8", errors="replace").rstrip("\r\n")
            if s.strip():
                rec = {"line": s, "fromhost": peer,
                       "fromhost_ip": peer}
                if peer_port is not None:
                    # $fromhost-port — the sender's source port
                    # (msg.c PROP_FROMHOST_PORT; golden
                    # fromhost-port-tuple.sh)
                    rec["fromhost_port"] = peer_port
                recs.append(rec)
        if recs:
            self.emit_many(recs)

    def _shutdown(self) -> None:
        try:
            self.srv.close()
        except OSError:
            pass
        if self.uds_path is not None and \
                os.path.exists(self.uds_path):
            try:
                os.unlink(self.uds_path)
            except OSError:
                pass


#: imptcp is imtcp with a different event loop (plugins/imptcp) —
#: identical protocol surface here.
imptcp = imtcp


class imrelp(SpoolBridge):
    """RELP server (ref: plugins/imrelp/imrelp.c via librelp).

    Speaks the RELP framing natively: ``TXNR SP COMMAND SP DATALEN
    [SP DATA] LF``. ``open`` is answered with the offers the client
    needs (relp_version, commands=syslog), every ``syslog`` frame is
    acked ``TXNR rsp 6 200 OK`` — the at-least-once handshake that
    is RELP's whole point — and ``close`` ends the session."""

    def __init__(self, spool_dir: str, *, host: str = "127.0.0.1",
                 port: int = 0, **kw):
        super().__init__(spool_dir, inputname="imrelp", **kw)
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind((host, port))
        self.srv.listen(16)
        self.srv.settimeout(0.2)
        self.port = self.srv.getsockname()[1]

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, addr = self.srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            threading.Thread(target=self._session,
                             args=(conn, addr[0]), daemon=True).start()

    def _session(self, conn, peer) -> None:
        conn.settimeout(0.5)

        def rsp(txnr: int, payload: bytes = b"200 OK") -> None:
            conn.sendall(b"%d rsp %d %s\n"
                         % (txnr, len(payload), payload))

        import re as _re

        hdr_re = _re.compile(rb"^(\d{1,9}) ([a-z]+) (\d{1,9})( |\n)")
        buf = b""
        try:
            while not self._stop.is_set():
                m = hdr_re.match(buf)
                if m:
                    dlen = int(m.group(3))
                    # SP separator → data + LF trailer follow;
                    # LF separator → datalen-0 frame, complete now
                    need = m.end() + (dlen + 1 if m.group(4) == b" "
                                      else 0)
                    if len(buf) >= need:
                        txnr = int(m.group(1))
                        cmd = m.group(2).decode()
                        data = buf[m.end():m.end() + dlen]
                        buf = buf[need:]
                        if cmd == "open":
                            rsp(txnr, b"200 OK\nrelp_version=0\n"
                                      b"relp_software=rsyslog-spark\n"
                                      b"commands=syslog")
                        elif cmd == "syslog":
                            self.emit({"line": data.decode(
                                "utf-8", errors="replace")
                                .rstrip("\n"), "fromhost": peer})
                            rsp(txnr)
                        elif cmd == "close":
                            rsp(txnr)
                            return
                        continue       # try next frame in buf
                elif buf and b"\n" in buf and not hdr_re.match(buf):
                    return             # garbage header: drop session
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    continue           # idle between batches: stay up
                except OSError:
                    return
                if not chunk:
                    return             # peer closed
                buf += chunk
        except (OSError, ValueError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _shutdown(self) -> None:
        try:
            self.srv.close()
        except OSError:
            pass


def imtuxedoulog(spark: SparkSession, path: str, *,
                 tag: str | None = None, facility: int = 16,
                 severity: int = 6,
                 streaming: bool = False) -> DataFrame:
    """Tuxedo ULOG intake (ref: contrib/imtuxedoulog/
    imtuxedoulog.c:195-290): the DATE lives in the FILENAME
    (``<ulogbase>.MMDDYY``) and the line carries only
    ``hhmmss.ff[f].hostname!prog.pid...: [gtrid ...: ] [ECID <...>:]
    text``. Pure column parse: header regex, procid = program token
    with its trailing qualifier dropped (the reference chops at the
    last '.'), optional gtrid prefix skipped, ECID promoted to
    structured data as ``[ECID="..."]`` — the space AFTER the ECID
    colon stays in MSG (imtuxedoulog_data.sh expects the double
    space in the Protocol23 render). ``tag``/``facility``/``severity``
    mirror the input() params (defaults local0.info)."""
    reader = (spark.readStream if streaming else spark.read)
    raw = (reader.format("text").load(path)
           .select(F.col("value").alias("line"),
                   F.input_file_name().alias("srcfile")))
    hdr = r"^(\d{6})\.(\d{2,3})\.([^!]+)!([^:]*): "
    hh = F.regexp_extract("line", hdr, 1)
    frac = F.regexp_extract("line", hdr, 2)
    host = F.regexp_extract("line", hdr, 3)
    prog = F.regexp_extract("line", hdr, 4)
    rest = F.regexp_replace("line", hdr, "")
    # optional "gtrid x1 x2 x3: " transaction prefix (case 4)
    rest = F.regexp_replace(rest, r"^gtrid [^:]*: ", "")
    ecid = F.regexp_extract(rest, r"^ECID <([^>]*)>", 1)
    msg = F.regexp_replace(rest, r"^ECID <[^>]*>:", "")
    date = F.to_date(
        F.regexp_extract("srcfile", r"\.(\d{6})$", 1), "MMddyy")
    ts = F.to_timestamp(F.concat(
        date.cast("string"), F.lit(" "),
        F.regexp_replace(hh, r"(\d\d)(\d\d)(\d\d)", "$1:$2:$3"),
        F.lit("."), frac))
    pri = (facility << 3) | severity
    tag_c = F.lit(tag) if tag else F.lit("imtuxedoulog")
    return raw.filter(hh != "").select(
        F.col("line").alias("rawmsg"),
        msg.alias("msg"),
        F.lit(pri).alias("pri"),
        F.lit(facility).alias("syslogfacility"),
        F.lit(severity).alias("syslogseverity"),
        host.alias("hostname"),
        tag_c.alias("syslogtag"),
        tag_c.alias("app_name"),
        tag_c.alias("programname"),
        F.regexp_replace(prog, r"\.[^.]*$", "").alias("procid"),
        ts.alias("timereported"),
        F.when(ecid != "", F.concat(F.lit('[ECID="'), ecid,
                                    F.lit('"]'))).alias(
            "structured_data"),
        F.lit("imtuxedoulog").alias("inputname"),
    )


class imbeats(SpoolBridge):
    """Elastic Beats (lumberjack v2) server (ref: plugins/imbeats/
    lj_parser.h:10-13 frame types W/J/C/A; imbeats.c ACK timing).

    Wire format (big-endian): 2-byte header ``2`` + type; ``W`` =
    uint32 window size; ``J`` = uint32 seq, uint32 len, JSON payload;
    ``C`` = uint32 len, zlib blob of concatenated inner frames. The
    server acks ``2A`` + highest-seq at each window boundary — the
    batching contract Filebeat retries on. Event JSON lands in
    ``line`` verbatim (route through mmjsonparse downstream, as the
    reference feeds its JSON decoder); server-assigned
    ``$!metadata!imbeats`` rides in the json column."""

    schema = ("line string, json string, fromhost string, "
              "timegenerated timestamp")

    def __init__(self, spool_dir: str, *, host: str = "127.0.0.1",
                 port: int = 0, **kw):
        super().__init__(spool_dir, inputname="imbeats", **kw)
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind((host, port))
        self.srv.listen(16)
        self.srv.settimeout(0.2)
        self.port = self.srv.getsockname()[1]

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, addr = self.srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            threading.Thread(target=self._session,
                             args=(conn, addr[0]), daemon=True).start()

    def _session(self, conn, peer) -> None:
        import json as _json
        import struct
        import zlib

        conn.settimeout(5)
        f = conn.makefile("rwb")

        def u32(buf, off):
            return struct.unpack_from(">I", buf, off)[0]

        # per-connection protocol state (imbeats.c session):
        # sequences are CUMULATIVE across windows (goldens
        # imbeats-seq-cumulative-{two-windows,after-multi-event-
        # window}.sh — ack values 1 then 2); a seq at or below the
        # last seen one is a RESET and rejects the event without
        # submit or ack, dropping the session
        # (imbeats-seq-reset-rejected.sh). The ack fires when the
        # current window's event COUNT reaches the announced window
        # size, carrying the cumulative max seq.
        st = {"win": 0, "count": 0, "last": 0, "bad": False}

        def submit(seq: int, payload: bytes) -> None:
            # $!metadata!imbeats!{protocol,sequence,tls_enabled} —
            # SERVER-assigned, so an attacker-supplied metadata key
            # in the payload never wins
            # (imbeats-metadata-collision.sh)
            meta = {"metadata": {"imbeats": {
                "protocol": "lumberjack-v2", "sequence": seq,
                "tls_enabled": False}}}
            self.emit({"line": payload.decode(
                "utf-8", errors="replace"),
                "json": _json.dumps(meta, separators=(",", ":")),
                "fromhost": peer})

        def on_event(seq: int, payload: bytes) -> None:
            if seq <= st["last"]:
                st["bad"] = True
                return
            st["last"] = seq
            st["count"] += 1
            submit(seq, payload)

        def handle(buf):
            """Parse complete frames from buf; returns consumed
            bytes — an incomplete trailing frame is left for the
            next recv to finish."""
            off = 0
            while off + 2 <= len(buf) and not st["bad"]:
                typ = buf[off + 1:off + 2]
                if typ == b"W":
                    if off + 6 > len(buf):
                        break
                    st["win"] = u32(buf, off + 2)
                    st["count"] = 0
                    off += 6
                elif typ == b"J":
                    if off + 10 > len(buf):
                        break
                    seq = u32(buf, off + 2)
                    plen = u32(buf, off + 6)
                    if off + 10 + plen > len(buf):
                        break
                    on_event(seq, buf[off + 10:off + 10 + plen])
                    off += 10 + plen
                elif typ == b"C":
                    if off + 6 > len(buf):
                        break
                    clen = u32(buf, off + 2)
                    if off + 6 + clen > len(buf):
                        break
                    inner = zlib.decompress(buf[off + 6:off + 6 + clen])
                    off += 6 + clen
                    handle(inner)
                else:       # unknown frame: drop connection state
                    off = len(buf)
                    break
            return off

        try:
            pending = b""
            while not self._stop.is_set():
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not chunk:
                    break
                pending += chunk
                consumed = handle(pending)
                pending = pending[consumed:]
                if st["bad"]:
                    break   # protocol violation: no ack, drop session
                if st["win"] and st["count"] >= st["win"]:
                    f.write(b"2A" + st["last"].to_bytes(4, "big"))
                    f.flush()
                    st["win"] = 0
                    st["count"] = 0
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _shutdown(self) -> None:
        try:
            self.srv.close()
        except OSError:
            pass


class imdiag(SpoolBridge):
    """Diagnostic injection input (ref: plugins/imdiag/imdiag.c — the
    testbench's ``injectmsg`` backdoor). ``inject(line)`` enqueues a
    message directly; ``inject_n(n, fmt)`` mirrors the testbench's
    numbered-message generator so golden tests can assert exact
    sequences."""

    def __init__(self, spool_dir: str, **kw):
        super().__init__(spool_dir, inputname="imdiag", **kw)
        self._localhost = socket.gethostname()

    def _serve(self) -> None:
        self._stop.wait()                  # injection-only: no loop

    def inject(self, line: str) -> None:
        self.emit({"line": line, "fromhost": self._localhost})

    def inject_n(self, n: int,
                 fmt: str = "<167>Mar  1 01:00:00 172.20.245.8 "
                            "tag msgnum:{i:08d}:") -> None:
        for i in range(n):
            self.emit({"line": fmt.format(i=i),
                       "fromhost": self._localhost})


class imczmq(SpoolBridge):
    """ZeroMQ input (ref: contrib/imczmq/imczmq.c:77-120 — socktype
    SUB/PULL + topics). ``socket_factory() -> (recv() ->
    list[bytes] | None, close)`` supplies the engine — pyzmq when
    importable, else injected (tests); SUB mode treats a two-part
    message as (topic, payload)."""

    def __init__(self, spool_dir: str, *, endpoints: str = "",
                 socktype: str = "SUB", topics: str = "",
                 socket_factory=None, **kw):
        if socktype not in ("SUB", "PULL"):
            raise ValueError(f"imczmq socktype {socktype!r}")
        super().__init__(spool_dir, inputname="imczmq", **kw)
        self.endpoints = endpoints
        self.socktype = socktype
        self.topics = topics
        self._factory = socket_factory or self._default_factory
        self._localhost = socket.gethostname()

    def _default_factory(self):
        try:
            import zmq
        except ImportError as e:
            raise RuntimeError(
                "imczmq needs pyzmq or an injected "
                "socket_factory") from e
        ctx = zmq.Context.instance()
        sock = ctx.socket(getattr(zmq, self.socktype))
        for ep in self.endpoints.split(","):
            sock.bind(ep.strip())
        if self.socktype == "SUB":
            for t in (self.topics.split(",") if self.topics else [""]):
                sock.subscribe(t.strip())
        sock.RCVTIMEO = 200

        def recv():
            try:
                return sock.recv_multipart()
            except zmq.Again:
                return None

        return recv, sock.close

    def _serve(self) -> None:
        recv, close = self._factory()
        try:
            while not self._stop.is_set():
                parts = recv()
                if parts is None:
                    continue
                if not parts:
                    break
                payload = parts[-1]       # SUB: (topic, payload)
                self.emit({"line": payload.decode(
                    "utf-8", errors="replace"),
                    "fromhost": self._localhost})
        finally:
            close()

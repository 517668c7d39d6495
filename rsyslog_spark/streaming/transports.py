"""Transport output modules: omstdout, omuxsock, ommail, omsnmp,
omhiredis, omotel, and the AMQP 1.0 family (omamqp1 /
omazureeventhubs).

Each is a ``foreachBatch`` callable (same contract as
streaming/sinks.py) usable from batch tests via direct invocation.
Wire protocols that are simple enough to speak without a client
library (SMTP, RESP, SNMP BER, OTLP/HTTP JSON, unix datagrams) are
implemented natively — the protocol bytes ARE the reference parity.
AMQP 1.0 needs a real protocol engine; that sink takes an injectable
sender factory (qpid-proton when available) so the Spark-side
batching/retry plumbing is real and tested while the codec stays
external, the same boundary the reference draws by linking
libqpid-proton.

Scale notes: every sink here is per-partition (executor-side
connections, no driver fan-in); batched protocols (OTLP, hiredis
pipeline) flush on item/byte thresholds mirroring the reference's
batch tunables.
"""

from __future__ import annotations

import json
import socket
import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------
# omstdout (ref: plugins/omstdout/omstdout.c)
# ---------------------------------------------------------------------

def omstdout_sink(line_col: str = "line") -> Callable[[DataFrame, int], None]:
    """Write rendered messages to the driver's stdout (ref:
    plugins/omstdout/omstdout.c — a debug/test sink; rows are
    collected, so use only for bounded debug output)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.select(
                F.col(line_col).cast("string").alias("l")).collect():
            print(r.l if r.l is not None else "")

    return write


# ---------------------------------------------------------------------
# omuxsock (ref: plugins/omuxsock/omuxsock.c)
# ---------------------------------------------------------------------

def omuxsock_sink(sock_path: str, line_col: str = "line", *,
                  sock_type: str = "dgram",
                  ) -> Callable[[DataFrame, int], None]:
    """Forward to a local unix socket (ref: plugins/omuxsock/
    omuxsock.c sendMsg — one datagram per message, connectionless
    by default).

    ChangeLog 2025-12-02 additions: ABSTRACT socket names — a
    leading ``@`` maps to the kernel's NUL-prefixed abstract
    namespace — and CONNECTED stream sockets
    (``sock_type='stream'`` = SOCK_STREAM, one connection per
    partition with LF-delimited records; ``'seqpacket'`` =
    SOCK_SEQPACKET, one send per message). The pre-fix bug of
    closing/reopening the socket per message is structurally absent
    here (one socket per partition)."""
    st = {"dgram": socket.SOCK_DGRAM,
          "stream": socket.SOCK_STREAM,
          "seqpacket": getattr(socket, "SOCK_SEQPACKET",
                               socket.SOCK_STREAM)}.get(sock_type)
    if st is None:
        raise ValueError(f"omuxsock: unknown sock_type {sock_type!r}")
    # abstract namespace: '@name' → '\0name' (omuxsock.c 2025-12-02)
    addr = ("\0" + sock_path[1:]) if sock_path.startswith("@") \
        else sock_path

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(
            F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            sk = socket.socket(socket.AF_UNIX, st)
            try:
                if st == socket.SOCK_DGRAM:
                    for r in rows:
                        sk.sendto((r.l or "").encode("utf-8"), addr)
                else:
                    sk.connect(addr)
                    for r in rows:
                        data = (r.l or "").encode("utf-8")
                        sk.sendall(
                            data + b"\n"
                            if st == socket.SOCK_STREAM else data)
            finally:
                sk.close()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# ommail (ref: plugins/ommail/ommail.c)
# ---------------------------------------------------------------------

def ommail_sink(
    server: str,
    port: int,
    *,
    mailfrom: str,
    mailto: Sequence[str],
    subject: str = "syslog message",
    subject_col: str | None = None,
    body_enable: bool = True,
    line_col: str = "line",
    mode: str = "smtp",
    sendmail_binary: str = "/usr/sbin/sendmail",
) -> Callable[[DataFrame, int], None]:
    """Send one mail per message via SMTP (ref: plugins/ommail/
    ommail.c:680-700 — HELO, MAIL FROM, one RCPT TO per recipient,
    DATA with Subject header; ommail.c:653). ``subject_col`` renders a
    per-message subject (the reference's second template);
    ``body_enable=False`` sends header-only mails (bodyEnable param).

    Alert-volume sink: mails are driver-collected (alerts are rare by
    construction — pair with action_every_nth / exec_once_every_
    interval from operators/stats.py, as real configs do).

    ``mode="sendmail"`` (ChangeLog 2026-05-16): submit through a
    local sendmail-compatible binary instead of SMTP — one child per
    message with the reference's argv shape
    (ommail.c:720 buildSendmailArgv: BINARY -i -f FROM -- RCPT...),
    message piped on stdin; ``sendmail.binary`` selects the binary
    (default /usr/sbin/sendmail, ommail.c:73)."""

    import smtplib

    if mode not in ("smtp", "sendmail"):
        raise ValueError(f"ommail: unknown mode {mode!r}")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        cols = [F.col(line_col).cast("string").alias("l")]
        cols.append(
            F.col(subject_col).cast("string").alias("s")
            if subject_col else F.lit(subject).alias("s"))
        rows = batch_df.select(*cols).collect()
        if not rows:
            return
        def hdr(v: str) -> str:
            # log-derived header values must never carry CR/LF —
            # SMTP header injection (extra Bcc/From) otherwise
            return str(v).replace("\r", " ").replace("\n", " ")

        if mode == "sendmail":
            import subprocess
            argv = [sendmail_binary, "-i", "-f", mailfrom, "--",
                    *mailto]
            for r in rows:
                body = (
                    f"From: {hdr(mailfrom)}\n"
                    f"To: {hdr(', '.join(mailto))}\n"
                    f"Subject: {hdr(r.s)}\n"
                    "X-Mailer: rsyslog-spark-mail\n\n"
                )
                if body_enable:
                    body += (r.l or "") + "\n"
                proc = subprocess.run(
                    argv, input=body.encode(), timeout=60)
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"ommail: sendmail binary exited "
                        f"{proc.returncode}")
            return

        smtp = smtplib.SMTP(server, port, timeout=30)
        try:
            for r in rows:
                body = (
                    f"From: {hdr(mailfrom)}\r\n"
                    f"To: {hdr(', '.join(mailto))}\r\n"
                    f"Subject: {hdr(r.s)}\r\n"
                    "X-Mailer: rsyslog-spark-mail\r\n\r\n"
                )
                if body_enable:
                    body += (r.l or "") + "\r\n"
                smtp.sendmail(mailfrom, list(mailto), body.encode())
        finally:
            try:
                smtp.quit()
            except Exception:
                pass

    return write


# ---------------------------------------------------------------------
# omsnmp (ref: plugins/omsnmp/omsnmp.c) — minimal BER encoder
# ---------------------------------------------------------------------

#: default OIDs, omsnmp.c:55-71
SNMP_TRAP_OID = "1.3.6.1.4.1.19406.1.2.1"         # ADISCON syslogtrap
SNMP_SYSLOG_MSG_OID = "1.3.6.1.4.1.19406.1.1.2.1"  # syslogMsg varbind
SNMP_ENTERPRISE_OID = "1.3.6.1.4.1.3.1.1"          # enterprises.cmu.1.1
_OID_SNMPTRAP = "1.3.6.1.6.3.1.1.4.1.0"            # snmpTrapOID.0
_OID_SYSUPTIME = "1.3.6.1.2.1.1.3.0"               # sysUpTime.0


def _ber_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _ber(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _ber_len(len(content)) + content


def _ber_int(v: int, tag: int = 0x02) -> bytes:
    if v == 0:
        return _ber(tag, b"\x00")
    body = v.to_bytes((v.bit_length() + 8) // 8, "big", signed=True)
    return _ber(tag, body)


def _ber_uint(v: int, tag: int) -> bytes:
    body = v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")
    return _ber(tag, body)


def _ber_oid(dotted: str) -> bytes:
    arcs = [int(x) for x in dotted.strip(".").split(".")]
    out = bytearray([40 * arcs[0] + arcs[1]])
    for a in arcs[2:]:
        chunk = bytearray([a & 0x7F])
        a >>= 7
        while a:
            chunk.insert(0, 0x80 | (a & 0x7F))
            a >>= 7
        out += chunk
    return _ber(0x06, bytes(out))


def _varbind(oid: str, value: bytes) -> bytes:
    return _ber(0x30, _ber_oid(oid) + value)


def snmp_trap_pdu(
    message: str,
    *,
    version: str = "snmpv2c",
    community: str = "public",
    trap_oid: str = SNMP_TRAP_OID,
    message_oid: str = SNMP_SYSLOG_MSG_OID,
    enterprise_oid: str = SNMP_ENTERPRISE_OID,
    uptime_cs: int = 0,
    request_id: int = 1,
    agent_addr: str = "127.0.0.1",
    specific_type: int = 0,
) -> bytes:
    """Encode one trap datagram (BER, RFC 1157 / RFC 3416).

    snmpv2c → SNMPv2-Trap PDU (0xA7) with the standard sysUpTime.0 +
    snmpTrapOID.0 header varbinds then the syslog message
    (omsnmp.c:55-71 default OIDs). snmpv1 → Trap-PDU (0xA4) with
    enterprise/agent-addr/generic=6(enterpriseSpecific)/specific.
    """
    msg_vb = _varbind(message_oid,
                      _ber(0x04, message.encode("utf-8")))
    if version == "snmpv2c":
        varbinds = _ber(0x30,
                        _varbind(_OID_SYSUPTIME,
                                 _ber_uint(uptime_cs, 0x43))
                        + _varbind(_OID_SNMPTRAP, _ber_oid(trap_oid))
                        + msg_vb)
        pdu = _ber(0xA7,
                   _ber_int(request_id) + _ber_int(0) + _ber_int(0)
                   + varbinds)
        ver = 1
    elif version == "snmpv1":
        pdu = _ber(
            0xA4,
            _ber_oid(enterprise_oid)
            + _ber(0x40, socket.inet_aton(agent_addr))
            + _ber_int(6)                      # enterpriseSpecific
            + _ber_int(specific_type)
            + _ber_uint(uptime_cs, 0x43)
            + _ber(0x30, msg_vb))
        ver = 0
    else:
        raise ValueError(f"unknown snmp version {version!r}")
    return _ber(0x30, _ber_int(ver)
                + _ber(0x04, community.encode()) + pdu)


def omsnmp_sink(
    host: str,
    port: int = 162,
    *,
    version: str = "snmpv2c",
    community: str = "public",
    trap_oid: str = SNMP_TRAP_OID,
    message_oid: str = SNMP_SYSLOG_MSG_OID,
    enterprise_oid: str = SNMP_ENTERPRISE_OID,
    line_col: str = "line",
) -> Callable[[DataFrame, int], None]:
    """Send each message as an SNMP trap over UDP (ref:
    plugins/omsnmp/omsnmp.c; action params omsnmp.c:125-127
    enterpriseoid/trapoid/messageoid)."""

    # wall clock, not monotonic: the partition runs on another host
    # whose CLOCK_MONOTONIC base differs; wall deltas stay meaningful
    # (NTP) and the clamp keeps sysUpTime unsigned
    start = time.time()

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(
            F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            sk = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            up = max(0, int((time.time() - start) * 100))
            try:
                for i, r in enumerate(rows):
                    sk.sendto(
                        snmp_trap_pdu(
                            r.l or "", version=version,
                            community=community, trap_oid=trap_oid,
                            message_oid=message_oid,
                            enterprise_oid=enterprise_oid,
                            uptime_cs=up, request_id=i + 1),
                        (host, port))
            finally:
                sk.close()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omhiredis (ref: contrib/omhiredis/omhiredis.c) — native RESP
# ---------------------------------------------------------------------

def _resp(*args: str) -> bytes:
    out = bytearray(f"*{len(args)}\r\n".encode())
    for a in args:
        b = a.encode("utf-8")
        out += f"${len(b)}\r\n".encode() + b + b"\r\n"
    return bytes(out)


def omhiredis_sink(
    host: str,
    port: int = 6379,
    *,
    mode: str = "queue",
    key: str,
    use_rpush: bool = False,
    expiration: int = 0,
    stream_out_field: str = "msg",
    stream_maxlen: int = 0,
    line_col: str = "line",
    key_col: str | None = None,
    server_password: str | None = None,
    stream_ack: bool = False,
    stream_del: bool = False,
    ack_key: str | None = None,
    ack_group: str | None = None,
    ack_index_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Redis output speaking RESP directly (ref: contrib/omhiredis/
    omhiredis.c:381-414): mode=queue → LPUSH/RPUSH, publish →
    PUBLISH, set → SET/SETEX with expiration, stream → XADD
    (MAXLEN ~ n when stream_maxlen set). Commands are pipelined per
    partition (the reference uses redisAppendCommand batching);
    replies are drained at the end and error replies raise so the
    retry/suspend wrapper sees the failure.

    ``server_password`` issues AUTH as the connection's first
    command (omhiredis.c:307-308 serverpassword — a wrong password
    fails the batch). ``stream_ack``/``stream_del`` implement the
    pipeline-acknowledgment pattern (omhiredis.c:503-508
    stream.ack/stream.del + stream.keyAck/groupAck/indexAck): after
    each XADD, XACK (and/or XDEL) the SOURCE stream's entry —
    ``ack_index_col`` names the column carrying each row's origin
    entry id (the dynaIndexAck analog; imhiredis stores it in
    ``$.redis!index``)."""

    if mode not in ("queue", "publish", "set", "stream"):
        raise ValueError(f"unknown omhiredis mode {mode!r}")
    if (stream_ack or stream_del) and not (ack_key
                                           and ack_index_col):
        raise ValueError(
            "omhiredis: stream.ack/stream.del need stream.keyAck "
            "and an index column (stream.indexAck)")
    if stream_ack and not ack_group:
        raise ValueError(
            "omhiredis: stream.ack needs stream.groupAck")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        cols = [F.col(line_col).cast("string").alias("l")]
        cols.append((F.col(key_col) if key_col else F.lit(key))
                    .cast("string").alias("k"))
        if ack_index_col:
            cols.append(F.col(ack_index_col).cast("string")
                        .alias("ack_idx"))
        sel = batch_df.select(*cols)

        def per_partition(rows):
            sk = socket.create_connection((host, port), timeout=30)
            n = 0
            try:
                buf = bytearray()
                if server_password is not None:
                    buf += _resp("AUTH", server_password)
                    n += 1
                for r in rows:
                    v = r.l or ""
                    if mode == "queue":
                        cmd = _resp("RPUSH" if use_rpush else "LPUSH",
                                    r.k, v)
                    elif mode == "publish":
                        cmd = _resp("PUBLISH", r.k, v)
                    elif mode == "set":
                        cmd = (_resp("SETEX", r.k, str(expiration), v)
                               if expiration else _resp("SET", r.k, v))
                    else:
                        if stream_maxlen:
                            cmd = _resp("XADD", r.k, "MAXLEN", "~",
                                        str(stream_maxlen), "*",
                                        stream_out_field, v)
                        else:
                            cmd = _resp("XADD", r.k, "*",
                                        stream_out_field, v)
                    buf += cmd
                    n += 1
                    if stream_ack and r.ack_idx:
                        buf += _resp("XACK", ack_key, ack_group,
                                     r.ack_idx)
                        n += 1
                    if stream_del and r.ack_idx:
                        buf += _resp("XDEL", ack_key, r.ack_idx)
                        n += 1
                    if len(buf) >= 256 * 1024:
                        sk.sendall(buf)
                        buf.clear()
                if buf:
                    sk.sendall(buf)
                sk.shutdown(socket.SHUT_WR)
                reply = b""
                while True:
                    chunk = sk.recv(65536)
                    if not chunk:
                        break
                    reply += chunk
                errs = [ln for ln in reply.split(b"\r\n")
                        if ln.startswith(b"-")]
                if errs:
                    raise RuntimeError(
                        f"redis error reply: {errs[0].decode()!r}")
            finally:
                sk.close()
            return iter(())

        sel.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omotel (ref: plugins/omotel/) — OTLP/HTTP JSON logs export
# ---------------------------------------------------------------------

#: syslog severity → OTLP severityNumber/Text (omotel.c:498-500)
OTEL_SEVERITY = [(24, "EMERGENCY"), (23, "ALERT"), (22, "CRITICAL"),
                 (17, "ERROR"), (13, "WARNING"), (11, "NOTICE"),
                 (9, "INFO"), (5, "DEBUG")]


def otlp_log_payload(records: list[dict], *,
                     resource_attrs: dict | None = None) -> dict:
    """Build one OTLP/JSON ExportLogsServiceRequest (ref:
    plugins/omotel/otlp_json.c:247-470; proto3 JSON mapping —
    fixed64 timestamps are decimal strings).

    Each record dict: body (str), time_unix_nano (int),
    severity (0-7 syslog), and optional hostname/appname/procid/
    msgid/facility mapped to log.syslog.* attributes."""
    logrecs = []
    for r in records:
        num, text = OTEL_SEVERITY[min(max(r.get("severity", 6), 0), 7)]
        rec = {
            "timeUnixNano": str(r.get("time_unix_nano", 0)),
            "severityNumber": num,
            "severityText": text,
            "body": {"stringValue": r.get("body") or ""},
            "attributes": [],
        }
        # observedTimeUnixNano = receive time, emitted when non-zero
        # (otlp_json.c:419-422; fixed64 renders as a decimal STRING
        # in proto3 JSON — the 2026-02-26 encoding fix)
        if r.get("observed_time_unix_nano"):
            rec["observedTimeUnixNano"] = str(
                r["observed_time_unix_nano"])
        for k, attr in (("hostname", "log.syslog.hostname"),
                        ("appname", "log.syslog.appname"),
                        ("procid", "log.syslog.procid"),
                        ("msgid", "log.syslog.msgid")):
            if r.get(k) is not None:
                rec["attributes"].append(
                    {"key": attr,
                     "value": {"stringValue": str(r[k])}})
        if r.get("facility") is not None:
            rec["attributes"].append(
                {"key": "log.syslog.facility",
                 "value": {"intValue": str(r["facility"])}})
        logrecs.append(rec)
    res = {"attributes": [
        {"key": k, "value": {"stringValue": str(v)}}
        for k, v in (resource_attrs or {}).items()]}
    return {"resourceLogs": [{
        "resource": res,
        "scopeLogs": [{
            "scope": {"name": "rsyslog.omotel", "version": "spark"},
            "logRecords": logrecs,
        }],
    }]}


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_tag(field: int, wire: int) -> bytes:
    return _pb_varint((field << 3) | wire)


def _pb_len(field: int, payload: bytes) -> bytes:
    return _pb_tag(field, 2) + _pb_varint(len(payload)) + payload


def _pb_str(field: int, s: str) -> bytes:
    return _pb_len(field, s.encode("utf-8"))


def _pb_fixed64(field: int, v: int) -> bytes:
    import struct
    return _pb_tag(field, 1) + struct.pack("<Q", v & (2**64 - 1))


def _pb_kv(key: str, value: bytes) -> bytes:
    """KeyValue{key=1 string, value=2 AnyValue}."""
    return _pb_str(1, key) + _pb_len(2, value)


def otlp_logs_protobuf(records: list[dict], *,
                       resource_attrs: dict | None = None) -> bytes:
    """Native OTLP protobuf encoding (ChangeLog 2026-02-26 'omotel:
    add native protobuf encoding (http/protobuf)'; ref: plugins/
    omotel/otlp_protobuf.c over the PUBLIC opentelemetry-proto
    schema). Minimal proto3 wire encoder — field numbers from
    opentelemetry/proto/logs/v1/logs.proto:

    ExportLogsServiceRequest{resource_logs=1}; ResourceLogs
    {resource=1, scope_logs=2}; Resource{attributes=1}; ScopeLogs
    {scope=1, log_records=2}; InstrumentationScope{name=1,
    version=2}; LogRecord{time_unix_nano=1 fixed64,
    severity_number=2, severity_text=3, body=5,
    attributes=6, observed_time_unix_nano=11 fixed64};
    AnyValue{string_value=1, int_value=3}; KeyValue{key=1,
    value=2}. Same record dicts as :func:`otlp_log_payload`."""
    def any_str(s: str) -> bytes:
        return _pb_str(1, s)

    def any_int(v: int) -> bytes:
        return _pb_tag(3, 0) + _pb_varint(v)

    logrecs = b""
    for r in records:
        num, text = OTEL_SEVERITY[min(max(r.get("severity", 6), 0),
                                      7)]
        lr = _pb_fixed64(1, int(r.get("time_unix_nano", 0)))
        obs = int(r.get("observed_time_unix_nano", 0) or 0)
        if obs:
            lr += _pb_fixed64(11, obs)
        lr += _pb_tag(2, 0) + _pb_varint(num)
        lr += _pb_str(3, text)
        lr += _pb_len(5, any_str(r.get("body") or ""))
        for k, attr in (("hostname", "log.syslog.hostname"),
                        ("appname", "log.syslog.appname"),
                        ("procid", "log.syslog.procid"),
                        ("msgid", "log.syslog.msgid")):
            if r.get(k) is not None:
                lr += _pb_len(6, _pb_kv(attr, any_str(str(r[k]))))
        if r.get("facility") is not None:
            lr += _pb_len(6, _pb_kv("log.syslog.facility",
                                    any_int(int(r["facility"]))))
        logrecs += _pb_len(2, lr)   # ScopeLogs.log_records

    scope = _pb_str(1, "rsyslog.omotel") + _pb_str(2, "spark")
    scope_logs = _pb_len(1, scope) + logrecs
    resource = b"".join(
        _pb_len(1, _pb_kv(k, any_str(str(v))))
        for k, v in (resource_attrs or {}).items())
    resource_logs = _pb_len(1, resource) + _pb_len(2, scope_logs)
    return _pb_len(1, resource_logs)


def omotel_sink(
    endpoint: str,
    *,
    protocol: str = "http/json",
    batch_max_items: int = 512,
    resource_attrs: dict | None = None,
    line_col: str = "msg",
    severity_col: str = "syslogseverity",
    facility_col: str | None = "syslogfacility",
    hostname_col: str | None = "hostname",
    appname_col: str | None = "programname",
    procid_col: str | None = "procid",
    msgid_col: str | None = "msgid",
    time_col: str = "timereported",
    headers: dict | None = None,
) -> Callable[[DataFrame, int], None]:
    """POST OTLP log batches to ``<endpoint>/v1/logs`` (ref:
    plugins/omotel/omotel_http.c; batch cap OMOTEL_DEFAULT_BATCH_
    MAX_ITEMS=512, omotel.c:502). Per-partition HTTP connections;
    non-2xx raises so retrying_foreach_batch suspends the action.

    ``protocol`` (ChangeLog 2026-02-26): ``http/json`` (default) or
    ``http/protobuf`` — binary OTLP encoding with Content-Type
    application/x-protobuf, the preferred high-volume transport."""
    if protocol not in ("http/json", "http/protobuf"):
        raise ValueError(f"omotel: unknown protocol {protocol!r} - "
                         "use 'http/json' or 'http/protobuf'")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        def opt(c, name):
            return (F.col(c) if c else F.lit(None)).alias(name)

        sel = batch_df.select(
            F.col(line_col).cast("string").alias("body"),
            F.coalesce(F.col(severity_col), F.lit(6)).cast("int")
             .alias("severity"),
            opt(facility_col, "facility"),
            opt(hostname_col, "hostname"),
            opt(appname_col, "appname"),
            opt(procid_col, "procid"),
            opt(msgid_col, "msgid"),
            (F.unix_micros(F.col(time_col).cast("timestamp")) * 1000)
            .alias("time_unix_nano"),
            ((F.unix_micros(F.col("timegenerated").cast("timestamp"))
              * 1000) if "timegenerated" in batch_df.columns
             else F.lit(0)).alias("observed_time_unix_nano"),
        )

        def per_partition(rows):
            import urllib.request

            def post(recs):
                if protocol == "http/protobuf":
                    payload = otlp_logs_protobuf(
                        recs, resource_attrs=resource_attrs)
                    ctype = "application/x-protobuf"
                else:
                    payload = json.dumps(otlp_log_payload(
                        recs,
                        resource_attrs=resource_attrs)).encode()
                    ctype = "application/json"
                req = urllib.request.Request(
                    endpoint.rstrip("/") + "/v1/logs", data=payload,
                    headers={"Content-Type": ctype,
                             **(headers or {})})
                resp = urllib.request.urlopen(req, timeout=30)
                if not (200 <= resp.status < 300):
                    raise RuntimeError(f"otlp export {resp.status}")

            buf: list[dict] = []
            for r in rows:
                buf.append(r.asDict())
                if len(buf) >= batch_max_items:
                    post(buf)
                    buf = []
            if buf:
                post(buf)
            return iter(())

        sel.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omamqp1 / omazureeventhubs (ref: contrib/omamqp1/omamqp1.c,
# plugins/omazureeventhubs/omazureeventhubs.c)
# ---------------------------------------------------------------------

def amqp1_sink(
    target: str,
    *,
    url: str | None = None,
    sender_factory: Callable | None = None,
    line_col: str = "line",
    props: dict | None = None,
) -> Callable[[DataFrame, int], None]:
    """AMQP 1.0 producer (ref: contrib/omamqp1/omamqp1.c; Azure Event
    Hubs speaks the same protocol, plugins/omazureeventhubs).

    ``sender_factory() -> (send(bytes_payload), close())`` supplies
    the protocol engine; by default qpid-proton is used when
    importable (the library the reference links), else the action
    fails at batch time with a clear message — the Spark-side
    batching, partition fan-out, and retry contract stay testable
    with an injected mock."""

    def default_factory():
        try:
            from proton.utils import BlockingConnection  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "amqp1_sink needs qpid-proton (pip install "
                "python-qpid-proton) or an injected sender_factory"
            ) from e
        conn = BlockingConnection(url)
        sender = conn.create_sender(target)
        from proton import Message

        return (lambda payload: sender.send(
                    Message(body=payload, properties=props)),
                conn.close)

    factory = sender_factory or default_factory

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(
            F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            send, close = factory()
            try:
                for r in rows:
                    send((r.l or "").encode("utf-8"))
            finally:
                close()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omazuredce (ref: plugins/omazuredce/omazuredce.c)
# ---------------------------------------------------------------------

def omazuredce_sink(
    dce_url: str,
    dcr_id: str,
    stream_name: str,
    *,
    token_provider: Callable[[], str],
    line_col: str = "line",
    batch_max_items: int = 500,
    gzip_payload: bool = True,
) -> Callable[[DataFrame, int], None]:
    """Azure Monitor Logs Ingestion (ref: plugins/omazuredce/
    omazuredce.c:414 URL shape ``{dce}/dataCollectionRules/{dcr}/
    streams/{stream}?api-version=2023-01-01``; gzip-compressed JSON
    array body :559, Bearer auth :586).

    ``token_provider`` supplies the AAD access token (the reference
    runs the client-credentials flow itself, omazuredce.c:303; token
    acquisition is environment-specific, so it is injected — tests
    and non-AAD gateways pass a closure)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        sel = batch_df.select(
            F.col(line_col).cast("string").alias("l"))
        url = (f"{dce_url.rstrip('/')}/dataCollectionRules/{dcr_id}"
               f"/streams/{stream_name}?api-version=2023-01-01")

        def per_partition(rows):
            import gzip as _gzip
            import urllib.request

            token = token_provider()

            def post(recs):
                body = json.dumps(
                    [{"RawData": r} for r in recs]).encode()
                headers = {"Content-Type": "application/json",
                           "Authorization": f"Bearer {token}"}
                if gzip_payload:
                    body = _gzip.compress(body)
                    headers["Content-Encoding"] = "gzip"
                req = urllib.request.Request(url, data=body,
                                             headers=headers)
                resp = urllib.request.urlopen(req, timeout=30)
                if not (200 <= resp.status < 300):
                    raise RuntimeError(f"dce ingest {resp.status}")

            buf = []
            for r in rows:
                buf.append(r.l or "")
                if len(buf) >= batch_max_items:
                    post(buf)
                    buf = []
            if buf:
                post(buf)
            return iter(())

        sel.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omhttpfs (ref: contrib/omhttpfs/omhttpfs.c) — WebHDFS/HttpFS REST
# ---------------------------------------------------------------------

def omhttpfs_sink(
    host: str,
    port: int,
    path: str,
    *,
    user: str = "hdfs",
    line_col: str = "line",
    https: bool = False,
) -> Callable[[DataFrame, int], None]:
    """HDFS-over-HTTP file append (ref: contrib/omhttpfs/
    omhttpfs.c:444-510: ``/webhdfs/v1{path}?user.name=..&op=create|
    append&data=true``, create falls back to append when the file
    exists and vice versa).

    Spark-native HDFS writes (omfile with an hdfs:// path) are the
    production path; this sink exists for HttpFS-gateway-only
    clusters, matching the reference's niche."""

    scheme = "https" if https else "http"
    prefix = "/swebhdfs/v1" if https else "/webhdfs/v1"
    base = f"{scheme}://{host}:{port}{prefix}{path}?user.name={user}"

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(
            F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            import urllib.error
            import urllib.request

            body = "".join((r.l or "") + "\n" for r in rows).encode()
            if not body:
                return iter(())

            def req(op, method):
                r = urllib.request.Request(
                    f"{base}&op={op}&data=true", data=body,
                    method=method,
                    headers={"Content-Type":
                             "application/octet-stream"})
                return urllib.request.urlopen(r, timeout=30)

            try:
                req("append", "POST")
            except urllib.error.HTTPError as e:
                if e.code == 404:   # file not there yet → create
                    req("create&overwrite=false", "PUT")
                else:
                    raise
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omrabbitmq / omawslogshlc — injectable-engine family
# ---------------------------------------------------------------------

def omrabbitmq_sink(
    exchange: str,
    routing_key: str,
    *,
    url: str | None = None,
    publisher_factory: Callable | None = None,
    line_col: str = "line",
) -> Callable[[DataFrame, int], None]:
    """RabbitMQ publisher (ref: contrib/omrabbitmq/omrabbitmq.c —
    AMQP 0-9-1 via librabbitmq). Protocol engine injectable
    (``publisher_factory() -> (publish(key, payload), close)``), pika
    when importable; batching/fan-out contract tested with a mock."""

    def default_factory():
        try:
            import pika
        except ImportError as e:
            raise RuntimeError(
                "omrabbitmq_sink needs pika (AMQP 0-9-1 engine) or "
                "an injected publisher_factory") from e
        conn = pika.BlockingConnection(pika.URLParameters(url))
        ch = conn.channel()
        return (lambda key, payload: ch.basic_publish(
                    exchange=exchange, routing_key=key, body=payload),
                conn.close)

    factory = publisher_factory or default_factory

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(
            F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            publish, close = factory()
            try:
                for r in rows:
                    publish(routing_key, (r.l or "").encode("utf-8"))
            finally:
                close()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


def omawslogs_sink(
    log_group: str,
    log_stream: str,
    *,
    client_factory: Callable | None = None,
    line_col: str = "line",
    time_col: str | None = None,
    batch_max_items: int = 10000,
) -> Callable[[DataFrame, int], None]:
    """CloudWatch Logs PutLogEvents (ref: plugins/omawslogshlc).

    Builds the events batch (message + epoch-ms timestamp, ascending
    order as the API requires); the SigV4-signed client is injected
    (boto3 when importable) — the AWS credential chain is environment
    policy, not engine logic, same boundary the reference draws by
    linking the AWS SDK."""

    def default_factory():
        try:
            import boto3
        except ImportError as e:
            raise RuntimeError(
                "omawslogs_sink needs boto3 or an injected "
                "client_factory") from e
        client = boto3.client("logs")
        return (lambda events: client.put_log_events(
                    logGroupName=log_group, logStreamName=log_stream,
                    logEvents=events),
                lambda: None)

    factory = client_factory or default_factory

    def write(batch_df: DataFrame, batch_id: int) -> None:
        cols = [F.col(line_col).cast("string").alias("l")]
        ts = (F.unix_millis(F.col(time_col).cast("timestamp"))
              if time_col else
              F.unix_millis(F.current_timestamp()))
        cols.append(ts.alias("t"))
        sel = batch_df.select(*cols)

        def per_partition(rows):
            put, close = factory()
            try:
                buf = []
                for r in rows:
                    buf.append({"message": r.l or "",
                                "timestamp": int(r.t)})
                    if len(buf) >= batch_max_items:
                        buf.sort(key=lambda e: e["timestamp"])
                        put(buf)
                        buf = []
                if buf:
                    buf.sort(key=lambda e: e["timestamp"])
                    put(buf)
            finally:
                close()
            return iter(())

        sel.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omjournal (ref: plugins/omjournal/omjournal.c) — native protocol
# ---------------------------------------------------------------------

def journal_native_record(fields: dict) -> bytes:
    """Serialize one journal entry in journald's native datagram
    format: ``FIELD=value\\n`` for single-line values, else
    ``FIELD\\n<u64-le length><raw>\\n`` (the same wire form
    sd_journal_send produces; ref omjournal.c:300 field set)."""
    out = bytearray()
    for k, v in fields.items():
        v = "" if v is None else str(v)
        kb = k.encode()
        vb = v.encode()
        if "\n" in v:
            out += kb + b"\n"
            out += len(vb).to_bytes(8, "little") + vb + b"\n"
        else:
            out += kb + b"=" + vb + b"\n"
    return bytes(out)


def omjournal_sink(
    socket_path: str = "/run/systemd/journal/socket",
    *,
    msg_col: str = "msg",
    severity_col: str = "syslogseverity",
    facility_col: str = "syslogfacility",
    tag_col: str | None = "syslogtag",
) -> Callable[[DataFrame, int], None]:
    """Write messages into systemd-journald via its native unix
    datagram socket (ref: plugins/omjournal/omjournal.c:300
    sd_journal_send fields: MESSAGE, PRIORITY (the SEVERITY alone,
    0-7 — journald rejects larger values, systemd.journal-fields(7)),
    SYSLOG_FACILITY, SYSLOG_IDENTIFIER). One datagram per entry —
    exactly what sd_journal_send does under the hood."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        cols = [F.col(msg_col).cast("string").alias("m"),
                F.coalesce(F.col(severity_col), F.lit(6))
                 .cast("int").alias("sev"),
                F.coalesce(F.col(facility_col), F.lit(1))
                 .cast("int").alias("fac"),
                (F.col(tag_col) if tag_col else F.lit(None))
                .cast("string").alias("tag")]
        sel = batch_df.select(*cols)

        def per_partition(rows):
            sk = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
            try:
                for r in rows:
                    fields = {
                        "MESSAGE": r.m or "",
                        "PRIORITY": r.sev,
                        "SYSLOG_FACILITY": r.fac,
                    }
                    if r.tag:
                        fields["SYSLOG_IDENTIFIER"] = \
                            r.tag.rstrip(":")
                    sk.sendto(journal_native_record(fields),
                              socket_path)
            finally:
                sk.close()
            return iter(())

        sel.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omrelp (ref: plugins/omrelp/omrelp.c via librelp) — native RELP
# ---------------------------------------------------------------------

def omrelp_sink(
    host: str,
    port: int,
    line_col: str = "line",
    *,
    window: int = 128,
) -> Callable[[DataFrame, int], None]:
    """RELP client (ref: plugins/omrelp/omrelp.c): ``open`` handshake,
    one ``syslog`` frame per message, every frame acknowledged by the
    peer before the partition commits, ``close`` on drain — RELP's
    at-least-once contract, which is why the reference prefers it
    over plain TCP. ``window`` caps in-flight unacked frames (librelp
    windowing); acks are drained before the connection closes, so a
    missing ack raises and the retry wrapper re-runs the batch."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(
            F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            sk = socket.create_connection((host, port), timeout=30)
            f = sk.makefile("rwb")

            def send(txnr, cmd, data=b""):
                if data:
                    f.write(b"%d %s %d %s\n"
                            % (txnr, cmd, len(data), data))
                else:
                    f.write(b"%d %s 0\n" % (txnr, cmd))
                f.flush()

            def read_rsp():
                hdr = f.readline()
                if not hdr:
                    raise ConnectionError("relp peer closed")
                parts = hdr.split(b" ", 3)
                txnr, cmd, dlen = (int(parts[0]), parts[1],
                                   int(parts[2]))
                if dlen == 0 and len(parts) < 4:
                    # bare frame "TXNR cmd 0\n": the header LF IS the
                    # trailer — reading further would steal the next
                    # frame's first byte
                    raise RuntimeError(
                        f"relp nack txnr={txnr}: empty rsp")
                # data begins after the header line's space split;
                # parts[3] holds the first chunk incl. its newline
                got = parts[3] if len(parts) > 3 else b""
                while len(got) < dlen + 1:      # + trailer LF
                    more = f.read(dlen + 1 - len(got))
                    if not more:
                        break
                    got += more
                if cmd != b"rsp" or not got.startswith(b"200"):
                    raise RuntimeError(
                        f"relp nack txnr={txnr}: {got[:80]!r}")
                return txnr

            try:
                txnr = 1
                send(txnr, b"open",
                     b"relp_version=0\nrelp_software=rsyslog-spark\n"
                     b"commands=syslog")
                read_rsp()
                pending = 0
                for r in rows:
                    txnr += 1
                    send(txnr, b"syslog",
                         (r.l or "").encode("utf-8"))
                    pending += 1
                    if pending >= window:
                        read_rsp()
                        pending -= 1
                while pending:
                    read_rsp()
                    pending -= 1
                txnr += 1
                send(txnr, b"close")
                read_rsp()
            finally:
                sk.close()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write


# ---------------------------------------------------------------------
# omczmq (ref: contrib/omczmq/omczmq.c) — ZeroMQ publisher
# ---------------------------------------------------------------------

def omczmq_sink(
    endpoints: str,
    *,
    socktype: str = "PUB",
    topic: str | None = None,
    socket_factory: Callable | None = None,
    line_col: str = "line",
) -> Callable[[DataFrame, int], None]:
    """ZeroMQ output (ref: contrib/omczmq/omczmq.c:100-129 —
    endpoints + socktype action params, zsock_new per worker).
    PUB sends ``topic`` as the first frame part when set (czmq
    multipart convention); PUSH sends the message alone.

    ``socket_factory() -> (send(parts: list[bytes]), close)``
    supplies the engine — pyzmq when importable, else injected."""

    if socktype not in ("PUB", "PUSH"):
        raise ValueError(f"omczmq socktype {socktype!r}")

    def default_factory():
        try:
            import zmq
        except ImportError as e:
            raise RuntimeError(
                "omczmq_sink needs pyzmq or an injected "
                "socket_factory") from e
        ctx = zmq.Context.instance()
        sock = ctx.socket(getattr(zmq, socktype))
        for ep in endpoints.split(","):
            sock.connect(ep.strip())
        return (lambda parts: sock.send_multipart(parts),
                sock.close)

    factory = socket_factory or default_factory

    def write(batch_df: DataFrame, batch_id: int) -> None:
        lines = batch_df.select(
            F.col(line_col).cast("string").alias("l"))

        def per_partition(rows):
            send, close = factory()
            try:
                for r in rows:
                    payload = (r.l or "").encode("utf-8")
                    if socktype == "PUB" and topic:
                        send([topic.encode(), payload])
                    else:
                        send([payload])
            finally:
                close()
            return iter(())

        lines.rdd.mapPartitions(per_partition).count()

    return write

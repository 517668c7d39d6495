"""omfile error paths (round-8 verdict item 7).

omfile-read-only-errmsg.sh: an unwritable target suspends the action
AND emits the internal "file '<path>': open error" message (runtime/
stream.c:333 LogError), which re-enters the ruleset as an
rsyslogd-tagged syslog line so the config's own filters route it —
the catch-all file receives it, the msg-filtered file does not.

dynfile_invalid2.sh: one uncreatable dynafile target must not take
down the others — the good targets receive their full sequences. The
engine's partitionBy layout escapes the path instead of open-failing
(documented divergence: the bad row is isolated in its own escaped
partition, not discarded).
"""
import os
import warnings

from rsyslog_spark.config.runtime import run_config_batch


def _read_parts(d):
    if not os.path.isdir(d):
        return ""
    return "".join(
        open(os.path.join(d, p)).read()
        for p in sorted(os.listdir(d)) if p.startswith("part"))


def test_omfile_read_only_errmsg(spark, tmp_path):
    ro = tmp_path / "readonly_target"
    ro.write_text("")
    ro.chmod(0o400)
    src = tmp_path / "in.log"
    src.write_text("<13>Mar  1 01:00:00 h tag msgnum:00000000:\n")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        run = run_config_batch(spark, f'''
template(name="outfmt" type="string" string="%msg%\\n")
ruleset(name="m") {{
  if $msg contains "msgnum:" then {{
    action(type="omfile" name="ro" template="outfmt"
           file="{ro}")
  }}
  action(type="omfile" file="{tmp_path}/catchall"
         template="RSYSLOG_FileFormat")
}}
input(type="imfile" file="{src}" ruleset="m")
''')
    assert "ro" in run.suspended
    out = _read_parts(f"{tmp_path}/catchall")
    # the original message AND the internal open-error line, exactly
    # the reference's grep "<path>.* open error"
    assert "msgnum:00000000:" in out
    assert f"file '{ro}'" in out and "open error" in out, out
    assert "rsyslogd:" in out
    # the read-only target received nothing (suspended, not crashed)
    assert ro.read_text() == ""


def test_dynfile_invalid2_good_targets_survive(spark, tmp_path,
                                               monkeypatch):
    """dynfile_invalid2.sh: 4 good dynafile targets + one uncreatable
    (/proc/...) — every good target holds its full sequence (the
    reference's seq_check 0 7 after concatenating the good files).

    The dynafile template starts with a property, so the partition
    base resolves to CWD — chdir to tmp_path so the partitions land
    there, not in the repo root."""
    monkeypatch.chdir(tmp_path)
    msgs = []
    for i in range(4):
        msgs.append(f"<129>Mar 10 01:00:00 h tag "
                    f"msg:{tmp_path}/out.{i}.log:{i}")
    msgs.append("<129>Mar 10 01:00:00 h tag "
                "msg:/proc/rsyslog.error.file:boom")
    for i in range(4):
        msgs.append(f"<129>Mar 10 01:00:00 h tag "
                    f"msg:{tmp_path}/out.{i}.log:{i + 4}")
    src = tmp_path / "in.log"
    src.write_text("".join(m + "\n" for m in msgs))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        run_config_batch(spark, f'''
template(name="outfmt" type="string" string="%msg:F,58:3%\\n")
template(name="dynfile" type="string" string="%msg:F,58:2%.log")
ruleset(name="m") {{
  action(type="omfile" dynafile="dynfile" template="outfmt")
}}
input(type="imfile" file="{src}" ruleset="m")
''')
    # dynafile → partitionBy layout: values land under escaped
    # partition dirs of the base; collect every good partition
    seqs = []
    base = "."
    part_root = None
    for root, dirs, files in os.walk(base):
        if "pt_msg" in root and str(tmp_path).replace("/", "%2F") \
                in root.replace("%2f", "%2F"):
            part_root = root
            for f in files:
                if f.startswith("part"):
                    seqs += [ln for ln in open(
                        os.path.join(root, f)).read().splitlines()]
    assert part_root is not None, "no dynafile partitions written"
    assert sorted(seqs) == [str(i) for i in range(8)], seqs


def test_stream_sink_failure_suspends_not_kills(spark, tmp_path,
                                                monkeypatch):
    """Stream twin of omfile-read-only-errmsg.sh: a failing omfile
    action inside run_config_stream suspends ITSELF for the batch —
    the catch-all still gets the message AND the internal
    open-error line; the streaming query completes instead of
    dying (runtime/action.c suspend semantics)."""
    import socket
    import threading
    import time as _time

    from rsyslog_spark.config.runtime import run_config_stream

    ro = tmp_path / "readonly_target"
    ro.write_text("")
    ro.chmod(0o400)
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    conf = f'''
template(name="outfmt" type="string" string="%msg%\\n")
ruleset(name="m") {{
  if $msg contains "msgnum:" then {{
    action(type="omfile" name="ro" template="outfmt" file="{ro}")
  }}
  action(type="omfile" file="{tmp_path}/catchall"
         template="RSYSLOG_FileFormat")
}}
input(type="imtcp" port="{port}" address="127.0.0.1" ruleset="m"
      spool="{tmp_path}/spool")
'''

    def send():
        for _ in range(100):
            try:
                c = socket.create_connection(("127.0.0.1", port),
                                             timeout=0.2)
                c.sendall(b"<13>Mar  1 01:00:00 h tag "
                          b"msgnum:00000000:\n")
                c.close()
                return
            except OSError:
                _time.sleep(0.1)

    th = threading.Thread(target=send)
    th.start()
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        run_config_stream(spark, conf,
                          checkpoint=str(tmp_path / "ck"),
                          drain_grace=4.0)
    th.join(timeout=10)
    out = _read_parts(f"{tmp_path}/catchall")
    assert "msgnum:00000000:" in out
    assert f"file '{ro}'" in out and "open error" in out, out
    assert ro.read_text() == ""


def test_rotation_cut_points_semantics():
    """outchannel/omfile size-capped rotation boundaries
    (outchannel.c uSizeLimit; omfile.c:497-500): the size check runs
    AFTER the write, so the crossing record stays in the old file;
    every closed file exceeds the limit, and removing its last
    record drops it back under."""
    from rsyslog_spark.streaming.sinks import rotation_cut_points

    assert rotation_cut_points([], 10) == []
    assert rotation_cut_points([5, 5, 5], 0) == [0]     # no limit
    # 5+5+5=15>10 at rec idx2? acc after r0=5,r1=10 (not >10),
    # r2=15 -> file0=[0,1,2] closes only when NEXT record arrives
    assert rotation_cut_points([5, 5, 5], 10) == [0]
    assert rotation_cut_points([5, 5, 5, 5], 10) == [0, 3]
    cuts = rotation_cut_points([4] * 10, 10)
    # files of 3 records (12 > 10), last file holds the remainder
    assert cuts == [0, 3, 6, 9]
    # one oversized record still lands alone in its file
    assert rotation_cut_points([50, 2, 2], 10) == [0, 1]


def test_dynafile_ziplevel_writes_gzip(spark, tmp_path):
    """omfile dynafile + zipLevel (omfile.c iZipLevel applies to
    dynafiles too): partition files come out gzip-compressed and
    read back losslessly."""
    from rsyslog_spark.config.runtime import run_config_batch

    src = tmp_path / "zin.log"
    src.write_text(
        "<13>Mar  1 10:00:00 ha app: za\n"
        "<13>Mar  1 10:00:01 hb app: zb\n")
    outdir = tmp_path / "zdyn"
    conf = f'''
    template(name="dynp" type="string"
             string="{outdir}/%hostname%.log")
    template(name="fmt" type="string" string="%msg%\\n")
    input(type="imfile" file="{src}" ruleset="m")
    ruleset(name="m") {{
      action(type="omfile" dynafile="dynp" template="fmt"
             zipLevel="6")
    }}
    '''
    run_config_batch(spark, conf, main="m")
    import os
    gz = []
    for root, _d, files in os.walk(outdir):
        gz += [os.path.join(root, f) for f in files
               if f.endswith(".gz")]
    assert gz, "no gzip part files written"
    back = spark.read.text(str(outdir))
    vals = sorted(r["value"].strip() for r in back.collect())
    assert vals == ["za", "zb"]

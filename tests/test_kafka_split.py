"""imkafka split.json.records goldens (reference:
tests/imkafka-json-split-{valid,empty,invalid,nonarray,timestamp}.sh;
semantics plugins/imkafka/imkafka.c splitJsonRecords:446-556).

The reference tests drive a real broker and check output content;
split_json_records is a pure Column transform, so the same scenarios
run on a batch frame (streaming parity is structural)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark.streaming.sources import split_json_records


def _lines(spark, payloads):
    df = spark.createDataFrame([(p,) for p in payloads], "line string")
    df = df.withColumn(
        "timegenerated",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    out = split_json_records(df)
    return [r.asDict() for r in out.orderBy("line").collect()]


def test_split_valid_batch(spark):
    """imkafka-json-split-valid.sh: two records → two messages, no
    'records' wrapper survives."""
    rows = _lines(spark, [
        '{"records":[{"time":"2025-02-20T03:19:34.655Z",'
        '"msg":"msgnum:00000001:"},'
        '{"time":"2025-02-20T03:19:34.693Z","msg":"msgnum:00000002:"}]}'
    ])
    assert len(rows) == 2
    assert sum('"msg":"msgnum:00000001:"' in r["line"] for r in rows) == 1
    assert sum('"msg":"msgnum:00000002:"' in r["line"] for r in rows) == 1
    assert not any('"records":' in r["line"] for r in rows)
    # record 'time' becomes the reception time, fractional secs dropped
    assert str(rows[0]["timegenerated"]) == "2025-02-20 03:19:34"


def test_split_empty_invalid_nonarray_pass_through(spark):
    """imkafka-json-split-{empty,invalid,nonarray}.sh: empty array,
    broken JSON, non-array 'records', missing key — all forward
    as-is, exactly one output row each."""
    payloads = ['{"records":[]}', "not json {", '{"records":"x"}',
                '{"other":1}', '{"records":[null,null]}']
    rows = _lines(spark, payloads)
    assert sorted(r["line"] for r in rows) == sorted(payloads)
    # reception time untouched on pass-through
    assert all(str(r["timegenerated"]) == "2026-01-01 00:00:00"
               for r in rows)


def test_split_timestamp_fallbacks(spark):
    """imkafka-json-split-timestamp.sh: no 'time' key or an invalid
    format fall back to the reception time; null elements skip."""
    rows = _lines(spark, [
        '{"records":[{"time":"2025-02-20T03:19:34.655Z",'
        '"msg":"with-timestamp"},{"msg":"no-timestamp"},'
        '{"time":"invalid-format","msg":"bad-timestamp"},null]}'
    ])
    assert len(rows) == 3
    by = {("with" if "with-" in r["line"] else
           "no" if "no-" in r["line"] else "bad"): r for r in rows}
    assert str(by["with"]["timegenerated"]) == "2025-02-20 03:19:34"
    assert str(by["no"]["timegenerated"]) == "2026-01-01 00:00:00"
    assert str(by["bad"]["timegenerated"]) == "2026-01-01 00:00:00"


def test_split_fanout_ceiling(spark):
    """IMKAFKA_MAX_JSON_SPLIT_RECORDS (imkafka.c:175): >10000
    elements forwards the batch as-is."""
    big = '{"records":[' + ",".join(
        f'{{"i":{i}}}' for i in range(10001)) + "]}"
    rows = _lines(spark, [big])
    assert len(rows) == 1 and rows[0]["line"] == big


class TestImkafkaConfigBinding:
    """input(type="imkafka" ...) reaching the engine through a .conf
    (ref: plugins/imkafka/imkafka.c:1003-1030 param bind;
    tests/imkafka.sh / imkafka-json-split-valid.sh config shapes).
    Batch twin: input_path is the injected consumer feed — the
    reference tests inject via kcat."""

    CONF = '''
    module(load="imkafka")
    template(name="plain" type="string" string="%msg%")
    input(type="imkafka"
          topic="imkafka_test"
          broker="127.0.0.1:29092"
          consumergroup="default"
          split.json.records="on"
          confParam=[ "compression.codec=none",
                      "session.timeout.ms=10000" ]
          ruleset="rs")
    ruleset(name="rs") {
        action(type="omfile" name="out" file="OUTDIR"
               template="plain")
    }
    '''

    def test_split_records_e2e(self, spark, tmp_path):
        from rsyslog_spark.config.runtime import run_config_batch

        feed = tmp_path / "feed.log"
        feed.write_text(
            '{"records":[{"msg":"msgnum:00000000:"},'
            '{"msg":"msgnum:00000001:"}]}\n'
            'plain non-json payload\n')
        outdir = tmp_path / "out"
        conf = self.CONF.replace("OUTDIR", str(outdir))
        run = run_config_batch(spark, conf, input_path=str(feed))
        assert "out" in run.written
        got = sorted(r["value"] for r in
                     spark.read.text(str(outdir)).collect())
        # fan-out: 2 records + 1 pass-through = 3 messages. The
        # pass-through line has no syslog header, so the 3164 chain
        # consumes leading tokens as hostname/TAG (documented
        # divergence in _stamp_receiver_hostname) — only the msg
        # remainder is asserted.
        assert len(got) == 3
        assert any("msgnum:00000000:" in g for g in got)
        assert any("msgnum:00000001:" in g for g in got)
        assert any("payload" in g for g in got)

    def test_missing_input_path_raises(self, spark, tmp_path):
        from rsyslog_spark.config.runtime import run_config_batch

        conf = self.CONF.replace("OUTDIR", str(tmp_path / "o"))
        try:
            run_config_batch(spark, conf)
        except ValueError as e:
            assert "imkafka" in str(e)
        else:
            raise AssertionError("expected ValueError")

    def test_parsehostname_off_stamps_receiver(self, spark, tmp_path):
        """Default (no parsehostname): NEEDS_PARSING without
        PARSE_HOSTNAME (imkafka.c:1022) — hostname stays the
        receiver's local hostname."""
        from rsyslog_spark.config.runtime import run_config_batch
        from rsyslog_spark.session import local_hostname

        feed = tmp_path / "feed.log"
        feed.write_text(
            "<13>Oct 11 22:14:15 otherhost app: hello\n")
        outdir = tmp_path / "out"
        conf = '''
        template(name="h" type="string" string="%hostname%|%fromhost%")
        input(type="imkafka" topic="t" broker="b:9092" ruleset="rs")
        ruleset(name="rs") {
            action(type="omfile" name="out" file="OUTDIR"
                   template="h")
        }
        '''.replace("OUTDIR", str(outdir))
        run_config_batch(spark, conf, input_path=str(feed))
        lh = local_hostname()
        got = [r["value"] for r in
               spark.read.text(str(outdir)).collect()]
        assert got == [f"{lh}|{lh}"]

    def test_parsehostname_on_parses_message(self, spark, tmp_path):
        from rsyslog_spark.config.runtime import run_config_batch

        feed = tmp_path / "feed.log"
        feed.write_text(
            "<13>Oct 11 22:14:15 otherhost app: hello\n")
        outdir = tmp_path / "out"
        conf = '''
        template(name="h" type="string" string="%hostname%")
        input(type="imkafka" topic="t" broker="b:9092"
              parsehostname="on" ruleset="rs")
        ruleset(name="rs") {
            action(type="omfile" name="out" file="OUTDIR"
                   template="h")
        }
        '''.replace("OUTDIR", str(outdir))
        run_config_batch(spark, conf, input_path=str(feed))
        got = [r["value"] for r in
               spark.read.text(str(outdir)).collect()]
        assert got == ["otherhost"]

    def test_imkafka_opts_normalization(self):
        """Param normalization: arrays join, broker defaults to
        localhost:9092 (imkafka.c:1030)."""
        from rsyslog_spark.config.runtime import _imkafka_opts

        ko = _imkafka_opts({
            "type": "imkafka",
            "topic": ["t1", "t2"],
            "broker": ["b1:9092", "b2:9092"],
            "confParam": ["a=1", "b=2"],
            "consumergroup": "cg",
            "split.json.records": "on",
        })
        assert ko["topics"] == "t1,t2"
        assert ko["brokers"] == "b1:9092,b2:9092"
        assert ko["conf_params"] == ["a=1", "b=2"]
        assert ko["consumergroup"] == "cg"
        assert ko["split_json"] and not ko["parse_hostname"]
        assert _imkafka_opts({"type": "imkafka", "topic": "t"}
                             )["brokers"] == "localhost:9092"

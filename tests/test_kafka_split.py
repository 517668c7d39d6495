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

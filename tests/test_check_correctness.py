"""Local-checker typed-mismatch detection (verdict r5 finding #1).

DuckDB's SUM(BIGINT) returns HUGEINT; the driver's exact value hash
renders that differently from Spark's BIGINT even when the numbers are
equal, while the local checker's canon() stringifies both identically.
typed_mismatches() closes that gap: an uncast DuckDB HUGEINT/DECIMAL
column whose Spark twin is integral must now FAIL locally.
"""

import importlib.util
import os

import duckdb

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "check_correctness.py"))
_cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cc)


def test_hugeint_vs_bigint_flagged():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1::BIGINT AS cnt")
    sql = "SELECT SUM(cnt) AS cnt FROM t"  # DuckDB SUM(BIGINT) -> HUGEINT
    probs = _cc.typed_mismatches(con, sql, ["cnt"], {"cnt": "bigint"})
    assert probs and "cnt" in probs[0] and "HUGEINT" in probs[0]


def test_decimal_vs_bigint_flagged():
    con = duckdb.connect()
    sql = "SELECT CAST(1 AS DECIMAL(20,0)) AS v"
    probs = _cc.typed_mismatches(con, sql, ["v"], {"v": "bigint"})
    assert probs and "DECIMAL" in probs[0]


def test_cast_bigint_clean():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1::BIGINT AS cnt")
    sql = "SELECT CAST(SUM(cnt) AS BIGINT) AS cnt FROM t"
    assert _cc.typed_mismatches(con, sql, ["cnt"], {"cnt": "bigint"}) == []


def test_double_twin_not_flagged():
    con = duckdb.connect()
    sql = "SELECT SUM(1.5) AS v"  # DECIMAL oracle, but Spark twin is double
    assert _cc.typed_mismatches(con, sql, ["v"], {"v": "double"}) == []


def test_all_registered_oracles_typed_clean():
    """No registered oracle may ship an uncast HUGEINT/DECIMAL against
    an integral Spark column. Static check: DESCRIBE every oracle and
    compare against the Spark dtypes recorded per query — cheap proxy:
    we only DESCRIBE (no execution), Spark side comes from the query
    running at the smallest SF only when needed. To keep this test
    fast and Spark-free, we flag any HUGEINT/DECIMAL oracle column at
    all and whitelist ones whose Spark twin is genuinely non-integral.
    """
    import __spark_entry__ as entrymod
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in _cc.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # Columns where a DECIMAL/HUGEINT oracle type is intentional because
    # the Spark side is double/decimal too (none today).
    allowed = set()
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception:
            continue  # oracle needs session state the driver provides
        for row in desc:
            cname, dtype = row[0], str(row[1]).upper()
            if (dtype in ("HUGEINT", "INT128", "UHUGEINT")
                    and (name, cname) not in allowed):
                offenders.append(f"{name}.{cname}={dtype}")
    assert not offenders, offenders


def test_tail_body_hash_covers_transitive_operator_source():
    """r12 governance (the r11 verdict's top item): a tail query's
    pin hashes not just its own source + oracle but the rsyslog_spark
    operator functions it transitively calls — so an operator rewrite
    forces the query back into the driver's verification window. Pins
    resolution through local imports, recursion into operator
    helpers, and hash sensitivity to the collected sources."""
    from rsyslog_spark.queries import (_transitive_sources,
                                       collect_all, tail_body_hash)

    qs = collect_all()
    q = qs["similarity_knn_join"]          # tail-parked since r8
    srcs = _transitive_sources(q.spark)
    # the operator itself (resolved via the query's local import)
    assert "rsyslog_spark.operators.similarity.knn_join" in srcs
    # and the helpers the OPERATOR calls (recursion)
    assert "rsyslog_spark.operators.similarity.dot" in srcs
    assert "rsyslog_spark.operators.similarity.norm" in srcs
    # deterministic across calls
    assert tail_body_hash(q) == tail_body_hash(q)
    # the hash is a function of the transitive blob: two different
    # queries over different operators never collide
    assert tail_body_hash(q) != tail_body_hash(qs["url_dedup_canonical"])

"""Expression-layer semantics vs reference behavior
(ref: grammar/rainerscript.c:3803-3960 coercion rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark import expr


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_cmp_numeric_first(spark):
    # "10" vs "9": numeric compare → 10 > 9 (string compare would say "10" < "9")
    assert one(spark, expr.rs_cmp(F.lit("10"), F.lit("9"), ">")) is True
    assert one(spark, expr.rs_cmp(F.lit("10"), F.lit("9"), "<")) is False


def test_cmp_string_fallback(spark):
    # non-numeric side → string comparison
    assert one(spark, expr.rs_cmp(F.lit("abc"), F.lit("abd"), "<")) is True
    assert one(spark, expr.rs_cmp(F.lit("10"), F.lit("10x"), "==")) is False
    assert one(spark, expr.rs_cmp(F.lit("a"), F.lit("a"), "==")) is True


def test_cmp_missing_reads_empty(spark):
    null = F.lit(None).cast("string")
    assert one(spark, expr.rs_cmp(null, F.lit(""), "==")) is True


def test_div_mod_by_zero_yields_zero(spark):
    assert one(spark, expr.rs_div(F.lit(10), F.lit(0))) == 0
    assert one(spark, expr.rs_mod(F.lit(10), F.lit(0))) == 0
    assert one(spark, expr.rs_div(F.lit(10), F.lit(3))) == 3
    assert one(spark, expr.rs_mod(F.lit(10), F.lit(3))) == 1


def test_integer_arithmetic_with_string_coercion(spark):
    assert one(spark, expr.rs_add(F.lit("4"), F.lit("5"))) == 9
    assert one(spark, expr.rs_add(F.lit("abc"), F.lit(5))) == 5  # non-num → 0


def test_concat_coerces_numbers(spark):
    assert one(spark, expr.rs_concat(F.lit("n="), F.lit(42))) == "n=42"


def test_prifilt_masks(spark):
    df = spark.createDataFrame(
        [(2, 6), (2, 3), (0, 3), (16, 0)], "fac int, sev int"
    )
    got = df.select(
        expr.prifilt("mail.info", "fac", "sev").alias("mail_info"),
        expr.prifilt("*.err", "fac", "sev").alias("any_err"),
        expr.prifilt("mail.=info", "fac", "sev").alias("mail_exact_info"),
        expr.prifilt("*.*;mail.none", "fac", "sev").alias("not_mail"),
    ).collect()
    # (2,6) mail.info: info(6) and more severe → pass
    assert got[0]["mail_info"] is True
    assert got[1]["mail_info"] is True      # (2,3) err more severe than info
    assert got[2]["mail_info"] is False     # kern facility
    assert got[0]["any_err"] is False       # sev 6 not <= err(3)
    assert got[1]["any_err"] is True
    assert got[2]["any_err"] is True
    assert got[0]["mail_exact_info"] is True
    assert got[1]["mail_exact_info"] is False
    assert got[0]["not_mail"] is False
    assert got[2]["not_mail"] is True


def test_prifilt_mask_merge():
    a = expr.PriFilter.parse("mail.*")
    b = expr.PriFilter.parse("*.err")
    merged = a & b
    assert merged.pmask[2] == 0b1111          # mail: err and more severe
    assert merged.pmask[0] == 0               # kern filtered out by a
    inv = ~expr.PriFilter.parse("*.*")
    assert all(m == 0 for m in inv.pmask)


class TestFoldability:
    def test_rs_cmp_constant_folds(self, spark):
        """SURVEY §4.1(b): the coercion-preserving comparison must stay
        foldable — a literal-vs-literal rs_cmp should reach the
        physical plan as a folded boolean, not a runtime CASE."""
        from rsyslog_spark.expr import rs_cmp
        from pyspark.sql import functions as F

        df = spark.range(1).select(
            rs_cmp(F.lit("10"), F.lit("9"), ">").alias("numeric_cmp"),
            rs_cmp(F.lit("abc"), F.lit("abd"), "<").alias("string_cmp"),
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # ConstantFolding collapsed both comparisons to literals
        assert "true AS numeric_cmp" in plan
        assert "true AS string_cmp" in plan
        row = df.collect()[0]
        assert row["numeric_cmp"] is True   # 10 > 9 numerically
        assert row["string_cmp"] is True    # abc < abd stringly


class TestCompareMatrixGolden:
    """The reference's full mixed-type comparison matrix
    (tests/rscript_compare_{num,numstr,str}x{num,numstr,str}.sh via
    rscript_compare-common.sh): for each (lower, higher) pair all six
    operators must order them correctly under rsyslog coercion."""

    # (LOWER_VAL, HIGHER_VAL) exactly as the reference exports them
    MATRIX = [
        ("1", "2"),            # num-num
        ("1", '"b"'),          # num-str
        ("1", '"2"'),          # num-numstr
        ('"1"', "2"),          # numstr-num
        ('"1"', '"2"'),        # numstr-numstr
        ('"1"', '"abc"'),      # numstr-str
        ('"-"', "1"),          # str-num
        ('"-"', '"2"'),        # str-numstr
        ('"a"', '"b"'),        # str-str
    ]

    def test_all_pairs_all_operators(self, spark):
        from rsyslog_spark.config.rainerscript import load_config

        stmts = []
        for i, (lo, hi) in enumerate(self.MATRIX):
            stmts.append(f"set $!lo{i} = {lo}; set $!hi{i} = {hi};")
            stmts.append(
                f'set $.r{i}_le = $!lo{i} <= $!hi{i};'
                f'set $.r{i}_lt = $!lo{i} <  $!hi{i};'
                f'set $.r{i}_ge = $!hi{i} >= $!lo{i};'
                f'set $.r{i}_gt = $!hi{i} >  $!lo{i};'
                f'set $.r{i}_ne = $!hi{i} != $!lo{i};'
                f'set $.r{i}_eq = $!hi{i} == $!lo{i};')
        conf = ('ruleset(name="m") { ' + "\n".join(stmts)
                + ' action(type="omfile" name="o") }')
        eng, _ = load_config(conf)
        df = spark.createDataFrame([("x",)], "msg string")
        actions, _ = eng.run(df, "m")
        row = dict(actions)["o"].collect()[0].asDict()
        for i, pair in enumerate(self.MATRIX):
            for op in ("le", "lt", "ge", "gt", "ne"):
                assert row[f"local_r{i}_{op}"] is True, (pair, op)
            assert row[f"local_r{i}_eq"] is False, (pair, "eq")


def test_negated_priority_selectors():
    """conf.c:409,422 / ChangeLog 2026-06-22: standalone negated
    selectors ('local4.!=debug', 'local4.!err') fill the untouched
    facility mask before clearing, matching everything except the
    excluded priorities; cumulative use after a positive part only
    clears. '.!none' fills, '.none' clears."""
    from rsyslog_spark.expr import PriFilter

    def sevs(spec, fac=20):
        f = PriFilter.parse(spec)
        return [s for s in range(8) if (f.pmask[fac] >> s) & 1]

    assert sevs("local4.!=debug") == [0, 1, 2, 3, 4, 5, 6]
    assert sevs("local4.!err") == [4, 5, 6, 7]
    # cumulative within one line: start from *.err, then clear debug
    # (no fill — the mask was already touched)
    assert sevs("*.err;local4.!=debug") == [0, 1, 2, 3]
    assert sevs("local4.!none") == list(range(8))
    assert sevs("local4.none") == []

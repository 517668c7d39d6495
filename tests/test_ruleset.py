"""Ruleset DSL semantics vs the reference interpreter's behavior
(ref: runtime/ruleset.c:536-598; statement enum rainerscript.h:112-181).
"""

from pyspark.sql import functions as F

from rsyslog_spark.plans import (
    Action, Call, Foreach, If, PriFilt, PropFilt, Ruleset, RulesetEngine,
    Set, Stop, Unset, varname,
)


def _mkdf(spark):
    rows = [
        # (facility, severity, msg, host)
        (2, 6, "mail ok", "a"),        # mail.info
        (2, 3, "mail err", "a"),       # mail.err
        (0, 1, "kernel alert", "b"),   # kern.alert
        (16, 6, "app info", "c"),      # local0.info
    ]
    return spark.createDataFrame(
        rows, "syslogfacility int, syslogseverity int, msg string, hostname string"
    )


def _names_rows(actions, name):
    d = dict(actions)
    return sorted(r.msg for r in d[name].collect())


def test_if_action_stop(spark):
    df = _mkdf(spark)
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        If(F.col("syslogseverity") <= 3, then=[
            Action("errors"),
            Stop(),
        ]),
        Action("rest"),
    ])])
    actions, survivors = eng.run(df)
    assert _names_rows(actions, "errors") == ["kernel alert", "mail err"]
    assert _names_rows(actions, "rest") == ["app info", "mail ok"]
    assert sorted(r.msg for r in survivors.collect()) == ["app info", "mail ok"]


def test_set_branch_scoped(spark):
    df = _mkdf(spark)
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Set("$.route", F.lit("default")),
        If(F.col("syslogfacility") == 2, then=[
            Set("$.route", F.lit("mail")),
        ]),
        Action("out"),
    ])])
    actions, _ = eng.run(df)
    out = dict(actions)["out"].select("msg", varname("$.route")).collect()
    routes = {r.msg: r.local_route for r in out}
    assert routes == {"mail ok": "mail", "mail err": "mail",
                      "kernel alert": "default", "app info": "default"}


def test_unset_and_missing_read(spark):
    df = _mkdf(spark)
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Set("$!tag", F.lit("x")),
        If(F.col("hostname") == "a", then=[Unset("$!tag")]),
        Action("out"),
    ])])
    actions, _ = eng.run(df)
    vals = {r.msg: r.cee_tag for r in dict(actions)["out"].collect()}
    assert vals["mail ok"] is None and vals["kernel alert"] == "x"


def test_prifilt_propfilt(spark):
    df = _mkdf(spark)
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        PriFilt("mail.*", then=[Action("mail"), Stop()]),
        PropFilt("msg", "contains", "alert", then=[Action("alerts")]),
        Action("tail"),
    ])])
    actions, _ = eng.run(df)
    assert _names_rows(actions, "mail") == ["mail err", "mail ok"]
    assert _names_rows(actions, "alerts") == ["kernel alert"]
    assert _names_rows(actions, "tail") == ["app info", "kernel alert"]


def test_call_inlines(spark):
    df = _mkdf(spark)
    eng = RulesetEngine([
        Ruleset("RSYSLOG_DefaultRuleset", [
            Call("sub"),
            Action("after"),
        ]),
        Ruleset("sub", [
            If(F.col("syslogseverity") <= 3, then=[Stop()]),
        ]),
    ])
    actions, _ = eng.run(df)
    assert _names_rows(actions, "after") == ["app info", "mail ok"]


def test_call_depth_limit(spark):
    df = _mkdf(spark)
    eng = RulesetEngine([
        Ruleset("RSYSLOG_DefaultRuleset", [Call("a")]),
        Ruleset("a", [Call("a")]),
    ])
    import pytest
    with pytest.raises(RecursionError):
        eng.run(df)


def test_foreach_explodes_live_rows(spark):
    df = _mkdf(spark).withColumn(
        "items",
        F.when(F.col("hostname") == "a", F.array(F.lit("x"), F.lit("y")))
        .otherwise(F.array(F.lit("z"))),
    )
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        If(F.col("syslogfacility") == 2, then=[
            Foreach("$.elem", F.col("items"), body=[
                Action("each"),
            ]),
        ]),
    ])])
    actions, _ = eng.run(df)
    got = sorted((r.msg, r.local_elem) for r in dict(actions)["each"].collect())
    assert got == [("mail err", "x"), ("mail err", "y"),
                   ("mail ok", "x"), ("mail ok", "y")]


def test_foreach_stop_kills_message_and_tail_elements(spark):
    # host a: items [x, BAD, y] — BAD stops: element y never runs,
    # whole message dies; host b survives untouched
    df = _mkdf(spark).withColumn(
        "items",
        F.when(F.col("hostname") == "a",
               F.array(F.lit("x"), F.lit("BAD"), F.lit("y")))
        .otherwise(F.array(F.lit("z"))),
    )
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Foreach("$.e", F.col("items"), body=[
            Action("each"),
            If(F.col(varname("$.e")) == "BAD", then=[Stop()]),
        ]),
        Action("after"),
    ])])
    actions, survivors = eng.run(df)
    each = sorted((r.msg, r.local_e)
                  for r in dict(actions)["each"].collect())
    # element y is gated off (after the stopping element)
    assert each == [("app info", "z"), ("kernel alert", "z"),
                    ("mail err", "BAD"), ("mail err", "x"),
                    ("mail ok", "BAD"), ("mail ok", "x")]
    assert _names_rows(actions, "after") == ["app info", "kernel alert"]
    assert sorted(r.msg for r in survivors.collect()) == \
        ["app info", "kernel alert"]


def test_nested_foreach_with_stop_compiles(spark):
    # regression: the stop-gate column used a FIXED name, so a
    # foreach-with-stop nested in another foreach-with-stop raised an
    # ambiguous-column AnalysisException
    df = _mkdf(spark).withColumn(
        "outer", F.array(F.lit("o1"), F.lit("o2"))).withColumn(
        "inner", F.array(F.lit("i1"), F.lit("STOPME")))
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Foreach("$.o", F.col("outer"), body=[
            Foreach("$.i", F.col("inner"), body=[
                Action("pair"),
                If(F.col(varname("$.i")) == "STOPME", then=[Stop()]),
            ]),
        ]),
        Action("after"),
    ])])
    actions, survivors = eng.run(df)
    # every message's inner loop hits STOPME → all messages die
    assert _names_rows(actions, "after") == []
    assert survivors.count() == 0
    # but the pair action saw elements up to (and incl.) the stopper
    pairs = {(r.local_o, r.local_i)
             for r in dict(actions)["pair"].collect()}
    assert ("o1", "i1") in pairs and ("o1", "STOPME") in pairs


def test_foreach_carries_body_writes(spark):
    # the reference mutates the message persistently in the body
    # (msgSetJSONFromVar): after the loop the variable holds the last
    # iteration's write
    df = _mkdf(spark).withColumn(
        "items",
        F.when(F.col("hostname") == "a",
               F.array(F.lit("x"), F.lit("y")))
        .otherwise(F.array().cast("array<string>")),
    )
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Set("$!last", F.lit("pre")),
        Foreach("$.e", F.col("items"), body=[
            Set("$!last", F.upper(F.col(varname("$.e")))),
            Set("$.seen", F.lit(1)),
        ]),
        Action("out"),
    ])])
    actions, _ = eng.run(df)
    out = {r.msg: (r.cee_last, r.local_seen)
           for r in dict(actions)["out"].collect()}
    assert out["mail ok"] == ("Y", 1)     # last element's write
    assert out["mail err"] == ("Y", 1)
    assert out["kernel alert"] == ("pre", None)  # loop never ran
    assert out["app info"] == ("pre", None)


def test_foreach_object_iteration(spark):
    # reference iterates JSON OBJECTS as {key,value} pairs
    # (runtime/ruleset.c:310-401); map columns and JSON-object strings
    # explode to entry structs with flat _key/_value companions
    df = _mkdf(spark).withColumn(
        "obj",
        F.when(F.col("hostname") == "a",
               F.create_map(F.lit("x"), F.lit("1"),
                            F.lit("y"), F.lit("2")))
        .otherwise(F.create_map(F.lit("z"), F.lit("9"))),
    )
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Foreach("$.p", F.col("obj"), body=[
            Action("pairs"),
        ]),
    ])])
    actions, _ = eng.run(df)
    got = sorted((r.msg, r.local_p_key, r.local_p_value)
                 for r in dict(actions)["pairs"].collect())
    assert ("mail ok", "x", "1") in got
    assert ("mail ok", "y", "2") in got
    assert ("kernel alert", "z", "9") in got
    # struct loop var itself is also bound
    row = dict(actions)["pairs"].filter(
        F.col("local_p_key") == "z").collect()[0]
    assert row["local_p"]["value"] == "9"


def test_foreach_json_object_string(spark):
    # a STRING collection is parsed as a JSON object
    df = _mkdf(spark).withColumn(
        "obj", F.when(F.col("hostname") == "a",
                      F.lit('{"k1":"v1","k2":"v2"}'))
        .otherwise(F.lit(None).cast("string")))
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Foreach("$.e", F.col("obj"), body=[
            Set("$.seen", F.concat(F.col(varname("$.e") + "_key"),
                                   F.lit("="),
                                   F.col(varname("$.e") + "_value"))),
        ]),
        Action("out"),
    ])])
    actions, _ = eng.run(df)
    seen = {r.msg: r.local_seen for r in dict(actions)["out"].collect()}
    # carry = last entry's write; document order preserved
    assert seen["mail ok"] == "k2=v2"
    assert seen["kernel alert"] is None


def test_action_transform_template(spark):
    df = _mkdf(spark)
    eng = RulesetEngine([Ruleset("RSYSLOG_DefaultRuleset", [
        Action("fmt", transform=lambda d: d.select(
            F.concat_ws(" ", "hostname", "msg").alias("line"))),
    ])])
    actions, _ = eng.run(df)
    lines = sorted(r.line for r in dict(actions)["fmt"].collect())
    assert lines[0] == "a mail err"


class TestCallIndirect:
    def test_dynamic_dispatch(self, spark):
        from pyspark.sql import functions as F
        from rsyslog_spark.plans.ruleset import (
            Action, CallIndirect, Ruleset, RulesetEngine, Set,
        )

        rs_a = Ruleset("rs_a", [Set("$.tag", F.lit("A")), Action("outa")])
        rs_b = Ruleset("rs_b", [Set("$.tag", F.lit("B")), Action("outb")])
        main = Ruleset("main", [
            CallIndirect(lambda df: F.concat(F.lit("rs_"), F.col("which"))),
            Action("tail"),
        ])
        eng = RulesetEngine([main, rs_a, rs_b])
        df = spark.createDataFrame(
            [("a",), ("b",), ("zzz",)], "which string")
        actions, _ = eng.run(df, "main")
        out = dict(actions)
        assert [r["which"] for r in out["outa"].collect()] == ["a"]
        assert [r["which"] for r in out["outb"].collect()] == ["b"]
        # unmatched ruleset name continues in caller; tagged rows too
        tail = {r["which"]: r["local_tag"] for r in out["tail"].collect()}
        assert tail == {"a": "A", "b": "B", "zzz": None}


def test_propfilt_sees_set_cee_values(spark):
    """A :$!var, op filter must see values written by set $!var (the
    flat cee_* column), not only the original json tree — same
    frame-aware read as templates (r4 fix)."""
    from rsyslog_spark.plans.ruleset import (
        Action, PropFilt, Ruleset, RulesetEngine, Set)
    from pyspark.sql import functions as F

    rs = Ruleset("m", [
        Set("$!kind", lambda df: F.upper(F.col("msg"))),
        PropFilt("$!kind", "isequal", "ALERT",
                 then=[Action("hit")]),
        Action("all"),
    ])
    eng = RulesetEngine([rs])
    df = spark.createDataFrame([("alert",), ("noise",)], "msg string")
    actions, _ = eng.run(df, "m")
    out = {n: d for n, d in actions}
    assert [r["msg"] for r in out["hit"].collect()] == ["alert"]
    assert out["all"].count() == 2

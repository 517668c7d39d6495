"""Scalar-function semantics; golden cases modeled on the reference's
tests/rscript_*.sh suite (behavioral parity, no code derived)."""

from __future__ import annotations

from pyspark.sql import functions as F

import rsyslog_spark.functions as rf


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_string_basics(spark):
    assert one(spark, rf.strlen(F.lit("abcd"))) == 4
    assert one(spark, rf.substring(F.lit("abcdef"), 1, 3)) == "bcd"
    assert one(spark, rf.tolower(F.lit("AbC"))) == "abc"
    assert one(spark, rf.toupper(F.lit("AbC"))) == "ABC"
    assert one(spark, rf.ltrim(F.lit("  x "))) == "x "
    assert one(spark, rf.rtrim(F.lit(" x  "))) == " x"


def test_field_semantics(spark):
    # ref tests/rscript_field.sh: delimiter as char code 44 (',')
    assert one(spark, rf.field(F.lit("a,b,c"), 44, 2)) == "b"
    assert one(spark, rf.field(F.lit("a,b,c"), ",", 3)) == "c"
    assert one(spark, rf.field(F.lit("a,b,c"), 44, 5)) == rf.FIELD_NOT_FOUND
    assert one(spark, rf.field(F.lit("a,,c"), 44, 2)) == ""


def test_replace_and_wrap(spark):
    # ref tests/rscript_replace.sh
    assert one(spark, rf.replace(F.lit("aXbXc"), "X", "-")) == "a-b-c"
    assert one(spark, rf.wrap(F.lit("ab"), '"')) == '"ab"'
    assert one(spark, rf.wrap(F.lit('a"b'), '"', "'")) == "\"a'b\""


def test_re_extract(spark):
    c = rf.re_extract(F.lit("id=42 id=43"), r"id=(\d+)", 1, 1, "none")
    assert one(spark, c) == "43"
    c = rf.re_extract(F.lit("nothing"), r"id=(\d+)", 0, 1, "none")
    assert one(spark, c) == "none"


def test_re_match(spark):
    assert one(spark, rf.re_match(F.lit("error 42"), r"err.r")) is True
    assert one(spark, rf.re_match_i(F.lit("ERROR"), r"error")) is True


def test_net_functions(spark):
    assert one(spark, rf.ipv42num(F.lit("10.0.1.1"))) == 167772417
    assert one(spark, rf.ipv42num(F.lit("not-an-ip"))) == 0
    assert one(spark, rf.ipv42num(F.lit("256.0.0.1"))) == 0
    assert one(spark, rf.num2ipv4(F.lit(167772417))) == "10.0.1.1"
    assert one(spark, rf.num2ipv4(F.lit(-5))) == "-1"
    assert one(spark, rf.int2hex(F.lit(255))) == "ff"
    assert one(spark, rf.b64_decode(F.lit("aGVsbG8="))) == "hello"
    assert one(spark, rf.is_in_subnet(F.lit("10.0.1.7"), "10.0.1.0/24")) is True
    assert one(spark, rf.is_in_subnet(F.lit("10.0.2.7"), "10.0.1.0/24")) is False


def test_cnum_cbool(spark):
    assert one(spark, rf.cnum(F.lit("42"))) == 42
    assert one(spark, rf.cnum(F.lit("4x"))) == 0
    assert one(spark, rf.cbool(F.lit("on"))) is True
    assert one(spark, rf.cbool(F.lit("0"))) is False


def test_time_functions(spark):
    # 2018-03-01T01:00:00Z = 1519866000
    assert one(spark, rf.format_time(F.lit(1519866000), "date-rfc3339")) == \
        "2018-03-01T01:00:00+00:00"
    assert one(spark, rf.format_time(F.lit(1519866000), "date-rfc3164")) == \
        "Mar  1 01:00:00"
    assert one(spark, rf.parse_time(F.lit("2018-03-01T01:00:00+00:00"))) == 1519866000
    assert one(spark, rf.parse_time(F.lit("not a time"))) == 0
    assert one(spark, rf.is_time(F.lit("2018-03-01T01:00:00Z"))) is True


def test_hashing_stable(spark):
    a = one(spark, rf.hash64(F.lit("abc")))
    b = one(spark, rf.hash64(F.lit("abc")))
    assert a == b
    assert 0 <= one(spark, rf.hash64mod(10, F.lit("abc"))) < 10
    assert 0 <= one(spark, rf.hash32(F.lit("abc"))) < 2**32


def test_json_functions(spark):
    j = F.lit('{"event":{"id":7},"user":"alice"}')
    assert one(spark, rf.json_get(j, "$!event!id")) == "7"
    assert one(spark, rf.json_get_num(j, "event!id")) == 7
    assert one(spark, rf.json_get(j, "user")) == "alice"
    merged = one(spark, rf.append_json(F.lit('{"a":"1"}'), F.lit('{"b":"2"}')))
    assert '"a":"1"' in merged and '"b":"2"' in merged
    out = one(spark, rf.unflatten(F.lit('{"a.b":1,"a.c":"x","d":2}')))
    assert out == '{"a":{"b":1,"c":"x"},"d":2}'


def test_faup(spark):
    u = F.lit("https://user:pw@sub.example.com:8443/p?q=1")
    assert one(spark, rf.faup_scheme(u)) == "https"
    assert one(spark, rf.faup_host(u)) == "sub.example.com"
    assert one(spark, rf.faup_domain(u)) == "example.com"
    assert one(spark, rf.faup_tld(u)) == "com"
    assert one(spark, rf.faup_subdomain(u)) == "sub"
    assert one(spark, rf.faup_domain_without_tld(u)) == "example"
    assert one(spark, rf.faup_port(u)) == "8443"


def test_cef(spark):
    line = one(spark, rf.tocef(
        F.lit("0"), F.lit("ven|dor"), F.lit("prod"), F.lit("1.0"),
        F.lit("sig"), F.lit("name"), F.lit("5"),
        rf.cef_ext_escape(F.lit("k=v")),
    ))
    assert line == "CEF:0|ven\\|dor|prod|1.0|sig|name|5|k\\=v"


class TestRegistryParity:
    def test_pcre_and_get_property(self, spark):
        import rsyslog_spark.functions as rf
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("abc123", '{"k": 7}')], "msg string, json string")
        out = df.select(
            rf.pcre_match("msg", r"\d+$").alias("m"),
            rf.get_property("$msg").alias("p"),
            rf.get_property("$!k").alias("k"),
        ).collect()[0]
        assert out["m"] is True
        assert out["p"] == "abc123"
        assert out["k"] == "7"

    def test_http_request_cached_fetcher(self, spark):
        import rsyslog_spark.functions as rf
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("http://x/1",), ("http://x/1",), ("http://x/2",)],
            "url string").coalesce(1)
        out = df.select(
            rf.http_request("url", fetcher=lambda u: f"body:{u[-1]}")
            .alias("r")).collect()
        assert [r["r"] for r in out] == ["body:1", "body:1", "body:2"]

    def test_http_request_requires_fetcher(self):
        import pytest
        import rsyslog_spark.functions as rf
        with pytest.raises(ValueError):
            rf.http_request("url")


def test_url_canonicalize(spark):
    """CCNet/RefinedWeb-style URL canonical key: case, default port,
    fragments, tracking params, param order, trailing slash."""
    from rsyslog_spark.functions.url import url_canonicalize
    from pyspark.sql import functions as F

    cases = {
        "HTTPS://Example.COM:443/Path/?utm_source=x&b=2&a=1#f":
            "https://example.com/Path?a=1&b=2",
        "http://example.com:80/": "http://example.com",
        "https://example.com/p?fbclid=abc": "https://example.com/p",
        "https://example.com/p?z=1&utm_campaign=c&a=2":
            "https://example.com/p?a=2&z=1",
        "https://example.com/p/": "https://example.com/p",
        "https://example.com/p": "https://example.com/p",
        "ftp://Files.example.com/X": "ftp://files.example.com/X",
        # tracking match is anchored to the param NAME: a longer name
        # merely containing a tracking token is NOT tracking
        "https://example.com/p?xfbclid=1":
            "https://example.com/p?xfbclid=1",
        "https://example.com/p?sort=utm_ab":
            "https://example.com/p?sort=utm_ab",
        # tracking-shaped text in the PATH never fires the filter
        "https://example.com/blog/utm_source=guide":
            "https://example.com/blog/utm_source=guide",
        # consecutive tracking params all drop
        "https://example.com/p?utm_a=1&utm_b=2&k=v":
            "https://example.com/p?k=v",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {r.u: r.c for r in
           df.select("u", url_canonicalize("u").alias("c")).collect()}
    assert got == cases


def test_url_canonicalize_idempotent(spark):
    """canon(canon(x)) == canon(x) over a combinatorial messy-URL
    corpus — canonicalization must be a projection (a drifting
    second pass would corrupt dedup keys built from already-canonical
    URLs)."""
    import itertools
    from pyspark.sql import functions as F
    from rsyslog_spark.functions.url import url_canonicalize

    urls = []
    for scheme, host, port, path, qs, frag in itertools.product(
            ["https://", "HTTPS://", "http://"],
            ["Example.COM", "a.b.example.org"],
            ["", ":443", ":80", ":8443"],
            ["", "/", "/P/x", "/P/x/"],
            ["", "?b=2&a=1", "?utm_source=x", "?a=1&utm_a=2&fbclid=3",
             "?xfbclid=1&b=2"],
            ["", "#frag"]):
        urls.append(f"{scheme}{host}{port}{path}{qs}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = url_canonicalize("u").alias("c1")
    out = df.select("u", once).select(
        "u", "c1", url_canonicalize(F.col("c1")).alias("c2"))
    bad = out.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, f"non-idempotent: {bad[:5]}"


def test_html_to_text(spark):
    from rsyslog_spark.operators.text import html_to_text

    html = ("<html><head><style>p{x}</style></head><body>"
            "<script>var a='<p>not text</p>';</script>"
            "<h1>Title</h1><p>Para &amp; <b>bold</b>"
            " &#39;q&#39;</p><!-- c --><ul><li>a</li><li>b</li></ul>"
            "<div>multi   space&nbsp;line</div></body></html>")
    df = spark.createDataFrame([(html,)], "h string")
    out = df.select(html_to_text("h").alias("t")).first()["t"]
    lines = [ln for ln in out.split("\n") if ln]
    assert lines == ["Title", "Para & bold 'q'", "a", "b",
                     "multi space line"]
    # script content (even containing tags) never leaks into text
    assert "not text" not in out


def test_html_to_text_double_escaped(spark):
    """&amp; decodes LAST: double-escaped entities come out
    single-decoded (html.unescape ordering), not double-decoded."""
    from rsyslog_spark.operators.text import html_to_text

    df = spark.createDataFrame(
        [("<p>a &amp;lt; b &amp;amp; c &amp; d</p>",)], "h string")
    out = df.select(html_to_text("h").alias("t")).first()["t"]
    assert out == "a &lt; b &amp; c & d"


def test_ngram_lm_scores(spark):
    """Hand-computed add-0.5 bigram LM (the CCNet-style perplexity
    filter). Train corpus: 'a b' and 'a b c' -> bigram counts
    C(a,b)=2, C(b,c)=1; context counts C(a)=2, C(b)=1; V=3."""
    import math
    from rsyslog_spark.operators.text import ngram_lm_scores

    train = spark.createDataFrame([(1, "a b"), (2, "a b c")],
                                  "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ngram_lm_scores(train, "text", "doc_id").collect()}
    # doc 1: one bigram (a,b): ln((2+0.5)/(2+0.5*3)) = ln(2.5/3.5)
    lp_ab = math.log(2.5 / 3.5)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_logp"] == round(lp_ab, 4)
    assert out[1]["ppl"] == round(math.exp(-lp_ab), 4)
    # doc 2: (a,b) and (b,c): ln(1.5/2.5) for (b,c)
    lp_bc = math.log(1.5 / 2.5)
    avg2 = (lp_ab + lp_bc) / 2
    assert out[2]["n_bigrams"] == 2
    assert out[2]["avg_logp"] == round(avg2, 4)

    # cross-corpus: unseen bigrams back off to the alpha floor
    # (left joins) instead of erroring or dropping rows; a one-token
    # doc has no bigram positions and drops out, like CCNet
    score = spark.createDataFrame([(7, "z q"), (8, "a")],
                                  "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           ngram_lm_scores(score, "text", "doc_id",
                           train=train).collect()}
    lp_zq = math.log(0.5 / (0.5 * 3))     # C2=0, C1=0, V=3
    assert got[7]["avg_logp"] == round(lp_zq, 4)
    assert 8 not in got
    # the unlikely doc scores HIGHER perplexity than in-distribution
    assert got[7]["ppl"] > out[1]["ppl"]


def test_tree_get_dup_case_divergence(spark):
    """Pin the DOCUMENTED divergence for duplicate case-variant keys
    (json_fns.tree_get docstring): libfastjson's ci lookup returns
    the first key in object order ({"ABC":1,"abc":2} -> $!abc = 1 in
    the reference); our exact-probe-first shape returns the
    exact-case key (2). Unique-key objects (every real corpus) agree
    on both engines — also asserted here."""
    from pyspark.sql import functions as F

    from rsyslog_spark.functions.json_fns import tree_get

    df = spark.createDataFrame(
        [('{"ABC": 1, "abc": 2}',), ('{"ABC": 3}',)], "j string")
    got = [r[0] for r in df.select(
        tree_get(F.col("j"), "$!abc").alias("v")).collect()]
    assert got[0] == "2"   # exact key wins (reference would read 1)
    assert got[1] == "3"   # unique case-variant key: both agree


def test_parse_time_localtz(spark, monkeypatch):
    """parse_time_localtz (rainerscript.c:2865, ChangeLog
    2026-06-01): naive stamps interpret in the daemon's local TZ;
    parse_time stays UTC. With TZ=Europe/Berlin in August the two
    differ by exactly 2 hours; RFC3339 stamps WITH an explicit
    offset are identical under both."""
    import time as _t

    from rsyslog_spark.functions import parse_time, parse_time_localtz

    monkeypatch.setenv("TZ", "Europe/Berlin")
    _t.tzset()
    try:
        df = spark.createDataFrame(
            [("2026-08-16T12:00:00",),
             ("2026-08-16T12:00:00+02:00",)], "ts string")
        rows = df.select(
            parse_time("ts").alias("utc"),
            parse_time_localtz("ts").alias("loc")).collect()
        assert rows[0].utc - rows[0].loc == 7200
        assert rows[1].utc == rows[1].loc   # explicit offset wins
    finally:
        monkeypatch.delenv("TZ")
        _t.tzset()


def test_parse_json_whole_input_strict(spark):
    """ChangeLog 2025-12-24: parse_json succeeds ONLY when the entire
    input is one JSON value - prefix-valid strings with trailing
    content ('{"a":1}xx', '12 34', '"str"extra') must fail; valid
    values of every root type (object/array/string/number/bool/null,
    with surrounding whitespace) still pass."""
    from pyspark.sql import functions as F

    from rsyslog_spark.functions.json_fns import (json_strict_ok,
                                                  parse_json_variant)

    cases = [
        # (input, strictly valid?)
        ('{"a":1}', True), (' {"a": 1} ', True),
        ('{"a":[1,{"b":2}]}', True), ("[1,2,3]", True),
        ('"str"', True), ('"a\\"b"', True), ("123", True),
        ("-12.5e3", True), ("true", True), ("false", True),
        ("null", True), ('{"a":"}x{"}', True),
        ('{"a":1}xx', False), ('{"a":1} {"b":2}', False),
        ("[1,2] junk", False), ('"str"extra', False),
        ("12 34", False), ("true true", False), ("123abc", False),
        ("truex", False), ('{"a":1', False), ('{"a":1}}', False),
        ("}", False), ("", False), ('"a" "b"', False),
        ('123"x"', False),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = {r.s: (bool(r.ok), r.v is not None) for r in df.select(
        "s", json_strict_ok("s").alias("ok"),
        parse_json_variant("s").alias("v")).collect()}
    for s, want in cases:
        assert got[s] == (want, want), (s, got[s], want)

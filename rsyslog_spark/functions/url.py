"""ffaup URL-decomposition built-ins (ref: contrib/ffaup/ffaup.c:306-315).

Compiled to Spark's native ``parse_url`` where possible. The tld /
domain / subdomain split uses a label heuristic (last label = tld,
last two = registrable domain) rather than the full public-suffix
list; a production deployment should broadcast-join a publicsuffix
table instead (see operators/lookup.py for the join machinery).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rsyslog_spark.expr import ColumnOrName, rs_str


def _url(u: ColumnOrName) -> Column:
    return rs_str(u)


def faup_scheme(u: ColumnOrName) -> Column:
    return F.lower(F.regexp_extract(_url(u), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def faup_credential(u: ColumnOrName) -> Column:
    return F.parse_url(_url(u), F.lit("USERINFO"))


def faup_host(u: ColumnOrName) -> Column:
    return F.parse_url(_url(u), F.lit("HOST"))


def faup_port(u: ColumnOrName) -> Column:
    return F.regexp_extract(_url(u), r"^[a-zA-Z][A-Za-z0-9+.-]*://[^/]*:(\d+)", 1)


#: common second-level public suffixes (a compact subset of the
#: Mozilla public-suffix list ffaup embeds — ffaup.c mozilla tld
#: data; golden tests/rscript_faup_mozilla_tld.sh pins co.uk).
#: Hosts whose last TWO labels are here get a 2-label tld and a
#: 3-label registrable domain; everything else uses the 1-label
#: heuristic. A production deployment at 100 TB should broadcast-join
#: the full PSL table instead (operators/lookup.py machinery).
_SLD_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "net.uk", "sch.uk",
    "me.uk", "ltd.uk", "plc.uk", "nhs.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "org.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "com.ar", "com.tr", "gen.tr",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.sg", "com.hk", "com.tw", "co.th", "com.my", "co.id",
    "com.vn", "com.eg", "co.il", "org.il", "com.sa", "com.pk",
    "com.ph", "com.ua", "gov.ua", "com.pl", "com.ru", "com.co",
    "com.pe", "com.ve", "com.ec", "com.uy", "com.do", "com.gt",
    "com.ng", "co.ke", "com.gh",
)


def _last_labels(host: Column, n: int) -> Column:
    pat = r"([^.]+" + r"\.[^.]+" * (n - 1) + r")$"
    return F.regexp_extract(host, pat, 1)


def faup_tld(u: ColumnOrName) -> Column:
    host = faup_host(u)
    last2 = _last_labels(host, 2)
    return F.when(last2.isin(*_SLD_SUFFIXES), last2) \
            .otherwise(F.regexp_extract(host, r"\.([^.]+)$", 1))


def faup_domain(u: ColumnOrName) -> Column:
    host = faup_host(u)
    last2 = _last_labels(host, 2)
    return F.when(last2.isin(*_SLD_SUFFIXES), _last_labels(host, 3)) \
            .otherwise(last2)


def faup_domain_without_tld(u: ColumnOrName) -> Column:
    return F.regexp_extract(faup_domain(u), r"^([^.]+)\.", 1)


def faup_subdomain(u: ColumnOrName) -> Column:
    host = faup_host(u)
    dom = faup_domain(u)
    return F.when(
        F.length(host) > F.length(dom) + 1,
        F.substring(host, F.lit(1), F.length(host) - F.length(dom) - 1),
    ).otherwise(F.lit(""))


def faup_resource_path(u: ColumnOrName) -> Column:
    """Path component, leading '/' kept (ffaup resource_path —
    golden tests/rscript_faup_resource_path.sh)."""
    return F.coalesce(F.parse_url(_url(u), F.lit("PATH")), F.lit(""))


def faup_query_string(u: ColumnOrName) -> Column:
    """Query INCLUDING the leading '?' (ffaup semantics — golden
    tests/rscript_faup_query_string.sh expects '?param=value')."""
    q = F.parse_url(_url(u), F.lit("QUERY"))
    return F.when(q.isNotNull(), F.concat(F.lit("?"), q)) \
            .otherwise(F.lit(""))


def faup_fragment(u: ColumnOrName) -> Column:
    """Fragment INCLUDING the leading '#' (ffaup semantics — golden
    tests/rscript_faup_fragment.sh expects '#faup')."""
    r = F.parse_url(_url(u), F.lit("REF"))
    return F.when(r.isNotNull(), F.concat(F.lit("#"), r)) \
            .otherwise(F.lit(""))


def faup(u: ColumnOrName) -> Column:
    """faup(url) → JSON object with all decomposed parts, key order
    and fields exactly ffaup's faup() container (ffaup.c:306-315;
    byte-exact render golden tests/rscript_faup_all{,_2,_empty}.sh
    via the json-c spaced variable render)."""
    def s(c):
        return F.coalesce(c, F.lit(""))
    return F.to_json(
        F.struct(
            s(faup_scheme(u)).alias("scheme"),
            s(faup_credential(u)).alias("credential"),
            s(faup_subdomain(u)).alias("subdomain"),
            s(faup_domain(u)).alias("domain"),
            s(faup_domain_without_tld(u)).alias("domain_without_tld"),
            s(faup_host(u)).alias("host"),
            s(faup_tld(u)).alias("tld"),
            s(faup_port(u)).alias("port"),
            s(faup_resource_path(u)).alias("resource_path"),
            s(faup_query_string(u)).alias("query_string"),
            s(faup_fragment(u)).alias("fragment"),
        )
    )


#: tracking params stripped by url_canonicalize (the web-corpus
#: convention: UTM family, click ids). Anchored to the START of a
#: query parameter — a param is tracking only when its NAME is one of
#: these, so ``?xfbclid=1`` or ``?sort=utm_ab`` survive untouched.
_TRACKING_PARAM_RE = (r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|"
                      r"mc_cid|igshid|ref_src)=")


def url_canonicalize(u: ColumnOrName) -> Column:
    """Canonical URL for web-corpus dedup (the CCNet/RefinedWeb
    dedup-key convention): lowercase scheme+host, drop the default
    port, strip the fragment and tracking query params (utm_*,
    fbclid, gclid, ...), sort the surviving query params, and drop a
    lone trailing slash.  Pure column regex ops — use as the groupBy
    key of :func:`rsyslog_spark.operators.dedup.exact_dedup` for
    URL-level dedup before any content pass.
    """
    c = F.col(u) if isinstance(u, str) else u
    # split off and discard the fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # lowercase scheme://host[:port] (path/query keep their case)
    head = F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    rest = F.substring(c, F.length(head) + 1, F.lit(1 << 30))
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(https://[^/?:]*):443$", "$1")
    head = F.regexp_replace(head, r"^(http://[^/?:]*):80$", "$1")
    # split path / query string FIRST, so the tracking filter only
    # ever sees query params (a tracking-shaped substring in the path
    # can't fire), then drop tracking params by anchored param-name
    # match and sort the survivors for an order-independent key
    path = F.substring_index(rest, "?", 1)
    qs = F.when(rest.contains("?"),
                F.substring_index(rest, "?", -1)).otherwise(F.lit(""))
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE))
    sorted_qs = F.array_join(F.array_sort(kept), "&")
    rest = F.when(sorted_qs != "", F.concat(path, F.lit("?"),
                                            sorted_qs)).otherwise(path)
    # a lone trailing slash on the path is not a distinct resource
    rest = F.regexp_replace(rest, r"^/$", "")
    rest = F.regexp_replace(rest, r"^(/[^?]*?)/(\?|$)", "$1$2")
    return F.concat(head, rest)


def http_request(url, fetcher=None):
    """fmhttp http_request(url) (ref: plugins/fmhttp/fmhttp.c:156-159):
    blocking GET into a variable. Python batched UDF with a
    per-executor response cache; ``fetcher(url) -> str`` is injected —
    there is NO default network client in this build (flagged
    non-deterministic in the reference docs too).
    """
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    if fetcher is None:
        raise ValueError("http_request needs an injected fetcher "
                         "(no network client in this build)")

    cache: dict = {}

    @pandas_udf("string")
    def _get(u: "pd.Series") -> "pd.Series":
        out = []
        for x in u:
            if x not in cache:
                cache[x] = fetcher(x)
            out.append(cache[x])
        return pd.Series(out)

    from rsyslog_spark.expr import rs_str
    return _get(rs_str(url))

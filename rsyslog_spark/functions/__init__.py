"""RainerScript scalar-function library as Column factories.

One Python function per reference built-in (registry at
grammar/rainerscript.c:4467-4510 plus loadable ``fm*`` modules). Every
function returns a ``pyspark.sql.Column`` built from JVM-side
``pyspark.sql.functions`` so the hot path stays inside whole-stage
codegen; the only Python-UDF escape hatches are clearly flagged
(http_request, unflatten).
"""

from rsyslog_spark.functions.strings import (
    strlen, substring, ltrim, rtrim, tolower, toupper, cstr, cnum, cbool,
    re_match, re_match_i, re_extract, re_extract_i, field, split_fn, replace,
    wrap, getenv_fn, random_fn, FIELD_NOT_FOUND, pcre_match, get_property,
)
from rsyslog_spark.functions.time_fns import (
    format_time, parse_time, parse_time_localtz, is_time,
)
from rsyslog_spark.functions.net import (
    ipv42num, num2ipv4, int2hex, b64_decode, is_in_subnet,
)
from rsyslog_spark.functions.hashing import hash32, hash32mod, hash64, hash64mod
from rsyslog_spark.functions.json_fns import (
    parse_json_variant, json_get, json_get_ci, json_get_num, tree_get,
    append_json, unflatten,
)
from rsyslog_spark.functions.url import (
    faup, faup_scheme, faup_credential, faup_subdomain, faup_domain,
    faup_domain_without_tld, faup_host, faup_tld, faup_port,
    faup_resource_path, faup_query_string, faup_fragment, http_request,
)
from rsyslog_spark.functions.cef import tocef, cef_ext_escape
from rsyslog_spark.expr import prifilt


def exec_template(template) -> "object":
    """exec_template(t): render a Template into a string Column
    (ref: rainerscript exec_template; our Template compiles to one
    concat expression — see templates.Template.col)."""
    return template.col()

__all__ = [
    "strlen", "substring", "ltrim", "rtrim", "tolower", "toupper",
    "cstr", "cnum", "cbool", "re_match", "re_match_i", "re_extract",
    "re_extract_i", "field", "split_fn", "replace", "wrap", "getenv_fn",
    "random_fn", "FIELD_NOT_FOUND", "pcre_match", "get_property",
    "http_request", "format_time", "parse_time", "parse_time_localtz", "is_time",
    "ipv42num", "num2ipv4", "int2hex", "b64_decode", "is_in_subnet",
    "hash32", "hash32mod", "hash64", "hash64mod",
    "parse_json_variant", "json_get", "json_get_ci", "json_get_num",
    "tree_get", "append_json",
    "exec_template",
    "unflatten", "faup", "faup_scheme", "faup_credential", "faup_subdomain",
    "faup_domain", "faup_domain_without_tld", "faup_host", "faup_tld",
    "faup_port", "faup_resource_path", "faup_query_string",
    "faup_fragment", "tocef", "cef_ext_escape", "prifilt",
]

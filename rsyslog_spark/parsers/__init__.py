"""Syslog parsers: raw wire lines → canonical schema columns.

Mirrors the reference parser chain (first parser that accepts wins,
ref: runtime/parser.c:615-660; default chain rfc5424→rfc3164,
runtime/parser.c:150-156) as pure Column expressions.
"""

from rsyslog_spark.parsers.pri import parse_pri
from rsyslog_spark.parsers.rfc3164 import rfc3164_fields
from rsyslog_spark.parsers.rfc5424 import rfc5424_fields, parse_structured_data
from rsyslog_spark.parsers.chain import parse_syslog

__all__ = [
    "parse_pri", "rfc3164_fields", "rfc5424_fields",
    "parse_structured_data", "parse_syslog",
]

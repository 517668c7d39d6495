"""rsyslog_spark — a PySpark-native log-analytics engine.

A from-scratch engine with the query and data-processing capabilities of
rsyslog (reference surveyed in SURVEY.md), built on DataFrames, Spark SQL
expressions, Catalyst, and Structured Streaming. Nothing here is a port of
the reference's C architecture; reference citations in docstrings are
``file:line`` into the read-only checkout at /root/reference and document
*behavioral* parity only.
"""

from rsyslog_spark.session import get_spark
from rsyslog_spark.schema import SYSLOG_SCHEMA, SYSLOG_FIELDS

__version__ = "0.1.0"

__all__ = ["get_spark", "SYSLOG_SCHEMA", "SYSLOG_FIELDS", "__version__"]

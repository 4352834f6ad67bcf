"""sqlengine_spark — a PySpark-native analytics engine.

Capability target: the query/data-processing surface declared in
SURVEY.md §2 (the reference checkout at /root/reference/ is empty —
see SURVEY.md §0 — so §2 is the authoritative contract).

Architecture: a thin, well-factored library over Spark SQL / DataFrame /
Structured Streaming. All planning and execution is Catalyst + Tungsten;
this package contributes the session bootstrap, the operator library,
the streaming harness, and the oracle registry used for verification.
"""

from sqlengine_spark.registry import all_oracles, all_queries, get_query
from sqlengine_spark.session import get_spark, load_tables

__all__ = ["all_oracles", "all_queries", "get_query", "get_spark", "load_tables"]

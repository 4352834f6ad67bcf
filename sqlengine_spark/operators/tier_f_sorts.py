"""Tier F — sorts / limits / top-k (SURVEY.md §2 tier F).

Scale notes: global ORDER BY is a range-partitioned sort (Spark samples
key ranges, then sorts each range partition — no single-node sort).
ORDER BY + LIMIT k is planned as TakeOrderedAndProject: each partition
keeps its local top-k, the driver merges k·partitions rows — O(k) data
movement instead of a full sort (plan-asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlengine_spark.registry import query
from sqlengine_spark.session import table


@query(
    "f_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey
    """,
)
def f_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total order (unique-key tiebreak per SURVEY §5.4 R2)."""
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus", "o_totalprice").orderBy(
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


@query(
    "f_sort_nulls",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '5-LOW') AS prio_nullable
    FROM orders
    ORDER BY prio_nullable ASC NULLS FIRST, o_orderkey
    """,
)
def f_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null placement in sort keys."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("prio_nullable"),
    ).orderBy(F.col("prio_nullable").asc_nulls_first(), F.col("o_orderkey").asc())


@query(
    "f_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def f_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — planned as TakeOrderedAndProject (per-partition
    heap of 10, merge at driver), not a full sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "f_offset_page",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def f_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination page 2 (rows 11-20 of a total order)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(10)
    )


@query(
    "f_sort_local",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    """,
)
def f_sort_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort (sortWithinPartitions): orders rows inside
    each partition WITHOUT a range-partitioning exchange — the row SET
    is unchanged (the oracle proves it), only the physical layout
    moves. This is the write-optimization primitive: sorting by a
    filter column before writing parquet tightens per-row-group
    min/max statistics, so later range predicates skip whole row
    groups — clustering benefits without a global sort's shuffle.

    Scale: zero data motion — each task sorts its own partition
    (spillable external sort). A global orderBy would range-partition
    100 TB first; for layout optimization that exchange buys nothing,
    which is why every table-format OPTIMIZE ... ZORDER/SORT runs
    exactly this local form per file group. Plan-asserted: Sort node
    present, no exchange introduced.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.sortWithinPartitions("l_shipdate").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )

"""Tier G — set operations (SURVEY.md §2 tier G).

UNION ALL is a zero-shuffle concatenation of partition lists; the
distinct variants add one hash-aggregate shuffle on the full row.
INTERSECT/EXCEPT plan as left-semi/anti hash joins in Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlengine_spark.registry import query
from sqlengine_spark.session import table


def _cust_nk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "g_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def g_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).unionByName(_supp_nk(spark, sf_dir))


@query(
    "g_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def g_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).unionByName(_supp_nk(spark, sf_dir)).distinct()


@query(
    "g_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def g_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).intersect(_supp_nk(spark, sf_dir))


@query(
    "g_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def g_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set EXCEPT (subtract), not bag exceptAll: a key present on both
    sides must vanish entirely regardless of multiplicity."""
    return _cust_nk(spark, sf_dir).subtract(_supp_nk(spark, sf_dir))


@query(
    "g_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def g_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag EXCEPT ALL: multiplicities subtract (60 customers minus 4
    suppliers in a nation leaves 56 rows) — planned as a counted
    hash-aggregate, one shuffle on the row."""
    return _cust_nk(spark, sf_dir).exceptAll(_supp_nk(spark, sf_dir))


@query(
    "g_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def g_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag INTERSECT ALL: min(multiplicity) copies survive."""
    return _cust_nk(spark, sf_dir).intersectAll(_supp_nk(spark, sf_dir))


@query(
    "g_union_byname_missing",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal
    FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, NULL AS acctbal
    FROM supplier
    """,
)
def g_union_byname_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: the supplier side lacks acctbal, so
    unionByName(allowMissingColumns=True) null-fills it — the pattern
    for unioning heterogeneous landing batches without a rewrite."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name")
    )
    return c.unionByName(s, allowMissingColumns=True)

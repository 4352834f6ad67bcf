"""Tier B — projection / filter / predicates (SURVEY.md §2 tier B).

All predicates are Column expressions (never Python UDFs) so Catalyst
pushes them into the Parquet scan — plan-asserted for b_filter_range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlengine_spark.functions import dround
from sqlengine_spark.registry import query
from sqlengine_spark.session import table


@query(
    "b_project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 2)               AS net,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge
    FROM lineitem
    """,
)
def b_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(net, 2).alias("net"),
        dround(net * (1 + F.col("l_tax")), 2).alias("charge"),
    )


@query(
    "b_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_quantity < 25
    """,
)
def b_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + numeric predicate; both reach PushedFilters (plan-asserted),
    so parquet row-group min/max stats skip non-matching row groups."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") < 25)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "b_filter_in_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_name LIKE '%widget%'
    """,
)
def b_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "b_filter_bool_logic",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'F'
      AND (o_totalprice > 150000 OR NOT o_orderpriority = '1-URGENT')
    """,
)
def b_filter_bool_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & ((F.col("o_totalprice") > 150000) | ~(F.col("o_orderpriority") == "1-URGENT"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "b_filter_null_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_linestatus, 'O')                 AS ls_nullable,
           (NULLIF(l_linestatus, 'O') IS NULL)       AS is_null_flag,
           (NULLIF(l_linestatus, 'O') IS NOT NULL)   AS not_null_flag,
           (NULLIF(l_linestatus, 'O') IS NOT DISTINCT FROM NULLIF(l_returnflag, 'N'))
                                                     AS null_safe_eq
    FROM lineitem
    """,
)
def b_filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-valued logic: NULLIF-produced nulls, IS [NOT] NULL, and
    null-safe equality (Spark eqNullSafe ≡ DuckDB IS NOT DISTINCT FROM)."""
    li = table(spark, sf_dir, "lineitem")
    ls = F.nullif(F.col("l_linestatus"), F.lit("O"))
    rf = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ls.alias("ls_nullable"),
        ls.isNull().alias("is_null_flag"),
        ls.isNotNull().alias("not_null_flag"),
        ls.eqNullSafe(rf).alias("null_safe_eq"),
    )


@query(
    "b_distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def b_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash-aggregate on all projected columns; Spark plans a
    partial distinct before the shuffle, so the exchange carries at most
    |distinct| rows per input partition."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()

"""Tier D — aggregations (SURVEY.md §2 tier D).

All aggregates are expressed with built-in ``pyspark.sql.functions`` so
Spark plans partial(map-side)+final HashAggregate automatically — the
shape that scales: at 100 TB the partial agg collapses each input
partition to |groups| rows before the shuffle, so the exchange moves
group cardinality, not data cardinality.

Float policy (SURVEY §5.4 R1): every float aggregate is ROUND()ed
identically in Spark and the DuckDB oracle so association-order ulp
drift cannot flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlengine_spark.registry import query
from sqlengine_spark.session import table


@query(
    "d_agg_q1_pricing",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
        ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
        ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
        ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
        ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
        ROUND(AVG(l_discount), 4)                                        AS avg_disc,
        COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d_agg_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape): pricing summary report.

    Scan → filter (pushed to parquet) → partial agg → shuffle on the
    2-value group key → final agg. Group cardinality is 6, so the
    shuffle is O(partitions·6) rows regardless of input size — this
    plan is scale-invariant.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )

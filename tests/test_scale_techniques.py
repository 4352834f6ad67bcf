"""Scale techniques the 100 TB design names (SCALE.md): bucketed
co-located joins (no shuffle at join time) and salted aggregation for
skewed keys. Both are asserted against real plans/results, not just
documented.
"""

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from sqlengine_spark.session import table
from sqlengine_spark.skew import salted_agg
from tests.conftest import SF_DIR_SMALL


def _plan(df, spark):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_has_no_shuffle(spark):
    """Pre-bucketing both fact tables on the join key makes the join
    exchange-free: each bucket pair joins in place. THE technique for
    repeated fact-fact joins at 100 TB — pay the shuffle once at write
    time, never again."""
    tag = uuid.uuid4().hex[:8]
    t_o, t_l = f"orders_b_{tag}", f"lineitem_b_{tag}"
    o = table(spark, SF_DIR_SMALL, "orders")
    li = table(spark, SF_DIR_SMALL, "lineitem")
    try:
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(t_o)
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(t_l)
        joined = (
            spark.table(t_o)
            .join(spark.table(t_l), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        plan = _plan(joined, spark)
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, (
            "bucketed join still shuffles:\n" + join_section
        )
        # and it is still correct
        want = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        for t in (t_o, t_l):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_salted_count_distinct_matches_direct(spark):
    """Salted two-stage count-distinct must be exact — same answer as
    the direct aggregate — while splitting any hot key's state across
    16 reducers."""
    ev = table(spark, SF_DIR_SMALL, "events")
    got = {
        r["event_type"]: r["n_distinct"]
        for r in salted_agg(ev, "event_type", "user_id").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_agg_two_stage_plan(spark):
    ev = table(spark, SF_DIR_SMALL, "events")
    plan = _plan(salted_agg(ev, "event_type", "user_id"), spark)
    # two aggregation layers: (key, salt) then key
    assert plan.count("HashAggregate") >= 3  # partial+final per stage

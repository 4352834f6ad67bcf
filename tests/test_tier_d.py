"""Tier D — aggregation operators vs DuckDB oracle (SURVEY §2 tier D)."""

from tests.conftest import assert_matches_oracle

TIER_D_ORACLED = [
    "d_agg_q1_pricing",
]


def test_q1_pricing(spark, duck):
    assert_matches_oracle(spark, duck, "d_agg_q1_pricing")


def test_q1_rowcount_sf001(spark):
    """Smoke: flagship at sf0.001 returns the 6 (flag,status) groups."""
    from sqlengine_spark.registry import all_queries

    df = all_queries()["d_agg_q1_pricing"](spark, "/root/testdata/sf0.001")
    assert df.count() == 6

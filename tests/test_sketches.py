"""Algorithmic invariants for the round-4 sketch/join operators —
properties that must hold on ANY data, beyond the oracle hash-equality
the registry suite already checks:

- Count-Min sketch: one-sided error (estimate >= exact, always) and
  mass conservation (every depth's cells sum to the total insert count).
- Interval overlap join: the bucketized plan must equal the naive
  overlap join pair-for-pair, with zero duplicate pairs (the
  canonical-bucket trick replaces a distinct — prove it deduplicates).
"""

from pyspark.sql import functions as F

from sqlengine_spark.operators.tier_c_joins import c_join_interval
from sqlengine_spark.operators.tier_d_aggregates import d_agg_countmin
from sqlengine_spark.session import table
from tests.conftest import SF_DIR_SMALL


def test_countmin_one_sided_error(spark):
    rows = d_agg_countmin(spark, SF_DIR_SMALL).collect()
    assert rows, "sketch produced no estimates"
    for r in rows:
        assert r["cm_est"] >= r["exact_n"], (
            f"CM underestimated {r['t']}: {r['cm_est']} < {r['exact_n']}"
        )


def test_countmin_mass_conservation(spark):
    """Each depth is a partition of the insert stream: its 64 cells must
    sum to the total token count — the property that makes per-partition
    grids mergeable by cell-wise SUM."""
    d = table(spark, SF_DIR_SMALL, "documents")
    total = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).count()
    # rebuild the grid exactly as the operator does
    tok = d.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
    cnt = tok.groupBy("t").agg(F.count("*").alias("n"))
    keyed = cnt.select(
        "t", "n", F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j")
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("t"), F.lit("#"), F.col("j").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 64,
    )
    per_depth = (
        keyed.groupBy("j").agg(F.sum("n").alias("mass")).collect()
    )
    assert len(per_depth) == 4
    for r in per_depth:
        assert r["mass"] == total


def test_interval_join_matches_naive_and_dedups(spark):
    got = {
        (r["o_orderkey"], r["win_id"]): r["overlap_days"]
        for r in c_join_interval(spark, SF_DIR_SMALL).collect()
    }
    # the bucketized plan must emit each qualifying pair EXACTLY once
    assert len(got) == c_join_interval(spark, SF_DIR_SMALL).count()

    o = table(spark, SF_DIR_SMALL, "orders")
    n = table(spark, SF_DIR_SMALL, "nation")
    a = o.select(
        "o_orderkey",
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("timestamp")).alias(
            "s_a"
        ),
    ).withColumn("e_a", F.col("s_a") + F.col("o_orderkey") % 5)
    b = n.select(
        F.col("n_nationkey").alias("win_id"),
        (F.col("n_nationkey") * 96).alias("s_b"),
        (F.col("n_nationkey") * 96 + 44).alias("e_b"),
    )
    naive = (
        a.crossJoin(b)  # bounded: |orders| x 25 at sf0.001, test-only
        .filter((F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")))
        .select(
            "o_orderkey",
            "win_id",
            (F.least("e_a", "e_b") - F.greatest("s_a", "s_b") + 1)
            .cast("bigint")
            .alias("overlap_days"),
        )
    )
    want = {
        (r["o_orderkey"], r["win_id"]): r["overlap_days"]
        for r in naive.collect()
    }
    assert got == want


def test_quantile_rollup_error_bounded_by_bin_width(spark):
    """The merged-histogram p50 estimate must land within one bin width
    (343.75) of the exact interpolated median — the histogram sketch's
    worst-case interpolation error."""
    from sqlengine_spark.registry import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["d_agg_quantile_rollup"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r["p50_est"] - r["p50_exact"]) <= 343.75

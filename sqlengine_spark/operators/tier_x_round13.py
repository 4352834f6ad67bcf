"""Round-13 operator batch — the composed eval-report surface.

The r12 verdict named two thin remaining surfaces; this module holds
the second one (the first, session-timeout streaming with state
timers, lives with the other streaming shapes in tier_j_streaming):
an END-TO-END EVAL REPORT that computes the per-pair metric suite and
its uncertainty in one job — the artifact an LLM-eval pipeline
actually ships, rather than one metric per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlengine_spark.functions import dround
from sqlengine_spark.registry import query
from sqlengine_spark.session import table
from sqlengine_spark.operators.tier_w_round12 import _BOOT_B, _pois_case_sql

# Poisson(1) draw keyed on (pair_id, replicate) — same embedded
# 16-bit hex-cutoff grid as the tier_w bootstrap pair (one md5 per
# (pair, b), no hex->int conversion).
_REP_W_CASE = _pois_case_sql(
    "substring(md5(CAST(pair_id AS STRING) || '_' ||"
    " CAST(b AS STRING)), 1, 4)"
)
_REP_W_CASE_DUCK = _pois_case_sql(
    "substring(md5(CAST(pair_id AS VARCHAR) || '_' ||"
    " CAST(b.b AS VARCHAR)), 1, 4)"
)


@query(
    "l_eval_report",
    oracle=f"""
    WITH d AS (
        SELECT CAST(doc_id // 2 AS BIGINT) AS pair_id, doc_id % 2 AS side,
               text, replace(text, ' ', '') AS s
        FROM documents
    ), g AS (
        SELECT pair_id, side, substring(s, i.i, 6) AS g
        FROM d, LATERAL (SELECT unnest(generate_series(1, length(s) - 5))
                         AS i) i
    ), pg AS (
        SELECT pair_id, g,
               CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c0,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1
        FROM g GROUP BY pair_id, g
    ), a AS (
        SELECT pair_id,
               CAST(SUM(c0) AS BIGINT) AS tc,
               CAST(SUM(c1) AS BIGINT) AS tr,
               CAST(SUM(LEAST(c0, c1)) AS BIGINT) AS ov
        FROM pg GROUP BY pair_id
    ), tw AS (
        SELECT pair_id, side, unnest(string_split(text, ' ')) AS w
        FROM d
    ), tg AS (
        SELECT pair_id, w,
               CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c0,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1
        FROM tw GROUP BY pair_id, w
    ), ta AS (
        SELECT pair_id,
               CAST(SUM(c0) AS BIGINT) AS tc_t,
               CAST(SUM(c1) AS BIGINT) AS tr_t,
               CAST(SUM(LEAST(c0, c1)) AS BIGINT) AS ov_t
        FROM tg GROUP BY pair_id
    ), pp AS (
        SELECT ta.pair_id,
               CAST(ROUND(CASE WHEN COALESCE(a.ov, 0) = 0 THEN 0.0
                    ELSE CAST(5 * a.ov * a.ov AS DOUBLE)
                         / CAST(4 * a.ov * a.tc + a.ov * a.tr AS DOUBLE)
                    END * 1e6) AS BIGINT) AS chrf_fp,
               CAST(ROUND(CASE WHEN ta.ov_t = 0 THEN 0.0
                    ELSE CAST(2 * ta.ov_t AS DOUBLE)
                         / CAST(ta.tc_t + ta.tr_t AS DOUBLE)
                    END * 1e6) AS BIGINT) AS f1_fp,
               CAST(ROUND(CAST(ta.tr_t AS DOUBLE)
                          / CAST(ta.tc_t AS DOUBLE) * 1e6) AS BIGINT)
                   AS lr_fp
        FROM ta LEFT JOIN a ON a.pair_id = ta.pair_id
    ), r AS (
        SELECT b.b, pp.chrf_fp, {_REP_W_CASE_DUCK} AS w
        FROM pp CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1}))
                            AS b) b
    ), m AS (
        SELECT b, CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(w * chrf_fp) AS BIGINT) AS swc
        FROM r GROUP BY b
    ), o AS (
        SELECT CAST(swc AS DOUBLE) / CAST(NULLIF(sw, 0) AS DOUBLE) / 1e6
                   AS mb,
               b,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(swc AS DOUBLE)
                            / CAST(NULLIF(sw, 0) AS DOUBLE) / 1e6, b) AS rk
        FROM m
    ), pt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(chrf_fp) AS BIGINT) AS sc,
               CAST(SUM(f1_fp) AS BIGINT) AS sf,
               CAST(SUM(lr_fp) AS BIGINT) AS sl
        FROM pp
    )
    SELECT pt.n_pairs, CAST({_BOOT_B} AS BIGINT) AS n_replicates,
           ROUND(CAST(pt.sc AS DOUBLE) / 1e6 / CAST(pt.n_pairs AS DOUBLE)
                 * 1e6) / 1e6 + 0 AS mean_chrf2,
           ROUND((SELECT mb FROM o WHERE rk = {_BOOT_B // 40}) * 1e6)
               / 1e6 + 0 AS chrf2_ci_lo,
           ROUND((SELECT mb FROM o WHERE rk = {_BOOT_B - _BOOT_B // 40 + 1})
                 * 1e6) / 1e6 + 0 AS chrf2_ci_hi,
           ROUND(CAST(pt.sf AS DOUBLE) / 1e6 / CAST(pt.n_pairs AS DOUBLE)
                 * 1e6) / 1e6 + 0 AS mean_tok_f1,
           ROUND(CAST(pt.sl AS DOUBLE) / 1e6 / CAST(pt.n_pairs AS DOUBLE)
                 * 1e6) / 1e6 + 0 AS mean_len_ratio
    FROM pt
    """,
)
def l_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END EVAL REPORT — the single artifact a generation-eval
    pipeline ships: per candidate/reference pair (the chrF/BLEU doc
    pairing convention, pair = doc_id DIV 2, side = doc_id % 2) it
    computes character-level chrF2, token unigram F1, and length
    ratio, then rolls the corpus up to ONE row with each metric's mean
    and a 95% Poisson-bootstrap CI on the headline metric (chrF2) —
    composing the tier_w chrf + bootstrap machinery into the report
    those queries exist to serve (r12 verdict item 7's second named
    surface). A real eval run reads this row, not three query outputs.

    Determinism: every per-pair metric quantizes to a 1e6 fixed-point
    BIGINT via one guarded exact-BIGINT-ratio division + ROUND (rule
    11e — corpus sums are then exact integer sums in both engines);
    bootstrap weights are the embedded 16-bit md5 hex-cutoff Poisson
    draw keyed (pair_id, replicate); the CI is the symmetric
    order-statistic pick under the total order (mean, b). Pairs whose
    stripped text is shorter than 6 chars have no chrF grams — the
    token side LEFT-JOINs the gram side and COALESCEs ov to 0 in both
    engines.

    Scale: two gram fan-outs over the same column-pruned scan (char
    6-grams and token unigrams — both codegen Generate-over-index /
    posexplode forms), each partial-aggregated into (pair, gram)-keyed
    shuffles linear in character/token count; the per-pair metric
    table is |pairs|-keyed and the bootstrap fan-out explodes B=200
    codegen-projected draws per PAIR (not per token). The pair join is
    pair-keyed (corpus-growing, plain — rule 14a). Nothing pairwise in
    the corpus, state bounded by |pairs| x B."""
    base = table(spark, sf_dir, "documents").select(
        F.expr("CAST(doc_id DIV 2 AS BIGINT)").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.col("text"),
        F.expr("replace(text, ' ', '')").alias("s"),
    )
    g = base.select(
        "pair_id",
        "side",
        "s",
        F.explode(
            F.expr(
                "CASE WHEN length(s) >= 6 THEN sequence(1, length(s) - 5)"
                " ELSE CAST(array() AS ARRAY<INT>) END"
            )
        ).alias("i"),
    ).select("pair_id", "side", F.expr("substring(s, i, 6)").alias("g"))
    a = (
        g.groupBy("pair_id", "g")
        .agg(
            F.coalesce(F.sum(F.when(F.col("side") == 0, F.lit(1))), F.lit(0))
            .alias("c0"),
            F.coalesce(F.sum(F.when(F.col("side") == 1, F.lit(1))), F.lit(0))
            .alias("c1"),
        )
        .groupBy("pair_id")
        .agg(
            F.sum("c0").alias("tc"),
            F.sum("c1").alias("tr"),
            F.sum(F.least("c0", "c1")).alias("ov"),
        )
    )
    tw = base.select(
        "pair_id", "side", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    ta = (
        tw.groupBy("pair_id", "w")
        .agg(
            F.coalesce(F.sum(F.when(F.col("side") == 0, F.lit(1))), F.lit(0))
            .alias("c0"),
            F.coalesce(F.sum(F.when(F.col("side") == 1, F.lit(1))), F.lit(0))
            .alias("c1"),
        )
        .groupBy("pair_id")
        .agg(
            F.sum("c0").alias("tc_t"),
            F.sum("c1").alias("tr_t"),
            F.sum(F.least("c0", "c1")).alias("ov_t"),
        )
    )
    chrf_raw = F.when(F.coalesce(F.col("ov"), F.lit(0)) == 0, F.lit(0.0)).otherwise(
        (5 * F.col("ov") * F.col("ov")).cast("double")
        / (4 * F.col("ov") * F.col("tc") + F.col("ov") * F.col("tr")).cast(
            "double"
        )
    )
    f1_raw = F.when(F.col("ov_t") == 0, F.lit(0.0)).otherwise(
        (2 * F.col("ov_t")).cast("double")
        / (F.col("tc_t") + F.col("tr_t")).cast("double")
    )
    lr_raw = F.col("tr_t").cast("double") / F.col("tc_t").cast("double")
    pp = (
        ta.join(a, "pair_id", "left")
        .select(
            "pair_id",
            F.round(chrf_raw * 1e6, 0).cast("bigint").alias("chrf_fp"),
            F.round(f1_raw * 1e6, 0).cast("bigint").alias("f1_fp"),
            F.round(lr_raw * 1e6, 0).cast("bigint").alias("lr_fp"),
        )
        .localCheckpoint()  # rule 11a: feeds the point means AND the
        # B-fold bootstrap fan-out (two real consumers)
    )
    r = pp.select(
        "pair_id",
        "chrf_fp",
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b"),
    ).select("chrf_fp", "b", F.expr(_REP_W_CASE).alias("w"))
    m = r.groupBy("b").agg(
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("chrf_fp")).alias("swc"),
    )
    mb = (
        F.col("swc").cast("double")
        / F.when(F.col("sw") == 0, F.lit(None))
        .otherwise(F.col("sw"))
        .cast("double")
        / F.lit(1e6)
    )
    from pyspark.sql import Window as W

    o = m.select(mb.alias("mb"), "b").select(
        "mb", F.row_number().over(W.orderBy("mb", "b")).alias("rk")
    )
    lo = _BOOT_B // 40
    hi = _BOOT_B - _BOOT_B // 40 + 1
    ci = o.filter(F.col("rk").isin(lo, hi)).agg(
        F.max(F.when(F.col("rk") == lo, F.col("mb"))).alias("lo"),
        F.max(F.when(F.col("rk") == hi, F.col("mb"))).alias("hi"),
    )
    pt = pp.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("chrf_fp").alias("sc"),
        F.sum("f1_fp").alias("sf"),
        F.sum("lr_fp").alias("sl"),
    )
    return pt.crossJoin(F.broadcast(ci)).select(
        "n_pairs",
        F.lit(_BOOT_B).cast("bigint").alias("n_replicates"),
        dround(
            F.col("sc").cast("double") / 1e6 / F.col("n_pairs").cast("double"),
            6,
        ).alias("mean_chrf2"),
        dround(F.col("lo"), 6).alias("chrf2_ci_lo"),
        dround(F.col("hi"), 6).alias("chrf2_ci_hi"),
        dround(
            F.col("sf").cast("double") / 1e6 / F.col("n_pairs").cast("double"),
            6,
        ).alias("mean_tok_f1"),
        dround(
            F.col("sl").cast("double") / 1e6 / F.col("n_pairs").cast("double"),
            6,
        ).alias("mean_len_ratio"),
    )

"""Tier U (extension, round 9) — evaluation & experimentation
statistics: a Bradley-Terry arena leaderboard fit by MM iterations
(the LLM-arena ranking algorithm), split-conformal prediction
intervals (distribution-free uncertainty for a regression gate),
a two-sample Kolmogorov-Smirnov drift test, and CUPED variance
reduction for A/B experiments — the statistical layer an evaluation
pipeline runs on top of the curation tiers.

Float policy: iterative BT follows the l_embedding_pca sanction —
bounded driver-side state (|sources| scalars) re-rounded to 12 dp
half-away each step, with DuckDB replaying the identical iteration via
ordered aggregates (sequential fold, CLAUDE.md rule 4); everything
else reduces to exact integer sums cast to double for the final
identical expression (rule 11e).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqlengine_spark.functions import dround
from sqlengine_spark.registry import query
from sqlengine_spark.session import scatter, table

_BT_ITERS = 5


def _round12(x: float) -> float:
    """Half-away 12-dp rounding (driver-side twin of dround(col, 12))."""
    return math.copysign(math.floor(abs(x) * 1e12 + 0.5), x) / 1e12


def _bt_oracle(iters: int) -> str:
    its = []
    prev = "p0"
    for t in range(1, iters + 1):
        its.append(
            f"""it{t} AS MATERIALIZED (
        SELECT pr.i,
               w.w / SUM(pr.games / (pi.p + pj.p) ORDER BY pr.j) AS praw
        FROM pairs pr
        JOIN {prev} pi ON pi.i = pr.i
        JOIN {prev} pj ON pj.i = pr.j
        JOIN w ON w.i = pr.i
        GROUP BY pr.i, w.w
    ), it{t}n AS MATERIALIZED (
        SELECT i, ROUND(praw * (SELECT k FROM kk)
                        / (SELECT SUM(praw ORDER BY i) FROM it{t})
                        * 1e12) / 1e12 AS p
        FROM it{t}
    )"""
        )
        prev = f"it{t}n"
    return f"""
    WITH r AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ), m AS MATERIALIZED (
        SELECT a.source AS sa, b.source AS sb,
               CAST(COUNT(*) AS BIGINT) AS games,
               CAST(SUM(CASE WHEN a.n_chars > b.n_chars
                             OR (a.n_chars = b.n_chars
                                 AND a.doc_id < b.doc_id)
                        THEN 1 ELSE 0 END) AS BIGINT) AS wins_a
        FROM r a JOIN r b ON a.rn = b.rn AND a.source < b.source
        GROUP BY a.source, b.source
    ), pairs AS MATERIALIZED (
        SELECT sa AS i, sb AS j, games, wins_a AS wins FROM m
        UNION ALL
        SELECT sb, sa, games, games - wins_a FROM m
    ), w AS MATERIALIZED (
        SELECT i, CAST(SUM(wins) AS BIGINT) AS w,
               CAST(SUM(games) AS BIGINT) AS g
        FROM pairs GROUP BY i
    ), kk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k FROM w
    ), p0 AS MATERIALIZED (
        SELECT i, CAST(1.0 AS DOUBLE) AS p FROM w
    ), {", ".join(its)}
    SELECT w.i AS source, w.g AS games, w.w AS wins,
           ROUND(p.p * 1e6) / 1e6 + 0.0 AS bt_score,
           CAST(ROW_NUMBER() OVER (ORDER BY p.p DESC, w.i) AS INT) AS rank
    FROM w JOIN {prev} p ON p.i = w.i
    """


@query("l_bt_leaderboard", oracle=_bt_oracle(_BT_ITERS))
def l_bt_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRADLEY-TERRY arena leaderboard over sources, fit by the
    classic MM (minorization-maximization) iteration — the algorithm
    behind LLM-arena Elo-style rankings, run on deterministic
    position-matched "battles": rank-r document of source A vs rank-r
    document of source B, longer text wins (doc_id breaks ties; the
    honest-stub convention for a judge verdict).

    Iteration (5 steps): p_i <- W_i / Σ_j n_ij/(p_i+p_j), renormalized
    to mean 1 and rounded to 12 dp half-away each step. The pairwise
    win matrix is BOUNDED (|sources|² entries), so it is collected
    driver-side and iterated in plain Python — the l_embedding_pca
    sanction: per-step driver state is O(k), never data. The DuckDB
    oracle replays the identical unrolled iterations with ordered
    aggregates (sequential double fold == Python's sequential sum,
    rule 4) over MATERIALIZED CTEs (rule 7).

    Scale: battles come from a rank-keyed equi-join (per-rank fan-out
    ≤ C(|sources|,2), sources bounded); the win matrix aggregation is
    one partial+final agg; the fit is corpus-size-independent. At
    100 TB only the match join grows — linearly, on a keyed shuffle.
    """
    d = table(spark, sf_dir, "documents")
    r = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(W.partitionBy("source").orderBy("doc_id")).alias("rn"),
    )
    a = r.select(
        F.col("source").alias("sa"),
        F.col("doc_id").alias("da"),
        F.col("n_chars").alias("ca"),
        "rn",
    )
    b = r.select(
        F.col("source").alias("sb"),
        F.col("doc_id").alias("db"),
        F.col("n_chars").alias("cb"),
        "rn",
    )
    win_a = (F.col("ca") > F.col("cb")) | (
        (F.col("ca") == F.col("cb")) & (F.col("da") < F.col("db"))
    )
    m = (
        a.join(b, "rn")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.count("*").alias("games"),
            F.sum(win_a.cast("bigint")).alias("wins_a"),
        )
    )
    sym = m.select(
        F.col("sa").alias("i"), F.col("sb").alias("j"), "games",
        F.col("wins_a").alias("wins"),
    ).unionAll(
        m.select(
            F.col("sb").alias("i"), F.col("sa").alias("j"), "games",
            (F.col("games") - F.col("wins_a")).alias("wins"),
        )
    ).localCheckpoint()  # single match-join scan feeds collect + final agg

    rows = sym.collect()  # bounded: <= |sources|^2 rows, corpus-independent
    srcs = sorted({r_["i"] for r_ in rows})
    k = len(srcs)
    g = {(r_["i"], r_["j"]): r_["games"] for r_ in rows}
    wtot: dict[str, int] = {s: 0 for s in srcs}
    for r_ in rows:
        wtot[r_["i"]] += r_["wins"]
    p = {s: 1.0 for s in srcs}
    for _ in range(_BT_ITERS):
        praw = {}
        for i in srcs:
            denom = 0.0
            for j in srcs:  # sorted == oracle's ORDER BY pr.j fold
                if j != i and (i, j) in g:
                    denom += g[(i, j)] / (p[i] + p[j])
            praw[i] = wtot[i] / denom
        s_tot = 0.0
        for i in srcs:  # sorted == oracle's SUM(praw ORDER BY i)
            s_tot += praw[i]
        p = {i: _round12(praw[i] * k / s_tot) for i in srcs}

    bt = F.broadcast(
        spark.createDataFrame(
            [(s, p[s]) for s in srcs], "i string, p double"
        )
    )
    per_src = sym.groupBy("i").agg(
        F.sum("games").alias("games"), F.sum("wins").alias("wins")
    )
    return (
        per_src.join(bt, "i")
        .select(
            F.col("i").alias("source"),
            "games",
            "wins",
            dround(F.col("p"), 6).alias("bt_score"),
            F.row_number()
            .over(W.orderBy(F.col("p").desc(), "i"))
            .cast("int")
            .alias("rank"),
        )
    )


@query(
    "l_conformal_interval",
    oracle="""
    WITH f AS (
        SELECT doc_id, len(string_split(text, ' ')) AS x,
               n_chars AS y, doc_id % 4 AS fold
        FROM documents
    ), tr AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM f WHERE fold IN (0, 1)
    ), ab AS MATERIALIZED (
        SELECT (n * sxy - sx * CAST(sy AS DOUBLE)) / (n * sxx - sx * CAST(sx AS DOUBLE)) AS b,
               (sy - (n * sxy - sx * CAST(sy AS DOUBLE)) / (n * sxx - sx * CAST(sx AS DOUBLE)) * sx)
                   / CAST(n AS DOUBLE) AS a
        FROM tr
    ), cal AS MATERIALIZED (
        SELECT ABS(f.y - ((SELECT a FROM ab) + (SELECT b FROM ab) * f.x)) AS r,
               f.doc_id
        FROM f WHERE fold = 2
    ), q AS MATERIALIZED (
        SELECT r AS q FROM (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, doc_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM cal
        ) WHERE rn = CAST(CEIL(CAST(0.9 AS DOUBLE) * (n + 1)) AS BIGINT)
    )
    SELECT f.doc_id, CAST(f.x AS BIGINT) AS n_tokens, f.y AS n_chars,
           ROUND(((SELECT a FROM ab) + (SELECT b FROM ab) * f.x) * 1e4) / 1e4
               + 0.0 AS pred,
           ROUND(((SELECT a FROM ab) + (SELECT b FROM ab) * f.x
                  - (SELECT q FROM q)) * 1e4) / 1e4 + 0.0 AS lo,
           ROUND(((SELECT a FROM ab) + (SELECT b FROM ab) * f.x
                  + (SELECT q FROM q)) * 1e4) / 1e4 + 0.0 AS hi,
           CAST(f.y >= (SELECT a FROM ab) + (SELECT b FROM ab) * f.x
                       - (SELECT q FROM q)
                AND f.y <= (SELECT a FROM ab) + (SELECT b FROM ab) * f.x
                       + (SELECT q FROM q) AS INT) AS covered
    FROM f WHERE fold = 3
    """,
)
def l_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction intervals — distribution-free
    uncertainty for a regression quality gate: fit y = a + b·x
    (chars from token count) on the train fold, take the
    ceil(0.9·(n+1))-th smallest absolute calibration residual as the
    interval half-width q (the finite-sample 90%-coverage guarantee),
    and emit [pred−q, pred+q] with a coverage flag per test doc.

    Determinism: slope/intercept come from EXACT integer sums
    (n, Σx, Σy, Σxy, Σx²) cast to double in the identical expression;
    q is an exact order statistic under a (residual, doc_id) total
    order (rule 5) — no quantile interpolation, so no float divergence.
    The three scalars (a, b, q) are bounded driver-side state.

    Scale: one pass for the training sums (partial+final agg), one
    TakeOrdered-style rank for q (the calibration fold sorts once),
    one map-only scoring pass over the test fold with a, b, q folded
    in as literals — no join, no shuffle in scoring at any corpus size.
    """
    d = table(spark, sf_dir, "documents")
    f = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("x"),
        F.col("n_chars").alias("y"),
        (F.col("doc_id") % 4).alias("fold"),
    )
    tr = (
        f.filter(F.col("fold").isin(0, 1))
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .collect()[0]  # bounded: 5 exact-integer scalars
    )
    n, sx, sy, sxy, sxx = tr["n"], tr["sx"], tr["sy"], tr["sxy"], tr["sxx"]
    b = (n * sxy - sx * float(sy)) / (n * sxx - sx * float(sx))
    a = (sy - b * sx) / float(n)
    cal = f.filter(F.col("fold") == 2).select(
        "doc_id", F.abs(F.col("y") - (F.lit(a) + F.lit(b) * F.col("x"))).alias("r")
    )
    n_cal = cal.count()
    k = int(math.ceil(0.9 * (n_cal + 1)))
    q = (
        cal.select(
            "r", F.row_number().over(W.orderBy("r", "doc_id")).alias("rn")
        )
        .filter(F.col("rn") == k)
        .collect()[0]["r"]  # bounded: 1 scalar (the order statistic)
    )
    pred = F.lit(a) + F.lit(b) * F.col("x")
    return f.filter(F.col("fold") == 3).select(
        "doc_id",
        F.col("x").cast("bigint").alias("n_tokens"),
        F.col("y").alias("n_chars"),
        dround(pred, 4).alias("pred"),
        dround(pred - F.lit(q), 4).alias("lo"),
        dround(pred + F.lit(q), 4).alias("hi"),
        (
            (F.col("y") >= pred - F.lit(q)) & (F.col("y") <= pred + F.lit(q))
        )
        .cast("int")
        .alias("covered"),
    )


@query(
    "l_ks_test",
    oracle="""
    WITH g AS (
        SELECT n_chars AS v,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM documents GROUP BY n_chars
    ), n AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM g
    ), e AS MATERIALIZED (
        SELECT v,
               ABS(SUM(c1) OVER (ORDER BY v) / CAST((SELECT n1 FROM n) AS DOUBLE)
                   - SUM(c2) OVER (ORDER BY v) / CAST((SELECT n2 FROM n) AS DOUBLE))
                   AS diff
        FROM g
    ), d AS (
        SELECT MAX(diff) AS d FROM e
    )
    SELECT (SELECT n1 FROM n) AS n1, (SELECT n2 FROM n) AS n2,
           ROUND((SELECT d FROM d) * 1e6) / 1e6 + 0.0 AS d_stat,
           (SELECT MIN(v) FROM e WHERE diff = (SELECT d FROM d)) AS d_at_value,
           ROUND(sqrt((SELECT n1 FROM n) * CAST((SELECT n2 FROM n) AS DOUBLE)
                      / ((SELECT n1 FROM n) + (SELECT n2 FROM n)))
                 * (SELECT d FROM d) * 1e6) / 1e6 + 0.0 AS ks_scaled
    """,
)
def l_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KOLMOGOROV-SMIRNOV drift test between the English and
    non-English document-length distributions: D = max |ECDF₁ − ECDF₂|,
    where it occurs, and the √(n₁n₂/(n₁+n₂))·D scaled statistic — the
    distribution-drift gate a data pipeline runs when a new snapshot's
    length/score profile must match the reference corpus before mixing.

    Determinism: per-value counts are exact integers; the cumulative
    window sums INTEGERS (immune to the rule-9 float-window-association
    trap), so each ECDF step is an exact-int/<exact-int> double that
    both engines compute identically; the argmax location uses
    MIN(value) at the max as the rule-5 total order.

    Scale: n_chars is a BOUNDED VALUE DOMAIN (≤ a few thousand distinct
    lengths regardless of corpus size), so the ordered ECDF window runs
    over the domain-sized grouped frame, not the data — the standard
    trick that makes exact KS feasible at 100 TB (group first, window
    over the bounded domain).
    """
    d = table(spark, sf_dir, "documents")
    g = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum((F.col("lang") == "en").cast("bigint")).alias("c1"),
        F.sum((F.col("lang") != "en").cast("bigint")).alias("c2"),
    )
    n1, n2 = g.agg(F.sum("c1"), F.sum("c2")).collect()[0]  # bounded: 2 scalars
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    e = g.select(
        "v",
        F.abs(
            F.sum("c1").over(wcum) / F.lit(float(n1))
            - F.sum("c2").over(wcum) / F.lit(float(n2))
        ).alias("diff"),
    ).localCheckpoint()  # domain-sized; feeds max + argmax passes once
    dmax = e.agg(F.max("diff")).collect()[0][0]  # bounded: 1 scalar
    return e.filter(F.col("diff") == dmax).agg(
        F.lit(n1).cast("bigint").alias("n1"),
        F.lit(n2).cast("bigint").alias("n2"),
        dround(F.lit(dmax), 6).alias("d_stat"),
        F.min("v").alias("d_at_value"),
        dround(
            F.lit(math.sqrt(n1 * float(n2) / (n1 + n2)) * dmax), 6
        ).alias("ks_scaled"),
    )


@query(
    "m_ab_cuped",
    oracle="""
    WITH u AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15'
                        THEN CAST(FLOOR(value * 1e2 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                        THEN CAST(FLOOR(value * 1e2 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM u
    ), th AS MATERIALIZED (
        SELECT (n * sxy - sx * CAST(sy AS DOUBLE))
                   / (n * sxx - sx * CAST(sx AS DOUBLE)) AS theta,
               sx / CAST(n AS DOUBLE) AS xbar
        FROM s
    ), adj AS (
        SELECT variant, y,
               CAST(FLOOR(y - (SELECT theta FROM th)
                          * (x - (SELECT xbar FROM th)) + 0.5) AS BIGINT) AS ya
        FROM u
    )
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(SUM(y) / CAST(COUNT(*) AS DOUBLE) / 1e2 * 1e4) / 1e4 + 0.0
               AS mean_post,
           ROUND(SUM(ya) / CAST(COUNT(*) AS DOUBLE) / 1e2 * 1e4) / 1e4 + 0.0
               AS mean_adj,
           ROUND((1.0 - (COUNT(*) * CAST(SUM(ya * ya) AS DOUBLE)
                         - SUM(ya) * CAST(SUM(ya) AS DOUBLE))
                       / (COUNT(*) * CAST(SUM(y * y) AS DOUBLE)
                          - SUM(y) * CAST(SUM(y) AS DOUBLE)))
                 * 100 * 1e4) / 1e4 + 0.0 AS var_reduction_pct
    FROM adj GROUP BY variant
    """,
)
def m_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for an A/B readout: per-user pre-period
    spend is the covariate, θ = cov(pre,post)/var(pre) is fit on the
    pooled population, and the adjusted metric y − θ·(x − x̄) shrinks
    per-variant variance without moving the mean — the standard
    experimentation-platform technique for cutting required sample
    size.

    Determinism (rule 11e end to end): event values are half-up
    quantized to cents at the ROW level, so per-user pre/post totals
    are exact BIGINTs; θ and x̄ derive from five exact integer
    aggregates cast to double in the identical expression; per-user
    adjusted values are re-quantized to integer cents BEFORE the
    per-variant sums, making every cross-row sum order-immune in both
    engines; means and variances are then identical double expressions
    over exact integers.

    Scale: one user-keyed partial+final agg builds the covariate table
    (conditional sums, single events scan); θ is one bounded reduce;
    the adjusted readout is a second thin agg over |users| rows keyed
    by variant. No window, no join — the CUPED shape that holds at any
    user count.
    """
    ev = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    vfp = F.floor(F.col("value") * 1e2 + 0.5).cast("bigint")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, vfp).otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, vfp).otherwise(F.lit(0))).alias("y"),
    ).withColumn("variant", F.col("user_id") % 2).localCheckpoint()
    s = u.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).collect()[0]  # bounded: 5 exact-integer scalars
    theta = (s["n"] * s["sxy"] - s["sx"] * float(s["sy"])) / (
        s["n"] * s["sxx"] - s["sx"] * float(s["sx"])
    )
    xbar = s["sx"] / float(s["n"])
    ya = F.floor(
        F.col("y") - F.lit(theta) * (F.col("x") - F.lit(xbar)) + 0.5
    ).cast("bigint")
    adj = u.select("variant", "y", ya.alias("ya"))
    cnt = F.count("*")
    var_post = cnt * F.sum(F.col("y") * F.col("y")).cast("double") - F.sum(
        "y"
    ) * F.sum("y").cast("double")
    var_adj = cnt * F.sum(F.col("ya") * F.col("ya")).cast("double") - F.sum(
        "ya"
    ) * F.sum("ya").cast("double")
    return adj.groupBy("variant").agg(
        cnt.alias("n_users"),
        dround(F.sum("y") / cnt.cast("double") / 1e2, 4).alias("mean_post"),
        dround(F.sum("ya") / cnt.cast("double") / 1e2, 4).alias("mean_adj"),
        dround((F.lit(1.0) - var_adj / var_post) * 100, 4).alias(
            "var_reduction_pct"
        ),
    )


@query(
    "l_eval_rouge",
    oracle="""
    WITH d AS (
        SELECT CAST(doc_id // 2 AS BIGINT) AS pair_id, doc_id % 2 AS side,
               string_split(text, ' ') AS a
        FROM documents
    ), u1 AS (
        SELECT pair_id, side, unnest(a) AS g FROM d
    ), pg1 AS (
        SELECT pair_id, g,
               CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM u1 GROUP BY pair_id, g
    ), a1 AS (
        SELECT pair_id,
               CAST(SUM(c0) AS BIGINT) AS lc,
               CAST(SUM(c1) AS BIGINT) AS lr,
               CAST(SUM(LEAST(c0, c1)) AS BIGINT) AS ov1
        FROM pg1 GROUP BY pair_id
    ), u2 AS (
        SELECT pair_id, side,
               unnest(list_transform(generate_series(1, len(a) - 1),
                      i -> a[i] || ' ' || a[i + 1])) AS g
        FROM d
    ), pg2 AS (
        SELECT pair_id, g,
               CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM u2 GROUP BY pair_id, g
    ), a2 AS (
        SELECT pair_id,
               CAST(SUM(c0) AS BIGINT) AS l2c,
               CAST(SUM(c1) AS BIGINT) AS l2r,
               CAST(SUM(LEAST(c0, c1)) AS BIGINT) AS ov2
        FROM pg2 GROUP BY pair_id
    )
    SELECT a1.pair_id, lc, lr, ov1,
           CAST(2 * ov1 AS DOUBLE) / CAST(lc + lr AS DOUBLE) AS rouge1_f,
           COALESCE(l2c, 0) AS l2c, COALESCE(l2r, 0) AS l2r,
           COALESCE(ov2, 0) AS ov2,
           CASE WHEN COALESCE(l2c, 0) + COALESCE(l2r, 0) = 0 THEN 0.0
                ELSE CAST(2 * COALESCE(ov2, 0) AS DOUBLE)
                     / CAST(l2c + l2r AS DOUBLE)
           END AS rouge2_f
    FROM a1 LEFT JOIN a2 ON a2.pair_id = a1.pair_id
    """,
)
def l_eval_rouge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/ROUGE-2 F1 between candidate/reference document pairs
    (doc 2k is the candidate, doc 2k+1 the reference) — the n-gram
    overlap metric every summarization / generation eval harness
    computes (Lin 2004, "ROUGE: A Package for Automatic Evaluation of
    Summaries" — public method): clipped n-gram overlap sum(min(tf_cand, tf_ref)) per
    gram, F1 = 2*overlap / (len_cand + len_ref).

    Determinism: all counts are exact integers; each F1 is ONE
    int/int division evaluated identically in both engines (no float
    accumulation, the m_funnel_windowed frac pattern). The rouge2
    denominator is CASE-guarded against single-token sides in both
    engines.

    Scale: tokenization + bigram build are map-side array transforms;
    the clipped overlap is a (pair_id, gram)-keyed partial-agg groupBy
    computing BOTH sides' tf in one pass (no self-join), then a thin
    pair-keyed rollup — shuffle volume linear in token count, never
    pairwise in the corpus. Bigrams guard size>=2 per CLAUDE.md rule
    11d (Spark sequence() descends on empty ranges). The token-array
    frame is localCheckpointed (rule 11a) so split(text) executes ONCE
    for both gram pipelines — re-tested in round 10 on an idle host
    after the r9 shootout had scored it neutral-with-a-pathology:
    paired interleaved at x100 the checkpoint form won all 3 reps
    (medians 112.0 -> 68.9 s, identical 250k rows; r9 verdict item 8).
    """
    # scatter BEFORE the checkpoint (r12): the checkpoint inherits the
    # scan's partitioning, so a single-split fixture file serialized
    # both gram pipelines on one core (see session.scatter).
    d = scatter(spark, table(spark, sf_dir, "documents"))
    base = d.select(
        F.expr("CAST(doc_id DIV 2 AS BIGINT)").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.split(F.col("text"), " ").alias("toks"),
    ).localCheckpoint()

    def per_pair(grams: DataFrame, ln_c: str, ln_r: str, ov: str) -> DataFrame:
        pg = grams.groupBy("pair_id", "g").agg(
            F.coalesce(
                F.sum(F.when(F.col("side") == 0, F.lit(1))), F.lit(0)
            ).alias("c0"),
            F.coalesce(
                F.sum(F.when(F.col("side") == 1, F.lit(1))), F.lit(0)
            ).alias("c1"),
        )
        return pg.groupBy("pair_id").agg(
            F.sum("c0").alias(ln_c),
            F.sum("c1").alias(ln_r),
            F.sum(F.least("c0", "c1")).alias(ov),
        )

    uni = base.select("pair_id", "side", F.explode("toks").alias("g"))
    big = base.select(
        "pair_id",
        "side",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat(toks[i], ' ', toks[i + 1]))"
                ),
            ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
        ).alias("g"),
    )
    a1 = per_pair(uni, "lc", "lr", "ov1")
    a2 = per_pair(big, "l2c", "l2r", "ov2")
    l2c = F.coalesce(F.col("l2c"), F.lit(0))
    l2r = F.coalesce(F.col("l2r"), F.lit(0))
    ov2 = F.coalesce(F.col("ov2"), F.lit(0))
    return a1.join(a2, "pair_id", "left").select(
        "pair_id",
        "lc",
        "lr",
        "ov1",
        (
            (2 * F.col("ov1")).cast("double")
            / (F.col("lc") + F.col("lr")).cast("double")
        ).alias("rouge1_f"),
        l2c.alias("l2c"),
        l2r.alias("l2r"),
        ov2.alias("ov2"),
        F.when((l2c + l2r) == 0, F.lit(0.0))
        .otherwise((2 * ov2).cast("double") / (l2c + l2r).cast("double"))
        .alias("rouge2_f"),
    )


@query(
    "l_eval_bleu",
    oracle="""
    WITH d AS (
        SELECT CAST(doc_id // 2 AS BIGINT) AS pair_id, doc_id % 2 AS side,
               string_split(text, ' ') AS a
        FROM documents
    ), u1 AS (
        SELECT pair_id, side, unnest(a) AS g FROM d
    ), pg1 AS (
        SELECT pair_id, g,
               CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM u1 GROUP BY pair_id, g
    ), a1 AS (
        SELECT pair_id,
               CAST(SUM(c0) AS BIGINT) AS lc,
               CAST(SUM(c1) AS BIGINT) AS lr,
               CAST(SUM(LEAST(c0, c1)) AS BIGINT) AS m1
        FROM pg1 GROUP BY pair_id
    ), u2 AS (
        SELECT pair_id, side,
               unnest(list_transform(generate_series(1, len(a) - 1),
                      i -> a[i] || ' ' || a[i + 1])) AS g
        FROM d
    ), pg2 AS (
        SELECT pair_id, g,
               CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM u2 GROUP BY pair_id, g
    ), a2 AS (
        SELECT pair_id,
               CAST(SUM(c0) AS BIGINT) AS l2c,
               CAST(SUM(LEAST(c0, c1)) AS BIGINT) AS m2
        FROM pg2 GROUP BY pair_id
    ), j AS (
        SELECT a1.pair_id, lc, lr, m1,
               COALESCE(l2c, 0) AS l2c, COALESCE(m2, 0) AS m2
        FROM a1 LEFT JOIN a2 ON a2.pair_id = a1.pair_id
    ), p AS (
        SELECT pair_id, lc, lr, m1, l2c, m2,
               CAST(m1 AS DOUBLE) / CAST(lc AS DOUBLE) AS p1,
               CASE WHEN l2c = 0 THEN 0e0
                    ELSE CAST(m2 AS DOUBLE) / CAST(l2c AS DOUBLE) END AS p2,
               CASE WHEN lc >= lr THEN 1e0
                    ELSE ROUND(exp(1e0 - CAST(lr AS DOUBLE)
                                         / CAST(lc AS DOUBLE)) * 1e6) / 1e6
               END AS bp
        FROM j
    )
    SELECT pair_id, lc, lr, m1, l2c, m2,
           ROUND(p1 * 1e6) / 1e6 + 0 AS p1,
           ROUND(p2 * 1e6) / 1e6 + 0 AS p2,
           bp + 0 AS bp,
           ROUND(bp * sqrt(p1 * p2) * 1e6) / 1e6 + 0 AS bleu2
    FROM p
    """,
)
def l_eval_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence BLEU-2 between candidate/reference document pairs
    (doc 2k candidate, doc 2k+1 reference — the l_eval_rouge pairing):
    clipped n-gram PRECISION p_n = sum_g min(tf_cand, tf_ref) /
    |cand n-grams| for n=1,2, brevity penalty BP = min(1,
    exp(1 - len_ref/len_cand)), BLEU-2 = BP * sqrt(p1*p2)
    (Papineni et al. 2002, "BLEU: a Method for Automatic Evaluation of
    Machine Translation" — public method). The precision-oriented
    complement of ROUGE's recall-oriented F1: a generation eval
    harness reports both.

    Determinism: all counts are exact integers; p1/p2 are single
    int/int divisions (IEEE-exact both engines); BP's exp() follows the
    l_ml_score_linear sigmoid sanction (per-row transcendental, then
    ROUND*1e6 grid); bleu2 multiplies two quantized factors through a
    correctly-rounded sqrt then re-quantizes. Every float output adds
    +0 against the rule-5b -0.0 trap. Zero-bigram candidates (single
    token) get p2 = 0 via the same CASE guard as rouge2.

    Scale: identical shape to l_eval_rouge — tokenize + bigram build
    are map-side array transforms, the clipped overlap is a
    (pair_id, gram)-keyed partial-agg groupBy computing both sides' tf
    in one pass (no self-join), then a thin pair-keyed rollup; shuffle
    volume linear in token count, never pairwise in the corpus. The
    token-array frame is localCheckpointed (rule 11a) so split(text)
    runs once for both gram pipelines. Bigrams guard size>=2 (rule
    11d)."""
    # scatter BEFORE the checkpoint (r12): the checkpoint inherits the
    # scan's partitioning, so a single-split fixture file serialized
    # both gram pipelines on one core (see session.scatter).
    d = scatter(spark, table(spark, sf_dir, "documents"))
    base = d.select(
        F.expr("CAST(doc_id DIV 2 AS BIGINT)").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
        F.split(F.col("text"), " ").alias("toks"),
    ).localCheckpoint()

    uni = base.select("pair_id", "side", F.explode("toks").alias("g"))
    big = base.select(
        "pair_id",
        "side",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat(toks[i], ' ', toks[i + 1]))"
                ),
            ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
        ).alias("g"),
    )

    def clipped(grams: DataFrame, cols: dict[str, str]) -> DataFrame:
        pg = grams.groupBy("pair_id", "g").agg(
            F.coalesce(
                F.sum(F.when(F.col("side") == 0, F.lit(1))), F.lit(0)
            ).alias("c0"),
            F.coalesce(
                F.sum(F.when(F.col("side") == 1, F.lit(1))), F.lit(0)
            ).alias("c1"),
        )
        aggs = []
        for name, expr in cols.items():
            aggs.append(F.sum(F.expr(expr)).alias(name))
        return pg.groupBy("pair_id").agg(*aggs)

    a1 = clipped(uni, {"lc": "c0", "lr": "c1", "m1": "least(c0, c1)"})
    a2 = clipped(big, {"l2c": "c0", "m2": "least(c0, c1)"})
    l2c = F.coalesce(F.col("l2c"), F.lit(0))
    m2 = F.coalesce(F.col("m2"), F.lit(0))
    p1 = F.col("m1").cast("double") / F.col("lc").cast("double")
    p2 = F.when(l2c == 0, F.lit(0.0)).otherwise(
        m2.cast("double") / l2c.cast("double")
    )
    bp = F.when(F.col("lc") >= F.col("lr"), F.lit(1.0)).otherwise(
        dround(
            F.exp(
                F.lit(1.0)
                - F.col("lr").cast("double") / F.col("lc").cast("double")
            ),
            6,
        )
    )
    return a1.join(a2, "pair_id", "left").select(
        "pair_id",
        "lc",
        "lr",
        "m1",
        l2c.alias("l2c"),
        m2.alias("m2"),
        dround(p1, 6).alias("p1"),
        dround(p2, 6).alias("p2"),
        (bp + F.lit(0.0)).alias("bp"),
        dround(bp * F.sqrt(p1 * p2), 6).alias("bleu2"),
    )


@query(
    "l_eval_pass_at_k",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value > 150 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM events GROUP BY user_id
    )
    SELECT user_id, n, c,
           ROUND((1e0
                  - (CAST(n - c AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(n - c - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE))
                    * (CAST(n - c - 2 AS DOUBLE) / CAST(n - 2 AS DOUBLE))
                    * (CAST(n - c - 3 AS DOUBLE) / CAST(n - 3 AS DOUBLE))
                    * (CAST(n - c - 4 AS DOUBLE) / CAST(n - 4 AS DOUBLE)))
                 * 1e12) / 1e12 AS pass_at_5
    FROM u WHERE n >= 5
    """,
)
def l_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PASS@K — the unbiased estimator for "at least one of k sampled
    attempts passes" from n attempts with c passes (Chen et al. 2021,
    "Evaluating Large Language Models Trained on Code", eq. 1; public
    method): pass@k = 1 - C(n-c, k)/C(n, k), evaluated in the
    numerically-stable product form 1 - prod_{i=0..k-1} (n-c-i)/(n-i)
    with k=5. Each user's event stream stands in for a problem's
    attempt set; an attempt passes when value > 150. When fewer than k
    attempts fail (n-c < k) some numerator factor is exactly 0, so the
    product collapses and pass@k = 1 — the estimator's own boundary
    case, no special-casing.

    Determinism: n and c are exact integers; the estimator is FIVE
    int-ratio divisions chained by left-associative multiplication —
    every step a single correctly-rounded IEEE op evaluated in the
    same order by both engines (the l_ml_cv_folds slope precedent) —
    then one 1e-12 quantization. Values in [0, 1]: no -0.0 exposure.
    The n >= 5 filter guards the (n-i) denominators in both engines.

    Scale: one user-keyed partial-agg groupBy over the fact table plus
    a map-side closed-form projection — no window, no join, no
    iteration; |users| output rows."""
    ev = table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.when(F.col("value") > 150, 1)), F.lit(0)
            ).alias("c"),
        )
        .filter(F.col("n") >= 5)
    )
    prod = None
    for i in range(5):
        term = (F.col("n") - F.col("c") - F.lit(i)).cast("double") / (
            F.col("n") - F.lit(i)
        ).cast("double")
        prod = term if prod is None else prod * term
    return u.select(
        "user_id",
        "n",
        "c",
        dround(F.lit(1.0) - prod, 12).alias("pass_at_5"),
    )


# 1/log2(i+1) DCG rank weights on the 1e-12 fixed-point grid, i = 1..10,
# plus their cumulative sums (the ideal-DCG ladder). Integer literals so
# per-query DCG is an EXACT BIGINT sum in both engines (rule 11e) — no
# float accumulation order anywhere; nDCG is one final int/int division.
_DCG_W = [1000000000000, 630929753571, 500000000000, 430676558073,
          386852807235, 356207187108, 333333333333, 315464876786,
          301029995664, 289064826318]
_DCG_CUM = [1000000000000, 1630929753571, 2130929753571, 2561606311644,
            2948459118879, 3304666305987, 3637999639320, 3953464516106,
            4254494511770, 4543559338088]


@query(
    "l_eval_ndcg",
    oracle=f"""
    WITH q AS MATERIALIZED (
        SELECT vec_id AS q_id, embedding AS qe, label AS qlabel
        FROM embeddings WHERE vec_id < 10
    ), scored AS MATERIALIZED (
        SELECT q.q_id, e.vec_id,
               CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel,
               (SELECT SUM(e.embedding[s.i]::DOUBLE * q.qe[s.i]::DOUBLE)
                FROM (SELECT unnest(generate_series(1, 64)) AS i) s) AS dot
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id
    ), nr AS (
        SELECT q_id, CAST(SUM(rel) AS BIGINT) AS n_rel FROM scored
        GROUP BY q_id
    ), topk AS (
        SELECT q_id, rel, rn
        FROM (SELECT q_id, rel,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY dot DESC, vec_id) AS rn
              FROM scored)
        WHERE rn <= 10
    ), dcg AS (
        SELECT q_id,
               CAST(SUM(rel * ({_DCG_W}::BIGINT[])[rn]) AS BIGINT)
                   AS dcg_fp
        FROM topk GROUP BY q_id
    )
    SELECT nr.q_id, nr.n_rel, dcg.dcg_fp,
           CAST(dcg.dcg_fp AS DOUBLE) / 1e12 AS dcg_at_10,
           CASE WHEN nr.n_rel = 0 THEN 0e0
                ELSE CAST(dcg.dcg_fp AS DOUBLE)
                     / CAST(({_DCG_CUM}::BIGINT[])[
                           CAST(LEAST(10, nr.n_rel) AS INT)] AS DOUBLE)
           END AS ndcg_at_10
    FROM nr JOIN dcg ON dcg.q_id = nr.q_id
    """,
)
def l_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of label-relevance retrieval (Järvelin & Kekäläinen
    2002, the graded-ranking IR metric; public method): for each of
    the 10 query vectors, candidates rank by exact cosine-order dot
    product (vdot, bit-identical cross-engine), a candidate is
    relevant when its class label matches the query's, DCG@10 sums
    the rank-discounted relevance 1/log2(rank+1), and nDCG divides by
    the ideal DCG for the query's total relevant count — the
    search-quality readout that, unlike l_ann_recall_eval's recall,
    rewards putting the relevant results FIRST.

    Determinism: the discount weights are INTEGER literals on the
    1e-12 grid (module constants _DCG_W/_DCG_CUM), so per-query DCG is
    an exact BIGINT sum — immune to accumulation order in both engines
    (rule 11e); nDCG is one int/int division. Rank boundaries share
    the (dot DESC, vec_id) unique total order with every sibling
    vector op.

    Scale: one broadcast of the 10-query batch over a single corpus
    scan; the per-query rank window sits under the WindowGroupLimit
    threshold (rank-only Window node, rule 13a) so map tasks emit just
    their local top-10 per query; n_rel is a q_id-keyed partial agg on
    the same scored stream. |queries| x corpus work, never corpus²."""
    v = table(spark, sf_dir, "embeddings")
    qb = v.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    from sqlengine_spark.functions import vdot

    scored = (
        v.crossJoin(F.broadcast(qb))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.when(F.col("label") == F.col("qlabel"), 1)
            .otherwise(0)
            .alias("rel"),
            vdot(F.col("embedding"), F.col("qe")).alias("dot"),
        )
        .localCheckpoint()
    )
    nr = scored.groupBy("q_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel")
    )
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(), "vec_id")
    w_arr = F.array(*[F.lit(x) for x in _DCG_W])
    cum_arr = F.array(*[F.lit(x) for x in _DCG_CUM])
    dcg = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "q_id",
            (F.col("rel") * F.element_at(w_arr, F.col("rn"))).alias("t"),
        )
        .groupBy("q_id")
        .agg(F.sum("t").cast("bigint").alias("dcg_fp"))
    )
    return nr.join(dcg, "q_id").select(
        "q_id",
        "n_rel",
        "dcg_fp",
        (F.col("dcg_fp").cast("double") / 1e12).alias("dcg_at_10"),
        F.when(F.col("n_rel") == 0, F.lit(0.0))
        .otherwise(
            F.col("dcg_fp").cast("double")
            / F.element_at(
                cum_arr, F.least(F.lit(10), F.col("n_rel")).cast("int")
            ).cast("double")
        )
        .alias("ndcg_at_10"),
    )


@query(
    "m_ab_power_mde",
    oracle="""
    WITH a AS (
        SELECT user_id % 2 AS arm,
               CAST(trunc(value * 100) AS BIGINT) AS vc
        FROM events
    ), g AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(vc) AS BIGINT) AS s,
               CAST(SUM(vc * vc) AS BIGINT) AS ss
        FROM a GROUP BY arm
    ), p AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 0 THEN s END) AS s0,
               MAX(CASE WHEN arm = 1 THEN s END) AS s1,
               MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
               MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        FROM g
    ), v AS (
        SELECT n0, n1,
               CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean0,
               (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
                - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
                   / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS var0,
               (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS var1
        FROM p
    )
    SELECT n0 AS n_control, n1 AS n_treat,
           ROUND(mean0 * 1e6) / 1e6 AS mean_control_cents,
           ROUND((2.8015989838225857e0
                  * sqrt(var0 / CAST(n0 AS DOUBLE)
                         + var1 / CAST(n1 AS DOUBLE))) * 1e6) / 1e6
               AS mde_abs_cents,
           ROUND((2.8015989838225857e0
                  * sqrt(var0 / CAST(n0 AS DOUBLE)
                         + var1 / CAST(n1 AS DOUBLE)))
                 / mean0 * 1e9) / 1e9 AS mde_rel
    FROM v
    """,
)
def m_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINIMUM DETECTABLE EFFECT for an A/B test at 80% power /
    two-sided alpha=0.05 (the standard experiment-sizing readout;
    public method): MDE = (z_{1-a/2} + z_{power}) * SE(delta) with the
    two z constants folded into the single literal
    2.8015989838225857 = 1.959963984540054 + 0.8416212335729143
    (identical decimal literal in both engines → identical double —
    the l_eval_ndcg literal-constant discipline; no inverse-CDF
    evaluation at query time). Arms split by user_id parity; SE uses
    each arm's own population variance over exact cent integers.

    Determinism: counts/sums/sum-of-squares are exact BIGINTs cast to
    double BEFORE multiplying (each moment is exactly representable;
    the products round correctly and identically in both engines, and
    BIGINT products would overflow at x100 arm sizes — see the inline
    note); the SE is one expression + one correctly-rounded sqrt;
    outputs quantize once. All outputs positive (no -0.0 exposure).

    Scale: one arm-keyed partial-agg groupBy (2 groups) + a 2-row
    pivot — the cheapest possible shape; the fact scan is the whole
    cost at any size."""
    ev = table(spark, sf_dir, "events")
    a = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        (F.col("value") * 100).cast("bigint").alias("vc"),
    )
    g = a.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("ss"),
    )
    p = g.agg(
        *[
            F.max(F.when(F.col("arm") == arm, F.col(c))).alias(f"{c}{arm}")
            for arm in (0, 1)
            for c in ("n", "s", "ss")
        ]
    )
    # moments multiply in DOUBLE: the arms are corpus-halves, so the
    # BIGINT product n*ss overflows at the repo's own x100 stress scale
    # (n ~ 5e6 x ss ~ 5e14 > 2^63); each cast double is exact and the
    # products are correctly rounded identically in both engines (the
    # l_eval_spearman moments pattern)
    mean0 = F.col("s0").cast("double") / F.col("n0").cast("double")

    def _varp(n, s, ss):
        nd = F.col(n).cast("double")
        sd2 = F.col(s).cast("double")
        ssd = F.col(ss).cast("double")
        return (nd * ssd - sd2 * sd2) / (nd * nd)

    var0 = _varp("n0", "s0", "ss0")
    var1 = _varp("n1", "s1", "ss1")
    z = F.lit(2.8015989838225857)
    se = F.sqrt(
        var0 / F.col("n0").cast("double") + var1 / F.col("n1").cast("double")
    )
    return p.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treat"),
        dround(mean0, 6).alias("mean_control_cents"),
        dround(z * se, 6).alias("mde_abs_cents"),
        dround(z * se / mean0, 9).alias("mde_rel"),
    )


@query(
    "l_eval_brier",
    oracle="""
    WITH s AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               CAST(FLOOR(CAST((n_chars - 40) * (n_chars - 40) AS DOUBLE)
                          / CAST((n_chars - 40) * (n_chars - 40) + 40000
                                 AS DOUBLE) * 1e6) AS BIGINT) AS pq
        FROM documents
    ), b AS (
        SELECT LEAST(pq // 100000, 9) AS bin, pos, pq,
               (pq - pos * 1000000) * (pq - pos * 1000000) AS sqerr
        FROM s
    ), k AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(pos) AS BIGINT) AS p_k,
               CAST(SUM(pq) AS BIGINT) AS q_k,
               CAST(SUM(sqerr) AS BIGINT) AS se_k
        FROM b GROUP BY bin
    ), g AS (
        SELECT CAST(SUM(n_k) AS BIGINT) AS n,
               CAST(SUM(p_k) AS BIGINT) AS p,
               CAST(SUM(se_k) AS BIGINT) AS se,
               CAST(SUM(CAST(trunc(
                   CAST(n_k AS DOUBLE)
                   * (CAST(q_k AS DOUBLE) / CAST(n_k AS DOUBLE) / 1e6
                      - CAST(p_k AS DOUBLE) / CAST(n_k AS DOUBLE))
                   * (CAST(q_k AS DOUBLE) / CAST(n_k AS DOUBLE) / 1e6
                      - CAST(p_k AS DOUBLE) / CAST(n_k AS DOUBLE))
                   * 1e9) AS BIGINT)) AS BIGINT) AS rel_fp
        FROM k
    ), g2 AS (
        SELECT g.n, g.p, g.se, g.rel_fp,
               CAST((SELECT SUM(CAST(trunc(
                   CAST(n_k AS DOUBLE)
                   * (CAST(p_k AS DOUBLE) / CAST(n_k AS DOUBLE)
                      - CAST(g.p AS DOUBLE) / CAST(g.n AS DOUBLE))
                   * (CAST(p_k AS DOUBLE) / CAST(n_k AS DOUBLE)
                      - CAST(g.p AS DOUBLE) / CAST(g.n AS DOUBLE))
                   * 1e9) AS BIGINT)) FROM k) AS BIGINT) AS res_fp
        FROM g
    )
    SELECT n, ROUND(CAST(p AS DOUBLE) / CAST(n AS DOUBLE) * 1e9) / 1e9
               AS base_rate,
           ROUND(CAST(se AS DOUBLE) / CAST(n AS DOUBLE) / 1e12 * 1e9) / 1e9
               AS brier,
           ROUND(CAST(rel_fp AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) * 1e9)
               / 1e9 AS reliability,
           ROUND(CAST(res_fp AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) * 1e9)
               / 1e9 AS resolution,
           ROUND((CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
                 * (1e0 - CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9)
               / 1e9 AS uncertainty
    FROM g2
    """,
)
def l_eval_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIER SCORE with the MURPHY DECOMPOSITION (Brier 1950; Murphy
    1973 — the proper-scoring-rule audit for any probabilistic gate):
    over the same frozen rational-squash scorer and en-label as
    l_calibration_curve, emit the mean squared error of the predicted
    probabilities (brier), and its decile-binned decomposition into
    RELIABILITY (calibration error, lower better), RESOLUTION
    (discrimination, higher better), and UNCERTAINTY (base-rate
    entropy) — brier ≈ reliability - resolution + uncertainty up to
    the within-bin forecast variance.

    Determinism: probabilities quantize to the 1e-6 grid at the ROW
    level, so the Brier numerator is an exact BIGINT sum of squared
    integer residuals (order-immune, rule 11e; (1e6)^2 * N stays far
    under 2^63 through x100 — at ledger scales swap the grid to 1e4 or
    sum per-bin). The per-BIN reliability/resolution terms quantize to
    1e-9 fixed-point before the 10-term sum. Every division is a
    single int-ratio op.

    Scale: map-side scoring + one 10-group partial-agg rollup + a
    1-row fold — the l_calibration_curve plan with two more exact
    integer columns."""
    d = table(spark, sf_dir, "documents")
    z2 = (F.col("n_chars") - 40) * (F.col("n_chars") - 40)
    p = z2.cast("double") / (z2 + 40000).cast("double")
    pq = F.floor(p * 1e6).cast("bigint")
    b = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        pq.alias("pq"),
    ).select(
        F.least(F.expr("pq div 100000"), F.lit(9).cast("bigint")).alias(
            "bin"
        ),
        "pos",
        "pq",
        (
            (F.col("pq") - F.col("pos") * 1000000)
            * (F.col("pq") - F.col("pos") * 1000000)
        ).alias("sqerr"),
    )
    k = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("pos").alias("p_k"),
        F.sum("pq").alias("q_k"),
        F.sum("sqerr").alias("se_k"),
    )
    conf = F.col("q_k").cast("double") / F.col("n_k").cast("double") / 1e6
    acc = F.col("p_k").cast("double") / F.col("n_k").cast("double")
    base = F.col("p").cast("double") / F.col("n").cast("double")
    g = k.agg(
        F.sum("n_k").alias("n"),
        F.sum("p_k").alias("p"),
        F.sum("se_k").alias("se"),
        F.sum(
            (
                F.col("n_k").cast("double") * (conf - acc) * (conf - acc)
                * 1e9
            ).cast("bigint")
        ).alias("rel_fp"),
        F.collect_list(F.struct("bin", "n_k", "p_k")).alias("bins"),
    )
    # resolution needs the GLOBAL base rate, so fold it over the
    # bounded 10-element bin list carried through the same 1-row agg
    res_fp = F.expr(
        "aggregate(bins, 0L, (acc2, e) -> acc2 + CAST("
        " CAST(e.n_k AS DOUBLE)"
        " * (CAST(e.p_k AS DOUBLE) / CAST(e.n_k AS DOUBLE)"
        "    - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST(e.p_k AS DOUBLE) / CAST(e.n_k AS DOUBLE)"
        "    - CAST(p AS DOUBLE) / CAST(n AS DOUBLE))"
        " * 1e9 AS BIGINT))"
    )
    return g.select(
        "n",
        dround(base, 9).alias("base_rate"),
        dround(
            F.col("se").cast("double") / F.col("n").cast("double") / 1e12, 9
        ).alias("brier"),
        dround(
            F.col("rel_fp").cast("double") / 1e9 / F.col("n").cast("double"),
            9,
        ).alias("reliability"),
        dround(
            res_fp.cast("double") / 1e9 / F.col("n").cast("double"), 9
        ).alias("resolution"),
        dround(base * (F.lit(1.0) - base), 9).alias("uncertainty"),
    )


@query(
    "l_eval_spearman",
    oracle="""
    WITH f AS (
        SELECT doc_id, n_chars AS a,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS b
        FROM documents
    ), ra AS (
        SELECT a, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY a
    ), ra2 AS (
        SELECT a, 2 * (SUM(c) OVER (ORDER BY a) - c) + c + 1 AS r2
        FROM ra
    ), rb AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY b
    ), rb2 AS (
        SELECT b, 2 * (SUM(c) OVER (ORDER BY b) - c) + c + 1 AS r2
        FROM rb
    ), j AS (
        SELECT CAST(ra2.r2 AS BIGINT) AS x, CAST(rb2.r2 AS BIGINT) AS y
        FROM f JOIN ra2 ON ra2.a = f.a JOIN rb2 ON rb2.b = f.b
    ), m AS (
        -- HUGEINT moments mirror the Spark side's DECIMAL(38,0) sums:
        -- exact at any corpus size (BIGINT sxx wraps near N~1.5M)
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM j
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1e9) / 1e9 + 0 AS spearman_rho
    FROM m
    """,
)
def l_eval_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN RANK CORRELATION between two per-document quality
    signals (document length in chars vs vocabulary size in distinct
    tokens) with the exact tie-corrected treatment: rho = Pearson over
    AVERAGE ranks (Spearman 1904; public method) — the agreement audit
    a curation pipeline runs before replacing an expensive signal with
    a cheap proxy.

    Determinism: average ranks live on the half-integer grid, so the
    DOUBLED rank 2r = 2*(cum_before) + count + 1 is an exact BIGINT per
    distinct VALUE; all five moments are exact integer sums (doubling
    cancels in the correlation), carried in DECIMAL(38,0) Spark-side /
    HUGEINT oracle-side so they stay exact to ~1e12 rows (r10 ADVICE:
    BIGINT sxx wraps near N~1.5M — and a double sum would re-open
    rule-9 sum-order divergence). The final rho is one expression over
    the exact moments cast to double with a correctly-rounded sqrt,
    quantized once with the rule-5b '+ 0'.

    Scale (the deliberate non-global-rank design): ranks attach per
    distinct VALUE, not per row — the rank ladder is a cumulative sum
    over the VALUE-DOMAIN-grouped table (n_chars domain ~500 values,
    vocab-size domain likewise — the m_survival_km value-domain-bounded
    window class), then broadcast-joined back onto the corpus; a
    row-level rank window would sort the whole corpus on one reducer.
    Moments are one partial-agg fold to a single row."""
    d = table(spark, sf_dir, "documents")
    f = d.select(
        "doc_id",
        F.col("n_chars").alias("a"),
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint").alias(
            "b"
        ),
    ).localCheckpoint()  # rule 11a: the split+array_distinct tokenize
    # pass feeds BOTH rank ladders and the moments join — one scan

    def dranks(col: str):
        cnt = f.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = W.orderBy(col).rowsBetween(W.unboundedPreceding, W.currentRow)
        return cnt.select(
            col,
            (
                2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1
            ).alias("r2"),
        )
    j = (
        f.join(F.broadcast(dranks("a").withColumnRenamed("r2", "x")), "a")
        .join(F.broadcast(dranks("b").withColumnRenamed("r2", "y")), "b")
    )
    # r10 ADVICE: BIGINT moment sums overflow near N~1.5M docs (sxx
    # grows ~(2N)^3/3); Spark non-ANSI would wrap silently while DuckDB
    # promotes to HUGEINT, silently diverging the engines. Sum in
    # DECIMAL(38,0) instead — exact and ORDER-INDEPENDENT in both
    # engines (a double sum would re-open rule-9 sum-order hash risk),
    # good to ~1e12 rows; the oracle mirrors with explicit HUGEINT.
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        "n",
        dround(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            9,
        ).alias("spearman_rho"),
    )

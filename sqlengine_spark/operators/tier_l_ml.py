"""Tier L (extension) — in-engine ML / embedding / graph analytics the
LLM-data-pipeline mandate calls for beyond the dedup+ANN core: closed-form
model fitting, multi-objective data pruning, dimensionality reduction,
corpus classification, diversity-aware reranking, and connected
components. Every operator is expressed as distributed DataFrame algebra
(partial aggregates, keyed shuffles, broadcast dims) — no driver-side
data paths beyond provably-bounded scalars — and each carries a DuckDB
oracle stating the same ground truth through an independent formulation.

Float policy (CLAUDE.md rules 4/5b/6/11e): every cross-row float SUM is
quantized to fixed-point BIGINT before aggregation (order-immune in both
engines); post-aggregation arithmetic is written as the IDENTICAL double
expression on both sides so results are bit-equal before dround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqlengine_spark.functions import dround, vdot
from sqlengine_spark.registry import query
from sqlengine_spark.session import load_tables, table


@query(
    "l_ml_linreg_normal",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS s1,
               CAST(SUM(x2) AS BIGINT) AS s2,
               CAST(SUM(y)  AS BIGINT) AS sy,
               CAST(SUM(x1 * x1) AS BIGINT) AS s11,
               CAST(SUM(x2 * x2) AS BIGINT) AS s22,
               CAST(SUM(x1 * x2) AS BIGINT) AS s12,
               CAST(SUM(x1 * y)  AS BIGINT) AS s1y,
               CAST(SUM(x2 * y)  AS BIGINT) AS s2y,
               CAST(SUM(y * y)   AS BIGINT) AS syy
        FROM (
            SELECT CAST(trunc(l_quantity) AS BIGINT) AS x1,
                   CAST(trunc(l_discount * 100) AS BIGINT) AS x2,
                   CAST(trunc(l_extendedprice) AS BIGINT) AS y
            FROM lineitem
        )
    ), c AS (
        SELECT n,
               CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS c11,
               CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c22,
               CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c12,
               CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c1y,
               CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c2y,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
        FROM m
    ), b AS (
        SELECT n, cyy, c1y, c2y, m1, m2, my,
               (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
               (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
        FROM c
    )
    SELECT n,
           ROUND((my - b1 * m1 - b2 * m2) * 1e4, 0) / 1e4 + 0 AS beta0,
           ROUND(b1 * 1e6, 0) / 1e6 + 0 AS beta_qty,
           ROUND(b2 * 1e6, 0) / 1e6 + 0 AS beta_disc,
           ROUND((1.0 - (cyy - b1 * c1y - b2 * c2y) / cyy) * 1e6, 0) / 1e6 + 0 AS r2
    FROM b
    """,
)
def l_ml_linreg_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multivariate OLS (normal equations): fit
    ``l_extendedprice ~ l_quantity + l_discount`` in ONE distributed
    pass by accumulating the 2-feature moment matrix (n, Σx, Σxx', Σxy,
    Σyy) and solving the 2x2 system on the driver side of the plan —
    the textbook way to train linear models inside a SQL engine without
    an iterative optimizer (cf. MADlib / Spark MLlib's normal-equation
    solver path).

    Determinism: every moment is an exact BIGINT sum of truncated
    fixed-point features (quantity integral, discount in percent
    points, price in truncated whole DOLLARS — cents-squared sums
    overflow BIGINT at sf0.1: measured 2.2e19 > 2^63; at ~100x this
    scale the production fix is Welford-style centered accumulation or
    per-partition HUGEINT — CLAUDE.md rule 11e), so both engines
    solve from IDENTICAL integers; the centered moments, betas, and R²
    are then the same double expression evaluated on the same inputs,
    bit-equal before rounding. Betas straddle zero → +0 guards
    (rule 5b).

    Scale: one lineitem scan, nine BIGINT partial aggregates with
    map-side combine, a 1-row result — the ideal 100 TB shape (the
    moment matrix for p features is p², so even p=100 ships 10k
    scalars per partition). No shuffle of raw rows at all.
    """
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        WITH m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
                   SUM(x1 * x1) AS s11, SUM(x2 * x2) AS s22,
                   SUM(x1 * x2) AS s12, SUM(x1 * y) AS s1y,
                   SUM(x2 * y) AS s2y, SUM(y * y) AS syy
            FROM (
                SELECT CAST(l_quantity AS BIGINT) AS x1,
                       CAST(l_discount * 100 AS BIGINT) AS x2,
                       CAST(l_extendedprice AS BIGINT) AS y
                FROM lineitem
            )
        ), c AS (
            SELECT n,
                   CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS c11,
                   CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c22,
                   CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c12,
                   CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c1y,
                   CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c2y,
                   CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                   CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
            FROM m
        ), b AS (
            SELECT n, cyy, c1y, c2y, m1, m2, my,
                   (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
                   (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
            FROM c
        )
        SELECT n,
               ROUND((my - b1 * m1 - b2 * m2) * 1e4) / 1e4 + 0.0 AS beta0,
               ROUND(b1 * 1e6) / 1e6 + 0.0 AS beta_qty,
               ROUND(b2 * 1e6) / 1e6 + 0.0 AS beta_disc,
               ROUND((1.0 - (cyy - b1 * c1y - b2 * c2y) / cyy) * 1e6) / 1e6 + 0.0 AS r2
        FROM b
        """
    )


@query(
    "l_pareto_front",
    oracle="""
    WITH s AS (
        SELECT doc_id, length(text) AS n_len,
               CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                    AS DOUBLE) / length(text) AS alpha_ratio
        FROM documents WHERE lang = 'en'
    )
    SELECT d.doc_id, d.n_len,
           ROUND(d.alpha_ratio * 1e6, 0) / 1e6 AS alpha_ratio
    FROM s d
    WHERE NOT EXISTS (
        SELECT 1 FROM s e
        WHERE e.n_len >= d.n_len AND e.alpha_ratio >= d.alpha_ratio
          AND (e.n_len > d.n_len OR e.alpha_ratio > d.alpha_ratio)
    )
    ORDER BY d.doc_id
    """,
)
def l_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-objective Pareto-front pruning: keep every English document
    NOT weakly dominated on (length, alphabetic-character ratio) — the
    skyline operator data-curation pipelines use to trade off quality
    signals without collapsing them into one weighted score.

    Algorithm (Spark side): the rollup-skyline — aggregate the corpus
    to ONE row per distinct length (max alpha_ratio), run the
    strictly-longer running max over that LENGTH-DOMAIN-sized rollup
    (``RANGE 1 PRECEDING`` under n_len DESC ⇒ strictly greater
    lengths), and broadcast the |distinct lengths|-row skyline spine
    back onto the corpus. A doc survives iff no strictly-longer length
    class reaches its ratio and it is the ratio-max of its own length
    class (ties on both axes survive together — weak Pareto
    semantics). The DuckDB oracle states the same front through the
    quadratic NOT EXISTS definition — an independent formulation.

    Determinism: alpha_ratio is ONE double division of two exact
    integers (identical both engines); comparisons and maxes operate on
    those exact doubles, so the surviving set is bit-stable. Rounding
    happens only at output (never feeds a comparison).

    Scale: the corpus passes through one n_len-keyed hash agg
    (map-side partials) and one broadcast equi-join — never a global
    sort and never the oracle's O(n²) nested loop. The only
    unpartitioned window runs over the rollup, whose row count is
    bounded by the LENGTH VALUE DOMAIN, not the corpus (the
    l_tokens_zipf_fit bounded-input class; whitelisted with that
    justification in test_plans.py).
    """
    d = table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    s = d.select(
        "doc_id",
        F.length("text").alias("n_len"),
        (
            F.length(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")
            ).cast("double")
            / F.length("text")
        ).alias("alpha_ratio"),
    )
    per_len = s.groupBy("n_len").agg(F.max("alpha_ratio").alias("mx"))
    w_longer = (
        W.orderBy(F.col("n_len").desc())
        .rangeBetween(W.unboundedPreceding, -1)
    )
    spine = per_len.select(
        "n_len",
        "mx",
        F.max("mx").over(w_longer).alias("best_longer"),
    )
    return (
        s.join(F.broadcast(spine), "n_len")
        .filter(
            (
                F.col("best_longer").isNull()
                | (F.col("best_longer") < F.col("alpha_ratio"))
            )
            & (F.col("alpha_ratio") == F.col("mx"))
        )
        .select(
            "doc_id",
            "n_len",
            dround(F.col("alpha_ratio"), 6).alias("alpha_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "l_embedding_rp",
    oracle="""
    WITH dims AS (SELECT unnest(generate_series(0, 7)) AS j),
    pos AS (SELECT unnest(generate_series(1, 64)) AS i),
    terms AS (
        SELECT e.vec_id, d.j,
               CAST(trunc(
                   (CASE WHEN substring(md5(d.j::VARCHAR || '_' || p.i::VARCHAR), 1, 1)
                             IN ('0','2','4','6','8','a','c','e')
                         THEN 1.0 ELSE -1.0 END)
                   * CAST(e.embedding[p.i] AS DOUBLE) * 1e9
               ) AS BIGINT) AS tq
        FROM embeddings e, dims d, pos p
        WHERE e.vec_id < 100
    )
    SELECT vec_id, j,
           ROUND(CAST(SUM(tq) AS BIGINT) / 1e9 * 1e6, 0) / 1e6 + 0 AS proj
    FROM terms
    GROUP BY vec_id, j
    ORDER BY vec_id, j
    """,
)
def l_embedding_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random projection (Johnson–Lindenstrauss): reduce 64-dim
    embeddings to 8 dims with a DETERMINISTIC ±1 sign matrix derived
    from md5(j_i) parity — the hash-seeded sketch that lets a 100 TB
    pipeline shrink vectors for ANN pre-filtering without shipping a
    projection matrix (both engines, and any executor, re-derive the
    same signs from the hash; cf. Achlioptas 2003 database-friendly
    projections).

    Determinism: each term sign·v·1e9 is truncated to BIGINT per
    (position, output-dim) BEFORE summation (rule 11e — the 64-term
    float sum would be order-sensitive; the integer sum is immune);
    Spark's CAST truncates while DuckDB's rounds, so the oracle spells
    trunc() (rule 6). md5 of the identical string is identical.

    Scale: posexplode fans each vector to 64·8 = 512 terms — a map-side
    expansion with no shuffle until the (vec_id, j) partial-agg
    combine; the sign matrix never materializes anywhere. At 1000
    executors this is embarrassingly parallel; the output is 8× smaller
    than the input. The vec_id < 100 cap only bounds the ORACLE
    comparison surface, not the technique.
    """
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    dims = F.broadcast(
        table(spark, sf_dir, "embeddings")
        .sparkSession.range(0, 8)
        .select(F.col("id").cast("int").alias("j"))
    )
    terms = (
        e.select(
            "vec_id", F.posexplode("embedding").alias("i0", "v")
        )
        .crossJoin(dims)
        .select(
            "vec_id",
            "j",
            F.expr(
                """
                CAST(
                    (CASE WHEN substring(
                              md5(concat(CAST(j AS STRING), '_',
                                         CAST(i0 + 1 AS STRING))), 1, 1)
                          IN ('0','2','4','6','8','a','c','e')
                     THEN 1.0D ELSE -1.0D END)
                    * CAST(v AS DOUBLE) * 1e9
                AS BIGINT)
                """
            ).alias("tq"),
        )
    )
    return (
        terms.groupBy("vec_id", "j")
        .agg(F.sum("tq").alias("sq"))
        .select(
            "vec_id",
            "j",
            dround(F.col("sq") / F.lit(1e9), 6).alias("proj"),
        )
        .orderBy("vec_id", "j")
    )


@query(
    "l_ml_naive_bayes",
    oracle="""
    WITH tr AS (
        SELECT doc_id, lang, lower(text) AS lt FROM documents
        WHERE doc_id % 2 = 0
    ), te AS (
        SELECT doc_id, lang, lower(text) AS lt FROM documents
        WHERE doc_id % 2 = 1
    ), trt AS (
        SELECT doc_id, lang, unnest(string_split(lt, ' ')) AS tok FROM tr
    ), v AS (
        SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vsz FROM trt
    ), cls AS MATERIALIZED (
        SELECT t.lang,
               CAST(COUNT(*) AS BIGINT) AS n_c,
               (SELECT vsz FROM v) AS vsz,
               CAST((SELECT COUNT(*) FROM tr d2 WHERE d2.lang = t.lang)
                    AS BIGINT) AS nd_c,
               CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS nd
        FROM trt t
        GROUP BY t.lang
    ), lp AS MATERIALIZED (
        SELECT c.lang, t.tok,
               ln(CAST(cnt + 1 AS DOUBLE) / CAST(c.n_c + c.vsz AS DOUBLE))
                   AS lpv
        FROM (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM trt GROUP BY lang, tok) t
        JOIN cls c ON c.lang = t.lang
    ), tet AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
        FROM (SELECT doc_id, unnest(string_split(lt, ' ')) AS tok FROM te)
        GROUP BY doc_id, tok
    ), sc AS (
        SELECT tt.doc_id, c.lang,
               CAST(SUM(CAST(trunc(
                   CAST(tt.m AS DOUBLE)
                   * COALESCE(l.lpv,
                              ln(1.0 / CAST(c.n_c + c.vsz AS DOUBLE)))
                   * 1e12) AS BIGINT)) AS BIGINT)
               + CAST(trunc(ln(CAST(c.nd_c AS DOUBLE) / CAST(c.nd AS DOUBLE))
                            * 1e12) AS BIGINT) AS score
        FROM tet tt
        CROSS JOIN cls c
        LEFT JOIN lp l ON l.lang = c.lang AND l.tok = tt.tok
        GROUP BY tt.doc_id, c.lang, c.n_c, c.vsz, c.nd_c, c.nd
    ), pred AS (
        SELECT doc_id, lang AS pred_lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lang ASC) AS rk
        FROM sc
    )
    SELECT te.lang AS true_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred p JOIN te ON te.doc_id = p.doc_id
    WHERE p.rk = 1
    GROUP BY te.lang, p.pred_lang
    """,
)
def l_ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine multinomial Naive Bayes language classifier: TRAIN on
    even-doc_id documents (per-class token counts with add-1 Laplace
    smoothing over the train vocabulary, log priors from class doc
    frequencies), PREDICT the language of odd-doc_id documents by
    argmax of the summed log-likelihoods, and emit the confusion
    matrix — the classic generatively-trained classifier expressed
    entirely as distributed DataFrame algebra (cf. MADlib's NB and
    Spark MLlib's NaiveBayes, which materialize the same per-(class,
    token) count table; doc §2 of the mandate: corpus classification).

    Fixture note: this corpus's lang labels are INDEPENDENT of its
    token content (all langs share one synthetic vocabulary), so
    measured accuracy (~0.40 at sf0.1) is prior-dominated by design —
    the oracle hash-match verifies the train/score/argmax algebra, and
    tests/test_property.py proves the mechanism: perfect diagonal on a
    disjoint-vocabulary corpus plus cross-engine agreement under
    Hypothesis-randomized labelled corpora.

    Determinism (rules 6/11e): every log term is computed from EXACT
    integer counts, so ln() sees the identical double in both engines
    (libm-identical — the l_dsir_weight precedent); each per-(doc,
    class, token) contribution m·log p·1e12 is truncated to BIGINT
    BEFORE the per-doc sum (toward-zero trunc on negatives matches
    Spark CAST — oracle spells trunc()), making the score an
    order-immune integer; argmax ties break on lang ASC, exact over
    integers.

    Scale: the model IS a DataFrame — (class, token) counts partial-
    aggregate map-side and stay distributed; scoring is test-tokens ×
    |classes| (a 5-row broadcast) left-joined to the BROADCAST model
    (vocab·classes rows — for web-scale vocabularies swap to a
    token-keyed shuffle join; the plan is hinted, not collected). No
    iteration, no driver-side model state: NB trains in exactly one
    pass, which is why it remains the 100 TB baseline classifier.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.lower(F.col("text")).alias("lt")
    )
    tr = d.filter(F.col("doc_id") % 2 == 0)
    te = d.filter(F.col("doc_id") % 2 == 1)
    # ONE tokenize pass feeds vocabulary size, train-doc count, class
    # stats (split() always yields >=1 token per doc, so
    # countDistinct(doc_id) over tokens == the doc count) and the model
    # counts — localCheckpoint, not persist, so repeat invocations
    # re-scan honestly (CLAUDE.md rules 8a/11a). Paired-interleaved at
    # sf0.1 this is runtime-NEUTRAL (2.36 vs 2.48 s medians — the tiny
    # fixture is scheduling-floor-bound, not tokenize-bound); the single
    # tokenize pass is kept for the 100 TB shape, where re-running the
    # corpus explode once per consumer (4x) is the dominant cost.
    trt = tr.select(
        "doc_id", "lang", F.explode(F.split("lt", " ")).alias("tok")
    ).localCheckpoint()
    v_nd = trt.agg(
        F.countDistinct("tok").alias("vsz"),
        F.countDistinct("doc_id").alias("nd"),
    )
    cls = (
        trt.groupBy("lang")
        .agg(
            F.count("*").alias("n_c"),
            F.countDistinct("doc_id").alias("nd_c"),
        )
        .crossJoin(v_nd)
    )
    ct = trt.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
    lp = ct.join(cls.select("lang", "n_c", "vsz"), "lang").select(
        "lang",
        "tok",
        F.log(
            (F.col("cnt") + 1).cast("double")
            / (F.col("n_c") + F.col("vsz")).cast("double")
        ).alias("lpv"),
    )
    tet = (
        te.select("doc_id", F.explode(F.split("lt", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("m"))
    )
    c = cls.select(
        F.col("lang").alias("c_lang"), "n_c", "vsz", "nd_c", "nd"
    )
    term = (
        F.col("m").cast("double")
        * F.coalesce(
            F.col("lpv"),
            F.log(F.lit(1.0) / (F.col("n_c") + F.col("vsz")).cast("double")),
        )
        * F.lit(1e12)
    ).cast("bigint")
    prior_q = (
        F.log(F.col("nd_c").cast("double") / F.col("nd").cast("double"))
        * F.lit(1e12)
    ).cast("bigint")
    sc = (
        tet.crossJoin(F.broadcast(c))
        .join(
            F.broadcast(lp),
            (F.col("c_lang") == lp.lang) & (tet.tok == lp.tok),
            "left",
        )
        .groupBy("doc_id", "c_lang", "n_c", "vsz", "nd_c", "nd")
        .agg(F.sum(term).alias("s_q"))
        .select(
            "doc_id",
            "c_lang",
            (F.col("s_q") + prior_q).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("c_lang").asc()
    )
    pred = (
        sc.select("doc_id", "c_lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("c_lang").alias("pred_lang"))
    )
    return (
        pred.join(te.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


@query(
    "l_mmr_rerank",
    oracle="""
    WITH cand AS MATERIALIZED (
        SELECT e.vec_id, e.embedding,
               (SELECT SUM(e.embedding[s.i]::DOUBLE * q.qe[s.i]::DOUBLE)
                FROM (SELECT unnest(generate_series(1, 64)) AS i) s) AS rel
        FROM embeddings e,
             (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY rel DESC, e.vec_id LIMIT 12
    ), sims AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               (SELECT SUM(a.embedding[s.i]::DOUBLE * b.embedding[s.i]::DOUBLE)
                FROM (SELECT unnest(generate_series(1, 64)) AS i) s) AS d
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ), s1 AS MATERIALIZED (
        SELECT vec_id, rel, 0.7 * rel AS score
        FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ), s2 AS MATERIALIZED (
        SELECT c.vec_id, c.rel,
               0.7 * c.rel - 0.3 * MAX(s.d) AS score
        FROM cand c JOIN sims s ON s.va = c.vec_id
        WHERE s.vb IN (SELECT vec_id FROM s1)
          AND c.vec_id NOT IN (SELECT vec_id FROM s1)
        GROUP BY c.vec_id, c.rel
        ORDER BY score DESC, c.vec_id LIMIT 1
    ), s3 AS MATERIALIZED (
        SELECT c.vec_id, c.rel,
               0.7 * c.rel - 0.3 * MAX(s.d) AS score
        FROM cand c JOIN sims s ON s.va = c.vec_id
        WHERE s.vb IN (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2)
          AND c.vec_id NOT IN
              (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2)
        GROUP BY c.vec_id, c.rel
        ORDER BY score DESC, c.vec_id LIMIT 1
    ), s4 AS MATERIALIZED (
        SELECT c.vec_id, c.rel,
               0.7 * c.rel - 0.3 * MAX(s.d) AS score
        FROM cand c JOIN sims s ON s.va = c.vec_id
        WHERE s.vb IN (SELECT vec_id FROM s1 UNION ALL
                       SELECT vec_id FROM s2 UNION ALL
                       SELECT vec_id FROM s3)
          AND c.vec_id NOT IN
              (SELECT vec_id FROM s1 UNION ALL
               SELECT vec_id FROM s2 UNION ALL
               SELECT vec_id FROM s3)
        GROUP BY c.vec_id, c.rel
        ORDER BY score DESC, c.vec_id LIMIT 1
    )
    SELECT rank, vec_id,
           ROUND(rel * 1e6, 0) / 1e6 + 0 AS rel,
           ROUND(score * 1e6, 0) / 1e6 + 0 AS mmr_score
    FROM (
        SELECT 1 AS rank, * FROM s1 UNION ALL
        SELECT 2, * FROM s2 UNION ALL
        SELECT 3, * FROM s3 UNION ALL
        SELECT 4, * FROM s4
    )
    """,
)
def l_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein
    1998): greedily pick 4 results from the query's top-12 cosine
    candidates, each step maximizing λ·relevance − (1−λ)·max-similarity
    to the already-selected set (λ=0.7) — the diversity-aware rerank
    RAG pipelines apply after l_rag_rerank_rrf-style fusion so the
    context window isn't filled with near-duplicates of one hit.

    Determinism: vectors are unit-norm (cosine ≡ dot) and every dot is
    vdot's sequential double fold ≡ DuckDB's ordered correlated-
    subquery SUM — bit-identical doubles — so argmax comparisons agree
    exactly; ties break on vec_id ASC; scores can straddle zero → +0
    guards. The oracle unrolls the same greedy recursion as chained
    MATERIALIZED CTEs (rule 7).

    Scale: candidate generation is the l_sim_search_topk map-only
    top-k; the greedy loop then runs on the TOP-K ONLY — pairwise sims
    among 12 candidates (144 rows, localCheckpoint-ed once), k=4
    bounded 1-row collects steering the recursion (the PCA/k-means
    bounded-driver-step pattern; k and top-k are constants, never
    corpus-sized). At 100 TB nothing changes: MMR cost is O(k·topk),
    independent of corpus size.
    """
    from sqlengine_spark.session import load_tables

    load_tables(spark, sf_dir, ("embeddings",))
    cand = spark.sql(
        """
        SELECT /*+ BROADCAST(q) */ e.vec_id, e.embedding,
               aggregate(zip_with(e.embedding, q.qe,
                                  (x, y) -> CAST(x AS DOUBLE)
                                            * CAST(y AS DOUBLE)),
                         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS rel
        FROM embeddings e,
             (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY rel DESC, e.vec_id LIMIT 12
        """
    ).localCheckpoint()  # 12 rows; one scan feeds sims + every step
    a = cand.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = cand.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    from sqlengine_spark.functions import vdot

    sims = (
        a.join(F.broadcast(b), F.col("va") != F.col("vb"))
        .select("va", "vb", vdot(F.col("ea"), F.col("eb")).alias("d"))
        .localCheckpoint()  # 132 rows
    )
    rel_only = cand.select("vec_id", "rel")
    picked: list[tuple[int, int, float, float]] = []  # bounded: k=4 rows
    sel_ids: list[int] = []
    for rank in range(1, 5):
        if not sel_ids:
            row = rel_only.orderBy(
                F.col("rel").desc(), F.col("vec_id").asc()
            ).first()
            score = 0.7 * row["rel"]
        else:
            row = (
                rel_only.filter(~F.col("vec_id").isin(sel_ids))
                .join(
                    sims.filter(F.col("vb").isin(sel_ids)),
                    F.col("va") == F.col("vec_id"),
                )
                .groupBy("vec_id", "rel")
                .agg(F.max("d").alias("maxsim"))
                .select(
                    "vec_id",
                    "rel",
                    (
                        F.lit(0.7) * F.col("rel")
                        - F.lit(0.3) * F.col("maxsim")
                    ).alias("score"),
                )
                .orderBy(F.col("score").desc(), F.col("vec_id").asc())
                .first()
            )
            score = row["score"]
        sel_ids.append(row["vec_id"])
        picked.append((rank, row["vec_id"], row["rel"], score))
    out = spark.createDataFrame(
        picked, "rank int, vec_id long, rel double, mmr_score double"
    )
    return out.select(
        "rank",
        "vec_id",
        dround(F.col("rel"), 6).alias("rel"),
        dround(F.col("mmr_score"), 6).alias("mmr_score"),
    )

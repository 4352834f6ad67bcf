"""Tier U (extension, round 9, closing batch) — windowed funnels,
deterministic systematic sampling, and budget-capped data selection:
the last three gaps a product-analytics + data-curation user would
reach for that the registry didn't yet cover.

Float policy: everything here is integer arithmetic (counts, epoch
micros, token budgets) except the per-doc quality score, which is a
per-doc identical double expression used only for ORDERING under a
(score, doc_id) total order — no cross-row float accumulation
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqlengine_spark.registry import query
from sqlengine_spark.session import scatter, table


@query(
    "m_funnel_windowed",
    oracle="""
    WITH v AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    ), c AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ), s1 AS (
        SELECT DISTINCT user_id FROM v
    ), s2 AS (
        SELECT DISTINCT v.user_id
        FROM v JOIN c ON c.user_id = v.user_id
                     AND c.ts > v.ts
                     AND epoch_us(c.ts) - epoch_us(v.ts) <= 3600000000
    ), s3 AS (
        -- every pairwise join edge carries an EXPLICIT user_id equality
        -- (p.user_id = c.user_id is implied but, left implicit, DuckDB
        -- reorders to a clicks-x-purchases PIECEWISE_MERGE_JOIN on the
        -- ts inequality alone: quadratic, 44 s at sf0.1 — rule 7)
        SELECT DISTINCT v.user_id
        FROM v
        JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
              AND epoch_us(c.ts) - epoch_us(v.ts) <= 3600000000
        JOIN p ON p.user_id = v.user_id AND p.user_id = c.user_id
              AND p.ts > c.ts
              AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
    )
    SELECT stage, n_users,
           CAST(n_users AS DOUBLE)
               / (SELECT COUNT(*) FROM s1) AS frac_of_stage1
    FROM (
        SELECT 1 AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, CAST(COUNT(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, CAST(COUNT(*) AS BIGINT) FROM s3
    )
    """,
)
def m_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED FUNNEL (the ClickHouse ``windowFunnel`` semantic):
    users reaching view → click → purchase as an ORDERED chain that
    completes within a sliding 1-hour window anchored at the view —
    unlike m_funnel_stages' whole-history first-event funnel, every
    stage must happen inside the window, which is how conversion
    funnels are actually specified (a purchase a week later is not
    attributable to the session).

    Determinism: pure timestamp-integer arithmetic (epoch micros) and
    EXISTS-style distinct counts — no floats until the final
    exact-int ratio.

    Scale: each stage is a user-keyed join with a time-range residual
    (the c_join_interval shape) — fan-out is per-user events inside
    one hour, never corpus-sized; DISTINCT user sets shrink
    monotonically up the funnel; at 100 TB the chain join keys and
    time bounds push into one user-partitioned shuffle reused by all
    stages (AQE reuses the exchange).
    """
    ev = table(spark, sf_dir, "events")
    hour = 3600000000
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    in_1h = lambda a, b: (
        F.unix_micros(F.col(b)) - F.unix_micros(F.col(a)) <= F.lit(hour)
    )
    s1 = v.select("user_id").distinct()
    s2 = (
        v.join(c, "user_id")
        .filter((F.col("cts") > F.col("vts")) & in_1h("vts", "cts"))
        .select("user_id")
        .distinct()
    )
    s3 = (
        v.join(c, "user_id")
        .filter((F.col("cts") > F.col("vts")) & in_1h("vts", "cts"))
        .join(p, "user_id")
        .filter((F.col("pts") > F.col("cts")) & in_1h("vts", "pts"))
        .select("user_id")
        .distinct()
    )
    # Stage-1 denominator folded into the plan as a 1-row broadcast
    # (the e_win_pct_of_total pattern; r9 verdict item 7) — the old
    # `s1.count()` spent a whole extra job on 1 scalar.
    den = s1.agg(F.count("*").cast("double").alias("n1"))
    rows = (
        s1.agg(F.lit(1).alias("stage"), F.count("*").alias("n_users"))
        .unionAll(s2.agg(F.lit(2).alias("stage"), F.count("*").alias("n_users")))
        .unionAll(s3.agg(F.lit(3).alias("stage"), F.count("*").alias("n_users")))
    )
    return rows.crossJoin(F.broadcast(den)).select(
        "stage",
        "n_users",
        (F.col("n_users").cast("double") / F.col("n1")).alias(
            "frac_of_stage1"
        ),
    )


@query(
    "i_sample_systematic",
    oracle="""
    WITH r AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM r WHERE (rn - 1) % 20 = 0
    """,
)
def i_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEMATIC 1-in-20 SAMPLE under a hash ordering — the
    deterministic sibling of RNG ``TABLESAMPLE`` (i_sample): order rows
    by md5(doc_id) (a fixed pseudo-random permutation), keep every
    20th. Same statistical intent as Bernoulli sampling, but
    reproducible across engines, runs, and partitionings — the property
    an auditable eval-split or debugging sample needs; stratification
    is the (already covered) i_sample_hash/i_sample_stratified family.

    Scale: the hash is map-side; the global rank is the one global
    order in this operator — at warehouse scale systematic sampling
    switches to the equivalent per-partition form (hash mod k directly,
    i_sample_hash's shape) because the EXACT every-20th spacing is a
    fixture-level pin, not a statistical requirement; documented here,
    same sampling distribution.
    """
    d = table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    return (
        d.select("doc_id", "source", "n_chars", rn.alias("rn"))
        .filter((F.col("rn") - 1) % 20 == 0)
        .drop("rn")
    )


@query(
    "l_budget_select",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source, n_chars,
               n_chars * CAST(len(string_split(text, ' ')) AS DOUBLE)
                   / (n_chars + 100) AS score
        FROM documents
    ), ranked AS (
        SELECT doc_id, source, n_chars, score,
               SUM(n_chars) OVER (
                   PARTITION BY source
                   ORDER BY score DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_chars
        FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(n_chars) AS BIGINT) AS chars_used,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM ranked
    WHERE cum_chars <= 2000
    GROUP BY source
    """,
)
def l_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUDGET-CAPPED DATA SELECTION: rank each source's documents by a
    quality score and admit them greedily until the source's character
    budget (2000) is exhausted — the "select the best N tokens per
    domain" step every pretraining-mix builder runs after scoring
    (quality-weighted sampling under per-domain token caps).

    Determinism: the score is a per-doc identical double expression
    used ONLY for ordering under a (score DESC, doc_id) total order
    (rule 5); the budget ledger is an INTEGER running sum over that
    order — no cross-row float accumulation anywhere, so the admission
    boundary is exact in both engines.

    Scale (r9 verdict item 8, the two-phase form): admission is
    RANK-BOUNDED — the ledger is a running sum of char counts >= 1, so
    no row past rank 2000 can ever satisfy ``cum_chars <= 2000``.
    Stating that bound as a ``row_number() <= 2000`` filter over its
    own window lets Catalyst insert WindowGroupLimit (Partial BEFORE
    the exchange + Final after): every map task pre-selects its local
    per-source top-2000 rows, so the shuffle carries |sources| x 2000
    rows instead of the corpus — at 100 TB that is the difference
    between shuffling everything and shuffling a constant. The cum-sum
    window then runs on the pruned frame (prefix sums at rank i <= 2000
    only read ranks 1..i, all present — semantics-preserving). The
    bound's precondition (n_chars >= 1) is enforced per-row: a zero- or
    negative-char doc raises in-task instead of silently escaping the
    prune. The WindowGroupLimit threshold conf is set at query time
    because plain driver sessions default it to 1000 < 2000 (the
    rule-10 pushFilters precedent).
    """
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "2048")
    # r12 scatter: single-split fixture scans serialize the
    # map stage on one core (see session.scatter; no-op at scale)
    d = scatter(spark, table(spark, sf_dir, "documents"))
    nchars = F.when(F.col("n_chars") >= 1, F.col("n_chars")).otherwise(
        F.raise_error(F.lit("l_budget_select: n_chars < 1 breaks rank bound"))
    )
    score = (
        F.col("n_chars")
        * F.size(F.split(F.col("text"), " ")).cast("double")
        / (F.col("n_chars") + F.lit(100))
    )
    wspec = W.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    wcum = wspec.rowsBetween(W.unboundedPreceding, W.currentRow)
    pruned = (
        d.select("doc_id", "source", nchars.alias("n_chars"), score.alias("score"))
        .withColumn("rn", F.row_number().over(wspec))
        .filter(F.col("rn") <= 2000)
    )
    ranked = pruned.select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(wcum).alias("cum_chars"),
    )
    return (
        ranked.filter(F.col("cum_chars") <= 2000)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("n_chars").alias("chars_used"),
            F.min("doc_id").alias("first_doc"),
        )
    )

"""Round-11 additions (queued BEHIND the convergence window; these keys
earn their driver rows in round 12): collocation mining, disaggregated
eval with confidence intervals, and RAG chunking — three operators a
training-data pipeline runs that nothing in the registry covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlengine_spark.functions import dround
from sqlengine_spark.registry import query
from sqlengine_spark.session import scatter, table


@query(
    "l_ngram_assoc_llr",
    oracle="""
    WITH w AS (
        SELECT string_split(text, ' ') AS w FROM documents
    ), g AS (
        SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i])) AS w1,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i + 1])) AS w2
        FROM w WHERE len(w) >= 2
    ), bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11
        FROM g GROUP BY w1, w2
    ), lm AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS r FROM g GROUP BY w1
    ), rm AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY w2
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g
    ), m AS (
        SELECT bc.w1, bc.w2, bc.k11, lm.r, rm.c, nn.n,
               lm.r - bc.k11 AS k12,
               rm.c - bc.k11 AS k21,
               nn.n - lm.r - rm.c + bc.k11 AS k22
        FROM bc JOIN lm ON lm.w1 = bc.w1
                JOIN rm ON rm.w2 = bc.w2
                CROSS JOIN nn
        WHERE bc.k11 >= 5
    ), s AS (
        SELECT w1, w2, k11, r, c,
               2.0 * (
                 (CASE WHEN k11 = 0 THEN 0.0
                       ELSE CAST(k11 AS DOUBLE) * ln(CAST(k11 AS DOUBLE)) END)
               + (CASE WHEN k12 = 0 THEN 0.0
                       ELSE CAST(k12 AS DOUBLE) * ln(CAST(k12 AS DOUBLE)) END)
               + (CASE WHEN k21 = 0 THEN 0.0
                       ELSE CAST(k21 AS DOUBLE) * ln(CAST(k21 AS DOUBLE)) END)
               + (CASE WHEN k22 = 0 THEN 0.0
                       ELSE CAST(k22 AS DOUBLE) * ln(CAST(k22 AS DOUBLE)) END)
               + CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
               - CAST(r AS DOUBLE) * ln(CAST(r AS DOUBLE))
               - (CASE WHEN n - r = 0 THEN 0.0
                       ELSE CAST(n - r AS DOUBLE) * ln(CAST(n - r AS DOUBLE)) END)
               - CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
               - (CASE WHEN n - c = 0 THEN 0.0
                       ELSE CAST(n - c AS DOUBLE) * ln(CAST(n - c AS DOUBLE)) END)
               ) AS llr
        FROM m
    )
    SELECT w1, w2, k11 AS n_pair,
           CAST(FLOOR(llr * 1e6 + 0.5) AS BIGINT) / 1e6 + 0 AS llr
    FROM s
    ORDER BY CAST(FLOOR(llr * 1e6 + 0.5) AS BIGINT) DESC, w1, w2
    LIMIT 50
    """,
)
def l_ngram_assoc_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLOCATION MINING by log-likelihood ratio (Dunning 1993,
    "Accurate Methods for the Statistics of Surprise and Coincidence";
    public method): for every adjacent word pair, the G² statistic of
    its 2x2 contingency table (bigram count vs marginal word counts
    over all bigram events), top-50. LLR is THE collocation test that
    stays calibrated for rare words where PMI explodes — the phrase
    inventory a tokenizer/vocab pipeline mines before merging
    multi-word units. Complements l_topic_cooccur (doc-level PMI) and
    l_text_lm_score (per-doc bigram LM score).

    Determinism: all nine x·ln(x) terms come from exact BIGINT counts
    (a 0-count term is pinned to 0 in both engines); the sum is ONE
    fixed-shape per-row expression (no float aggregation anywhere —
    rule 9 does not apply), ln is the same libm call both engines (the
    l_dsir_weight precedent), and the rank key is half-up 1e6 fixed
    point with the (w1, w2) tiebreak — a total order (rule 5). LLR is
    non-negative, '+ 0' guards the quantized output anyway.

    Scale: one map-side bigram transform (size>=2 guarded, rule 11d)
    feeding three hash aggs — (w1,w2) pair counts, w1 marginals, w2
    marginals — all partial+final; the marginal tables are
    vocab-sized and joined PLAIN (AQE broadcasts them only when
    actually small — the r11 df-table rule), the 1-row N broadcasts,
    and the top-50 is TakeOrdered. The k11 >= 5 support filter prunes
    the pair tail before the joins, exactly like m_basket_affinity."""
    # r12 scatter: single-split fixture scans serialize the
    # map stage on one core (see session.scatter; no-op at scale)
    d = scatter(spark, table(spark, sf_dir, "documents"))
    # zip_with over slices of a LET-BOUND token array: transform over a
    # 1-element array binds split(text) to the lambda variable w, so
    # the tokenize runs EXACTLY once per row — the old form spelled
    # split(text) four times and paid ~4x tokenize per doc (paired at
    # x100: 2.365 -> 1.995 s median, 7/7 wins; sf0.1 0.522 -> 0.435 —
    # the r11 verdict's double-tokenize chip, closed without a
    # localCheckpoint/lineage cut). An INDEX lambda that re-references
    # split(text)[i] would still be the rule-14c O(L²) defect
    # (measured 32 s vs 2.4 s at x100); the variable binding is what
    # makes multi-reference free.
    grams = d.select(
        F.explode(
            F.expr(
                "element_at(transform(array(split(text, ' ')), w ->"
                " CASE WHEN size(w) >= 2 THEN"
                " zip_with(slice(w, 1, size(w) - 1),"
                "          slice(w, 2, size(w) - 1),"
                "          (x, y) -> struct(x AS w1, y AS w2))"
                " ELSE CAST(array() AS ARRAY<STRUCT<w1:STRING, w2:STRING>>)"
                " END), 1)"
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    # ONE corpus-scale shuffle: count pairs once, then derive both
    # marginals and N from the pair-count table (vocab²-bounded, far
    # smaller than the gram stream) — counting marginals off the raw
    # grams would shuffle the corpus three times. On the degenerate
    # fixture vocab the gain is small (x100: 3.15 → 2.98 s; the
    # map-side gram scan is 2.0 s of that and the pair table is 931
    # rows), but at open vocabulary the 3-shuffle plan moves the whole
    # corpus three times. Struct grams beat concat-string grams
    # (scan 2.00 vs 2.38 s at x100 — measured, pin 13b).
    # localCheckpoint: four consumers, one materialization (rule 11a).
    bc_all = (
        grams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("k11"))
        .localCheckpoint()
    )
    bc = bc_all.filter(F.col("k11") >= 5)
    lm = bc_all.groupBy("w1").agg(F.sum("k11").alias("r"))
    rm = bc_all.groupBy("w2").agg(F.sum("k11").alias("c"))
    nn = bc_all.agg(F.sum("k11").alias("n"))
    m = (
        bc.join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(nn))
        .withColumn("k12", F.col("r") - F.col("k11"))
        .withColumn("k21", F.col("c") - F.col("k11"))
        .withColumn(
            "k22", F.col("n") - F.col("r") - F.col("c") + F.col("k11")
        )
    )

    def xlx(col):
        cd = col.cast("double")
        return F.when(col == 0, F.lit(0.0)).otherwise(cd * F.log(cd))

    llr = 2.0 * (
        xlx(F.col("k11"))
        + xlx(F.col("k12"))
        + xlx(F.col("k21"))
        + xlx(F.col("k22"))
        + xlx(F.col("n"))
        - xlx(F.col("r"))
        - xlx(F.col("n") - F.col("r"))
        - xlx(F.col("c"))
        - xlx(F.col("n") - F.col("c"))
    )
    fp = F.floor(llr * 1e6 + 0.5).cast("bigint")
    return (
        m.select(
            "w1",
            "w2",
            F.col("k11").alias("n_pair"),
            (fp / F.lit(1e6) + F.lit(0.0)).alias("llr"),
            fp.alias("fp"),
        )
        .orderBy(F.col("fp").desc(), "w1", "w2")
        .limit(50)
        .drop("fp")
    )


@query(
    "l_eval_slice_accuracy",
    oracle="""
    WITH p AS (
        SELECT source,
               CASE WHEN (CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END)
                    = (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS ok
        FROM documents
    ), a AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ok) AS BIGINT) AS k
        FROM p GROUP BY source
    )
    SELECT source, n, k,
           ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) / 1e6 + 0
               AS accuracy,
           ROUND((
             (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE))
              - 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                            * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)
                            + 1.96 * 1.96
                              / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))) * 1e6) / 1e6 + 0
               AS wilson_lo,
           ROUND((
             (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE))
              + 1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                            * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)
                            + 1.96 * 1.96
                              / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))) * 1e6) / 1e6 + 0
               AS wilson_hi
    FROM a
    ORDER BY source
    """,
)
def l_eval_slice_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLICE-DISAGGREGATED ACCURACY with Wilson 95% intervals — the
    eval table every model card publishes (per-slice metric + a CI
    that stays honest at small n, Wilson 1927; public method): here a
    cheap english-detector proxy (text contains ' the ') scored
    against the lang label, sliced by source. Aggregate accuracy hides
    slice regressions; the Wilson interval (unlike the normal
    approximation) never leaves [0,1] and is the standard choice for
    per-slice eval counts.

    Determinism: n and k are exact BIGINTs; accuracy and both Wilson
    bounds are fixed-shape per-row double expressions over (n, k) with
    one correctly-rounded sqrt — IEEE-identical cross-engine (the
    m_ab_power_mde expression class); each output quantizes once on
    the 1e6 grid with '+ 0'.

    Scale: one scan, one slice-keyed partial+final conditional agg
    (slice domain is bounded); the CI math runs on the slice-count
    table. This composes over any (model, slice) grid at 100 TB —
    state per group is two BIGINTs."""
    d = table(spark, sf_dir, "documents")
    pred = F.when(F.col("text").like("% the %"), 1).otherwise(0)
    truth = F.when(F.col("lang") == "en", 1).otherwise(0)
    ok = F.when(pred == truth, 1).otherwise(0)
    a = d.select(F.col("source"), ok.alias("ok")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("ok").alias("k")
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    z2 = F.lit(1.96) * F.lit(1.96)
    half = F.lit(1.96) * F.sqrt(
        p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * nd * nd)
    )
    denom = F.lit(1.0) + z2 / nd
    center = p + z2 / (F.lit(2.0) * nd)
    return a.select(
        "source",
        "n",
        "k",
        dround(p, 6).alias("accuracy"),
        dround((center - half) / denom, 6).alias("wilson_lo"),
        dround((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("source")


@query(
    "l_rag_chunk_overlap",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), c AS (
        SELECT doc_id, len(w) AS n_tok,
               unnest(generate_series(
                   0,
                   CASE WHEN len(w) <= 64 THEN 0
                        ELSE CAST(CEIL((len(w) - 64) / 48.0) AS BIGINT) END
               )) AS chunk_id,
               w
        FROM w
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(1 + chunk_id * 48 AS BIGINT) AS start_tok,
           CAST(LEAST(chunk_id * 48 + 64, n_tok) - chunk_id * 48
                AS BIGINT) AS chunk_len,
           CAST(CASE WHEN chunk_id = 0 THEN 0
                ELSE (chunk_id - 1) * 48 + 64 - chunk_id * 48 END
                AS BIGINT) AS overlap_prev,
           md5(array_to_string(
               w[1 + chunk_id * 48 : LEAST(chunk_id * 48 + 64, n_tok)],
               ' ')) AS chunk_md5
    FROM c
    """,
)
def l_rag_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG SLIDING-WINDOW CHUNKING (window 64 tokens, stride 48 ⇒ 16
    tokens of overlap) — the ingest transform every retrieval pipeline
    runs before embedding: split each document into overlapping
    token-window chunks, emitting per chunk its start offset, length,
    overlap with the previous chunk, and an md5 content fingerprint
    (the key a downstream chunk-level dedup / embedding cache joins
    on). Chunk count per doc = ceil(max(L-64,0)/48)+1, so every doc
    (even shorter than one window) yields ≥ 1 chunk and the final
    chunk is the only short one — the LangChain/LlamaIndex fixed-size
    splitter semantics (public method).

    Determinism: chunk boundaries are pure integer arithmetic on the
    token count; the fingerprint is md5 over the space-joined token
    slice — Spark's slice(w, start, len) and DuckDB's w[a:b] produce
    the identical token run (both 1-based inclusive here), md5 is
    bit-identical.

    Scale: ZERO shuffles — one map-side explode per document (fan-out
    = L/48, bounded by doc length), no aggregation, no join. Honest
    map-work bound (r11 code review): the slice's split() sits inside
    the transform lambda, so per-doc work is O(L²/48) token copies
    (pin 14c class) — for typical ≤4k-token web documents that is a
    bounded ~85× constant over the scan and still beats the
    single-process engine at x100 (0.60×, BASELINE.md); a
    long-document corpus (100k+ tokens) should instead take the
    linear-shuffle variant (posexplode tokens → ≤2 chunk memberships
    each → (doc, chunk) groupBy reassembly), documented here rather
    than built because every measured corpus class is short-doc.
    Chunk-level dedup/embedding joins downstream key on chunk_md5,
    which shards uniformly. The WHOLE chunk row (offsets + md5) is
    computed INSIDE the one generator expression — projecting the
    token array alongside the explode would ADDITIONALLY re-run
    split() per chunk row (rule 12a)."""
    d = table(spark, sf_dir, "documents")
    chunks = F.expr(
        """
        transform(
          sequence(0,
            CASE WHEN size(split(text, ' ')) <= 64 THEN 0
                 ELSE CAST(CEIL((size(split(text, ' ')) - 64) / 48.0)
                      AS INT) END),
          i -> struct(
            CAST(i AS BIGINT) AS chunk_id,
            CAST(1 + i * 48 AS BIGINT) AS start_tok,
            CAST(LEAST(i * 48 + 64, size(split(text, ' '))) - i * 48
                 AS BIGINT) AS chunk_len,
            CAST(IF(i = 0, 0, 16) AS BIGINT) AS overlap_prev,
            md5(concat_ws(' ',
                slice(split(text, ' '), 1 + i * 48,
                      LEAST(i * 48 + 64, size(split(text, ' ')))
                      - i * 48))) AS chunk_md5))
        """
    )
    return d.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        "c.chunk_id",
        "c.start_tok",
        "c.chunk_len",
        "c.overlap_prev",
        "c.chunk_md5",
    )


@query(
    "l_embed_norm_stats",
    oracle="""
    WITH v AS (
        SELECT label, vec_id,
               CAST(FLOOR(sqrt((SELECT SUM(e.embedding[s.i]::DOUBLE
                                           * e.embedding[s.i]::DOUBLE)
                                FROM (SELECT unnest(generate_series(1, 64))
                                      AS i) s)) * 1e6 + 0.5) AS BIGINT)
                   AS nq
        FROM embeddings e
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN nq = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
           ROUND(CAST(SUM(nq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 / 1e6 * 1e6) / 1e6 + 0 AS avg_norm,
           MIN(nq) / 1e6 + 0 AS min_norm,
           MAX(nq) / 1e6 + 0 AS max_norm
    FROM v GROUP BY label ORDER BY label
    """,
)
def l_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING HYGIENE AUDIT per label: vector count, zero-vector
    count, and the mean/min/max L2 norm — the first QA table an
    embedding pipeline publishes (norm collapse, un-normalized
    batches, and dead/zero vectors are the classic silent failures
    before any ANN index is built).

    Determinism: the squared norm is the bit-pinned sequential vdot
    fold (functions.vdot ≡ DuckDB's ordered generate_series SUM); each
    row's norm quantizes to a 1e6 fixed-point BIGINT BEFORE the group
    sums, so every aggregate is an exact integer — immune to per-group
    float sum order in both engines (CLAUDE.md rule 11e), min/max ride
    the same grid.

    Scale: one scan of the embeddings table, one label-keyed
    partial+final agg (label domain bounded); the per-row fold is
    map-side JVM codegen. At 100 TB this is scan speed."""
    from sqlengine_spark.functions import vdot

    e = table(spark, sf_dir, "embeddings")
    nq = F.floor(
        F.sqrt(vdot(F.col("embedding"), F.col("embedding"))) * 1e6 + 0.5
    ).cast("bigint")
    a = e.select("label", nq.alias("nq")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.when(F.col("nq") == 0, 1).otherwise(0)).alias("n_zero"),
        F.sum("nq").alias("snq"),
        F.min("nq").alias("mn"),
        F.max("nq").alias("mx"),
    )
    return a.select(
        "label",
        "n_vecs",
        "n_zero",
        dround(
            F.col("snq").cast("double") / F.col("n_vecs").cast("double") / 1e6,
            6,
        ).alias("avg_norm"),
        (F.col("mn") / F.lit(1e6) + F.lit(0.0)).alias("min_norm"),
        (F.col("mx") / F.lit(1e6) + F.lit(0.0)).alias("max_norm"),
    ).orderBy("label")


@query(
    "m_ab_sequential_sprt",
    oracle="""
    WITH e AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(ts AS DATE) AS d,
               CASE WHEN value > 150 THEN 1 ELSE 0 END AS x
        FROM events
    ), daily AS (
        SELECT arm, d, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS k
        FROM e GROUP BY arm, d
    ), cum AS (
        SELECT arm, d,
               SUM(n) OVER w AS cn, SUM(k) OVER w AS ck
        FROM daily
        WINDOW w AS (PARTITION BY arm ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), llr AS (
        SELECT arm, d, cn, ck,
               CAST(ck AS DOUBLE) * ln(0.4 / 0.3)
               + CAST(cn - ck AS DOUBLE) * ln(0.6 / 0.7) AS g
        FROM cum
    ), hit AS (
        SELECT arm, d, cn, ck, g,
               ROW_NUMBER() OVER (PARTITION BY arm ORDER BY d) AS rn
        FROM llr
        WHERE g >= ln(19.0) OR g <= ln(1.0 / 19.0)
    )
    SELECT l.arm,
           CASE WHEN h.arm IS NULL THEN 'continue'
                WHEN h.g >= ln(19.0) THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           COALESCE(CAST(h.d AS VARCHAR), '') AS decision_day,
           CAST(COALESCE(h.cn, m.cn) AS BIGINT) AS n_obs,
           ROUND(COALESCE(h.g, m.g) * 1e6) / 1e6 + 0 AS llr
    FROM (SELECT DISTINCT arm FROM llr) l
    LEFT JOIN (SELECT * FROM hit WHERE rn = 1) h ON h.arm = l.arm
    LEFT JOIN (SELECT arm, cn, g,
                      ROW_NUMBER() OVER (PARTITION BY arm
                                         ORDER BY d DESC) AS rl
               FROM llr) m ON m.arm = l.arm AND m.rl = 1
    ORDER BY l.arm
    """,
)
def m_ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-SEQUENTIAL A/B MONITORING — Wald's SPRT (1945; public
    method) with DAILY looks: per experiment arm (user_id % 2), the
    cumulative Bernoulli log-likelihood ratio of H1 (p=0.4) vs H0
    (p=0.3) over the conversion proxy (value > 150) is checked once
    per day against the Wald boundaries ±ln(19) (α = β = 0.05); emit
    the first crossing day and its decision, or 'continue' with the
    final state. This is the always-valid monitoring loop an
    experimentation platform runs instead of a fixed-horizon z-test
    (m_ab_ratio_delta's complement).

    Determinism: daily counts are exact BIGINTs; the cumulative sums
    are integer window sums; the LLR is one fixed-shape double
    expression (two ln's of literal ratios — identical libm both
    engines); boundary compares use the same doubles; decision day is
    cast to VARCHAR (rule 3).

    Scale: the per-event stream folds to (arm, day) counts in one
    partial+final agg FIRST — the sequential pass then runs on the
    bounded looks table (arms × days), never on raw events. This is
    exactly how production sequential testing works (per-look
    increments), and the arm-partitioned window sorts ~365 rows per
    arm, not the corpus (the m_ts value-domain-bounded window class).
    """
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    e = ev.select(
        (F.col("user_id") % 2).cast("bigint").alias("arm"),
        F.to_date("ts").alias("d"),
        F.when(F.col("value") > 150, 1).otherwise(0).alias("x"),
    )
    daily = e.groupBy("arm", "d").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("k")
    )
    w = W.partitionBy("arm").orderBy("d").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = daily.select(
        "arm",
        "d",
        F.sum("n").over(w).alias("cn"),
        F.sum("k").over(w).alias("ck"),
    )
    g = F.col("ck").cast("double") * F.log(F.lit(0.4 / 0.3)) + (
        F.col("cn") - F.col("ck")
    ).cast("double") * F.log(F.lit(0.6 / 0.7))
    llr = cum.select("arm", "d", "cn", "ck", g.alias("g")).localCheckpoint()
    hi, lo = F.log(F.lit(19.0)), F.log(F.lit(1.0 / 19.0))
    wh = W.partitionBy("arm").orderBy("d")
    hit = (
        llr.filter((F.col("g") >= hi) | (F.col("g") <= lo))
        .withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") == 1)
        .select(
            "arm",
            F.col("d").alias("hd"),
            F.col("cn").alias("hcn"),
            F.col("g").alias("hg"),
        )
    )
    wl = W.partitionBy("arm").orderBy(F.col("d").desc())
    last = (
        llr.withColumn("rl", F.row_number().over(wl))
        .filter(F.col("rl") == 1)
        .select("arm", F.col("cn").alias("mcn"), F.col("g").alias("mg"))
    )
    arms = llr.select("arm").distinct()
    return (
        arms.join(hit, "arm", "left")
        .join(last, "arm", "left")
        .select(
            "arm",
            F.when(F.col("hg").isNull(), F.lit("continue"))
            .when(F.col("hg") >= hi, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
            F.coalesce(F.col("hd").cast("string"), F.lit("")).alias(
                "decision_day"
            ),
            F.coalesce(F.col("hcn"), F.col("mcn")).alias("n_obs"),
            dround(F.coalesce(F.col("hg"), F.col("mg")), 6).alias("llr"),
        )
        .orderBy("arm")
    )


@query(
    "l_eval_mcnemar",
    oracle="""
    WITH p AS (
        SELECT CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END AS pa,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pb,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ), m AS (
        SELECT CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM p
    )
    SELECT n, b, c,
           ROUND(CAST((b - c) * (b - c) AS DOUBLE)
                 / CAST(NULLIF(b + c, 0) AS DOUBLE) * 1e6) / 1e6 + 0
               AS chi2
    FROM m
    """,
)
def l_eval_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S PAIRED TEST (1947; public method) between two cheap
    english-detector proxies (contains ' the ' vs n_chars ≥ 300)
    scored on the SAME documents against the lang label: the
    discordant-pair counts b (A right, B wrong) and c (A wrong, B
    right) and χ² = (b−c)²/(b+c). This is THE test for "is model A
    actually better than model B on this eval set" — paired, so it
    ignores the items both get right/wrong and is far more sensitive
    than comparing two accuracies (complements l_eval_slice_accuracy).

    Determinism: b, c are exact BIGINT conditional sums in one pass;
    χ² is a single integer-ratio division (NULLIF guards b+c=0 — the
    cv_folds lesson applied at birth), quantized once with '+ 0'.

    Scale: one scan, one 1-row conditional aggregate — scan speed at
    any corpus size."""
    d = table(spark, sf_dir, "documents")
    pa = F.when(F.col("text").like("% the %"), 1).otherwise(0)
    pb = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    y = F.when(F.col("lang") == "en", 1).otherwise(0)
    m = d.select(pa.alias("pa"), pb.alias("pb"), y.alias("y")).agg(
        F.sum(
            F.when((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y")), 1)
            .otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y")), 1)
            .otherwise(0)
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    bc = F.col("b") + F.col("c")
    chi2 = ((F.col("b") - F.col("c")) * (F.col("b") - F.col("c"))).cast(
        "double"
    ) / F.when(bc == 0, F.lit(None)).otherwise(bc).cast("double")
    return m.select("n", "b", "c", dround(chi2, 6).alias("chi2"))


@query(
    "l_eval_auc",
    oracle="""
    WITH f AS (
        SELECT n_chars AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ), cnt AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(y) AS BIGINT) AS p
        FROM f GROUP BY v
    ), r2 AS (
        SELECT v, c, p,
               2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS r2
        FROM cnt
    ), m AS (
        SELECT SUM(CAST(p AS HUGEINT) * r2) AS s2p,
               SUM(CAST(p AS HUGEINT)) AS pp,
               SUM(CAST(c AS HUGEINT)) AS nn
        FROM r2
    )
    SELECT CAST(nn AS BIGINT) AS n, CAST(pp AS BIGINT) AS n_pos,
           ROUND(CAST(s2p - pp * (pp + 1) AS DOUBLE)
                 / CAST(NULLIF(2 * pp * (nn - pp), 0) AS DOUBLE)
                 * 1e9) / 1e9 + 0
               AS auc
    FROM m
    """,
)
def l_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of a score column (n_chars) against a binary label
    (lang = 'en') via the exact rank-sum identity AUC = (R⁺ − P(P+1)/2)
    / (P·N⁻) with AVERAGE ranks for ties (Mann-Whitney U / Wilcoxon;
    public method) — the threshold-free discrimination metric every
    quality-classifier eval reports next to accuracy and calibration
    (complements l_calibration_curve and l_eval_brier).

    Determinism: the l_eval_spearman doubled-rank machinery — average
    ranks live on the half-integer grid so 2R⁺ = Σ p_v·r2_v is an
    exact integer; moments sum in DECIMAL(38,0) Spark-side / HUGEINT
    oracle-side (exact AND order-independent — the r10 spearman ADVICE
    fix applied at birth); AUC is one integer-ratio division quantized
    at 1e-9 with '+ 0'. The denominator 2·P·N⁻ is NULLIF/when-guarded
    (r11 ADVICE): on a single-class corpus Spark's non-ANSI Divide
    returns NULL while DuckDB's IEEE float division returns inf/NaN —
    both engines must agree on NULL under fixture drift (rule 1b).

    Scale: the rank ladder runs over the VALUE-DOMAIN-grouped table
    (n_chars domain ~500 values — the m_survival_km bounded-window
    class), never per row; one (value)-keyed agg + one 1-row fold.
    Scan speed at 100 TB."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    f = d.select(
        F.col("n_chars").alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    cnt = f.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("p")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    r2 = cnt.select(
        "c",
        "p",
        (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1).alias("r2"),
    )
    dec = "decimal(38,0)"
    m = r2.agg(
        F.sum(F.col("p").cast(dec) * F.col("r2").cast(dec)).alias("s2p"),
        F.sum(F.col("p").cast(dec)).alias("pp"),
        F.sum(F.col("c").cast(dec)).alias("nn"),
    )
    denom = 2 * F.col("pp") * (F.col("nn") - F.col("pp"))
    return m.select(
        F.col("nn").cast("bigint").alias("n"),
        F.col("pp").cast("bigint").alias("n_pos"),
        dround(
            (F.col("s2p") - F.col("pp") * (F.col("pp") + 1)).cast("double")
            / F.when(denom == 0, F.lit(None)).otherwise(denom).cast("double"),
            9,
        ).alias("auc"),
    )


@query(
    "l_eval_mrr",
    oracle="""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS qe, label AS ql
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT 20
    ), s AS (
        SELECT q.q_id, q.ql, e.vec_id, e.label,
               CAST(FLOOR((SELECT SUM(e.embedding[i.i]::DOUBLE
                                       * q.qe[i.i]::DOUBLE)
                           FROM (SELECT unnest(generate_series(1, 64))
                                 AS i) i) * 1e6 + 0.5) AS BIGINT) AS sq
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id
    ), best AS (
        SELECT q_id, MAX(struct_pack(sq := sq, vid := -vec_id)) AS b
        FROM s WHERE label = ql GROUP BY q_id
    ), rnk AS (
        SELECT s.q_id,
               CAST(1 + SUM(CASE WHEN struct_pack(sq := s.sq,
                                                  vid := -s.vec_id)
                                      > best.b
                                 THEN 1 ELSE 0 END) AS BIGINT)
                   AS first_rank
        FROM s JOIN best ON best.q_id = s.q_id
        GROUP BY s.q_id
    )
    SELECT q_id, first_rank,
           ROUND(1.0 / CAST(first_rank AS DOUBLE) * 1e9) / 1e9 + 0
               AS reciprocal_rank
    FROM rnk ORDER BY q_id
    """,
)
def l_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRIEVAL MRR — for 20 deterministic md5-sampled query vectors
    (the l_sim_search_ivf sampling convention), the rank of the FIRST
    same-label neighbor under dot-product retrieval and its reciprocal
    rank (per query; the mean is one trivial reduction away and
    per-query rows are what an eval harness actually stores). Label =
    relevance is the standard proxy-eval when no click data exists.

    Determinism: similarities quantize to the 1e6 half-up grid BEFORE
    ranking; the rank is NOT a window sort — it is 1 + |{candidates
    strictly better than the best relevant candidate}| under the
    total order (sim, -vec_id), computed as one conditional aggregate
    against a per-query max (both engines compare identical
    (BIGINT, BIGINT) struct keys). Integer ranks, one division per
    query, 1e-9 quantized.

    Scale: the 20-query table broadcasts; sims are one map-side pass
    over q×corpus; best-relevant and the rank count are two q_id-keyed
    partial aggs — NO per-query window sort of the corpus (the
    TakeOrdered/agg shape, not the rank-window shape). At 100 TB this
    is 20 broadcast dot-product scans fused into one."""
    e = table(spark, sf_dir, "embeddings")
    from sqlengine_spark.functions import vdot

    q = (
        e.select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qe"),
            F.col("label").alias("ql"),
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h", "q_id")
        .limit(20)
        .drop("h")
    )
    s = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "ql",
            "vec_id",
            "label",
            F.floor(vdot(F.col("embedding"), F.col("qe")) * 1e6 + 0.5)
            .cast("bigint")
            .alias("sq"),
        )
        .localCheckpoint()  # rule 11a: feeds best-relevant AND the count
    )
    key = F.struct(F.col("sq").alias("sq"), (-F.col("vec_id")).alias("vid"))
    best = (
        s.filter(F.col("label") == F.col("ql"))
        .groupBy("q_id")
        .agg(F.max(key).alias("b"))
    )
    rnk = (
        s.join(best, "q_id")
        .groupBy("q_id")
        .agg(
            (
                1
                + F.sum(F.when(key > F.col("b"), 1).otherwise(0))
            ).cast("bigint").alias("first_rank")
        )
    )
    return rnk.select(
        "q_id",
        "first_rank",
        dround(F.lit(1.0) / F.col("first_rank").cast("double"), 9).alias(
            "reciprocal_rank"
        ),
    ).orderBy("q_id")


@query(
    "l_rl_best_of_n",
    oracle="""
    WITH r AS (
        SELECT user_id,
               CAST(CAST(trunc(value * 100) AS BIGINT) AS BIGINT) AS rc,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(trunc(value * 100) AS BIGINT),
                                           event_id) AS rk,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM events
    ), t AS (
        SELECT user_id, n, rc, rk,
               CAST(FLOOR(
                 (CAST(rk - 1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(rk - 2 AS DOUBLE) / CAST(n - 1 AS DOUBLE))
                 * (CAST(rk - 3 AS DOUBLE) / CAST(n - 2 AS DOUBLE))
                 * (CAST(rk - 4 AS DOUBLE) / CAST(n - 3 AS DOUBLE))
                 * (5.0 / CAST(n - 4 AS DOUBLE))
                 * CAST(rc AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS term
        FROM r WHERE n >= 5 AND rk >= 5
    )
    SELECT user_id, MAX(n) AS n,
           ROUND(CAST(SUM(term) AS DOUBLE) / 1e9 / 1e2 * 1e6) / 1e6 + 0
               AS bon5
    FROM t GROUP BY user_id ORDER BY user_id
    """,
)
def l_rl_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBIASED BEST-OF-N REWARD ESTIMATE — E[max reward of k=5
    attempts sampled without replacement from the user's n attempts]
    (the BoN curve of WebGPT app. F / Nakano et al. 2021; the max-
    order-statistic sibling of l_eval_pass_at_k; public method):
    BoN₅ = Σ_r C(r−1, 4)/C(n, 5) · reward₍ᵣ₎ over attempts sorted
    ascending, evaluated in the overflow-free product form
    (r−1)/n · (r−2)/(n−1) · (r−3)/(n−2) · (r−4)/(n−3) · 5/(n−4) — the
    probability attempt rank r is the sample max.

    Determinism: rewards quantize to exact integer cents (rule 6);
    the per-attempt rank is a total order (reward cents, event_id);
    each term is a fixed-shape double product from exact integers,
    quantized to a 1e9 fixed-point BIGINT BEFORE the per-user sum —
    exact integer sums, immune to order in both engines (the
    l_eval_ndcg grid pattern). One division at the end.

    Scale: one user-partitioned rank window (group-bounded, the
    rl_group_advantage class) + one user-keyed partial agg. Group
    state is a rank counter; nothing corpus-global."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    r = ev.select(
        "user_id",
        "event_id",
        (F.col("value") * 100).cast("bigint").alias("rc"),
    )
    wr = W.partitionBy("user_id").orderBy("rc", "event_id")
    wn = W.partitionBy("user_id")
    t = (
        r.select(
            "user_id",
            "rc",
            F.row_number().over(wr).alias("rk"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter((F.col("n") >= 5) & (F.col("rk") >= 5))
    )
    rk, n = F.col("rk").cast("double"), F.col("n").cast("double")
    # parenthesized QUOTIENT products, mirroring the oracle exactly —
    # the bare chain a/b*c/d associates as ((a/b)*c)/d and diverges
    # from the oracle's (a/b)*(c/d) in the last ulp, which the 1e9
    # term grid then amplifies into ±1-integer cross-engine drift
    # (r11 code review, reproduced on 4/234,630 sampled triples)
    prob = (
        ((rk - 1) / n)
        * ((rk - 2) / (n - 1))
        * ((rk - 3) / (n - 2))
        * ((rk - 4) / (n - 3))
        * (F.lit(5.0) / (n - 4))
    )
    term = F.floor(prob * F.col("rc").cast("double") * 1e9 + 0.5).cast(
        "bigint"
    )
    a = t.select("user_id", F.col("n").alias("nn"), term.alias("term")).groupBy(
        "user_id"
    ).agg(F.max("nn").alias("n"), F.sum("term").alias("s"))
    return a.select(
        "user_id",
        "n",
        dround(F.col("s").cast("double") / 1e9 / 1e2, 6).alias("bon5"),
    ).orderBy("user_id")


@query(
    "l_ngram_coverage_curve",
    oracle="""
    WITH c AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        GROUP BY t
    ), r AS MATERIALIZED (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rn FROM c
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_vocab
        FROM c
    ), ks AS (
        SELECT unnest([10, 100, 1000]) AS k
    )
    SELECT ks.k AS k,
           CAST(COALESCE((SELECT SUM(r.c) FROM r WHERE r.rn <= ks.k), 0)
                AS BIGINT) AS covered,
           tot.total, tot.n_vocab,
           ROUND(CAST(COALESCE((SELECT SUM(r.c) FROM r WHERE r.rn <= ks.k),
                               0) AS DOUBLE)
                 / CAST(tot.total AS DOUBLE) * 1e9) / 1e9 + 0 AS coverage
    FROM ks CROSS JOIN tot
    ORDER BY ks.k
    """,
)
def l_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY COVERAGE CURVE — what fraction of all token
    OCCURRENCES the top-k most frequent types cover, at k = 10, 100,
    1000 (the table a tokenizer-budget decision reads: where the
    Zipf mass saturates; complements l_tokens_zipf_fit's slope with
    the operational cumulative view).

    Determinism: counts are exact BIGINTs; top-k membership uses the
    total order (count desc, token asc); coverage is one int-ratio
    division on the 1e9 grid with '+ 0'.

    Scale: NO global window — each k's covered mass is a TakeOrdered
    top-k over the vocab-sized count table followed by a 1-row sum
    (three tiny jobs), so nothing sorts the vocabulary on one reducer;
    the token count itself is one partial+final hash agg over the
    corpus. The oracle states the same truth via DuckDB's ordered-
    LIMIT rowid subquery."""
    d = table(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # rule 11a: 3 TakeOrdered heads + the total
    )
    tot = c.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_vocab")
    )
    rows = None
    for k in (10, 100, 1000):
        topk = (
            c.orderBy(F.col("c").desc(), "t")
            .limit(k)
            .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("covered"))
            .select(F.lit(k).alias("k"), "covered")
        )
        rows = topk if rows is None else rows.unionAll(topk)
    return (
        rows.crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.col("covered").cast("bigint").alias("covered"),
            "total",
            "n_vocab",
            dround(
                F.col("covered").cast("double") / F.col("total").cast("double"),
                9,
            ).alias("coverage"),
        )
        .orderBy("k")
    )


@query(
    "l_dedup_rate_report",
    oracle="""
    WITH g AS (
        SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS s
        FROM documents GROUP BY md5(text)
    ), b AS (
        SELECT CASE WHEN s >= 10 THEN 10 ELSE s END AS size_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(s) AS BIGINT) AS n_docs
        FROM g GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS corpus FROM b
    )
    SELECT b.size_bucket, b.n_clusters, b.n_docs,
           b.n_docs - b.n_clusters AS n_removable,
           ROUND(CAST(b.n_docs - b.n_clusters AS DOUBLE)
                 / CAST(tot.corpus AS DOUBLE) * 1e9) / 1e9 + 0
               AS removable_share
    FROM b CROSS JOIN tot
    ORDER BY b.size_bucket
    """,
)
def l_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-DEDUP RATE REPORT — the summary table a dedup run
    publishes before anyone deletes anything: duplicate-cluster-size
    histogram (bucket 10 = "10+"), docs and removable copies per
    bucket, and each bucket's share of the corpus that dedup would
    delete. Reads the same md5 content-hash grouping as l_dedup_exact
    and rolls it up (pipeline composition: detect → report → act).

    Determinism: every column is an exact BIGINT except the one
    int-ratio share on the 1e9 grid with '+ 0'.

    Scale: the md5 groupBy is THE 100 TB exact-dedup shuffle
    (partial+final); the histogram rollup runs on the cluster-size
    table (bounded by distinct contents); the corpus total broadcasts
    as one row."""
    d = table(spark, sf_dir, "documents")
    g = (
        d.select(F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    b = g.select(
        F.when(F.col("s") >= 10, 10).otherwise(F.col("s")).alias(
            "size_bucket"
        ),
        "s",
    ).groupBy("size_bucket").agg(
        F.count(F.lit(1)).alias("n_clusters"), F.sum("s").alias("n_docs")
    )
    tot = b.agg(F.sum("n_docs").alias("corpus"))
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            F.col("size_bucket").cast("bigint").alias("size_bucket"),
            "n_clusters",
            "n_docs",
            (F.col("n_docs") - F.col("n_clusters")).alias("n_removable"),
            dround(
                (F.col("n_docs") - F.col("n_clusters")).cast("double")
                / F.col("corpus").cast("double"),
                9,
            ).alias("removable_share"),
        )
        .orderBy("size_bucket")
    )


@query(
    "l_mix_temperature",
    oracle="""
    WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    ), t AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total FROM c
    ), p AS (
        SELECT c.lang, c.n,
               CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS p,
               CAST(FLOOR(pow(CAST(c.n AS DOUBLE)
                              / CAST(t.total AS DOUBLE), 0.7) * 1e15 + 0.5)
                    AS BIGINT) AS w7q,
               CAST(FLOOR(pow(CAST(c.n AS DOUBLE)
                              / CAST(t.total AS DOUBLE), 0.5) * 1e15 + 0.5)
                    AS BIGINT) AS w5q
        FROM c CROSS JOIN t
    ), z AS (
        SELECT CAST(SUM(w7q) AS BIGINT) AS z7,
               CAST(SUM(w5q) AS BIGINT) AS z5
        FROM p
    )
    SELECT p.lang, p.n,
           ROUND(p.p * 1e9) / 1e9 + 0 AS p_raw,
           ROUND(CAST(p.w7q AS DOUBLE) / CAST(z.z7 AS DOUBLE) * 1e9) / 1e9
               + 0 AS q_alpha07,
           ROUND(CAST(p.w5q AS DOUBLE) / CAST(z.z5 AS DOUBLE) * 1e9) / 1e9
               + 0 AS q_alpha05,
           ROUND(CAST(p.w7q AS DOUBLE) / CAST(z.z7 AS DOUBLE) / p.p * 1e6)
               / 1e6 + 0 AS epochs_alpha07
    FROM p CROSS JOIN z
    ORDER BY p.lang
    """,
)
def l_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-BASED MULTILINGUAL SAMPLING WEIGHTS (the
    mBERT/XLM-R exponential-smoothing recipe, Devlin 2019 / Conneau
    2020; public method): per language, the raw corpus share p, the
    resampling share q ∝ p^α at α = 0.7 and 0.5, and the implied
    effective-epoch multiplier q/p at α = 0.7 — the table that decides
    how hard low-resource languages are upsampled. Complements
    l_domain_mix (which APPLIES fixed rates) by COMPUTING the rates.

    Determinism: counts are exact BIGINTs; p and the pow() terms are
    fixed-shape per-row doubles (same libm pow both engines — the
    dsir ln precedent); each weight quantizes to a 1e15 fixed-point
    BIGINT BEFORE the normalizer sum (r11 code review — a raw double
    sum would be order-sensitive in both engines; the rule-11e
    pattern), so z7/z5 are exact integers and every output is a
    fixed-shape double expression over exact operands, rounded once
    with '+ 0'.

    Scale: one lang-keyed partial+final count agg; everything after
    runs on the |langs|-row table."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    p = c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n",
        (F.col("n").cast("double") / F.col("total").cast("double")).alias(
            "p"
        ),
    )
    p = p.select(
        "lang",
        "n",
        "p",
        F.floor(F.pow(F.col("p"), F.lit(0.7)) * 1e15 + 0.5)
        .cast("bigint")
        .alias("w7q"),
        F.floor(F.pow(F.col("p"), F.lit(0.5)) * 1e15 + 0.5)
        .cast("bigint")
        .alias("w5q"),
    )
    z = p.agg(F.sum("w7q").alias("z7"), F.sum("w5q").alias("z5"))
    q7 = F.col("w7q").cast("double") / F.col("z7").cast("double")
    q5 = F.col("w5q").cast("double") / F.col("z5").cast("double")
    return (
        p.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n",
            dround(F.col("p"), 9).alias("p_raw"),
            dround(q7, 9).alias("q_alpha07"),
            dround(q5, 9).alias("q_alpha05"),
            dround(q7 / F.col("p"), 6).alias("epochs_alpha07"),
        )
        .orderBy("lang")
    )


@query(
    "l_eval_fleiss_kappa",
    oracle="""
    WITH r AS (
        SELECT (CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END
                + CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
                + CASE WHEN text LIKE '% and %' THEN 1 ELSE 0 END)
                   AS n_pos
        FROM documents
    ), a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(n_pos) AS BIGINT) AS s_pos,
               CAST(SUM(n_pos * n_pos + (3 - n_pos) * (3 - n_pos))
                    AS BIGINT) AS s_sq
        FROM r
    )
    SELECT n_items,
           ROUND(CAST(s_pos AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE))
                 * 1e9) / 1e9 + 0 AS p_pos,
           ROUND(CAST(s_sq - 3 * n_items AS DOUBLE)
                 / (6.0 * CAST(n_items AS DOUBLE)) * 1e9) / 1e9 + 0
               AS p_bar,
           ROUND((CAST(s_sq - 3 * n_items AS DOUBLE)
                      / (6.0 * CAST(n_items AS DOUBLE))
                  - (pow(CAST(s_pos AS DOUBLE)
                         / (3.0 * CAST(n_items AS DOUBLE)), 2)
                     + pow(1.0 - CAST(s_pos AS DOUBLE)
                           / (3.0 * CAST(n_items AS DOUBLE)), 2)))
                 / (1.0 - (pow(CAST(s_pos AS DOUBLE)
                               / (3.0 * CAST(n_items AS DOUBLE)), 2)
                           + pow(1.0 - CAST(s_pos AS DOUBLE)
                                 / (3.0 * CAST(n_items AS DOUBLE)), 2)))
                 * 1e9) / 1e9 + 0 AS fleiss_kappa
    FROM a
    """,
)
def l_eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLEISS' KAPPA (1971; public method) for THREE judges over a
    binary category — the multi-rater generalization of Cohen's κ
    (d_agg_chi2 / l_eval_cohen territory covers two raters): three
    cheap english-detector proxies (contains ' the ', n_chars ≥ 300,
    contains ' and ') rate every document; κ = (P̄ − P_e)/(1 − P_e)
    with per-item agreement P_i = (Σ n_c² − n)/(n(n−1)), n = 3. This
    is the agreement audit an LLM-judge ensemble publishes before its
    votes are trusted as labels.

    Determinism: per-item rating counts are exact integers; the two
    corpus moments (Σ n_pos, Σ Σn_c²) are exact BIGINT sums; P̄, P_e,
    and κ are one fixed-shape double expression over them (pow(x,2)
    the same libm both engines), each output quantized once at 1e-9
    with '+ 0'.

    Scale: one scan, one 1-row aggregate — scan speed at any corpus
    size; generalizing to r raters/k categories keeps the same two-
    moment shape (Σ n_c² folds per item map-side)."""
    d = table(spark, sf_dir, "documents")
    n_pos = (
        F.when(F.col("text").like("% the %"), 1).otherwise(0)
        + F.when(F.col("n_chars") >= 300, 1).otherwise(0)
        + F.when(F.col("text").like("% and %"), 1).otherwise(0)
    )
    a = d.select(n_pos.alias("n_pos")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_pos").alias("s_pos"),
        F.sum(
            F.col("n_pos") * F.col("n_pos")
            + (3 - F.col("n_pos")) * (3 - F.col("n_pos"))
        ).alias("s_sq"),
    )
    ni = F.col("n_items").cast("double")
    p_pos = F.col("s_pos").cast("double") / (F.lit(3.0) * ni)
    p_bar = (F.col("s_sq") - 3 * F.col("n_items")).cast("double") / (
        F.lit(6.0) * ni
    )
    p_e = F.pow(p_pos, F.lit(2)) + F.pow(F.lit(1.0) - p_pos, F.lit(2))
    return a.select(
        "n_items",
        dround(p_pos, 9).alias("p_pos"),
        dround(p_bar, 9).alias("p_bar"),
        dround((p_bar - p_e) / (F.lit(1.0) - p_e), 9).alias("fleiss_kappa"),
    )


@query(
    "l_eval_ece",
    oracle="""
    WITH s AS (
        SELECT CAST((n_chars - 40) AS DOUBLE) * (n_chars - 40)
               / (CAST((n_chars - 40) AS DOUBLE) * (n_chars - 40) + 40000.0)
                   AS p,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ), b AS (
        SELECT CASE WHEN CAST(FLOOR(p * 10) AS BIGINT) >= 10 THEN 9
                    ELSE CAST(FLOOR(p * 10) AS BIGINT) END AS bin,
               CAST(FLOOR(p * 1e9 + 0.5) AS BIGINT) AS pq, y
        FROM s
    ), g AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(y) AS BIGINT) AS k_k,
               CAST(SUM(pq) AS BIGINT) AS sp_k
        FROM b GROUP BY bin
    ), t AS (
        SELECT CAST(SUM(n_k) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               SUM(ABS(CAST(k_k AS HUGEINT) * 1000000000 - sp_k)) AS wq,
               MAX(abs(CAST(k_k AS DOUBLE) / CAST(n_k AS DOUBLE)
                       - CAST(sp_k AS DOUBLE) / CAST(n_k AS DOUBLE) / 1e9))
                   AS max_gap
        FROM g
    )
    SELECT n, n_bins,
           ROUND(CAST(wq AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) * 1e9) / 1e9
               + 0 AS ece,
           ROUND(max_gap * 1e9) / 1e9 + 0 AS max_gap
    FROM t
    """,
)
def l_eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED CALIBRATION ERROR (Naeini et al. 2015; public method)
    of the same frozen rational-squash scorer l_calibration_curve
    audits (p = z²/(z²+c), z = n_chars−40 — rational so decile
    membership is IEEE-exact in both engines, the calibration_curve
    determinism note): ECE = Σ_k n_k/N · |acc_k − conf_k| over p's
    deciles, plus the worst-bin gap — the single calibration number a
    model card reports next to the reliability diagram.

    Determinism: per-row p quantizes to a 1e9 fixed-point BIGINT
    before the per-bin confidence sums (rule 11e — a raw double sum
    would be order-sensitive); acc_k comes from exact counts; and the
    weighted fold itself is EXACT integer arithmetic (r11 ADVICE):
    n_k·|acc_k − conf_k| = |k_k·1e9 − sp_k|/1e9 algebraically, so
    w_gap sums |k_k·1e9 − sp_k| in DECIMAL(38,0)/HUGEINT — zero
    double reassociation anywhere in ece (the rule-9/11e class is
    eliminated, not just bounded). max_gap stays a double max (maxima
    are order-independent).

    Scale: one scan, one 10-ary groupBy (partial+final), one 1-row
    fold. Scan speed at any corpus size."""
    d = table(spark, sf_dir, "documents")
    z = (F.col("n_chars") - 40).cast("double") * (F.col("n_chars") - 40)
    p = z / (z + F.lit(40000.0))
    s = d.select(
        p.alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    bin_ = F.when(F.floor(F.col("p") * 10).cast("bigint") >= 10, 9).otherwise(
        F.floor(F.col("p") * 10).cast("bigint")
    )
    b = s.select(
        bin_.alias("bin"),
        F.floor(F.col("p") * 1e9 + 0.5).cast("bigint").alias("pq"),
        "y",
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("y").alias("k_k"),
        F.sum("pq").alias("sp_k"),
    )
    gap = F.abs(
        F.col("k_k").cast("double") / F.col("n_k").cast("double")
        - F.col("sp_k").cast("double") / F.col("n_k").cast("double") / 1e9
    )
    dec = "decimal(38,0)"
    t = g.agg(
        F.sum("n_k").alias("n"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(
            F.abs(
                F.col("k_k").cast(dec) * F.lit(1000000000).cast(dec)
                - F.col("sp_k").cast(dec)
            )
        ).alias("wq"),
        F.max(gap).alias("max_gap"),
    )
    return t.select(
        "n",
        "n_bins",
        dround(
            F.col("wq").cast("double") / 1e9 / F.col("n").cast("double"), 9
        ).alias("ece"),
        dround(F.col("max_gap"), 9).alias("max_gap"),
    )

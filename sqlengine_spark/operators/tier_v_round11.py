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
from sqlengine_spark.session import table


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
    d = table(spark, sf_dir, "documents")
    # zip_with over two ONCE-PER-ROW slices — an index lambda that
    # re-references split(text)[i] re-evaluates the full split PER
    # ELEMENT (measured: 32 s vs 2.4 s at x100, O(L²) per doc — the
    # rule-12a cousin inside HOF lambdas)
    grams = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN"
                " zip_with(slice(split(text, ' '), 1,"
                "                size(split(text, ' ')) - 1),"
                "          slice(split(text, ' '), 2,"
                "                size(split(text, ' ')) - 1),"
                "          (x, y) -> struct(x AS w1, y AS w2))"
                " ELSE CAST(array() AS ARRAY<STRUCT<w1:STRING, w2:STRING>>)"
                " END"
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
    = L/48, bounded by doc length), no aggregation, no join; exactly
    the shape that streams 100 TB through 1000 executors at scan
    speed. Chunk-level dedup/embedding joins downstream key on
    chunk_md5, which shards uniformly. The WHOLE chunk row (offsets +
    md5) is computed INSIDE one generator expression — projecting the
    token array alongside the explode would re-run split() per chunk
    row (rule 12a)."""
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

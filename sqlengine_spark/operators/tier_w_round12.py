"""Round-12 additions (queued BEHIND the r12 window; these keys earn
their driver rows in round 13): deterministic weighted reservoir
sampling, rank-agreement eval (Kendall tau-b, RBO), LLM-serving
prefix-cache analysis, readability scoring, and margin-based bitext
mining — operators a training-data/eval pipeline runs that nothing in
the registry covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlengine_spark.functions import dround
from sqlengine_spark.registry import query
from sqlengine_spark.session import table

# ---------------------------------------------------------------------------
# l_sample_weighted_topk — Efraimidis-Spirakis A-ES weighted reservoir
# ---------------------------------------------------------------------------

_AES_K = 40


@query(
    "l_sample_weighted_topk",
    oracle=f"""
    WITH s AS (
        SELECT lang, doc_id, n_chars,
               CAST(FLOOR(
                 ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                    1, 8)) AS BIGINT) + 0.5) / 4294967296.0)
                 / CAST(GREATEST(n_chars, 1) AS DOUBLE) * 1e12)
               AS BIGINT) AS kq
        FROM documents
    ), r AS (
        SELECT lang, doc_id, n_chars, kq,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY kq DESC, doc_id) AS rk
        FROM s
    )
    SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars, kq
    FROM r WHERE rk <= {_AES_K}
    ORDER BY lang, rk
    """,
)
def l_sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED SAMPLING WITHOUT REPLACEMENT, exact-k per stratum — the
    Efraimidis-Spirakis A-ES reservoir (2006, "Weighted random sampling
    with a reservoir"; public method): each doc draws key u^(1/w) from
    a uniform u and weight w (here n_chars, a quality-mass proxy); the
    top-k keys per language ARE a weight-proportional sample without
    replacement. This is THE quality-weighted corpus subsampling
    primitive (i_sample_weighted is its Bernoulli cousin: probabilistic
    KEEP per row, no exact-k guarantee; this gives exactly k per
    stratum). Deterministic twin: u comes from md5(doc_id) bits, so the
    drawn sample is identical across engines, re-runs, and resharding.

    Determinism: u = (first-32-md5-bits + 0.5) / 2^32 — exact dyadic
    rational, strictly in (0,1) so ln never sees 0; ranking key is
    ln(u)/w (monotone in u^(1/w)) quantized to a 1e12 BIGINT grid
    before ranking (rule 5: the (kq DESC, doc_id) order is total; ln is
    the same libm call in both engines — the l_dsir_weight precedent,
    and division of identical doubles is IEEE-exact in both).

    Scale: key is a map-side codegen expression (md5 + ln, no UDF); the
    per-lang top-k is ONE rank window whose constant filter (40 <= the
    1000 default) triggers InferWindowGroupLimit — per-partition top-40
    heaps BEFORE the lang shuffle, so shuffle volume is
    |langs| x 40 x partitions, not the corpus (pin 13a). No joins, no
    broadcast, nothing corpus-global."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    kq = F.floor(
        F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double") * 1e12
    ).cast("bigint")
    s = d.select("lang", "doc_id", "n_chars", kq.alias("kq"))
    w = W.partitionBy("lang").orderBy(F.col("kq").desc(), "doc_id")
    return (
        s.select("lang", F.row_number().over(w).alias("rk"), "doc_id",
                 "n_chars", "kq")
        .filter(F.col("rk") <= _AES_K)
        .select("lang", F.col("rk").cast("bigint").alias("rk"), "doc_id",
                "n_chars", "kq")
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# l_eval_kendall_tau — tau-b rank agreement on a bounded decile grid
# ---------------------------------------------------------------------------


@query(
    "l_eval_kendall_tau",
    oracle="""
    WITH s AS (
        SELECT LEAST(n_chars // 60, 9) AS da,
               LEAST(len(string_split(text, ' ')) // 11, 9) AS db
        FROM documents
    ), cells AS (
        SELECT da, db, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY da, db
    ), cd AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN b.db > a.db
                                      THEN a.n * b.n END), 0) AS BIGINT) AS nc,
               CAST(COALESCE(SUM(CASE WHEN b.db < a.db
                                      THEN a.n * b.n END), 0) AS BIGINT) AS nd
        FROM cells a JOIN cells b ON b.da > a.da
    ), tx AS (
        SELECT CAST(SUM(m * (m - 1) / 2) AS BIGINT) AS tie_x
        FROM (SELECT SUM(n) AS m FROM cells GROUP BY da)
    ), ty AS (
        SELECT CAST(SUM(m * (m - 1) / 2) AS BIGINT) AS tie_y
        FROM (SELECT SUM(n) AS m FROM cells GROUP BY db)
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells
    )
    SELECT tot.n, cd.nc, cd.nd,
           ROUND(CAST(cd.nc - cd.nd AS DOUBLE)
                 / NULLIF(sqrt(CAST(tot.n * (tot.n - 1) / 2 - tx.tie_x
                                    AS DOUBLE)
                               * CAST(tot.n * (tot.n - 1) / 2 - ty.tie_y
                                      AS DOUBLE)), 0.0)
                 * 1e9) / 1e9 + 0 AS tau_b
    FROM tot, cd, tx, ty
    """,
)
def l_eval_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL tau-b rank agreement between two quality proxies —
    length decile (n_chars) vs verbosity decile (word count) — the
    LENGTH-BIAS AUDIT every LLM-judge eval runs: if a reward proxy's
    ranking is mostly explained by length, tau-b against the length
    decile says so in one number (Kendall 1945 tie-corrected tau-b;
    public method). Complements l_eval_spearman (value-rank rho) with
    the concordant/discordant-pair view that is robust to monotone
    transforms of either score.

    Determinism: both deciles are exact integer grids (fixed-width
    DIV buckets, NOT ntile — identical cell membership in both
    engines); concordant/discordant counts are exact BIGINT products
    over the <=100-cell contingency table; ties come from marginals;
    the one sqrt is IEEE correctly-rounded in both engines on exact
    integer-valued doubles, then one division, dround 1e-9 with the
    NULLIF degenerate-grid guard (the l_eval_auc lesson).

    Scale: ONE corpus scan -> 10x10 hash agg (partial+final); all
    pair arithmetic runs on the bounded 100-row cell table (<=4,950
    cell pairs — a bounded nested-loop join, the c_join_cross class,
    never a row-level pair join). Scan speed at any corpus size."""
    d = table(spark, sf_dir, "documents")
    # integer DIV semantics: Spark `/` on ints is double division — use
    # floor-div explicitly to mirror DuckDB's `//`
    s = d.select(
        F.least(F.expr("n_chars DIV 60"), F.lit(9)).cast("bigint").alias("da"),
        F.least(
            F.expr("size(split(text, ' ')) DIV 11"), F.lit(9)
        ).cast("bigint").alias("db"),
    )
    cells = s.groupBy("da", "db").agg(F.count(F.lit(1)).alias("n"))
    a = cells.toDF("da", "db", "n")
    b = cells.toDF("da2", "db2", "n2")
    cd = (
        a.join(b, F.col("da2") > F.col("da"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("db2") > F.col("db"), F.col("n") * F.col("n2"))
                ),
                F.lit(0),
            ).alias("nc"),
            F.coalesce(
                F.sum(
                    F.when(F.col("db2") < F.col("db"), F.col("n") * F.col("n2"))
                ),
                F.lit(0),
            ).alias("nd"),
        )
    )
    tx = (
        cells.groupBy("da").agg(F.sum("n").alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).cast("bigint")
             .alias("tie_x"))
    )
    ty = (
        cells.groupBy("db").agg(F.sum("n").alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).cast("bigint")
             .alias("tie_y"))
    )
    tot = cells.agg(F.sum("n").alias("n"))
    n = F.col("n")
    n0 = (n * (n - 1) / 2).cast("bigint")
    denom = F.sqrt(
        (n0 - F.col("tie_x")).cast("double") * (n0 - F.col("tie_y")).cast("double")
    )
    return (
        tot.crossJoin(F.broadcast(cd))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "n",
            "nc",
            "nd",
            dround(
                (F.col("nc") - F.col("nd")).cast("double")
                / F.when(denom == 0.0, F.lit(None)).otherwise(denom),
                9,
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# l_eval_rbo — rank-biased overlap of two top-k rankings
# ---------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_K = 50
# suffix-summed integer weight grid (the l_eval_ndcg 1e15 pattern): a
# doc first present in BOTH prefixes at depth m contributes
# sum_{d>=m} (1-p) p^(d-1)/d — precomputed ONCE in Python and embedded
# as the same literals in both engines, so no transcendental is ever
# evaluated inside either engine.
_RBO_SUF = [
    sum(
        int((1 - _RBO_P) * _RBO_P ** (d - 1) / d * 1e15)
        for d in range(m, _RBO_K + 1)
    )
    for m in range(1, _RBO_K + 1)
]


@query(
    "l_eval_rbo",
    oracle=f"""
    WITH a AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
                   AS ra
        FROM documents ORDER BY n_chars DESC, doc_id LIMIT {_RBO_K}
    ), b AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY len(string_split(text, ' ')) DESC,
                                  doc_id) AS rb
        FROM documents
        ORDER BY len(string_split(text, ' ')) DESC, doc_id LIMIT {_RBO_K}
    ), m AS (
        SELECT GREATEST(a.ra, b.rb) AS m
        FROM a JOIN b ON a.doc_id = b.doc_id
    )
    SELECT CAST({_RBO_K} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           ROUND(CAST(COALESCE(SUM(({_RBO_SUF})[m]), 0) AS DOUBLE) / 1e15
                 * 1e9) / 1e9 + 0 AS rbo
    FROM m
    """,
)
def l_eval_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-BIASED OVERLAP (Webber, Moffat & Zobel 2010, "A similarity
    measure for indefinite rankings"; public method) between the top-50
    documents under two quality proxies (chars-desc vs words-desc) —
    the top-weighted ranking-agreement number for comparing two
    retrieval systems / two reward models where only the head of the
    ranking matters. Truncated-sum variant (depth k, no residual
    extrapolation — the standard reported RBO@k), p = 0.9.

    Determinism: RBO@k = sum_d (1-p) p^(d-1) X_d / d where X_d is the
    prefix-overlap count; reordered per doc as suffix weights
    sum_{{d >= max(ra, rb)}} — the per-doc weight is a PRECOMPUTED
    integer literal (1e15 grid, the l_eval_ndcg pattern) indexed by
    max-rank, so the whole metric is an exact BIGINT sum in both
    engines; both rankings are total orders (tiebreak doc_id, rule 5).

    Scale: two TakeOrdered(50) heads (per-partition heaps, no global
    sort — the l_ngram_coverage_curve pattern), a 50x50 equi-join on
    doc_id between two LIMIT-bounded pools (broadcast-safe by
    construction: k is a pipeline constant), one 1-row fold. The
    corpus is scanned twice, map-side only."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    # TakeOrdered head first, THEN a rank window over the 50-row pool —
    # the global window runs on a LIMIT-bounded frame, never the corpus
    a = (
        d.select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(_RBO_K)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.col("n_chars").desc(), "doc_id"))
            .alias("ra"),
        )
    )
    b = (
        d.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("nw"))
        .orderBy(F.col("nw").desc(), "doc_id")
        .limit(_RBO_K)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.col("nw").desc(), "doc_id"))
            .alias("rb"),
        )
    )
    suf = F.array(*[F.lit(v) for v in _RBO_SUF])
    m = a.join(b, "doc_id").select(
        F.greatest(F.col("ra"), F.col("rb")).alias("m")
    )
    return m.agg(
        F.lit(_RBO_K).cast("bigint").alias("k"),
        F.count(F.lit(1)).alias("n_common"),
        dround(
            F.coalesce(
                F.sum(F.element_at(suf, F.col("m").cast("int"))), F.lit(0)
            ).cast("double")
            / 1e15,
            9,
        ).alias("rbo"),
    )


# ---------------------------------------------------------------------------
# l_prefix_cache_blocks — vLLM-style prefix-cache block reuse audit
# ---------------------------------------------------------------------------

_PCB_BLOCK = 16  # tokens per KV-cache block
_PCB_MAXB = 8    # audit the first 8 full blocks (128 tokens)


@query(
    "l_prefix_cache_blocks",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(generate_series(1, LEAST(len(w) // {_PCB_BLOCK},
                                               {_PCB_MAXB}))) AS i,
               w
        FROM w WHERE len(w) >= {_PCB_BLOCK}
    ), k AS (
        SELECT doc_id, i - 1 AS bi,
               md5(array_to_string(w[1:{_PCB_BLOCK} * i], ' ')) AS key
        FROM g
    ), per_key AS (
        SELECT key, CAST(MAX(bi) AS BIGINT) AS bi,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM k GROUP BY key
    )
    SELECT bi AS block_idx,
           CAST(SUM(n) AS BIGINT) AS n_blocks,
           CAST(SUM(n - 1) AS BIGINT) AS n_reused,
           ROUND(CAST(SUM(n - 1) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
                 * 1e6) / 1e6 + 0 AS reuse_rate
    FROM per_key GROUP BY bi ORDER BY bi
    """,
)
def l_prefix_cache_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX-CACHE BLOCK REUSE audit — the vLLM/SGLang serving
    economics question ("how much KV cache would prefix caching save
    on this corpus?") asked of the training/eval prompt set: token
    prefixes are cut into 16-token blocks, each block keyed by the
    hash of the ENTIRE prefix up to it (the paged-attention block-hash
    convention — a block only reuses when everything before it
    matched), and a block instance is a cache HIT iff the same key
    occurred in any earlier doc (first occurrence = the one that pays
    the prefill). Output: per block position, total instances, reused
    instances, reuse rate — the curve that says how deep shared
    prefixes run (position 0 reuses most; the decay rate is the
    caching ROI).

    Determinism: keys are md5 over the literal prefix text — identical
    in both engines; a key determines its position (same prefix ⟹
    same token count), so reuse-per-position is an exact two-level
    integer aggregation with no tie-breaking anywhere.

    Scale: block keys are a map-side let-bound array expression (the
    rule-14c-safe form; ≤8 prefix hashes per doc, O(first-128-tokens)
    bytes each); ONE (key)-hash agg (partial+final — the exact-dedup
    shape) then an 8-ary rollup. No joins at all: reused = n − 1 per
    key, so the min-doc join-back the naive plan needs is algebraically
    eliminated. Shuffle volume = |distinct prefixes| rows, linear."""
    d = table(spark, sf_dir, "documents")
    keys = F.expr(
        f"element_at(transform(array(split(text, ' ')), w ->"
        f" CASE WHEN size(w) >= {_PCB_BLOCK} THEN"
        f"   transform(sequence(1, least(size(w) DIV {_PCB_BLOCK},"
        f"                               {_PCB_MAXB})),"
        f"     i -> struct(i - 1 AS bi,"
        f"                 md5(array_join(slice(w, 1, {_PCB_BLOCK} * i),"
        f"                                ' ')) AS key))"
        f" ELSE CAST(array() AS ARRAY<STRUCT<bi:INT, key:STRING>>)"
        f" END), 1)"
    )
    k = d.select(F.explode(keys).alias("b")).select("b.bi", "b.key")
    per_key = k.groupBy("key").agg(
        F.max("bi").cast("bigint").alias("bi"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_key.groupBy("bi")
        .agg(
            F.sum("n").alias("n_blocks"),
            F.sum(F.col("n") - 1).alias("n_reused"),
        )
        .select(
            F.col("bi").alias("block_idx"),
            "n_blocks",
            "n_reused",
            dround(
                F.col("n_reused").cast("double")
                / F.col("n_blocks").cast("double"),
                6,
            ).alias("reuse_rate"),
        )
        .orderBy("block_idx")
    )


# ---------------------------------------------------------------------------
# l_text_readability — Flesch reading ease over exact integer counts
# ---------------------------------------------------------------------------


@query(
    "l_text_readability",
    oracle="""
    WITH s AS (
        SELECT lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
               CAST(GREATEST(length(regexp_replace(
                     regexp_replace(text, '[.!?]+', '.', 'g'),
                     '[^.]', '', 'g')), 1) AS BIGINT) AS st,
               CAST(length(regexp_replace(
                     regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'),
                     '[^V]', '', 'g')) AS BIGINT) AS sy
        FROM documents
    ), q AS (
        SELECT lang, source, w, st, sy,
               CAST(FLOOR((CAST(206.835 AS DOUBLE)
                           - CAST(1.015 AS DOUBLE)
                             * (CAST(w AS DOUBLE) / CAST(st AS DOUBLE))
                           - CAST(84.6 AS DOUBLE)
                             * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)))
                          * 1e6 + 0.5) AS BIGINT) AS fq
        FROM s
    )
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS n_words,
           ROUND(CAST(SUM(w) AS DOUBLE) / CAST(SUM(st) AS DOUBLE)
                 * 1e6) / 1e6 + 0 AS words_per_sentence,
           ROUND(CAST(SUM(sy) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
                 * 1e6) / 1e6 + 0 AS syllables_per_word,
           ROUND(CAST(SUM(fq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
                 * 1e6) / 1e6 + 0 AS mean_flesch
    FROM q GROUP BY lang, source ORDER BY lang, source
    """,
)
def l_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH READING EASE per (lang, source) — the classic readability
    score (Flesch 1948; public method) from three exact integer counts
    per doc: words (whitespace tokens), sentences (maximal [.!?]+ runs,
    floored at 1), syllables (maximal vowel-group runs, the standard
    cheap approximation). A quality-gating pipeline reports this next
    to l_text_quality's ratio gates: too-low means OCR noise / token
    salad, too-high means boilerplate lists.

    Determinism: all three counts are exact integers from global
    regexp_replace (DuckDB side spells the 'g' flag — rule 6); the
    per-doc score is a fixed-shape double expression over exact
    integers, quantized half-up to a 1e6 BIGINT before the group mean
    (rule 11e: group sums are exact integer sums in both engines);
    the three output ratios are single divisions of exact integers,
    dround 1e-6. Constants are CAST(... AS DOUBLE) in SQL so DuckDB
    does not fold them as DECIMAL (the rule-12d literal class).

    Scale: pure map-side codegen (three regexp passes per doc) into a
    |lang x source|-ary hash agg — scan speed at any corpus size, no
    joins, no windows."""
    d = table(spark, sf_dir, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("bigint")
    st = F.greatest(
        F.length(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), "[.!?]+", "."), "[^.]", ""
            )
        ),
        F.lit(1),
    ).cast("bigint")
    sy = F.length(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[aeiouy]+", "V"),
            "[^V]",
            "",
        )
    ).cast("bigint")
    s = d.select("lang", "source", w.alias("w"), st.alias("st"), sy.alias("sy"))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("w").cast("double") / F.col("st").cast("double"))
        - F.lit(84.6) * (F.col("sy").cast("double") / F.col("w").cast("double"))
    )
    q = s.withColumn("fq", F.floor(flesch * 1e6 + F.lit(0.5)).cast("bigint"))
    return (
        q.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("n_words"),
            F.sum("st").alias("sst"),
            F.sum("sy").alias("ssy"),
            F.sum("fq").alias("sfq"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "n_words",
            dround(
                F.col("n_words").cast("double") / F.col("sst").cast("double"), 6
            ).alias("words_per_sentence"),
            dround(
                F.col("ssy").cast("double") / F.col("n_words").cast("double"), 6
            ).alias("syllables_per_word"),
            dround(
                F.col("sfq").cast("double") / F.col("n_docs").cast("double")
                / 1e6,
                6,
            ).alias("mean_flesch"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# l_mine_bitext_margin — margin-based parallel-corpus candidate mining
# ---------------------------------------------------------------------------


@query(
    "l_mine_bitext_margin",
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
        WHERE e.label <> q.ql
    ), r AS (
        SELECT q_id, ql, vec_id, label, sq,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY sq DESC, vec_id) AS rk
        FROM s
    )
    SELECT q_id, MAX(ql) AS ql,
           CAST(MAX(CASE WHEN rk = 1 THEN vec_id END) AS BIGINT)
               AS best_vec_id,
           MAX(CASE WHEN rk = 1 THEN label END) AS best_label,
           CAST(MAX(CASE WHEN rk = 1 THEN sq END) AS BIGINT) AS sq_best,
           ROUND(CAST(4 * MAX(CASE WHEN rk = 1 THEN sq END) AS DOUBLE)
                 / CAST(NULLIF(SUM(sq), 0) AS DOUBLE) * 1e6) / 1e6 + 0
               AS margin
    FROM r WHERE rk <= 4
    GROUP BY q_id ORDER BY q_id
    """,
)
def l_mine_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARGIN-BASED BITEXT MINING (Artetxe & Schwenk 2019, "Margin-based
    parallel corpus mining with multilingual sentence embeddings" —
    the LASER/ccMatrix method; public method): for each of 20
    md5-sampled source vectors (the l_sim_search_ivf sampling
    convention), score every CROSS-LABEL vector (label stands in for
    language), and report the best candidate with its RATIO margin =
    sim(best) / mean(top-4 sims). Raw cosine thresholds are
    incomparable across hubness regimes; the margin normalizes by the
    query's own neighborhood density — pairs with margin >> 1 are the
    mineable translations. Forward-only margin (the one-direction
    variant; production systems intersect both directions — one more
    run of the same shape with roles swapped).

    Determinism: sims quantize to the 1e6 half-up grid BEFORE ranking
    (the l_eval_mrr pin); the top-4 order is total ((sq DESC, vec_id));
    the margin is one integer-ratio division (4·best / Σtop4, NULLIF
    degenerate guard), dround 1e-6.

    Scale: the 20-query table broadcasts (LIMIT-bounded); sims are one
    map-side pass over q×corpus; the per-query top-4 is a rank window
    whose constant filter triggers InferWindowGroupLimit —
    per-partition top-4 heaps per q_id before the shuffle, so the
    exchange carries ~20×4×partitions rows, never q×corpus. At 100 TB:
    20 broadcast dot-product scans fused into one, one thin shuffle."""
    from pyspark.sql import Window as W

    from sqlengine_spark.functions import vdot

    e = table(spark, sf_dir, "embeddings")
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
        .filter(F.col("label") != F.col("ql"))
        .select(
            "q_id",
            "ql",
            "vec_id",
            "label",
            F.floor(vdot(F.col("embedding"), F.col("qe")) * 1e6 + 0.5)
            .cast("bigint")
            .alias("sq"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("sq").desc(), "vec_id")
    top = s.select(
        "q_id", "ql", "vec_id", "label", "sq",
        F.row_number().over(w).alias("rk"),
    ).filter(F.col("rk") <= 4)
    s4 = F.sum("sq")
    best_sq = F.max(F.when(F.col("rk") == 1, F.col("sq")))
    margin = (4 * best_sq).cast("double") / F.when(
        s4 == 0, F.lit(None)
    ).otherwise(s4).cast("double")
    return (
        top.groupBy("q_id")
        .agg(
            F.max("ql").alias("ql"),
            F.max(F.when(F.col("rk") == 1, F.col("vec_id")))
            .cast("bigint")
            .alias("best_vec_id"),
            F.max(F.when(F.col("rk") == 1, F.col("label"))).alias(
                "best_label"
            ),
            best_sq.cast("bigint").alias("sq_best"),
            dround(margin, 6).alias("margin"),
        )
        .orderBy("q_id")
    )

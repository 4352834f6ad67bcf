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
from sqlengine_spark.session import scatter, table

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
    # r12 scatter: single-split fixture scans serialize the map
    # stage on one core (see session.scatter; no-op at scale)
    d = scatter(spark, table(spark, sf_dir, "documents"))
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


# ---------------------------------------------------------------------------
# l_eval_bootstrap_ci / l_eval_paired_bootstrap — the Poisson bootstrap
# ---------------------------------------------------------------------------

_BOOT_B = 200
# Poisson(1) inverse-CDF cutoffs on a 16-bit grid, spelled as 4-hex-
# char string literals (computed once in Python, embedded in BOTH
# engines): replicate weight w = k iff the first 4 md5 hex chars sort
# below cutoff k — lowercase same-length hex compares lexicographically
# = numerically, so the draw needs NO hex->int conversion at all
# (CONV/'0x'-cast was 3.5 s of the 10M-row x100 scan; the md5 itself
# is the irreducible shared-hash cost). Clamped at 6 (tail ~5.9e-4 —
# standard truncation); the 2^-16 cutoff grid shifts each branch
# probability by < 1.6e-5, far below the CI resolution, and is part of
# the op's DEFINITION so both engines draw identical weights.
_POIS_HEX = ("5e2d", "bc5a", "eb71", "fb23", "ff10", "ffd9")


def _pois_case_sql(h_expr: str) -> str:
    branches = " ".join(
        f"WHEN {h_expr} < '{c}' THEN {k}" for k, c in enumerate(_POIS_HEX)
    )
    return f"(CASE {branches} ELSE 6 END)"


#: shared Spark-side draw: explode a PLAIN sequence (codegen Generate)
#: and compute the weight as an ordinary projected column — HOF
#: transform lambdas are INTERPRETED (no whole-stage codegen); the
#: lambda form measured 51 s at x100, the let-bound lambda 28 s, this
#: generator+codegen+hex-compare form 5.7 s (near-parity with the
#: single-process engine). Whole-stage CSE evaluates the md5 ONCE
#: across the 6 CASE branches.
_BOOT_W_CASE = _pois_case_sql(
    "substring(md5(CAST(doc_id AS STRING) || '_' ||"
    " CAST(b AS STRING)), 1, 4)"
)


@query(
    "l_eval_bootstrap_ci",
    oracle=f"""
    WITH x AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS x
        FROM documents
    ), r AS (
        SELECT b.b, x.x,
               {_pois_case_sql("substring(md5(CAST(x.doc_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 4)")}
                   AS w
        FROM x CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1}))
                           AS b) b
    ), m AS (
        SELECT b, CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(w * x) AS BIGINT) AS swx
        FROM r GROUP BY b
    ), o AS (
        SELECT CAST(swx AS DOUBLE) / CAST(NULLIF(sw, 0) AS DOUBLE) AS mb,
               b,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(swx AS DOUBLE)
                            / CAST(NULLIF(sw, 0) AS DOUBLE), b) AS rk
        FROM m
    ), pt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(x) AS BIGINT) AS sx
        FROM x
    )
    SELECT pt.n_docs, CAST({_BOOT_B} AS BIGINT) AS n_replicates,
           ROUND(CAST(pt.sx AS DOUBLE) / CAST(pt.n_docs AS DOUBLE)
                 * 1e6) / 1e6 + 0 AS mean_tokens,
           ROUND((SELECT mb FROM o WHERE rk = {_BOOT_B // 40}) * 1e6)
               / 1e6 + 0 AS ci_lo,
           ROUND((SELECT mb FROM o WHERE rk = {_BOOT_B - _BOOT_B // 40 + 1})
                 * 1e6) / 1e6 + 0 AS ci_hi
    FROM pt
    """,
)
def l_eval_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval (Hanley & MacGibbon 2006;
    Chamandy et al., "Estimating uncertainty for massive data streams"
    — the Google distributed-bootstrap method; public): a 95% CI for
    mean tokens/doc from B=200 replicates where each doc enters
    replicate b with weight ~ Poisson(1). Unlike the classic resample-
    n-of-n bootstrap (a global shuffle per replicate), Poisson weights
    are a PURE MAP: one deterministic md5 draw per (doc, replicate) —
    THE bootstrap that works on a 1000-executor cluster, and the CI
    every data-quality dashboard should put next to its point
    estimate.

    Determinism: weights are exact CASE cuts of the first 4 md5 hex
    chars against embedded 16-bit Poisson(1) CDF cutoffs (hex-string
    compare — no float, no hex->int cast; clamped at 6, tail 5.9e-4);
    per-replicate sums are exact BIGINT; each replicate mean is ONE
    division; the CI is a symmetric ORDER-STATISTIC pick (5th smallest
    / 5th largest of 200 under the total order (mean, b)) — no
    interpolation to diverge on.

    Scale: the B-fold fan-out is a codegen Generate over a plain index
    sequence with the draw as an ordinary projection (the
    interpreted-HOF form measured 51 s at x100; this form 5.7 s, 1.05x
    the single-process engine); one B-ary hash agg (partial+final);
    the order-statistic window runs over exactly B rows
    (pipeline-constant class). Shuffle volume: B rows per upstream
    partition."""
    from pyspark.sql import Window as W

    # r12 scatter: single-split fixture scans serialize the map
    # stage on one core (see session.scatter; no-op at scale)
    d = scatter(spark, table(spark, sf_dir, "documents"))
    x = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("x")
    )
    r = x.select(
        "doc_id",
        "x",
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b"),
    ).select("x", "b", F.expr(_BOOT_W_CASE).alias("w"))
    m = r.groupBy("b").agg(
        F.sum("w").alias("sw"), F.sum(F.col("w") * F.col("x")).alias("swx")
    )
    mb = F.col("swx").cast("double") / F.when(
        F.col("sw") == 0, F.lit(None)
    ).otherwise(F.col("sw")).cast("double")
    o = m.select(mb.alias("mb"), "b").select(
        "mb", F.row_number().over(W.orderBy("mb", "b")).alias("rk")
    )
    lo = _BOOT_B // 40
    hi = _BOOT_B - _BOOT_B // 40 + 1
    pt = x.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("x").alias("sx"))
    ci = o.filter(F.col("rk").isin(lo, hi)).agg(
        F.max(F.when(F.col("rk") == lo, F.col("mb"))).alias("lo"),
        F.max(F.when(F.col("rk") == hi, F.col("mb"))).alias("hi"),
    )
    return pt.crossJoin(F.broadcast(ci)).select(
        "n_docs",
        F.lit(_BOOT_B).cast("bigint").alias("n_replicates"),
        dround(
            F.col("sx").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("mean_tokens"),
        dround(F.col("lo"), 6).alias("ci_lo"),
        dround(F.col("hi"), 6).alias("ci_hi"),
    )


@query(
    "l_eval_paired_bootstrap",
    oracle=f"""
    WITH x AS (
        SELECT doc_id,
               (CASE WHEN (CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END)
                          = (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     THEN 1 ELSE 0 END)
             - (CASE WHEN (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
                          = (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     THEN 1 ELSE 0 END) AS dx
        FROM documents
    ), r AS (
        SELECT b.b, x.dx,
               {_pois_case_sql("substring(md5(CAST(x.doc_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 4)")}
                   AS w
        FROM x CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1}))
                           AS b) b
    ), m AS (
        SELECT b, CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(w * dx) AS BIGINT) AS swd
        FROM r GROUP BY b
    ), o AS (
        SELECT CAST(swd AS DOUBLE) / CAST(NULLIF(sw, 0) AS DOUBLE) AS db,
               b,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(swd AS DOUBLE)
                            / CAST(NULLIF(sw, 0) AS DOUBLE), b) AS rk
        FROM m
    ), pt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dx) AS BIGINT) AS sd
        FROM x
    ), agg AS (
        SELECT CAST(SUM(CASE WHEN db <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonpos
        FROM o
    )
    SELECT pt.n_docs, CAST({_BOOT_B} AS BIGINT) AS n_replicates,
           ROUND(CAST(pt.sd AS DOUBLE) / CAST(pt.n_docs AS DOUBLE)
                 * 1e6) / 1e6 + 0 AS acc_diff,
           ROUND((SELECT db FROM o WHERE rk = {_BOOT_B // 40}) * 1e6)
               / 1e6 + 0 AS ci_lo,
           ROUND((SELECT db FROM o WHERE rk = {_BOOT_B - _BOOT_B // 40 + 1})
                 * 1e6) / 1e6 + 0 AS ci_hi,
           ROUND(CAST(agg.n_nonpos AS DOUBLE) / {_BOOT_B}.0 * 1e6) / 1e6 + 0
               AS p_boot
    FROM pt, agg
    """,
)
def l_eval_paired_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRED POISSON BOOTSTRAP system comparison (Koehn 2004,
    "Statistical significance tests for machine translation
    evaluation", distributed via Poisson weights; public method): is
    detector A ('contains \" the \"') actually better than detector B
    (n_chars >= 300) at predicting lang = 'en'? Both systems score the
    SAME docs, so each replicate reweights the per-doc accuracy
    DIFFERENCE (the paired design that cancels shared variance —
    l_eval_mcnemar's bootstrap sibling). Output: point accuracy
    difference, the 95% replicate CI, and p_boot = share of replicates
    where the difference is <= 0 — the number an eval report quotes as
    "significant at p < 0.05" before swapping models.

    Determinism: per-doc dx in {{-1, 0, 1}} exact; SAME md5 hex-compare
    Poisson draws as l_eval_bootstrap_ci (the two ops' replicates are
    coupled by design, so their CIs are comparable); exact BIGINT
    replicate sums, one division per replicate, symmetric
    order-statistic CI picks under the total order (diff, b),
    count-ratio p_boot.

    Scale: identical shape to l_eval_bootstrap_ci — codegen Generate
    B-fold fan-out, one B-ary hash agg, B-row order-statistic
    window."""
    from pyspark.sql import Window as W

    # r12 scatter: single-split fixture scans serialize the map
    # stage on one core (see session.scatter; no-op at scale)
    d = scatter(spark, table(spark, sf_dir, "documents"))
    y = F.when(F.col("lang") == "en", 1).otherwise(0)
    pa = F.when(F.col("text").like("% the %"), 1).otherwise(0)
    pb = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    dx = (
        F.when(pa == y, 1).otherwise(0) - F.when(pb == y, 1).otherwise(0)
    ).cast("bigint")
    x = d.select("doc_id", dx.alias("dx"))
    r = x.select(
        "doc_id",
        "dx",
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b"),
    ).select("dx", "b", F.expr(_BOOT_W_CASE).alias("w"))
    m = r.groupBy("b").agg(
        F.sum("w").alias("sw"), F.sum(F.col("w") * F.col("dx")).alias("swd")
    )
    db = F.col("swd").cast("double") / F.when(
        F.col("sw") == 0, F.lit(None)
    ).otherwise(F.col("sw")).cast("double")
    o = m.select(db.alias("db"), "b").select(
        "db", F.row_number().over(W.orderBy("db", "b")).alias("rk")
    )  # single consumer (the one .agg below) — no checkpoint needed
    lo = _BOOT_B // 40
    hi = _BOOT_B - _BOOT_B // 40 + 1
    ci = o.agg(
        F.max(F.when(F.col("rk") == lo, F.col("db"))).alias("lo"),
        F.max(F.when(F.col("rk") == hi, F.col("db"))).alias("hi"),
        F.sum(F.when(F.col("db") <= 0, 1).otherwise(0)).alias("n_nonpos"),
    )
    pt = x.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dx").alias("sd"))
    return pt.crossJoin(F.broadcast(ci)).select(
        "n_docs",
        F.lit(_BOOT_B).cast("bigint").alias("n_replicates"),
        dround(
            F.col("sd").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("acc_diff"),
        dround(F.col("lo"), 6).alias("ci_lo"),
        dround(F.col("hi"), 6).alias("ci_hi"),
        dround(
            F.col("n_nonpos").cast("double") / F.lit(float(_BOOT_B)), 6
        ).alias("p_boot"),
    )


# ---------------------------------------------------------------------------
# l_eval_chrf — character n-gram F-score (chrF, single-order variant)
# ---------------------------------------------------------------------------


@query(
    "l_eval_chrf",
    oracle="""
    WITH d AS (
        SELECT CAST(doc_id // 2 AS BIGINT) AS pair_id, doc_id % 2 AS side,
               replace(text, ' ', '') AS s
        FROM documents
    ), g AS (
        SELECT pair_id, side,
               substring(s, i.i, 6) AS g
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
    )
    SELECT pair_id, tc, tr, ov,
           CASE WHEN ov = 0 THEN 0.0
                ELSE ROUND(CAST(5 * ov * ov AS DOUBLE)
                           / CAST(4 * ov * tr + ov * tc AS DOUBLE)
                           * 1e6) / 1e6 + 0
           END AS chrf2
    FROM a ORDER BY pair_id
    """,
)
def l_eval_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF2 — character 6-gram F-score between candidate/reference
    pairs (Popović 2015, "chrF: character n-gram F-score for automatic
    MT evaluation"; public method; single-order n=6, β=2 variant — the
    full metric averages orders 1..6, one more run of the same shape
    each): whitespace stripped (the sacrebleu convention), clipped
    6-gram overlap, chrF2 = 5PR/(4P+R). THE robust MT/generation eval
    for morphologically rich languages where word-level BLEU/ROUGE
    under-credit near-matches. Algebra note: with P = ov/tc (side 0 =
    candidate) and R = ov/tr, chrF2 = 5PR/(4P+R) = 5·ov²/(4·ov·tr +
    ov·tc) — RECALL-weighted, so the REFERENCE total tr carries the
    4x weight (the r13 advice fix: the original denominator had tc/tr
    swapped, computing the precision-weighted beta=1/2 variant) —
    evaluated in that integer-product form so both engines divide the
    same exact BIGINTs once (no P, R intermediates to reassociate).

    Determinism: all counts exact BIGINT from the (pair, gram) hash
    agg; one guarded integer-ratio division per pair, dround 1e-6.

    Scale: gram generation is a CODEGEN GENERATE over a plain index
    sequence with substring as an ordinary projection — the
    interpreted-HOF transform form measured 25.1 s at x100, this form
    0.68 s (37x; the r12 generator+codegen lesson). The cleaned
    string projects BELOW the Generate so replace() runs once per doc
    (verified: one replace() in the plan); the CASE guards
    sequence(1, 0), which DESCENDS in Spark (pin 11d). ONE
    (pair_id, gram)-keyed partial-agg shuffle linear in character
    count, one pair rollup. Never pairwise in the corpus."""
    # r12 scatter: single-split fixture scans serialize the map
    # stage on one core (see session.scatter; no-op at scale)
    d = scatter(spark, table(spark, sf_dir, "documents"))
    base = d.select(
        F.expr("CAST(doc_id DIV 2 AS BIGINT)").alias("pair_id"),
        (F.col("doc_id") % 2).alias("side"),
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
    pg = g.groupBy("pair_id", "g").agg(
        F.coalesce(F.sum(F.when(F.col("side") == 0, F.lit(1))), F.lit(0))
        .alias("c0"),
        F.coalesce(F.sum(F.when(F.col("side") == 1, F.lit(1))), F.lit(0))
        .alias("c1"),
    )
    a = pg.groupBy("pair_id").agg(
        F.sum("c0").alias("tc"),
        F.sum("c1").alias("tr"),
        F.sum(F.least("c0", "c1")).alias("ov"),
    )
    chrf2 = F.when(F.col("ov") == 0, F.lit(0.0)).otherwise(
        dround(
            (5 * F.col("ov") * F.col("ov")).cast("double")
            / (4 * F.col("ov") * F.col("tr") + F.col("ov") * F.col("tc"))
            .cast("double"),
            6,
        )
    )
    return a.select("pair_id", "tc", "tr", "ov", chrf2.alias("chrf2")).orderBy(
        "pair_id"
    )


# ---------------------------------------------------------------------------
# l_dedup_source_overlap — cross-source contamination matrix
# ---------------------------------------------------------------------------


@query(
    "l_dedup_source_overlap",
    oracle="""
    WITH w AS (
        SELECT source, string_split(text, ' ') AS w FROM documents
    ), sh AS (
        SELECT DISTINCT source,
               md5(array_to_string(w[i.i:i.i + 9], ' ')) AS h
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - 9))
                         AS i) i
    ), per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY source
    ), pair AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT p.source_a, p.source_b, p.n_shared,
           sa.n AS n_a, sb.n AS n_b,
           ROUND(CAST(p.n_shared AS DOUBLE)
                 / CAST(sa.n + sb.n - p.n_shared AS DOUBLE) * 1e6) / 1e6 + 0
               AS jaccard
    FROM pair p
    JOIN per_src sa ON sa.source = p.source_a
    JOIN per_src sb ON sb.source = p.source_b
    ORDER BY p.n_shared DESC, p.source_a, p.source_b
    LIMIT 50
    """,
)
def l_dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE CONTAMINATION MATRIX — for every source pair, the
    number of distinct 10-token shingles they share and the shingle
    Jaccard (top-50 pairs by shared mass): the curation question
    "which of my crawl feeds are secretly the same feed?" that decides
    source-level dedup ordering before any doc-level pass (the
    source-pair view of l_dedup_substring's shingle space; same
    16-byte shingle keys). Overlap >> both diagonals means one source
    republishes the other.

    Determinism: shingle sets are DISTINCT (source, md5(window)) keys;
    all counts exact BIGINT; one jaccard division per pair, dround
    1e-6; (n_shared DESC, source_a, source_b) is a total order under
    LIMIT (rule 5).

    Scale: shingles generate via the codegen Generate-over-index form
    (the chrF lesson — the token array projects below the Generate, so
    split() runs once per doc); the DISTINCT collapses to |sources|
    rows per shingle BEFORE the self-join, so per-shingle pair fan-out
    is bounded by C(|sources|, 2) — a DOMAIN-bounded constant, never
    corpus-quadratic; the pair self-join is hash-keyed on the shingle
    and pinned shuffle_hash (rule 14b: both sides are corpus-growing).
    Source totals broadcast onto the <=C(|sources|, 2)-row pair table
    (domain-bounded). Top-50 is TakeOrdered."""
    # r12 scatter: single-split fixture scans serialize the map
    # stage on one core (see session.scatter; no-op at scale)
    d = scatter(spark, table(spark, sf_dir, "documents"))
    base = d.select("source", F.split(F.col("text"), " ").alias("w"))
    sh = (
        base.select(
            "source",
            "w",
            F.explode(
                F.expr(
                    "CASE WHEN size(w) >= 10 THEN sequence(1, size(w) - 9)"
                    " ELSE CAST(array() AS ARRAY<INT>) END"
                )
            ).alias("i"),
        )
        .select(
            "source",
            F.expr("md5(array_join(slice(w, i, 10), ' '))").alias("h"),
        )
        .distinct()
        .localCheckpoint()  # rule 11a: feeds totals AND both join sides
    )
    per_src = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.toDF("source_a", "h")
    b = sh.toDF("source_b", "h")
    pair = (
        a.join(b.hint("shuffle_hash"), "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pair.join(F.broadcast(per_src.toDF("source_a", "n_a")), "source_a")
        .join(F.broadcast(per_src.toDF("source_b", "n_b")), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            dround(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("n_shared").desc(), "source_a", "source_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# l_ngram_entropy_rate — conditional bigram entropy of the corpus
# ---------------------------------------------------------------------------


@query(
    "l_ngram_entropy_rate",
    oracle="""
    WITH w AS (
        SELECT string_split(text, ' ') AS w FROM documents
    ), g AS (
        SELECT w[i.i] AS w1, w[i.i + 1] AS w2
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))
                         AS i) i
    ), bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM g GROUP BY w1, w2
    ), lm AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1
    ), t AS (
        SELECT CAST(SUM(CAST(FLOOR(CAST(bc.c12 AS DOUBLE)
                                   * ln(CAST(lm.c1 AS DOUBLE)
                                        / CAST(bc.c12 AS DOUBLE))
                                   * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
               CAST(SUM(bc.c12) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM bc JOIN lm ON lm.w1 = bc.w1
    ), ctx AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_contexts FROM lm
    )
    SELECT t.n AS n_bigrams, t.n_pairs, ctx.n_contexts,
           ROUND(CAST(t.sq AS DOUBLE) / 1e9 / CAST(t.n AS DOUBLE)
                 / 0.6931471805599453 * 1e9) / 1e9 + 0 AS h_bits
    FROM t, ctx
    """,
)
def l_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONDITIONAL BIGRAM ENTROPY RATE H(W₂|W₁) in bits — the classic
    corpus predictability / diversity number (Shannon 1951, "Prediction
    and entropy of printed English"; public method): the plug-in MLE
    H = Σ c₁₂·ln(c₁/c₁₂) / N / ln 2 over adjacent word pairs. Low
    entropy flags template/boilerplate-heavy corpora BEFORE training
    (complements l_text_entropy's per-doc unigram view and
    l_tokens_zipf_fit's frequency-shape view with a sequential-
    structure number).

    Determinism: counts are exact BIGINTs; each pair's c₁₂·ln(c₁/c₁₂)
    term (≥ 0) quantizes to a 1e9 fixed-point BIGINT BEFORE the sum
    (rule 11e — order-independent in both engines; ln is the same libm
    call, the l_dsir_weight precedent); ln 2 is an embedded literal so
    neither engine computes a transcendental of its own; one division
    chain spelled identically in both engines.

    Scale: ONE corpus-scale shuffle — the (w1, w2) pair count (grams
    generate via the codegen Generate-over-index form; no scatter —
    the fan-out partial-aggregates map-side into a vocab²-bounded hash
    table, pin 15b); the w1 marginals come from a full-partition WINDOW over the
    vocab²-bounded pair table (one w1-keyed shuffle + in-partition sort
    of pair rows, consumed once — r13 rewrite: the previous
    checkpoint + marginals-join + separate context-count made THREE
    passes over the pair table and an eager checkpoint job; paired x100
    A/B 0.85 → 0.76 s with bit-identical output, and strictly fewer
    pair-table passes at any scale). n_contexts rides the same final
    fold as count(distinct w1) — the Expand is over vocab²-bounded
    rows, partial-aggregated before the 1-row reduce."""
    from pyspark.sql import Window as W

    # No scatter guard here (r13 paired toggle, x100 medians
    # 0.715 no-scatter vs 0.795 scatter): the bigram fan-out
    # partial-aggregates map-side into a vocab²-bounded hash table, so
    # the first real op is already a shuffle of thin rows (pin 15b) —
    # round-robining the corpus costs more than the one-core map saves.
    d = table(spark, sf_dir, "documents")
    g = (
        d.select(F.split(F.col("text"), " ").alias("w"))
        .select(
            "w",
            F.explode(
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN sequence(1, size(w) - 1)"
                    " ELSE CAST(array() AS ARRAY<INT>) END"
                )
            ).alias("i"),
        )
        .select(
            F.expr("element_at(w, i)").alias("w1"),
            F.expr("element_at(w, i + 1)").alias("w2"),
        )
    )
    bc = g.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    b2 = bc.select(
        "w1", "c12", F.sum("c12").over(W.partitionBy("w1")).alias("c1")
    )
    term = F.floor(
        F.col("c12").cast("double")
        * F.log(F.col("c1").cast("double") / F.col("c12").cast("double"))
        * 1e9
        + 0.5
    ).cast("bigint")
    t = b2.agg(
        F.sum(term).alias("sq"),
        F.sum("c12").alias("n"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("w1").alias("n_contexts"),
    )
    return t.select(
        F.col("n").alias("n_bigrams"),
        "n_pairs",
        "n_contexts",
        dround(
            F.col("sq").cast("double")
            / 1e9
            / F.col("n").cast("double")
            / F.lit(0.6931471805599453),
            9,
        ).alias("h_bits"),
    )

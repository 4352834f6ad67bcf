"""Tier U (extension, round 9) — engine-surface pins and corpus-mix
statistics: Spark-4 SQL scalar UDFs (CREATE TEMPORARY FUNCTION ...
RETURN expr), the hidden ``_metadata`` file columns on parquet scans,
CCNet-style per-language rarity buckets (head/middle/tail), and a
chi-squared independence test over the lang x source contingency
table.

Float policy: money sums ride the rule-9 2-dp near-integer sanction
(round the SUM first); rarity scores and chi-squared cell terms are
half-up quantized to fixed-point BIGINTs per ROW (or per token TYPE)
before any cross-row sum (rule 11e).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqlengine_spark.functions import dround
from sqlengine_spark.registry import query
from sqlengine_spark.session import load_tables, table


@query(
    "h_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount))
                 * 100) / 100 + 0.0 AS revenue,
           CAST(SUM(CASE WHEN l_extendedprice * (CAST(1 AS DOUBLE)
                                                 - l_discount) > 50000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def h_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCALAR UDFs (Spark 4: ``CREATE OR REPLACE TEMPORARY FUNCTION
    ... RETURNS ... RETURN <expr>``) — reusable business logic declared
    IN SQL, not Python: a ``disc_price`` function and a ``is_high``
    predicate function (one calling the other) are defined once and
    referenced from an aggregation query, the way a metrics layer
    centralizes revenue definitions.

    The surface point: SQL UDFs are inlined into the plan by Catalyst
    (no serialization boundary, full codegen, filters still push) —
    unlike a Python UDF, ``disc_price`` costs NOTHING at any scale; the
    oracle states the hand-inlined equivalent. ``CAST(1 AS DOUBLE)``
    avoids the SQL-literal DECIMAL trap (rule 12d) in both engines.
    Revenue is 2-dp money: ROUND the SUM, then compare (rule 9).

    Scale: identical plan to the hand-written aggregation — one
    partial+final agg over the pruned scan; the function layer is
    purely a naming abstraction.
    """
    load_tables(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (CAST(1 AS DOUBLE) - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_high(p DOUBLE, d DOUBLE)"
        " RETURNS BOOLEAN RETURN disc_price(p, d) > 50000"
    )
    raw = spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(disc_price(l_extendedprice, l_discount)) AS revenue_raw,
               CAST(SUM(CASE WHEN is_high(l_extendedprice, l_discount)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        FROM lineitem
        GROUP BY l_returnflag
        """
    )
    return raw.select(
        "l_returnflag",
        "n",
        dround(F.col("revenue_raw"), 2).alias("revenue"),
        "n_high",
    )


@query(
    "a_scan_file_metadata",
    oracle="""
    SELECT 'documents.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    """,
)
def a_scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN FILE-METADATA COLUMNS on a parquet scan: Spark exposes
    ``_metadata.file_name`` (plus path/size/mtime) on every file-source
    row without any extra I/O — the lineage surface incremental
    pipelines use to attribute rows to their input files (audit which
    file produced a bad row, retract a single ingested file). Grouping
    by the hidden column yields the per-file row ledger.

    The fixture directory holds one file per table, so the expected
    ledger is the fixture-constant basename with the table's totals —
    the oracle states that ground truth directly (DuckDB's
    ``filename=true`` equivalent can't be expressed against the
    driver's pre-registered view). Read goes straight at the parquet
    path: documents needs no ts normalization (the session.table()
    events-only rule), and ``_metadata`` must be selected off the raw
    file scan before any projection drops it.

    Scale: ``_metadata`` is populated from the file split the row came
    from — zero shuffle, zero extra scan; the groupBy is a
    partial+final agg on |files| keys. At 100 TB this is the standard
    per-file audit/retraction index builder.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.select(
            F.col("_metadata.file_name").alias("file_name"),
            "doc_id",
            "source",
        )
        .groupBy("file_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "l_ccnet_bucket",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
        FROM documents
    ), freq AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM freq
    ), sq AS (
        SELECT t, CAST(FLOOR(-ln(c / CAST((SELECT n FROM tot) AS DOUBLE))
                             * 1e9 + 0.5) AS BIGINT) AS sq
        FROM freq
    ), docscore AS (
        SELECT k.doc_id, k.lang,
               SUM(s.sq) / CAST(COUNT(*) AS DOUBLE) / 1e9 AS score
        FROM tok k JOIN sq s ON s.t = k.t
        GROUP BY k.doc_id, k.lang
    ), bucketed AS (
        SELECT lang, doc_id, score,
               NTILE(3) OVER (PARTITION BY lang ORDER BY score, doc_id)
                   AS tercile
        FROM docscore
    )
    SELECT lang,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT))
                 / CAST(COUNT(*) AS DOUBLE) / 1e6 * 1e6) / 1e6 + 0.0
               AS avg_surprisal
    FROM bucketed GROUP BY lang, tercile
    """,
)
def l_ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style HEAD/MIDDLE/TAIL quality buckets per language: score
    each document by mean unigram surprisal −ln(p(token)) under the
    corpus LM (the perplexity stand-in), then split each language into
    terciles — head = most-predictable (cleanest) third, the bucket
    CCNet keeps preferentially when building a pretraining mix.

    Determinism (rule 11e, the NB per-token-type pattern): surprisal is
    quantized to 1e-9 fixed point once per token TYPE (a vocab-sized
    table), so each document's total is an exact integer sum no matter
    the token order; the per-doc mean is int/count; tercile assignment
    rides a (score, doc_id) total order; the per-bucket mean re-quantizes
    doc scores to 1e-6 before summing.

    Scale: token frequencies are one partial+final agg; the vocab-sized
    surprisal table broadcasts onto the token stream (map-only); doc
    scores are one doc-keyed agg; NTILE partitions by language. Exactly
    the CCNet pipeline shape — every stage keyed, nothing quadratic.
    """
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).localCheckpoint()  # one corpus scan feeds freq + scoring
    freq = tok.groupBy("t").agg(F.count("*").alias("c"))
    n_tok = freq.agg(F.sum("c")).collect()[0][0]  # bounded: 1 scalar
    sq = freq.select(
        "t",
        F.floor(-F.log(F.col("c") / F.lit(float(n_tok))) * 1e9 + 0.5)
        .cast("bigint")
        .alias("sq"),
    )
    docscore = (
        tok.join(F.broadcast(sq), "t")
        .groupBy("doc_id", "lang")
        .agg((F.sum("sq") / F.count("*").cast("double") / 1e9).alias("score"))
    )
    bucketed = docscore.select(
        "lang",
        "doc_id",
        "score",
        F.ntile(3)
        .over(W.partitionBy("lang").orderBy("score", "doc_id"))
        .alias("tercile"),
    )
    bucket = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return bucketed.groupBy("lang", bucket.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        dround(
            F.sum(F.floor(F.col("score") * 1e6 + 0.5).cast("bigint"))
            / F.count("*").cast("double")
            / 1e6,
            6,
        ).alias("avg_surprisal"),
    )


@query(
    "d_agg_chi2",
    oracle="""
    WITH o AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
        FROM documents GROUP BY lang, source
    ), rt AS (
        SELECT lang, CAST(SUM(obs) AS BIGINT) AS r FROM o GROUP BY lang
    ), ct AS (
        SELECT source, CAST(SUM(obs) AS BIGINT) AS c FROM o GROUP BY source
    ), n AS (
        SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o
    ), cells AS (
        SELECT o.obs,
               rt.r * CAST(ct.c AS DOUBLE) / (SELECT n FROM n) AS e
        FROM o JOIN rt ON rt.lang = o.lang JOIN ct ON ct.source = o.source
    )
    SELECT CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM ct) AS BIGINT) AS n_cols,
           CAST(((SELECT COUNT(*) FROM rt) - 1)
                * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
           (SELECT n FROM n) AS n_obs,
           ROUND(SUM(CAST(FLOOR((obs - e) * (obs - e) / e * 1e9 + 0.5)
                          AS BIGINT)) / 1e9 * 1e6) / 1e6 + 0.0 AS chi2
    FROM cells
    """,
)
def d_agg_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARED INDEPENDENCE TEST on the lang × source contingency
    table: χ² = Σ (observed − expected)²/expected with expected =
    row·col/n — the statistical companion to d_stat_crosstab that turns
    the contingency counts into a single dependence readout (is the
    language mix independent of the source?), plus the degrees of
    freedom a significance lookup needs.

    Determinism: expected counts are exact-integer products divided in
    double (identical both engines); each cell's χ² term is half-up
    quantized to 1e-9 fixed point BEFORE the sum, so the ≤ |langs|×
    |sources| cell additions are exact integers in any order (rule
    11e).

    Scale: one partial+final agg to the bounded cell grid, two
    broadcast-sized marginal joins, one bounded reduce — a constant
    plan at any corpus size.
    """
    d = table(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count("*").alias("obs")).localCheckpoint()
    rt = o.groupBy("lang").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs")).collect()[0][0]  # bounded: 1 scalar
    n_rows = rt.count()  # bounded: |langs|
    n_cols = ct.count()  # bounded: |sources|
    e = F.col("r") * F.col("c").cast("double") / F.lit(float(n))
    term = F.floor(
        (F.col("obs") - e) * (F.col("obs") - e) / e * 1e9 + 0.5
    ).cast("bigint")
    return (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .agg(
            F.lit(n_rows).cast("bigint").alias("n_rows"),
            F.lit(n_cols).cast("bigint").alias("n_cols"),
            F.lit((n_rows - 1) * (n_cols - 1)).cast("bigint").alias("dof"),
            F.lit(n).cast("bigint").alias("n_obs"),
            dround(F.sum(term) / 1e9, 6).alias("chi2"),
        )
    )

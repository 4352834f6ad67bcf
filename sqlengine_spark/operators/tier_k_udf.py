"""Tier K — UDF / UDAF / UDTF surface (SURVEY.md §2 tier K).

The extension surface of the engine: row UDF (slow path, deliberately
isolated to one query), vectorized Arrow pandas UDFs (the performant
Python path — Arrow batch transfer, 10-100x over row UDFs), grouped-agg
and grouped-map pandas UDFs, and a Spark 4 Python UDTF with a lateral
join.

Float policy: Python-side code returns RAW doubles; all rounding happens
afterwards in JVM expressions via dround so both engines round the same
way (SURVEY §5.4 R1).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import StringType

from sqlengine_spark.functions import dround
from sqlengine_spark.registry import query
from sqlengine_spark.session import load_tables, table


@query(
    "k_udf_row",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 5 THEN 'low'
                WHEN value < 15 THEN 'mid'
                ELSE 'high' END AS bucket
    FROM events
    """,
)
def k_udf_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — THE slow path (per-row Python round
    trip); included because it is part of the engine surface, kept off
    every other query. The oracle is the equivalent CASE ladder."""

    @udf(StringType())
    def bucket(v: float) -> str:
        if v is None:
            return None
        if v < 5:
            return "low"
        if v < 15:
            return "mid"
        return "high"

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", bucket("value").alias("bucket"))


@query(
    "k_udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * 100, 0) / 100 AS net
    FROM lineitem
    """,
)
def k_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow pandas UDF: whole Arrow batches cross the
    Python boundary, numpy does the arithmetic — the only acceptable
    Python hot path at scale. The UDF returns the raw product; rounding
    happens JVM-side via dround for cross-engine bit-identity."""

    @pandas_udf("double")
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(net("l_extendedprice", "l_discount"), 2).alias("net"),
    )


@query(
    "k_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_discount) / SUM(l_discount) * 1e4, 0) / 1e4
               AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def k_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG pandas UDF: discount-weighted
    average price per return flag. Spark ships each group's columns as
    Arrow arrays to one Python worker call. Result rounded to 4 dp —
    numpy's pairwise summation and DuckDB's sequential summation differ
    below that."""

    @pandas_udf("double")
    def wavg(price: pd.Series, disc: pd.Series) -> float:
        den = disc.sum()
        return float((price * disc).sum() / den) if den else None

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(wavg("l_extendedprice", "l_discount"), 4).alias("wavg_price")
    )


@query(
    "k_udtf_split",
    oracle="""
    SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS token
    FROM documents,
         LATERAL (SELECT unnest(generate_series(1, len(string_split(text, ' '))))
                  AS i) t
    WHERE doc_id < 10
    """,
)
def k_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one output row per token with its 1-based
    position, applied per input row via SQL LATERAL join. Bounded to 10
    docs — a UDTF is a per-row Python generator, the slow path; the
    built-in equivalent is posexplode (used everywhere else)."""

    @udtf(returnType="pos: int, token: string")
    class SplitWords:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("split_words", SplitWords)
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token
        FROM documents, LATERAL split_words(text) t
        WHERE doc_id < 10
        """
    )


@query(
    "k_apply_in_pandas",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND((c_acctbal - avg(c_acctbal) OVER w)
                 / stddev_samp(c_acctbal) OVER w * 1e4, 0) / 1e4 + 0 AS z
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey)
    """,
)
def k_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score normalize balances within each
    nation. One shuffle on the group key, then each group is handed to
    Python as a pandas frame — the canonical custom-transform escape
    hatch when built-ins can't express per-group logic. pandas std()
    is ddof=1 = SQL stddev_samp; singleton groups yield NULL in both."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["c_acctbal"].std(ddof=1)
        z = (pdf["c_acctbal"] - pdf["c_acctbal"].mean()) / sd if sd and sd == sd else None
        return pd.DataFrame(
            {"c_custkey": pdf["c_custkey"], "c_nationkey": pdf["c_nationkey"], "z": z}
        )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    out = c.groupBy("c_nationkey").applyInPandas(
        zscore, "c_custkey long, c_nationkey int, z double"
    )
    return out.select("c_custkey", "c_nationkey", dround(F.col("z"), 4).alias("z"))


@query(
    "k_map_in_arrow",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(text) AS n_chars_m
    FROM documents ORDER BY doc_id
    """,
)
def k_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native mapInArrow: partitions stream through Python as raw
    ``pyarrow.RecordBatch`` objects and are transformed with pyarrow
    compute kernels — no pandas materialization at all, the
    lowest-overhead Python extension surface Spark has (the step below
    the pandas UDFs in this tier). Token and character counts computed
    per row with ``pc.list_value_length(pc.split_pattern(...))`` and
    ``pc.utf8_length`` per batch.

    Scale: map-only — no shuffle, batch-at-a-time memory bound, and
    the Arrow columnar buffers cross the JVM<->Python boundary
    zero-copy. This is the surface a vectorized tokenizer or a
    C-backed scorer plugs into when even pandas conversion is too much
    overhead.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def counts(batches):
        for b in batches:
            words = pc.split_pattern(b.column("text"), " ")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.list_value_length(words), pa.int64()),
                    pc.cast(pc.utf8_length(b.column("text")), pa.int64()),
                ],
                ["doc_id", "n_tokens", "n_chars_m"],
            )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        counts, "doc_id long, n_tokens long, n_chars_m long"
    ).orderBy("doc_id")


@query(
    "k_udf_pandas_iter",
    oracle="""
    SELECT event_id,
           ROUND((value * 1.07 + 2.5) * 1e6, 0) / 1e6 + 0 AS scored
    FROM events
    """,
)
def k_udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR-form Pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``, SCALAR_ITER eval type) — the eval mode
    whose whole reason to exist is EXPENSIVE PER-WORKER INIT: the
    function body runs once per Python worker, loads its "model"
    (here a stand-in linear scorer; in production a tokenizer or an
    ONNX session) BEFORE the batch loop, then streams Arrow batches
    through it — versus the plain scalar pandas_udf, which gives the
    framework no place to hoist one-time setup out of the per-batch
    path. This completes tier K's eval-type matrix: row UDF, scalar
    pandas, SCALAR_ITER, grouped agg, grouped map, UDTF, mapInPandas,
    mapInArrow.

    Scale: same Arrow batching as the scalar form, plus amortized
    init — at 1000 executors a 5 s model load happens once per worker
    instead of once per batch; the oracle pins the arithmetic."""
    @pandas_udf("double")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-worker "model load" happens HERE, outside the loop
        weight, bias = 1.07, 2.5
        for s in batches:
            yield s * weight + bias

    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id", dround(score(F.col("value")), 6).alias("scored")
    )


@query(
    "k_udf_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_extendedprice * (1 - l_discount) * (1 + l_tax))
                 * 100, 0) / 100 AS charge
    FROM lineitem
    """,
)
def k_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0 ``@arrow_udf`` — the zero-pandas scalar UDF: Arrow
    RecordBatch columns arrive as ``pyarrow.Array`` and the body runs
    pyarrow.compute kernels (C++ SIMD), skipping the Arrow→pandas
    Series materialization ``@pandas_udf`` pays on every batch. This
    completes the tier-K eval-type matrix: row UDF (mandated slow
    path), pandas scalar, pandas iterator, grouped agg, grouped map,
    UDTF, mapInArrow, and now the arrow-native scalar.

    pc.multiply on float64 is IEEE multiply — bit-identical to the
    JVM's — and rounding happens JVM-side via dround, same determinism
    contract as k_udf_pandas_scalar.

    Scale: identical shape to every vectorized UDF — Arrow batches,
    map-only, no shuffle; the kernel saves ~30% Python-side CPU vs
    pandas on arithmetic-only bodies (no index/null-bitmap copies)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    # NB: this module has `from __future__ import annotations`, which
    # stringifies hints and breaks arrow_udf's signature dispatch —
    # attach REAL pa.Array annotations explicitly instead.
    def _charge(price, disc, tax):
        return pc.multiply(
            pc.multiply(price, pc.subtract(1.0, disc)),
            pc.add(1.0, tax),
        )

    _charge.__annotations__ = {
        "price": pa.Array, "disc": pa.Array, "tax": pa.Array,
        "return": pa.Array,
    }
    charge = arrow_udf(_charge, "double")

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(charge("l_extendedprice", "l_discount", "l_tax"), 2).alias(
            "charge"
        ),
    )


@query(
    "k_udtf_polymorphic",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS part0,
           string_split(text, ' ')[2] AS part1,
           string_split(text, ' ')[3] AS part2
    FROM documents WHERE doc_id < 20
    """,
)
def k_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4, static ``analyze``): the
    output SCHEMA is computed at ANALYSIS time from the call's literal
    arguments — ``split_fixed(text, 3)`` resolves to columns
    part0..part2 before any data moves, so each call site gets exactly
    the width it asked for (the fixed-width feature-extraction shape:
    leading-k tokens as typed columns). k_udtf_split is the
    fixed-schema sibling; this is the API that makes Python UDTFs
    schema-flexible without resorting to MapType blobs.

    Scale: same per-row Python generator cost as any UDTF (bounded
    here to 20 docs); the analyze() call runs ONCE on the driver at
    plan time — zero executor cost for the polymorphism."""
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(t: AnalyzeArgument, n: AnalyzeArgument):
            st = StructType()
            for i in range(n.value):
                st = st.add(f"part{i}", "string")
            return AnalyzeResult(schema=st)

        def eval(self, t: str, n: int):
            parts = t.split(" ")
            yield tuple(
                (parts[i] if i < len(parts) else None) for i in range(n)
            )

    spark.udtf.register("split_fixed", SplitFixed)
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT doc_id, t.* FROM documents,
               LATERAL split_fixed(text, 3) t
        WHERE doc_id < 20
        """
    )


@query(
    "k_udtf_table_input",
    oracle="""
    WITH s AS (
        SELECT event_type, value,
               lag(value) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS pv
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND value > pv
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND value < pv
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_down
    FROM s GROUP BY event_type
    """,
)
def k_udtf_table_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument (Spark 4 ``TABLE(...)
    PARTITION BY ... ORDER BY ...``) — the set-based UDTF form: the
    engine partitions and ORDERS the input, instantiates the UDTF once
    per partition, streams the partition's rows through ``eval`` in
    order, and collects ``terminate``'s summary — custom per-group
    SEQUENTIAL logic (here: counting direction changes in each event
    type's value series, which needs the order, not just the bag)
    without collect() or a window-function workaround. Completes the
    tier-K UDTF matrix: k_udtf_split (lateral scalar), k_udtf_
    polymorphic (analyze-time schema), and now table-valued input.
    The oracle restates the sequential scan declaratively (lag over
    the same (ts, event_id) total order), so the engine's
    partition-ordering contract itself is hash-verified.

    Scale: PARTITION BY shuffles once on the key exactly like a
    groupBy; each partition streams through its UDTF instance with
    O(1) state here (prev value + three counters) — the same execution
    shape as applyInPandas but row-streaming, no per-partition
    materialization. Python-side cost is the usual serialization tax;
    production keys this at |event types| parallelism."""
    load_tables(spark, sf_dir, ("events",))

    @udtf(
        returnType="event_type string, n_events bigint, n_up bigint,"
        " n_down bigint"
    )
    class RunStats:
        def __init__(self):
            self.key = None
            self.prev = None
            self.n = 0
            self.up = 0
            self.down = 0

        def eval(self, row):
            self.key = row["event_type"]
            v = row["value"]
            self.n += 1
            if self.prev is not None:
                if v > self.prev:
                    self.up += 1
                elif v < self.prev:
                    self.down += 1
            self.prev = v

        def terminate(self):
            if self.key is not None:
                yield self.key, self.n, self.up, self.down

    spark.udtf.register("run_stats_udtf", RunStats)
    return spark.sql(
        """
        SELECT * FROM run_stats_udtf(
            TABLE(SELECT event_type, value, ts, event_id FROM events)
            PARTITION BY event_type ORDER BY (ts, event_id)
        )
        """
    )

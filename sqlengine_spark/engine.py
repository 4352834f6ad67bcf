"""User-facing engine facade (SURVEY §3: the three entry points).

A user of the reference engine gets the same workflow here:

    from sqlengine_spark.engine import SQLEngine

    eng = SQLEngine(sf_dir="/data/warehouse")        # catalog bootstrap
    eng.sql("SELECT count(*) FROM lineitem").show()  # SQL entry point
    eng.table("orders").filter(...).groupBy(...)     # DataFrame entry point
    eng.stream_events()                              # streaming entry point
    eng.run("d_agg_q1_pricing")                      # library operator

The facade owns nothing clever: it binds a SparkSession + data
directory, registers the temp-view catalog once, and exposes the
registry. All planning/execution is Catalyst's (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sqlengine_spark.registry import all_oracles, all_queries
from sqlengine_spark.session import DEFAULT_SF_DIR, TABLES, get_spark, load_tables, table


class SQLEngine:
    def __init__(
        self,
        sf_dir: str = DEFAULT_SF_DIR,
        spark: SparkSession | None = None,
    ) -> None:
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self._catalog_loaded = False

    # -- catalog ----------------------------------------------------------
    def load_catalog(self) -> "SQLEngine":
        """Register every table as a temp view (idempotent)."""
        if not self._catalog_loaded:
            load_tables(self.spark, self.sf_dir, TABLES)
            self._catalog_loaded = True
        return self

    def table(self, name: str) -> DataFrame:
        """DataFrame entry point for one table."""
        return table(self.spark, self.sf_dir, name)

    # -- SQL --------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """SQL entry point over the registered catalog."""
        self.load_catalog()
        return self.spark.sql(query)

    # -- streaming --------------------------------------------------------
    def stream_events(self, watermark: str | None = None) -> DataFrame:
        """Streaming entry point: the events table as an unbounded
        stream. The file source needs a directory of files with
        stream-compatible types, so the single nanos-timestamp parquet
        is staged once (ts converted to µs) into a scratch dir — on a
        real deployment the source is a Kafka/queue/landing directory
        and this staging disappears; the downstream plan is identical.
        """
        import os
        import tempfile

        stage = getattr(self, "_events_stage", None)
        if stage is None or not os.path.isdir(stage):
            stage = tempfile.mkdtemp(prefix="sqlengine_events_stream_")
            self.table("events").write.mode("overwrite").parquet(stage)
            self._events_stage = stage
        ev = self.spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ).parquet(stage)
        return ev.withWatermark("ts", watermark) if watermark else ev

    # -- operator library -------------------------------------------------
    def operators(self) -> list[str]:
        return sorted(all_queries())

    def run(self, qid: str) -> DataFrame:
        """Run a library operator against this engine's data directory."""
        return all_queries()[qid](self.spark, self.sf_dir)

    def oracle(self, qid: str) -> str | None:
        """The ANSI-SQL equivalent of a library operator (None for
        rows-only operators)."""
        return all_oracles().get(qid)

"""Skew mitigation helpers (SURVEY §4 / SCALE.md cross-cutting rules).

AQE's skew-join splitting handles join-side skew automatically; these
helpers cover the two cases AQE does not:

- ``salted_agg``: two-stage aggregation for power-law GROUP BY keys
  whose per-key state is itself expensive (collect-style or
  high-cardinality-distinct aggregates). Ordinary sums/counts don't
  need this — map-side partial aggregation already collapses them —
  but when partial aggregation can't compress (e.g. count distinct
  over a hot key), salting splits the hot key's rows across
  ``n_salts`` reducers and a second stage merges the partials.

- ``replicate_broadcast_salt``: the join-side recipe (documented, not
  needed in this repo because every skewable join side here fits in a
  broadcast): salt the big side, replicate the small side once per
  salt, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Count-distinct of ``value`` per ``key`` via salted two-stage
    aggregation: stage 1 groups on (key, salt(value)) so a hot key's
    distinct-set state is split across ``n_salts`` tasks; stage 2 sums
    the per-salt distinct counts. Exact because the salt is derived
    from the VALUE (each distinct value lands in exactly one salt
    bucket). Returns (key, n_distinct)."""
    salt: Column = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt")
    stage1 = df.select(F.col(key), F.col(value), salt).groupBy(key, "_salt").agg(
        F.countDistinct(value).alias("_partial")
    )
    return stage1.groupBy(key).agg(F.sum("_partial").alias("n_distinct"))

#!/usr/bin/env python
"""Simulate the grading driver against __spark_entry__.py (the product
surface): t1 smoke at sf0.001, then t2 oracle compare at sf0.01.

Faithfulness rules (round-1 lesson — the sim MUST diverge from the repo's
own harness exactly the way the real driver does):

1. The SparkSession is a PLAIN ``SparkSession.builder.getOrCreate()`` with
   none of the engine configs from ``get_spark()`` — the driver passes its
   own session, so any config a query needs must be set at query time.
2. Canonicalization goes through pandas the way the driver's does
   (``sort_values`` over all columns) — list/map cells raise
   ``TypeError: unhashable type`` here just like they do in the driver,
   so ArrayType/MapType leaks are caught locally before commit.

Run from /root/repo before every commit: ``python scripts/driver_sim.py``
(optionally pass query ids to restrict).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as mod

# The driver gates at sf0.01; override to stress determinism at other
# scales (e.g. SPARK_GRAFT_SIM_SF=/root/testdata/sf0.1). SKIP is a
# comma-list of query ids to exclude (quadratic-on-degenerate-data ops
# at larger SFs — see bench.py note).
SF01 = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
SKIP = set(
    s for s in os.environ.get("SPARK_GRAFT_SIM_SKIP", "").split(",") if s
)
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon_df(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: sort columns by name, round floats,
    stringify cells, sort rows via pandas sort_values (raises on
    unhashable cells — deliberately)."""
    pdf = pdf[sorted(pdf.columns)]

    # Explicit container-cell check: the real driver's value-hash chokes
    # on list/map cells in EVERY case, but pandas sort_values only
    # reproduces that for multi-column frames (single-column sorts take
    # the comparison path where Python lists compare fine) — so don't
    # rely on sort_values internals (round-2 advice).
    import numpy as np

    for c in pdf.columns:
        bad = pdf[c].map(
            lambda v: isinstance(v, (list, tuple, set, dict, np.ndarray))
        )
        if bad.any():
            raise TypeError(
                f"container cell in column {c!r} (ArrayType/MapType leak): "
                f"{pdf[c][bad.idxmax()]!r}"
            )

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\x00null"
        if isinstance(v, float):
            return f"{round(v, 9):.9f}"
        return str(v)

    out = pdf.copy()
    for c in out.columns:
        out[c] = out[c].map(cell)
    # sort_values on the raw frame first — this is where the real driver
    # throws TypeError on list cells; keep that behavior.
    pdf.sort_values(list(pdf.columns))
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main() -> int:
    only = sys.argv[1:] or None
    # Plain session: exactly what the grading driver hands to queries().
    stress = SF01 != "/root/testdata/sf0.01"
    builder = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
    )
    if stress:
        # Stress mode (sf0.1+ sweeps) needs a real heap: a plain-1g
        # session dies at the GC-heavy keys and poisons the JVM for
        # everything after (r12 closing incident). The driver-faithful
        # sf0.01 path stays a PLAIN session — the real driver runs there.
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    spark = builder.getOrCreate()
    if stress:
        # driver.memory only applies at JVM launch; getOrCreate() may
        # have silently reused an existing under-sized session — refuse
        # EARLY instead of dying mid-sweep.
        from sqlengine_spark.session import require_heap

        require_heap(spark, 7.0, f"driver_sim stress sweep at {SF01}")

    t0 = time.time()
    n = len(mod.entry(spark).collect())
    print(f"t1 entry: rows={n} ({time.time() - t0:.1f}s)")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    qs, oracles = mod.queries(), mod.oracle_sql()
    fails = []
    n_run = 0
    for name in sorted(qs):
        if (only and name not in only) or name in SKIP:
            continue
        n_run += 1
        try:
            sdf = qs[name](spark, SF01)
            spdf = sdf.toPandas()
            if name not in oracles:
                # rows-only: the driver still canonicalizes (so array
                # leaks fail even here) and records the row count.
                canon_df(spdf)
                print(f"  {name}: rows-only rows={len(spdf)} OK")
                continue
            dpdf = con.execute(oracles[name]).df()
            if sorted(spdf.columns) != sorted(dpdf.columns):
                fails.append(
                    (name, f"cols {sorted(spdf.columns)} != {sorted(dpdf.columns)}")
                )
                continue
            if len(spdf) != len(dpdf):
                fails.append((name, f"rowcount {len(spdf)} != {len(dpdf)}"))
                continue
            s_c, d_c = canon_df(spdf), canon_df(dpdf)
            if not s_c.equals(d_c):
                neq = (s_c != d_c).any(axis=1)
                i = int(neq.idxmax())
                fails.append(
                    (name,
                     f"values differ, e.g. row {i}: "
                     f"{list(s_c.iloc[i])} != {list(d_c.iloc[i])}")
                )
            else:
                print(f"  {name}: MATCH rows={len(spdf)}")
        except Exception as e:  # noqa: BLE001 — report, keep going
            fails.append((name, f"EXC {type(e).__name__}: {e}"))
    if fails:
        print(f"\nFAILURES ({len(fails)}):")
        for name, why in fails:
            print(f"  {name}: {why}")
        return 1
    print(f"\nALL MATCH ({n_run} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

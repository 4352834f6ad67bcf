#!/usr/bin/env python
"""Like-for-like baseline measurement (round-2 verdict item 4).

For each BASELINE.md anchor query, measure at sf0.001/0.01/0.1 under an
IDENTICAL warm protocol (one warm-up run, one timed run, same process,
same machine, caches hot):

- Spark: the registered queries() callable, collect()ed;
- DuckDB: the registered oracle_sql() string, fetchall()ed;
- Spark fixed floor: a 1-row parquet read (region LIMIT 1) and a
  plan-only no-op (spark.range(1)), timed the same way — the
  per-query cost that exists regardless of data volume.

Prints a JSON document and a ready-to-paste markdown table that
decomposes each Spark time into fixed floor + data-dependent component
and states the DuckDB ratio on the data-dependent part — making the
"within 2x of baseline" gate evaluable on plan quality rather than
JVM/Py4J constants. Run while the machine is otherwise idle.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from sqlengine_spark.registry import all_oracles, all_queries
from sqlengine_spark.session import TABLES, get_spark

ANCHORS = [
    "d_agg_q1_pricing",
    "c_join_3way",
    "e_win_topk_group",
    "j_tumbling_1h",
    "l_sim_search_topk",
]
SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = "/root/testdata"


def timed(fn) -> float:
    fn()  # warm-up
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 4)


def main() -> int:
    spark = get_spark("baseline_measure")
    qs, oracles = all_queries(), all_oracles()
    out: dict = {"anchors": {}, "floor": {}}

    # fixed Spark per-query floor, measured per protocol
    region = f"{ROOT}/sf0.001/region.parquet"
    out["floor"]["noop_collect"] = timed(lambda: spark.range(1).collect())
    out["floor"]["one_row_parquet"] = timed(
        lambda: spark.read.parquet(region).limit(1).collect()
    )

    for sf in SFS:
        sf_dir = f"{ROOT}/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for qid in ANCHORS:
            spark_s = timed(lambda: qs[qid](spark, sf_dir).collect())
            duck_s = timed(lambda: con.execute(oracles[qid]).fetchall())
            rec = out["anchors"].setdefault(qid, {})
            rec[sf] = {"spark": spark_s, "duckdb": duck_s}
        con.close()

    floor = out["floor"]["one_row_parquet"]
    print(json.dumps(out, indent=2))
    print("\n## markdown\n")
    print(
        "| Query | sf | Spark total | fixed floor | Spark data-dependent "
        "| DuckDB | ratio (data-dep / DuckDB) |"
    )
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for qid in ANCHORS:
        for sf in SFS:
            r = out["anchors"][qid][sf]
            dd = max(r["spark"] - floor, 0.0)
            ratio = dd / r["duckdb"] if r["duckdb"] > 0 else float("inf")
            print(
                f"| {qid} | {sf} | {r['spark']:.3f}s | {floor:.3f}s "
                f"| {dd:.3f}s | {r['duckdb']:.3f}s | {ratio:.1f}x |"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

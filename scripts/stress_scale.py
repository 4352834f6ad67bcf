#!/usr/bin/env python
"""Reproducible x10/x100 scale-stress harness (the protocol behind
BASELINE.md's stress tables, promoted from per-round ad-hoc scripts).

Builds an x100 fixture by DISJOINT-KEY REPLICATION of sf0.1 (each fact
table unioned 10x with its primary/foreign keys offset into disjoint
ranges, dimensions copied as-is), then times each requested query
paired against its DuckDB oracle: N interleaved reps, a FRESH plan per
timed run (CLAUDE.md rule 8a), medians reported. Run on an idle host
and read the burn probe before comparing across runs (rule 8c/9).

Usage:
    python scripts/stress_scale.py q1 q2 ...          # x10 = sf0.1
    python scripts/stress_scale.py --x100 q1 q2 ...   # build + use x100
    python scripts/stress_scale.py --x100 --reps 3 q1

Row counts are asserted equal between engines on every rep; a query
whose oracle answer is quadratic on the degenerate 31-token vocabulary
(bench.py note) should not be pointed at --x100. Same caution for
DENSITY-quadratic answers: replication multiplies per-bucket/value
density 10x, so ops whose answer is pairs-within-a-band explode
quadratically (measured: c_join_range_bucketed's x100 ANSWER is
~100M pairs — the driver-side Arrow materialization dies, and the
DuckDB fetchall would too; the plan itself is the linear bucketed
hash join either way).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import host_probe
from sqlengine_spark.registry import all_oracles, all_queries
from sqlengine_spark.session import TABLES, get_spark

SF01 = "/root/testdata/sf0.1"
X100 = "/tmp/sqlengine_x100"

# key-offset recipe per fact table; dimensions replicate as-is
_FACT_OFFSETS = {
    "documents": "SELECT doc_id + i*10000000 AS doc_id, text, lang,"
                 " source, n_chars",
    "events": "SELECT event_id + i*1000000000 AS event_id, ts,"
              " user_id + i*10000000 AS user_id, event_type, value, props",
    "lineitem": "SELECT l_orderkey + i*100000000 AS l_orderkey, l_partkey,"
                " l_suppkey, l_linenumber, l_quantity, l_extendedprice,"
                " l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
    "orders": "SELECT o_orderkey + i*100000000 AS o_orderkey,"
              " o_custkey + i*10000000 AS o_custkey, o_orderstatus,"
              " o_totalprice, o_orderdate, o_orderpriority",
    "embeddings": "SELECT vec_id + i*10000000 AS vec_id, embedding,"
                  " label",
}


def build_x100() -> str:
    os.makedirs(X100, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        dst = f"{X100}/{t}.parquet"
        src_path = f"{SF01}/{t}.parquet"
        # a cached replica OLDER than its sf0.1 source is stale — the
        # driver regenerates testdata between rounds (rule 1b), and a
        # silently-reused old corpus invalidates every number measured
        # on it (rule 8)
        if os.path.exists(dst) and os.path.getmtime(
            dst
        ) > os.path.getmtime(src_path):
            continue
        src = f"read_parquet('{SF01}/{t}.parquet')"
        if t in _FACT_OFFSETS:
            q = (
                f"{_FACT_OFFSETS[t]} FROM {src} CROSS JOIN"
                " (SELECT unnest(generate_series(0, 9)) AS i)"
            )
        else:
            q = f"SELECT * FROM {src}"
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        print(f"# built {dst}", file=sys.stderr)
    return X100


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("qids", nargs="+")
    ap.add_argument("--x100", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    print(f"# probe: {host_probe()}", file=sys.stderr)
    sf_dir = build_x100() if args.x100 else SF01
    spark = get_spark("stress-scale")
    qs, osql = all_queries(), all_oracles()
    for qid in args.qids:
        if qid not in qs:
            print(f"{qid}: UNKNOWN", flush=True)
            continue
        if qid not in osql:
            print(f"{qid}: rows-only (no oracle) — skipped", flush=True)
            continue
        # warm both engines once (JIT / file cache), then interleave
        qs[qid](spark, sf_dir).toPandas()
        con = duck_con(sf_dir)  # r10 ADVICE: close the warm-up
        con.execute(osql[qid]).fetchall()  # connection too — many-qid
        con.close()  # runs leaked a handle per query
        ss, ds, n = [], [], None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = len(qs[qid](spark, sf_dir).toPandas())  # fresh plan
            ss.append(time.perf_counter() - t0)
            con = duck_con(sf_dir)  # fresh connection: no result cache
            t0 = time.perf_counter()
            nd = len(con.execute(osql[qid]).fetchall())
            ds.append(time.perf_counter() - t0)
            con.close()
            assert n == nd, f"{qid}: row-count mismatch {n} != {nd}"
        ms, md = statistics.median(ss), statistics.median(ds)
        print(
            f"{qid}: spark {[round(x, 2) for x in ss]}"
            f" duck {[round(x, 2) for x in ds]}"
            f" median {ms:.2f}/{md:.2f} ratio {ms/md:.2f} rows {n}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

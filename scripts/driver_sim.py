#!/usr/bin/env python
"""Simulate the grading driver against __spark_entry__.py (the product
surface): t1 smoke at sf0.001, then t2 oracle compare at sf0.01.

This is the repo's verification harness (.claude/skills/verify/SKILL.md)
— run it from /root/repo before every commit.
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as mod
from sqlengine_spark.session import TABLES, get_spark

SF01 = "/root/testdata/sf0.01"


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def main() -> int:
    only = sys.argv[1:] or None
    spark = get_spark("driver-sim")

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
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, SF01)
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(canon(r[c]) for c in scols) for r in sdf.collect()),
                key=lambda t: tuple((x is None, str(x)) for x in t),
            )
            if name not in oracles:
                print(f"  {name}: rows-only rows={len(srows)} OK")
                continue
            res = con.execute(oracles[name])
            idx = [d[0] for d in res.description]
            dcols = sorted(idx)
            drows = sorted(
                (tuple(canon(r[idx.index(c)]) for c in dcols) for r in res.fetchall()),
                key=lambda t: tuple((x is None, str(x)) for x in t),
            )
            if scols != dcols:
                fails.append((name, f"cols {scols} != {dcols}"))
            elif len(srows) != len(drows):
                fails.append((name, f"rowcount {len(srows)} != {len(drows)}"))
            elif srows != drows:
                bad = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
                fails.append((name, f"values differ, e.g. {srows[bad]} != {drows[bad]}"))
            else:
                print(f"  {name}: MATCH rows={len(srows)}")
        except Exception as e:  # noqa: BLE001 — report, keep going
            fails.append((name, f"EXC {type(e).__name__}: {e}"))
    if fails:
        print(f"\nFAILURES ({len(fails)}):")
        for name, why in fails:
            print(f"  {name}: {why}")
        return 1
    print(f"\nALL MATCH ({len([q for q in qs if not only or q in only])} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Capture .explain('formatted') for query ids into plans/r14/.

Usage: python scripts/capture_plans.py <suffix> [qid ...]
  suffix: 'before' or 'after' (file name tag)
  qids:   default = the bench HEADLINE list.

Plans are captured against $SPARK_GRAFT_SF_DIR (default sf0.1) with
the engine session (same configs bench.py runs under), so Exchange
counts / join strategies match the benched execution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlengine_spark.registry import all_queries
from sqlengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14")


def main() -> int:
    suffix = sys.argv[1]
    from bench import HEADLINE

    qids = sys.argv[2:] or HEADLINE
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan_capture")
    qs = all_queries()
    for qid in qids:
        try:
            df = qs[qid](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # side-effecting harness ops
            txt = f"PLAN CAPTURE FAILED: {exc}\n"
        path = os.path.join(OUT, f"{qid}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

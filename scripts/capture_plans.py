#!/usr/bin/env python
"""Capture .explain('formatted') for query ids into plans/<round>/.

Usage: python scripts/capture_plans.py <suffix> [qid ...]
  suffix: 'before' or 'after' (file name tag)
  qids:   default = the bench HEADLINE list.

The round directory defaults to r15 and can be overridden with
$SPARK_GRAFT_PLAN_DIR. Plans are captured against $SPARK_GRAFT_SF_DIR
(default sf0.1) with the engine session (same configs bench.py runs
under), so Exchange counts / join strategies match the benched
execution.

Exits nonzero if ANY capture fails (r14 advice: a blanket 'FAILED'
file that exits 0 can silently poison a before/after diff).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlengine_spark.registry import all_queries
from sqlengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_DIR", "r15"),
)


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        print(
            "usage: capture_plans.py <before|after> [qid ...]",
            file=sys.stderr,
        )
        return 2
    suffix = sys.argv[1]
    from bench import HEADLINE

    qids = sys.argv[2:] or HEADLINE
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan_capture")
    qs = all_queries()
    failed: list[str] = []
    for qid in qids:
        try:
            df = qs[qid](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # side-effecting harness ops
            txt = f"PLAN CAPTURE FAILED: {exc}\n"
            failed.append(qid)
        path = os.path.join(OUT, f"{qid}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}", file=sys.stderr)
    if failed:
        print(f"FAILED captures: {', '.join(failed)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

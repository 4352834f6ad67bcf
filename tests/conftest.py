"""Shared fixtures: one SparkSession per test session + a DuckDB oracle
compare loop replicating the driver's t2 check (SURVEY §5.2).

The compare is deliberately strict — row count, column names (sorted),
and exact value equality on canonicalized rows — so any driver
hash-mismatch is reproducible locally.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlengine_spark.registry import all_oracles, all_queries  # noqa: E402
from sqlengine_spark.session import TABLES, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sqlengine_spark_tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize one cell for cross-engine equality."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Queries round floats themselves (SURVEY §5.4 R1); this guard only
        # absorbs representation noise far below those rounding levels.
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def canon_rows(cols, rows):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def assert_matches_oracle(spark, duck, qid: str, sf_dir: str = SF_DIR):
    """Run queries()[qid] on Spark and oracle_sql()[qid] on DuckDB and
    compare row count, column names, and canonicalized values."""
    q = all_queries()[qid]
    sdf = q(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    sql = all_oracles()[qid]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), (
        f"{qid}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{qid}: row count mismatch spark={len(srows)} duckdb={len(drows)}"
    )
    _, s_canon = canon_rows(scols, srows)
    _, d_canon = canon_rows(dcols, drows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, (
        f"{qid}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )

"""Central operator registry.

Every operator from SURVEY.md §2 registers here exactly once via the
``@query`` decorator: a callable ``(spark, sf_dir) -> DataFrame`` plus
(optionally) the DuckDB ANSI-SQL oracle string the driver hash-compares
against. ``__spark_entry__.py``, the pytest suite, and ``bench.py`` all
read from this single source of truth, so there is zero drift between
local tests and the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(qid: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator. ``oracle=None`` marks it rows-only."""

    def deco(fn: QueryFn) -> QueryFn:
        if qid in _QUERIES:
            raise ValueError(f"duplicate query id: {qid}")
        _QUERIES[qid] = fn
        if oracle is not None:
            _ORACLES[qid] = oracle
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so decorators run (idempotent)."""
    import sqlengine_spark.operators  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def get_query(qid: str) -> QueryFn:
    _load_all()
    return _QUERIES[qid]

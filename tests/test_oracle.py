"""The main correctness gate: every registry query with a DuckDB oracle
is hash-compared at sf0.01, exactly like the driver's t2 (SURVEY §5.1-5.2).

Parametrized over the registry, so adding an operator automatically adds
its test — zero drift between local tests and the driver contract.
"""

import pytest

from sqlengine_spark.registry import all_oracles
from tests.conftest import assert_matches_oracle

ORACLED = sorted(all_oracles())


@pytest.mark.parametrize("qid", ORACLED)
def test_matches_oracle(spark, duck, qid):
    assert_matches_oracle(spark, duck, qid)

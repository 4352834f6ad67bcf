"""l_graph_pagerank algebraic invariants (beyond the DuckDB hash oracle).

The oracle proves cross-engine agreement; these tests prove the NUMBERS
are a PageRank: probability-mass accounting, the uniform lower bound,
and the blocked-graph out-degree contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sqlengine_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ranks(spark):
    return all_queries()["l_graph_pagerank"](spark, SF_DIR).collect()


def test_rank_bounds_and_mass(ranks, spark):
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(ranks) == n
    base = 0.15 / n
    # every node receives at least the teleport mass; nothing exceeds
    # total mass; ranks are finite positives
    assert all(base - 1e-9 <= r["rank"] <= 1.0 for r in ranks)
    # mass conservation: sum(ranks) = 1 minus (a) mass leaked by nodes
    # whose label block has <4 members (out-degree <3 by construction)
    # and (b) the 12-dp per-iteration rounding. With full blocks the sum
    # is 1 to ~1e-8; allow the leak term to pull it below but never above.
    total = sum(r["rank"] for r in ranks)
    assert 0.5 < total <= 1.0 + n * 1e-8


def test_blocked_outdegree(spark):
    """Rebuild the label-blocked top-3 edge list with numpy (same rule
    as the operator: candidates share a label, sim DESC with dst
    tiebreak, keep 3) and assert the out-degree contract the
    mass-conservation test leans on: every node emits exactly
    min(3, |block| - 1) edges, never more."""
    import numpy as np

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        )
    outdeg = {}
    for members in by_label.values():
        for vid, vec in members:
            sims = sorted(
                (
                    (round(float(vec @ ovec), 9), ovid)
                    for ovid, ovec in members
                    if ovid != vid
                ),
                key=lambda t: (-t[0], t[1]),
            )
            outdeg[vid] = len(sims[:3])
    assert len(outdeg) == len(rows)
    for members in by_label.values():
        want = min(3, len(members) - 1)
        for vid, _ in members:
            assert outdeg[vid] == want


def test_pca_captures_top_variance(spark):
    """The 8-step power iteration must capture >=90% of the top
    eigenvalue's variance (numpy eigendecomposition as ground truth) —
    the honest convergence bound on this deliberately flat spectrum
    (lambda1/lambda2 = 1.013)."""
    import numpy as np

    scores = {
        r["vec_id"]: r["pc1_score"]
        for r in all_queries()["l_embedding_pca"](spark, SF_DIR).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    Xc = X - X.mean(0)
    C = Xc.T @ Xc
    w = np.linalg.eigvalsh(C)
    s = np.array([scores[r["vec_id"]] for r in emb])
    # scores are Xc @ v with ||v|| = 1 (rounded), so s.s approximates
    # the Rayleigh quotient v'Cv
    assert (s @ s) / w[-1] >= 0.90

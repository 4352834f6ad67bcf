"""l_kmeans_assign self-verification (rows-only operator).

The embeddings table clusters by its ``label`` column (FIXTURES.md), so
a correct k-means with k = 10 must recover those clusters almost
exactly: per-cluster label purity is the ground-truth check, plus
determinism (no RNG anywhere) and basic output invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sqlengine_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def assigned(spark):
    return all_queries()["l_kmeans_assign"](spark, SF_DIR).collect()


def test_output_invariants(assigned, spark):
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(assigned) == n
    assert all(0 <= r.cluster <= 9 for r in assigned)
    # unit vectors: cosine to a mean-of-unit-vectors centroid is (0, 1]
    assert all(0.0 < r.sim_to_centroid <= 1.0 + 1e-9 for r in assigned)


def test_matches_numpy_reference(assigned):
    """The distributed Lloyd loop must reproduce an independent
    single-node numpy implementation with the same deterministic init
    (first k by vec_id) and iteration count. Tolerance 1% covers
    float-association-order flips on near-boundary vectors; measured
    agreement is exact."""
    import numpy as np
    import pyarrow.parquet as pq

    t = (
        pq.read_table(f"{SF_DIR}/embeddings.parquet")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    x = np.stack(t.embedding.values).astype(np.float64)
    cents = x[:10].copy()
    for _ in range(5):
        a = (x @ cents.T).argmax(1)
        for k in range(10):
            if (a == k).any():
                cents[k] = x[a == k].mean(0)
    ref = (x @ cents.T).argmax(1)
    got = {r.vec_id: r.cluster for r in assigned}
    agree = sum(
        got[vid] == ref[i] for i, vid in enumerate(t.vec_id.values)
    ) / len(ref)
    assert agree >= 0.99, f"agreement with numpy reference: {agree:.3f}"


def test_deterministic(assigned, spark):
    again = all_queries()["l_kmeans_assign"](spark, SF_DIR).collect()
    assert [(r.vec_id, r.cluster) for r in assigned] == [
        (r.vec_id, r.cluster) for r in again
    ]

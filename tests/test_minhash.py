"""MinHash-LSH validation (SURVEY §2 tier L): the candidate set from
the banded LSH must contain (essentially) every pair whose EXACT 5-gram
shingle Jaccard is high — with 16 bands of 4, P(miss | J >= 0.9) ~ 2e-8.

The exact shingle Jaccard ground truth is computed in DuckDB (inverted
index over shingles) so the check is engine-independent.
"""

import duckdb

from sqlengine_spark.registry import all_queries
from tests.conftest import SF_DIR


def _exact_high_jaccard_pairs(threshold: float) -> set[tuple[int, int]]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.execute(
        """
        WITH sh AS (
            SELECT DISTINCT doc_id, unnest(sl) AS s FROM (
                SELECT doc_id,
                       list_transform(
                           generate_series(1, greatest(length(text) - 4, 1)),
                           i -> substring(text, i, 5)) AS sl
                FROM documents)
        ),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT da, db
        FROM inter JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
        WHERE i * 1.0 / (ca.n + cb.n - i) >= ?
        """,
        [threshold],
    ).fetchall()
    con.close()
    return {(a, b) for a, b in rows}


def test_lsh_recall_at_high_jaccard(spark):
    """Every ground-truth pair at J >= 0.9 must be found (P(miss) ~ 2e-8
    per pair with 16 bands of 4)."""
    found = {
        (r["doc_a"], r["doc_b"])
        for r in all_queries()["l_dedup_near_minhash"](spark, SF_DIR).collect()
    }
    truth = _exact_high_jaccard_pairs(0.9)
    assert truth, "fixture should contain near-dup pairs"
    missed = truth - found
    assert not missed, f"missed {len(missed)} of {len(truth)} J>=0.9 pairs"


def _exact_token_jaccard_pairs(threshold: float) -> set[tuple[int, int]]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.execute(
        """
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id da, b.doc_id db, COUNT(*) i
            FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT da, db
        FROM inter JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
        WHERE i * 1.0 / (ca.n + cb.n - i) >= ?
        """,
        [threshold],
    ).fetchall()
    con.close()
    return {(a, b) for a, b in rows}


def test_simhash_recall_on_near_identical_docs(spark):
    """Near-identical documents (shingle-J >= 0.95) have near-equal tf
    vectors, so their SimHash hamming distance is tiny and the 8x8
    banding must find them."""
    found = {
        (r["doc_a"], r["doc_b"])
        for r in all_queries()["l_dedup_simhash"](spark, SF_DIR).collect()
    }
    truth = _exact_high_jaccard_pairs(0.95)
    assert truth, "fixture should contain near-identical pairs"
    missed = truth - found
    assert not missed, f"SimHash missed {len(missed)} of {len(truth)} pairs"


def test_simhash_precision_exact_verify(spark):
    """The token-Jaccard verification stage bounds the output: nothing
    below J = 0.7 survives."""
    found = {
        (r["doc_a"], r["doc_b"])
        for r in all_queries()["l_dedup_simhash"](spark, SF_DIR).collect()
    }
    truth = _exact_token_jaccard_pairs(0.7)
    bogus = found - truth
    assert not bogus, f"{len(bogus)} pairs below token-J=0.7 survived"


def test_lsh_precision_exact_verify(spark):
    """The exact-verification stage guarantees NO pair below the 0.7
    threshold survives: result must be a subset of ground truth at 0.7."""
    found = {
        (r["doc_a"], r["doc_b"])
        for r in all_queries()["l_dedup_near_minhash"](spark, SF_DIR).collect()
    }
    truth = _exact_high_jaccard_pairs(0.7)
    bogus = found - truth
    assert not bogus, f"{len(bogus)} pairs below J=0.7 survived exact verify"

"""Round-10 operator invariants beyond the registry-wide oracle
compare: structural self-checks that would catch a wrong masking /
ranking implementation even if both engines made the same mistake."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sqlengine_spark.registry import all_queries
from tests.conftest import SF_DIR_SMALL


def test_span_corrupt_reconstructs_original(spark):
    """Splicing each <Xk> sentinel's span (from target_text) back into
    input_text must reproduce the original document exactly — the
    denoising objective's round-trip property. This is independent of
    the DuckDB oracle (which could share a masking bug)."""
    out = {
        r["doc_id"]: r
        for r in all_queries()["l_span_corrupt"](spark, SF_DIR_SMALL).collect()
    }
    orig = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert set(out) == set(orig)
    n_docs_with_mask = 0
    for doc_id, r in out.items():
        spans: dict[int, list[str]] = {}
        cur = None
        for tok in r["target_text"].split(" ") if r["target_text"] else []:
            m = re.fullmatch(r"<X(\d+)>", tok)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in r["input_text"].split(" "):
            m = re.fullmatch(r"<X(\d+)>", tok)
            if m:
                rebuilt += spans[int(m.group(1))]
            else:
                rebuilt.append(tok)
        assert " ".join(rebuilt) == orig[doc_id], f"doc {doc_id} round-trip"
        assert r["n_spans"] == len(spans)
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        assert r["n_tokens"] == len(orig[doc_id].split(" "))
        if spans:
            n_docs_with_mask += 1
            # sentinels are numbered 0..k-1 in order of appearance
            assert sorted(spans) == list(range(len(spans)))
    # ~15% token mask rate makes an all-unmasked corpus implausible
    assert n_docs_with_mask > 0


def test_ivf_batch_query0_equals_single_query_ivf(spark):
    """The batched IVF shares centroid sample, probe rule, and tie
    conventions with l_sim_search_ivf — its q_id=0 slice must equal the
    single-query operator's output exactly."""
    qs = all_queries()
    single = [
        (r["vec_id"], r["sim"])
        for r in qs["l_sim_search_ivf"](spark, SF_DIR_SMALL).collect()
    ]
    batch = [
        (r["vec_id"], r["sim"])
        for r in qs["l_sim_search_ivf_batch"](spark, SF_DIR_SMALL)
        .filter(F.col("q_id") == 0)
        .collect()
    ]
    assert single == batch and len(single) == 10


def test_gini_gain_nonnegative_and_bounded(spark):
    """Gini gain of any split is in [0, 0.5] for binary labels."""
    rows = all_queries()["l_token_gini_select"](spark, SF_DIR_SMALL).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0.0 <= r["gini_gain"] <= 0.5
        assert 0 < r["n_docs"] and 0 <= r["n_en"] <= r["n_docs"]

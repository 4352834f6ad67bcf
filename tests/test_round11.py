"""Round-11 operator invariants beyond the registry-wide oracle
compare: independent Python recomputes (Counter / math.log) that would
catch a wrong formula even if both engines shared the same mistake."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from sqlengine_spark.registry import all_queries
from tests.conftest import SF_DIR_SMALL


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .collect()
    )


def test_llr_matches_python_counter_recompute(spark):
    """Dunning G² recomputed from raw Counters with math.log must match
    every emitted (pair, count, llr) row on the small fixture."""
    rows = _docs(spark)
    bi: Counter = Counter()
    left: Counter = Counter()
    right: Counter = Counter()
    n = 0
    for r in rows:
        w = r["text"].split(" ")
        for a, b in zip(w, w[1:]):
            bi[(a, b)] += 1
            left[a] += 1
            right[b] += 1
            n += 1

    def xlx(k: int) -> float:
        return 0.0 if k == 0 else k * math.log(k)

    def llr(k11: int, r_: int, c: int) -> float:
        k12, k21 = r_ - k11, c - k11
        k22 = n - r_ - c + k11
        return 2.0 * (
            xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22) + xlx(n)
            - xlx(r_) - xlx(n - r_) - xlx(c) - xlx(n - c)
        )

    expect = sorted(
        (
            (-math.floor(llr(k, left[w1], right[w2]) * 1e6 + 0.5), w1, w2, k)
            for (w1, w2), k in bi.items()
            if k >= 5
        )
    )[:50]
    got = all_queries()["l_ngram_assoc_llr"](spark, SF_DIR_SMALL).collect()
    assert len(got) == min(50, len(expect))
    for row, (negfp, w1, w2, k) in zip(got, expect):
        assert (row["w1"], row["w2"], row["n_pair"]) == (w1, w2, k)
        assert row["llr"] == (-negfp) / 1e6


def test_slice_accuracy_matches_python_wilson(spark):
    rows = _docs(spark)
    agg: dict[str, list[int]] = {}
    for r in rows:
        pred = 1 if " the " in r["text"] else 0
        truth = 1 if r["lang"] == "en" else 0
        nk = agg.setdefault(r["source"], [0, 0])
        nk[0] += 1
        nk[1] += int(pred == truth)
    got = {
        r["source"]: r
        for r in all_queries()["l_eval_slice_accuracy"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert set(got) == set(agg)
    z = 1.96
    for src, (n, k) in agg.items():
        p = k / n
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        r = got[src]
        assert (r["n"], r["k"]) == (n, k)
        assert abs(r["accuracy"] - p) < 1e-6 + 1e-12
        assert abs(r["wilson_lo"] - (center - half) / denom) < 1e-6 + 1e-12
        assert abs(r["wilson_hi"] - (center + half) / denom) < 1e-6 + 1e-12
        # Wilson bounds bracket the point estimate and stay in [0, 1]
        assert 0.0 <= r["wilson_lo"] <= r["accuracy"] <= r["wilson_hi"] <= 1.0


def test_chunk_overlap_python_reference(spark):
    """Chunk boundaries, overlap, and md5 fingerprints recomputed in
    Python; chunks must tile each doc (every token covered, stride-48
    starts, 16-token interior overlap, last chunk ends at the doc)."""
    W, S = 64, 48
    rows = _docs(spark)
    got: dict[tuple[int, int], dict] = {}
    for r in all_queries()["l_rag_chunk_overlap"](spark, SF_DIR_SMALL).collect():
        got[(r["doc_id"], r["chunk_id"])] = r
    seen = 0
    for r in rows:
        w = r["text"].split(" ")
        L = len(w)
        n_chunks = 1 if L <= W else math.ceil((L - W) / S) + 1
        for i in range(n_chunks):
            start = i * S  # 0-based
            end = min(start + W, L)
            chunk = w[start:end]
            g = got[(r["doc_id"], i)]
            assert g["start_tok"] == start + 1
            assert g["chunk_len"] == end - start
            assert g["overlap_prev"] == (0 if i == 0 else W - S)
            assert (
                g["chunk_md5"]
                == hashlib.md5(" ".join(chunk).encode()).hexdigest()
            )
            seen += 1
        # the last chunk must reach the end of the doc
        assert min((i * S) + W, L) == L or n_chunks == 1
    assert seen == len(got)

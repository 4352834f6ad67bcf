"""l_bpe_train self-verification.

A pure-Python BPE reference (Sennrich word-frequency formulation) run
on the same word counts: the learned merge effects — i.e. the final
segmentation of every vocabulary word — must be IDENTICAL, and segment
invariants must hold. (Since round 9 the operator is ALSO SQL-oracled
via the wrapped-string replace replay — this test stays as the
independent semantic pin that both engines implement BPE, not merely
the same bug.)
"""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from sqlengine_spark.operators.tier_l_pipeline import BPE_STEPS
from sqlengine_spark.registry import all_queries
from tests.conftest import SF_DIR


def _reference_segmentation(wc: dict[str, int], steps: int) -> dict[str, list[str]]:
    syms = {w: list(w) for w in wc}
    for _ in range(steps):
        cnt: collections.Counter = collections.Counter()
        for w, n in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += n
        if not cnt:
            break
        (a, b), _ = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w, s in syms.items():
            out: list[str] = []
            for t in s:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            syms[w] = out
    return syms


def test_bpe_matches_python_reference(spark):
    rows = all_queries()["l_bpe_train"](spark, SF_DIR).collect()
    got = {r["w"]: (r["n"], r["segments"]) for r in rows}

    wc_rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .count()
        .collect()
    )
    wc = {r["w"]: r["count"] for r in wc_rows}
    ref = _reference_segmentation(wc, BPE_STEPS)

    assert set(got) == set(wc)
    for w, (n, segments) in got.items():
        assert n == wc[w]
        assert segments == " ".join(ref[w])
        # segments re-concatenate to the word exactly
        assert segments.replace(" ", "") == w


def test_bpe_encode_matches_python_reference(spark):
    """l_bpe_encode's replace-chain must equal a pure-Python reference
    applying the same frozen merge table with str.replace (left-to-
    right non-overlapping — the BPE merge-application semantics) on
    random lowercase corpora, including adversarial overlap cases."""
    from hypothesis import given, settings, strategies as st

    from sqlengine_spark.operators.tier_l_pipeline import BPE_ENCODE_MERGES

    def ref_encode(text: str) -> tuple[str, int]:
        s = " ".join(text.lower().replace(" ", "|"))
        for a, b in BPE_ENCODE_MERGES:
            s = s.replace(f"{a} {b}", f"{a}{b}")
        s = s.strip()
        toks = [t for t in s.split(" ") if t != "|"]
        return s, len(toks)

    words = st.lists(
        st.text(alphabet="tablekyscnvug", min_size=1, max_size=8),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=30, deadline=None)
    @given(ws=words)
    def check(ws):
        text = " ".join(ws)
        from pyspark.sql import functions as F

        from sqlengine_spark.operators.tier_l_pipeline import _bpe_encode_expr

        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        enc = _bpe_encode_expr()
        row = df.select(
            enc.alias("e"),
            F.size(F.filter(F.split(enc, " "), lambda x: x != "|"))
            .cast("bigint")
            .alias("n"),
        ).collect()[0]
        exp_s, exp_n = ref_encode(text)
        assert row["e"] == exp_s
        assert row["n"] == exp_n

    check()

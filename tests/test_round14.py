"""Round-14 operator invariants beyond the registry-wide oracle
compare: the streaming eval report must equal its batch twin row
exactly, and the mixture-build funnel is recomputed end-to-end in
Python (gate votes, md5 dedup keep set, temperature targets, md5-rank
resample, greedy char ledger) so a shared-mistake in both engines
would still be caught."""

from __future__ import annotations

import hashlib
import math

from sqlengine_spark.registry import all_queries
from tests.conftest import SF_DIR_SMALL


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_eval_report_stream_equals_batch_row(spark):
    """The incremental twin accumulates per-pair metrics across
    micro-batches; its rollup must be value-identical to the one-shot
    batch report (same helper lineage, same bootstrap keying)."""
    batch = all_queries()["l_eval_report"](spark, SF_DIR_SMALL).collect()
    stream = all_queries()["l_eval_report_stream"](
        spark, SF_DIR_SMALL
    ).collect()
    assert len(batch) == len(stream) == 1
    assert batch[0].asDict() == stream[0].asDict()


def test_mixture_build_matches_python_recompute(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "source", "n_chars", "text")
        .collect()
    )
    # stage 1: composite gate (>=2 of 3 integer-arithmetic votes)
    gated = []
    for r in docs:
        text = r["text"]
        ln = len(text)
        punct = sum(
            1
            for ch in text.lower()
            if not (ch.isdigit() or ch == " " or "a" <= ch <= "z")
        )
        toks = len(text.split(" "))
        votes = (
            (1 if ln >= 100 else 0)
            + (1 if punct * 20 <= ln else 0)
            + (1 if toks * 3 <= ln <= toks * 12 else 0)
        )
        if votes >= 2:
            gated.append((r["doc_id"], r["source"], r["n_chars"], toks, text))
    # stage 2: exact dedup, keep MIN(doc_id) per md5(text)
    keep: dict = {}
    for doc_id, source, n_chars, toks, text in gated:
        h = _md5(text)
        if h not in keep or doc_id < keep[h][0]:
            keep[h] = (doc_id, source, n_chars, toks)
    surv = sorted(keep.values())
    # stage 3: temperature targets q ~ p^0.7, doc budget = total/2
    from collections import Counter, defaultdict

    n_dedup = Counter(s for _, s, _, _ in surv)
    total = sum(n_dedup.values())
    wq = {
        s: math.floor((n / total) ** 0.7 * 1e15 + 0.5)
        for s, n in n_dedup.items()
    }
    z = sum(wq.values())
    n_target = {
        s: math.ceil(total * 0.5 * wq[s] / z) for s in n_dedup
    }
    # resample: per source, keep the md5(doc_id)-rank prefix
    by_src: dict = defaultdict(list)
    for doc_id, source, n_chars, toks in surv:
        by_src[source].append((doc_id, n_chars, toks))
    res: dict = {}
    for s, rows in by_src.items():
        rows.sort(key=lambda r: (_md5(str(r[0])), r[0]))
        res[s] = rows[: n_target[s]]
    # stage 4: greedy char budget 20000 under (score DESC, doc_id)
    sel_n: dict = {}
    sel_chars: dict = {}
    for s, rows in res.items():
        rows = sorted(
            rows, key=lambda r: (-(r[1] * r[2] / (r[1] + 100)), r[0])
        )
        cum = 0
        for doc_id, n_chars, toks in rows:
            cum += n_chars
            if cum > 20000:
                break
            sel_n[s] = sel_n.get(s, 0) + 1
            sel_chars[s] = sel_chars.get(s, 0) + n_chars
    n_raw = Counter(r["source"] for r in docs)
    n_gated = Counter(s for _, s, _, _, _ in gated)

    got = all_queries()["l_mixture_build"](spark, SF_DIR_SMALL).collect()
    assert {r["source"] for r in got} == set(n_raw)
    for r in got:
        s = r["source"]
        assert r["n_raw"] == n_raw[s]
        assert r["n_gated"] == n_gated.get(s, 0)
        assert r["n_dedup"] == n_dedup.get(s, 0)
        assert r["n_target"] == n_target.get(s, 0)
        assert r["n_resampled"] == len(res.get(s, []))
        assert r["n_selected"] == sel_n.get(s, 0)
        assert r["chars_used"] == sel_chars.get(s, 0)
        # funnel monotonicity + budget cap
        assert r["n_raw"] >= r["n_gated"] >= r["n_dedup"] >= r["n_resampled"]
        assert r["n_resampled"] == min(r["n_target"], r["n_dedup"])
        assert r["n_selected"] <= r["n_resampled"]
        assert r["chars_used"] <= 20000

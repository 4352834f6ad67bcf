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


def test_pass_at_k_matches_exact_combinatorics(spark):
    """Recompute pass@5 with exact Python integer combinatorics
    (math.comb) and compare to the engine's product-form estimator —
    an independent derivation that would catch a factor-ordering or
    off-by-one bug even if both SQL engines shared it."""
    import math

    rows = all_queries()["l_eval_pass_at_k"](spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        n, c = r["n"], r["c"]
        assert n >= 5 and 0 <= c <= n
        exact = 1.0 - (math.comb(n - c, 5) / math.comb(n, 5))
        assert abs(r["pass_at_5"] - exact) < 1e-9, (n, c)
        if c == 0:
            assert r["pass_at_5"] == 0.0
        if n - c < 5:
            assert r["pass_at_5"] == 1.0


def test_ndcg_matches_numpy_brute_force(spark):
    """Independent nDCG recompute: numpy double dots, (-dot, vec_id)
    rank, 1/log2(rank+1) float weights — catches a weight-table or
    rank-window bug the fixed-point path could hide."""
    import math

    import numpy as np

    out = {
        r["q_id"]: r
        for r in all_queries()["l_eval_ndcg"](spark, SF_DIR_SMALL).collect()
    }
    emb = (
        spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in emb])
    mat = np.array(
        [[float(x) for x in r["embedding"]] for r in emb], dtype=np.float64
    )
    labels = np.array([r["label"] for r in emb])
    for qi in range(len(emb)):
        if ids[qi] >= 10:
            continue
        dots = mat @ mat[qi]
        mask = ids != ids[qi]
        order = sorted(
            np.nonzero(mask)[0], key=lambda j: (-dots[j], ids[j])
        )
        rel = labels[np.array(order[:10])] == labels[qi]
        dcg = sum(
            1.0 / math.log2(i + 2) for i, h in enumerate(rel) if h
        )
        n_rel = int((labels[np.array(order)] == labels[qi]).sum())
        idcg = sum(1.0 / math.log2(i + 2) for i in range(min(10, n_rel)))
        r = out[ids[qi]]
        assert r["n_rel"] == n_rel
        assert 0.0 <= r["ndcg_at_10"] <= 1.0
        want = 0.0 if n_rel == 0 else dcg / idcg
        assert abs(r["ndcg_at_10"] - want) < 1e-6, ids[qi]


def test_kalman_gain_and_variance_contract(spark):
    """Local-level Kalman invariants: gain strictly inside (0,1) after
    the first step, posterior variance positive and non-increasing
    (steady-state approach from the P0=1e4 prior), level bounded by
    the observed series envelope per type."""
    rows = all_queries()["m_ts_kalman"](spark, SF_DIR_SMALL).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["x"])):
        by_type.setdefault(r["event_type"], []).append(r)
    for et, series in by_type.items():
        assert series[0]["gain_k"] == 0.0
        lo = min(r["yc"] for r in series)
        hi = max(r["yc"] for r in series)
        prev_p = 1e4
        for r in series[1:]:
            assert 0.0 < r["gain_k"] < 1.0, et
            assert 0.0 < r["var_p"] <= prev_p + 1e-9, et
            prev_p = r["var_p"]
            assert lo - 1e-6 <= r["level_s"] <= hi + 1e-6, et


def test_cusum_charts_nonnegative_and_start_zero(spark):
    rows = all_queries()["m_ts_cusum"](spark, SF_DIR_SMALL).collect()
    assert rows
    firsts = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["x"])):
        assert r["cusum_pos"] >= 0.0 and r["cusum_neg"] >= 0.0
        assert r["alarm"] in (0, 1)
        firsts.setdefault(r["event_type"], r)
    for r in firsts.values():
        assert r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0


def test_rfm_scores_partition_customers(spark):
    rows = all_queries()["m_rfm_segment"](spark, SF_DIR_SMALL).collect()
    n_cust = (
        spark.read.parquet(f"{SF_DIR_SMALL}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5
        assert r["avg_monetary"] > 0


def test_basket_affinity_count_bounds(spark):
    rows = all_queries()["m_basket_affinity"](spark, SF_DIR_SMALL).collect()
    assert len(rows) <= 50
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["pa"] < r["pb"]
        assert 3 <= r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0 and 0 < r["confidence"] <= 1


def test_mix_shift_effects_reconstruct_total_delta(spark):
    """The decomposition identity: summed mix + rate + interaction
    effects must equal the total weighted-mean delta (computed
    independently from the emitted weights and rates)."""
    rows = all_queries()["m_mix_shift_decomp"](spark, SF_DIR_SMALL).collect()
    assert rows
    total_delta = sum(r["w2"] * r["r2_cents"] for r in rows) - sum(
        r["w1"] * r["r1_cents"] for r in rows
    )
    effect_sum = sum(
        r["mix_effect"] + r["rate_effect"] + r["interaction_effect"]
        for r in rows
    )
    assert abs(total_delta - effect_sum) < 1e-4


def test_power_mde_internal_consistency(spark):
    (r,) = all_queries()["m_ab_power_mde"](spark, SF_DIR_SMALL).collect()
    assert r["mde_abs_cents"] > 0
    assert (
        abs(r["mde_rel"] - r["mde_abs_cents"] / r["mean_control_cents"])
        < 1e-6
    )


def test_seq_editdist_histogram_covers_all_users(spark):
    rows = all_queries()["m_seq_editdist"](spark, SF_DIR_SMALL).collect()
    n_users = (
        spark.read.parquet(f"{SF_DIR_SMALL}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    dists = {r["edit_dist"]: r["n_users"] for r in rows}
    assert all(n > 0 for n in dists.values())
    assert dists.get(0, 0) >= 1  # the modal path itself


def test_bleu_matches_counter_recompute(spark):
    """Independent BLEU-2 recompute with collections.Counter clipping
    on every pair — catches a clipping or brevity-penalty bug."""
    import math
    from collections import Counter

    out = {
        r["pair_id"]: r
        for r in all_queries()["l_eval_bleu"](spark, SF_DIR_SMALL).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert out
    for pair_id, r in out.items():
        cand = docs[2 * pair_id].split(" ")
        ref = docs[2 * pair_id + 1].split(" ")
        c1, r1 = Counter(cand), Counter(ref)
        m1 = sum(min(c, r1[g]) for g, c in c1.items())
        big = lambda ts: Counter(
            " ".join(ts[i : i + 2]) for i in range(len(ts) - 1)
        )
        c2, r2 = big(cand), big(ref)
        m2 = sum(min(c, r2[g]) for g, c in c2.items())
        assert (r["lc"], r["lr"], r["m1"], r["m2"]) == (
            len(cand),
            len(ref),
            m1,
            m2,
        )
        p1 = m1 / len(cand)
        p2 = 0.0 if not c2.total() else m2 / c2.total()
        bp = (
            1.0
            if len(cand) >= len(ref)
            else math.exp(1.0 - len(ref) / len(cand))
        )
        assert abs(r["bleu2"] - bp * math.sqrt(p1 * p2)) < 1e-5
        assert 0.0 <= r["bleu2"] <= 1.0


def test_burstiness_matches_counter_recompute(spark):
    from collections import Counter

    rows = all_queries()["l_text_burstiness"](spark, SF_DIR_SMALL).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        tf = Counter(docs[r["doc_id"]].split(" "))
        v, n = len(tf), sum(tf.values())
        ss = sum(f * f for f in tf.values())
        assert (r["n_types"], r["n_tokens"]) == (v, n)
        assert abs(r["fano"] - (v * ss - n * n) / (v * n)) < 1e-8
        assert r["fano"] >= 0.0  # Cauchy-Schwarz: V*ss >= N^2


def test_group_advantage_is_standardized_per_group(spark):
    """The defining GRPO property: within every group the advantages
    have mean ~0 and population std ~1 (up to the 1e-9 output grid)."""
    import math

    rows = all_queries()["l_rl_group_advantage"](spark, SF_DIR_SMALL).collect()
    assert rows
    by_g: dict[int, list[float]] = {}
    for r in rows:
        by_g.setdefault(r["user_id"], []).append(r["advantage"])
    for uid, advs in by_g.items():
        n = len(advs)
        assert n >= 2
        mean = sum(advs) / n
        var = sum((a - mean) ** 2 for a in advs) / n
        assert abs(mean) < 1e-6, uid
        assert abs(math.sqrt(var) - 1.0) < 1e-6, uid


def test_brier_murphy_identity_and_bounds(spark):
    """brier = reliability - resolution + uncertainty + within-bin
    variance, and the within-bin variance term must be non-negative —
    the Murphy decomposition's defining identity."""
    (r,) = all_queries()["l_eval_brier"](spark, SF_DIR_SMALL).collect()
    assert 0.0 <= r["brier"] <= 1.0
    assert r["reliability"] >= 0.0 and r["resolution"] >= 0.0
    assert 0.0 <= r["uncertainty"] <= 0.25
    wbv = r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"])
    assert wbv >= -1e-6
    assert r["resolution"] <= r["uncertainty"] + 1e-9


def test_spearman_matches_python_rank_recompute(spark):
    """Independent recompute with Python average ranks — catches a
    doubled-rank ladder or tie-handling bug."""
    import statistics as st

    (r,) = all_queries()["l_eval_spearman"](spark, SF_DIR_SMALL).collect()
    docs = (
        spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
        .select("n_chars", "text")
        .collect()
    )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r_avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r_avg
            i = j + 1
        return ranks

    a = [d["n_chars"] for d in docs]
    b = [len(set(d["text"].split(" "))) for d in docs]
    ra, rb = avg_ranks(a), avg_ranks(b)
    ma, mb = st.mean(ra), st.mean(rb)
    num = sum((x - ma) * (y - mb) for x, y in zip(ra, rb))
    den = (
        sum((x - ma) ** 2 for x in ra) * sum((y - mb) ** 2 for y in rb)
    ) ** 0.5
    assert r["n"] == len(docs)
    assert abs(r["spearman_rho"] - num / den) < 1e-6


def test_filter_attrition_funnel_monotone(spark):
    rows = sorted(
        all_queries()["l_filter_attrition"](spark, SF_DIR_SMALL).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    n_docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet").count()
    prev_cum = n_docs
    for r in rows:
        assert 0 <= r["n_pass_cum"] <= min(r["n_pass_alone"], prev_cum)
        prev_cum = r["n_pass_cum"]
        assert abs(r["cum_keep_rate"] - round(r["n_pass_cum"] / n_docs, 6)) < 1e-9
    assert rows[0]["n_pass_cum"] == rows[0]["n_pass_alone"]

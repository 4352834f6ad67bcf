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


def test_embed_norm_stats_python_recompute(spark):
    vecs = (
        spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
        .select("label", "embedding")
        .collect()
    )
    agg: dict[int, list] = {}
    for r in vecs:
        # mirror the operator's sequential double fold + 1e6 half-up grid
        s = 0.0
        for x in r["embedding"]:
            s += float(x) * float(x)
        nq = math.floor(math.sqrt(s) * 1e6 + 0.5)
        a = agg.setdefault(r["label"], [0, 0, 0, None, None])
        a[0] += 1
        a[1] += int(nq == 0)
        a[2] += nq
        a[3] = nq if a[3] is None else min(a[3], nq)
        a[4] = nq if a[4] is None else max(a[4], nq)
    got = {
        r["label"]: r
        for r in all_queries()["l_embed_norm_stats"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert set(got) == set(agg)
    for lbl, (n, nz, snq, mn, mx) in agg.items():
        r = got[lbl]
        assert (r["n_vecs"], r["n_zero"]) == (n, nz)
        assert abs(r["avg_norm"] - snq / n / 1e6) < 2e-6
        assert r["min_norm"] == mn / 1e6
        assert r["max_norm"] == mx / 1e6


def test_sprt_decision_matches_python_walk(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR_SMALL}/events.parquet")
        .selectExpr(
            "CAST(user_id % 2 AS BIGINT) AS arm",
            "CAST(ts AS DATE) AS d",
            "CASE WHEN value > 150 THEN 1 ELSE 0 END AS x",
        )
        .collect()
    )
    daily: dict[tuple, list[int]] = {}
    for r in rows:
        nk = daily.setdefault((r["arm"], r["d"]), [0, 0])
        nk[0] += 1
        nk[1] += r["x"]
    hi, lo = math.log(19.0), math.log(1.0 / 19.0)
    la, lb = math.log(0.4 / 0.3), math.log(0.6 / 0.7)
    expect = {}
    for arm in {a for a, _ in daily}:
        cn = ck = 0
        hitrow = None
        g = 0.0
        for d in sorted(d_ for a, d_ in daily if a == arm):
            n, k = daily[(arm, d)]
            cn += n
            ck += k
            g = ck * la + (cn - ck) * lb
            if hitrow is None and (g >= hi or g <= lo):
                hitrow = (
                    "accept_h1" if g >= hi else "accept_h0",
                    str(d),
                    cn,
                    g,
                )
        expect[arm] = hitrow or ("continue", "", cn, g)
    got = {
        r["arm"]: r
        for r in all_queries()["m_ab_sequential_sprt"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert set(got) == set(expect)
    for arm, (dec, day, n_obs, g) in expect.items():
        r = got[arm]
        assert r["decision"] == dec
        assert r["decision_day"] == day
        assert r["n_obs"] == n_obs
        assert abs(r["llr"] - g) < 2e-6


def test_mcnemar_counter_recompute(spark):
    rows = _docs(spark)
    b = c = 0
    for r in rows:
        pa = 1 if " the " in r["text"] else 0
        pb = 1 if len(r["text"]) >= 300 else 0
        y = 1 if r["lang"] == "en" else 0
        if pa == y and pb != y:
            b += 1
        if pa != y and pb == y:
            c += 1
    [got] = all_queries()["l_eval_mcnemar"](spark, SF_DIR_SMALL).collect()
    assert (got["b"], got["c"]) == (b, c)
    if b + c:
        assert abs(got["chi2"] - (b - c) ** 2 / (b + c)) < 2e-6
    else:
        assert got["chi2"] is None


def test_auc_matches_sklearn_free_recompute(spark):
    """AUC recomputed from scratch with the probability-of-correct-
    ranking definition (all pos/neg pairs, ties count half)."""
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet").select(
        "n_chars", "lang"
    ).collect()
    pos = [r["n_chars"] for r in docs if r["lang"] == "en"]
    neg = [r["n_chars"] for r in docs if r["lang"] != "en"]
    wins = ties = 0
    from collections import Counter

    cp, cn = Counter(pos), Counter(neg)
    for vp, np_ in cp.items():
        for vn, nn_ in cn.items():
            if vp > vn:
                wins += np_ * nn_
            elif vp == vn:
                ties += np_ * nn_
    expect = (wins + ties / 2) / (len(pos) * len(neg))
    [got] = all_queries()["l_eval_auc"](spark, SF_DIR_SMALL).collect()
    assert got["n"] == len(pos) + len(neg)
    assert got["n_pos"] == len(pos)
    assert abs(got["auc"] - expect) < 2e-9
    assert 0.0 <= got["auc"] <= 1.0


def test_mrr_first_rank_matches_python_sort(spark):
    import hashlib as _h
    import math as _m

    vecs = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    ).collect()
    byid = {r["vec_id"]: r for r in vecs}
    qids = sorted(
        (( _h.md5(str(r["vec_id"]).encode()).hexdigest(), r["vec_id"])
         for r in vecs)
    )[:20]
    got = {
        r["q_id"]: r
        for r in all_queries()["l_eval_mrr"](spark, SF_DIR_SMALL).collect()
    }
    assert set(got) == {q for _, q in qids}
    for _, qid in qids:
        q = byid[qid]
        scored = []
        for r in vecs:
            if r["vec_id"] == qid:
                continue
            s = 0.0
            for a, b in zip(r["embedding"], q["embedding"]):
                s += float(a) * float(b)
            scored.append((-_m.floor(s * 1e6 + 0.5), r["vec_id"], r["label"]))
        scored.sort()
        rank = next(
            i + 1
            for i, (_, _, lbl) in enumerate(scored)
            if lbl == q["label"]
        )
        assert got[qid]["first_rank"] == rank
        assert abs(got[qid]["reciprocal_rank"] - 1.0 / rank) < 2e-9


def test_best_of_n_is_unbiased_vs_exhaustive_max(spark):
    """For each user, the BoN5 estimator must equal the exact average
    of max(reward) over ALL C(n,5) subsets (math.comb recompute)."""
    from collections import defaultdict
    from math import comb, floor

    evs = spark.read.parquet(f"{SF_DIR_SMALL}/events.parquet").select(
        "user_id", "event_id", "value"
    ).collect()
    by_user = defaultdict(list)
    for r in evs:
        by_user[r["user_id"]].append(
            (int(float(r["value"]) * 100), r["event_id"])
        )
    got = {
        r["user_id"]: r
        for r in all_queries()["l_rl_best_of_n"](spark, SF_DIR_SMALL).collect()
    }
    for uid, rewards in by_user.items():
        n = len(rewards)
        if n < 5:
            assert uid not in got
            continue
        srt = sorted(rewards)
        # exact E[max of 5 w/o replacement]: rank r is the max with
        # prob C(r-1,4)/C(n,5) — mirror the operator's 1e9 term grid
        s = 0
        for i, (rc, _) in enumerate(srt, start=1):
            if i < 5:
                continue
            p = comb(i - 1, 4) / comb(n, 5)
            s += floor(p * rc * 1e9 + 0.5)
        expect = round(s / 1e9 / 1e2, 6)
        assert got[uid]["n"] == n
        assert abs(got[uid]["bon5"] - expect) < 2e-6


def test_coverage_curve_counter_recompute(spark):
    from collections import Counter

    rows = _docs(spark)
    cnt: Counter = Counter()
    for r in rows:
        cnt.update(r["text"].split(" "))
    total = sum(cnt.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {
        r["k"]: r
        for r in all_queries()["l_ngram_coverage_curve"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert set(got) == {10, 100, 1000}
    prev = -1
    for k in (10, 100, 1000):
        covered = sum(c for _, c in ordered[:k])
        r = got[k]
        assert r["covered"] == covered
        assert r["total"] == total
        assert r["n_vocab"] == len(cnt)
        assert abs(r["coverage"] - covered / total) < 2e-9
        assert r["covered"] >= prev  # curve is monotone
        prev = r["covered"]


def test_dedup_rate_report_counter_recompute(spark):
    from collections import Counter
    import hashlib as _h

    rows = _docs(spark)
    sizes: Counter = Counter()
    for r in rows:
        sizes[_h.md5(r["text"].encode()).hexdigest()] += 1
    buckets: dict[int, list[int]] = {}
    for s in sizes.values():
        b = buckets.setdefault(min(s, 10), [0, 0])
        b[0] += 1
        b[1] += s
    got = {
        r["size_bucket"]: r
        for r in all_queries()["l_dedup_rate_report"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert set(got) == set(buckets)
    corpus = len(rows)
    for sb, (ncl, ndoc) in buckets.items():
        r = got[sb]
        assert (r["n_clusters"], r["n_docs"]) == (ncl, ndoc)
        assert r["n_removable"] == ndoc - ncl
        assert abs(r["removable_share"] - (ndoc - ncl) / corpus) < 2e-9
    # conservation: docs across buckets == corpus
    assert sum(r["n_docs"] for r in got.values()) == corpus


def test_mix_temperature_python_recompute(spark):
    from collections import Counter

    rows = _docs(spark)
    cnt = Counter(r["lang"] for r in rows)
    total = sum(cnt.values())
    w7 = {l: (n / total) ** 0.7 for l, n in cnt.items()}
    w5 = {l: (n / total) ** 0.5 for l, n in cnt.items()}
    z7, z5 = sum(w7.values()), sum(w5.values())
    got = {
        r["lang"]: r
        for r in all_queries()["l_mix_temperature"](
            spark, SF_DIR_SMALL
        ).collect()
    }
    assert set(got) == set(cnt)
    assert abs(sum(r["q_alpha07"] for r in got.values()) - 1.0) < 1e-6
    for lang, n in cnt.items():
        r = got[lang]
        assert r["n"] == n
        assert abs(r["p_raw"] - n / total) < 2e-9
        assert abs(r["q_alpha07"] - w7[lang] / z7) < 2e-9
        assert abs(r["q_alpha05"] - w5[lang] / z5) < 2e-9
        assert abs(r["epochs_alpha07"] - (w7[lang] / z7) / (n / total)) < 2e-6
        # temperature flattens: minority langs upsampled, majority down
        if n / total < 1 / len(cnt):
            assert r["q_alpha07"] >= r["p_raw"]


def test_fleiss_kappa_python_recompute(spark):
    rows = _docs(spark)
    n_pos_list = []
    for r in rows:
        n_pos_list.append(
            (1 if " the " in r["text"] else 0)
            + (1 if len(r["text"]) >= 300 else 0)
            + (1 if " and " in r["text"] else 0)
        )
    n = len(n_pos_list)
    p_pos = sum(n_pos_list) / (3 * n)
    p_bar = sum(
        (k * k + (3 - k) * (3 - k) - 3) / 6 for k in n_pos_list
    ) / n
    p_e = p_pos**2 + (1 - p_pos) ** 2
    kappa = (p_bar - p_e) / (1 - p_e)
    [got] = all_queries()["l_eval_fleiss_kappa"](spark, SF_DIR_SMALL).collect()
    assert got["n_items"] == n
    assert abs(got["p_pos"] - p_pos) < 2e-9
    assert abs(got["p_bar"] - p_bar) < 2e-9
    assert abs(got["fleiss_kappa"] - kappa) < 2e-9
    assert -1.0 <= got["fleiss_kappa"] <= 1.0


def test_ece_python_recompute(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet").select(
        "n_chars", "lang"
    ).collect()
    bins: dict[int, list] = {}
    for r in docs:
        z = float(r["n_chars"] - 40) * (r["n_chars"] - 40)
        p = z / (z + 40000.0)
        b = min(int(p * 10), 9)
        pq = math.floor(p * 1e9 + 0.5)
        e = bins.setdefault(b, [0, 0, 0])
        e[0] += 1
        e[1] += 1 if r["lang"] == "en" else 0
        e[2] += pq
    n = sum(e[0] for e in bins.values())
    gaps = {
        b: abs(k / nk - sp / nk / 1e9) for b, (nk, k, sp) in bins.items()
    }
    ece = sum(bins[b][0] * gaps[b] for b in bins) / n
    [got] = all_queries()["l_eval_ece"](spark, SF_DIR_SMALL).collect()
    assert got["n"] == n
    assert got["n_bins"] == len(bins)
    assert abs(got["ece"] - ece) < 2e-9
    assert abs(got["max_gap"] - max(gaps.values())) < 2e-9
    assert 0.0 <= got["ece"] <= got["max_gap"] <= 1.0

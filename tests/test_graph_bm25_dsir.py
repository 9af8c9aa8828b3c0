"""Unit tests for the retrieval-ranking / graph / importance-selection
tier: PageRank power iteration, Okapi BM25, DSIR log-weights, and the
Unicode script profile — each checked against an independent plain-Python
reference on hand-built fixtures (the registry queries carry the DuckDB
parity; these pin the math itself).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.graph import pagerank
from fs2_data_spark.operators.index import bm25_scores
from fs2_data_spark.operators.mixing import dsir_logweights


def _pagerank_ref(edges, damping=0.85, iters=3):
    """Dict-based reference implementation of the same recurrence."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    outw = {}
    for u, _, w in edges:
        outw[u] = outw.get(u, 0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        inflow = {v: 0.0 for v in nodes}
        for u, v, w in edges:
            inflow[v] += r[u] * w / outw[u]
        dm = sum(r[u] for u in nodes if u not in outw)
        r = {v: (1.0 - damping) / n + damping * inflow[v]
             + damping * dm / n for v in nodes}
    return r


def test_pagerank_matches_reference_and_conserves_mass(spark):
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
             ("c", "d", 1)]  # d is dangling (no out-edges)
    e = spark.createDataFrame(edges, "src string, dst string, cnt bigint")
    got = {r["node"]: r["pr"] for r in pagerank(e, iters=4).collect()}
    want = _pagerank_ref(edges, iters=4)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_zero_iters_is_uniform(spark):
    e = spark.createDataFrame([("x", "y", 1)],
                              "src string, dst string, cnt bigint")
    got = {r["node"]: r["pr"] for r in pagerank(e, iters=0).collect()}
    assert got == {"x": 0.5, "y": 0.5}


def test_pagerank_dangling_mass_redistributes(spark):
    # a -> b only: b is dangling; without redistribution total mass decays
    e = spark.createDataFrame([("a", "b", 1)],
                              "src string, dst string, cnt bigint")
    got = {r["node"]: r["pr"] for r in pagerank(e, iters=6).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["b"] > got["a"]  # b receives a's full walk mass


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in docs}
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    n = len(docs)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    dfreq = {t: sum(1 for ws in toks.values() if t in ws) for t in terms}
    out = {}
    for d, ws in toks.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * (len(ws) / avgdl)))
        if hits:
            out[d] = (hits, s)
    return out


def test_bm25_matches_reference(spark):
    docs = [(1, "join the stream now"), (2, "merge merge merge sort"),
            (3, "no relevant terms at all here"), (4, "join"),
            (5, "a much longer document where join appears once among "
                "many many other words to exercise length normalization")]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_hit"], r["score"])
           for r in bm25_scores(d, ("join", "merge", "stream")).collect()}
    want = _bm25_ref(docs, ("join", "merge", "stream"))
    assert set(got) == set(want)  # doc 3 scores nothing
    for k, (hits, s) in want.items():
        assert got[k][0] == hits
        assert got[k][1] == pytest.approx(s, abs=1e-9)
    # longer doc with the same single 'join' hit scores lower than doc 4
    assert got[5][1] < got[4][1]


def test_dsir_zero_when_target_is_everything(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "beta gamma delta", True)],
        "doc_id bigint, text string, tgt boolean")
    rows = dsir_logweights(d, F.col("tgt"), buckets=16).collect()
    assert {r["doc_id"]: r["logw"] for r in rows} == {1: 0.0, 2: 0.0}
    assert {r["doc_id"]: r["n_words"] for r in rows} == {1: 2, 2: 3}


def test_dsir_prefers_target_like_docs(spark):
    # target vocabulary is {aa bb cc}; raw adds {zz yy xx}
    rows = [(i, "aa bb cc aa bb cc", True) for i in range(5)]
    rows += [(10 + i, "zz yy xx zz yy xx", False) for i in range(5)]
    rows += [(20, "aa bb cc", False), (21, "zz yy xx", False)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string, tgt boolean")
    got = {r["doc_id"]: r["logw"]
           for r in dsir_logweights(d, F.col("tgt"), buckets=64).collect()}
    assert got[20] > got[21]  # target-like doc outweighs off-target doc


def test_dsir_excludes_empty_docs(spark):
    d = spark.createDataFrame(
        [(1, "word", True), (2, "", False), (3, "   ", False)],
        "doc_id bigint, text string, tgt boolean")
    rows = dsir_logweights(d, F.col("tgt"), buckets=8).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_script_counts_classes(spark):
    from fs2_data_spark.functions.text import script_counts
    d = spark.createDataFrame(
        [(1, "ab Ж 你 7 !"), (2, "")], "doc_id bigint, text string")
    sc = script_counts("text")
    r = {row["doc_id"]: row for row in
         d.select("doc_id", *[c.alias(k) for k, c in sc.items()])
         .collect()}
    assert (r[1]["latin"], r[1]["cyr"], r[1]["cjk"],
            r[1]["digit"], r[1]["space"]) == (2, 1, 1, 1, 4)
    assert r[1]["n_cp"] == 10
    assert all(r[2][k] == 0 for k in
               ("n_cp", "latin", "cyr", "cjk", "digit", "space"))


def _mmr_ref(vecs, qid, k=3, lam=0.7, dp=4):
    import math as m

    def cos(a, b):
        na = m.sqrt(sum(x * x for x in a))
        nb = m.sqrt(sum(x * x for x in b))
        if na <= 0 or nb <= 0:
            return 0.0
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), dp)

    pool = {i: v for i, v in vecs.items() if i != qid}
    rel = {i: cos(vecs[qid], v) for i, v in pool.items()}
    ms = {i: 0.0 for i in pool}
    out = []
    for step in range(1, k + 1):
        if not pool:
            break
        best = min(pool, key=lambda i: (-(lam * rel[i] - (1 - lam) * ms[i]),
                                        i))
        out.append((step, best, rel[best],
                    round(lam * rel[best] - (1 - lam) * ms[best], 6)))
        sv = pool.pop(best)
        for i, v in pool.items():
            ms[i] = max(ms[i], cos(v, sv))
    return out


def test_mmr_matches_reference_and_diversifies(spark):
    from fs2_data_spark.operators.similarity import mmr_select
    vecs = {
        0: [1.0, 0.0, 0.0],        # query anchor
        1: [0.9, 0.1, 0.0],        # most relevant
        2: [0.89, 0.11, 0.0],      # near-duplicate of 1
        3: [0.5, 0.5, 0.0],        # less relevant, diverse
        4: [0.0, 0.0, 1.0],        # orthogonal
        5: [0.0, 0.0, 0.0],        # zero vector (rel 0 by contract)
    }
    d = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>, label int")
    # lam=0.4 weights diversity enough that the near-duplicate loses
    # (at lam=0.7 relevance dominates and picking it is CORRECT mmr)
    got = sorted(tuple(r) for r in mmr_select(d, 0, k=3, lam=0.4).collect())
    want = sorted(_mmr_ref(vecs, 0, k=3, lam=0.4))
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=5e-5)
        assert g[3] == pytest.approx(w[3], abs=5e-6)
    # the near-duplicate of the first pick must NOT be picked second
    picked = [g[1] for g in sorted(got)]
    assert picked[0] == 1 and picked[1] != 2


def test_mmr_pool_smaller_than_k_degrades(spark):
    from fs2_data_spark.operators.similarity import mmr_select
    d = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.5, 0.5], 0)],
        "vec_id bigint, embedding array<float>, label int")
    rows = mmr_select(d, 0, k=4).collect()
    assert len(rows) == 1 and rows[0]["vec_id"] == 1


def test_temperature_mix_limits(spark):
    from fs2_data_spark.operators.mixing import temperature_mix
    rows = [(f"s{i}", "w " * c) for i, c in enumerate([1, 4, 16])
            for _ in range(3)]
    d = spark.createDataFrame(rows, "source string, text string")
    # alpha=1 keeps the raw mix
    r1 = {r["source"]: r for r in temperature_mix(d, alpha=1.0).collect()}
    for s in r1:
        assert r1[s]["p_temp"] == pytest.approx(r1[s]["p_raw"], abs=2e-6)
    # alpha=0 is uniform across sources
    r0 = {r["source"]: r for r in temperature_mix(d, alpha=0.0).collect()}
    for s in r0:
        assert r0[s]["p_temp"] == pytest.approx(1 / 3, abs=1e-6)
    # 0 < alpha < 1 flattens: tail share rises, head share falls
    rt = {r["source"]: r for r in temperature_mix(d, alpha=0.3).collect()}
    assert rt["s0"]["p_temp"] > rt["s0"]["p_raw"]
    assert rt["s2"]["p_temp"] < rt["s2"]["p_raw"]


def test_budget_select_exact_boundary(spark):
    from fs2_data_spark.operators.mixing import budget_select
    # qualities force order 3, 1, 2; tokens 4+4 fit a 8/12 budget, 4 more not
    d = spark.createDataFrame(
        [(1, 0.5, 4), (2, 0.25, 4), (3, 0.75, 4)],
        "doc_id bigint, q double, n_tok bigint")
    got = sorted((r["doc_id"], r["cum_tok"]) for r in
                 budget_select(d, F.col("q"), F.col("n_tok"),
                               budget_num=2, budget_den=3).collect())
    assert got == [(1, 8), (3, 4)]
    # boundary is inclusive: budget exactly at the prefix sum keeps it
    got2 = sorted(r["doc_id"] for r in
                  budget_select(d, F.col("q"), F.col("n_tok"),
                                budget_num=1, budget_den=3).collect())
    assert got2 == [3]  # 4 * 3 <= 12 * 1 holds exactly


def test_budget_select_ties_break_by_id(spark):
    from fs2_data_spark.operators.mixing import budget_select
    d = spark.createDataFrame(
        [(i, 0.5, 10) for i in range(6)], "doc_id bigint, q double, n_tok bigint")
    got = sorted(r["doc_id"] for r in
                 budget_select(d, F.col("q"), F.col("n_tok"),
                               budget_num=1, budget_den=2).collect())
    assert got == [0, 1, 2]


def test_label_propagation_spreads_and_clamps(spark):
    from fs2_data_spark.operators.graph import label_propagation
    # seeds: a=GOOD, b=BAD.  c hears a(3) + b(1) -> GOOD.  d hears only
    # c in round 2 -> GOOD.  b also hears a(5) but stays clamped BAD.
    edges = [("a", "c", 3), ("b", "c", 1), ("c", "d", 2), ("a", "b", 5)]
    e = spark.createDataFrame(edges, "src string, dst string, cnt bigint")
    s = spark.createDataFrame([("a", "GOOD"), ("b", "BAD")],
                              "node string, label string")
    got = {r["node"]: (r["label"], r["round"])
           for r in label_propagation(e, s, iters=2).collect()}
    assert got == {"a": ("GOOD", 0), "b": ("BAD", 0),
                   "c": ("GOOD", 1), "d": ("GOOD", 2)}


def test_label_propagation_tiebreak_is_lexicographic(spark):
    from fs2_data_spark.operators.graph import label_propagation
    edges = [("a", "c", 2), ("b", "c", 2)]  # exact vote tie at c
    e = spark.createDataFrame(edges, "src string, dst string, cnt bigint")
    s = spark.createDataFrame([("a", "Z_LBL"), ("b", "A_LBL")],
                              "node string, label string")
    got = {r["node"]: r["label"]
           for r in label_propagation(e, s, iters=1).collect()}
    assert got["c"] == "A_LBL"  # ties -> lexicographically smallest label

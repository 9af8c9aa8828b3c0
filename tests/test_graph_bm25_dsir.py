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

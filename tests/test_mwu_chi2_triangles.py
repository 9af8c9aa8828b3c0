"""Mann-Whitney U drift, chi-square keywords, triangle counting, and
lag-k autocorrelation — known-answer and edge-case tests."""

import datetime as dt

import numpy as np
import pytest

from fs2_data_spark.operators.drift import mann_whitney_u
from fs2_data_spark.operators.graph import triangle_count
from fs2_data_spark.operators.quality import chi2_keywords
from fs2_data_spark.operators.windows import lag_autocorr


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


SPLIT = "2024-01-02 00:00:00"


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, ts timestamp, "
              "value double")


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------

def _mwu_ref(base, cur):
    """Textbook U and tie-corrected z computed directly in numpy."""
    pooled = np.concatenate([base, cur])
    order = np.sort(pooled)
    # average ranks, 1-based
    ranks = {}
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and order[j] == order[i]:
            j += 1
        for v in order[i:j]:
            ranks[v] = (i + 1 + j) / 2.0
        i = j
    r1 = sum(ranks[v] for v in base)
    n1, n2 = len(base), len(cur)
    u = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    _, t = np.unique(pooled, return_counts=True)
    ties = float((t ** 3 - t).sum())
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - n1 * n2 / 2.0) / np.sqrt(sigma2)
    return u, z


def test_mwu_matches_textbook_with_ties(spark):
    base = [3.0, 1.0, 4.0, 4.0, 2.0]
    cur = [5.0, 4.0, 6.0, 2.0]
    rows = ([(i, "a", _ts(i), v) for i, v in enumerate(base)]
            + [(100 + i, "a", _ts(1440 + i), v) for i, v in enumerate(cur)])
    out = mann_whitney_u(_events(spark, rows), split=SPLIT).collect()
    assert len(out) == 1
    u_ref, z_ref = _mwu_ref(np.array(base), np.array(cur))
    assert out[0].n_base == 5 and out[0].n_cur == 4
    assert out[0].u == pytest.approx(u_ref, abs=1e-9)
    assert out[0].z == pytest.approx(z_ref, abs=1e-6)


def test_mwu_no_ties_simple(spark):
    # base {1,2,3} vs cur {4,5}: every cur beats every base -> U1 = 0
    rows = [(1, "a", _ts(0), 1.0), (2, "a", _ts(1), 2.0),
            (3, "a", _ts(2), 3.0),
            (4, "a", _ts(1441), 4.0), (5, "a", _ts(1442), 5.0)]
    out = mann_whitney_u(_events(spark, rows), split=SPLIT).collect()
    assert out[0].u == 0.0
    assert out[0].z < 0  # baseline stochastically below current


def test_mwu_drops_degenerate_groups(spark):
    rows = [
        # group "onesided": no current-period rows
        (1, "onesided", _ts(0), 1.0), (2, "onesided", _ts(1), 2.0),
        # group "alltied": both sides present but a single distinct value
        (3, "alltied", _ts(0), 7.0), (4, "alltied", _ts(1441), 7.0),
        # group "ok" survives
        (5, "ok", _ts(0), 1.0), (6, "ok", _ts(1441), 2.0),
    ]
    out = mann_whitney_u(_events(spark, rows), split=SPLIT).collect()
    assert [r.event_type for r in out] == ["ok"]


def test_mwu_excludes_nulls(spark):
    rows = [(1, "a", _ts(0), 1.0), (2, "a", _ts(1), None),
            (3, "a", _ts(1441), 2.0), (4, "a", _ts(1442), None)]
    out = mann_whitney_u(_events(spark, rows), split=SPLIT).collect()
    assert out[0].n_base == 1 and out[0].n_cur == 1


# ---------------------------------------------------------------------------
# chi-square keywords
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_chi2_keywords_finds_overrepresented_word(spark):
    # "zebra" appears only in source A; filler is shared evenly
    a_text = " ".join(["zebra"] * 6 + ["the"] * 10)
    b_text = " ".join(["the"] * 16)
    out = chi2_keywords(_docs(spark, [("A", a_text), ("B", b_text)]),
                        k=3, min_count=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert by_src["A"][0].word == "zebra"
    assert by_src["A"][0].cnt == 6
    # chi2 for the 2x2 table a=6,b=0,c=10,d=26 (N=32)
    a, b, c, d = 6.0, 0.0, 10.0, 16.0
    n = a + b + c + d
    ref = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert by_src["A"][0].chi2 == pytest.approx(ref, abs=1e-6)
    # "the" is NOT over-represented in A (10/16 < 26/32 is false: 0.625 vs
    # 0.8125 -> under-represented, filtered); B's keyword is "the"
    assert all(r.word != "the" for r in by_src["A"])
    assert by_src["B"][0].word == "the"


def test_chi2_keywords_min_count_and_rank_tiebreak(spark):
    # two words with IDENTICAL counts in A -> identical chi2 -> word asc
    a_text = " ".join(["aaa"] * 5 + ["bbb"] * 5 + ["x"] * 5)
    b_text = " ".join(["x"] * 15)
    out = chi2_keywords(_docs(spark, [("A", a_text), ("B", b_text)]),
                        k=2, min_count=5).collect()
    a_rows = sorted([r for r in out if r.source == "A"],
                    key=lambda r: r.rank)
    assert [r.word for r in a_rows] == ["aaa", "bbb"]
    assert a_rows[0].chi2 == a_rows[1].chi2
    # below min_count: a 4-occurrence word never surfaces
    c_text = " ".join(["rare"] * 4 + ["x"] * 20)
    out2 = chi2_keywords(_docs(spark, [("A", c_text), ("B", b_text)]),
                         k=5, min_count=5).collect()
    assert all(r.word != "rare" for r in out2)


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string")


def test_triangles_k4_has_four(spark):
    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    r = triangle_count(_edges(spark, pairs)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)


def test_triangles_cycle_and_star_have_none(spark):
    cycle = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a")]
    r = triangle_count(_edges(spark, cycle)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 5, 0)
    star = [("hub", f"s{i}") for i in range(6)]
    r2 = triangle_count(_edges(spark, star)).collect()[0]
    assert (r2.n_nodes, r2.n_edges, r2.n_triangles) == (7, 6, 0)


def test_triangles_ignore_direction_duplicates_selfloops(spark):
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
             ("a", "a"), ("a", "b")]
    r = triangle_count(_edges(spark, pairs)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)


def test_triangles_two_sharing_an_edge(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "c")]
    r = triangle_count(_edges(spark, pairs)).collect()[0]
    assert (r.n_edges, r.n_triangles) == (5, 2)


def test_triangles_empty(spark):
    r = triangle_count(_edges(spark, [])).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (0, 0, 0)


# ---------------------------------------------------------------------------
# lag-k autocorrelation
# ---------------------------------------------------------------------------

def _acf_ref(x, k):
    x = np.asarray(x, dtype=float)
    mu = x.mean()
    num = float(((x[:-k] - mu) * (x[k:] - mu)).sum())
    den = float(((x - mu) ** 2).sum())
    return num / den


def test_autocorr_matches_numpy(spark):
    vals = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 5.0, 8.0]
    rows = [(i, "a", _ts(i), v) for i, v in enumerate(vals)]
    out = {r.lag: r for r in lag_autocorr(
        _events(spark, rows), max_lag=3).collect()}
    for k in (1, 2, 3):
        assert out[k].n_pairs == len(vals) - k
        assert out[k].r == pytest.approx(_acf_ref(vals, k), abs=1e-6)


def test_autocorr_alternating_series_is_negative_at_lag1(spark):
    vals = [1.0, -1.0] * 6
    rows = [(i, "a", _ts(i), v) for i, v in enumerate(vals)]
    out = {r.lag: r for r in lag_autocorr(
        _events(spark, rows), max_lag=2).collect()}
    assert out[1].r < -0.8
    assert out[2].r > 0.7


def test_autocorr_drops_constant_and_short_series(spark):
    rows = ([(i, "const", _ts(i), 5.0) for i in range(6)]
            + [(10 + i, "short", _ts(i), float(i)) for i in range(3)]
            + [(20 + i, "ok", _ts(i), float(i % 3)) for i in range(8)])
    out = lag_autocorr(_events(spark, rows), max_lag=3).collect()
    by = {}
    for r in out:
        by.setdefault(r.event_type, set()).add(r.lag)
    assert "const" not in by                      # zero variance
    assert by["short"] == {1}                     # n=3 supports only lag 1
    assert by["ok"] == {1, 2, 3}


def test_autocorr_null_values_dropped_before_lagging(spark):
    # with the NULL dropped, the series is [1,2,3,4] -> lag1 pairs = 3
    rows = [(0, "a", _ts(0), 1.0), (1, "a", _ts(1), None),
            (2, "a", _ts(2), 2.0), (3, "a", _ts(3), 3.0),
            (4, "a", _ts(4), 4.0)]
    out = {r.lag: r for r in lag_autocorr(
        _events(spark, rows), max_lag=1).collect()}
    assert out[1].n_pairs == 3
    assert out[1].r == pytest.approx(_acf_ref([1, 2, 3, 4], 1), abs=1e-6)


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth
# ---------------------------------------------------------------------------

from fs2_data_spark.operators.quality import heaps_curve  # noqa: E402


def _heaps_ref(texts):
    """Brute-force running distinct over docs in id order."""
    seen, out, cum = set(), [], 0
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w != ""]
        new = len({w for w in ws if w not in seen} )
        seen.update(ws)
        cum += len(ws)
        out.append((i, len(ws), new, cum, len(seen)))
    return out


def test_heaps_curve_matches_bruteforce(spark):
    texts = ["a b c a", "b c d", "", "d e e f a", "g"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    got = sorted([(r.doc_id, r.n_tok, r.new_words, r.cum_tok, r.vocab)
                  for r in heaps_curve(df).collect()])
    assert got == _heaps_ref(texts)


def test_heaps_curve_final_totals_and_monotonicity(spark):
    import random
    rng = random.Random(7)
    texts = [" ".join(rng.choice("abcdefghij") * rng.randint(1, 3)
                      for _ in range(rng.randint(0, 12)))
             for _ in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    rows = sorted(heaps_curve(df).collect(), key=lambda r: r.doc_id)
    all_words = {w for t in texts for w in t.split(" ") if w != ""}
    assert rows[-1].vocab == len(all_words)
    assert rows[-1].cum_tok == sum(
        len([w for w in t.split(" ") if w != ""]) for t in texts)
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tok >= a.cum_tok and b.vocab >= a.vocab
        assert b.vocab - a.vocab == b.new_words

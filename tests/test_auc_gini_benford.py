"""Exact ROC-AUC (Mann-Whitney), Gini inequality, Benford audit."""

import math

import pytest

from fs2_data_spark.operators.drift import (benford_audit, exact_auc,
                                            gini_inequality)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


# ---------------------------------------------------------------------------
# exact AUC
# ---------------------------------------------------------------------------

def test_auc_perfect_separation(spark):
    rows = [(0.1, False), (0.2, False), (0.8, True), (0.9, True)]
    got = exact_auc(_scored(spark, rows), score="score",
                    label="label").collect()
    assert len(got) == 1
    assert got[0].auc == 1.0 and got[0].n_pos == 2 and got[0].n_neg == 2


def test_auc_reversed_is_zero(spark):
    rows = [(0.9, False), (0.8, False), (0.1, True), (0.2, True)]
    got = exact_auc(_scored(spark, rows)).collect()
    assert got[0].auc == 0.0


def test_auc_all_tied_is_half(spark):
    rows = [(0.5, True), (0.5, False), (0.5, True), (0.5, False)]
    got = exact_auc(_scored(spark, rows)).collect()
    assert got[0].auc == 0.5
    assert got[0].u2 == 2 * 2  # 4 pairs, each tie contributing 1 to 2U


def test_auc_brute_force_pairs(spark):
    rows = [(float((i * 7) % 10) / 10.0, (i * 3) % 4 == 0)
            for i in range(60)]
    got = exact_auc(_scored(spark, rows)).collect()
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    u2 = sum(2 if p > q else 1 if p == q else 0 for p in pos for q in neg)
    assert got[0].u2 == u2
    assert got[0].auc == pytest.approx(u2 / (2 * len(pos) * len(neg)),
                                       abs=1e-6)


def test_auc_degenerate_empty(spark):
    assert exact_auc(_scored(spark, [(0.5, True)])).collect() == []


# ---------------------------------------------------------------------------
# Gini
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, "
                                       "n_chars bigint")


def test_gini_equal_values_zero(spark):
    rows = [(i, "s", 100) for i in range(10)]
    got = gini_inequality(_docs(spark, rows)).collect()
    assert got[0].gini == 0.0 and got[0].total == 1000


def test_gini_one_holder_approaches_one(spark):
    rows = [(0, "s", 1_000_000)] + [(i, "s", 0) for i in range(1, 100)]
    got = gini_inequality(_docs(spark, rows)).collect()
    # G = (n - 1) / n for one holder among n
    assert got[0].gini == pytest.approx(99 / 100, abs=1e-6)


def test_gini_textbook_value(spark):
    # x = [1, 2, 3, 4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40
    rows = [(i, "s", i + 1) for i in range(4)]
    got = gini_inequality(_docs(spark, rows)).collect()
    assert got[0].gini == pytest.approx(0.25, abs=1e-9)


def test_gini_per_group_and_zero_total_dropped(spark):
    rows = [(1, "a", 5), (2, "a", 5), (3, "b", 0), (4, "b", 0)]
    got = {r.source: r for r in gini_inequality(_docs(spark, rows)).collect()}
    assert got["a"].gini == 0.0
    assert "b" not in got


# ---------------------------------------------------------------------------
# Benford
# ---------------------------------------------------------------------------

def test_benford_digit_extraction_and_grid(spark):
    rows = [(i, "s", v) for i, v in enumerate(
        [1, 19, 100, 999, 2, 2000, 30, -5, 0])]
    out = {r.digit: r for r in benford_audit(
        _docs(spark, rows), value="n_chars").collect()}
    assert len(out) == 9  # full grid, zero rows included
    assert out[1].n_d == 3   # 1, 19, 100
    assert out[2].n_d == 2   # 2, 2000
    assert out[3].n_d == 1   # 30
    assert out[9].n_d == 1   # 999
    assert out[4].n_d == 0
    assert out[1].n == 7     # -5 and 0 excluded


def test_benford_chi2_hand_computed(spark):
    rows = [(i, "s", d) for i, d in enumerate([1] * 30 + [2] * 18
                                              + [3] * 12 + [9] * 5)]
    out = benford_audit(_docs(spark, rows), value="n_chars").collect()
    n = 65
    chi2 = 0.0
    obs = {1: 30, 2: 18, 3: 12, 9: 5}
    for d in range(1, 10):
        e = round(n * math.log10(1 + 1 / d), 9)
        chi2 += round((obs.get(d, 0) - e) ** 2 / e, 9)
    assert out[0].chi2 == pytest.approx(chi2, abs=1e-6)


def test_benford_uniform_digits_fail_loudly(spark):
    # uniform 1-9 is NOT Benford: chi2 should be clearly nonzero
    rows = [(i, "s", (i % 9) + 1) for i in range(900)]
    out = benford_audit(_docs(spark, rows), value="n_chars").collect()
    assert out[0].chi2 > 50

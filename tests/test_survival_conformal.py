"""Kaplan-Meier survival, Cramér's V association, and split-conformal
prediction intervals."""

import datetime as dt
import math

import pytest

from fs2_data_spark.operators.drift import conformal_intervals, cramers_v
from fs2_data_spark.operators.journey import kaplan_meier


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


# ---------------------------------------------------------------------------
# Kaplan-Meier
# ---------------------------------------------------------------------------

def test_km_textbook_no_censoring(spark):
    # 4 subjects, all observed at durations 10, 20, 20, 30 minutes:
    # S(10)=3/4, S(20)=3/4 * 1/3 = 1/4 (d=2,n=3), S(30)=0
    rows = []
    eid = 0
    for u, d in [(1, 10), (2, 20), (3, 20), (4, 30)]:
        rows += [(eid, u, "view", _ts(0), 0.0),
                 (eid + 1, u, "purchase", _ts(d), 0.0)]
        eid += 2
    # pin the study end so no subject is censored at an odd time
    rows.append((99, 5, "purchase", _ts(0), 0.0))  # duration-0 observed
    out = {r.t_us: r for r in kaplan_meier(_events(spark, rows)).collect()}
    m = 60_000_000
    assert out[0 * m].d == 1 and out[0 * m].n_risk == 5
    assert out[0 * m].surv == pytest.approx(4 / 5, abs=1e-6)
    assert out[10 * m].surv == pytest.approx(4 / 5 * 3 / 4, abs=1e-6)
    assert out[20 * m].d == 2
    assert out[20 * m].surv == pytest.approx(4 / 5 * 3 / 4 * 1 / 3,
                                             abs=1e-6)
    assert out[30 * m].surv == 0.0  # last at-risk subject converts


def test_km_censoring_reduces_risk_set_without_dropping_curve(spark):
    # subjects: A purchases at 10; B never purchases (censored at end=30);
    # C purchases at 30
    rows = [(1, 1, "view", _ts(0), 0.0), (2, 1, "purchase", _ts(10), 0.0),
            (3, 2, "view", _ts(0), 0.0), (4, 2, "click", _ts(5), 0.0),
            (5, 3, "view", _ts(0), 0.0), (6, 3, "purchase", _ts(30), 0.0)]
    out = {r.t_us: r for r in kaplan_meier(_events(spark, rows)).collect()}
    m = 60_000_000
    # t=10: n=3, d=1 -> S=2/3
    assert out[10 * m].n_risk == 3
    assert out[10 * m].surv == pytest.approx(2 / 3, abs=1e-6)
    # t=30: B censored at 30 and C observed at 30 share the time point;
    # n_risk=2, d=1, c=1 -> S = 2/3 * 1/2 = 1/3
    assert out[30 * m].d == 1 and out[30 * m].c == 1
    assert out[30 * m].n_risk == 2
    assert out[30 * m].surv == pytest.approx(1 / 3, abs=1e-6)


def test_km_censor_only_time_keeps_factor_one(spark):
    rows = [(1, 1, "view", _ts(0), 0.0), (2, 1, "purchase", _ts(20), 0.0),
            (3, 2, "view", _ts(10), 0.0)]  # censored at end=20, dur=10
    out = {r.t_us: r for r in kaplan_meier(_events(spark, rows)).collect()}
    m = 60_000_000
    assert out[10 * m].d == 0 and out[10 * m].c == 1
    assert out[10 * m].surv == 1.0
    assert out[20 * m].surv == 0.0


# ---------------------------------------------------------------------------
# Cramér's V
# ---------------------------------------------------------------------------

def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_cramers_v_independent_is_zero(spark):
    # perfectly factorized 2x2 table: chi2 = 0
    rows = ([("x", "p")] * 4 + [("x", "q")] * 4
            + [("y", "p")] * 2 + [("y", "q")] * 2)
    got = cramers_v(_pairs(spark, rows), a="a", b="b").collect()
    assert len(got) == 1
    assert got[0].chi2 == 0.0 and got[0].v == 0.0
    assert got[0].n == 12 and got[0].r == 2 and got[0].c == 2


def test_cramers_v_perfect_association_is_one(spark):
    rows = [("x", "p")] * 3 + [("y", "q")] * 5
    got = cramers_v(_pairs(spark, rows), a="a", b="b").collect()
    assert got[0].v == 1.0


def test_cramers_v_hand_computed_with_empty_cell(spark):
    # table: x:(p=2, q=0), y:(p=1, q=1) — the (x, q) empty cell MUST
    # contribute its expected count
    rows = [("x", "p"), ("x", "p"), ("y", "p"), ("y", "q")]
    n = 4
    o = {("x", "p"): 2, ("x", "q"): 0, ("y", "p"): 1, ("y", "q"): 1}
    rt, ct = {"x": 2, "y": 2}, {"p": 3, "q": 1}
    chi2 = sum((o[(i, j)] - rt[i] * ct[j] / n) ** 2 / (rt[i] * ct[j] / n)
               for i in rt for j in ct)
    v = math.sqrt(chi2 / (n * 1))
    got = cramers_v(_pairs(spark, rows), a="a", b="b").collect()
    assert got[0].chi2 == pytest.approx(chi2, abs=1e-6)
    assert got[0].v == pytest.approx(v, abs=1e-6)


def test_cramers_v_degenerate_single_category_empty(spark):
    rows = [("x", "p"), ("x", "q")]
    assert cramers_v(_pairs(spark, rows), a="a", b="b").collect() == []


def test_cramers_v_nulls_excluded(spark):
    rows = [("x", "p"), ("x", None), (None, "q"), ("y", "q")]
    got = cramers_v(_pairs(spark, rows), a="a", b="b").collect()
    assert got[0].n == 2


# ---------------------------------------------------------------------------
# conformal intervals
# ---------------------------------------------------------------------------

def test_conformal_quantile_and_coverage_brute_force(spark):
    from fs2_data_spark.operators.mixing import portable_unit_hash  # noqa: F401
    rows = [(i, 1, "g", _ts(i), float((i * 13) % 97)) for i in range(400)]
    out = conformal_intervals(_events(spark, rows), value="value",
                              group="event_type", id_col="event_id",
                              alpha=0.2, seed=42).collect()
    assert len(out) == 1
    r = out[0]
    # brute-force replay with the same portable hash
    P1, M1, P2, M2 = 1_000_003, 2_654_435_761, 999_983, 40_503
    def h(i):
        return ((i * M1 + 42) % P1 * M2 + 17) % P2
    splits = {}
    for i, *_ in rows:
        u = h(i)
        splits[i] = ("train" if u < int(0.6 * P2)
                     else "calib" if u < int(0.8 * P2) else "test")
    vals = {i: float((i * 13) % 97) for i, *_ in rows}
    train = [vals[i] for i in vals if splits[i] == "train"]
    pred = round(sum(train) / len(train), 9)
    calib = sorted((abs(vals[i] - pred), i)
                   for i in vals if splits[i] == "calib")
    n_cal = len(calib)
    k = math.ceil((n_cal + 1) * 0.8)
    q = calib[k - 1][0]
    test = [abs(vals[i] - pred) for i in vals if splits[i] == "test"]
    cov = round(sum(s <= q for s in test) / len(test), 6)
    assert r.n_calib == n_cal and r.k == k
    assert r.q_hat == pytest.approx(q, abs=1e-9)
    assert r.n_test == len(test)
    assert r.coverage == pytest.approx(cov, abs=1e-9)
    # the conformal guarantee should roughly hold on this smooth data
    assert r.coverage >= 0.7


def test_conformal_tiny_calib_gives_null_qhat_full_coverage(spark):
    # alpha tiny -> k > n_calib -> infinite interval, coverage 1.0
    rows = [(i, 1, "g", _ts(i), float(i)) for i in range(40)]
    out = conformal_intervals(_events(spark, rows), alpha=0.001,
                              group="event_type").collect()
    assert len(out) == 1
    assert out[0].q_hat is None
    assert out[0].coverage == 1.0

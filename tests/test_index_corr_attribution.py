"""Inverted-index posting lists, grid Pearson correlation, last-touch
attribution."""

import datetime as dt
import math

import pytest

from fs2_data_spark.operators.drift import grid_correlation
from fs2_data_spark.operators.index import posting_lists
from fs2_data_spark.operators.sessionize import last_touch_attribution


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


# ---------------------------------------------------------------------------
# posting lists
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_postings_counts_and_order(spark):
    rows = [(1, "a b a a"), (2, "a b"), (3, "b c  c")]
    out = {r.term: r for r in posting_lists(
        _docs(spark, rows), max_postings=10).collect()}
    assert out["a"].df == 2 and out["a"].cf == 4
    assert out["a"].postings == [1, 2]          # tf 3 then tf 1
    assert out["b"].df == 3 and out["b"].cf == 3
    assert out["b"].postings == [1, 2, 3]       # tf ties -> doc_id asc
    assert out["c"].df == 1 and out["c"].cf == 2
    assert out["c"].postings == [3]


def test_postings_cap_and_min_df(spark):
    rows = [(i, "x") for i in range(20)] + [(100, "rare")]
    out = {r.term: r for r in posting_lists(
        _docs(spark, rows), max_postings=5, min_df=2).collect()}
    assert "rare" not in out
    assert out["x"].df == 20 and len(out["x"].postings) == 5
    assert out["x"].postings == [0, 1, 2, 3, 4]  # tf all 1 -> id order


# ---------------------------------------------------------------------------
# grid correlation
# ---------------------------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


def test_correlation_perfect_positive_and_negative(spark):
    rows = []
    eid = 0
    for h, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((eid, 1, "x", _ts(h * 60), v)); eid += 1
        rows.append((eid, 1, "y", _ts(h * 60), 2 * v)); eid += 1
        rows.append((eid, 1, "z", _ts(h * 60), 10 - v)); eid += 1
    got = {(r.a, r.b): r for r in grid_correlation(
        _events(spark, rows)).collect()}
    assert got[("x", "y")].r == pytest.approx(1.0, abs=1e-6)
    assert got[("x", "z")].r == pytest.approx(-1.0, abs=1e-6)
    assert got[("x", "y")].n == 4


def test_correlation_inner_join_alignment_and_hand_value(spark):
    # x observed hours 0-3, y only hours 1-3 -> n = 3 co-observed
    rows = [(0, 1, "x", _ts(0), 5.0)]
    xs, ys = [1.0, 4.0, 2.0], [2.0, 1.0, 3.0]
    eid = 1
    for h in range(3):
        rows.append((eid, 1, "x", _ts((h + 1) * 60), xs[h])); eid += 1
        rows.append((eid, 1, "y", _ts((h + 1) * 60), ys[h])); eid += 1
    got = grid_correlation(_events(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n == 3
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    exp = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx)
                                          * (n * syy - sy * sy))
    assert r.r == pytest.approx(exp, abs=1e-5)


def test_correlation_zero_variance_null_and_min_points(spark):
    rows = [(0, 1, "x", _ts(0), 1.0), (1, 1, "x", _ts(60), 2.0),
            (2, 1, "y", _ts(0), 7.0), (3, 1, "y", _ts(60), 7.0),
            (4, 1, "z", _ts(0), 1.0)]
    got = {(r.a, r.b): r for r in grid_correlation(
        _events(spark, rows)).collect()}
    assert got[("x", "y")].r is None     # y variance 0
    assert ("x", "z") not in got         # 1 co-observed bucket < 2


def test_correlation_buckets_aggregate_within_hour(spark):
    # two events of x in the same hour sum before correlating
    rows = [(0, 1, "x", _ts(0), 1.0), (1, 1, "x", _ts(30), 2.0),
            (2, 1, "y", _ts(0), 3.0),
            (3, 1, "x", _ts(60), 6.0), (4, 1, "y", _ts(60), 6.0)]
    got = grid_correlation(_events(spark, rows)).collect()
    assert got[0].n == 2
    # x buckets: 3, 6 ; y buckets: 3, 6 -> r = 1
    assert got[0].r == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# last-touch attribution
# ---------------------------------------------------------------------------

def test_attribution_last_touch_within_session(spark):
    rows = [
        # session: view -> click -> purchase(100) => click credited
        (1, 1, "view", _ts(0), 0.0), (2, 1, "click", _ts(5), 0.0),
        (3, 1, "purchase", _ts(10), 100.0),
        # 40-min gap -> new session: purchase with no touch => direct
        (4, 1, "purchase", _ts(60), 50.0),
        # user 2: view then purchase => view credited
        (5, 2, "view", _ts(0), 0.0), (6, 2, "purchase", _ts(1), 30.0),
    ]
    got = {r.channel: r for r in last_touch_attribution(
        _events(spark, rows), gap_s=1800).collect()}
    assert got["click"].n_conv == 1 and got["click"].revenue == 100.0
    assert got["direct"].n_conv == 1 and got["direct"].revenue == 50.0
    assert got["view"].n_conv == 1 and got["view"].revenue == 30.0


def test_attribution_equal_timestamp_gets_no_credit(spark):
    rows = [(1, 1, "click", _ts(0), 0.0),
            (2, 1, "purchase", _ts(0), 10.0)]
    got = {r.channel: r for r in last_touch_attribution(
        _events(spark, rows)).collect()}
    # tiebreak order: click (id 1) precedes purchase (id 2) -> credited
    assert got["click"].n_conv == 1
    rows2 = [(2, 1, "click", _ts(0), 0.0),
             (1, 1, "purchase", _ts(0), 10.0)]
    got2 = {r.channel: r for r in last_touch_attribution(
        _events(spark, rows2)).collect()}
    # purchase (id 1) sorts before click (id 2): no prior touch
    assert got2["direct"].n_conv == 1


def test_attribution_prior_purchase_not_a_touch(spark):
    rows = [(1, 1, "purchase", _ts(0), 5.0),
            (2, 1, "purchase", _ts(1), 7.0)]
    got = {r.channel: r for r in last_touch_attribution(
        _events(spark, rows)).collect()}
    assert got["direct"].n_conv == 2
    assert got["direct"].revenue == 12.0

"""Ordered funnel conversion, cohort retention, and the exact
two-sample KS drift statistic."""

import datetime as dt

import pytest

from fs2_data_spark.operators.drift import ks_drift
from fs2_data_spark.operators.journey import cohort_retention, funnel_steps


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, 1, "view", _ts(0), 0.0), (2, 1, "click", _ts(1), 0.0),
        (3, 1, "purchase", _ts(2), 0.0),
        # user 2 purchases BEFORE viewing: only step 1 counts
        (4, 2, "purchase", _ts(0), 0.0), (5, 2, "view", _ts(1), 0.0),
        # user 3 views then clicks, never purchases
        (6, 3, "view", _ts(0), 0.0), (7, 3, "click", _ts(5), 0.0),
        # user 4 never views: not in the funnel at all
        (8, 4, "click", _ts(0), 0.0), (9, 4, "purchase", _ts(1), 0.0),
    ]
    out = {r.step: r for r in funnel_steps(
        _events(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out[1].n_reached == 3          # users 1, 2, 3
    assert out[2].n_reached == 2          # users 1, 3
    assert out[3].n_reached == 1          # user 1 only
    assert out[1].conv_from_prev == 1.0
    assert out[2].conv_from_prev == pytest.approx(2 / 3, abs=1e-6)
    assert out[3].conv_from_first == pytest.approx(1 / 3, abs=1e-6)


def test_funnel_equal_timestamp_does_not_advance(spark):
    rows = [(1, 1, "view", _ts(0), 0.0), (2, 1, "click", _ts(0), 0.0),
            (3, 1, "click", _ts(9), 0.0)]
    out = {r.step: r for r in funnel_steps(
        _events(spark, rows), ["view", "click"]).collect()}
    # the simultaneous click is not "after" the view; the later one is
    assert out[2].n_reached == 1
    rows2 = [(1, 1, "view", _ts(0), 0.0), (2, 1, "click", _ts(0), 0.0)]
    out2 = {r.step: r for r in funnel_steps(
        _events(spark, rows2), ["view", "click"]).collect()}
    assert out2[2].n_reached == 0


def test_funnel_first_touch_attribution(spark):
    # second view resets nothing: step 2 matches after the FIRST view
    rows = [(1, 1, "view", _ts(0), 0.0), (2, 1, "view", _ts(50), 0.0),
            (3, 1, "click", _ts(10), 0.0)]
    out = {r.step: r for r in funnel_steps(
        _events(spark, rows), ["view", "click"]).collect()}
    assert out[2].n_reached == 1


def test_funnel_empty_step_keeps_zero_row(spark):
    rows = [(1, 1, "view", _ts(0), 0.0)]
    out = {r.step: r for r in funnel_steps(
        _events(spark, rows), ["view", "signup", "purchase"]).collect()}
    assert out[2].n_reached == 0 and out[3].n_reached == 0
    assert out[2].conv_from_prev == 0.0
    assert out[3].conv_from_prev is None  # 0/0 stated as NULL


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------

def test_cohort_retention_hand_counted(spark):
    day = 1440  # minutes
    rows = [
        # users 1, 2 first seen in bucket 0 (days 0-6); user 3 in bucket 1
        (1, 1, "a", _ts(0), 0.0), (2, 2, "a", _ts(day * 2), 0.0),
        (3, 3, "a", _ts(day * 8), 0.0),
        # user 1 returns in week 1 and week 2; user 2 never returns
        (4, 1, "a", _ts(day * 7), 0.0), (5, 1, "a", _ts(day * 15), 0.0),
        # user 3 returns in its week 1
        (6, 3, "a", _ts(day * 16), 0.0),
    ]
    got = {(r.cohort, r.offset): r for r in cohort_retention(
        _events(spark, rows)).collect()}
    # epoch-aligned weekly grid: 2024-01-01 is mid-bucket, so compute
    # the cohort indexes from the data itself
    c0 = min(c for c, _ in got)
    assert got[(c0, 0)].n_active == 2 and got[(c0, 0)].n_cohort == 2
    assert got[(c0, 0)].retention == 1.0


def test_cohort_retention_grid_math(spark):
    # bucket_us = 1 hour: exact offsets, no calendar involved
    h = 3_600_000_000
    rows = [(1, 1, "a", _ts(0), 0.0),     # cohort bucket B
            (2, 1, "a", _ts(61), 0.0),    # offset 1
            (3, 1, "a", _ts(185), 0.0),   # offset 3
            (4, 2, "a", _ts(30), 0.0)]    # same cohort, never returns
    got = {(r.cohort, r.offset): r for r in cohort_retention(
        _events(spark, rows), bucket_us=h).collect()}
    offs = sorted(o for _, o in got)
    assert offs == [0, 1, 3]
    (c,) = {c for c, _ in got}
    assert got[(c, 0)].n_active == 2
    assert got[(c, 1)].n_active == 1
    assert got[(c, 1)].retention == 0.5
    assert got[(c, 3)].n_active == 1


def test_cohort_distinct_within_cell(spark):
    # many events in one cell count the key once
    rows = [(i, 1, "a", _ts(i), 0.0) for i in range(5)]
    got = cohort_retention(_events(spark, rows),
                           bucket_us=86_400_000_000).collect()
    assert len(got) == 1 and got[0].n_active == 1


# ---------------------------------------------------------------------------
# KS drift
# ---------------------------------------------------------------------------

def _split_events(spark, base, cur, group="g"):
    rows = ([(i, 1, group, _ts(0), v) for i, v in enumerate(base)]
            + [(1000 + i, 1, group, _ts(30 * 1440), v)
               for i, v in enumerate(cur)])
    return _events(spark, rows)


def test_ks_identical_samples_zero(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    out = ks_drift(_split_events(spark, vals, vals),
                   split="2024-01-16 00:00:00").collect()
    assert len(out) == 1
    assert out[0].d == 0.0
    assert out[0].n_base == 4 and out[0].n_cur == 4


def test_ks_disjoint_samples_one(spark):
    out = ks_drift(_split_events(spark, [1.0, 2.0], [10.0, 11.0]),
                   split="2024-01-16 00:00:00").collect()
    assert out[0].d == 1.0


def test_ks_hand_computed_with_ties(spark):
    # base: 1,2,2,3  cur: 2,3,3,4
    # pooled support 1,2,3,4:
    #   F_b = .25,.75,1,1 ; F_c = 0,.25,.75,1 ; diffs .25,.5,.25,0
    out = ks_drift(_split_events(spark, [1.0, 2.0, 2.0, 3.0],
                                 [2.0, 3.0, 3.0, 4.0]),
                   split="2024-01-16 00:00:00").collect()
    assert out[0].d == pytest.approx(0.5, abs=1e-9)


def test_ks_agrees_with_scipy_style_brute_force(spark):
    import itertools
    base = [float((i * 7) % 13) for i in range(20)]
    cur = [float((i * 5) % 11) + 0.5 for i in range(15)]
    out = ks_drift(_split_events(spark, base, cur),
                   split="2024-01-16 00:00:00").collect()
    support = sorted(set(base) | set(cur))
    d = max(abs(sum(v <= x for v in base) / len(base)
                - sum(v <= x for v in cur) / len(cur)) for x in support)
    assert out[0].d == pytest.approx(d, abs=1e-6)


def test_ks_null_values_and_empty_side(spark):
    rows = [(1, 1, "g", _ts(0), 1.0), (2, 1, "g", _ts(0), None),
            (3, 1, "h", _ts(0), 5.0)]  # group h has no current side
    out = ks_drift(_events(spark, rows),
                   split="2024-01-16 00:00:00").collect()
    assert out == []  # g has no current rows either -> dropped

"""Future-outcome labels (strict t' > t), session co-occurrence lift,
and calibration reliability/ECE."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.drift import calibration_bins
from fs2_data_spark.operators.sessionize import session_cooccurrence
from fs2_data_spark.operators.windows import future_outcome_labels


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


# ---------------------------------------------------------------------------
# future-outcome labels
# ---------------------------------------------------------------------------

def test_future_labels_strictly_future_window(spark):
    rows = [(1, 1, "view", _ts(0), 10.0),
            (2, 1, "view", _ts(30), 20.0),
            (3, 1, "purchase", _ts(59), 30.0),
            (4, 1, "view", _ts(61), 40.0),
            (5, 1, "view", _ts(200), 50.0)]
    out = {r.event_id: r for r in future_outcome_labels(
        _events(spark, rows), horizon_us=3_600_000_000,
        outcome=(F.col("event_type") == "purchase")).collect()}
    # event 1: future (0, 60m] -> events 2, 3 (not itself, not 4 at 61m)
    assert out[1].fut_cnt == 2 and out[1].fut_sum == 50.0
    assert out[1].fut_outcome == 1
    # event 2: (30, 90m] -> events 3, 4
    assert out[2].fut_cnt == 2 and out[2].fut_sum == 70.0
    assert out[2].fut_outcome == 1
    # event 4: (61, 121m] -> nothing
    assert out[4].fut_cnt == 0 and out[4].fut_sum == 0.0
    assert out[4].fut_outcome == 0
    # last event: empty future
    assert out[5].fut_cnt == 0


def test_future_labels_exclude_equal_timestamps_and_other_keys(spark):
    rows = [(1, 1, "a", _ts(0), 1.0), (2, 1, "a", _ts(0), 2.0),
            (3, 2, "a", _ts(1), 4.0)]
    out = {r.event_id: r for r in future_outcome_labels(
        _events(spark, rows), horizon_us=3_600_000_000).collect()}
    # same-instant peer is NOT in (t, t+h]; other key's event never is
    assert out[1].fut_cnt == 0 and out[2].fut_cnt == 0
    assert out[3].fut_cnt == 0


def test_future_labels_agree_with_brute_force(spark):
    rows = [(i, i % 3, "t", _ts(i * 7), float(i)) for i in range(60)]
    h_us = 30 * 60 * 1_000_000
    out = {r.event_id: r for r in future_outcome_labels(
        _events(spark, rows), horizon_us=h_us).collect()}
    for i, k, _, t, v in rows:
        fut = [float(j) for j, kk, _, tt, vv in rows
               if kk == k and t < tt <= t + dt.timedelta(minutes=30)]
        assert out[i].fut_cnt == len(fut), i
        assert out[i].fut_sum == pytest.approx(sum(fut), abs=1e-6)


# ---------------------------------------------------------------------------
# session co-occurrence
# ---------------------------------------------------------------------------

def test_cooccurrence_hand_counted(spark):
    # user 1 session A: {a, b}; 40-min gap; session B: {a}
    # user 2 session C: {b, c}
    rows = [(1, 1, "a", _ts(0), 0.0), (2, 1, "b", _ts(5), 0.0),
            (3, 1, "a", _ts(60), 0.0),
            (4, 2, "b", _ts(0), 0.0), (5, 2, "c", _ts(1), 0.0)]
    got = {(r.state_a, r.state_b): r for r in session_cooccurrence(
        _events(spark, rows), gap_s=1800).collect()}
    ab = got[("a", "b")]
    assert ab.n_ab == 1 and ab.n_a == 2 and ab.n_b == 2
    assert ab.n_sessions == 3
    assert ab.lift == pytest.approx(3 * 1 / (2 * 2), abs=1e-9)
    bc = got[("b", "c")]
    assert bc.n_ab == 1 and bc.n_b == 1
    assert bc.lift == pytest.approx(3 * 1 / (2 * 1), abs=1e-9)
    assert ("a", "c") not in got  # never share a session


def test_cooccurrence_distinct_within_session(spark):
    # repeated states inside one session count once
    rows = [(i, 1, "a" if i % 2 == 0 else "b", _ts(i), 0.0)
            for i in range(10)]
    got = session_cooccurrence(_events(spark, rows), gap_s=1800).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.state_a, r.state_b, r.n_ab, r.n_sessions) == ("a", "b", 1, 1)
    assert r.lift == 1.0


# ---------------------------------------------------------------------------
# calibration / ECE
# ---------------------------------------------------------------------------

def _preds(spark, rows):
    return spark.createDataFrame(rows, "pred double, outcome boolean")


def test_perfectly_calibrated_low_ece(spark):
    rows = []
    # bin [0.2, 0.3): conf 0.25, acc 0.25 (1 of 4); bin [0.8, 0.9): 0.85, acc 0.85 is
    # not integral -> use 4/5 with conf 0.8
    rows += [(0.25, i == 0) for i in range(4)]
    rows += [(0.8, i < 4) for i in range(5)]
    out = {r.bin: r for r in calibration_bins(_preds(spark, rows)).collect()}
    assert out[2].n_b == 4 and out[2].conf == 0.25 and out[2].acc == 0.25
    assert out[8].n_b == 5 and out[8].conf == 0.8 and out[8].acc == 0.8
    assert out[2].ece == pytest.approx(0.0, abs=1e-9)


def test_miscalibrated_ece_hand_computed(spark):
    # one bin, conf 0.9, acc 0.5 -> ece = |0.5 - 0.9| = 0.4
    rows = [(0.9, True), (0.9, False)]
    got = calibration_bins(_preds(spark, rows)).collect()
    assert len(got) == 1
    assert got[0].ece == pytest.approx(0.4, abs=1e-9)
    assert got[0].gap == pytest.approx(0.4, abs=1e-9)


def test_pred_one_clamps_into_top_bin(spark):
    rows = [(1.0, True), (0.95, True)]
    got = calibration_bins(_preds(spark, rows)).collect()
    assert len(got) == 1 and got[0].bin == 9 and got[0].n_b == 2

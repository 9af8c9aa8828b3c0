"""Drift monitors: PSI, CUSUM change detection, per-source KL divergence.

The contracts under test: CUSUM's window closed form equals the textbook
recurrence row for row; PSI/KL are ~0 on identical distributions, strictly
positive under shift, and KL is non-negative (Gibbs) for every source.
"""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.drift import (cusum_drift, kl_source_divergence,
                                            psi_drift)


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------

def _cusum_brute(values, target, slack):
    s, out = 0.0, []
    for v in values:
        s = max(0.0, s + (round(v - target - slack, 6)))
        out.append(round(s, 6))
    return out


def test_cusum_matches_recurrence(spark):
    vals = [55.0, 60.0, 40.0, 70.0, 30.0, 90.0, 90.0, 10.0, 100.0]
    rows = [(i, 1, "a", _ts(i), v) for i, v in enumerate(vals)]
    got = (cusum_drift(_events(spark, rows), target=50.0, slack=5.0, h=40.0)
           .orderBy("event_id").collect())
    want = _cusum_brute(vals, 50.0, 5.0)
    assert [r.cusum for r in got] == pytest.approx(want, abs=1e-9)
    assert [r.alarm for r in got] == [w > 40.0 for w in want]


def test_cusum_zero_mean_process_stays_low_and_per_key(spark):
    rows = [(i, i % 3, "a", _ts(i), 50.0 + (1.0 if i % 2 else -1.0))
            for i in range(30)]
    got = cusum_drift(_events(spark, rows), target=50.0, slack=5.0).collect()
    # deviations are always <= -4: the statistic is clamped at 0 everywhere
    assert all(r.cusum == 0.0 for r in got)
    # a persistent +20 shift on one key only alarms that key
    rows += [(100 + i, 9, "a", _ts(100 + i), 70.0) for i in range(10)]
    got = (cusum_drift(_events(spark, rows), target=50.0, slack=5.0, h=100.0)
           .filter(F.col("alarm")).collect())
    assert got and all(r.user_id == 9 for r in got)
    # closed form on key 9: S_n = n * 15
    k9 = (cusum_drift(_events(spark, rows), target=50.0, slack=5.0)
          .filter(F.col("user_id") == 9).orderBy("event_id").collect())
    assert [r.cusum for r in k9] == [15.0 * (i + 1) for i in range(10)]


# ---------------------------------------------------------------------------
# PSI
# ---------------------------------------------------------------------------

def test_psi_identical_periods_near_zero_and_shift_detected(spark):
    base = [(i, 1, "t", _ts(i), float(i % 10)) for i in range(100)]
    same = [(1000 + i, 1, "t", _ts(30000 + i), float(i % 10))
            for i in range(100)]
    shifted = [(2000 + i, 1, "s", _ts(i), float(i % 10)) for i in range(100)]
    shifted += [(3000 + i, 1, "s", _ts(30000 + i), float(i % 10) + 6.0)
                for i in range(100)]
    df = _events(spark, base + same + shifted)
    got = {r.event_type: r for r in
           psi_drift(df, split="2024-01-16 00:00:00", k=10).collect()}
    assert got["t"].psi == pytest.approx(0.0, abs=1e-6)
    assert got["s"].psi > 0.25
    assert got["t"].n_base == 100 and got["t"].n_cur == 100


def test_psi_degenerate_baseline_dropped(spark):
    rows = [(i, 1, "c", _ts(i), 5.0) for i in range(10)]
    rows += [(100 + i, 1, "c", _ts(30000 + i), float(i)) for i in range(10)]
    assert psi_drift(_events(spark, rows)).count() == 0


def test_psi_empty_bins_carry_smoothed_terms(spark):
    # baseline occupies bins 0..9; current collapses onto one value ->
    # 9 bins empty in current but present in the grid; PSI must count them
    rows = [(i, 1, "c", _ts(i), float(i)) for i in range(10)]
    rows += [(100 + i, 1, "c", _ts(30000 + i), 0.0) for i in range(10)]
    r = psi_drift(_events(spark, rows), k=10).collect()[0]
    nb, nc, k = 10, 10, 10
    want = 0.0
    for b in range(k):
        pb = (1 + 0.5) / (nb + 5.0)
        pc = ((10 if b == 0 else 0) + 0.5) / (nc + 5.0)
        want += round((pb - pc) * math.log(pb / pc), 9)
    assert r.psi == pytest.approx(want, abs=1e-6)


# ---------------------------------------------------------------------------
# KL divergence per source
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, "
                                       "tokens array<int>")


def test_kl_uniform_sources_near_zero(spark):
    rows = [(i, f"s{i % 2}", [1, 2, 3, 4]) for i in range(20)]
    got = kl_source_divergence(_docs(spark, rows)).collect()
    assert len(got) == 2
    for r in got:
        assert r.kl == pytest.approx(0.0, abs=1e-9)
        assert r.n_tok_src == 40 and r.vocab_src == 4


def test_kl_nonnegative_and_orders_by_skew(spark):
    rows = ([(i, "bal", [1, 2, 3, 4]) for i in range(10)]
            + [(100 + i, "skew", [1, 1, 1, 2]) for i in range(10)]
            + [(200 + i, "mono", [9, 9, 9, 9]) for i in range(10)])
    got = {r.source: r.kl for r in
           kl_source_divergence(_docs(spark, rows)).collect()}
    assert all(v >= 0.0 for v in got.values())
    # the source with tokens unseen elsewhere diverges most
    assert got["mono"] > got["skew"] > got["bal"]


def test_kl_unseen_vocab_counts_via_smoothing(spark):
    # source "a" never emits token 5; the grid still charges it mass
    rows = [(1, "a", [1, 1]), (2, "b", [5, 5])]
    got = {r.source: r for r in
           kl_source_divergence(_docs(spark, rows), alpha=0.5).collect()}
    a, v, n = 0.5, 2, 4
    for src, cs in (("a", {1: 2, 5: 0}), ("b", {1: 0, 5: 2})):
        want = 0.0
        for t in (1, 5):
            ps = (cs[t] + a) / (2 + a * v)
            pc = (2 + a) / (n + a * v)
            want += round(ps * math.log(ps / pc), 9)
        assert got[src].kl == pytest.approx(round(want, 6), abs=1e-9)

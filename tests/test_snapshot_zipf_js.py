"""PIT snapshot feature matrix, Zipf slope fit, JS source divergence."""

import datetime as dt
import math

import pytest

from fs2_data_spark.operators.drift import js_source_divergence
from fs2_data_spark.operators.index import zipf_slope
from fs2_data_spark.operators.windows import snapshot_features

US_H = 3_600_000_000
EPOCH_2024 = int(dt.datetime(2024, 1, 1,
                             tzinfo=dt.timezone.utc).timestamp() * 1e6)


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


# ---------------------------------------------------------------------------
# snapshot features
# ---------------------------------------------------------------------------

def test_snapshot_strict_pit_window(spark):
    c1 = EPOCH_2024 + 24 * US_H       # cutoff at day-1 midnight
    c2 = EPOCH_2024 + 48 * US_H
    rows = [(1, 1, "a", _ts(60), 10.0),       # day 0, 01:00
            (2, 1, "b", _ts(23 * 60), 20.0),  # day 0, 23:00
            (3, 1, "a", _ts(25 * 60), 40.0)]  # day 1, 01:00
    out = {(r.user_id, r.cutoff_us): r for r in snapshot_features(
        _events(spark, rows), cutoffs_us=[c1, c2],
        lookback_us=24 * US_H).collect()}
    s1 = out[(1, c1)]
    assert s1.n == 2 and s1.sum_v == 30.0 and s1.n_states == 2
    s2 = out[(1, c2)]
    assert s2.n == 1 and s2.sum_v == 40.0 and s2.n_states == 1


def test_snapshot_boundary_inclusive_exclusive(spark):
    c = EPOCH_2024 + 24 * US_H
    rows = [(1, 1, "a", _ts(24 * 60), 5.0),   # exactly AT cutoff: in
            (2, 1, "a", _ts(0), 7.0)]         # exactly c - lookback: out
    out = {(r.user_id, r.cutoff_us): r for r in snapshot_features(
        _events(spark, rows), cutoffs_us=[c],
        lookback_us=24 * US_H).collect()}
    assert out[(1, c)].n == 1 and out[(1, c)].sum_v == 5.0


def test_snapshot_event_feeds_multiple_cutoffs(spark):
    cuts = [EPOCH_2024 + 24 * US_H, EPOCH_2024 + 36 * US_H]
    rows = [(1, 1, "a", _ts(20 * 60), 3.0)]   # hour 20: in both windows
    out = snapshot_features(_events(spark, rows), cutoffs_us=cuts,
                            lookback_us=24 * US_H).collect()
    assert len(out) == 2
    assert {r.cutoff_us for r in out} == set(cuts)


def test_snapshot_silent_keys_absent(spark):
    c = EPOCH_2024 + 100 * 24 * US_H  # far future cutoff
    rows = [(1, 1, "a", _ts(0), 1.0)]
    out = snapshot_features(_events(spark, rows), cutoffs_us=[c],
                            lookback_us=24 * US_H).collect()
    assert out == []


# ---------------------------------------------------------------------------
# Zipf slope
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_zipf_exact_power_law_recovers_slope(spark):
    # construct frequencies f(r) = round(1000 * r^-1): slope ~ -1
    rows = []
    did = 0
    for r in range(1, 21):
        term = f"w{r:02d}"
        f = max(1, round(1000 / r))
        rows.append((did, " ".join([term] * f))); did += 1
    got = zipf_slope(_docs(spark, rows), top_v=20).collect()
    assert len(got) == 1
    assert got[0].v_used == 20
    assert got[0].slope == pytest.approx(-1.0, abs=0.02)


def test_zipf_uniform_frequencies_slope_zero(spark):
    rows = [(i, " ".join([f"t{i:02d}"] * 7)) for i in range(10)]
    got = zipf_slope(_docs(spark, rows), top_v=10).collect()
    assert got[0].slope == pytest.approx(0.0, abs=1e-9)
    assert got[0].intercept == pytest.approx(math.log(7), abs=1e-6)


def test_zipf_cap_discloses_v_used(spark):
    rows = [(i, f"a{i} common") for i in range(30)]
    got = zipf_slope(_docs(spark, rows), top_v=5).collect()
    assert got[0].v_used == 5


# ---------------------------------------------------------------------------
# JS divergence
# ---------------------------------------------------------------------------

def _tok_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, "
                                       "tokens array<int>")


def test_js_identical_sources_near_zero_and_bounded(spark):
    rows = [(1, "a", [1, 2, 3] * 10), (2, "b", [1, 2, 3] * 10)]
    out = {r.source: r for r in js_source_divergence(
        _tok_docs(spark, rows)).collect()}
    # each source is exactly half the corpus with identical distribution
    assert out["a"].js == pytest.approx(0.0, abs=1e-6)
    assert out["b"].js == pytest.approx(0.0, abs=1e-6)


def test_js_disjoint_sources_positive_below_ln2(spark):
    rows = [(1, "a", [1] * 50), (2, "b", [2] * 50)]
    out = {r.source: r for r in js_source_divergence(
        _tok_docs(spark, rows)).collect()}
    for s in ("a", "b"):
        assert 0.0 < out[s].js < math.log(2) + 1e-9


def test_js_smaller_than_kl_on_drifted_source(spark):
    from fs2_data_spark.operators.drift import kl_source_divergence
    rows = [(1, "a", [1] * 80 + [2] * 20), (2, "b", [2] * 90 + [3] * 10)]
    js = {r.source: r.js for r in js_source_divergence(
        _tok_docs(spark, rows)).collect()}
    kl = {r.source: r.kl for r in kl_source_divergence(
        _tok_docs(spark, rows)).collect()}
    for s in ("a", "b"):
        assert js[s] <= kl[s] + 1e-9

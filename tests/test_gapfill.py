"""Gap-fill (time-grid resample) and time-weighted average semantics:
hand-computed fixtures, zero temporal leakage on the LOCF path, grid
alignment, interpolation math, degenerate keys."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.gapfill import time_grid_fill
from fs2_data_spark.operators.windows import time_weighted_avg

T0 = dt.datetime(2024, 1, 1)  # epoch-aligned midnight, multiple of 1h
HOUR_US = 3_600_000_000


def ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def us(minutes: float) -> int:
    return int(T0.timestamp() * 1_000_000) + int(minutes * 60_000_000)


@pytest.fixture(scope="module")
def obs(spark):
    return spark.createDataFrame(
        [("a", ts(0), 10.0),     # exactly on a grid point
         ("a", ts(90), 40.0),    # between grid points 60 and 120
         ("a", ts(240), 100.0),
         ("b", ts(30), 5.0),     # single obs between grid points -> 1 row? no
         ("c", ts(59), 1.0), ("c", ts(61), 3.0)],  # grid point 60 inside
        "user_id string, ts timestamp, value double")


def _rows(df):
    return {(r.user_id, r.grid_us): r for r in df.collect()}


def test_locf_grid_alignment_and_carry(spark, obs):
    out = time_grid_fill(obs, on="user_id", ts="ts", value="value",
                         step_us=HOUR_US, method="locf")
    r = _rows(out)
    # key a: grid at 0, 60, 120, 180, 240 minutes
    assert [m for m in (0, 60, 120, 180, 240) if ("a", us(m)) in r] == \
        [0, 60, 120, 180, 240]
    assert r[("a", us(0))].filled == 10.0      # exact collision takes obs
    assert r[("a", us(60))].filled == 10.0     # carried, NOT the later 40.0
    assert r[("a", us(120))].filled == 40.0
    assert r[("a", us(240))].filled == 100.0
    assert r[("a", us(60))].prev_us == us(0)
    # key b: range [30, 30] contains no aligned grid point -> no rows
    assert not [k for k in r if k[0] == "b"]
    # key c: grid point 60 sees only the PAST obs at 59 (zero leakage)
    assert r[("c", us(60))].filled == 1.0


def test_interp_math_and_trailing_locf(spark, obs):
    out = time_grid_fill(obs, on="user_id", ts="ts", value="value",
                         step_us=HOUR_US, method="interp")
    r = _rows(out)
    # a@60: between (0 -> 10.0) and (90 -> 40.0): 10 + 30 * (60/90)
    assert r[("a", us(60))].filled == pytest.approx(30.0)
    # a@120: between (90 -> 40) and (240 -> 100): 40 + 60 * (30/150)
    assert r[("a", us(120))].filled == pytest.approx(52.0)
    # a@240 collides with the last obs: exact value, next_us is null
    assert r[("a", us(240))].filled == 100.0
    # c@60: between 59 -> 1.0 and 61 -> 3.0: 1 + 2 * (1/2)
    assert r[("c", us(60))].filled == pytest.approx(2.0)


def test_interp_exact_collision_is_bitexact(spark):
    d = spark.createDataFrame(
        [("k", ts(0), 0.1), ("k", ts(60), 0.2), ("k", ts(120), 0.3)],
        "user_id string, ts timestamp, value double")
    out = time_grid_fill(d, on="user_id", ts="ts", value="value",
                         step_us=HOUR_US, method="interp")
    got = {r.grid_us: r.filled for r in out.collect()}
    assert got[us(0)] == 0.1 and got[us(60)] == 0.2 and got[us(120)] == 0.3


def test_gapfill_plan_no_quadratic_frame(spark, obs):
    """The forward carry must plan as a second linear Sort over the same
    Exchange, never an unboundedFollowing frame (quadratic in Spark)."""
    import io
    import re
    from contextlib import redirect_stdout
    out = time_grid_fill(obs, on="user_id", ts="ts", value="value",
                         step_us=HOUR_US, method="interp")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "unboundedfollowing" not in plan.lower()
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2


def test_twa_hand_computed(spark):
    d = spark.createDataFrame(
        # hold 10.0 for 60 min, then 40.0 for 30 min, span 90 min
        [("a", ts(0), 10.0), ("a", ts(60), 40.0), ("a", ts(90), 0.0),
         ("solo", ts(7), 3.5)],
        "user_id string, ts timestamp, value double")
    got = {r.user_id: r for r in time_weighted_avg(d).collect()}
    assert got["a"].twa == pytest.approx((10.0 * 60 + 40.0 * 30) / 90)
    assert got["a"].n_obs == 3
    assert got["a"].span_us == 90 * 60_000_000
    assert got["solo"].twa == 3.5 and got["solo"].span_us == 0


def test_twa_burst_insensitive(spark):
    """The defining property: a burst of repeated samples inside a held
    interval must not move the time-weighted mean (it would wreck avg())."""
    base = [("k", ts(0), 10.0), ("k", ts(100), 20.0), ("k", ts(200), 0.0)]
    burst = base + [("k", ts(m), 10.0) for m in (1, 2, 3, 4, 5)]
    schema = "user_id string, ts timestamp, value double"
    a = time_weighted_avg(spark.createDataFrame(base, schema)).collect()[0]
    b = time_weighted_avg(spark.createDataFrame(burst, schema)).collect()[0]
    assert a.twa == b.twa
    plain_avg = (10.0 * 6 + 20.0) / 7
    assert abs(plain_avg - a.twa) > 1.0  # avg() would have been wrong

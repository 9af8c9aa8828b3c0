"""CUSUM changepoint localization and exact weighted median."""

import datetime as dt

from fs2_data_spark.operators.drift import changepoint_locate
from fs2_data_spark.operators.encoding import weighted_median


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


# ---------------------------------------------------------------------------
# changepoint localization
# ---------------------------------------------------------------------------

def test_changepoint_at_peak_of_shift(spark):
    # user 1: on-target for 5 events, then shifted +100 for 3 -> the
    # CUSUM path rises through the shifted block and peaks at its END
    rows = ([(i, 1, "a", _ts(i), 50.0) for i in range(5)]
            + [(5 + j, 1, "a", _ts(5 + j), 150.0) for j in range(3)])
    got = changepoint_locate(_events(spark, rows), target=50.0,
                             slack=5.0, h=100.0).collect()
    assert len(got) == 1
    r = got[0]
    assert r.ts == _ts(7)          # last shifted event = path max
    # peak = 3 * (150 - 55) = 285
    assert r.cusum_peak == 285.0
    assert r.alarmed


def test_changepoint_flat_key_dropped_and_tie_earliest(spark):
    rows_flat = [(i, 1, "a", _ts(i), 40.0) for i in range(4)]
    assert changepoint_locate(_events(spark, rows_flat)).collect() == []
    # plateau: rises to 45 then stays (next deviations 0 after clamp
    # would need negatives; construct exact tie: +50 then 55 55)
    rows = [(0, 2, "a", _ts(0), 105.0),   # S = 50
            (1, 2, "a", _ts(1), 55.0),    # S = 50 (deviation 0)
            (2, 2, "a", _ts(2), 55.0)]    # S = 50
    got = changepoint_locate(_events(spark, rows), target=50.0,
                             slack=5.0, h=100.0).collect()
    assert len(got) == 1
    assert got[0].ts == _ts(0)     # earliest peak wins the tie
    assert not got[0].alarmed


# ---------------------------------------------------------------------------
# weighted median
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, "
                                       "n_chars bigint, w bigint")


def test_weighted_median_hand_cases(spark):
    # values 1, 2, 3 with weights 1, 1, 10 -> half of 12 is 6; cum at
    # value 3 is the first to reach it
    rows = [(1, "s", 1, 1), (2, "s", 2, 1), (3, "s", 3, 10)]
    got = weighted_median(_docs(spark, rows), value="n_chars",
                          weight="w", group="source").collect()
    assert got[0].w_median == 3 and got[0].total_w == 12
    # equal weights degrade to the plain lower median
    rows2 = [(i, "t", v, 1) for i, v in enumerate([10, 20, 30, 40])]
    got2 = weighted_median(_docs(spark, rows2), value="n_chars",
                           weight="w", group="source").collect()
    assert got2[0].w_median == 20  # lower median of 4 values


def test_weighted_median_boundary_exact_half(spark):
    # weights 1,1 values 5,9: 2*cum(5)=2 >= 2 -> lower median 5
    rows = [(1, "s", 5, 1), (2, "s", 9, 1)]
    got = weighted_median(_docs(spark, rows), value="n_chars",
                          weight="w", group="source").collect()
    assert got[0].w_median == 5


def test_weighted_median_nonpositive_weights_excluded(spark):
    rows = [(1, "s", 1, 0), (2, "s", 7, 3), (3, "s", 100, -2)]
    got = weighted_median(_docs(spark, rows), value="n_chars",
                          weight="w", group="source").collect()
    assert got[0].w_median == 7 and got[0].n == 1

"""Point-in-time encoding operators: expanding z-score + target encoding.

The property that matters is zero temporal leakage: every derived value is
a function of strictly-prior events only, so mutating the future must not
move any past row's features.
"""

import datetime as dt
import math

import pytest
from pyspark.sql import Window, functions as F

from fs2_data_spark.operators.encoding import (expanding_zscore,
                                               pit_target_encode,
                                               winsorize)


def _ts(m):
    return dt.datetime(2024, 3, 1, 10, m, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


def test_zscore_hand_computed(spark):
    d = _events(spark, [
        (1, 7, "a", _ts(0), 10.0),
        (2, 7, "a", _ts(1), 20.0),
        (3, 7, "a", _ts(2), 30.0),
    ])
    got = {r.event_id: r for r in expanding_zscore(d).collect()}
    assert got[1].n_past == 0 and got[1].mean_past is None
    assert got[1].std_past is None and got[1].zscore is None
    assert got[2].n_past == 1 and got[2].mean_past == 10.0
    assert got[2].std_past is None and got[2].zscore is None
    assert got[3].n_past == 2 and got[3].mean_past == 15.0
    # sample std of [10, 20] = sqrt(50)
    assert got[3].std_past == round(math.sqrt(50.0), 9)
    assert got[3].zscore == round((30.0 - 15.0) / round(math.sqrt(50.0), 9),
                                  6)


def test_zscore_constant_history_null_z(spark):
    d = _events(spark, [
        (1, 7, "a", _ts(0), 5.0),
        (2, 7, "a", _ts(1), 5.0),
        (3, 7, "a", _ts(2), 9.0),
    ])
    got = {r.event_id: r for r in expanding_zscore(d).collect()}
    assert got[3].std_past == 0.0 and got[3].zscore is None


def test_zscore_no_temporal_leakage(spark):
    base = [(i, 1, "a", _ts(i), float(i * 3 % 7)) for i in range(8)]
    mutated = base[:5] + [(i, u, t, ts, v + 1000.0)
                          for i, u, t, ts, v in base[5:]]
    a = {r.event_id: (r.n_past, r.mean_past, r.std_past, r.zscore)
         for r in expanding_zscore(_events(spark, base)).collect()}
    b = {r.event_id: (r.n_past, r.mean_past, r.std_past, r.zscore)
         for r in expanding_zscore(_events(spark, mutated)).collect()}
    for i in range(5):          # past rows must be untouched by the future
        assert a[i] == b[i]
    assert a[6] != b[6]         # the mutation itself is visible downstream


def test_target_encode_first_event_gets_prior(spark):
    d = _events(spark, [(1, 1, "a", _ts(0), 42.0),
                        (2, 2, "b", _ts(1), 7.0)])
    got = {r.event_id: r for r in
           pit_target_encode(d, prior=1.0, prior_weight=10.0).collect()}
    for i in (1, 2):
        assert got[i].n_past == 0 and got[i].target_enc == 1.0


def test_target_encode_matches_direct_window(spark):
    """The bucketed decomposition must equal the naive single-window
    formulation, including at bucket boundaries and under ts ties."""
    rows = []
    for i in range(60):
        # 3 categories, events every 25 min -> crosses hour buckets; two
        # deliberate ts ties per category disambiguated by event_id
        m = (i * 25) % 300
        rows.append((i, i % 5, "cat%d" % (i % 3),
                     dt.datetime(2024, 3, 1, 10 + (i * 25) // 300, m % 60),
                     float((i * 13) % 11)))
    d = _events(spark, rows)
    got = pit_target_encode(d, prior=1.0, prior_weight=10.0,
                            bucket_us=3_600_000_000)
    wd = (Window.partitionBy("event_type")
          .orderBy(F.unix_micros(F.col("ts").cast("timestamp")), "event_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    direct = d.select(
        "event_id",
        F.count("value").over(wd).alias("n_past"),
        F.round(F.coalesce(F.sum(F.col("value").cast("decimal(38,12)"))
                           .over(wd), F.lit(0).cast("decimal(38,12)"))
                .cast("double"), 9).alias("sum_past"))
    g = {r.event_id: (r.n_past, r.sum_past) for r in got.collect()}
    e = {r.event_id: (r.n_past, r.sum_past) for r in direct.collect()}
    assert g == e


def test_target_encode_tiny_buckets_still_exact(spark):
    """Degenerate bucket width (every event its own bucket) exercises the
    pure-prefix path; the smoothed encoding is still the direct value."""
    d = _events(spark, [(i, 1, "a", _ts(i), float(i)) for i in range(6)])
    got = {r.event_id: r for r in
           pit_target_encode(d, prior=0.0, prior_weight=2.0,
                             bucket_us=1).collect()}
    run = 0.0
    for i in range(6):
        assert got[i].n_past == i
        assert got[i].target_enc == round(run / (i + 2.0), 9)
        run += float(i)


# ---------------------------------------------------------------------------
# group-wise winsorization
# ---------------------------------------------------------------------------

def test_winsorize_hand_computed(spark):
    # 20 values 1..20 in one group: p05 rank = ceil(20/20) = 1 -> 1.0,
    # p95 rank = ceil(19*20/20) = 19 -> 19.0
    d = _events(spark, [(i, 1, "a", _ts(i), float(i)) for i in range(1, 21)])
    got = {r.event_id: r for r in winsorize(d).collect()}
    assert got[1].p_lo == 1.0 and got[1].p_hi == 19.0
    assert got[1].value_w == 1.0          # 1 stays at the low bound
    assert got[20].value_w == 19.0        # 20 clipped down
    assert got[10].value_w == 10.0        # interior untouched


def test_winsorize_small_group_ranks(spark):
    # n=3: lo rank ceil(3/20)=1, hi rank ceil(57/20)=3 -> bounds = min/max
    d = _events(spark, [(1, 1, "a", _ts(0), 5.0),
                        (2, 1, "a", _ts(1), -2.0),
                        (3, 1, "a", _ts(2), 100.0)])
    r = winsorize(d).collect()[0]
    assert r.p_lo == -2.0 and r.p_hi == 100.0


def test_winsorize_null_passthrough_and_rank_exclusion(spark):
    d = _events(spark, [(1, 1, "a", _ts(0), 1.0),
                        (2, 1, "a", _ts(1), None),
                        (3, 1, "a", _ts(2), 3.0),
                        (4, 1, "a", _ts(3), 2.0)])
    got = {r.event_id: r for r in winsorize(d).collect()}
    assert got[2].value_w is None
    # ranks over the 3 non-null values only: bounds = 1.0 / 3.0
    assert got[1].p_lo == 1.0 and got[1].p_hi == 3.0


def test_winsorize_partitioning_invariance(spark):
    d = _events(spark, [(i, i % 3, "a", _ts(i % 7), float((i * 17) % 50))
                        for i in range(60)])
    a = sorted(map(tuple, winsorize(d).select(
        "event_id", "p_lo", "p_hi", "value_w").collect()))
    b = sorted(map(tuple, winsorize(d.repartition(13)).select(
        "event_id", "p_lo", "p_hi", "value_w").collect()))
    assert a == b


def test_robust_scale_hand_computed(spark):
    from fs2_data_spark.operators.encoding import robust_scale
    # values 1..7 with an outlier: med=4 (rank (7+1)//2=4), devs
    # {3,2,1,0,1,2,996} sorted -> lower median dev = 2 -> mad=2
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0, 6.0,
                                            1000.0])],
        "event_type string, event_id bigint, value double")
    rows = {r.event_id: r for r in robust_scale(df).collect()}
    assert rows[0].med == 4.0 and rows[0].mad == 2.0
    assert rows[3].robust_z == 0.0
    assert rows[6].robust_z == (1000.0 - 4.0) / (1.4826 * 2.0)
    # outlier-resistance: the z of the non-outliers is unaffected by the
    # outlier's magnitude
    df2 = df.replace(1000.0, 9e9, subset=["value"])
    rows2 = {r.event_id: r for r in robust_scale(df2).collect()}
    assert rows2[1].robust_z == rows[1].robust_z


def test_robust_scale_mad_zero_is_null(spark):
    from fs2_data_spark.operators.encoding import robust_scale
    df = spark.createDataFrame(
        [("g", i, 5.0) for i in range(4)] + [("g", 9, 100.0)],
        "event_type string, event_id bigint, value double")
    rows = robust_scale(df).collect()
    assert all(r.robust_z is None for r in rows)      # >half identical
    assert all(r.mad == 0.0 for r in rows)


def test_robust_scale_single_exchange(spark):
    import io
    import re
    from contextlib import redirect_stdout
    from fs2_data_spark.operators.encoding import robust_scale
    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 2.0)],
        "event_type string, event_id bigint, value double")
    buf = io.StringIO()
    with redirect_stdout(buf):
        robust_scale(df).explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"hashpartitioning\(event_type", plan)) == 1


def test_equidepth_bins_sizes(spark):
    from fs2_data_spark.operators.encoding import equidepth_bins
    df = spark.createDataFrame(
        [("g", i, float(i % 37)) for i in range(103)],
        "event_type string, event_id bigint, value double")
    out = equidepth_bins(df, k=10).groupBy("bin").count().collect()
    sizes = sorted(r["count"] for r in out)
    assert len(sizes) == 10
    assert sizes == sorted([11, 11, 11, 10, 10, 10, 10, 10, 10, 10])


def test_pit_robust_z_zero_leakage(spark):
    """Perturbing a FUTURE value must not move any earlier row's PIT
    statistics — the same leakage probe as the as-of join's."""
    import datetime as dt
    from fs2_data_spark.operators.encoding import pit_robust_z
    T = dt.datetime(2024, 2, 1)
    mk = lambda vals: spark.createDataFrame(  # noqa: E731
        [("u", i, T + dt.timedelta(minutes=i), v)
         for i, v in enumerate(vals)],
        "user_id string, event_id bigint, ts timestamp, value double")
    base = [5.0, 1.0, 9.0, 4.0, 7.0]
    a = {r.event_id: (r.med_pit, r.iqr_pit, r.pit_robust_z)
         for r in pit_robust_z(mk(base)).collect()}
    b = {r.event_id: (r.med_pit, r.iqr_pit, r.pit_robust_z)
         for r in pit_robust_z(mk(base[:-1] + [1e9])).collect()}
    for i in range(4):
        assert a[i] == b[i], f"future value leaked into row {i}"
    # hand check row 2: history {5,1,9}: med 5, q1 3, q3 7 -> z = (9-5)/4
    assert a[2] == (5.0, 4.0, 1.0)
    assert a[0][2] is None  # single-row history: IQR 0 -> undefined


def test_seasonal_baseline_strictly_prior(spark):
    import datetime as dt
    from fs2_data_spark.operators.encoding import seasonal_baseline
    T = dt.datetime(2024, 2, 5)  # Monday
    week = dt.timedelta(days=7)
    rows = [("u", 1, T, 10.0), ("u", 2, T + week, 20.0),
            ("u", 3, T + 2 * week, 99.0),
            ("u", 4, T + dt.timedelta(hours=1), 7.0)]  # different cell
    df = spark.createDataFrame(
        rows, "user_id string, event_id bigint, ts timestamp, value double")
    got = {r.event_id: r for r in seasonal_baseline(df).collect()}
    assert got[1].seasonal_mean is None          # first in cell: no self
    assert got[2].seasonal_mean == 10.0          # only the prior week
    assert got[3].seasonal_mean == 15.0          # mean(10, 20), not 99
    assert got[3].seasonal_resid == 99.0 - 15.0
    assert got[4].seasonal_mean is None          # other hour-of-week cell
    assert got[1].how == got[2].how == got[3].how != got[4].how


def test_interarrival_hand_computed(spark):
    import datetime as dt
    from fs2_data_spark.operators.encoding import interarrival_stats
    T = dt.datetime(2024, 2, 1)
    rows = [("u", i, T + dt.timedelta(minutes=m))
            for i, m in enumerate([0, 10, 20, 21])]
    df = spark.createDataFrame(
        rows, "user_id string, event_id bigint, ts timestamp")
    got = {r.event_id: r for r in interarrival_stats(df).collect()}
    m = 60_000_000
    assert got[0].dt_us is None and got[0].burst is None
    assert got[1].dt_us == 10 * m and got[1].burst == 1.0
    assert got[2].burst == 1.0                       # 10m vs mean 10m
    assert got[3].dt_us == 1 * m
    assert got[3].burst == (1 * m) / ((10 + 10 + 1) * m / 3)

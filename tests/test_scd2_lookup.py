"""SCD2 point-in-time dimension lookup: serving-form as-of equivalence."""

import datetime as dt

from pyspark.sql import functions as F

from fs2_data_spark.operators.asof import scd2_intervals, scd2_lookup


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


def test_lookup_picks_covering_version(spark):
    dim_rows = [(1, 1, "signup", _ts(10), 100.0),
                (2, 1, "signup", _ts(50), 200.0)]
    dim = scd2_intervals(_events(spark, dim_rows), key="user_id",
                         ts="ts", tiebreak="event_id")
    facts = _events(spark, [
        (10, 1, "purchase", _ts(5), 1.0),    # before any version -> NULL
        (11, 1, "purchase", _ts(10), 2.0),   # exactly at v1 start -> v1
        (12, 1, "purchase", _ts(30), 3.0),   # inside v1
        (13, 1, "purchase", _ts(50), 4.0),   # exactly at v2 start -> v2
        (14, 1, "purchase", _ts(90), 5.0),   # current version
        (15, 2, "purchase", _ts(30), 6.0),   # other key -> NULL
    ])
    got = {r.event_id: r for r in scd2_lookup(
        facts.select("event_id", "user_id", "ts"),
        dim.select("user_id", F.col("value").alias("dim_value"),
                   "valid_from_us", "valid_to_us"),
        key="user_id", ts="ts").collect()}
    assert got[10].dim_value is None
    assert got[11].dim_value == 100.0
    assert got[12].dim_value == 100.0
    assert got[13].dim_value == 200.0
    assert got[14].dim_value == 200.0
    assert got[15].dim_value is None
    assert len(got) == 6  # at most one version per fact, facts preserved


def test_lookup_equals_asof_join(spark):
    # serving-form lookup == as-of join on randomized data
    import random
    rng = random.Random(9)
    dim_rows = [(i, i % 4, "signup", _ts(rng.randrange(0, 2000)),
                 float(i)) for i in range(40)]
    fact_rows = [(100 + i, i % 4, "purchase", _ts(rng.randrange(0, 2500)),
                  0.0) for i in range(120)]
    dim_ev = _events(spark, dim_rows)
    dim = scd2_intervals(dim_ev, key="user_id", ts="ts",
                         tiebreak="event_id")
    facts = _events(spark, fact_rows).select("event_id", "user_id", "ts")
    via_scd2 = {r.event_id: r.dim_v for r in scd2_lookup(
        facts, dim.select("user_id", F.col("value").alias("dim_v"),
                          "valid_from_us", "valid_to_us"),
        key="user_id", ts="ts").collect()}
    # brute force: latest dim observation with t' <= t, last-writer ties
    dims = sorted(dim_rows, key=lambda r: (r[3], r[0]))
    for eid, uid, _, t, _v in fact_rows:
        cand = [r for r in dims if r[1] == uid and r[3] <= t]
        want = float(cand[-1][0]) if cand else None
        assert via_scd2[eid] == want, eid


def test_zero_length_tie_interval_never_matches(spark):
    # two dim versions at the same instant: last writer (higher id) wins
    dim_rows = [(1, 1, "signup", _ts(10), 100.0),
                (2, 1, "signup", _ts(10), 200.0)]
    dim = scd2_intervals(_events(spark, dim_rows), key="user_id",
                         ts="ts", tiebreak="event_id")
    facts = _events(spark, [(10, 1, "purchase", _ts(10), 0.0),
                            (11, 1, "purchase", _ts(99), 0.0)])
    got = {r.event_id: r.dim_value for r in scd2_lookup(
        facts.select("event_id", "user_id", "ts"),
        dim.select("user_id", F.col("value").alias("dim_value"),
                   "valid_from_us", "valid_to_us"),
        key="user_id", ts="ts").collect()}
    assert got[10] == 200.0 and got[11] == 200.0

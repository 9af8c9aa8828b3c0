"""Session trigram mining and data-contract expectation suites."""

import datetime as dt

from pyspark.sql import functions as F

from fs2_data_spark.operators.contracts import expectation_report
from fs2_data_spark.operators.sessionize import session_trigrams


def _ts(m):
    return dt.datetime(2024, 1, 1 + m // 1440, (m // 60) % 24, m % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, "
              "ts timestamp, value double")


# ---------------------------------------------------------------------------
# session trigrams
# ---------------------------------------------------------------------------

def test_trigrams_within_session_only(spark):
    rows = [
        # user 1, session 1: a b c d -> trigrams (a,b,c), (b,c,d)
        (1, 1, "a", _ts(0), 0.0), (2, 1, "b", _ts(1), 0.0),
        (3, 1, "c", _ts(2), 0.0), (4, 1, "d", _ts(3), 0.0),
        # 40-min gap -> new session: e f (too short for a trigram)
        (5, 1, "e", _ts(60), 0.0), (6, 1, "f", _ts(61), 0.0),
        # user 2: a b c again
        (7, 2, "a", _ts(0), 0.0), (8, 2, "b", _ts(1), 0.0),
        (9, 2, "c", _ts(2), 0.0),
    ]
    got = {(r.s1, r.s2, r.s3): r.cnt for r in session_trigrams(
        _events(spark, rows), gap_s=1800).collect()}
    assert got[("a", "b", "c")] == 2
    assert got[("b", "c", "d")] == 1
    # nothing spans the session boundary (c, d, e) / (d, e, f)
    assert ("c", "d", "e") not in got and ("d", "e", "f") not in got


def test_trigrams_top_k_deterministic(spark):
    rows = []
    eid = 0
    # 3 distinct trigram types with controlled counts 3, 2, 1
    for n, tri in [(3, "abc"), (2, "abd"), (1, "abe")]:
        for rep in range(n):
            base = len(rows)
            for j, st in enumerate(tri):
                rows.append((eid, 100 + eid, st, _ts(j), 0.0))
                eid += 1
    # each triple uses a distinct user so sessions don't merge
    rows = [(i, 1000 + i // 3, st, ts, v)
            for i, (_, _, st, ts, v) in enumerate(rows)]
    out = session_trigrams(_events(spark, rows), top_k=2).collect()
    assert [(r.s1, r.s2, r.s3, r.cnt) for r in out] == [
        ("a", "b", "c", 3), ("a", "b", "d", 2)]


# ---------------------------------------------------------------------------
# expectation suites
# ---------------------------------------------------------------------------

def test_expectations_counts_and_order(spark):
    rows = [(1, 1, "a", _ts(0), 10.0),
            (2, 1, "b", _ts(1), -5.0),
            (3, 1, None, _ts(2), 20.0),
            (3, 1, "a", _ts(3), None)]
    rep = expectation_report(
        _events(spark, rows),
        rules=[("value_nonneg", F.col("value") >= 0),
               ("type_known", F.col("event_type").isin("a", "b")),
               ("ts_in_range", "ts >= TIMESTAMP '2024-01-01'")],
        unique_key="event_id").collect()
    assert [r.rule for r in rep] == [
        "value_nonneg", "type_known", "ts_in_range", "unique:event_id"]
    by = {r.rule: r for r in rep}
    # -5 violates; NULL value cannot satisfy -> violation too
    assert by["value_nonneg"].n_viol == 2
    assert by["type_known"].n_viol == 1      # NULL type
    assert by["ts_in_range"].n_viol == 0 and by["ts_in_range"].ok
    assert by["unique:event_id"].n_viol == 1  # id 3 twice
    assert by["value_nonneg"].n == 4
    assert by["value_nonneg"].viol_rate == 0.5
    assert not by["unique:event_id"].ok


def test_expectations_all_pass(spark):
    rows = [(1, 1, "a", _ts(0), 1.0), (2, 1, "b", _ts(1), 2.0)]
    rep = expectation_report(
        _events(spark, rows),
        rules=[("v", F.col("value") > 0)], unique_key="event_id").collect()
    assert all(r.ok for r in rep)
    assert all(r.viol_rate == 0.0 for r in rep)

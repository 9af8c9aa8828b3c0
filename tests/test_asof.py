"""As-of join correctness: pandas merge_asof oracle, zero-leakage probe,
strategy equivalence, partitioning invariance (the fs2-data chunking-
invariance contract, SURVEY §5)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from fs2_data_spark.operators.asof import asof_join, backfill_locf
from fs2_data_spark.tables import observations, token_sequences

T0 = dt.datetime(2024, 1, 1)


def ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def small(spark):
    left = spark.createDataFrame(
        [
            ("a", ts(0), 1), ("a", ts(10), 2), ("a", ts(20), 3), ("a", ts(20), 4),
            ("b", ts(5), 5),
            ("c", ts(1), 6),  # key missing on the right -> nulls
        ],
        "doc_id string, event_time timestamp, seq int",
    )
    right = spark.createDataFrame(
        [
            ("a", ts(0), 100.0),   # exact tie with left @0
            ("a", ts(15), 115.0),
            ("a", ts(25), 125.0),  # after every left row @<=20: must never match
            ("b", ts(4), 204.0),
        ],
        "doc_id string, obs_time timestamp, feat double",
    )
    return left, right


def _sorted_rows(df, cols=("doc_id", "event_time", "seq")):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: str(t))


def pandas_asof(lpdf, rpdf, allow_exact=True, tolerance_us=None):
    out = []
    for key, lg in lpdf.groupby("doc_id"):
        rg = rpdf[rpdf.doc_id == key].sort_values("obs_time")
        lg = lg.sort_values("event_time")
        m = pd.merge_asof(
            lg, rg[["obs_time", "feat"]], left_on="event_time", right_on="obs_time",
            direction="backward", allow_exact_matches=allow_exact,
            tolerance=pd.Timedelta(microseconds=tolerance_us) if tolerance_us else None,
        )
        out.append(m)
    return pd.concat(out, ignore_index=True)


@pytest.mark.parametrize("strategy", ["union", "pandas"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas_oracle(spark, small, strategy, allow_exact):
    left, right = small
    got = asof_join(left, right, on="doc_id", left_ts="event_time", right_ts="obs_time",
                    right_cols=["feat"], allow_exact=allow_exact, strategy=strategy)
    gpdf = got.toPandas().sort_values(["doc_id", "event_time", "seq"]).reset_index(drop=True)
    exp = pandas_asof(left.toPandas(), right.toPandas(), allow_exact=allow_exact)
    exp = exp.sort_values(["doc_id", "event_time", "seq"]).reset_index(drop=True)
    assert list(gpdf["seq"]) == list(exp["seq"])
    assert np.allclose(gpdf["feat"].fillna(-1), exp["feat"].fillna(-1))


def test_asof_tolerance(spark, small):
    left, right = small
    got = asof_join(left, right, right_cols=["feat"], tolerance_us=5 * 60 * 1_000_000)
    rows = {(r.doc_id, r.event_time): r.feat for r in got.collect()}
    assert rows[("a", ts(0))] == 100.0        # exact tie, within tolerance
    assert rows[("a", ts(10))] is None        # last obs @0 is 10min old > 5min
    assert rows[("a", ts(20))] == 115.0       # obs @15 is 5min old == tolerance
    assert rows[("c", ts(1))] is None


def test_zero_temporal_leakage(spark, small):
    """Future right rows (t' > all left t) must not influence any output."""
    left, right = small
    base = asof_join(left, right, right_cols=["feat"]).collect()
    poisoned = right.union(
        spark.createDataFrame([("a", ts(21), 999.0), ("c", ts(2), 999.0)], right.schema)
    )
    got = asof_join(left, poisoned, right_cols=["feat"]).collect()
    assert sorted(map(tuple, base), key=str) == sorted(map(tuple, got), key=str)


def test_strategies_agree_on_generated_data(spark):
    left = token_sequences(spark, 400, n_docs=20).select("doc_id", "event_time", "n_tok")
    right = observations(spark, 100, n_docs=20)
    a = asof_join(left, right, right_cols=["feature_vec"], strategy="union")
    b = asof_join(left, right, right_cols=["feature_vec"], strategy="pandas")
    ra = sorted([tuple(map(str, r)) for r in a.collect()])
    rb = sorted([tuple(map(str, r)) for r in b.collect()])
    assert ra == rb


def test_partitioning_invariance(spark, small):
    left, right = small
    a = asof_join(left.repartition(1), right.repartition(1), right_cols=["feat"])
    b = asof_join(left.repartition(16), right.repartition(7), right_cols=["feat"])
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_backfill_locf(spark):
    df = spark.createDataFrame(
        [("a", ts(0), None), ("a", ts(1), 1.0), ("a", ts(2), None), ("a", ts(3), None),
         ("a", ts(4), 4.0), ("b", ts(0), None)],
        "doc_id string, event_time timestamp, x double",
    )
    got = backfill_locf(df, ["x"], key="doc_id", ts="event_time")
    vals = {(r.doc_id, r.event_time): r.x_ff for r in got.collect()}
    assert vals[("a", ts(0))] is None
    assert vals[("a", ts(2))] == 1.0
    assert vals[("a", ts(3))] == 1.0
    assert vals[("a", ts(4))] == 4.0
    assert vals[("b", ts(0))] is None


def test_adversarial_sweep_vs_bruteforce(spark):
    """Randomized PIT sweep: heavy timestamp ties on both sides, null
    payloads, all strategy x strict x tolerance combinations, verified
    against a brute-force oracle that re-derives every row's winner (max
    eligible t', ties broken by greatest payload, nulls smallest).  Directly
    certifies zero temporal leakage and the vectorized dedup tie-break."""
    import random
    rng = random.Random(11)
    keys = [f"k{i}" for i in range(6)]
    lrows = [(rng.choice(keys), ts(rng.randint(0, 30)), i) for i in range(300)]
    rrows = []
    for j in range(200):
        pay = None if rng.random() < 0.2 else round(rng.random() * 100, 2)
        rrows.append((rng.choice(keys), ts(rng.randint(0, 30)), pay))
    left = spark.createDataFrame(lrows, "doc_id string, event_time timestamp, seq int")
    right = spark.createDataFrame(rrows, "doc_id string, obs_time timestamp, feat double")

    def brute(allow_exact, tol_min):
        out = {}
        for k, t, seq in lrows:
            elig = [(rt, p) for rk, rt, p in rrows
                    if rk == k and (rt <= t if allow_exact else rt < t)
                    and (tol_min is None or (t - rt).total_seconds() <= tol_min * 60)]
            if not elig:
                out[seq] = None
                continue
            best_t = max(rt for rt, _ in elig)
            cands = [p for rt, p in elig if rt == best_t]
            with_vals = [p for p in cands if p is not None]
            out[seq] = max(with_vals) if with_vals else None
        return out

    for strategy in ("union", "pandas"):
        for allow_exact in (True, False):
            for tol_min in (None, 5):
                got = {r.seq: r.feat for r in asof_join(
                    left, right, on="doc_id", left_ts="event_time",
                    right_ts="obs_time", right_cols=["feat"],
                    strategy=strategy, allow_exact=allow_exact,
                    tolerance_us=None if tol_min is None else tol_min * 60 * 10**6,
                ).collect()}
                exp = brute(allow_exact, tol_min)
                assert got == exp, (strategy, allow_exact, tol_min,
                                    {s: (got[s], exp[s]) for s in exp
                                     if got.get(s) != exp[s]})


# ---------------------------------------------------------------------------
# Direction matrix (forward / nearest — pandas.merge_asof parity)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("strategy", ["union", "pandas"])
@pytest.mark.parametrize("direction,allow_exact", [
    ("forward", True), ("forward", False), ("nearest", True),
])
def test_direction_matches_pandas_oracle(spark, small, strategy, direction,
                                         allow_exact):
    left, right = small
    got = asof_join(left, right, on="doc_id", left_ts="event_time",
                    right_ts="obs_time", right_cols=["feat"],
                    allow_exact=allow_exact, strategy=strategy,
                    direction=direction)
    gpdf = (got.toPandas().sort_values(["doc_id", "event_time", "seq"])
            .reset_index(drop=True))
    exp = []
    lpdf, rpdf = left.toPandas(), right.toPandas()
    for key, lg in lpdf.groupby("doc_id"):
        rg = rpdf[rpdf.doc_id == key].sort_values("obs_time")
        m = pd.merge_asof(
            lg.sort_values("event_time"), rg[["obs_time", "feat"]],
            left_on="event_time", right_on="obs_time",
            direction=direction, allow_exact_matches=allow_exact)
        exp.append(m)
    exp = (pd.concat(exp, ignore_index=True)
           .sort_values(["doc_id", "event_time", "seq"]).reset_index(drop=True))
    assert list(gpdf["seq"]) == list(exp["seq"])
    assert np.allclose(gpdf["feat"].fillna(-1), exp["feat"].fillna(-1))


def test_nearest_tie_goes_backward(spark):
    left = spark.createDataFrame([("a", ts(10), 1)],
                                 "doc_id string, event_time timestamp, seq int")
    right = spark.createDataFrame(
        [("a", ts(5), 55.0), ("a", ts(15), 155.0)],
        "doc_id string, obs_time timestamp, feat double")
    for strategy in ("union", "pandas"):
        row = asof_join(left, right, right_cols=["feat"], direction="nearest",
                        strategy=strategy).collect()[0]
        assert row.feat == 55.0, strategy  # 5min back vs 5min fwd: backward


def test_forward_tolerance(spark, small):
    left, right = small
    got = asof_join(left, right, right_cols=["feat"], direction="forward",
                    tolerance_us=5 * 60 * 1_000_000)
    rows = {(r.doc_id, r.event_time): r.feat for r in got.collect()}
    assert rows[("a", ts(0))] == 100.0   # exact match, distance 0
    assert rows[("a", ts(10))] == 115.0  # obs @15 is 5min ahead == tolerance
    assert rows[("a", ts(20))] == 125.0  # obs @25 is 5min ahead == tolerance
    assert rows[("b", ts(5))] is None    # only obs @4 is behind
    assert rows[("c", ts(1))] is None


def test_nearest_strict_union_raises_pandas_works(spark, small):
    left, right = small
    with pytest.raises(ValueError, match="pandas"):
        asof_join(left, right, right_cols=["feat"], direction="nearest",
                  allow_exact=False, strategy="union")
    got = asof_join(left, right, right_cols=["feat"], direction="nearest",
                    allow_exact=False, strategy="pandas")
    rows = {(r.doc_id, r.event_time, r.seq): r.feat for r in got.collect()}
    # left a@0 has an exact right @0 (excluded) -> nearest is @15
    assert rows[("a", ts(0), 1)] == 115.0


def test_direction_adversarial_sweep(spark):
    """Randomized forward/nearest sweep with heavy ties vs a brute-force
    oracle (same recipe as the backward sweep above)."""
    import random
    rng = random.Random(23)
    keys = [f"k{i}" for i in range(5)]
    lrows = [(rng.choice(keys), ts(rng.randint(0, 30)), i) for i in range(250)]
    rrows = [(rng.choice(keys), ts(rng.randint(0, 30)),
              None if rng.random() < 0.2 else round(rng.random() * 100, 2))
             for _ in range(180)]
    left = spark.createDataFrame(
        lrows, "doc_id string, event_time timestamp, seq int")
    right = spark.createDataFrame(
        rrows, "doc_id string, obs_time timestamp, feat double")

    def winner(cands):
        with_vals = [p for p in cands if p is not None]
        return max(with_vals) if with_vals else None

    def brute(direction, allow_exact, tol_min):
        def in_tol(gap):
            return tol_min is None or gap.total_seconds() <= tol_min * 60

        out = {}
        for k, t, seq in lrows:
            # tolerance invalidates each candidate BEFORE the nearest choice
            # (pandas semantics, probed empirically)
            back = [(rt, p) for rk, rt, p in rrows if rk == k
                    and (rt <= t if allow_exact else rt < t) and in_tol(t - rt)]
            fwd = [(rt, p) for rk, rt, p in rrows if rk == k
                   and (rt >= t if allow_exact else rt > t) and in_tol(rt - t)]
            if direction == "forward":
                elig, pick = fwd, min
            else:  # nearest: closer side, tie backward
                bd = min((t - rt for rt, _ in back), default=None)
                fd = min((rt - t for rt, _ in fwd), default=None)
                if fd is not None and (bd is None or fd < bd):
                    elig, pick = fwd, min
                else:
                    elig, pick = back, max
            if not elig:
                out[seq] = None
                continue
            best_t = pick(rt for rt, _ in elig)
            out[seq] = winner([p for rt, p in elig if rt == best_t])
        return out

    for strategy in ("union", "pandas"):
        for direction, allow_exact in (("forward", True), ("forward", False),
                                       ("nearest", True)):
            for tol_min in (None, 5):
                got = {r.seq: r.feat for r in asof_join(
                    left, right, on="doc_id", left_ts="event_time",
                    right_ts="obs_time", right_cols=["feat"],
                    strategy=strategy, allow_exact=allow_exact,
                    direction=direction,
                    tolerance_us=None if tol_min is None else tol_min * 60 * 10**6,
                ).collect()}
                exp = brute(direction, allow_exact, tol_min)
                assert got == exp, (strategy, direction, allow_exact, tol_min,
                                    {s: (got[s], exp[s]) for s in exp
                                     if got.get(s) != exp[s]})


# ---------------------------------------------------------------------------
# SCD2 validity intervals
# ---------------------------------------------------------------------------

def _scd_events(spark, rows):
    import datetime as dt
    return spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v)
         for i, k, s, v in rows],
        "event_id bigint, user_id bigint, ts timestamp, value double")


def test_scd2_interval_chain(spark):
    from fs2_data_spark.operators.asof import scd2_intervals
    d = _scd_events(spark, [(1, 7, 10, 1.0), (2, 7, 20, 2.0),
                            (3, 7, 30, 3.0), (4, 9, 5, 9.0)])
    got = {r.event_id: r for r in
           scd2_intervals(d, key="user_id", ts="ts").collect()}
    base = 1_704_067_200_000_000  # 2024-01-01 epoch us
    assert got[1].valid_to_us == base + 20_000_000
    assert got[2].valid_to_us == base + 30_000_000
    assert got[3].valid_to_us is None and got[3].is_current
    assert got[4].valid_to_us is None and got[4].is_current
    # half-open chain: consecutive intervals tile the timeline
    assert got[1].valid_to_us == got[2].valid_from_us


def test_scd2_tie_collapses_to_zero_length(spark):
    from fs2_data_spark.operators.asof import scd2_intervals
    d = _scd_events(spark, [(1, 7, 10, 1.0), (2, 7, 10, 2.0)])
    got = {r.event_id: r for r in
           scd2_intervals(d, key="user_id", ts="ts").collect()}
    # earlier event_id at the tied ts gets [t, t): unpickable by lookup
    assert got[1].valid_from_us == got[1].valid_to_us
    assert got[2].is_current


def test_scd2_lookup_equals_asof_join(spark):
    """PIT lookup through the interval table == as-of join (backward,
    allow_exact, last-writer tie rule) on a probe set with exact hits,
    misses-before-first, and tied observation times."""
    import datetime as dt

    from pyspark.sql import functions as F

    from fs2_data_spark.operators.asof import asof_join, scd2_intervals
    obs = _scd_events(spark, [(1, 7, 10, 1.0), (2, 7, 10, 1.5),
                              (3, 7, 20, 2.0), (4, 9, 15, 9.0)])
    probes = spark.createDataFrame(
        [(101, 7, 5), (102, 7, 10), (103, 7, 19), (104, 7, 20),
         (105, 7, 99), (106, 9, 15), (107, 8, 50)],
        "probe_id bigint, user_id bigint, s int").select(
        "probe_id", "user_id",
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("s"))).alias("pts"))
    iv = scd2_intervals(obs, key="user_id", ts="ts")
    pt = F.unix_micros(F.col("pts").cast("timestamp"))
    via_iv = (probes.join(
        iv, (probes.user_id == iv.user_id)
            & (iv.valid_from_us <= pt)
            & (pt < F.coalesce(iv.valid_to_us, F.lit(1 << 62))),
        "left")
        .select("probe_id", iv.value.alias("v_iv")))
    via_asof = asof_join(
        probes, obs.select("user_id", "ts", "value"),
        on="user_id", left_ts="pts", right_ts="ts",
        right_cols=["value"]).select(
        "probe_id", F.col("value").alias("v_asof"))
    a = {r.probe_id: r.v_iv for r in via_iv.collect()}
    b = {r.probe_id: r.v_asof for r in via_asof.collect()}
    assert a == b
    assert a[101] is None        # before first observation
    assert a[102] == 1.5         # tied obs: last writer wins both paths
    assert a[105] == 2.0         # open current interval


# ---------------------------------------------------------------------------
# asof_join_multi: N PIT attachments fused into one shuffle + one sort
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def multi(spark):
    left = spark.createDataFrame(
        [("a", ts(0), 1), ("a", ts(10), 2), ("a", ts(21), 3),
         ("b", ts(5), 4), ("c", ts(9), 5)],
        "doc_id string, event_time timestamp, seq int")
    r1 = spark.createDataFrame(
        [("a", ts(0), 100.0), ("a", ts(15), 115.0), ("b", ts(6), 206.0)],
        "doc_id string, obs_time timestamp, f1 double")
    r2 = spark.createDataFrame(
        [("a", ts(9), 9.0), ("a", ts(9), 11.0),  # dup (key, ts): max wins
         ("b", ts(5), 55.0), ("c", ts(30), 77.0)],
        "doc_id string, obs_time timestamp, f2 double")
    return left, r1, r2


def test_multi_matches_n_single_joins(spark, multi):
    from fs2_data_spark.operators.asof import asof_join_multi
    left, r1, r2 = multi
    fused = asof_join_multi(
        left,
        [{"df": r1, "ts": "obs_time", "suffix": ""},
         {"df": r2, "ts": "obs_time", "suffix": ""}],
        on="doc_id", left_ts="event_time")
    seq = asof_join(
        asof_join(left, r1, on="doc_id", left_ts="event_time",
                  right_ts="obs_time", right_cols=["f1"]),
        r2, on="doc_id", left_ts="event_time", right_ts="obs_time",
        right_cols=["f2"])
    key = lambda t: str(t)  # noqa: E731
    cols = ["doc_id", "event_time", "seq", "f1", "f2"]
    assert sorted(map(tuple, fused.select(*cols).collect()), key=key) == \
        sorted(map(tuple, seq.select(*cols).collect()), key=key)


def test_multi_strict_excludes_equal_ts(spark, multi):
    from fs2_data_spark.operators.asof import asof_join_multi
    left, r1, r2 = multi
    out = asof_join_multi(
        left, [{"df": r1, "ts": "obs_time", "suffix": ""}],
        on="doc_id", left_ts="event_time", allow_exact=False)
    rows = {r.seq: r.f1 for r in out.collect()}
    assert rows[1] is None          # strict: the ts(0) tie is invisible
    assert rows[2] == 100.0         # the earlier row still carries
    assert rows[5] is None          # key "c" has no earlier r1 row


def test_multi_single_window_node(spark, multi):
    """The N LOCF carries share one (partition, order, frame) spec and must
    fuse into exactly one WindowExec over one fact-side sort."""
    import io
    from contextlib import redirect_stdout
    from fs2_data_spark.operators.asof import asof_join_multi
    left, r1, r2 = multi
    out = asof_join_multi(
        left,
        [{"df": r1, "ts": "obs_time", "suffix": ""},
         {"df": r2, "ts": "obs_time", "suffix": ""}],
        on="doc_id", left_ts="event_time", dedup_right=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    import re as _re
    assert len(_re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert len(_re.findall(r"\(\d+\) Sort\b", plan)) == 1  # no dedup aggs
    assert "hashpartitioning(doc_id" in plan

"""Adversarial randomized sweeps for the round-5 PIT/timeseries batch:
gap-fill, TWA and multi-table as-of vs independent brute-force Python
reference implementations (the engine's proven bug-finder pattern —
random generators, exact or near-exact comparison, many shapes)."""

import datetime as dt
import random

import pytest

T0 = dt.datetime(2024, 1, 1)
T0_US = int(T0.timestamp() * 1_000_000)
STEP = 3_600_000_000  # 1 h


def ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _ref_gapfill(obs, step, method):
    """Brute-force reference: obs = {key: sorted [(t_us, v)]}."""
    out = {}
    for k, pts in obs.items():
        pts = sorted(pts)
        lo, hi = pts[0][0], pts[-1][0]
        g = (lo + step - 1) // step * step
        while g <= hi:
            prev = max((p for p in pts if p[0] <= g), default=None)
            nxt = min((p for p in pts if p[0] >= g), default=None)
            if method == "locf":
                out[(k, g)] = prev[1]
            else:
                if prev[0] == g or nxt is None:
                    out[(k, g)] = prev[1]
                elif nxt[0] == prev[0]:
                    out[(k, g)] = prev[1]
                else:
                    frac = (g - prev[0]) / (nxt[0] - prev[0])
                    out[(k, g)] = prev[1] + (nxt[1] - prev[1]) * frac
            g += step
    return out


@pytest.mark.parametrize("method", ["locf", "interp"])
def test_gapfill_adversarial_sweep(spark, method):
    from fs2_data_spark.operators.gapfill import time_grid_fill
    rng = random.Random(13 if method == "locf" else 17)
    for trial in range(4):
        obs = {}
        rows = []
        for k in range(rng.randint(2, 6)):
            key = f"k{k}"
            n = rng.randint(1, 25)
            seen = set()
            pts = []
            for _ in range(n):
                m = rng.randint(0, 600)
                if m in seen:
                    continue
                seen.add(m)
                v = round(rng.uniform(-50, 50), 3)
                pts.append((T0_US + m * 60_000_000, v))
                rows.append((key, ts(m), v))
            obs[key] = pts
        df = spark.createDataFrame(
            rows, "user_id string, ts timestamp, value double")
        got = {(r.user_id, r.grid_us): r.filled
               for r in time_grid_fill(df, on="user_id", ts="ts",
                                       value="value", step_us=STEP,
                                       method=method).collect()}
        ref = _ref_gapfill(obs, STEP, method)
        assert got.keys() == ref.keys(), f"grid mismatch trial {trial}"
        for key in ref:
            assert got[key] == pytest.approx(ref[key], abs=1e-9), \
                f"{method} trial {trial} {key}"


def test_twa_adversarial_sweep(spark):
    from fs2_data_spark.operators.windows import time_weighted_avg
    rng = random.Random(23)
    for trial in range(4):
        rows, ref = [], {}
        for k in range(rng.randint(2, 5)):
            key = f"k{k}"
            minutes = sorted(rng.sample(range(0, 2000), rng.randint(1, 30)))
            pts = [(m, round(rng.uniform(-10, 10), 3)) for m in minutes]
            rows += [(key, ts(m), v) for m, v in pts]
            if len(pts) == 1:
                ref[key] = pts[0][1]
            else:
                num = sum(v * (m2 - m1) for (m1, v), (m2, _)
                          in zip(pts, pts[1:]))
                ref[key] = num / (pts[-1][0] - pts[0][0])
        df = spark.createDataFrame(
            rows, "user_id string, ts timestamp, value double")
        got = {r.user_id: r.twa for r in time_weighted_avg(df).collect()}
        for key in ref:
            assert got[key] == pytest.approx(round(ref[key], 4), abs=2e-4), \
                f"trial {trial} {key}"


def test_asof_multi_adversarial_vs_sequential(spark):
    """Fused N-way as-of == N sequential pandas-strategy as-of joins on
    random streams with duplicate keys/timestamps."""
    from fs2_data_spark.operators.asof import asof_join, asof_join_multi
    rng = random.Random(31)
    for trial in range(3):
        lrows = [(f"k{rng.randint(0, 4)}", ts(rng.randint(0, 500)), i)
                 for i in range(80)]
        left = spark.createDataFrame(
            lrows, "doc_id string, event_time timestamp, seq int")
        rights = []
        for j in range(3):
            rrows = [(f"k{rng.randint(0, 4)}", ts(rng.randint(0, 500)),
                      round(rng.uniform(0, 100), 3))
                     for _ in range(rng.randint(5, 40))]
            rights.append(spark.createDataFrame(
                rrows, f"doc_id string, obs_time timestamp, f{j} double"))
        fused = asof_join_multi(
            left, [{"df": r, "ts": "obs_time", "suffix": ""}
                   for r in rights],
            on="doc_id", left_ts="event_time")
        seq = left
        for j, r in enumerate(rights):
            seq = asof_join(seq, r, on="doc_id", left_ts="event_time",
                            right_ts="obs_time", right_cols=[f"f{j}"],
                            strategy="pandas")
        cols = ["seq", "f0", "f1", "f2"]
        a = sorted(map(tuple, fused.select(*cols).collect()))
        b = sorted(map(tuple, seq.select(*cols).collect()))
        assert a == b, f"trial {trial}"

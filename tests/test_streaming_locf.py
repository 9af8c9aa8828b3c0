"""Streaming point-in-time LOCF join (streaming/locf.py).

The delivery contract under test: within a micro-batch the output is a
function of the batch's row *set* (chunk/shuffle-order independent); across
time-ordered batches the stream reproduces the batch as-of join exactly,
with the same lexicographic-(ts, value) tie-break as operators/asof.py.
"""

import calendar

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fs2_data_spark.streaming.locf import _resolve_chunk, streaming_pit_locf


def _mk(rows):
    """rows: (ts_us, value, is_obs) -> chunk pdf with an id column."""
    return pd.DataFrame({
        "ts": pd.to_datetime([r[0] for r in rows], unit="us"),
        "value": [float(r[1]) for r in rows],
        "is_obs": [bool(r[2]) for r in rows],
        "event_id": list(range(len(rows))),
    })


def _resolve(carry, pdf):
    res, carry = _resolve_chunk(carry, pdf, "ts", "value", "is_obs")
    out = {int(pdf["event_id"].iloc[p]): (v, int(t))
           for p, v, t in zip(res["_pos"], res["locf_v"], res["locf_ts_us"])}
    return out, carry


def _pandas_oracle(rows):
    """Brute-force LOCF: for each query, the lexicographically greatest
    (ts, value) observation with ts <= query ts; sentinel (0.0, -1)."""
    out = {}
    for i, (ts, v, obs) in enumerate(rows):
        if obs:
            continue
        cands = [(t2, v2) for (t2, v2, o2) in rows if o2 and t2 <= ts]
        out[i] = (max(cands)[1], max(cands)[0]) if cands else (0.0, -1)
    return out


ROWS = [
    (100, 1.0, True),
    (100, 3.0, True),    # tie at ts=100: value 3.0 wins (lexicographic max)
    (100, 9.0, False),   # query AT an obs ts: sees it (inclusive)
    (150, 5.0, False),
    (200, 2.0, True),
    (200, 7.0, False),
    (250, 4.0, False),
    (50, 8.0, False),    # before any obs: sentinel
]


def test_resolve_chunk_matches_brute_force():
    got, carry = _resolve((None, None), _mk(ROWS))
    assert got == _pandas_oracle(ROWS)
    assert carry == (200, 2.0)


def test_resolve_chunk_row_order_invariant():
    base, bc = _resolve((None, None), _mk(ROWS))
    rng = np.random.default_rng(0)
    for _ in range(5):
        perm = rng.permutation(len(ROWS))
        pdf = _mk(ROWS).iloc[perm].reset_index(drop=True)
        got, carry = _resolve((None, None), pdf)
        assert got == base and carry == bc


def test_resolve_chunk_time_split_invariant():
    """Any time-ordered split into successive chunks (carry threaded)
    reproduces the all-at-once resolution."""
    base, bc = _resolve((None, None), _mk(ROWS))
    srt = sorted(range(len(ROWS)), key=lambda i: ROWS[i][0])
    for cut1, cut2 in [(2, 5), (1, 7), (4, 4), (0, 8), (3, 6)]:
        carry, got = (None, None), {}
        for part in (srt[:cut1], srt[cut1:cut2], srt[cut2:]):
            if not part:
                continue
            pdf = _mk(ROWS).iloc[part].reset_index(drop=True)
            res, carry = _resolve_chunk(carry, pdf, "ts", "value", "is_obs")
            for p, v, t in zip(res["_pos"], res["locf_v"], res["locf_ts_us"]):
                got[int(pdf["event_id"].iloc[p])] = (v, int(t))
        assert got == base, (cut1, cut2)
        assert carry == bc, (cut1, cut2)


def test_resolve_chunk_late_obs_never_corrupts_carry():
    """An out-of-order observation older than the carried pair loses the
    lexicographic max — the carry invariant survives disorder."""
    _, carry = _resolve((None, None), _mk([(200, 2.0, True)]))
    assert carry == (200, 2.0)
    _, carry = _resolve(carry, _mk([(100, 99.0, True)]))
    assert carry == (200, 2.0)
    # ...and a query older than the carry gets the sentinel, never a
    # future value (strict point-in-time: the carried obs is at ts 200)
    got, _ = _resolve((200, 2.0), _mk([(150, 0.0, False)]))
    assert got[0] == (0.0, -1)


def test_resolve_chunk_carry_visible_at_exact_ts():
    got, _ = _resolve((200, 2.0), _mk([(200, 5.0, False)]))
    assert got[0] == (2.0, 200)


def test_resolve_chunk_sentinel_no_observation():
    got, carry = _resolve((None, None), _mk([(10, 1.0, False)]))
    assert got[0] == (0.0, -1)
    assert carry == (None, None)


def test_streaming_pit_locf_matches_batch(spark, events, tmp_path):
    """End-to-end: availableNow over a time-range-partitioned file feed ==
    the batch brute-force as-of resolution, for every query event."""
    ev = (events.filter(F.col("user_id") < 20)
          .select("event_id", "user_id", "ts", "value",
                  (F.col("event_type") == "purchase").alias("is_obs")))
    rows = ev.collect()
    src = tmp_path / "feed"
    src.mkdir()
    stage = str(tmp_path / "stage")
    (ev.repartitionByRange(3, "ts").sortWithinPartitions("ts")
       .write.mode("overwrite").parquet(stage))
    import os
    import shutil
    parts = sorted(p for p in os.listdir(stage)
                   if p.startswith("part-") and p.endswith(".parquet"))
    for i, p in enumerate(parts):
        dst = str(src / f"b{i:02d}.parquet")
        shutil.copyfile(f"{stage}/{p}", dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = streaming_pit_locf(stream, key="user_id", ts="ts", value="value",
                             is_obs="is_obs", id_col="event_id",
                             watermark="10000 days", timeout_s=None)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("locf_out").trigger(availableNow=True).start())
    # NoTimeout => the availableNow drain must actually terminate (with a
    # processing-time timeout this would spin cleanup batches for 120 s)
    assert q.awaitTermination(120), "availableNow drain did not terminate"
    got = {r.event_id: (r.locf_v, r.locf_ts_us)
           for r in spark.table("locf_out").collect()}

    # brute-force oracle per user over the same rows
    exp = {}
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for urows in by_user.values():
        obs = [(r.ts, r.value) for r in urows if r.is_obs]
        for r in urows:
            if r.is_obs:
                continue
            c = [(t, v) for t, v in obs if t <= r.ts]
            if c:
                t, v = max(c)
                # naive UTC datetime -> epoch micros (tz-independent)
                us = (int(calendar.timegm(t.timetuple())) * 1_000_000
                      + t.microsecond)
                exp[r.event_id] = (v, us)
            else:
                exp[r.event_id] = (0.0, -1)
    assert got == exp and len(got) > 50


def test_streaming_pit_locf_unordered_scrambled_delivery(
        spark, events, tmp_path):
    """The watermark-buffered variant: files delivered in SCRAMBLED
    time-range order must still reproduce the batch as-of join exactly —
    the watermark delay exceeds the data span (nothing is late), and
    per-key heartbeat rows beyond max_ts + delay push the watermark past
    every query so the drain flushes all of them."""
    import datetime
    import os
    import shutil

    from fs2_data_spark.streaming.locf import streaming_pit_locf_unordered

    ev = (events.filter(F.col("user_id") < 20)
          .select("event_id", "user_id", "ts", "value",
                  (F.col("event_type") == "purchase").alias("is_obs")))
    rows = ev.collect()
    tmin = min(r.ts for r in rows)
    tmax = max(r.ts for r in rows)
    delay_days = (tmax - tmin).days + 2
    hb_ts = tmax + datetime.timedelta(days=delay_days + 1)

    src = tmp_path / "feed"
    src.mkdir()
    stage = str(tmp_path / "stage")
    (ev.repartitionByRange(4, "ts").sortWithinPartitions("ts")
       .write.mode("overwrite").parquet(stage))
    parts = sorted(p for p in os.listdir(stage)
                   if p.startswith("part-") and p.endswith(".parquet"))
    assert len(parts) == 4
    # admission order 2, 0, 3, 1 — maximally out of time order
    for mtime_rank, i in enumerate([2, 0, 3, 1]):
        dst = str(src / f"b{i:02d}.parquet")
        shutil.copyfile(f"{stage}/{parts[i]}", dst)
        os.utime(dst, (1_700_000_000 + mtime_rank,) * 2)
    # heartbeat file last: one obs per user beyond max_ts + delay
    users = sorted({r.user_id for r in rows})
    hb = spark.createDataFrame(
        [(10_000_000 + u, u, hb_ts, 0.0, True) for u in users],
        ev.schema)
    hb.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "hb"))
    hbp = [p for p in os.listdir(str(tmp_path / "hb"))
           if p.endswith(".parquet")][0]
    shutil.copyfile(str(tmp_path / "hb" / hbp), str(src / "zz_hb.parquet"))
    os.utime(str(src / "zz_hb.parquet"), (1_700_000_010,) * 2)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = streaming_pit_locf_unordered(
        stream, key="user_id", ts="ts", value="value",
        is_obs="is_obs", id_col="event_id",
        watermark=f"{delay_days} days")
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("locf_unord").trigger(availableNow=True).start())
    assert q.awaitTermination(180), "drain did not terminate"
    got = {r.event_id: (r.locf_v, r.locf_ts_us)
           for r in spark.table("locf_unord").collect()}

    exp = {}
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for urows in by_user.values():
        obs = [(r.ts, r.value) for r in urows if r.is_obs]
        for r in urows:
            if r.is_obs:
                continue
            c = [(t, v) for t, v in obs if t <= r.ts]
            if c:
                t, v = max(c)
                us = (int(calendar.timegm(t.timetuple())) * 1_000_000
                      + t.microsecond)
                exp[r.event_id] = (v, us)
            else:
                exp[r.event_id] = (0.0, -1)
    assert got == exp and len(got) > 50


def test_streaming_interval_join_matches_batch(spark, events, tmp_path):
    """Stream-stream interval join == the batch join with the identical
    time-range predicate; inner joins emit on match so the availableNow
    drain needs no heartbeat and must terminate."""
    from fs2_data_spark.streaming.joins import streaming_interval_join

    ev = (events.filter(F.col("user_id") < 40)
          .select("event_id", "user_id", "ts", "event_type"))
    src = str(tmp_path / "ij_src")
    ev.write.mode("overwrite").parquet(src)
    p = (spark.readStream.schema(ev.schema).parquet(src)
         .filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("p_id"),
                 F.col("ts").alias("p_ts")))
    v = (spark.readStream.schema(ev.schema).parquet(src)
         .filter(F.col("event_type") == "view")
         .select("user_id", F.col("event_id").alias("v_id"),
                 F.col("ts").alias("v_ts")))
    out = streaming_interval_join(p, v, key="user_id", left_ts="p_ts",
                                  right_ts="v_ts", lookback_s=7 * 86_400,
                                  watermark="10000 days")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("ij_out").trigger(availableNow=True).start())
    assert q.awaitTermination(180), "drain did not terminate"
    got = {(r.p_id, r.v_id) for r in spark.table("ij_out").collect()}

    import datetime
    rows = ev.collect()
    exp = set()
    for a in rows:
        if a.event_type != "purchase":
            continue
        for b in rows:
            if (b.event_type == "view" and b.user_id == a.user_id
                    and a.ts - datetime.timedelta(days=7) <= b.ts <= a.ts):
                exp.add((a.event_id, b.event_id))
    assert got == exp and len(got) > 20

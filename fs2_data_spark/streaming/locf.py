"""Streaming point-in-time LOCF join — the continuous-ingest counterpart of
the batch as-of join (``operators/asof.py``).

One event stream carries two roles per key: *observations* (rows that publish
a value) and *queries* (rows that need the value as of their own event time).
For every query row the operator emits the last observation with
``obs.ts <= query.ts`` (inclusive, strict point-in-time — zero temporal
leakage), carrying per-key state across micro-batches in
``applyInPandasWithState``.  This is the streaming leg of the north-rule
feature stack: a feature store serving "latest feature value as of event
time" over an unbounded stream.

Delivery contract (and why it is the honest one): within a micro-batch the
group's rows are resolved as a *set* (all Arrow chunks concatenated, then
sorted by event time), so the output is independent of shuffle/chunk order
inside the batch; across batches, resolution is exact for *time-ordered
batch delivery* — each query sees every observation with a
smaller-or-equal timestamp when micro-batches arrive in non-decreasing
event-time order, the standard guarantee of a time-partitioned ingest log
(a range-partitioned file feed, Kafka per-key ordering).  Under that
contract the output is **batching-invariant**: any time-ordered micro-batch
partitioning of the same stream yields identical rows (pinned by
``tests/test_streaming_locf.py`` at 1-file-per-trigger vs all-at-once).
fs2-data has the same stance — input order is authoritative (reference
``cbor/shared/src/main/scala/fs2/data/cbor/low/model.scala:24-27``); Spark
merely adds the key-partitioned time axis.
For out-of-order sources, a watermark-buffered variant (hold queries until
the watermark passes their ts) trades latency for order tolerance; with the
carried pair being the lexicographic max of ``(ts, value)``, a late
observation older than the carry never corrupts state (it loses the max),
so disorder degrades individual answers, never the carry invariant.

Tie-break parity with the batch operator: at equal ``(key, ts)`` the
observation with the lexicographically greatest ``(ts, value)`` wins
(``operators/asof.py dedup_right`` — "keep the lexicographically greatest
payload"), and an observation at exactly the query's timestamp is visible
(``allow_exact`` semantics).  The batch as-of join over the same rows is
therefore the exact oracle.

State is one ``(last_ts_us, last_value)`` pair per key — O(keys) regardless
of stream length — expired by a processing-time timeout like the
running-features operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_STATE_SCHEMA = "last_ts_us bigint, last_v double"


def _resolve_chunk(carry, pdf, ts, value, is_obs):
    """Resolve one pandas chunk against the carried (last_ts_us, last_v)
    observation pair; returns (result pdf for query rows, new carry).

    Pure per-chunk kernel, module-level so tests can pin chunking-invariance
    directly.  The carried pair joins the chunk as a synthetic observation
    row, then a single stable sort by ``(ts, is_query, value)`` makes a
    vectorized ffill reproduce the batch as-of semantics: at equal ts all
    observations sort before queries (inclusive match), ascending value puts
    the lexicographic winner last — exactly ``operators/asof.py``'s
    deterministic dedup.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    lt, lv = carry
    s = pd.to_datetime(pdf[ts])
    if getattr(s.dt, "tz", None) is not None:
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    ts_us = s.to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
    obs = pdf[is_obs].to_numpy(dtype="bool")
    val = pdf[value].to_numpy(dtype="float64")

    # synthetic row for the carried observation (position 0 after prepend)
    if lt is not None:
        ts_us = np.concatenate(([lt], ts_us))
        obs = np.concatenate(([True], obs))
        val = np.concatenate(([lv], val))
        pad = 1
    else:
        pad = 0

    order = np.lexsort((val, ~obs, ts_us))  # ts asc, obs-first, value asc
    o_ts, o_obs, o_val = ts_us[order], obs[order], val[order]

    # vectorized LOCF: index of the most recent observation at-or-before
    # each position in the sorted sequence
    idx = np.arange(len(o_ts))
    obs_idx = np.where(o_obs, idx, -1)
    ff = np.maximum.accumulate(obs_idx)
    # unmatched sentinel: (0.0, -1) — ts_us = -1 disambiguates from a real
    # 0-valued observation, and keeps the emitted frame free of NaN (Arrow
    # would ship NaN, not SQL NULL, breaking oracle comparison)
    locf_v = np.where(ff >= 0, o_val[np.clip(ff, 0, None)], 0.0)
    locf_ts = np.where(ff >= 0, o_ts[np.clip(ff, 0, None)], -1)

    q_mask = ~o_obs
    res = pd.DataFrame({
        "_pos": order[q_mask] - pad,  # original chunk row index
        "locf_v": locf_v[q_mask],
        "locf_ts_us": locf_ts[q_mask],
    })
    # new carry: lexicographic max of (ts, value) over observations
    if o_obs.any():
        m = o_ts == o_ts[o_obs].max()
        cand_v = val[order][m & o_obs].max()
        cand = (int(o_ts[o_obs].max()), float(cand_v))
        if lt is None or cand > (lt, lv):
            lt, lv = cand
    return res, (lt, lv)


def streaming_pit_locf(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    is_obs: str = "is_obs",
    id_col: str = "event_id",
    watermark: str = "1 hour",
    timeout_s: int | None = 3600,
) -> DataFrame:
    """Streaming as-of resolution: one output row per *query* event with the
    point-in-time LOCF value (``locf_v``/``locf_ts_us``; the ``(0.0, -1)``
    sentinel when no observation precedes it).  See module docstring for the
    delivery contract and tie-break semantics.

    ``timeout_s=None`` disables state expiry (``NoTimeout``) — required for
    bounded ``availableNow`` drains to terminate: under
    ``ProcessingTimeTimeout`` Spark keeps scheduling no-data cleanup batches
    until every key's timer fires (see ``sessions.py
    streaming_running_features`` for the full mechanics), so a drain spins
    for up to ``timeout_s`` after the last data batch.  Continuous
    pipelines keep the default, which bounds state to live keys.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    key_type = {f.name: f.dataType.simpleString()
                for f in events.schema.fields}[key]
    id_type = {f.name: f.dataType.simpleString()
               for f in events.schema.fields}[id_col]
    out_schema = (f"{key} {key_type}, {id_col} {id_type}, "
                  "locf_v double, locf_ts_us bigint")

    def fn(k: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        carry = state.get if state.exists else (None, None)
        # Concatenate the group's Arrow chunks BEFORE resolving: within one
        # micro-batch the chunk iterator's order is shuffle-dependent (the
        # round-4 running-features lesson), so per-chunk resolution would be
        # nondeterministic.  Resolving the batch's row *set* in one pass
        # makes the output a function of (carried state, batch membership)
        # only; memory is bounded by per-trigger admission control
        # (maxFilesPerTrigger / maxOffsetsPerTrigger), not stream length.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True)
            res, carry = _resolve_chunk(carry, pdf, ts, value, is_obs)
            if len(res):
                ids = pdf[id_col].to_numpy()[res["_pos"].to_numpy()]
                yield pd.DataFrame({
                    key: k[0], id_col: ids,
                    "locf_v": res["locf_v"].to_numpy(),
                    "locf_ts_us": res["locf_ts_us"].to_numpy(),
                })
        lt, lv = carry
        if lt is not None:
            state.update((int(lt), float(lv)))
            if timeout_s is not None:
                state.setTimeoutDuration(timeout_s * 1000)

    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    timeout_conf = (GroupStateTimeout.NoTimeout if timeout_s is None
                    else GroupStateTimeout.ProcessingTimeTimeout)
    return (events.withWatermark(ts, watermark)
            .groupBy(key)
            .applyInPandasWithState(
                fn, out_schema, _STATE_SCHEMA, "update", timeout_conf))


_UNORDERED_STATE_SCHEMA = (
    "lt bigint, lv double, obs_ts array<bigint>, obs_v array<double>, "
    "q_ts array<bigint>, q_id array<long>")


def streaming_pit_locf_unordered(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    is_obs: str = "is_obs",
    id_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Out-of-order-tolerant streaming as-of resolution — the
    watermark-buffered variant the ordered operator's docstring promises.

    :func:`streaming_pit_locf` is exact under time-ordered batch delivery;
    this variant is exact under ARBITRARY delivery order of events no
    later than the watermark delay: every event is buffered in per-key
    state, and a query is resolved only once the event-time watermark has
    passed its timestamp (strictly) — at that point every observation with
    ``obs.ts <= query.ts`` has either arrived or was dropped as late by
    the watermark itself, so the emitted answer equals the batch as-of
    join over the full stream *regardless of delivery order* (the batch
    operator is therefore the oracle with no ordering caveat at all).

    The price is the inherent one: per-key state holds the events inside
    the disorder horizon (watermark delay), so memory is O(keys x delay x
    rate) instead of O(keys).  Buffered observations below the watermark
    compact into the single carried ``(ts, value)`` lexicographic max —
    future queries all have ``ts > watermark``, for which that max is the
    only below-watermark observation that can ever matter.

    Flush semantics are watermark semantics: a query emits only once the
    watermark passes it.  The operator arms an ``EventTimeTimeout`` at the
    earliest pending query's timestamp, so a key IS invoked (with no data)
    as soon as the global watermark crosses its oldest pending query —
    buffered queries never need new per-key data to be released, only
    watermark progress.  Queries inside the final watermark delay of the
    stream's end stay buffered — the standard
    last-window-never-closes behavior of event-time streaming; drains
    that need them push the watermark past the end with late heartbeat
    rows (the smoke does).

    Output rows carry ``emitted_wm_us`` (the watermark that released
    them) for lineage; resolution itself reuses the ordered operator's
    set-resolution kernel, so tie-breaks (lexicographic ``(ts, value)``
    max, inclusive ``t' <= t``) are identical across all three legs:
    batch as-of, ordered streaming, unordered streaming.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    types = {f.name: f.dataType.simpleString() for f in events.schema.fields}
    out_schema = (f"{key} {types[key]}, {id_col} {types[id_col]}, "
                  "locf_v double, locf_ts_us bigint, emitted_wm_us bigint")

    def fn(k: tuple, pdfs, state: GroupState):
        # hasTimedOut here means "the watermark crossed this key's oldest
        # pending query" — a flush signal, not expiry: fall through with an
        # empty batch and resolve what the watermark now allows
        lt, lv, obs_ts, obs_v, q_ts, q_id = (
            state.get if state.exists else (None, None, [], [], [], []))
        obs_ts = np.asarray(obs_ts, dtype="int64")
        obs_v = np.asarray(obs_v, dtype="float64")
        q_ts = np.asarray(q_ts, dtype="int64")
        q_id = np.asarray(q_id, dtype="int64")

        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = (chunks[0] if len(chunks) == 1
                   else pd.concat(chunks, ignore_index=True))
            s = pd.to_datetime(pdf[ts])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            t_us = s.to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
            ob = pdf[is_obs].to_numpy(dtype="bool")
            obs_ts = np.concatenate((obs_ts, t_us[ob]))
            obs_v = np.concatenate(
                (obs_v, pdf[value].to_numpy(dtype="float64")[ob]))
            q_ts = np.concatenate((q_ts, t_us[~ob]))
            q_id = np.concatenate(
                (q_id, pdf[id_col].to_numpy(dtype="int64")[~ob]))

        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = q_ts < wm_us
        if ready.any():
            # resolve the released queries against carry + ALL buffered
            # observations with the ordered kernel (identical tie-breaks);
            # observations above a query's ts sort after it and are ignored
            # by the ffill, so including them is harmless
            frame = pd.DataFrame({
                ts: np.concatenate((obs_ts, q_ts[ready])).astype(
                    "datetime64[us]"),
                value: np.concatenate(
                    (obs_v, np.zeros(int(ready.sum())))),
                is_obs: np.concatenate(
                    (np.ones(len(obs_ts), dtype=bool),
                     np.zeros(int(ready.sum()), dtype=bool))),
            })
            res, _ = _resolve_chunk((lt, lv), frame, ts, value, is_obs)
            # _pos indexes the synthetic frame: query i sits at len(obs)+i
            qpos = res["_pos"].to_numpy() - len(obs_ts)
            yield pd.DataFrame({
                key: k[0],
                id_col: q_id[ready][qpos],
                "locf_v": res["locf_v"].to_numpy(),
                "locf_ts_us": res["locf_ts_us"].to_numpy(),
                "emitted_wm_us": np.int64(wm_us),
            })
            q_ts, q_id = q_ts[~ready], q_id[~ready]

        # compact below-watermark observations into the carry: any future
        # query has ts >= wm, so only the lexicographic max below wm matters
        old = obs_ts < wm_us
        if old.any():
            m_ts = obs_ts[old].max()
            m_v = obs_v[old][obs_ts[old] == m_ts].max()
            if lt is None or (int(m_ts), float(m_v)) > (lt, lv):
                lt, lv = int(m_ts), float(m_v)
            obs_ts, obs_v = obs_ts[~old], obs_v[~old]

        state.update((lt, lv, [int(x) for x in obs_ts],
                      [float(x) for x in obs_v],
                      [int(x) for x in q_ts], [int(x) for x in q_id]))
        if len(q_ts):
            # wake this key when the watermark passes its oldest pending
            # query (ms, strictly above the current watermark by the
            # resolve rule: pending q_ts >= wm_us)
            state.setTimeoutTimestamp(int(q_ts.min()) // 1000 + 1)

    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (events.withWatermark(ts, watermark)
            .groupBy(key)
            .applyInPandasWithState(
                fn, out_schema, _UNORDERED_STATE_SCHEMA, "update",
                GroupStateTimeout.EventTimeTimeout))

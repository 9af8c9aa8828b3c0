"""The flagship point-in-time feature pipeline, skew-aware.

``pit_feature_pipeline`` composes the engine's core: as-of join (strict
point-in-time feature attachment) + lag/lead window features + gap
sessionization, with **hybrid skew routing**: sampled heavy-hitter detection
splits keys into a normal path (single-window operators — cheapest when every
key is small) and a hot path (segmented-scan operators whose parallelism is
independent of key size). Both paths produce identical semantics
(tests/test_segmented.py pins hot == normal output row-for-row), so the split
is purely a physical-plan decision — the engine's own little AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fs2_data_spark.functions.timeutil import epoch_us
from fs2_data_spark.operators.asof import asof_join
from fs2_data_spark.operators.segmented import detect_hot_keys
from fs2_data_spark.operators.sessionize import sessionize
from fs2_data_spark.operators.windows import with_lag_lead
from pyspark.sql import Window


def fused_pit_features(
    seqs: DataFrame,
    obs: DataFrame,
    key: str = "doc_id",
    left_ts: str = "event_time",
    right_ts: str = "obs_time",
    tiebreak: str = "seq_no",
    right_cols: list[str] | None = None,
    lag_cols: tuple[str, ...] = ("n_tok",),
    gap_s: int = 3600,
    allow_exact: bool = True,
    bucket_us: int | None = None,
    carry_join: str = "broadcast",
) -> DataFrame:
    """The whole PIT feature stack in ONE exchange + ONE sort.

    Trick: on the unioned (left ∪ right) stream ordered by (ts, side, tie),
    every feature is a running aggregate over the same window spec:

    - as-of match   = last(right payload, ignorenulls) over (-inf, 0]
    - lag/lead/session flags via O(n) offset functions on the left rows

    Catalyst plans a single WindowExec chain (one hash exchange on the key,
    one sort). Semantics identical to asof_join + with_lag_lead + sessionize
    (pinned by tests).

    ``bucket_us`` switches to the **segmented** physical plan for skewed
    keys: windows partition by (key, time-bucket) — so a hot key's timeline
    is processed by many parallel tasks — and cross-bucket state (as-of
    carry, bucket-boundary lag/lead, session counts) is resolved on a tiny
    per-(key, bucket) summary joined back. Output is exactly equal to the
    unsegmented plan for every bucket size (pinned by tests).

    ``carry_join`` (mirrors ``segmented_asof_join``): how that summary joins
    back. ``"broadcast"`` (default) is right under the hybrid router, which
    sends only sampled heavy hitters through this plan — carry rows are
    |hot keys| x |buckets|, thousands. Calling ``bucket_us=...`` directly on
    a FULL billion-key table makes the summary |keys| x |buckets| rows —
    pass ``"shuffle"`` there or the broadcast will not fit executor memory.
    """
    if carry_join not in ("broadcast", "shuffle"):
        raise ValueError(f"carry_join must be 'broadcast' or 'shuffle', got {carry_join!r}")
    if right_cols is None:
        right_cols = [c for c in obs.columns if c not in {key, right_ts}]
    _ts, _side = "__f_ts", "__f_side"
    r = (obs.select(key, F.col(right_ts).alias(_ts), F.struct(*right_cols).alias("__r"))
         .groupBy(key, _ts).agg(F.max("__r").alias("__r")))
    l_side, r_side = (1, 0) if allow_exact else (0, 1)
    lcols = list(seqs.columns)
    l2 = seqs.select(
        *lcols, F.col(left_ts).alias(_ts), F.lit(l_side).alias(_side),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    r2 = r.select(
        *[F.col(key).alias(c) if c == key
          else F.lit(None).cast(seqs.schema[c].dataType).alias(c) for c in lcols],
        _ts, F.lit(r_side).alias(_side), "__r",
    )
    u = l2.unionByName(r2)
    is_left = F.col(_side) == l_side

    if bucket_us is not None:
        return _fused_segmented(u, key, _ts, _side, tiebreak, lcols, right_cols,
                                lag_cols, gap_s, is_left, bucket_us, carry_join)

    base = Window.partitionBy(key).orderBy(_ts, _side, tiebreak)
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # pass 1 (union rows): the as-of match — incremental O(n) running frame
    out = u.withColumn("__m", F.last("__r", ignorenulls=True).over(run)).filter(is_left)

    # pass 2 (left rows only): lag/lead/session via O(n) offset functions.
    # Same partitioning and an order prefix-compatible with pass 1 (_side is
    # constant on left rows), so Catalyst reuses the exchange; do NOT use
    # first/last over (1, unboundedFollowing) frames here — Spark evaluates
    # UnboundedFollowing frames by re-scanning per row (quadratic on a hot key)
    w2 = Window.partitionBy(key).orderBy(_ts, _side, tiebreak)
    w2run = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for c in lag_cols:
        out = out.withColumn(f"lag1_{c}", F.lag(c).over(w2))
        out = out.withColumn(f"lead1_{c}", F.lead(c).over(w2))
    if gap_s is not None:
        prev_ts = F.lag(_ts).over(w2)
        flag = F.when(prev_ts.isNull()
                      | ((epoch_us(F.col(_ts)) - epoch_us(prev_ts))
                         > F.lit(int(gap_s) * 1_000_000)), 1).otherwise(0)
        out = out.withColumn("session_seq", F.sum(flag).over(w2run).cast("bigint"))
    return out.select(
        *lcols,
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
        *[f"lag1_{c}" for c in lag_cols],
        *[f"lead1_{c}" for c in lag_cols],
        *(["session_seq"] if gap_s is not None else []))


def _fused_segmented(u, key, _ts, _side, tiebreak, lcols, right_cols,
                     lag_cols, gap_s, is_left, bucket_us,
                     carry_join="broadcast"):
    """Segmented physical plan of :func:`fused_pit_features` (see its
    docstring). One (key, bucket) exchange over the big data; summaries and
    carries are per-(key, bucket) rows — thousands, not billions."""
    _b = "__f_b"
    u = u.withColumn(_b, F.floor(epoch_us(F.col(_ts)) / F.lit(bucket_us)).cast("bigint"))
    wb = Window.partitionBy(key, _b).orderBy(_ts, _side, tiebreak)
    wb_run = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_s = Window.partitionBy(key).orderBy(_b)
    w_s_prev = w_s.rowsBetween(Window.unboundedPreceding, -1)

    # within-bucket as-of match (union rows)
    d = u.withColumn("__m_in", F.last("__r", ignorenulls=True).over(wb_run))

    # as-of carry: last right payload of each bucket, LOCF'd over buckets
    sum_r = u.groupBy(key, _b).agg(
        F.max(F.when(F.col("__r").isNotNull(),
                     F.struct(F.col(_ts).alias("t"), F.col("__r").alias("r"))))
        .alias("__lr"))
    carry_r = sum_r.select(
        key, _b,
        F.last("__lr", ignorenulls=True).over(w_s_prev).getField("r").alias("__cr"))

    # left rows: within-bucket offsets + ordinals
    d = d.filter(is_left)
    d = d.withColumn("__rn", F.row_number().over(wb))
    d = d.withColumn("__cnt", F.count(F.lit(1)).over(Window.partitionBy(key, _b)))
    for c in lag_cols:
        d = d.withColumn(f"__lag_in_{c}", F.lag(c).over(wb))
        d = d.withColumn(f"__lead_in_{c}", F.lead(c).over(wb))
    gap_cond = None
    if gap_s is not None:
        gap_us_lit = F.lit(int(gap_s) * 1_000_000)
        prev_ts = F.lag(_ts).over(wb)
        flag_known = F.when(prev_ts.isNotNull()
                            & ((epoch_us(F.col(_ts)) - epoch_us(prev_ts)) > gap_us_lit),
                            1).otherwise(0)
        d = d.withColumn("__flag_known", flag_known)
        d = d.withColumn("__cum_known", F.sum("__flag_known").over(wb_run))

    # per-bucket boundary summary of LEFT rows (first/last row in timeline
    # order; struct field order IS the ordering: ts, tiebreak, then values)
    row_struct = F.struct(F.col(_ts).alias("__t"), F.col(tiebreak).alias("__tb"),
                          *[F.col(c).alias(c) for c in lag_cols])
    aggs = [F.min(row_struct).alias("__first"), F.max(row_struct).alias("__last")]
    if gap_s is not None:
        aggs.append(F.sum("__flag_known").alias("__flags"))
    sum_l = d.groupBy(key, _b).agg(*aggs)
    sum_l = (sum_l.withColumn("__prev_last", F.lag("__last").over(w_s))
             .withColumn("__next_first", F.lead("__first").over(w_s)))
    fix_cols = [key, _b, "__prev_last", "__next_first"]
    if gap_s is not None:
        first_flag = F.when(F.col("__prev_last").isNull(), F.lit(1)).when(
            (epoch_us(F.col("__first.__t")) - epoch_us(F.col("__prev_last.__t")))
            > F.lit(int(gap_s) * 1_000_000), F.lit(1)).otherwise(F.lit(0))
        sum_l = sum_l.withColumn("__ff", first_flag)
        sum_l = sum_l.withColumn(
            "__carry_n",
            F.coalesce(F.sum(F.col("__ff") + F.col("__flags")).over(w_s_prev), F.lit(0)))
        fix_cols += ["__ff", "__carry_n"]
    fix = sum_l.select(*fix_cols).join(carry_r, [key, _b], "left")

    out = d.join(F.broadcast(fix) if carry_join == "broadcast" else fix,
                 [key, _b], "left")
    out = out.withColumn("__m", F.coalesce("__m_in", "__cr"))
    for c in lag_cols:
        out = out.withColumn(
            f"lag1_{c}",
            F.when(F.col("__rn") > 1, F.col(f"__lag_in_{c}"))
            .otherwise(F.col(f"__prev_last.{c}")))
        out = out.withColumn(
            f"lead1_{c}",
            F.when(F.col("__rn") < F.col("__cnt"), F.col(f"__lead_in_{c}"))
            .otherwise(F.col(f"__next_first.{c}")))
    if gap_s is not None:
        out = out.withColumn(
            "session_seq",
            (F.col("__carry_n") + F.col("__ff") + F.col("__cum_known")).cast("bigint"))
    return out.select(
        *lcols,
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
        *[f"lag1_{c}" for c in lag_cols],
        *[f"lead1_{c}" for c in lag_cols],
        *(["session_seq"] if gap_s is not None else []))


def pit_feature_pipeline(
    seqs: DataFrame,
    obs: DataFrame,
    key: str = "doc_id",
    left_ts: str = "event_time",
    right_ts: str = "obs_time",
    tiebreak: str = "seq_no",
    right_cols: list[str] | None = None,
    lag_cols: tuple[str, ...] = ("n_tok",),
    gap_s: int = 3600,
    hot_keys: list | None = None,
    hot_threshold: float = 0.01,
    hot_min_rows: int = 2_000_000,
    bucket_us: int | None = None,
    n_buckets_target: int = 256,
    feature_dim: int = 8,
    drop_payload_cols: tuple[str, ...] = ("tokens",),
    carry_join: str = "broadcast",
) -> DataFrame:
    """As-of features + lag/lead + sessions + derived feature vector.

    ``drop_payload_cols``: heavy payload columns excluded from the feature
    table. The point-in-time feature job never *reads* token arrays — only
    ``n_tok`` — so dropping them lets Catalyst prune the parquet scan
    (``ReadSchema`` excludes the array pages entirely) and keeps the shuffle
    narrow: measured 10x on the 1M-row bench. Consumers that need payloads
    join them back by ``(doc_id, seq_no)`` from the source table, which is
    a co-partitioned join at rest (bucketed Iceberg layout).

    ``bucket_us=None`` sizes hot-path time buckets from the hot subset's
    actual time span (span / n_buckets_target), so a hot key's timeline is
    spread over ~n_buckets_target parallel tasks. Hot routing also requires
    an estimated ``hot_min_rows`` per key — below that a single window task
    handles the key faster than the segmented machinery.
    """
    from fs2_data_spark.functions.timeutil import epoch_us

    seqs = seqs.drop(*[c for c in drop_payload_cols if c in seqs.columns])
    if right_cols is None:
        right_cols = [c for c in obs.columns if c not in {key, right_ts}]
    if hot_keys is None:
        hot_keys = detect_hot_keys(seqs, key, threshold_frac=hot_threshold,
                                   min_rows=hot_min_rows)

    def featurize_normal(left: DataFrame, right: DataFrame) -> DataFrame:
        return fused_pit_features(left, right, key=key, left_ts=left_ts,
                                  right_ts=right_ts, tiebreak=tiebreak,
                                  right_cols=right_cols, lag_cols=lag_cols,
                                  gap_s=gap_s)

    def featurize_hot(left: DataFrame, right: DataFrame) -> DataFrame:
        return fused_pit_features(left, right, key=key, left_ts=left_ts,
                                  right_ts=right_ts, tiebreak=tiebreak,
                                  right_cols=right_cols, lag_cols=lag_cols,
                                  gap_s=gap_s, bucket_us=bucket_us,
                                  carry_join=carry_join)

    if hot_keys:
        hot_lit = F.array(*[F.lit(k) for k in hot_keys])
        is_hot = F.array_contains(hot_lit, F.col(key))
        seqs_hot = seqs.filter(is_hot)
        if bucket_us is None:
            lo, hi = seqs_hot.agg(epoch_us(F.min(left_ts)),
                                  epoch_us(F.max(left_ts))).first()
            span = max((hi or 0) - (lo or 0), 1)
            bucket_us = max(span // n_buckets_target, 1)
        norm = featurize_normal(seqs.filter(~is_hot), obs.filter(~is_hot))
        hot = featurize_hot(seqs_hot, obs.filter(is_hot))
        out = norm.unionByName(hot.select(*norm.columns))
    else:
        out = featurize_normal(seqs, obs)

    return out.withColumn(
        "feature_out",
        F.transform(
            F.coalesce("feature_vec", F.array(*[F.lit(0.0)] * feature_dim)),
            lambda x: x * F.col(lag_cols[0]).cast("double"),
        ),
    )

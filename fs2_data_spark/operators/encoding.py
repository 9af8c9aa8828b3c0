"""Point-in-time feature encoding: expanding z-score normalization and
bucketed past-only target encoding.

Both operators carry the engine's zero-temporal-leakage contract (reference
semantics: fs2-data's streaming transforms only ever see the prefix of the
stream — ``json/src/main/scala/fs2/data/json/internals/TokenParser.scala``
pulls strictly left-to-right): every derived feature at time ``t`` is a
function of events with ``t' < t`` only (strict, the row itself excluded —
the feature-store "no label leakage" rule).

Determinism contract (canonical-oracle pattern): accumulations are
DECIMAL(38,12) (order-independent, exact), divisions/sqrt happen once in
double on exact-decimal inputs, and outputs are rounded so the DuckDB
replay is bit-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from fs2_data_spark.functions.timeutil import epoch_us

_DEC = "decimal(38,12)"


def expanding_zscore(
    df: DataFrame,
    value: str = "value",
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    round_dp: int = 6,
) -> DataFrame:
    """Standardize each event's ``value`` against the statistics of that
    entity's STRICTLY PRIOR events — the leakage-free online normalization
    of a point-in-time feature store (a training row must never be scaled
    by statistics that include itself or its future).

    ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` over
    ``(ts, tiebreak)`` — an expanding frame Spark evaluates incrementally
    (one pass per partition), unlike forward unbounded frames which go
    quadratic. All three accumulators (count, decimal sum, decimal sum of
    squares) share ONE partition sort: one Exchange + one Sort + one
    WindowExec at any number of derived features.

    Output columns: ``n_past`` (bigint), ``mean_past`` (exact-decimal-sum
    double, round 9), ``std_past`` (sample std over past, round 9, NULL
    when ``n_past < 2``), ``zscore`` (round ``round_dp``, NULL when std is
    NULL or 0). Variance uses the exact-decimal identity
    ``(n*sum2 - sum^2) / (n*(n-1))`` evaluated in double AFTER the exact
    sums are fixed, so both engines see identical operands.
    """
    key = [key] if isinstance(key, str) else list(key)
    w = (Window.partitionBy(*key)
         .orderBy("_eus", order_tiebreak)
         .rowsBetween(Window.unboundedPreceding, -1))
    v = F.col(value)
    n = F.count(value).over(w)
    s1 = F.sum(v.cast(_DEC)).over(w)
    # (15,6) x (15,6) -> (31,12): stays inside decimal(38,12) so the
    # product is exact (a (19,6) square would hit Spark's precision-38
    # ceiling and silently lose scale)
    s2 = F.sum((v.cast("decimal(15,6)") * v.cast("decimal(15,6)")).cast(_DEC)
               ).over(w)
    nd = n.cast("double")
    s1d = s1.cast("double")
    s2d = s2.cast("double")
    mean = F.when(n > 0, F.round(s1d / nd, 9))
    var = (nd * s2d - s1d * s1d) / (nd * (nd - F.lit(1.0)))
    std = F.when(n >= 2, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 9))
    z = F.when(std.isNotNull() & (std > 0),
               F.round((v - mean) / std, round_dp))
    return (df.withColumn("_eus", epoch_us(F.col(ts)))
            .select("*",
                    n.alias("n_past"),
                    mean.alias("mean_past"),
                    std.alias("std_past"),
                    z.alias("zscore"))
            .drop("_eus"))


def pit_target_encode(
    df: DataFrame,
    category: str = "event_type",
    target: str = "value",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    bucket_us: int = 3_600_000_000,
    prior: float = 0.0,
    prior_weight: float = 10.0,
) -> DataFrame:
    """Past-only target encoding of a categorical column: each event's
    category is replaced by the smoothed mean of ``target`` over ALL
    strictly-prior events of the same category (global history, not
    per-entity), with zero temporal leakage —
    ``enc = (sum_past + w*prior) / (n_past + w)``.

    The naive formulation is ``PARTITION BY category ORDER BY ts`` — for a
    low-cardinality categorical that is one partition per category, i.e. a
    handful of sequential tasks owning the full 100 TB history. This
    operator decomposes the expanding frame so no task ever sees more than
    one time bucket:

    1. aggregate ``(category, bucket)`` partials — count + DECIMAL(38,12)
       sum (the ordinary map-side-combined shuffle, key cardinality
       ``|cats| x |buckets|``, no skew pile-up);
    2. exclusive prefix-sum the partials per category — a window over the
       TINY bucket table (rows = cats x buckets);
    3. join the bucket prefix back (broadcast when small) and add the
       intra-bucket expanding frame, whose partitions are bounded by the
       bucket duration, never by total history.

    ``prior_events = earlier buckets (step 2) + earlier rows in my bucket
    (step 3)`` — exact, because both sides accumulate the same
    DECIMAL(38,12) monoid and the bucket split is a refinement of the
    ``(ts, tiebreak)`` total order. The driver oracle states the DIRECT
    single-window formulation, so a value match certifies the
    decomposition. ``prior``/``prior_weight`` are hyperparameters (compute
    the prior on a frozen training slice upstream — deriving it from the
    same stream would itself leak).

    Output: input columns + ``n_past``, ``sum_past`` (double of the exact
    decimal, round 9), ``target_enc`` (round 9).
    """
    eus = epoch_us(F.col(ts))
    b = (F.floor(F.col("_eus") / F.lit(bucket_us)) * F.lit(bucket_us)
         ).cast("bigint")
    ev = df.withColumn("_eus", eus).withColumn("_bucket", b)

    partials = (ev.groupBy(category, "_bucket")
                .agg(F.count(target).alias("_bn"),
                     F.sum(F.col(target).cast(_DEC)).alias("_bs")))
    wprev = (Window.partitionBy(category).orderBy("_bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    prefix = partials.select(
        category, "_bucket",
        F.coalesce(F.sum("_bn").over(wprev), F.lit(0)).alias("_pn"),
        F.coalesce(F.sum("_bs").over(wprev), F.lit(0).cast(_DEC))
         .alias("_ps"))

    wintra = (Window.partitionBy(category, "_bucket")
              .orderBy("_eus", order_tiebreak)
              .rowsBetween(Window.unboundedPreceding, -1))
    joined = (ev.join(prefix, on=[category, "_bucket"], how="left")
              .select("*",
                      F.coalesce(F.count(target).over(wintra), F.lit(0))
                       .alias("_in"),
                      F.coalesce(F.sum(F.col(target).cast(_DEC)).over(wintra),
                                 F.lit(0).cast(_DEC)).alias("_is")))
    n_past = (F.col("_pn") + F.col("_in")).cast("bigint")
    sum_past = (F.col("_ps") + F.col("_is")).cast("double")
    enc = F.round(
        (sum_past + F.lit(float(prior_weight)) * F.lit(float(prior)))
        / (n_past.cast("double") + F.lit(float(prior_weight))), 9)
    return (joined
            .withColumn("n_past", n_past)
            .withColumn("sum_past", F.round(sum_past, 9))
            .withColumn("target_enc", enc)
            .drop("_eus", "_bucket", "_bn", "_bs", "_pn", "_ps",
                  "_in", "_is"))


def winsorize(
    df: DataFrame,
    value: str = "value",
    key: str | Sequence[str] = "user_id",
    tiebreak: str = "event_id",
    q_lo: tuple[int, int] = (1, 20),
    q_hi: tuple[int, int] = (19, 20),
) -> DataFrame:
    """Group-wise winsorization: clip ``value`` to the group's exact
    [q_lo, q_hi] percentile band — the robust-scaling step that keeps a
    handful of outlier events from dominating trained features.

    EXACT percentiles by rank, not approximate sketches: the bound for
    quantile ``num/den`` is the value at rank ``ceil(num*n/den)`` in
    ``(value, tiebreak)`` order over the group's non-null values (exact
    integer ceil via ``(num*n + den - 1) div den`` — no float ranks, no
    interpolation, so any engine replays it bit-for-bit; the clip itself
    is pure comparison, so no rounding is needed anywhere).

    Scale shape: ONE hash exchange on the group key feeds both window
    passes (the ordered rank and the unbounded bound-pickup share the
    partitioning, Spark reuses the exchange — plan-pinned); nothing else
    shuffles. NULL values sort last (explicitly, because Spark defaults
    nulls FIRST ascending and DuckDB defaults them LAST), never rank,
    and pass through as NULL.

    Adds ``p_lo``, ``p_hi`` (the group bounds) and ``value_w`` (clipped).
    """
    key = [key] if isinstance(key, str) else list(key)
    v = F.col(value)
    wo = Window.partitionBy(*key).orderBy(v.asc_nulls_last(),
                                          F.col(tiebreak))
    wf = (Window.partitionBy(*key)
          .rowsBetween(Window.unboundedPreceding,
                       Window.unboundedFollowing))
    rn = F.row_number().over(wo)
    n = F.count(value).over(wf)
    lo_r = F.expr(f"CAST(({q_lo[0]} * _n + {q_lo[1] - 1}) DIV {q_lo[1]} "
                  "AS BIGINT)")
    hi_r = F.expr(f"CAST(({q_hi[0]} * _n + {q_hi[1] - 1}) DIV {q_hi[1]} "
                  "AS BIGINT)")
    tmp = df.select("*", rn.alias("_rn"), n.alias("_n"))
    tmp = tmp.select("*", lo_r.alias("_lo_r"), hi_r.alias("_hi_r"))
    lo_v = F.max(F.when(F.col("_rn") == F.col("_lo_r"), v)).over(wf)
    hi_v = F.max(F.when(F.col("_rn") == F.col("_hi_r"), v)).over(wf)
    out = tmp.select("*", lo_v.alias("p_lo"), hi_v.alias("p_hi"))
    clipped = F.when(v.isNotNull(),
                     F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi")))
    return (out.withColumn("value_w", clipped)
            .drop("_rn", "_n", "_lo_r", "_hi_r"))


def rank_normalize(
    df: DataFrame,
    group: str | Sequence[str] = "event_type",
    value: str = "value",
    out_col: str = "pct_rank",
) -> DataFrame:
    """Quantile (rank) normalization of a feature within each group:
    ``percent_rank()`` maps values onto [0, 1] by their order statistics
    — the distribution-free normalizer (robust to outliers and to any
    monotone transform of the raw feature, unlike z-scoring).  Tied raw
    values share a rank, so the output is a pure function of the value
    multiset — no tie-break column is needed or wanted.

    NOTE this is the in-sample transform (each row sees the whole
    group): fitting scalers point-in-time belongs to
    :func:`expanding_zscore` / :func:`pit_target_encode`, which only
    look backward.  One hash Exchange + one sort on the group key.
    ``value`` must be non-null (filter upstream — NULLs are unrankable
    and SQL engines disagree on their sort position).
    """
    group = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*group).orderBy(F.col(value))
    return df.withColumn(out_col, F.percent_rank().over(w))


def robust_scale(
    df: DataFrame,
    value: str = "value",
    key: str | Sequence[str] = "event_type",
    tiebreak: str = "event_id",
    out_col: str = "robust_z",
) -> DataFrame:
    """Group-wise robust scaling: ``(x - median) / (1.4826 * MAD)`` — the
    outlier-proof alternative to z-scoring (mean and stddev are both
    unbounded-influence statistics; median and MAD have breakdown point
    0.5).  1.4826 is the standard consistency constant that makes MAD
    estimate sigma under normality.

    EXACT medians by rank (the :func:`winsorize` discipline, not an
    interpolated percentile and not a sketch): the group median is the
    value at rank ``(n+1) div 2`` in ``(value, tiebreak)`` order — the
    lower median, exact integer arithmetic, bit-replayable in any
    engine; the MAD repeats the same rank pick over ``|x - median|``.

    Scale shape: ONE hash exchange on the group key feeds all four
    window passes (two ordered ranks + two unbounded bound-pickups share
    the partitioning; the second rank is a re-sort of the same
    partitions, never a new shuffle).  ``value`` must be non-null
    (filter upstream); groups with MAD = 0 (more than half the values
    identical) yield NULL — an honest "scale undefined", not a division
    blow-up.

    Adds ``med``, ``mad`` and ``out_col`` (all exact; callers round).
    """
    key = [key] if isinstance(key, str) else list(key)
    v = F.col(value)
    wg = Window.partitionBy(*key)
    w1 = wg.orderBy(v, F.col(tiebreak))
    n = F.count(F.lit(1)).over(wg)
    rk1 = F.row_number().over(w1)
    d = (df.withColumn("__rk1", rk1).withColumn("__n", n)
         .withColumn("__mid", F.expr("(__n + 1) div 2")))
    med = F.max(F.when(F.col("__rk1") == F.col("__mid"), v)).over(wg)
    d = d.withColumn("med", med).withColumn("__dev", F.abs(v - F.col("med")))
    w2 = wg.orderBy(F.col("__dev"), F.col(tiebreak))
    d = d.withColumn("__rk2", F.row_number().over(w2))
    mad = F.max(F.when(F.col("__rk2") == F.col("__mid"),
                       F.col("__dev"))).over(wg)
    d = d.withColumn("mad", mad)
    z = F.when(F.col("mad") > 0,
               (v - F.col("med")) / (F.lit(1.4826) * F.col("mad")))
    return d.withColumn(out_col, z).drop("__rk1", "__rk2", "__mid", "__n",
                                         "__dev")


def equidepth_bins(
    df: DataFrame,
    value: str = "value",
    key: str | Sequence[str] = "event_type",
    tiebreak: str = "event_id",
    k: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Equi-depth discretization: ``ntile(k)`` over the group's value
    order — every bin gets ``n div k`` or ``n div k + 1`` rows by
    construction (the quantile-bucket feature encoding; equal-WIDTH
    binning is a per-row projection and needs no operator).  The order
    is made total with ``tiebreak``, so the assignment is deterministic
    and any engine's NTILE reproduces it exactly.  One Exchange + one
    Sort on the group key.  ``value`` must be non-null (filter upstream
    — NULLs are unrankable and engines disagree on their sort position).
    """
    key = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*key).orderBy(F.col(value), F.col(tiebreak))
    return df.withColumn(out_col, F.ntile(k).over(w))


def pit_robust_z(
    df: DataFrame,
    value: str = "value",
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    out_col: str = "pit_robust_z",
) -> DataFrame:
    """POINT-IN-TIME robust normalization: each row scaled by the median
    and IQR of its key's history UP TO AND INCLUDING itself — the
    leakage-free tier beside the in-sample :func:`robust_scale` (which
    lets early rows see late statistics; this one never does, the same
    ``t' <= t`` contract as the as-of join and :func:`expanding_zscore`).

    ``z = (x - expanding_median) / (expanding_q3 - expanding_q1)`` —
    IQR, not MAD: an expanding MAD re-centers every deviation on each
    row's own median, which is inherently O(n^2); expanding quantiles
    are one frame scan each, and Spark's interpolated ``percentile``
    window equals DuckDB's ``quantile_cont`` definition exactly
    ((n-1)*q rank, linear interpolation — parity pinned by the oracle).

    All three quantiles share ONE (key, order, frame) spec — a single
    WindowExec behind one Exchange + Sort.  Rows whose history has zero
    IQR (first row, or constant history) yield NULL — scale undefined,
    stated honestly.  Adds ``med_pit``, ``iqr_pit``, ``out_col``.
    """
    key = [key] if isinstance(key, str) else list(key)
    v = F.col(value)
    w = (Window.partitionBy(*key).orderBy(F.col(ts), F.col(tiebreak))
         .rowsBetween(Window.unboundedPreceding, 0))
    out = df.select(
        "*",
        F.percentile(v, 0.5).over(w).alias("med_pit"),
        (F.percentile(v, 0.75).over(w)
         - F.percentile(v, 0.25).over(w)).alias("iqr_pit"))
    z = F.when(F.col("iqr_pit") > 0, (v - F.col("med_pit"))
               / F.col("iqr_pit"))
    return out.withColumn(out_col, z)


def seasonal_baseline(
    df: DataFrame,
    value: str = "value",
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Point-in-time seasonal baseline + residual: each row's expected
    value is the expanding mean of its key's PAST observations in the
    same hour-of-week cell (the classic traffic/activity seasonality
    feature), and the residual is the deseasonalized signal the model
    should actually learn.  STRICTLY past (frame ends at -1): the row's
    own value never leaks into its baseline; a first-in-cell row has a
    NULL baseline, not a self-reference.

    One Exchange on (key, hour-of-week) — the seasonality cell IS the
    partition key, so at 100 TB the state per task is one running
    (decimal sum, count) per cell; sums are DECIMAL(27,6), combine-order
    independent.  Adds ``how`` (0-167), ``seasonal_mean`` (double) and
    ``seasonal_resid``.
    """
    from fs2_data_spark.functions.timeutil import epoch_us

    key = [key] if isinstance(key, str) else list(key)
    v = F.col(value)
    # hour-of-week from the epoch (Thursday-anchored like Unix): exact
    # integer arithmetic, identical in any engine
    how = F.expr(f"(unix_micros(CAST({ts} AS TIMESTAMP)) div 3600000000) % 168")
    d = df.withColumn("how", how.cast("int"))
    w = (Window.partitionBy(*key, "how")
         .orderBy(epoch_us(F.col(ts)), F.col(tiebreak))
         .rowsBetween(Window.unboundedPreceding, -1))
    base = (F.sum(v.cast("decimal(27,6)")).over(w).cast("double")
            / F.count(v).over(w).cast("double"))
    d = d.withColumn("seasonal_mean", base)
    return d.withColumn("seasonal_resid", v - F.col("seasonal_mean"))


def interarrival_stats(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-event inter-arrival features: the gap to the previous event
    (``dt_us``), the expanding mean gap, and their ratio (``burst`` < 1
    = arriving faster than this key's history — the burstiness signal
    behind rate-limit/anomaly features).  Strictly PIT: every statistic
    is a pure function of rows at ``t' <= t``.

    One Exchange + one Sort; the expanding mean sums exact int64
    microsecond gaps (no decimal needed — 2^63 us is ~292 k years).
    First events have NULL dt/ratio, honestly undefined.
    """
    from fs2_data_spark.functions.timeutil import epoch_us

    key = [key] if isinstance(key, str) else list(key)
    wo = Window.partitionBy(*key).orderBy("_eus", F.col(tiebreak))
    we = wo.rowsBetween(Window.unboundedPreceding, 0)
    d = (df.withColumn("_eus", epoch_us(F.col(ts)))
         .withColumn("dt_us", F.col("_eus") - F.lag("_eus").over(wo)))
    mean_dt = (F.sum("dt_us").over(we).cast("double")
               / F.count("dt_us").over(we).cast("double"))
    d = d.withColumn("mean_dt_us", mean_dt)
    return (d.withColumn(
        "burst",
        F.when(F.col("mean_dt_us") > 0,
               F.col("dt_us").cast("double") / F.col("mean_dt_us")))
        .drop("_eus"))


def trend_slope(
    df: DataFrame,
    value: str = "value",
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-key OLS trend: slope and intercept of ``value`` regressed on
    time — the classic "is this entity drifting up or down" feature
    (activity trend, burn rate, sensor drift).

    ``x`` is integer seconds since the KEY'S OWN first event (exact:
    microsecond epoch diff div 10^6), which both conditions the
    numerics (small x, no 10^15 epoch magnitudes) and makes the
    intercept meaningful (fitted value at the key's first event).

    Closed form over exact sufficient statistics::

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy - slope*Sx) / n

    ``n, Sx, Sxx`` are exact int64, ``Sy, Sxy`` exact DECIMAL — all five
    are combine-order independent, so the one map-side-combined
    aggregation is deterministic at any parallelism; the closed form is
    then evaluated in double on identical operands in any engine
    (bit-identical, the ``expanding_zscore`` discipline).  Keys with
    n < 2 or zero time-variance yield NULL slope/intercept (honest
    "trend undefined").

    Scale shape: one window pass for the per-key epoch minimum and the
    final groupBy share the SAME hash partitioning — Spark plans ONE
    Exchange.  Output: key, ``n``, ``slope`` (10 dp), ``intercept``
    (6 dp).
    """
    key = [key] if isinstance(key, str) else list(key)
    wk = Window.partitionBy(*key)
    d = (df.withColumn("_eus", epoch_us(F.col(ts)))
         .withColumn("_dus", F.col("_eus") - F.min("_eus").over(wk))
         # exact integer division (a double `/` + cast could truncate
         # one low; SQL `div` is exact in both engines)
         .withColumn("_x", F.expr("_dus div 1000000")))
    y = F.col(value)
    agg = (d.groupBy(*key).agg(
        F.count(value).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum(y.cast("decimal(27,6)")).alias("_sy"),
        F.sum((F.col("_x").cast("decimal(15,0)")
               * y.cast("decimal(15,6)")).cast(_DEC)).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx")))
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    den = nd * sxx - sx * sx
    slope = F.when(den > 0, (nd * sxy - sx * sy) / den)
    intercept = F.when(den > 0, (sy - slope * sx) / nd)
    return (agg.withColumn("slope", F.round(slope, 10))
            .withColumn("intercept", F.round(intercept, 6))
            .drop("_sx", "_sy", "_sxy", "_sxx"))


def quantile_normalize(
    df: DataFrame,
    value: str = "value",
    group: str | Sequence[str] = "source",
    tiebreak: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Quantile normalization across groups — the batch-effect
    correction classic (microarray lineage, equally at home fixing
    per-crawl-source length/score distributions): each row's value is
    replaced by the POOLED distribution's value at the same quantile
    position, so every group ends up with an identical marginal
    distribution while each group's internal ordering is preserved.

    The mapping is pure integer rank arithmetic (a selection boundary,
    so no floats are allowed anywhere near it — the
    :func:`~fs2_data_spark.operators.mixing.pps_systematic_sample`
    rule): a row at within-group rank ``r`` of ``n_g`` maps to the
    pooled rank::

        t = ceil( (2r - 1) * N / (2 * n_g) )   in [1, N]

    (the midpoint quantile ``(r - 1/2) / n_g`` scaled to the pooled
    size, computed as ``((2r-1)*N + 2*n_g - 1) div (2*n_g)``).  Range
    note: the product needs ``2 * N^2 < 2^63`` per group — beyond
    ~2 * 10^9 pooled rows, lift the expression to DECIMAL(38,0).

    Scale shape: the pooled rank table comes from
    :func:`~fs2_data_spark.operators.dedup.global_rank` (range-partition
    parallel sort — never a single-partition window); within-group
    ranks are one group-partitioned window pass; the final lookup is an
    equi-join on the target rank (both sides row-per-row, hash join).
    Ties are broken by ``tiebreak`` on both sides, so the map is
    deterministic and any SQL engine replays it exactly.

    Output: the input columns plus ``q_value`` (the pooled value at the
    mapped rank).  NULL values are excluded.
    """
    from fs2_data_spark.operators.dedup import global_rank

    group = [group] if isinstance(group, str) else list(group)
    src = df.filter(F.col(value).isNotNull())
    pooled = global_rank(
        src.select(F.col(value).alias("_pv"), F.col(tiebreak)),
        ["_pv", tiebreak], rank_col="_prnk",
        num_partitions=num_partitions).select("_prnk", "_pv")
    wg = Window.partitionBy(*group).orderBy(F.col(value), F.col(tiebreak))
    wn = Window.partitionBy(*group)
    d = (src.withColumn("_r", F.row_number().over(wg).cast("bigint"))
         .withColumn("_ng", F.count(F.lit(1)).over(wn).cast("bigint")))
    n_tot = src.select(F.count(F.lit(1)).cast("bigint").alias("_N"))
    d = d.crossJoin(F.broadcast(n_tot))
    d = d.withColumn(
        "_t", F.expr("((2 * _r - 1) * _N + 2 * _ng - 1) div (2 * _ng)"))
    return (d.join(pooled, d["_t"] == pooled["_prnk"])
            .withColumn("q_value", F.col("_pv"))
            .drop("_r", "_ng", "_N", "_t", "_prnk", "_pv"))


def weighted_median(
    df: DataFrame,
    value: str = "value",
    weight: str = "w",
    group: str | Sequence[str] = "source",
    tiebreak: str = "doc_id",
) -> DataFrame:
    """EXACT weighted (lower) median per group: the smallest value whose
    cumulative weight reaches half the group's total — the
    size-weighted center a plain median misstates whenever rows carry
    unequal mass (the median DOCUMENT length vs the median length a
    random TOKEN sits in are very different numbers; this computes the
    latter).

    A selection boundary, so the walk is pure bigint arithmetic
    (``2 * cum_w >= W`` — no floats, no libm; the
    :func:`~fs2_data_spark.operators.mixing.pps_systematic_sample`
    rule): rows sort by ``(value, tiebreak)`` within the group, the
    qualifying suffix starts where twice the inclusive cumulative
    weight first reaches the total, and its first row is the lower
    weighted median.  Rows with ``weight <= 0`` are excluded; groups
    left empty disappear.

    Scale shape: ONE group-partitioned window pass (sort + running sum
    + the unordered total share the partition), then a min-struct fold
    per group.  Output per group: ``n, total_w, w_median``.
    """
    group = [group] if isinstance(group, str) else list(group)
    w_col = F.col(weight).cast("bigint")
    wo = Window.partitionBy(*group).orderBy(F.col(value), F.col(tiebreak))
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(*group)
    d = (df.filter(F.col(value).isNotNull() & (w_col > 0))
         .withColumn("_cw", F.sum(w_col).over(wc))
         .withColumn("_tw", F.sum(w_col).over(wall))
         .withColumn("_n", F.count(F.lit(1)).over(wall)))
    qual = d.filter(F.lit(2) * F.col("_cw") >= F.col("_tw"))
    pick = (qual.groupBy(*group)
            .agg(F.max("_n").alias("n"),
                 F.max("_tw").alias("total_w"),
                 F.min(F.struct(F.col(value).alias("v"),
                                F.col(tiebreak).alias("t")))
                 .alias("_first")))
    return pick.select(*group, "n", "total_w",
                       F.col("_first.v").alias("w_median"))

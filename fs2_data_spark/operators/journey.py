"""User-journey analytics: ordered funnel conversion and cohort
retention — the product-analytics tier of the event feature stack
(sessionization answers "what happened inside one visit"; these answer
"how do keys progress across visits").

Reference heritage: fs2-data's pipelines are strictly ordered stream
transforms (``fs2/data/json/internals/TokenParser.scala`` consumes
tokens left-to-right, never revisiting emitted prefix state); the funnel
below is the same discipline lifted to event time — step *k* may only
match STRICTLY AFTER the timestamp at which step *k-1* was first
reached, so a key's journey is a monotone chain, never a bag-of-types
test.

Determinism contract (module standard, see ``operators/drift.py``):
counts and min-timestamps are exact; every emitted rate is one IEEE
divide on exact bigints rounded to a fixed number of decimals — a DuckDB
replay of the same SQL is bit-identical.

Scale notes (100 TB): the funnel is ``len(steps)`` filtered scans of the
same input, chained by per-key equi-joins (key-partitioned shuffles, no
broadcast of unbounded sides); retention is one first-seen aggregate,
one equi-join back, and one DISTINCT on a (cohort, offset, key) space
bounded by keys x horizon.  Nothing is quadratic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from fs2_data_spark.functions.timeutil import epoch_us

_DEC = "decimal(38,12)"


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    step_col: str = "event_type",
    round_dp: int = 6,
) -> DataFrame:
    """Ordered funnel over ``steps``: a key reaches step *k* at the
    EARLIEST event of type ``steps[k]`` that is strictly later than the
    time it reached step *k-1* (first-touch attribution; equal
    timestamps do NOT satisfy "after", matching the engine's strict
    as-of tie discipline).  A key that performs the types out of order
    only counts up to the longest ordered prefix — the property that
    separates a funnel from a bag-of-types intersection.

    Output, one row per step (ordered)::

        step (1-based), step_name, n_reached,
        conv_from_prev = n_k / n_{k-1},  conv_from_first = n_k / n_1

    Scale shape: step 1 is one filtered min-aggregate; each later step
    is one filtered scan equi-joined to the previous reach table on the
    key (key-partitioned hash join — the reach table is per-key, so it
    is NOT broadcast) followed by a min-aggregate.  ``len(steps)`` is a
    small constant; every shuffle is on the key.  The tagged reach
    tables are unioned and counted in ONE distributed job (no per-stage
    driver actions); the conversion-rate windows run over the
    ``len(steps)``-row result.

    Rates are IEEE divides on exact bigint counts, rounded to
    ``round_dp``; step 1's conv_from_prev is defined as 1.0.  Steps
    reached by no key keep an explicit 0-count row (a funnel with a
    silent hole is unreadable), with NULL rates past the first empty
    stage.
    """
    key = [key] if isinstance(key, str) else list(key)
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = df.select(*key, F.col(step_col).alias("_st"),
                   epoch_us(F.col(ts)).alias("_eus"))
    reach = (ev.filter(F.col("_st") == steps[0])
             .groupBy(*key).agg(F.min("_eus").alias("_t")))
    tagged = [reach.select(F.lit(1).alias("step"), *key)]
    for i, name in enumerate(steps[1:], start=2):
        reach = (ev.filter(F.col("_st") == name)
                 .join(reach.select(*key, F.col("_t").alias("_prev")),
                       on=key)
                 .filter(F.col("_eus") > F.col("_prev"))
                 .groupBy(*key).agg(F.min("_eus").alias("_t")))
        tagged.append(reach.select(F.lit(i).alias("step"), *key))
    union = tagged[0]
    for t in tagged[1:]:
        union = union.unionByName(t)
    grid = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, step_name string")
    counts = (grid.join(union.groupBy("step")
                        .agg(F.count(F.lit(1)).alias("n_reached")),
                        on="step", how="left")
              .fillna({"n_reached": 0}))
    wo = Window.partitionBy().orderBy("step")
    prev = F.lag("n_reached", 1).over(wo)
    first = F.first("n_reached").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = F.col("n_reached").cast("double")
    conv_prev = F.when(prev.isNull(), F.lit(1.0)).otherwise(
        F.when(prev > 0, F.round(n / prev.cast("double"), round_dp)))
    conv_first = F.when(first > 0,
                        F.round(n / first.cast("double"), round_dp))
    return (counts
            .withColumn("conv_from_prev", conv_prev)
            .withColumn("conv_from_first", conv_first)
            .select("step", "step_name", "n_reached",
                    "conv_from_prev", "conv_from_first"))


def cohort_retention(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    bucket_us: int = 7 * 86_400_000_000,
    round_dp: int = 6,
) -> DataFrame:
    """Cohort retention matrix: keys are cohorted by the bucket of their
    FIRST event (bucket = ``floor(epoch_us / bucket_us)``, a fixed
    epoch-aligned grid — no calendar dependence, so Spark and any SQL
    replay agree exactly); a key is "retained at offset *k*" if it has
    ANY event in its cohort bucket + *k*.  Offset 0 is the cohort itself
    (retention 1.0 by construction — kept as the standard sanity row).

    Output one row per (cohort, offset) observed::

        cohort (bigint bucket index), offset (bigint),
        n_active, n_cohort, retention = n_active / n_cohort

    Scale shape: one exact first-seen min-aggregate per key (map-side
    combined), one key-partitioned equi-join back to the events (the
    first-seen table is keyed per key: hash join, not broadcast), one
    DISTINCT over (cohort, offset, key) — bounded by keys x horizon,
    never by raw events — and one count per cell.  Cohort sizes
    re-aggregate the first-seen table and join on the cohort bucket (a
    genuinely small dimension: broadcast).
    """
    key = [key] if isinstance(key, str) else list(key)
    b = F.lit(int(bucket_us))
    ev = df.select(*key, epoch_us(F.col(ts)).alias("_eus"))
    first = (ev.groupBy(*key)
             .agg(F.floor(F.min("_eus") / b).alias("cohort")))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort"))
    cells = (ev.join(first, on=key)
             .select("cohort",
                     (F.floor(F.col("_eus") / b) - F.col("cohort"))
                     .alias("offset"), *key)
             .distinct()
             .groupBy("cohort", "offset")
             .agg(F.count(F.lit(1)).alias("n_active")))
    ret = F.round(F.col("n_active").cast("double")
                  / F.col("n_cohort").cast("double"), round_dp)
    return (cells.join(F.broadcast(sizes), on="cohort")
            .withColumn("retention", ret)
            .select("cohort", "offset", "n_active", "n_cohort",
                    "retention"))


def kaplan_meier(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    step_col: str = "event_type",
    event: str = "purchase",
    round_dp: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve of time-to-``event`` with
    right-censoring — the duration analogue of :func:`funnel_steps`
    (a funnel asks "did the key convert"; KM asks "how long until it
    does", counting keys that have not YET converted correctly instead
    of dropping them, which biases every naive mean-duration metric).

    Framing: a subject is a key; its origin is its FIRST event of any
    type; the event time is its first ``event`` row (duration may be 0
    when the first event IS the event); keys without one are censored
    at the study end (the global max timestamp — one 1-row broadcast).
    Estimator, over distinct durations ``t`` ascending::

        S(t) = prod_{t_i <= t} (1 - d_i / n_i)

    with ``d_i`` events at ``t_i`` and ``n_i`` subjects still at risk
    (duration >= t_i, censored or not).  Censor-only times keep a row
    (factor 1) so the at-risk path is visible.

    Determinism (module standard): counts/at-risk are exact bigints;
    each factor's ``ln(1 - d/n)`` is one IEEE chain on exact ints,
    rounded to 9 dp and prefix-summed in DECIMAL(38,12) (order-free);
    ``S = exp(sum)`` rounded to ``round_dp``.  When a prefix step has
    ``d == n`` (everyone at risk converts) the curve is exactly 0 from
    there on — stated as 0.0, never an ``ln(0)``.

    Scale shape: one per-key min/conditional-min aggregate (map-side
    combined), one 1-row study-end broadcast, then ALL window passes run
    over the distinct-duration table (bounded by distinct durations,
    never subjects).  Output per distinct duration: ``t_us, n_risk, d,
    c, surv``.
    """
    key = [key] if isinstance(key, str) else list(key)
    e = epoch_us(F.col(ts))
    subj = (df.groupBy(*key)
            .agg(F.min(e).alias("_o"),
                 F.min(F.when(F.col(step_col) == event, e)).alias("_e")))
    end = df.agg(F.max(e).alias("_end"))
    subj = (subj.crossJoin(F.broadcast(end))
            .select(F.when(F.col("_e").isNotNull(),
                           F.col("_e") - F.col("_o"))
                    .otherwise(F.col("_end") - F.col("_o")).alias("t_us"),
                    F.col("_e").isNotNull().cast("int").alias("_obs")))
    pts = (subj.groupBy("t_us")
           .agg(F.sum("_obs").alias("d"),
                F.sum(F.lit(1) - F.col("_obs")).alias("c")))
    # parallel running aggregates over the distinct-duration table via
    # dedup.global_cumsum (range partition + broadcast offsets) — the old
    # Window.partitionBy() passes serialized |distinct durations| rows
    # through one task, ~N for continuous durations (VERDICT r05 #5).
    # Everything cumulated is exact (bigint counts, DECIMAL(38,12) terms;
    # the running "ever d==n_risk" max of a 0/1 flag == running sum >= 1),
    # so every output value is bit-identical to the single-window plan.
    from fs2_data_spark.operators.dedup import global_cumsum

    pts = pts.withColumn("_dc", (F.col("d") + F.col("c")).cast("bigint"))
    tot = pts.agg(F.sum("_dc").alias("__tot"))
    pts = (global_cumsum(pts, ["t_us"], ["_dc"])
           .crossJoin(F.broadcast(tot)))
    n_risk = F.col("__tot") - F.col("cum__dc") + F.col("_dc")
    pts = pts.withColumn("n_risk", n_risk)
    term = F.when((F.col("d") == 0) | (F.col("d") == F.col("n_risk")),
                  F.lit(0.0)).otherwise(
        F.round(F.log(F.lit(1.0) - F.col("d").cast("double")
                      / F.col("n_risk").cast("double")), 9))
    pts = (pts.withColumn("_t", term)
           .withColumn("_td", F.col("_t").cast(_DEC))
           .withColumn("_dead",
                       (F.col("d") == F.col("n_risk")).cast("int")))
    pts = global_cumsum(pts, ["t_us"], ["_td", "_dead"])
    surv = F.when(F.col("cum__dead") >= 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("cum__td").cast("double")), round_dp))
    return (pts.withColumn("surv", surv)
            .select("t_us", "n_risk", "d", "c", "surv"))

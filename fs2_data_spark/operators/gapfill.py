"""Time-grid gap-filling: resample an irregular per-key event stream onto a
regular timestamp grid, filling each grid point by LOCF or by linear
interpolation between the surrounding observations.

This is the hypertable ``time_bucket_gapfill + locf()/interpolate()``
operation re-expressed in pure DataFrame algebra, and the batch mirror of the
reference's "emit default until a later value arrives" stream semantics
(``finite-state/shared/src/main/scala/fs2/data/esp/ESP.scala:150-167``): a
grid point between observations sees exactly the state a streaming consumer
would have seen at that instant — never a future value on the LOCF path.

Physical plan (the part that must survive 100 TB):

* per-key bounds: ONE map-side-combined min/max aggregation;
* the grid itself is generated executor-side with ``sequence()`` + explode —
  no driver-side range materialization, size proportional to output;
* observations and grid points union and share ONE hash Exchange on the key;
* the backward carry (previous value/time) and — for interpolation — the
  forward carry (next value/time) are two window passes over that single
  Exchange.  The forward carry deliberately runs as a *backward* frame over
  a DESCENDING sort: Spark evaluates ``first()/last()`` over
  ``(currentRow, unboundedFollowing)`` frames quadratically, so the linear
  formulation is two Sorts instead of one — never the quadratic frame.

Determinism: a grid point that collides exactly with an observation takes
that observation's value on both paths (side ordinal sorts observations
first; interpolation distance 0 reproduces the same value bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fs2_data_spark.functions.timeutil import epoch_us

_SIDE, _EUS = "__gf_side", "grid_us"


def time_grid_fill(
    df: DataFrame,
    on: str | list[str] = "user_id",
    ts: str = "ts",
    value: str = "value",
    step_us: int = 3_600_000_000,
    method: str = "locf",
) -> DataFrame:
    """Fill ``value`` onto a per-key grid of spacing ``step_us``.

    Grid points are aligned to multiples of ``step_us`` (exact integer
    ceil-division — no float in the boundary arithmetic) and span each
    key's own ``[min ts, max ts]``; keys are never extrapolated beyond
    their observed range.

    ``method="locf"``: last observation carried forward (zero temporal
    leakage — the PIT contract).
    ``method="interp"``: linear interpolation between the previous and
    next observation; a trailing grid point (after the last observation —
    only possible at an exact-multiple boundary) degrades to LOCF, a
    leading one is impossible by construction of the aligned range.

    Returns one row per (key, grid point): key columns, ``grid_us``
    (bigint epoch microseconds), ``filled`` (double), plus provenance
    columns ``prev_us`` / ``next_us`` (the observation timestamps that
    produced the fill; ``next_us`` is null on the LOCF path).
    """
    if method not in ("locf", "interp"):
        raise ValueError(f"unknown gapfill method: {method!r}")
    on = [on] if isinstance(on, str) else list(on)
    step = F.lit(int(step_us))

    obs = df.select(*on, epoch_us(F.col(ts)).alias(_EUS),
                    F.col(value).cast("double").alias("__v"))
    bounds = obs.groupBy(*on).agg(F.min(_EUS).alias("__mn"),
                                  F.max(_EUS).alias("__mx"))
    # exact bigint ceil-division (`div`, never `/`: long/long `/` is DOUBLE
    # division in Spark and floor(double) is inexact past 2^53)
    first_grid = F.expr(
        f"((__mn + {int(step_us)} - 1) div {int(step_us)}) * {int(step_us)}")
    # a key whose span contains no aligned point yields no grid rows —
    # Spark's sequence() raises on start > stop (DuckDB returns empty),
    # so the empty case must be filtered out, not generated
    grid = (bounds
            .withColumn("__first", first_grid)
            .filter(F.col("__first") <= F.col("__mx"))
            .withColumn(_EUS, F.explode(F.sequence(F.col("__first"),
                                                   F.col("__mx"), step)))
            .select(*on, _EUS, F.lit(None).cast("double").alias("__v")))

    u = (obs.withColumn(_SIDE, F.lit(0))
         .unionByName(grid.withColumn(_SIDE, F.lit(1))))
    w_back = (Window.partitionBy(*on).orderBy(F.col(_EUS), F.col(_SIDE))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    obs_ts = F.when(F.col("__v").isNotNull(), F.col(_EUS))
    # both carries in ONE select so they land in one WindowExec (chained
    # withColumns interpose Projects that block CollapseWindow)
    u = u.select(
        "*",
        F.last("__v", ignorenulls=True).over(w_back).alias("__pv"),
        F.last(obs_ts, ignorenulls=True).over(w_back).alias("prev_us"))
    if method == "locf":
        out = (u.filter(F.col(_SIDE) == 1)
               .select(*on, _EUS, F.col("__pv").alias("filled"),
                       "prev_us", F.lit(None).cast("bigint").alias("next_us")))
        return out
    # forward carry via a DESCENDING backward frame (linear, two Sorts on
    # the one Exchange — never a quadratic following frame)
    w_fwd = (Window.partitionBy(*on)
             .orderBy(F.col(_EUS).desc(), F.col(_SIDE).desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.select(
        "*",
        F.last("__v", ignorenulls=True).over(w_fwd).alias("__nv"),
        F.last(obs_ts, ignorenulls=True).over(w_fwd).alias("next_us"))
    span = F.col("next_us") - F.col("prev_us")
    frac = (F.col(_EUS) - F.col("prev_us")).cast("double") / span.cast("double")
    interp = (F.when(span == 0, F.col("__pv"))
              .otherwise(F.col("__pv")
                         + (F.col("__nv") - F.col("__pv")) * frac))
    filled = (F.when(F.col("next_us").isNull(), F.col("__pv"))
              .otherwise(interp))
    return (u.filter(F.col(_SIDE) == 1)
            .select(*on, _EUS, filled.alias("filled"), "prev_us", "next_us"))

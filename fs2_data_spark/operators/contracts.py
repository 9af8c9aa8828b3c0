"""Data-contract validation: declarative expectation suites evaluated
in ONE corpus scan — the ingest gate of a training-data pipeline (catch
the poisoned feed before it reaches feature materialization, with exact
violation counts for the incident report, not a boolean).

Reference heritage: fs2-data validates as it parses — malformed input
surfaces as a typed error at the exact offending element
(``json/src/main/scala/fs2/data/json/internals/TokenParser.scala``
raises ``JsonException`` with context), not as a downstream mystery.
This module lifts that stance to table contracts: every rule is checked
against every row, and violations are counted exactly.

Determinism contract: every rule reduces to exact integer counts
(violations, rows, distinct keys); the only doubles are the violation
rates, one IEEE divide each, rounded — bit-replayable in any engine.

Scale notes (100 TB): all scalar rules fold in a single
map-side-combined aggregation over one scan (adding a rule adds a
column to the aggregate, not a pass over the data); the optional
uniqueness rule rides the same scan as an exact count-distinct.  The
output is |rules| rows assembled by a plan-time unpivot — no driver
loop, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def expectation_report(
    df: DataFrame,
    rules: Sequence[tuple[str, Column | str]],
    unique_key: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Evaluate an expectation suite: ``rules`` is a list of
    ``(name, predicate)`` where the predicate is a boolean Column (or
    SQL string) that every VALID row satisfies; NULL predicate results
    count as violations (an expectation that cannot be evaluated is not
    met — the conservative reading).  ``unique_key`` adds the
    ``unique:<col>`` rule: violations = ``n - count(distinct col)``
    (the number of surplus duplicate rows, exact).

    Output one row per rule, in suite order:
    ``rule, n, n_viol, viol_rate, ok``.
    """
    if not rules and unique_key is None:
        raise ValueError("expectation suite is empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    names = []
    for i, (name, pred) in enumerate(rules):
        p = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(F.sum(F.when(p, 0).otherwise(1)).alias(f"_v{i}"))
        names.append(name)
    if unique_key is not None:
        aggs.append((F.count(F.lit(1))
                     - F.countDistinct(F.col(unique_key)))
                    .alias(f"_v{len(names)}"))
        names.append(f"unique:{unique_key}")
    one = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(name).alias("rule"),
                 F.col(f"_v{i}").cast("bigint").alias("v"))
        for i, name in enumerate(names)])
    out = (one.select(F.col("_n").cast("bigint").alias("n"),
                      F.explode(pairs).alias("_r"))
           .select(F.col("_r.i").alias("_i"), F.col("_r.rule").alias("rule"),
                   "n", F.col("_r.v").alias("n_viol")))
    rate = F.when(F.col("n") > 0,
                  F.round(F.col("n_viol").cast("double")
                          / F.col("n").cast("double"), round_dp)) \
            .otherwise(F.lit(0.0))
    return (out.withColumn("viol_rate", rate)
            .withColumn("ok", F.col("n_viol") == 0)
            .orderBy("_i").drop("_i"))

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time feature pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle (see ``fs2_data_spark/queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _tz(spark: SparkSession) -> None:
    # pin parity-relevant conf (harmless if already set by the driver)
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: as-of join (clicks <- last purchase, strict point-in-time)
    + lag/lead + rolling + sessionization feature stack on sf0.001 events."""
    _tz(spark)
    from fs2_data_spark.operators.asof import asof_join
    from fs2_data_spark.operators.sessionize import sessionize
    from fs2_data_spark.operators.windows import with_lag_lead, with_rolling

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click")
    purch = (ev.filter(F.col("event_type") == "purchase")
             .groupBy("user_id", "ts").agg(F.max("value").alias("purchase_value")))
    out = asof_join(clicks, purch, on="user_id", left_ts="ts", right_ts="ts",
                    right_cols=["purchase_value"], strategy="union")
    out = with_lag_lead(out, ["value"], key="user_id", ts=["ts", "event_id"])
    out = with_rolling(out, "value", key="user_id", ts=["ts", "event_id"], n_rows=5,
                       aggs=("sum", "avg"))
    out = sessionize(out, key="user_id", ts="ts", gap_s=1800)
    return out.select(
        "event_id", "user_id", "value", "purchase_value",
        "lag1_value", "lead1_value", "roll5_sum_value", "roll5_avg_value",
        "session_seq",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fs2_data_spark.queries import REGISTRY

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tz(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from fs2_data_spark.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}

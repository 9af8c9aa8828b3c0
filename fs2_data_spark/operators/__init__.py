from fs2_data_spark.operators.asof import asof_join, backfill_locf
from fs2_data_spark.operators.sessionize import sessionize, session_aggregate
from fs2_data_spark.operators.windows import (
    with_ewma,
    with_lag_lead,
    with_ranks,
    with_rolling,
)

__all__ = [
    "asof_join",
    "backfill_locf",
    "sessionize",
    "session_aggregate",
    "with_ewma",
    "with_lag_lead",
    "with_ranks",
    "with_rolling",
]

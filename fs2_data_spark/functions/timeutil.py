"""Timestamp helpers.

Parquet written with naive (isAdjustedToUTC=false) timestamps loads as
TIMESTAMP_NTZ in Spark 4; ``unix_micros`` only accepts TIMESTAMP, so we cast.
With ``spark.sql.session.timeZone=UTC`` the resulting epoch equals DuckDB's
``epoch_us`` on the same file — pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _as_tz(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch (bigint) from a TIMESTAMP or TIMESTAMP_NTZ."""
    return F.unix_micros(_as_tz(col))


def epoch_s(col: Column | str) -> Column:
    """Whole seconds since epoch (bigint)."""
    return (F.unix_micros(_as_tz(col)) / F.lit(1_000_000)).cast("bigint")

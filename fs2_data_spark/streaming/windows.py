"""Streaming time-window aggregations (tumbling / sliding) with watermarks.

The missing third leg of the streaming stack next to session windows
(``sessions.py``) and the stateful running features: fixed-width event-time
windows — fs2-data's chunk-level fold semantics re-expressed as Structured
Streaming's windowed groupBy (reference: the per-chunk accumulation in
``fs2/data/json/internal/TokenParser`` consumes bounded slices of the event
stream the same way a tumbling window consumes bounded slices of event
time).

Exactness contract: the ``value`` accumulator is the same int64
``floor(value * 1e6)`` trick as ``streaming_running_features`` —
associative, so the result is independent of batch boundaries and arrival
order, and a DuckDB batch GROUP BY replays it bit-for-bit (hard oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_windowed_agg(
    stream: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    width: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10000 days",
) -> DataFrame:
    """Per-key tumbling (or sliding, when ``slide`` is given) event-time
    window counts + exact int64 value sums.

    Scale shape: Spark's streaming windowed aggregation keeps one state row
    per open ``(window, key)``; the watermark bounds how long a window stays
    open, so state is O(active windows x keys), never O(events). The
    aggregation itself is the normal partial-agg hash shuffle per
    micro-batch.

    Returns ``(key, win_start_us, win_end_us, n, sum_v_us)``.
    """
    win = (F.window(F.col(ts), width, slide) if slide
           else F.window(F.col(ts), width))
    # naive-parquet timestamps arrive TIMESTAMP_NTZ; watermarks require
    # TIMESTAMP (session tz is pinned UTC so the instant is unchanged)
    stream = stream.withColumn(ts, F.col(ts).cast("timestamp"))
    return (stream
            .withWatermark(ts, watermark)
            .groupBy(win.alias("w"), F.col(key))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.floor(F.col(value) * 1_000_000).cast("bigint"))
                 .alias("sum_v_us"))
            .select(key,
                    F.unix_micros(F.col("w.start").cast("timestamp"))
                    .alias("win_start_us"),
                    F.unix_micros(F.col("w.end").cast("timestamp"))
                    .alias("win_end_us"),
                    "n", "sum_v_us"))


def streaming_candles(
    stream: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    width: str = "1 day",
    watermark: str = "10000 days",
) -> DataFrame:
    """Streaming OHLC candles: per-key tumbling event-time windows with
    open/high/low/close — the streaming twin of
    ``operators/windows.ohlc_candles`` (parity with the batch operator is
    the hard oracle).  Open and close carry the full ``(event_us, value)``
    pair through ``min``/``max`` over a struct — an associative,
    arrival-order- and batch-boundary-independent accumulator (the
    engine's streaming-state rule: every carried field a function of the
    event SET), with the (ts, value) lexicographic tie rule making
    duplicate timestamps deterministic.

    State: one row per open (window, key); the watermark bounds window
    lifetime.  The exact int64 ``floor(value*1e6)`` sum rides along for a
    decimal-free mean at read time.
    """
    stream = stream.withColumn(ts, F.col(ts).cast("timestamp"))
    eus = F.unix_micros(F.col(ts))
    pair = F.struct(eus.alias("t"), F.col(value).alias("v"))
    return (stream
            .withWatermark(ts, watermark)
            .groupBy(F.window(F.col(ts), width).alias("w"), F.col(key))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(pair).alias("__o"),
                 F.max(F.col(value)).alias("high"),
                 F.min(F.col(value)).alias("low"),
                 F.max(pair).alias("__c"),
                 F.sum(F.floor(F.col(value) * 1_000_000).cast("bigint"))
                 .alias("sum_v_us"))
            .select(key,
                    F.unix_micros(F.col("w.start").cast("timestamp"))
                    .alias("win_start_us"),
                    F.col("__o.v").alias("open"),
                    "high", "low",
                    F.col("__c.v").alias("close"),
                    "n", "sum_v_us"))

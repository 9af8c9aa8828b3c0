"""Structured Streaming operators.

fs2-data is a streaming library with *incremental emission* ("items are
emitted as soon as they are complete", reference
``cbor/shared/src/main/scala/fs2/data/cbor/low/model.scala:24-27``) but no
time axis — input order is authoritative and there are no watermarks. In
Spark the streaming analogue adds event time explicitly: watermarks bound
state like fs2-data's bounded open-tag stack bounds memory (reference
``finite-state/shared/src/main/scala/fs2/data/pfsa/TreeQueryPipe.scala:57-130``).

``streaming_session_aggregate`` — gap-based session windows via the native
``session_window`` aggregation (state-store-backed, watermark-expired).
``windowed_counts`` — tumbling/sliding event-time aggregation.

Both are micro-batch testable: drive with a file/memory source and
``processAllAvailable()`` (see tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_session_aggregate(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value: str | None = "value",
) -> DataFrame:
    """Session rollup over a *streaming* DataFrame: session bounds, event
    count and value sum per (key, session window). Late rows beyond the
    watermark are dropped; in-watermark sessions merge incrementally."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value is not None:
        aggs.append(F.sum(value).alias(f"sum_{value}"))
    # watermarks require TIMESTAMP (not NTZ); session tz is pinned UTC
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("session"), F.col(key))
        .agg(*aggs)
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            *[F.col(a) for a in (["n_events"] + ([f"sum_{value}"] if value else []))],
        )
    )


def windowed_counts(
    events: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling (or sliding) event-time counts per key."""
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(win.alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(key, F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n")
    )

"""Gap-based sessionization.

Assigns a per-key session ordinal: a new session starts when the gap to the
previous event exceeds ``gap``. Built from two window passes over the SAME
window spec (lag -> flag -> running sum), so Catalyst plans a single shuffle
+ sort. The running counter mirrors fs2-data's per-stream element counters
(reference ``json/src/main/scala/fs2/data/json/tagged/JsonTagger.scala:84-103``).

For streaming, see ``fs2_data_spark.streaming.sessions`` (session_window /
applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from fs2_data_spark.functions.timeutil import epoch_us


def sessionize(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    gap_s: int = 1800,
    out_col: str = "session_seq",
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Adds ``session_seq`` (1-based bigint ordinal of the session within the
    key's timeline). Ties (equal ts) never open a new session.

    ``order_by`` (default ``[ts]``): pass the same ordering other window
    stages in the pipeline use so Catalyst reuses one sort instead of
    inserting a second one (tie-break columns don't change session results).
    """
    key = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*key).orderBy(*(order_by or [ts]))
    gap_us = F.lit(int(gap_s) * 1_000_000)
    new_session = F.when(
        F.lag(ts).over(w).isNull()
        | ((epoch_us(F.col(ts)) - epoch_us(F.lag(ts).over(w))) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(new_session).over(run).cast("bigint"))


def session_aggregate(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    gap_s: int = 1800,
    value: str | None = "value",
) -> DataFrame:
    """Session-level rollup: bounds, event count, optional value sum."""
    key = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, key, ts, gap_s)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value is not None:
        aggs.append(F.sum(value).alias(f"sum_{value}"))
    return s.groupBy(*key, "session_seq").agg(*aggs)


def session_transitions(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    state: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix of the ``state`` column:
    count and conditional probability of each ``(from_state, to_state)``
    step over every key's time-ordered event sequence — the behavioral
    "what follows what" feature behind next-action models and
    anomalous-flow detection.

    ``p = cnt(from, to) / sum_to cnt(from, ·)`` — a single division of
    two exact bigints (IEEE-identical in any engine; no accumulation
    of floats anywhere).

    Scale shape: one Exchange + one Sort on the key for the lag, one
    map-side-combined count aggregation on the |states|^2-bounded pair
    key, and a window over the tiny count table for the row marginal.
    Sequences never cross keys: the first event of each key has no
    transition (lag is NULL there and the row is dropped).

    Output: ``from_state, to_state, cnt bigint, p double (6 dp)``.
    """
    key = [key] if isinstance(key, str) else list(key)
    wo = Window.partitionBy(*key).orderBy("_eus", F.col(tiebreak))
    prev = F.lag(state).over(wo)
    pairs = (df.withColumn("_eus", epoch_us(F.col(ts)))
             .select(prev.alias("from_state"), F.col(state).alias("to_state"))
             .filter(F.col("from_state").isNotNull()))
    counts = (pairs.groupBy("from_state", "to_state")
              .agg(F.count(F.lit(1)).alias("cnt")))
    wrow = Window.partitionBy("from_state")
    return counts.withColumn(
        "p", F.round(F.col("cnt").cast("double")
                     / F.sum("cnt").over(wrow).cast("double"), 6))


def session_cooccurrence(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    gap_s: int = 1800,
) -> DataFrame:
    """Market-basket co-occurrence of ``state`` values within gap-based
    sessions: for every unordered pair ``(a < b)`` report how many
    sessions contain BOTH, each marginal, and the lift
    ``N * n_ab / (n_a * n_b)`` (> 1 = the pair co-occurs more than
    independence predicts) — the session-scoped complement of
    :func:`session_transitions` (which is ordered and adjacent; this is
    unordered set co-membership).

    Scale shape: sessionization (one key-sorted window pass) -> DISTINCT
    (session, state) membership (count bounded by sessions x |states|)
    -> self-equi-join ON THE SESSION ID (per-session fan-out is
    ``C(|states in session|, 2)``, bounded by the state-alphabet, never
    by session length) -> one |states|^2-bounded count agg.  Marginals
    re-aggregate the membership table; the total session count is a
    1-row broadcast.  All counts exact; lift is one IEEE chain on exact
    bigints, rounded to 6 dp.

    Output: ``state_a, state_b, n_ab, n_a, n_b, n_sessions, lift``.
    """
    key = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, key=key, ts=ts, gap_s=gap_s)
    member = (s.select(*key, "session_seq", F.col(state).alias("_st"))
              .distinct())
    sess_id = [*key, "session_seq"]
    n_tot = (member.select(*sess_id).distinct()
             .agg(F.count(F.lit(1)).alias("n_sessions")))
    marg = member.groupBy("_st").agg(F.count(F.lit(1)).alias("_n"))
    a = member.select(*sess_id, F.col("_st").alias("state_a"))
    b = member.select(*sess_id, F.col("_st").alias("state_b"))
    pairs = (a.join(b, on=sess_id)
             .filter(F.col("state_a") < F.col("state_b"))
             .groupBy("state_a", "state_b")
             .agg(F.count(F.lit(1)).alias("n_ab")))
    out = (pairs
           .join(F.broadcast(marg.withColumnRenamed("_st", "state_a")
                             .withColumnRenamed("_n", "n_a")), on="state_a")
           .join(F.broadcast(marg.withColumnRenamed("_st", "state_b")
                             .withColumnRenamed("_n", "n_b")), on="state_b")
           .crossJoin(F.broadcast(n_tot)))
    lift = (F.col("n_sessions").cast("double")
            * F.col("n_ab").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")))
    return (out.withColumn("lift", F.round(lift, 6))
            .select("state_a", "state_b", "n_ab", "n_a", "n_b",
                    "n_sessions", "lift"))


def last_touch_attribution(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    value: str = "value",
    conversion: str = "purchase",
    gap_s: int = 1800,
    tiebreak: str = "event_id",
    round_dp: int = 6,
) -> DataFrame:
    """Last-touch conversion attribution inside gap-sessions: every
    ``conversion`` event's value is credited to the MOST RECENT
    strictly-prior non-conversion touch in the same session; a
    conversion with no prior touch in its session is credited to
    ``'direct'`` — the marketing-analytics staple, and the session-
    scoped inverse of :func:`session_transitions` (transitions ask
    "what follows X"; attribution asks "what preceded the outcome").

    Strictly-prior means the frame ends at ``1 PRECEDING`` over the
    deterministic ``(ts, tiebreak)`` order — a touch at the exact
    conversion timestamp does NOT get credit (the engine's as-of tie
    discipline; last-touch with self-at-t credit is target leakage in
    feature terms).

    Determinism: the touch pick is ``last(..., ignorenulls)`` over a
    totally ordered frame (engine-replayable); revenue is the exact
    DECIMAL(27,6) sum of credited values cast to double and rounded.

    Scale shape: the touch window partitions by the KEY (not the
    session) and carries ``struct(session_seq, state)`` — the session
    membership check happens after the pick, so sessionization and the
    touch lookup share ONE Exchange + ONE Sort over the events; the
    only other shuffle re-keys the |states|-bounded partial aggregates
    (map-side combined — bytes, not rows).  Output per credited
    channel: ``channel, n_conv, revenue``.
    """
    key = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, key=key, ts=ts, gap_s=gap_s,
                   order_by=[ts, tiebreak])
    w = (Window.partitionBy(*key)
         .orderBy(F.col(ts), F.col(tiebreak))
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.last(
        F.when(F.col(state) != conversion,
               F.struct(F.col("session_seq").alias("sq"),
                        F.col(state).alias("st"))),
        ignorenulls=True).over(w)
    conv = (s.withColumn("_touch", touch)
            .filter(F.col(state) == conversion))
    channel = F.when(F.col("_touch.sq") == F.col("session_seq"),
                     F.col("_touch.st")).otherwise(F.lit("direct"))
    return (conv.groupBy(channel.alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_conv"),
                 F.round(F.sum(F.col(value).cast("decimal(27,6)"))
                         .cast("double"), round_dp).alias("revenue")))


def session_trigrams(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    gap_s: int = 1800,
    tiebreak: str = "event_id",
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` ordered 3-step paths (trigrams) of ``state``
    within gap-sessions — the sequential-pattern tier above
    :func:`session_transitions` (transitions see one hop; trigrams
    catch the "view -> error -> view" retry loops and "search -> click
    -> purchase" funnels that a first-order Markov chain provably
    cannot represent).

    A trigram is three CONSECUTIVE events of one session in the
    deterministic ``(ts, tiebreak)`` order; windows partition by the
    KEY and carry ``struct(session_seq, state)`` leads, with session
    membership checked after the carry — so sessionization and both
    leads share ONE Exchange + ONE Sort (the
    :func:`last_touch_attribution` discipline).

    The final pick is ``ORDER BY (cnt desc, s1, s2, s3) LIMIT k`` —
    fully tie-deterministic, and Spark plans it as
    ``TakeOrderedAndProject`` (a per-partition heap + driver merge of
    k-row heads), never a global sort of the |states|^3-bounded count
    table.  Output: ``s1, s2, s3, cnt``.
    """
    key = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, key=key, ts=ts, gap_s=gap_s,
                   order_by=[ts, tiebreak])
    w = Window.partitionBy(*key).orderBy(F.col(ts), F.col(tiebreak))
    nxt = F.lead(F.struct(F.col("session_seq").alias("sq"),
                          F.col(state).alias("st")), 1).over(w)
    nx2 = F.lead(F.struct(F.col("session_seq").alias("sq"),
                          F.col(state).alias("st")), 2).over(w)
    tri = (s.withColumn("_n1", nxt).withColumn("_n2", nx2)
           .filter(F.col("_n1.sq") == F.col("session_seq"))
           .filter(F.col("_n2.sq") == F.col("session_seq"))
           .select(F.col(state).alias("s1"),
                   F.col("_n1.st").alias("s2"),
                   F.col("_n2.st").alias("s3")))
    return (tri.groupBy("s1", "s2", "s3")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "s1", "s2", "s3")
            .limit(int(top_k)))

"""Point-in-time (as-of) join and LOCF backfill.

Semantics contract (BASELINE.json north_rule): for each left row
``(key, t)`` attach the payload of the latest right row ``(key, t')`` with
``t' <= t`` (``allow_exact=True``) or ``t' < t`` (strict) — zero temporal
leakage: no right row with ``t' > t`` may influence the output. A left key
with no qualifying right row gets nulls, mirroring fs2-data's
``Rhs.Default`` / jq missing-field -> null semantics (reference
``finite-state/shared/src/main/scala/fs2/data/esp/ESP.scala:89-95,154-157``,
``json/src/main/scala/fs2/data/json/jq/internal/ESPJqCompiler.scala:316-320``).

Two physical strategies:

``strategy="union"`` (default, recommended at scale)
    Pure DataFrame: tag both sides, union, and run one
    ``last(payload, ignorenulls=True)`` window over ``(key)`` ordered by
    ``(ts, side)``. Exactly ONE shuffle (hash on the key), no join node, no
    Python — the whole operator stays in Tungsten. At 100 TB this is a single
    exchange + per-partition sort; AQE handles stragglers. Tie-breaking is
    encoded in the ``side`` ordinal: with ``allow_exact`` right rows sort
    before left rows at equal ts (visible), strict mode sorts them after
    (invisible).

``strategy="pandas"``
    Cogrouped ``applyInPandas`` running ``pandas.merge_asof`` per key group —
    Arrow-vectorized, useful when the right payload is very wide (windows over
    many columns get expensive) or when per-group imperative logic is needed.

Both strategies produce identical results (pinned by tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TS, _SIDE, _L, _R, _MTS = "__asof_ts", "__asof_side", "__asof_l", "__asof_r", "__asof_mts"


def _right_payload_cols(left: DataFrame, right: DataFrame, on, right_ts: str,
                        right_cols: list[str] | None) -> list[str]:
    keys = set(on) | {right_ts}
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    return right_cols


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] = "doc_id",
    left_ts: str = "event_time",
    right_ts: str = "obs_time",
    right_cols: list[str] | None = None,
    allow_exact: bool = True,
    tolerance_us: int | None = None,
    suffix: str = "",
    strategy: str = "union",
    dedup_right: bool = True,
) -> DataFrame:
    """Backward (point-in-time) as-of join; returns left columns + right
    payload columns (null when no right row qualifies).

    ``tolerance_us``: max allowed ``t - t'`` in microseconds (older matches
    are nulled out, like ``pandas.merge_asof(tolerance=...)``).
    ``dedup_right``: when several right rows share ``(key, ts)``, keep the
    lexicographically greatest payload — a *deterministic* choice (plain
    ``last()`` over an underspecified sort order is not).
    """
    on = [on] if isinstance(on, str) else list(on)
    right_cols = _right_payload_cols(left, right, on, right_ts, right_cols)
    if strategy == "union":
        return _asof_union(left, right, on, left_ts, right_ts, right_cols,
                           allow_exact, tolerance_us, suffix, dedup_right)
    if strategy == "pandas":
        return _asof_pandas(left, right, on, left_ts, right_ts, right_cols,
                            allow_exact, tolerance_us, suffix, dedup_right)
    raise ValueError(f"unknown asof strategy: {strategy!r}")


def _asof_union(left, right, on, left_ts, right_ts, right_cols,
                allow_exact, tolerance_us, suffix, dedup_right):
    r = right.select(*on, F.col(right_ts).alias(_TS),
                     F.struct(*right_cols).alias(_R))
    if dedup_right:
        # deterministic winner among (key, ts) duplicates: max struct
        r = r.groupBy(*on, _TS).agg(F.max(_R).alias(_R))
    # side ordinal: smaller sorts first => visible to later rows at equal ts
    l_side, r_side = (1, 0) if allow_exact else (0, 1)
    l = left.select(
        *on, F.col(left_ts).alias(_TS), F.lit(l_side).alias(_SIDE),
        F.struct(*[c for c in left.columns]).alias(_L),
        F.lit(None).cast(r.schema[_R].dataType).alias(_R),
    )
    r = r.select(*on, _TS, F.lit(r_side).alias(_SIDE),
                 F.lit(None).cast(l.schema[_L].dataType).alias(_L), _R)
    u = l.unionByName(r)
    w = (Window.partitionBy(*on).orderBy(F.col(_TS), F.col(_SIDE))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last(_R, ignorenulls=True).over(w)
    if tolerance_us is None:
        # no second window aggregate on the default path (the matched-ts
        # carry measurably slows the plan; only tolerance needs it)
        out = u.withColumn(_R, matched)
    else:
        # timestamp of the matched right row, carried by the same window spec
        # (must be computed from the raw union, where _R is null on left rows)
        mts = F.last(F.when(F.col(_R).isNotNull(), F.col(_TS)),
                     ignorenulls=True).over(w)
        out = u.withColumn(_MTS, mts).withColumn(_R, matched)
        out = out.withColumn(
            _R,
            F.when(
                F.unix_micros(F.col(_TS).cast("timestamp"))
                - F.unix_micros(F.col(_MTS).cast("timestamp")) <= F.lit(tolerance_us),
                F.col(_R),
            ),
        )
    out = out.filter(F.col(_L).isNotNull())
    return out.select(
        F.col(_L + ".*"),
        *[F.col(f"{_R}.{c}").alias(c + suffix) for c in right_cols],
    )


def _asof_pandas(left, right, on, left_ts, right_ts, right_cols,
                 allow_exact, tolerance_us, suffix, dedup_right=True):
    import pandas as pd  # noqa: PLC0415 — executor-side import

    out_fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
    rschema = {f.name: f for f in right.schema.fields}
    out_fields += [f"`{c}{suffix}` {rschema[c].dataType.simpleString()}" for c in right_cols]
    out_schema = ", ".join(out_fields)
    # cogrouped applyInPandas silently drops right-side columns whose names
    # collide with the left side — rename to reserved names first
    right = right.select(
        *on, F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{i}") for i, c in enumerate(right_cols)],
    )
    internal = [f"__r_{i}" for i in range(len(right_cols))]
    out_names = [c + suffix for c in right_cols]
    lcols, ltsc, rtsc = list(left.columns), left_ts, "__r_ts"
    tol = pd.Timedelta(microseconds=tolerance_us) if tolerance_us is not None else None

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=lcols + out_names)
        lpdf = lpdf.sort_values(ltsc, kind="mergesort")
        if len(rpdf.columns) == 0 or len(rpdf) == 0:
            # key absent on the right: cogroup hands over an empty (even
            # column-less) frame -> null payload for every left row
            out = lpdf[lcols].copy()
            for c in out_names:
                out[c] = None
            return out
        rp = rpdf[[rtsc, *internal]]
        if dedup_right and internal and rp[rtsc].duplicated().any():
            # same deterministic winner as the union strategy's max-struct:
            # lexicographically greatest payload per duplicate ts, null/NaN
            # smallest (Spark struct ordering, which the old Python-key path
            # also used). Vectorized (VERDICT r03 #9): stable-sort by
            # (ts, payload...) with na_position='first', then keep the last
            # row per ts. Array-typed cells can't feed sort_values directly,
            # so only those columns are mapped to tuples (Python compare
            # inside the sort); scalar columns sort fully vectorized.
            import numpy as np  # noqa: PLC0415

            keyed = rp.copy()
            sk_cols = []
            for i, c in enumerate(internal):
                s = rp[c]
                if s.dtype == object:
                    nn = s.dropna()
                    if len(nn) and isinstance(nn.iloc[0], (list, tuple, np.ndarray)):
                        s = s.map(lambda v: np.nan
                                  if v is None or (isinstance(v, float) and pd.isna(v))
                                  else tuple(v))
                sk = f"__sk_{i}"
                keyed[sk] = s
                sk_cols.append(sk)
            keyed = keyed.sort_values([rtsc, *sk_cols], kind="mergesort",
                                      na_position="first")
            rp = keyed.drop_duplicates(rtsc, keep="last")[[rtsc, *internal]]
        else:
            rp = rp.sort_values(rtsc, kind="mergesort")
        merged = pd.merge_asof(
            lpdf, rp, left_on=ltsc, right_on=rtsc,
            direction="backward", allow_exact_matches=allow_exact, tolerance=tol,
        )
        merged = merged[lcols + internal]
        merged.columns = lcols + out_names
        # no-match rows: merge_asof fills scalar NaN even into array-typed
        # columns — normalize to None so Arrow conversion accepts them
        for c in out_names:
            merged[c] = merged[c].map(
                lambda v: None if (v is None or (isinstance(v, float) and pd.isna(v))) else v
            )
        return merged

    return left.groupBy(*on).cogroup(right.groupBy(*on)).applyInPandas(kernel, out_schema)


def backfill_locf(
    df: DataFrame,
    cols: list[str],
    key: str | list[str] = "doc_id",
    ts: str | list[str] = "event_time",
    suffix: str = "_ff",
) -> DataFrame:
    """Last-observation-carried-forward over an ordered per-key timeline.

    The direct Spark transliteration of ``Rhs.Default`` ("emit default unless
    a later value arrives", reference ``esp/ESP.scala:150-167``): each null is
    replaced by the latest preceding non-null of the same key.
    """
    key = [key] if isinstance(key, str) else list(key)
    ts = [ts] if isinstance(ts, str) else list(ts)
    w = (Window.partitionBy(*key).orderBy(*ts)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df
    for c in cols:
        out = out.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return out

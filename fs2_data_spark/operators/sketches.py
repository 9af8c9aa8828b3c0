"""Mergeable sketches for corpus cardinality and frequency at 100 TB scale.

Two classic streaming sketches, built so that (a) every bit is a
deterministic function of the data — no RNG, no float accumulation order —
and (b) the whole construction replays verbatim in ANSI SQL, so the DuckDB
oracle checks the sketch itself, not just a property of it:

- **KMV (k-minimum-values) distinct-count sketch** [Bar-Yossef et al. 2002,
  Beyer et al. 2007]: keep the ``k`` smallest distinct hash values of a set;
  the k-th smallest ``h_k`` estimates the cardinality as ``(k-1) * M / h_k``
  where ``M`` is the hash domain size.  Mergeable: the k smallest of a union
  are a subset of the union of each side's k smallest, so
  ``sketch(A ∪ B) = take_k(sketch(A) ∪ sketch(B))`` — the monoid law that
  lets a 100 TB pipeline maintain per-source distinct-shingle counts by
  folding in each ingest snapshot (same maintenance shape as
  ``operators/quality.py merge_vocabs``, but constant-size state instead of
  vocabulary-size).

- **Count-min sketch** [Cormode & Muthukrishnan 2005]: ``d`` hash rows of
  ``w`` counters; each occurrence increments one counter per row; a point
  query reads the minimum of its ``d`` counters, which never underestimates
  the true count.  Mergeable by elementwise addition — sketches of disjoint
  corpus shards sum to the sketch of the whole corpus.

Determinism across engines: hashes are the engine-portable polynomial
``functions/text.py word_hash`` (exact bigint arithmetic) composed with
affine-mod mixing in ``bigint``; counters are exact ``COUNT(*)``s; the only
float in either sketch is the final KMV estimate — one bigint product
(pre-computed exactly in Python) cast to double and one IEEE division,
identical in any engine (the same single-division discipline as
``operators/quality.py``).

Scale shape:

- KMV: one shuffle to distinct the (group, hash) pairs (map-side partial
  aggregation caps the shuffle at the distinct-count, not the corpus size),
  then a per-group top-k — Spark's ``WindowGroupLimit`` pushes the
  ``row_number <= k`` limit below the final sort so each map task emits at
  most ``k`` rows per group.
- CMS: one explode of ``d`` (row, bucket) entries per token occurrence,
  aggregated with map-side combine so the shuffle carries at most ``d * w``
  rows per task regardless of corpus size; the finished sketch is ``d * w``
  rows total and broadcasts for point queries.

Reference parity: fs2-data has no sketch module; these extend the
training-pipeline tier (SURVEY §2 "beyond the reference" mandate) alongside
dedup/mixing/packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from fs2_data_spark.functions.text import HASH_PRIME

# KMV hash domain.  Raw shingle hashes ((h1 * P0 + h2) * P0 + h3, P0 =
# 1_000_003) are mixed-radix over the corpus vocabulary — NOT uniform (a
# small vocabulary pins the top radix digit to a handful of values, which
# collapses the k-th-minimum statistic; measured: 100x overestimate on the
# test corpus).  KMV therefore re-mixes every element through an affine map
# modulo a prime near 10^12, split into two overflow-safe rounds (each
# multiplier < 9.2e6 keeps (P-1)*A inside int64 in BOTH Spark and DuckDB,
# whose bigint overflow raises rather than wraps); the composition is an
# affine map with effective multiplier A1*A2 mod P ~ 6.7e13 mod P, which
# scatters clustered inputs across the full domain.  The estimate's
# numerator (k-1) * P is computed exactly as a Python int and converted to
# double ONCE, so both engines see the identical IEEE value.
KMV_P = 999_999_999_989  # largest prime below 10^12
_KA1, _KB1 = 7_368_787, 104_729
_KA2, _KB2 = 9_123_407, 60_013


def kmv_hash(s: Column) -> Column:
    """Engine-portable re-mix of a bigint element key onto ``[0, KMV_P)``."""
    r = F.pmod(s.cast("bigint"), F.lit(KMV_P))
    r = F.pmod(r * _KA1 + _KB1, F.lit(KMV_P))
    return F.pmod(r * _KA2 + _KB2, F.lit(KMV_P))


def kmv_hash_sql(s_expr: str) -> str:
    """The identical re-mix as an ANSI-SQL expression (for oracles)."""
    return (f"((({s_expr}) % {KMV_P} * {_KA1} + {_KB1}) % {KMV_P} "
            f"* {_KA2} + {_KB2}) % {KMV_P}")

# Fixed affine mixers for the CMS rows (any pairwise-independent family;
# constants reused from the MinHash permutation table in functions/text.py).
CMS_ROW_PARAMS = [(1_103_515_245 + 2 * r + 1, 12_345 + 7_919 * r)
                  for r in range(8)]


def cms_bucket(h: Column, row: int, width: int) -> Column:
    """Bucket of hash ``h`` in CMS row ``row``: ``((h*A + B) % P) % w``."""
    a, b = CMS_ROW_PARAMS[row]
    return F.pmod(F.pmod(h * a + b, F.lit(HASH_PRIME)), F.lit(width))


def cms_bucket_sql(h_expr: str, row: int, width: int) -> str:
    """The identical bucket as an ANSI-SQL expression (for oracles)."""
    a, b = CMS_ROW_PARAMS[row]
    return f"((({h_expr}) * {a} + {b}) % {HASH_PRIME}) % {width}"


# ---------------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------------

def kmv_sketch(
    elems: DataFrame,
    group_col: str = "source",
    hash_col: str = "h",
    k: int = 16,
) -> DataFrame:
    """Per-group KMV sketch state: the sorted array of the ``k`` smallest
    DISTINCT hash values.

    ``elems`` is a (group, hash) element stream (duplicates allowed).  The
    distinct step is one shuffle with map-side partial aggregation; the
    top-k is a ``row_number`` window that Spark's WindowGroupLimit rewrites
    into per-partition limits, so the window sort never sees more than
    ``k`` rows per group per task.
    """
    dist = elems.select(group_col, hash_col).distinct()
    w = Window.partitionBy(group_col).orderBy(hash_col)
    return (dist
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy(group_col)
            .agg(F.sort_array(F.collect_list(hash_col)).alias("kmv")))


def kmv_merge(a: DataFrame, b: DataFrame, group_col: str = "source",
              k: int = 16) -> DataFrame:
    """Monoid merge: union both sides' kept values, re-take the k smallest.

    ``take_k(kmv(A) ∪ kmv(B)) = kmv(A ∪ B)`` exactly — the law the sketch
    tests pin.  Runs entirely in array expressions after a full outer join
    on the group key (sketch-sized inputs, so the join is trivially
    broadcastable in practice).
    """
    empty = F.expr("CAST(array() AS ARRAY<BIGINT>)")
    merged = (a.withColumnRenamed("kmv", "_ka")
               .join(b.withColumnRenamed("kmv", "_kb"), group_col, "full")
               .select(
                   group_col,
                   F.slice(
                       F.array_sort(F.array_distinct(F.concat(
                           F.coalesce(F.col("_ka"), empty),
                           F.coalesce(F.col("_kb"), empty)))),
                       1, k).alias("kmv")))
    return merged


def kmv_estimate(sketch: DataFrame, k: int = 16,
                 domain: int = KMV_P) -> DataFrame:
    """Cardinality estimate from a KMV sketch.

    If the group holds fewer than ``k`` distinct values the sketch IS the
    value set and the count is exact; otherwise ``(k-1) * M / h_k``.  The
    numerator is computed exactly in Python and becomes one double literal;
    the division is a single IEEE op — identical in any engine.
    """
    n_kept = F.size("kmv")
    # try_element_at: null (not an ANSI error) when the group held < k values
    kth = F.try_element_at("kmv", F.lit(k))
    est = (F.when(n_kept < k, n_kept.cast("double"))
            .otherwise(F.lit(float((k - 1) * domain)) / kth.cast("double")))
    return sketch.select(
        *[c for c in sketch.columns if c != "kmv"],
        n_kept.cast("integer").alias("n_kept"),
        F.when(n_kept >= k, kth).alias("kth_hash"),
        F.round(est, 4).alias("est_distinct"))


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def cms_sketch(
    elems: DataFrame,
    hash_col: str = "h",
    depth: int = 3,
    width: int = 32,
) -> DataFrame:
    """Count-min sketch of an element stream: rows ``(row, bucket, cnt)``.

    One explode of ``depth`` (row, bucket) entries per occurrence; the
    aggregation combines map-side, so the shuffle carries at most
    ``depth * width`` rows per task and the result is ``<= depth * width``
    rows total (absent buckets are implicit zeros).
    """
    h = F.col(hash_col)
    entries = F.array(*[
        F.struct(F.lit(r).cast("integer").alias("row"),
                 cms_bucket(h, r, width).alias("bucket"))
        for r in range(depth)])
    return (elems
            .select(F.explode(entries).alias("e"))
            .groupBy(F.col("e.row").alias("row"),
                     F.col("e.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Monoid merge: elementwise counter addition over (row, bucket)."""
    return (a.unionByName(b)
             .groupBy("row", "bucket")
             .agg(F.sum("cnt").alias("cnt")))


def cms_point_query(
    sketch: DataFrame,
    queries: DataFrame,
    hash_col: str = "h",
    depth: int = 3,
    width: int = 32,
) -> DataFrame:
    """Point-frequency estimates: for each query row, the min of its
    ``depth`` counters.  Never underestimates (every counter the element
    touched holds its count plus any colliding mass).

    The sketch is tiny (``<= depth * width`` rows) and is explicitly
    broadcast, so the lookup is a map-side join — the query side never
    shuffles.
    """
    h = F.col(hash_col)
    entries = F.array(*[
        F.struct(F.lit(r).cast("integer").alias("row"),
                 cms_bucket(h, r, width).alias("bucket"))
        for r in range(depth)])
    probes = queries.select("*", F.explode(entries).alias("e"))
    keyed = probes.select(
        *queries.columns,
        F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
    return (keyed
            .join(F.broadcast(sketch), ["row", "bucket"])
            .groupBy(*queries.columns)
            .agg(F.min("cnt").alias("cms_est")))

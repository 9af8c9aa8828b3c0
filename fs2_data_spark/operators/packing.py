"""Sequence packing: assign token sequences to fixed-capacity training bins.

LLM training consumes fixed-length contexts; feeding one short document per
context wastes compute, so pipelines *pack* consecutive sequences into bins
of at most ``max_tokens`` (GPT-style document packing).  This operator
implements deterministic greedy contiguous packing: within each group
(``source`` by default — packing across sources is usually undesirable),
documents are taken in a deterministic order (``doc_id``) and appended to
the current bin until the next one would overflow, which closes the bin.
A sequence longer than ``max_tokens`` gets its own (overflowing) bin —
callers truncate downstream; the packer never splits.

Scale shape: packing is inherently sequential *within* a group, so the
kernel is a per-group ``applyInPandas`` — one hash shuffle on the group
key, then a vectorized numpy scan per group.  Groups are the parallelism
unit: at 100 TB you pack within (source, shard) where shard =
``pmod(hash(doc_id), n_shards)`` to bound group size (the ``shard_by``
option) — bin quality loss is negligible (a few partially-filled bins per
shard) and the shuffle stays one pass.

The greedy scan is order-deterministic, so an ANSI-SQL recursive CTE can
replay it row by row — the registry query carries a hard DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pack_scan(lengths, cap: int):
    """Greedy contiguous packing scan: lengths (int array, in order) ->
    (bin_index array, fill-after-placement array).  numpy-vectorized
    outer loop over *bin closures* (not rows): each step places the longest
    possible prefix via searchsorted on the running cumsum — O(bins log n)
    instead of O(n) Python-level iterations."""
    import numpy as np  # noqa: PLC0415

    n = len(lengths)
    lengths = np.asarray(lengths, dtype=np.int64)
    bins = np.empty(n, dtype=np.int64)
    fills = np.empty(n, dtype=np.int64)
    csum = np.concatenate([[0], np.cumsum(lengths)])
    i = 0
    b = 0
    while i < n:
        # longest j >= i with csum[j+1] - csum[i] <= cap
        j = int(np.searchsorted(csum, csum[i] + cap, side="right")) - 1
        if j <= i:
            j = i + 1          # oversized sequence: own overflowing bin
        bins[i:j] = b
        fills[i:j] = csum[i + 1 : j + 1] - csum[i]
        b += 1
        i = j
    return bins, fills


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    len_col: str = "n_tok",
    id_col: str = "doc_id",
    group_col: str | None = "source",
    shard_by: int | None = None,
) -> DataFrame:
    """Adds ``bin_id`` (dense per group, 0-based), ``bin_fill`` (running
    token count inside the bin after this row) and ``bin_key`` (globally
    unique ``group#bin``) to ``df`` — deterministic greedy contiguous
    packing in ``id_col`` order within each group.

    ``shard_by=n`` adds a hash shard to the group key to bound group size
    (the 100 TB setting); ``None`` packs each group whole.
    """
    import pandas as pd  # noqa: PLC0415

    out_fields = [f"`{f.name}` {f.dataType.simpleString()}"
                  for f in df.schema.fields]
    schema = ", ".join(out_fields + ["bin_id bigint", "bin_fill bigint",
                                     "bin_key string"])
    work = df
    keys = []
    if group_col is not None:
        keys.append(group_col)
    if shard_by is not None:
        work = work.withColumn(
            "__shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shard_by)))
        keys.append("__shard")
        schema = ", ".join(
            out_fields + ["`__shard` bigint", "bin_id bigint",
                          "bin_fill bigint", "bin_key string"])
    if not keys:
        work = work.withColumn("__g", F.lit(0))
        keys = ["__g"]
        schema = ", ".join(
            out_fields + ["`__g` int", "bin_id bigint", "bin_fill bigint",
                          "bin_key string"])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, fills = _pack_scan(pdf[len_col].to_numpy(), max_tokens)
        gkey = "#".join(str(pdf[k].iloc[0]) for k in keys) if len(pdf) else ""
        return pdf.assign(
            bin_id=bins, bin_fill=fills,
            bin_key=[f"{gkey}#{b}" for b in bins])

    out = work.groupBy(*keys).applyInPandas(kernel, schema)
    return out.drop("__shard", "__g")


def length_buckets(df: DataFrame, len_col: str = "n_tok") -> DataFrame:
    """Power-of-two sequence-length bucketing with padding-waste accounting
    — the batch-efficiency audit that motivates packing: group sequences
    into buckets ``[2^(k-1)+1 .. 2^k]``, pad each to its bucket length, and
    compare the waste against the naive pad-to-global-max baseline.

    The bucket boundary is computed in EXACT integer arithmetic —
    ``1 << bitlength(len - 1)`` (smallest power of two >= len; len <= 1
    maps to bucket 1) — never ``2^ceil(log2 n)``, whose float rounding can
    misbucket exact powers of two. Note the top bucket's pow2 length may
    exceed the global max, so for sequences clustered just above a power
    of two, pow2 shapes can waste MORE than pad-to-max — that honest
    trade (fixed kernel shapes vs padding) is exactly what this audit
    surfaces (accounting identity pinned by test). Waste sums are exact int64; only the
    final fill fractions are derived doubles (one IEEE division each,
    engine-portable).

    Scale shape: one partial-aggregated hash shuffle on the bucket id
    (~60 buckets exist for any realistic corpus) plus a broadcast of the
    1-row global max — the corpus is scanned once and never re-shuffled.
    Returns one row per occupied bucket: ``(bucket_len, n_seqs, sum_tok,
    waste_bucket, waste_padmax, fill_frac_bucket, fill_frac_padmax)``.
    """
    n = F.col(len_col).cast("bigint")
    bucket = (F.when(n <= 1, F.lit(1).cast("bigint"))
              .otherwise(F.expr(
                  f"shiftleft(CAST(1 AS BIGINT), "
                  f"CAST(length(bin({len_col} - 1)) AS INT))")))
    per = (df.select(n.alias("_n"), bucket.alias("bucket_len"))
           .groupBy("bucket_len")
           .agg(F.count(F.lit(1)).alias("n_seqs"),
                F.sum("_n").alias("sum_tok")))
    gmax = df.agg(F.max(n).alias("_gmax"))
    out = (per.crossJoin(F.broadcast(gmax))
           .select(
               "bucket_len", "n_seqs", "sum_tok",
               (F.col("bucket_len") * F.col("n_seqs") - F.col("sum_tok"))
               .alias("waste_bucket"),
               (F.col("_gmax") * F.col("n_seqs") - F.col("sum_tok"))
               .alias("waste_padmax"),
               (F.col("sum_tok").cast("double")
                / (F.col("bucket_len") * F.col("n_seqs")).cast("double"))
               .alias("fill_frac_bucket"),
               (F.col("sum_tok").cast("double")
                / (F.col("_gmax") * F.col("n_seqs")).cast("double"))
               .alias("fill_frac_padmax")))
    return out

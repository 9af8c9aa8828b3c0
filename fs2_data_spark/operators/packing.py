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

"""Context-window chunking: split token sequences into fixed-size training
windows with optional overlap and BOS/EOS framing.

The inverse of sequence packing (``operators/packing.py``): packing joins
short documents into full windows, chunking splits long documents into
them.  A training pipeline runs both — chunk everything longer than the
context length, pack the remainder.  Semantics follow the common
tokenizer-pipeline convention (stride windows): chunk ``j`` covers tokens
``[j*stride, j*stride + window)``; with ``stride < window`` consecutive
chunks overlap by ``window - stride`` tokens (the standard trick that gives
every token at least ``window - stride`` tokens of left context in some
chunk); the final partial chunk is kept iff it has at least ``min_len``
tokens (or dropped wholesale with ``drop_last``).

Scale shape: one ``transform(sequence(...))`` + ``posexplode`` — a pure
per-row projection that rides the scan, zero Exchange, zero Python, output
rows ≈ ``ceil(n/stride)`` per document.  The per-chunk arrays reference
the same input row, so there is no quadratic blowup beyond the chosen
overlap factor ``window/stride``.

jq-style slice semantics (0-based, end-exclusive, clamped) shared with
``functions/tokens.py tok_slice`` — reference
``json/src/main/scala/fs2/data/json/jq/ast.scala:51``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def chunk_starts(tokens: Column | str, stride: int) -> Column:
    """Start offsets ``[0, stride, 2*stride, ...)`` below the sequence
    length; empty for an empty sequence (guarded: ``sequence(0, -1)`` would
    count *down* in Spark)."""
    t = _c(tokens)
    return F.when(
        F.size(t) > 0,
        F.sequence(F.lit(0), F.size(t) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))


def chunk_tokens(
    df: DataFrame,
    tokens: str = "tokens",
    window: int = 512,
    stride: int | None = None,
    min_len: int = 1,
    drop_last: bool = False,
    bos: int | None = None,
    eos: int | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """One row per context window: ``keep`` columns + ``chunk_no`` (0-based,
    document order) + ``chunk`` (``array<int>``) + ``n_chunk`` (the emitted
    length, BOS/EOS framing included — the actual training sequence length).

    ``stride`` defaults to ``window`` (disjoint cover).  ``drop_last`` drops
    any window shorter than ``window`` (exact-size chunks only — the
    pretraining convention); otherwise windows shorter than ``min_len`` are
    dropped (``min_len=1`` keeps every non-empty remainder).  ``bos``/``eos``
    ids are framed onto each emitted chunk *after* the length rule, so the
    window arithmetic is over content tokens only.
    """
    if stride is None:
        stride = window
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    keep = keep if keep is not None else [c for c in df.columns if c != tokens]
    t = _c(tokens)
    starts = chunk_starts(t, stride)
    chunks = F.transform(
        starts, lambda s: F.slice(t, s + 1, F.lit(window)))
    out = df.select(*keep, F.posexplode(chunks).alias("chunk_no", "chunk"))
    # length rule applies to CONTENT tokens (pre-framing)
    out = out.filter(
        F.size(F.col("chunk")) >= (window if drop_last else min_len))
    chunk = F.col("chunk")
    if bos is not None:
        chunk = F.concat(F.array(F.lit(bos).cast("int")), chunk)
    if eos is not None:
        chunk = F.concat(chunk, F.array(F.lit(eos).cast("int")))
    return out.select(
        *keep, "chunk_no", chunk.alias("chunk"),
        F.size(chunk).alias("n_chunk"))


def chunk_tokens_sql(
    table_expr: str,
    tokens_expr: str,
    window: int,
    stride: int | None = None,
    min_len: int = 1,
    drop_last: bool = False,
    bos: int | None = None,
    eos: int | None = None,
    keep: str = "doc_id",
) -> str:
    """ANSI-SQL (DuckDB) mirror of :func:`chunk_tokens` — 1-based inclusive
    list slicing, ``range`` starts, identical length rule and framing."""
    if stride is None:
        stride = window
    body = f"t[u.s + 1 : u.s + {window}]"
    framed = body
    if bos is not None:
        framed = f"list_prepend({bos}, {framed})"
    if eos is not None:
        framed = f"list_append({framed}, {eos})"
    min_keep = window if drop_last else min_len
    return f"""
WITH src AS (SELECT {keep}, {tokens_expr} AS t FROM {table_expr})
SELECT {keep},
       CAST(u.s // {stride} AS INTEGER) AS chunk_no,
       array_to_string({framed}, ',') AS chunk_str,
       CAST(len({framed}) AS INTEGER) AS n_chunk
FROM src, unnest(range(0, len(t), {stride})) AS u(s)
WHERE len({body}) >= {min_keep}
"""

"""Token-sequence restructuring for LLM training examples: completion
loss-masking and FIM (fill-in-the-middle) reordering.

Both are pure per-row array projections — zero shuffle, zero Python — the
same plan class as ``operators/chunking.py`` (these transforms ride the
scan; at 100 TB they cost exactly one pass over the token pages and
nothing else). Determinism: FIM split points come from the engine's
arithmetic-hash family (exact bigint, no RNG), so every engine replays
identical examples — reshuffling, retrying, or re-running the pipeline
can never produce a different training set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MIX1, _MIX2 = 2_654_435_761, 40_503
_P = 1_000_003


def loss_mask(
    df: DataFrame,
    tokens: str = "tokens",
    delim: int = 10_030,
    mask_col: str = "mask",
) -> DataFrame:
    """Completion loss-mask for instruction tuning: positions up to and
    INCLUDING the first ``delim`` token get mask 0 (prompt — no loss),
    later positions get 1 (completion — train).  A sequence without the
    delimiter is all-0 (nothing to train on: an unpaired document must
    not silently become a completion), the conservative default of
    SFT data loaders.

    Adds ``{mask_col}`` (``array<int>`` aligned with ``tokens``) and
    ``n_train`` (bigint count of trainable positions).
    """
    t = F.col(tokens)
    pos = F.array_position(t, delim)  # 1-based; 0 when absent
    m = F.transform(
        t, lambda x, i: F.when((pos > 0) & (i + 1 > pos), 1)
        .otherwise(0).cast("int"))
    out = df.withColumn(mask_col, m)
    return out.withColumn(
        "n_train",
        F.size(F.filter(F.col(mask_col), lambda v: v == 1)).cast("bigint"))


def _cut(id_col: Column, salt: int, n_minus_1: Column) -> Column:
    """Deterministic cut point in [1, n-1]: arithmetic hash of (id, salt)
    reduced mod (n-1) — exact bigint, replays in any engine."""
    h = F.pmod(F.pmod(id_col * _MIX1 + salt, F.lit(_P)) * _MIX2 + 17,
               F.lit(999_983))
    return (F.pmod(h, n_minus_1) + 1).cast("int")


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens: str = "tokens",
    pre_tok: int = 50281,
    suf_tok: int = 50282,
    mid_tok: int = 50283,
    min_len: int = 4,
) -> DataFrame:
    """Fill-in-the-middle restructuring (Bavarian et al. 2022, PSM form):
    split ``tokens`` at two deterministic points into
    (prefix, middle, suffix) and emit
    ``[PRE] prefix [SUF] suffix [MID] middle`` — the model learns to
    infill with bidirectional context while training stays left-to-right.

    The two cut points are arithmetic hashes of ``(id, salt)`` mod
    ``n-1`` (each in ``[1, n-1]``, ordered so neither span is negative;
    prefix or middle may legitimately be empty when the cuts collide).
    Sequences shorter than ``min_len`` pass through unchanged with
    ``fim_applied = false`` — sentinel-wrapping a 2-token document wastes
    more context than it teaches.

    Adds ``cut_lo``, ``cut_hi``, ``fim_applied``, and ``fim_tokens``.
    """
    t = F.col(tokens)
    n = F.size(t)
    idc = F.col(id_col).cast("bigint")
    # greatest(.., 1): the cut expressions are evaluated even on the
    # passthrough branch, and pmod(h, 0) aborts under ANSI mode
    nm1 = F.greatest(n - 1, F.lit(1))
    c1 = _cut(idc, 1, nm1)
    c2 = _cut(idc, 2, nm1)
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    applied = n >= F.lit(min_len)
    fim = F.concat(
        F.array(F.lit(pre_tok).cast("int")), F.slice(t, 1, lo),
        F.array(F.lit(suf_tok).cast("int")),
        F.slice(t, hi + 1, F.greatest(n - hi, F.lit(0))),
        F.array(F.lit(mid_tok).cast("int")),
        F.slice(t, lo + 1, hi - lo))
    return (df
            .withColumn("cut_lo", F.when(applied, lo).otherwise(F.lit(0)))
            .withColumn("cut_hi", F.when(applied, hi).otherwise(F.lit(0)))
            .withColumn("fim_applied", applied)
            .withColumn("fim_tokens", F.when(applied, fim).otherwise(t)))


def skipgram_pairs(
    docs: DataFrame,
    tokens: str = "tokens",
    window: int = 2,
) -> DataFrame:
    """Skip-gram (center, context) co-occurrence counts — the
    training-pair generator behind word2vec-style embedding pretraining
    and the raw material for PMI/co-occurrence matrices.

    For every position ``p`` in every sequence, each token at distance
    ``1..window`` on either side contributes one ``(center, context)``
    pair; pairs are then count-aggregated corpus-wide.

    Scale design: the naive formulation is a positional self-join
    (corpus x corpus within doc) — two shuffles of the exploded corpus.
    This operator instead builds each position's context list with pure
    array HOFs (two O(window) slices per element, ``O(n * window)`` per
    document, zero joins), explodes once, and feeds ONE map-side-
    combined count aggregation whose key space is bounded by observed
    vocab^2, not by corpus size.  No Python anywhere.

    Output: ``center int, context int, cnt bigint``.
    """
    t = F.col(tokens)
    n = F.size(t)
    # p is the 1-based position of the center; neighbors are the window
    # positions left and right of p, clamped to the sequence bounds
    pairs = F.flatten(F.transform(
        t,
        lambda c, i: F.transform(
            F.concat(
                F.slice(t, F.greatest(F.lit(1), i + 1 - window),
                        (i + 1) - F.greatest(F.lit(1), i + 1 - window)),
                F.slice(t, i + 2,
                        F.least(n, i + 1 + window) - (i + 1))),
            lambda ctx: F.struct(c.alias("center"), ctx.alias("context")))))
    return (docs.select(F.explode(pairs).alias("_pr"))
            .select("_pr.center", "_pr.context")
            .groupBy("center", "context")
            .agg(F.count(F.lit(1)).alias("cnt")))

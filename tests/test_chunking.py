"""Context-window chunking: reference-slicing parity, cover/overlap laws,
length rules, BOS/EOS framing."""

import random

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.chunking import chunk_tokens


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, list(t)) for i, t in enumerate(rows)],
        "doc_id int, tokens array<int>")


def _ref_chunks(t, window, stride, min_len=1, drop_last=False,
                bos=None, eos=None):
    out = []
    for j, s in enumerate(range(0, len(t), stride)):
        c = t[s:s + window]
        if len(c) < (window if drop_last else min_len):
            continue
        if bos is not None:
            c = [bos] + c
        if eos is not None:
            c = c + [eos]
        out.append((j, c))
    return out


def _got(df):
    return {(r.doc_id, r.chunk_no): (list(r.chunk), r.n_chunk)
            for r in df.collect()}


@pytest.mark.parametrize("window,stride,drop_last,bos,eos", [
    (8, 8, False, None, None),    # disjoint cover
    (8, 6, False, None, None),    # overlap 2
    (8, 6, True, None, None),     # exact windows only
    (5, 3, False, 0, 1),          # framing
    (4, 9, False, None, None),    # stride > window: gaps are legal
])
def test_chunks_match_reference(spark, window, stride, drop_last, bos, eos):
    rng = random.Random(7)
    rows = [[rng.randrange(100) for _ in range(rng.randrange(0, 30))]
            for _ in range(40)]
    got = _got(chunk_tokens(_mk(spark, rows), window=window, stride=stride,
                            drop_last=drop_last, bos=bos, eos=eos))
    exp = {}
    for i, t in enumerate(rows):
        for j, c in _ref_chunks(t, window, stride, drop_last=drop_last,
                                bos=bos, eos=eos):
            exp[(i, j)] = (c, len(c))
    assert got == exp


def test_disjoint_cover_roundtrip(spark):
    """stride == window: concatenating a doc's chunks in chunk_no order
    reconstructs the document exactly."""
    rng = random.Random(11)
    rows = [[rng.randrange(50) for _ in range(rng.randrange(1, 40))]
            for _ in range(30)]
    df = chunk_tokens(_mk(spark, rows), window=7)
    back = (df.groupBy("doc_id")
            .agg(F.flatten(F.array_sort(F.collect_list(
                F.struct("chunk_no", "chunk"))).chunk).alias("t")))
    got = {r.doc_id: list(r.t) for r in back.collect()}
    assert got == {i: t for i, t in enumerate(rows)}


def test_overlap_every_boundary_token_has_context(spark):
    """stride < window: every token position past the first window appears
    in a chunk where it has >= window - stride tokens of left context."""
    rows = [list(range(100))]
    window, stride = 16, 12
    chunks = [list(r.chunk) for r in
              chunk_tokens(_mk(spark, rows), window=window,
                           stride=stride).collect()]
    for pos in range(window, 100):
        ctx = max(c.index(pos) for c in chunks if pos in c)
        assert ctx >= window - stride


def test_empty_and_min_len(spark):
    rows = [[], [1], [1, 2, 3, 4, 5]]
    df = chunk_tokens(_mk(spark, rows), window=4, stride=4, min_len=2)
    got = _got(df)
    # []: nothing; [1]: remainder below min_len dropped; [1..5]: full + drop
    assert got == {(2, 0): ([1, 2, 3, 4], 4)}


def test_invalid_args(spark):
    with pytest.raises(ValueError):
        chunk_tokens(_mk(spark, [[1]]), window=0)
    with pytest.raises(ValueError):
        chunk_tokens(_mk(spark, [[1]]), window=4, stride=-1)

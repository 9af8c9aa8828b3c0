"""Loss masking and FIM: alignment, reconstruction, and edge cases."""

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.seqops import fim_transform, loss_mask


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")


def test_loss_mask_hand_computed(spark):
    d = _toks(spark, [(1, [5, 9, 7, 9, 3]),    # first 9 at position 2
                      (2, [1, 2, 3]),           # no delimiter
                      (3, [9]),                 # delimiter only
                      (4, [])])
    got = {r.doc_id: r for r in loss_mask(d, delim=9).collect()}
    assert got[1].mask == [0, 0, 1, 1, 1]      # only AFTER the first 9
    assert got[1].n_train == 3
    assert got[2].mask == [0, 0, 0] and got[2].n_train == 0
    assert got[3].mask == [0] and got[3].n_train == 0
    assert got[4].mask == [] and got[4].n_train == 0


def test_fim_reconstruction_and_spans(spark):
    toks = list(range(100, 120))
    d = _toks(spark, [(7, toks)])
    r = fim_transform(d).collect()[0]
    assert r.fim_applied
    lo, hi = r.cut_lo, r.cut_hi
    assert 1 <= lo <= hi <= len(toks) - 1
    pre, suf, mid = toks[:lo], toks[hi:], toks[lo:hi]
    assert r.fim_tokens == [50281] + pre + [50282] + suf + [50283] + mid
    # lossless: the multiset of original tokens survives the reorder
    body = [t for t in r.fim_tokens if t < 50281]
    assert sorted(body) == sorted(toks)


def test_fim_short_passthrough(spark):
    d = _toks(spark, [(1, [1, 2, 3]), (2, []), (3, [4])])
    got = {r.doc_id: r for r in fim_transform(d).collect()}
    for i in (1, 2, 3):
        assert not got[i].fim_applied
        assert got[i].cut_lo == 0 and got[i].cut_hi == 0
    assert got[1].fim_tokens == [1, 2, 3]
    assert got[2].fim_tokens == []


def test_fim_deterministic_and_id_dependent(spark):
    toks = list(range(50))
    d = _toks(spark, [(i, toks) for i in range(40)])
    a = {r.doc_id: (r.cut_lo, r.cut_hi, tuple(r.fim_tokens))
         for r in fim_transform(d).collect()}
    b = {r.doc_id: (r.cut_lo, r.cut_hi, tuple(r.fim_tokens))
         for r in fim_transform(d.repartition(7)).collect()}
    assert a == b                                   # partitioning-invariant
    # different ids draw different cuts (not one global split)
    assert len({(v[0], v[1]) for v in a.values()}) > 5


def test_fim_empty_middle_legal(spark):
    """Cut collision (lo == hi) must yield an empty middle, not an error."""
    # scan ids until one collides; with 200 ids over n=5 it happens
    d = _toks(spark, [(i, [1, 2, 3, 4, 5]) for i in range(200)])
    rows = fim_transform(d).collect()
    collided = [r for r in rows if r.cut_lo == r.cut_hi]
    assert collided, "expected at least one lo==hi collision"
    r = collided[0]
    assert r.fim_tokens.count(50283) == 1
    assert r.fim_tokens[-1] == 50283               # empty middle at the end


# ---------------------------------------------------------------------------
# skip-gram pair generation
# ---------------------------------------------------------------------------

def test_skipgram_pairs_hand_counted(spark):
    from fs2_data_spark.operators.seqops import skipgram_pairs
    d = spark.createDataFrame([(1, [10, 20, 30])],
                              "doc_id bigint, tokens array<int>")
    got = {(r.center, r.context): r.cnt
           for r in skipgram_pairs(d, window=1).collect()}
    assert got == {(10, 20): 1, (20, 10): 1, (20, 30): 1, (30, 20): 1}


def test_skipgram_window_and_symmetry(spark):
    from fs2_data_spark.operators.seqops import skipgram_pairs
    d = spark.createDataFrame([(1, [1, 2, 3, 4, 5])],
                              "doc_id bigint, tokens array<int>")
    got = {(r.center, r.context): r.cnt
           for r in skipgram_pairs(d, window=2).collect()}
    # brute force
    toks = [1, 2, 3, 4, 5]
    want = {}
    for i, c in enumerate(toks):
        for j in range(max(0, i - 2), min(len(toks), i + 3)):
            if j != i:
                want[(c, toks[j])] = want.get((c, toks[j]), 0) + 1
    assert got == want
    # symmetric window => count(a,b) == count(b,a)
    assert all(got[(a, b)] == got[(b, a)] for a, b in got)


def test_skipgram_counts_accumulate_across_docs(spark):
    from fs2_data_spark.operators.seqops import skipgram_pairs
    d = spark.createDataFrame([(1, [7, 8]), (2, [7, 8]), (3, [8, 7])],
                              "doc_id bigint, tokens array<int>")
    got = {(r.center, r.context): r.cnt
           for r in skipgram_pairs(d, window=3).collect()}
    assert got == {(7, 8): 3, (8, 7): 3}

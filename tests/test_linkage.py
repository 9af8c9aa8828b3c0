"""Blocked edit-distance record linkage: exactness within blocks, the
stated prefix-blocking recall contract, and the banded-threshold cutoff."""

from pyspark.sql import functions as F

from fs2_data_spark.operators.linkage import blocked_edit_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_distances_within_block(spark):
    d = _docs(spark, [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumped"),   # lev 2 (s->ed)
        (3, "the quick brown cat jumps"),    # lev 3 vs 1 (fox->cat)
        (4, "the quick brown fox jumps"),    # lev 0 vs 1
    ])
    got = {(r.id_a, r.id_b): r.lev
           for r in blocked_edit_pairs(d, prefix_len=10, max_dist=5).collect()}
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 3
    assert got[(1, 4)] == 0
    assert got[(2, 3)] == 5  # jumped vs cat jumps region
    assert (2, 4) in got and got[(2, 4)] == 2


def test_threshold_drops_far_pairs(spark):
    d = _docs(spark, [
        (1, "prefix-shared aaaaaaaaaaaaaaa"),
        (2, "prefix-shared bbbbbbbbbbbbbbb"),
    ])
    assert blocked_edit_pairs(d, prefix_len=13, max_dist=5).count() == 0
    got = blocked_edit_pairs(d, prefix_len=13, max_dist=15).collect()
    assert len(got) == 1 and got[0].lev == 15


def test_prefix_blocking_recall_contract(spark):
    # identical except the FIRST character: different block -> never paired
    d = _docs(spark, [(1, "Xabcdefghij"), (2, "Yabcdefghij")])
    assert blocked_edit_pairs(d, prefix_len=4, max_dist=5).count() == 0


def test_length_prefilter_agrees_with_distance_bound(spark):
    # |len diff| > max_dist implies lev > max_dist: prefilter never drops
    # a pair the distance filter would keep (parity vs unblocked brute force)
    rows = [(i, "common-head " + "x" * i) for i in range(1, 30)]
    d = _docs(spark, rows)
    got = {(r.id_a, r.id_b): r.lev
           for r in blocked_edit_pairs(d, prefix_len=12, max_dist=6).collect()}
    brute = {}
    texts = dict(rows)
    for i in texts:
        for j in texts:
            if i < j:
                lv = abs(i - j)  # suffix padding: distance == length diff
                if lv <= 6:
                    brute[(i, j)] = lv
    assert got == brute

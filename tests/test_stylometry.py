"""Burrows' Delta stylometry between corpus groups."""

import math

import pytest

from fs2_data_spark.operators.index import stylometry_delta


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, "
                                       "text string")


def test_delta_identical_profiles_near_zero(spark):
    text = "the of and to a " * 5
    rows = [(1, "a", text), (2, "b", text), (3, "c", text + "the of")]
    got = {(r.a, r.b): r for r in stylometry_delta(
        _docs(spark, rows), top_v=5).collect()}
    # a and b share an identical profile: every z equal -> delta 0
    assert got[("a", "b")].delta == pytest.approx(0.0, abs=1e-6)
    # c's profile differs slightly: delta(a, c) > delta(a, b)
    assert got[("a", "c")].delta > got[("a", "b")].delta


def test_delta_hand_computed_two_words_three_groups(spark):
    # vocab {x, y}; relative freqs: a: (1, 0), b: (0, 1), c: (.5, .5)
    rows = [(1, "a", "x x"), (2, "b", "y y"), (3, "c", "x y")]
    got = {(r.a, r.b): r for r in stylometry_delta(
        _docs(spark, rows), top_v=2).collect()}
    # per word across groups: mean 0.5, sample std of (1, 0, .5) = 0.5
    # z_x: a=1, b=-1, c=0 ; z_y: a=-1, b=1, c=0
    # delta(a,b) = mean(|1-(-1)|, |-1-1|) = 2
    # delta(a,c) = mean(1, 1) = 1
    assert got[("a", "b")].v_used == 2
    assert got[("a", "b")].delta == pytest.approx(2.0, abs=1e-6)
    assert got[("a", "c")].delta == pytest.approx(1.0, abs=1e-6)
    assert got[("b", "c")].delta == pytest.approx(1.0, abs=1e-6)


def test_delta_zero_variance_words_excluded(spark):
    # 'k' appears with identical relative frequency in both groups ->
    # std 0 -> excluded from the divisor
    rows = [(1, "a", "k x"), (2, "b", "k y")]
    got = stylometry_delta(_docs(spark, rows), top_v=3).collect()
    assert len(got) == 1
    assert got[0].v_used == 2  # x and y only; k dropped


def test_delta_absent_word_counts_as_zero_frequency(spark):
    # group b never says 'rare' — its f = 0 must enter the z, not be
    # dropped (otherwise the pair silently compares different vocab)
    rows = [(1, "a", "common rare"), (2, "b", "common common")]
    got = stylometry_delta(_docs(spark, rows), top_v=2).collect()
    assert got[0].v_used >= 1
    assert got[0].delta > 0

"""PPS systematic sampling, quantile normalization, RRF fusion."""

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.encoding import quantile_normalize
from fs2_data_spark.operators.mixing import (portable_unit_hash,
                                             pps_systematic_sample)
from fs2_data_spark.operators.similarity import rrf_fuse


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, "
                                       "n_chars bigint")


# ---------------------------------------------------------------------------
# PPS systematic sampling
# ---------------------------------------------------------------------------

def _h(i, seed=42):
    return ((i * 2_654_435_761 + seed) % 1_000_003 * 40_503 + 17) % 999_983


def test_pps_exact_count_and_brute_force(spark):
    rows = [(i, "s", (i * 13) % 50 + 1) for i in range(200)]
    k = 10
    got = {r.doc_id for r in pps_systematic_sample(
        _docs(spark, rows), k=k).collect()}
    # brute-force replay: same hash order, same integer walk
    ordered = sorted(rows, key=lambda r: (_h(r[0]), r[0]))
    total = sum(r[2] for r in ordered)
    cum, picked = 0, set()
    for i, _, w in ordered:
        prev = cum
        cum += w
        if (cum * k) // total > (prev * k) // total:
            picked.add(i)
    assert got == picked
    assert len(got) == k  # no weight exceeds W/k here


def test_pps_heavy_row_certainty_selection(spark):
    # one row holds 90% of the mass: always selected, n_hits > 1
    rows = [(1, "s", 900)] + [(i, "s", 10) for i in range(2, 12)]
    out = {r.doc_id: r for r in pps_systematic_sample(
        _docs(spark, rows), k=5).collect()}
    assert 1 in out
    assert out[1].n_hits >= 4  # 900/1000 of 5 grid lines
    total_hits = sum(r.n_hits for r in out.values())
    assert total_hits == 5


def test_pps_zero_weight_excluded_and_per_stratum(spark):
    rows = [(1, "a", 5), (2, "a", 0), (3, "b", 7)]
    out = pps_systematic_sample(_docs(spark, rows), k=2).collect()
    ids = {r.doc_id for r in out}
    assert 2 not in ids
    assert {r.source for r in out} == {"a", "b"}


# ---------------------------------------------------------------------------
# quantile normalization
# ---------------------------------------------------------------------------

def test_qnorm_identical_marginals(spark):
    # group a: 1..4, group b: 101..104 -> after mapping, both use pooled
    # values at the same quantile slots
    rows = ([(i, "a", i) for i in range(1, 5)]
            + [(100 + i, "b", 100 + i) for i in range(1, 5)])
    out = quantile_normalize(_docs(spark, rows), value="n_chars",
                             group="source", tiebreak="doc_id").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.q_value)
    assert sorted(by_src["a"]) == sorted(by_src["b"])


def test_qnorm_preserves_within_group_order(spark):
    rows = [(1, "a", 30), (2, "a", 10), (3, "a", 20),
            (4, "b", 5), (5, "b", 500)]
    out = {r.doc_id: r for r in quantile_normalize(
        _docs(spark, rows), value="n_chars").collect()}
    assert out[2].q_value <= out[3].q_value <= out[1].q_value
    assert out[4].q_value <= out[5].q_value


def test_qnorm_rank_formula_hand_checked(spark):
    # single group of 2 rows, pooled N=2: r=1 -> t=ceil(1*2/4)=1,
    # r=2 -> t=ceil(3*2/4)=2
    rows = [(1, "a", 10), (2, "a", 20)]
    out = {r.doc_id: r.q_value for r in quantile_normalize(
        _docs(spark, rows), value="n_chars").collect()}
    assert out[1] == 10 and out[2] == 20


def test_qnorm_two_groups_map_to_pooled_values(spark):
    # pooled sorted: 1, 2, 100, 200 (N=4)
    # group a (n=2): r=1 -> t=ceil(4/4)=1 -> 1 ; r=2 -> t=ceil(12/4)=3 -> 100
    rows = [(1, "a", 1), (2, "a", 100), (3, "b", 2), (4, "b", 200)]
    out = {r.doc_id: r.q_value for r in quantile_normalize(
        _docs(spark, rows), value="n_chars").collect()}
    assert out[1] == 1 and out[2] == 100
    assert out[3] == 1 and out[4] == 100


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, value double, eus bigint")


def test_rrf_hand_computed(spark):
    rows = [(1, 1, 10.0, 100), (2, 1, 30.0, 50), (3, 1, 20.0, 75)]
    out = {r.event_id: r for r in rrf_fuse(
        _events(spark, rows), key="user_id",
        rankings=[("value", True), ("eus", True)],
        id_col="event_id", k0=60, top=3).collect()}
    # value desc: 2, 3, 1 ; eus desc: 1, 3, 2
    assert (out[2].rank_1, out[2].rank_2) == (1, 3)
    assert (out[1].rank_1, out[1].rank_2) == (3, 1)
    assert out[3].rrf == pytest.approx(round(1 / 62 + 1 / 62, 9), abs=1e-12)
    # convexity of 1/x: rank set {1, 3} beats {2, 2}; the two extremes tie
    assert out[1].rrf == out[2].rrf
    assert out[1].rrf == pytest.approx(round(1 / 63 + 1 / 61, 9), abs=1e-12)
    assert out[1].rrf > out[3].rrf


def test_rrf_top_k_and_determinism(spark):
    rows = [(i, i % 2, float((i * 7) % 11), (i * 3) % 13)
            for i in range(30)]
    out = rrf_fuse(_events(spark, rows), key="user_id",
                   rankings=[("value", True), ("eus", False)],
                   top=3).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert all(len(v) == 3 for v in per_user.values())
    again = rrf_fuse(_events(spark, rows), key="user_id",
                     rankings=[("value", True), ("eus", False)],
                     top=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

"""Per-group embedding centroid cosine matrix."""

import math

import pytest

from fs2_data_spark.operators.similarity import centroid_cosine_matrix


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, label int, "
                                       "embedding array<float>")


def test_centroid_cosine_hand_computed(spark):
    rows = [
        # label 0 centroid -> (1, 0); label 1 -> (0, 1); label 2 -> (1, 1)
        (1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0]),
        (3, 1, [0.0, 1.0]),
        (4, 2, [2.0, 0.0]), (5, 2, [0.0, 2.0]),
    ]
    got = {(r.a, r.b): r.cos for r in centroid_cosine_matrix(
        _emb(spark, rows), group="label").collect()}
    assert got[(0, 1)] == pytest.approx(0.0, abs=1e-9)
    assert got[(0, 2)] == pytest.approx(1 / math.sqrt(2), abs=1e-6)
    assert got[(1, 2)] == pytest.approx(1 / math.sqrt(2), abs=1e-6)


def test_centroid_zero_norm_yields_null(spark):
    rows = [(1, 0, [1.0, 0.0]),
            (2, 1, [1.0, -1.0]), (3, 1, [-1.0, 1.0])]  # centroid (0, 0)
    got = centroid_cosine_matrix(_emb(spark, rows), group="label").collect()
    assert len(got) == 1 and got[0].cos is None


def test_centroid_mean_not_sum(spark):
    # scaling a group's population size must not change its centroid
    rows = ([(i, 0, [3.0, 4.0]) for i in range(10)]
            + [(100, 1, [3.0, 4.0])])
    got = centroid_cosine_matrix(_emb(spark, rows), group="label").collect()
    assert got[0].cos == pytest.approx(1.0, abs=1e-6)

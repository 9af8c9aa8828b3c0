"""JL sign projection: numpy parity, distance preservation, determinism."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.projection import (jl_distance_audit,
                                                 jl_project, jl_sign,
                                                 jl_signs)

DIM, K = 8, 4


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>")


def test_matches_numpy_reference(spark):
    rng_free = [[((i * 37 + j * 11) % 19) / 4.0 - 2.0 for j in range(DIM)]
                for i in range(20)]
    d = _emb(spark, rng_free)
    got = {r.vec_id: [getattr(r, f"jl_{j}") for j in range(K)]
           for r in jl_project(d, dim=DIM, out_dim=K).collect()}
    R = np.array(jl_signs(DIM, K), dtype=np.float64)       # K x DIM
    X = np.array(rng_free, dtype=np.float32).astype(np.float64)
    want = (X @ R.T) / math.sqrt(K)
    for i in range(20):
        assert got[i] == pytest.approx(list(want[i]), abs=5e-7)


def test_sign_matrix_balanced_and_deterministic():
    s = jl_signs(64, 16)
    assert s == jl_signs(64, 16)                    # pure function
    assert jl_sign(3, 5) in (-1, 1)
    flat = [x for row in s for x in row]
    assert set(flat) == {-1, 1}
    # roughly balanced: a degenerate all-one matrix would break JL
    assert 0.35 < flat.count(1) / len(flat) < 0.65
    # rows differ (distinct output dims see distinct sign patterns)
    assert len({tuple(r) for r in s}) == 16


def test_distance_preservation_in_expectation(spark):
    vecs = [[((i * 53 + j * 29) % 23) / 5.0 for j in range(64)]
            for i in range(200)]
    d = _emb(spark, vecs)
    p = jl_project(d, dim=64, out_dim=16)
    out = jl_distance_audit(p, dim=64, out_dim=16)
    ratios = [r.d2_ratio for r in out.collect() if r.d2_ratio is not None]
    assert len(ratios) == 199
    m = sum(ratios) / len(ratios)
    # E[ratio] = 1, sd of the mean ~ sqrt(2/16)/sqrt(199) ~ 0.025
    assert abs(m - 1.0) < 0.15


def test_audit_edges(spark):
    d = _emb(spark, [[1.0] * DIM, [1.0] * DIM, [2.0] * DIM])
    out = {r.vec_id: r for r in
           jl_distance_audit(jl_project(d, dim=DIM, out_dim=K),
                             dim=DIM, out_dim=K).collect()}
    assert out[0].d2_orig == 0.0 and out[0].d2_ratio is None  # identical pair
    assert out[1].d2_orig == pytest.approx(DIM * 1.0)
    assert out[2].d2_ratio is None                            # no vec_id+1

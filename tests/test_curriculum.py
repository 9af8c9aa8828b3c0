"""Curriculum quantile bucketing (operators/curriculum.py).

The bucket rule is pure integer arithmetic — assignments are checked exactly,
including the tie semantics ntile can't provide, and the DuckDB SQL mirror
must reproduce them bit-for-bit.
"""

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.curriculum import (
    quantile_bucket_map,
    quantile_buckets,
    quantile_buckets_sql,
)


@pytest.fixture(scope="module")
def scored(spark):
    # scores [1,1,1,2,3,3,4,10]: below = {1:0, 2:3, 3:4, 4:6, 10:7}, n=8
    rows = [(i, s) for i, s in enumerate([1, 1, 1, 2, 3, 3, 4, 10])]
    return spark.createDataFrame(rows, "doc_id bigint, score bigint")


def test_bucket_map_exact(spark, scored):
    got = {r.score: r.bucket for r in
           quantile_bucket_map(scored, "score", k=4).collect()}
    # bucket(v) = min(3, 4*below//8)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 10: 3}


def test_quantile_buckets_ties_and_monotonicity(spark, scored):
    out = quantile_buckets(scored, "score", k=4).collect()
    assert len(out) == 8
    by_score = {}
    for r in out:
        by_score.setdefault(r.score, set()).add(r.bucket)
    # all ties share one bucket (deterministic, unlike ntile)
    assert all(len(v) == 1 for v in by_score.values())
    # buckets ascend with score
    pairs = sorted((s, next(iter(b))) for s, b in by_score.items())
    assert [b for _, b in pairs] == sorted(b for _, b in pairs)


def test_quantile_buckets_balanced_on_distinct_scores(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 1000).alias("score"))
    got = (quantile_buckets(df, "score", k=4)
           .groupBy("bucket").count().collect())
    n = {r.bucket: r["count"] for r in got}
    assert n == {0: 250, 1: 250, 2: 250, 3: 250}  # exact on distinct values


def test_quantile_buckets_partition_invariant(spark, scored):
    a = sorted((r.doc_id, r.bucket) for r in
               quantile_buckets(scored, "score", k=4).collect())
    b = sorted((r.doc_id, r.bucket) for r in
               quantile_buckets(scored.repartition(5), "score", k=4).collect())
    assert a == b


def test_quantile_buckets_out_col(spark, scored):
    out = quantile_buckets(scored, "score", k=2, out_col="tier")
    assert "tier" in out.columns and "bucket" not in out.columns


def test_sql_mirror_matches_duckdb(spark, scored):
    import duckdb

    got = sorted((r.doc_id, r.score, r.bucket) for r in
                 quantile_buckets(scored, "score", k=4)
                 .select("doc_id", "score", "bucket").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, score BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(r.doc_id, r.score) for r in scored.collect()])
    sql = quantile_buckets_sql("t", "score", k=4,
                               select_cols="doc_id, score, bucket")
    exp = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == exp

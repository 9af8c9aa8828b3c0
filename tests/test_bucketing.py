"""Bucketed co-located join: the 100 TB shuffle-elimination lever.

At cluster scale the dominant cost of a repeated big-big equi-join is
re-shuffling both sides every query. Pre-bucketing the stored tables on the
join key (same bucket count both sides) makes the join bucket-local: Spark
plans a SortMergeJoin with ZERO Exchange. This test pins that plan property
so the engine's storage recommendation (bucket the token/observation tables
by entity key) stays evidence, not folklore.
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_eliminates_both_exchanges(spark):
    a = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    b = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")
    try:
        (a.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
         .saveAsTable("t_bucket_a"))
        (b.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
         .saveAsTable("t_bucket_b"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bucketed = _plan(spark.table("t_bucket_a")
                             .join(spark.table("t_bucket_b"), "k"))
            plain = _plan(a.join(b, "k"))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        # bucketed storage: bucket-local merge join, zero shuffle
        assert "SortMergeJoin" in bucketed
        assert "Exchange" not in bucketed
        # the same join over unbucketed inputs shuffles both sides
        assert "Exchange" in plain
        # and the result is still correct
        n = (spark.table("t_bucket_a")
             .join(spark.table("t_bucket_b"), "k").count())
        assert n == 20_000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_groupby_avoids_exchange(spark):
    """Aggregations on the bucket key also skip the shuffle — the second
    win of bucketing the entity key."""
    a = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    spark.sql("DROP TABLE IF EXISTS t_bucket_g")
    try:
        (a.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
         .saveAsTable("t_bucket_g"))
        plan = _plan(spark.table("t_bucket_g").groupBy("k")
                     .agg(F.sum("v").alias("s")))
        assert "Exchange" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_g")

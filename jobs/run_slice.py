"""Flagship minimum-slice job (SURVEY §7.1).

For every (doc_id, event_time) in the sequence table, attach the
last-observation-carried-forward feature row (strict point-in-time), plus
lag/lead token-count features and gap-based session ids; prints sequences/sec
and tokens/sec.

Run:  spark-submit --py-files fs2_data_spark.zip jobs/run_slice.py [n_rows]
"""

import sys
import time

from pyspark.sql import functions as F




from fs2_data_spark.session import get_spark
from fs2_data_spark.tables import observations, token_sequences


def build_pipeline(spark, n_rows: int):
    from fs2_data_spark.pipeline import pit_feature_pipeline
    seqs = token_sequences(spark, n_rows)
    obs = observations(spark, max(n_rows // 4, 1), n_docs=max(n_rows // 8, 1))
    return pit_feature_pipeline(seqs, obs, gap_s=3600)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="fs2_data_spark_slice")
    out = build_pipeline(spark, n_rows)
    t0 = time.perf_counter()
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tok").alias("tokens"),
        F.sum(F.when(F.col("feature_vec").isNotNull(), 1).otherwise(0)).alias("matched"),
        F.max("session_seq").alias("max_session"),
    ).first()
    elapsed = time.perf_counter() - t0
    print(
        f"rows={agg.rows} tokens={agg.tokens} matched={agg.matched} "
        f"max_session={agg.max_session} elapsed={elapsed:.2f}s "
        f"sequences_per_sec={agg.rows / elapsed:.0f} "
        f"tokens_per_sec={agg.tokens / elapsed:.0f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()

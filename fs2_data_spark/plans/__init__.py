from fs2_data_spark.plans.partitioning import (
    add_salt,
    key_skew_stats,
    repartition_for_timeline,
    salted_agg,
)

__all__ = ["add_salt", "key_skew_stats", "repartition_for_timeline", "salted_agg"]

from fs2_data_spark.functions.timeutil import epoch_us, epoch_s

__all__ = ["epoch_us", "epoch_s"]

from fs2_data_spark.streaming.sessions import streaming_session_aggregate

__all__ = ["streaming_session_aggregate"]

from fs2_data_spark.sources.csvsrc import read_csv
from fs2_data_spark.sources.jsonl import read_jsonl

__all__ = ["read_csv", "read_jsonl"]

"""fs2_data_spark — a PySpark-native point-in-time feature-engineering engine.

A from-scratch re-expression of the *semantics* of gnieh/fs2-data (streaming,
order-preserving, constant-memory parse -> select -> transform pipelines; see
/root/reference) on top of the Spark DataFrame API:

- as-of / backfill (LOCF) joins with strict ``t' <= t`` point-in-time semantics
  (the Spark analogue of fs2-data's ``Rhs.Default`` "default unless a later
  value arrives" mechanism, reference ``finite-state/.../esp/ESP.scala:89-95``)
- windowed feature stacks (lag/lead/rolling/rank) and gap-based sessionization
- token-array operators mirroring jq/JSONPath selection semantics
  (reference ``json/src/main/scala/fs2/data/json/jq/ast.scala``)
- training-data-pipeline operators: dedup (exact/minhash/simhash/jaccard),
  similarity search, text quality analysis
- format sources (JSONL/CSV) with fs2-data's strict-vs-attempt error modes
  (reference ``csv/shared/src/main/scala/fs2/data/csv/package.scala:482-565``)

Everything is declarative DataFrame/Catalyst first; pandas/Arrow UDFs are used
only where built-in operators cannot express the semantics. No per-row Python.
"""

__version__ = "0.2.0"

from fs2_data_spark.pipe import Pipe, through
from fs2_data_spark.session import get_spark

# the query-language and pipeline surfaces a reference user reaches for first
from fs2_data_spark.functions.jsonq import (  # noqa: E402
    DELETE,
    jq_run,
    json_merge_patch,
    json_tokenize,
    json_transform,
    select_path_all,
)
from fs2_data_spark.functions.xpath import xpath_filter  # noqa: E402
from fs2_data_spark.operators.asof import asof_join, backfill_locf  # noqa: E402
from fs2_data_spark.operators.sessionize import sessionize  # noqa: E402
from fs2_data_spark.pipeline import (  # noqa: E402
    fused_pit_features,
    pit_feature_pipeline,
)
from fs2_data_spark.functions.jsonpath import (  # noqa: E402
    wrap_as_array_in_object,
    wrap_as_value_in_object,
)
from fs2_data_spark.sources.binary_codecs import (  # noqa: E402
    decode_cbor,
    decode_msgpack,
)
from fs2_data_spark.sources.charsets import decode_text, encode_text  # noqa: E402
from fs2_data_spark.sources.xmlsrc import (  # noqa: E402
    xml_dom,
    xml_events,
    xml_events_raw,
    xml_render,
)

__all__ = [
    "Pipe", "through", "get_spark", "__version__",
    "select_path_all", "jq_run", "json_transform", "json_merge_patch",
    "json_tokenize", "DELETE", "xpath_filter",
    "xml_events", "xml_events_raw", "xml_dom", "xml_render",
    "wrap_as_array_in_object", "wrap_as_value_in_object",
    "decode_msgpack", "decode_cbor", "decode_text", "encode_text",
    "asof_join", "backfill_locf", "sessionize",
    "fused_pit_features", "pit_feature_pipeline",
]

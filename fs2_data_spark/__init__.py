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

__version__ = "0.1.0"

from fs2_data_spark.pipe import Pipe, through
from fs2_data_spark.session import get_spark

__all__ = ["Pipe", "through", "get_spark", "__version__"]

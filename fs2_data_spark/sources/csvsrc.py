"""CSV source with fs2-data decode-mode parity.

Mirrors the high-level CSV one-liners (reference
``csv/shared/src/main/scala/fs2/data/csv/package.scala:128-222``):

- ``decodeUsingHeaders``   -> ``read_csv(..., header=True)``
- ``decodeGivenHeaders``   -> ``read_csv(..., header=False, schema=...)``
- ``decodeSkippingHeaders``-> ``read_csv(..., header=True, schema=...)``
  (header consumed, supplied names win)
- strict vs ``lenient.attemptDecode*`` -> FAILFAST vs PERMISSIVE +
  bad-record side channel (``csv/package.scala:482-565``)

Quote handling maps RFC-4180 mode (``QuoteHandling.RFCCompliant``,
``csv/package.scala:104-123``) to Spark's quote/escape options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
    quote: str = '"',
    mode: str = "strict",
    multiline: bool = False,
) -> DataFrame:
    """RFC-4180 CSV reader. ``schema=None`` + ``header`` infers names only
    (all strings — the CellDecoder typing step is the caller's ``cast``,
    mirroring fs2-data's string cells + typeclass decode,
    ``csv/CellDecoder.scala:161-257``)."""
    reader = (spark.read
              .option("header", str(header).lower())
              .option("sep", sep)
              .option("quote", quote)
              .option("escape", quote)          # RFC-4180 doubled quotes
              .option("multiLine", str(multiline).lower())
              .option("enforceSchema", "false"))
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if mode == "strict":
        reader = reader.option("mode", "FAILFAST")
        return reader.schema(schema).csv(path) if schema is not None else reader.csv(path)
    if mode == "attempt":
        if schema is None:
            raise ValueError("attempt mode needs an explicit schema")
        schema2 = schema.add(CORRUPT, T.StringType())
        df = (reader.schema(schema2)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", CORRUPT)
              .csv(path))
        return df.withColumn("ok", F.col(CORRUPT).isNull()).withColumnRenamed(
            CORRUPT, "error_record")
    raise ValueError(f"unknown mode: {mode!r} (use 'strict' or 'attempt')")


def decode_cells(df: DataFrame, casts: dict[str, str], mode: str = "strict") -> DataFrame:
    """Typed per-cell decode (CellDecoder analogue): ``casts`` maps column ->
    type. strict = ANSI ``cast`` (a bad cell fails the job, fs2-data's
    fail-the-stream); attempt = ``try_cast`` + ``<col>_ok`` flags (the
    ``attemptDecode`` Either)."""
    out = df
    for c, typ in casts.items():
        decoded = F.col(c).cast(typ) if mode == "strict" else F.col(c).try_cast(typ)
        if mode == "attempt":
            out = out.withColumn(f"{c}_ok", decoded.isNotNull() | F.col(c).isNull())
        out = out.withColumn(c, decoded)
    return out


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    """CSV render (fs2-data ``encodeWithGivenHeaders``/``RowWriter`` analogue,
    ``csv/package.scala:226-328``)."""
    (df.write.mode("overwrite")
     .option("header", str(header).lower())
     .option("sep", sep)
     .option("quote", '"')
     .option("escape", '"')   # RFC-4180 doubled quotes, matching read_csv
     .csv(path))

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
    empty_as_null: bool = False,
    line_sep: str | None = None,
    quote_handling: str = "rfc",
) -> DataFrame:
    """RFC-4180 CSV reader. ``schema=None`` + ``header`` infers names only
    (all strings — the CellDecoder typing step is the caller's ``cast``,
    mirroring fs2-data's string cells + typeclass decode,
    ``csv/CellDecoder.scala:161-257``).

    ``empty_as_null=False`` (default) keeps empty cells as ``""`` like
    fs2-data's string cells (csv-spectrum ``empty.csv`` expects empty
    strings); True restores Spark's default empty->null mapping."""
    if quote_handling == "literal":
        # QuoteHandling.Literal (reference csv/package.scala:104-123): quotes
        # are ordinary characters, fields end only at separators/newlines —
        # disable quote processing with an unused sentinel quote char
        quote = "\x00"
    elif quote_handling != "rfc":
        raise ValueError(f"unknown quote_handling: {quote_handling!r}")
    reader = (spark.read
              .option("header", str(header).lower())
              .option("sep", sep)
              .option("quote", quote)
              .option("escape", quote)          # RFC-4180 doubled quotes
              .option("multiLine", str(multiline).lower())
              # RFC-4180/fs2-data: whitespace is field content — Spark's
              # default trimming of unquoted edges breaks roundtrips
              .option("ignoreLeadingWhiteSpace", "false")
              .option("ignoreTrailingWhiteSpace", "false")
              .option("enforceSchema", "false"))
    if not empty_as_null:
        # a sentinel no real cell contains: only it maps to null
        reader = reader.option("nullValue", "\x00")
    if line_sep is not None:
        # explicit record separator; also stops the parser from normalizing
        # embedded CRLF inside quoted cells (csv-spectrum newlines_crlf.csv)
        reader = reader.option("lineSep", line_sep)
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


_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
_URI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:\S*$"
_DUR_RE = (r"^[+-]?P(?=.)((\d+)D)?(T(?=.)((\d+)H)?((\d+)M)?((\d+(\.\d{1,6})?)S)?)?$")
_MONTHDAY_RE = r"^--(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$"
_ZONE_RE = r"^([A-Za-z_]+(/[A-Za-z0-9_+-]+)+|UTC|GMT|Z|[+-]\d{2}:\d{2})$"
_MONTHS = ["JANUARY", "FEBRUARY", "MARCH", "APRIL", "MAY", "JUNE", "JULY",
           "AUGUST", "SEPTEMBER", "OCTOBER", "NOVEMBER", "DECEMBER"]
_DOW = ["MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY", "SATURDAY",
        "SUNDAY"]


def _enum_decoder(names: list[str]):
    def dec(c: F.Column) -> F.Column:
        out = F.lit(None).cast("int")
        for i, n in enumerate(names):
            out = F.when(F.upper(c) == n, F.lit(i + 1)).otherwise(out)
        return out
    return dec


def _duration_us(c: F.Column) -> F.Column:
    """ISO-8601 day-time duration -> microseconds (java.time.Duration
    analogue of CellDecoder.scala:219)."""
    def g(i: int) -> F.Column:
        x = F.regexp_extract(c, _DUR_RE, i)
        return F.when(x == "", F.lit(0.0)).otherwise(x.cast("double"))
    total = g(2) * 86_400 + g(5) * 3_600 + g(7) * 60 + g(9)
    sign = F.when(F.substring(c, 1, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
    return F.when(c.rlike(_DUR_RE), (sign * total * 1_000_000).cast("bigint"))


def _validated(regex: str, normalize=None):
    def dec(c: F.Column) -> F.Column:
        v = F.when(c.rlike(regex), c)
        return normalize(v) if normalize else v
    return dec


# CellDecoder analogues beyond plain Spark casts (reference
# ``csv/shared/src/main/scala/fs2/data/csv/CellDecoder.scala:161-257``):
# each maps the string cell to a typed/normalized value, null when invalid.
CELL_DECODERS: dict[str, object] = {
    "uuid": _validated(_UUID_RE, lambda c: F.lower(c)),
    "uri": _validated(_URI_RE),
    "duration_us": _duration_us,
    "year": lambda c: F.when(c.rlike(r"^[+-]?\d{1,9}$"), c.cast("int")),
    "yearmonth": _validated(r"^[+-]?\d{4,9}-(0[1-9]|1[0-2])$"),
    "monthday": _validated(_MONTHDAY_RE),
    "month": _enum_decoder(_MONTHS),
    "dayofweek": _enum_decoder(_DOW),
    "zoneid": _validated(_ZONE_RE),
    "char": lambda c: F.when(F.length(c) == 1, c),
    "bigdecimal": lambda c: c.try_cast("decimal(38,18)"),
}


def decode_cells(df: DataFrame, casts: dict[str, str], mode: str = "strict") -> DataFrame:
    """Typed per-cell decode (CellDecoder analogue): ``casts`` maps column ->
    type — either a Spark SQL type (``int``, ``timestamp``, ...) or one of
    the :data:`CELL_DECODERS` names (``uuid``, ``uri``, ``duration_us``,
    ``year``, ``yearmonth``, ``monthday``, ``month``, ``dayofweek``,
    ``zoneid``, ``char``, ``bigdecimal``).

    strict = a bad cell fails the job (fs2-data's fail-the-stream);
    attempt = null + ``<col>_ok`` flags (the ``attemptDecode`` Either)."""
    out = df
    for c, typ in casts.items():
        if typ in CELL_DECODERS:
            decoded = CELL_DECODERS[typ](F.col(c))
            if mode == "strict":
                decoded = F.when(
                    decoded.isNull() & F.col(c).isNotNull(),
                    F.raise_error(F.concat(F.lit(f"decode_cells[{typ}] {c}: "),
                                           F.col(c)))
                ).otherwise(decoded)
        else:
            decoded = F.col(c).cast(typ) if mode == "strict" else F.col(c).try_cast(typ)
        if mode == "attempt":
            out = out.withColumn(f"{c}_ok", decoded.isNotNull() | F.col(c).isNull())
        out = out.withColumn(c, decoded)
    return out


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",",
              escape_mode: str = "auto") -> None:
    """CSV render (fs2-data ``encodeWithGivenHeaders``/``RowWriter`` analogue,
    ``csv/package.scala:226-328``).

    ``escape_mode`` mirrors ``EscapeMode`` (``internals/RowWriter.scala:25-42``,
    matrix pinned by ``RowWriterTest.scala``):

    - ``auto``   — quote only fields containing separator/newline/quote,
      doubling embedded quotes (RFC-4180);
    - ``always`` — quote every field (still doubling embedded quotes);
    - ``never``  — write fields verbatim, never quoted — like the reference,
      a field containing the separator then produces a row with extra
      columns (the caller opted out of escaping).
    """
    if escape_mode == "never":
        # verbatim cells joined by the separator, written as raw text lines —
        # the univocity CSV writer cannot be told to never quote (a sentinel
        # quote char still gets emitted around separator-bearing cells), and
        # raw lines are exactly the reference's Never contract anyway
        cells = [F.coalesce(F.col(c).cast("string"), F.lit(""))
                 for c in df.columns]
        lines = df.select(F.concat_ws(sep, *cells).alias("value"))
        if header:
            # the header goes at the top of EVERY part file — the same
            # layout Spark's own CSV writer produces with header=true, so
            # reading the directory back with read_csv(header=True) is
            # correct per-partition (ADVICE r04: a single union'd header
            # row would make every other part file lose its first row)
            import pandas as pd  # noqa: PLC0415

            hdr = sep.join(df.columns)

            def with_header(batches):
                emitted = False
                for pdf in batches:
                    if not emitted:
                        yield pd.DataFrame({"value": [hdr]})
                        emitted = True
                    yield pdf
                if not emitted:
                    yield pd.DataFrame({"value": [hdr]})

            lines = lines.mapInPandas(with_header, "value string")
        lines.write.mode("overwrite").text(path)
        return
    if escape_mode not in ("auto", "always"):
        raise ValueError(f"unknown escape_mode: {escape_mode!r} "
                         "(use 'auto', 'always' or 'never')")
    (df.write.mode("overwrite")
     .option("header", str(header).lower())
     .option("sep", sep)
     .option("quote", '"')
     .option("escape", '"')   # RFC-4180 doubled quotes, matching read_csv
     .option("quoteAll", str(escape_mode == "always").lower())
     # the univocity WRITER also trims unquoted edges by default — keep
     # whitespace verbatim like the reference RowWriter
     .option("ignoreLeadingWhiteSpace", "false")
     .option("ignoreTrailingWhiteSpace", "false")
     .csv(path))

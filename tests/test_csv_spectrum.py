"""csv-spectrum conformance corpus (public fixtures maxogden/csv-spectrum,
shipped in the reference at ``csv/shared/src/test/resources/csv-spectrum/``)
run through read_csv/write_csv — the reference's harness pattern
(``CsvParserTest.scala:61-113``: parse each csvs/*.csv with headers, compare
string-cell maps against json/<name>.json, then encode+reparse roundtrip).

Plus CellDecoder-breadth vectors (``csv/CellDecoder.scala:161-257``)."""

import json
import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.sources.csvsrc import decode_cells, read_csv, write_csv

SPECTRUM = Path("/root/reference/csv/shared/src/test/resources/csv-spectrum")
FIXTURES = sorted(p.stem for p in (SPECTRUM / "csvs").glob("*.csv")) \
    if SPECTRUM.exists() else []

pytestmark = pytest.mark.skipif(not FIXTURES, reason="csv-spectrum corpus absent")


def _expected(name):
    return json.loads((SPECTRUM / "json" / f"{name}.json").read_text())


def _rows_as_maps(df):
    cols = df.columns
    return [{c: r[c] for c in cols} for r in df.collect()]


def _line_sep(name):
    return "\r\n" if name.endswith("_crlf") else None


@pytest.mark.parametrize("name", FIXTURES)
def test_spectrum_parse(spark, name):
    df = read_csv(spark, str(SPECTRUM / "csvs" / f"{name}.csv"),
                  header=True, multiline=True, line_sep=_line_sep(name))
    expected = _expected(name)
    got = _rows_as_maps(df)
    key = lambda m: json.dumps(m, sort_keys=True)  # noqa: E731
    assert sorted(got, key=key) == sorted(expected, key=key), name


@pytest.mark.parametrize("name", FIXTURES)
def test_spectrum_roundtrip(spark, name, tmp_path):
    src = read_csv(spark, str(SPECTRUM / "csvs" / f"{name}.csv"),
                   header=True, multiline=True, line_sep=_line_sep(name))
    out = str(tmp_path / name)
    write_csv(src, out)
    back = read_csv(spark, out, header=True, multiline=True,
                    schema=src.schema)
    key = lambda m: json.dumps(m, sort_keys=True)  # noqa: E731
    assert sorted(_rows_as_maps(back), key=key) == \
        sorted(_rows_as_maps(src), key=key), name


# ----------------------- CellDecoder breadth vectors ------------------------

DECODE_VECTORS = [
    # (type, raw, expected-or-None-for-invalid)
    ("uuid", "123E4567-E89B-42D3-A456-426614174000",
     "123e4567-e89b-42d3-a456-426614174000"),
    ("uuid", "not-a-uuid", None),
    ("uri", "https://example.com/x?q=1", "https://example.com/x?q=1"),
    ("uri", "mailto:a@b.c", "mailto:a@b.c"),
    ("uri", "no scheme here", None),
    ("duration_us", "PT1H", 3_600_000_000),
    ("duration_us", "PT2M3S", 123_000_000),
    ("duration_us", "P1DT1S", 86_401_000_000),
    ("duration_us", "-PT0.5S", -500_000),
    ("duration_us", "P", None),
    ("duration_us", "1 hour", None),
    ("year", "2024", 2024),
    ("year", "-0044", -44),
    ("year", "20x4", None),
    ("yearmonth", "2024-02", "2024-02"),
    ("yearmonth", "2024-13", None),
    ("monthday", "--02-29", "--02-29"),
    ("monthday", "--13-01", None),
    ("month", "February", 2),
    ("month", "smarch", None),
    ("dayofweek", "SUNDAY", 7),
    ("dayofweek", "funday", None),
    ("zoneid", "Europe/Paris", "Europe/Paris"),
    ("zoneid", "UTC", "UTC"),
    ("zoneid", "+02:00", "+02:00"),
    ("zoneid", "Nowhere", None),
    ("char", "x", "x"),
    ("char", "xy", None),
    ("bigdecimal", "1.50", None if False else "1.5"),
]


@pytest.mark.parametrize("typ,raw,expected", DECODE_VECTORS)
def test_cell_decoders(spark, typ, raw, expected):
    df = spark.createDataFrame([(raw,)], "v string")
    out = decode_cells(df, {"v": typ}, mode="attempt").first()
    if expected is None:
        assert out.v is None and not out.v_ok, (typ, raw, out.v)
    else:
        got = out.v
        if typ == "bigdecimal":
            got = str(got.normalize())
        assert got == expected and out.v_ok, (typ, raw)


def test_cell_decoder_strict_raises(spark):
    df = spark.createDataFrame([("nope",)], "v string")
    with pytest.raises(Exception):
        decode_cells(df, {"v": "uuid"}, mode="strict").collect()
    ok = spark.createDataFrame([("PT1S",)], "v string")
    assert decode_cells(ok, {"v": "duration_us"}, mode="strict").first().v == 1_000_000


# ---------------------------------------------------------------------------
# EscapeMode matrix (reference internals/RowWriter.scala:25-42, pinned by
# RowWriterTest.scala "escape according to the given escape mode")
# ---------------------------------------------------------------------------

def _written_cells(spark, tmp_path, mode: str) -> list[str]:
    """Write one row of the RowWriterTest fixture cells and return the raw
    encoded line's fields-as-written (split is inspectable because the
    marker cells are single characters)."""
    import glob
    df = spark.createDataFrame([(",", '"', "test")], "a string, b string, c string")
    out = str(tmp_path / f"esc_{mode}")
    write_csv(df.coalesce(1), out, header=False, escape_mode=mode)
    [part] = glob.glob(f"{out}/part-*")
    with open(part, newline="") as fh:
        return fh.read().rstrip("\n")


def test_escape_mode_auto(spark, tmp_path):
    # separator -> quoted; quote -> doubled+quoted; plain -> bare
    assert _written_cells(spark, tmp_path, "auto") == '",","""",test'


def test_escape_mode_always(spark, tmp_path):
    assert _written_cells(spark, tmp_path, "always") == '",","""","test"'


def test_escape_mode_never(spark, tmp_path):
    # verbatim: the separator cell bleeds an extra column, the quote cell
    # stays a lone quote — exactly the reference's Never contract
    assert _written_cells(spark, tmp_path, "never") == ',,",test'


@pytest.mark.parametrize("mode", ["auto", "always"])
def test_escape_mode_roundtrips(spark, tmp_path, mode):
    rows = [("a,b", 'say "hi"', "plain"), ("", ",", '""')]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    out = str(tmp_path / f"esc_rt_{mode}")
    write_csv(df, out, escape_mode=mode)
    back = read_csv(spark, out, header=True)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_escape_mode_never_multipartition_reread(spark, tmp_path):
    """ADVICE r04: never-mode with header=True must put the header at the
    top of EVERY part file (Spark's own CSV layout) — reading the directory
    back with header=true must not drop one row per partition."""
    rows = [(str(i), f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "a string, b string").repartition(7)
    out = str(tmp_path / "never_parts")
    write_csv(df, out, header=True, escape_mode="never")
    back = read_csv(spark, out, header=True)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # every non-empty part file leads with the header line
    import glob
    for part in glob.glob(f"{out}/part-*"):
        with open(part) as fh:
            first = fh.readline().rstrip("\n")
        if first:
            assert first == "a,b", part


def test_escape_mode_unknown_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="escape_mode"):
        write_csv(spark.range(1), str(tmp_path / "x"), escape_mode="huh")


def test_adversarial_roundtrip_sweep(spark, tmp_path):
    """Randomized cells (separators, quotes, newlines, unicode, empties)
    through write_csv(auto|always) -> read_csv must be the identity."""
    import random
    rng = random.Random(3)
    alphabet = ['a', 'b', ',', '"', '""', "\n", "'", "ß", "é", " ", "x,y",
                'pre"post', ""]

    def cell():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 4)))

    rows = [(str(i), cell(), cell()) for i in range(120)]
    df = spark.createDataFrame(rows, "id string, c1 string, c2 string")
    for mode in ("auto", "always"):
        out = str(tmp_path / f"sweep_{mode}")
        write_csv(df, out, escape_mode=mode)
        back = read_csv(spark, out, header=True, multiline=True)
        assert sorted(map(tuple, back.collect())) == sorted(rows), mode

"""Format sources: strict (fail-the-stream) vs attempt (per-record Either)
error-mode parity with fs2-data (reference ``csv/package.scala:482-565``,
``json/package.scala:31-37``)."""

import pytest
from py4j.protocol import Py4JJavaError

from fs2_data_spark.sources.csvsrc import decode_cells, read_csv, write_csv
from fs2_data_spark.sources.jsonl import parse_json_col, read_jsonl


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "data.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "v": 1.5}\n'
        '{"id": 2, "name": "b", "v": 2.5}\n'
        'THIS IS NOT JSON\n'
        '{"id": 4, "name": "d", "v": 4.5}\n'
    )
    return str(p)


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "data.csv"
    # row 3 has wrong arity; quoted field with embedded separator + RFC quote
    p.write_text(
        'id,name,v\n'
        '1,"alpha, beta",1.5\n'
        '2,"say ""hi""",2.5\n'
        '3,onlytwo\n'
        '4,delta,4.5\n'
    )
    return str(p)


def test_jsonl_attempt_side_channel(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file, "id bigint, name string, v double", mode="attempt")
    rows = df.collect()
    assert len(rows) == 4
    bad = [r for r in rows if not r.ok]
    assert len(bad) == 1 and bad[0].error_record == "THIS IS NOT JSON"
    good = sorted(r.id for r in rows if r.ok)
    assert good == [1, 2, 4]


def test_jsonl_strict_fails(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file, "id bigint, name string, v double", mode="strict")
    with pytest.raises(Py4JJavaError):
        df.collect()


def test_csv_attempt_and_quotes(spark, csv_file):
    df = read_csv(spark, csv_file, schema="id bigint, name string, v double",
                  header=True, mode="attempt")
    rows = {r.id: r for r in df.collect() if r.ok}
    assert rows[1].name == "alpha, beta"     # RFC-4180 quoted separator
    assert rows[2].name == 'say "hi"'        # doubled-quote escape
    bad = [r for r in df.collect() if not r.ok]
    assert len(bad) == 1 and bad[0].error_record.startswith("3,onlytwo")


def test_csv_decode_cells_attempt(spark):
    df = spark.createDataFrame([("1", "x"), ("nope", "y")], "n string, s string")
    out = decode_cells(df, {"n": "int"}, mode="attempt")
    rows = {r.s: r for r in out.collect()}
    assert rows["x"].n == 1 and rows["x"].n_ok
    assert rows["y"].n is None and not rows["y"].n_ok


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a,b"), (2, 'q"q')], "id bigint, s string")
    out = str(tmp_path / "rt")
    write_csv(df, out)
    back = read_csv(spark, out, schema="id bigint, s string", header=True)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parse_json_col_on_events(spark, events):
    out = parse_json_col(events.limit(50), "props", "k int", mode="attempt")
    rows = out.collect()
    assert all(r.ok for r in rows)
    assert all(r.props_parsed.k is not None for r in rows)

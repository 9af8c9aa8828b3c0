"""Format coverage: CBOR/MessagePack codecs (RFC 8949 Appendix-A-style
vectors + Hypothesis roundtrip laws, the reference's test strategy:
``cbor/shared/src/test/scala/fs2/data/cbor/ParserSpec.scala:36-56``,
``RoundtripTest.scala``), XML event parsing, JSON path selection."""

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fs2_data_spark.functions.jsonpath import (
    iterate_array, render_json, select_path, unwrap_array, wrap_as_array,
)
from fs2_data_spark.sources.binary_codecs import (
    cbor_decode, cbor_encode, msgpack_decode, msgpack_encode,
    transcode_cbor_to_json, transcode_msgpack_to_json,
)
from fs2_data_spark.sources.xmlsrc import xml_events, xml_texts_at

# RFC 8949 Appendix A vectors (hex -> expected decoded value)
CBOR_VECTORS = [
    ("00", 0), ("01", 1), ("0a", 10), ("17", 23), ("1818", 24),
    ("1903e8", 1000), ("1a000f4240", 1000000),
    ("20", -1), ("29", -10), ("3863", -100),
    ("f4", False), ("f5", True), ("f6", None),
    ("63666f6f", "foo"), ("60", ""),
    ("83010203", [1, 2, 3]),
    ("8301820203820405", [1, [2, 3], [4, 5]]),
    ("a201020304", {1: 2, 3: 4}),
    ("f90000", 0.0), ("fa47c35000", 100000.0), ("fb3ff199999999999a", 1.1),
    ("4401020304", b"\x01\x02\x03\x04"),
    ("9f010203ff", [1, 2, 3]),                       # indefinite array
    ("7f657374726561646d696e67ff", "streaming"),     # indefinite text
]


@pytest.mark.parametrize("hexstr,expected", CBOR_VECTORS)
def test_cbor_appendix_vectors(hexstr, expected):
    assert cbor_decode(bytes.fromhex(hexstr)) == expected


MSGPACK_VECTORS = [
    (b"\x00", 0), (b"\x7f", 127), (b"\xcc\x80", 128), (b"\xcd\x01\x00", 256),
    (b"\xe0", -32), (b"\xff", -1), (b"\xd0\x81", -127),
    (b"\xc0", None), (b"\xc2", False), (b"\xc3", True),
    (b"\xa3foo", "foo"), (b"\x93\x01\x02\x03", [1, 2, 3]),
    (b"\x81\xa1a\x01", {"a": 1}),
    (b"\xc4\x03\x01\x02\x03", b"\x01\x02\x03"),
]


@pytest.mark.parametrize("raw,expected", MSGPACK_VECTORS)
def test_msgpack_vectors(raw, expected):
    assert msgpack_decode(raw) == expected


_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(min_value=-2**63, max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=40),
    st.binary(max_size=40),
)
_values = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=8), children, max_size=6)),
    max_leaves=20,
)


@settings(max_examples=200, deadline=None)
@given(_values)
def test_cbor_roundtrip_law(v):
    assert cbor_decode(cbor_encode(v)) == v


@settings(max_examples=200, deadline=None)
@given(_values)
def test_msgpack_roundtrip_law(v):
    v2 = msgpack_decode(msgpack_encode(v))
    assert v2 == v


def test_transcode_cbor_spark(spark):
    rows = [(1, cbor_encode({"a": [1, 2], "b": "x"})), (2, b"\xff\xff")]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    out = {r.id: r for r in transcode_cbor_to_json(df, mode="attempt").collect()}
    assert json.loads(out[1].json) == {"a": [1, 2], "b": "x"} and out[1].ok
    assert not out[2].ok
    with pytest.raises(Exception):
        transcode_cbor_to_json(df, mode="strict").collect()


def test_transcode_msgpack_spark(spark):
    rows = [(1, msgpack_encode([1, "two", None, {"k": 3.5}]))]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    out = transcode_msgpack_to_json(df).first()
    assert json.loads(out.json) == [1, "two", None, {"k": 3.5}] and out.ok


XML_DOC = """<root a="1"><item id="x">hello</item><item id="y">world</item>
<nested><item id="z">deep</item></nested></root>"""


def test_xml_events_order_and_depth(spark):
    df = spark.createDataFrame([("d1", XML_DOC)], "doc_key string, xml string")
    ev = xml_events(df).orderBy("event_no").collect()
    assert [e.event for e in ev[:3]] == ["StartTag", "StartTag", "XmlString"]
    assert ev[0].name == "root" and ev[0].attrs == {"a": "1"} and ev[0].depth == 0
    assert ev[1].name == "item" and ev[1].depth == 1
    assert ev[2].text == "hello" and ev[2].depth == 2
    # balanced tags
    starts = sum(1 for e in ev if e.event == "StartTag")
    ends = sum(1 for e in ev if e.event == "EndTag")
    assert starts == ends == 5


def test_xml_malformed_modes(spark):
    df = spark.createDataFrame([("bad", "<a><b></a>")], "doc_key string, xml string")
    rows = xml_events(df, mode="attempt").collect()
    assert len(rows) == 1 and not rows[0].ok and rows[0].error
    with pytest.raises(Exception):
        xml_events(df, mode="strict").collect()


def test_xml_texts_at(spark):
    df = spark.createDataFrame([("d1", XML_DOC)], "doc_key string, xml string")
    vals = [r.value for r in xml_texts_at(df, "xml", "item").orderBy("event_no").collect()]
    assert vals == ["hello", "world", "deep"]


def test_select_path_and_iterate(spark):
    df = spark.createDataFrame(
        [(1, '{"a": {"b": [10, 20, 30]}, "c": "x"}'), (2, '{"c": "y"}')],
        "id bigint, js string")
    got = {r.id: (r.b0, r.c) for r in df.select(
        "id", select_path("js", "$.a.b[0]").alias("b0"),
        select_path("js", "$.c").alias("c")).collect()}
    assert got[1] == ("10", "x")
    assert got[2] == (None, "y")    # missing path -> null (lenient selector)


def test_wrap_unwrap_roundtrip(spark):
    df = spark.createDataFrame(
        [("d", 0, "x"), ("d", 1, "y"), ("e", 0, "z")],
        "doc string, pos int, v string")
    wrapped = wrap_as_array(df, ["doc"], "v", order_col="pos")
    got = {r.doc: r.vs for r in wrapped.collect()}
    assert got == {"d": ["x", "y"], "e": ["z"]}
    back = unwrap_array(wrapped, "vs")
    assert back.count() == 3
    rendered = render_json(wrapped).first()
    assert '"vs"' in rendered.json

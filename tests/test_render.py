"""Streaming pretty-printer: golden outputs pinned from the reference's
RenderSpec.scala (JSON) and XmlRenderTest.scala (XML), plus layout-engine
unit laws and roundtrip properties."""

import json

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.functions.render import (
    ALIGN_BEGIN,
    ALIGN_END,
    BREAK,
    GROUP_BEGIN,
    GROUP_END,
    INDENT_BEGIN,
    INDENT_END,
    LINE,
    json_doc_events,
    layout,
    pretty_json,
    pretty_json_text,
    pretty_xml,
    pretty_xml_text,
    text,
    words,
)

SRC = '{"field1": "test", "field2": [23, [true, null]]}'


# --- RenderSpec.scala goldens ----------------------------------------------

def test_json_pretty_width_10():
    assert pretty_json_text(SRC, width=10) == (
        '{\n  "field1": "test",\n  "field2": [\n    23,\n    [\n'
        '      true,\n      null\n    ]\n  ]\n}')


def test_json_pretty_width_32():
    assert pretty_json_text(SRC, width=32) == (
        '{\n  "field1": "test",\n  "field2": [23, [true, null]]\n}')


def test_json_pretty_width_80_single_line():
    assert pretty_json_text(SRC, width=80) == SRC


def test_json_renderer_escapes():
    # RenderSpec "a Renderer should properly escape what needs to be escaped"
    got = layout(json_doc_events(
        [("StringValue", 'some\ncharacters must\\be"escaped" like ß', 0)]))
    assert got == '"some\\ncharacters must\\\\be\\"escaped\\" like \\u00df"'


@pytest.mark.parametrize("width", [0, 10, 32, 80])
def test_json_pretty_reparses_to_same_value(width):
    # RenderSpec roundtrip: parse(pretty(x)) == parse(x), any width
    assert json.loads(pretty_json_text(SRC, width=width)) == json.loads(SRC)


def test_json_pretty_preserves_number_lexemes():
    src = '{"a": 1.00, "b": 1e2, "c": -0.0}'
    out = pretty_json_text(src, width=100)
    assert out == '{"a": 1.00, "b": 1e2, "c": -0.0}'


# --- XmlRenderTest.scala goldens -------------------------------------------

def test_xml_pretty_self_closing_width_0():
    got = pretty_xml_text(
        '<?xml version="1.0" encoding="utf-8"?><doc><no-content/></doc>',
        width=0)
    assert got == ('<?xml version="1.0"\n      encoding="utf-8"?>\n'
                   '<doc>\n  <no-content />\n</doc>')


def test_xml_pretty_attributes_fit_width_40():
    got = pretty_xml_text(
        '<?xml version="1.0" encoding="utf-8"?>'
        '<doc a1="value1" a2="value2"><no-content/></doc>', width=40)
    assert got == ('<?xml version="1.0" encoding="utf-8"?>\n'
                   '<doc a1="value1" a2="value2">\n  <no-content />\n</doc>')


def test_xml_pretty_attributes_break_width_0():
    got = pretty_xml_text(
        '<?xml version="1.0" encoding="utf-8"?>'
        '<doc a1="value1" a2="value2" a3="value3" a4="value4">'
        "<no-content/></doc>", width=0)
    assert got == ('<?xml version="1.0"\n      encoding="utf-8"?>\n'
                   '<doc a1="value1"\n     a2="value2"\n     a3="value3"\n'
                   '     a4="value4">\n  <no-content />\n</doc>')


def test_xml_pretty_text_reflow_width_20():
    got = pretty_xml_text(
        '<?xml version="1.0" encoding="utf-8"?><doc>This is a test.\n'
        "The text is not originally formatted.</doc>", width=20)
    assert got == ('<?xml version="1.0"\n      encoding="utf-8"?>\n'
                   '<doc>\n  This is a test. The text\n'
                   "  is not originally formatted.\n</doc>")


def test_xml_pretty_cdata_verbatim():
    # XmlRenderTest "renders CDATA as-is": no reflow inside the section
    got = pretty_xml_text(
        "<doc><![CDATA[This is a test.\nNot  reformatted.]]></doc>", width=0)
    assert "<![CDATA[This is a test.\nNot  reformatted.]]>" in got


def test_xml_pretty_entities_reescaped():
    # parsed character data re-escapes markup characters on render
    got = pretty_xml_text("<doc>fish &amp; chips &lt;cheap&gt;</doc>",
                          width=100)
    assert got == "<doc>fish &amp; chips &lt;cheap&gt;</doc>"


# --- layout engine unit laws -----------------------------------------------

def test_layout_line_flattens_inside_fitting_group():
    evs = [GROUP_BEGIN, text("a"), LINE, text("b"), GROUP_END]
    assert layout(evs, width=10) == "a b"
    assert layout(evs, width=1) == "a\nb"


def test_layout_break_is_empty_when_flat():
    evs = [GROUP_BEGIN, text("a"), BREAK, text("b"), GROUP_END]
    assert layout(evs, width=10) == "ab"
    assert layout(evs, width=0) == "a\nb"


def test_layout_indent_prefixes_new_lines():
    evs = [text("x"), INDENT_BEGIN, BREAK, text("y"), INDENT_END, BREAK,
           text("z")]
    assert layout(evs, width=0, indent_size=2) == "x\n  y\nz"


def test_layout_align_pins_column():
    evs = [text("ab"), ALIGN_BEGIN, text("c"), LINE, text("d"), ALIGN_END]
    assert layout(evs, width=0) == "abc\n  d"


def test_layout_nested_group_inside_flat_parent_stays_flat():
    evs = [GROUP_BEGIN, text("a"), GROUP_BEGIN, LINE, GROUP_END, text("b"),
           GROUP_END]
    assert layout(evs, width=100) == "a b"


def test_words_preserves_blank_lines():
    # a blank input line is a hard break even at wide widths (softlines
    # around it still collapse to spaces)
    assert layout(words("one two\n\nthree"), width=100) == "one two \n three"


# --- DataFrame operators ----------------------------------------------------

def test_pretty_json_operator(spark):
    df = spark.createDataFrame([(1, SRC), (2, '{"x": [1, 2]}')],
                               "doc_id bigint, js string")
    out = {r.doc_id: r.pretty
           for r in pretty_json(df, "js", width=32).collect()}
    assert out[1] == pretty_json_text(SRC, width=32)
    assert json.loads(out[2]) == {"x": [1, 2]}


def test_pretty_json_operator_attempt_mode(spark):
    df = spark.createDataFrame([(1, SRC), (2, "{broken")],
                               "doc_id bigint, js string")
    rows = {r.doc_id: r for r in
            pretty_json(df, "js", width=32, mode="attempt").collect()}
    assert rows[1].ok and rows[2].pretty is None and not rows[2].ok


def test_pretty_xml_operator(spark):
    df = spark.createDataFrame(
        [(1, "<doc><a k='1'>hi</a></doc>")], "doc_id bigint, xml string")
    out = pretty_xml(df, "xml", width=0).collect()[0].pretty
    assert out == '<doc>\n  <a k="1">\n    hi\n  </a>\n</doc>'


def test_xml_pretty_structural_roundtrip_sweep():
    """Random trees x widths: the pretty output must re-parse to the same
    element structure, attributes, and whitespace-normalized text (layout
    may only move whitespace)."""
    import random
    import xml.etree.ElementTree as ET

    rng = random.Random(7)

    def gen(depth):
        tag = rng.choice("abcde")
        attrs = "".join(f' k{i}="v{rng.randint(0, 9)}&quot;x"'
                        for i in range(rng.randint(0, 3)))
        if depth >= 3 or rng.random() < 0.3:
            body = rng.choice(["", "some text here", "x &amp; y"])
        else:
            body = "".join(gen(depth + 1) for _ in range(rng.randint(1, 3)))
        return f"<{tag}{attrs}>{body}</{tag}>"

    def shape(e):
        # per-element direct text, whitespace-normalized; tails are layout
        # whitespace (the generator never produces mixed content)
        return (e.tag, dict(e.attrib), " ".join((e.text or "").split()),
                [shape(c) for c in e])

    for trial in range(40):
        src = gen(0)
        for width in (0, 20, 200):
            out = pretty_xml_text(src, width=width)
            assert shape(ET.fromstring(out)) == shape(ET.fromstring(src)), \
                (trial, width, src, out)

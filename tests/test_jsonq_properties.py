"""Hypothesis property laws for the JSONPath/jq/merge-patch/transform engines
— the reference's property-test layer (SURVEY §5: parser laws under random
inputs, e.g. ``json/src/test/scala/fs2/data/json/JsonParserTest.scala``
re-chunked runs). Pure value-level: no Spark session needed."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from fs2_data_spark.functions.jsonq import (
    _render,
    eval_jq,
    eval_jsonpath,
    json_loads_strict,
    merge_patch,
    parse_jq,
    parse_jsonpath,
    transform_at,
)

_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(min_value=-2**53, max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=20))
_json = st.recursive(
    _scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=5),
        st.dictionaries(st.text(max_size=8), kids, max_size=5)),
    max_leaves=25)
_objs = st.dictionaries(
    st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True), _json, max_size=5)


@settings(max_examples=200, deadline=None)
@given(_json)
def test_render_parse_roundtrip(v):
    assert json_loads_strict(_render(v)) == v


@settings(max_examples=200, deadline=None)
@given(_json)
def test_jq_identity_law(v):
    assert eval_jq(v, parse_jq(".")) == [v]


@settings(max_examples=200, deadline=None)
@given(st.lists(_json, max_size=6))
def test_jq_array_of_iterator_is_identity_on_lists(v):
    # [ .[] ] rebuilds exactly the input list
    assert eval_jq(v, parse_jq("[ .[] ]")) == [v]


def _count_nodes(v):
    n = 1
    if isinstance(v, dict):
        n += sum(_count_nodes(x) for x in v.values())
    elif isinstance(v, list):
        n += sum(_count_nodes(x) for x in v)
    return n


@settings(max_examples=200, deadline=None)
@given(_json)
def test_jq_descent_visits_every_node(v):
    assert len(eval_jq(v, parse_jq(".."))) == _count_nodes(v)


def _collect_key(v, key):
    out = []
    if isinstance(v, dict):
        for k, x in v.items():
            if k == key:
                out.append(x)
            out.extend(_collect_key(x, key))
    elif isinstance(v, list):
        for x in v:
            out.extend(_collect_key(x, key))
    return out


@settings(max_examples=200, deadline=None)
@given(_objs)
def test_jsonpath_descendant_matches_bruteforce(v):
    got = eval_jsonpath(v, parse_jsonpath("$..a"))
    want = _collect_key(v, "a")
    assert sorted(map(_render, got)) == sorted(map(_render, want))


@settings(max_examples=200, deadline=None)
@given(_objs)
def test_jsonpath_child_wildcard_is_values(v):
    assert eval_jsonpath(v, parse_jsonpath("$.*")) == list(v.values())


@settings(max_examples=200, deadline=None)
@given(_json)
def test_transform_identity_law(v):
    assert transform_at(v, "$..a", lambda x: x) == v
    assert transform_at(v, "$[*]", lambda x: x) == v


@settings(max_examples=200, deadline=None)
@given(_objs, _objs)
def test_merge_patch_laws(t, p):
    out = merge_patch(t, p)
    # RFC 7396: patched keys present with non-null patch values; null deletes
    for k, pv in p.items():
        if pv is None:
            assert k not in out
        elif not isinstance(pv, dict):
            assert out[k] == pv
    # keys untouched by the patch survive unchanged
    for k, tv in t.items():
        if k not in p:
            assert out[k] == tv
    # idempotence: applying the same patch twice is a no-op
    assert merge_patch(out, p) == out


@settings(max_examples=150, deadline=None)
@given(_json)
def test_jq_construct_wraps_value(v):
    out = eval_jq(v, parse_jq('{ "v": . }'))
    assert out == [{"v": v}]


@settings(max_examples=200, deadline=None)
@given(_json, st.sampled_from([0, 8, 40, 100]))
def test_pretty_print_roundtrip_law(v, width):
    """Pretty-printing at ANY width is semantics-preserving: re-parsing the
    laid-out text yields the same value (the RenderSpec roundtrip law)."""
    from fs2_data_spark.functions.render import json_doc_events, layout
    from fs2_data_spark.functions.jsonq import value_tokens
    out = layout(json_doc_events(value_tokens(v)), width=width)
    assert json.loads(out) == v


@settings(max_examples=100, deadline=None)
@given(_json)
def test_pretty_print_wide_equals_compact_with_spaces(v):
    """At effectively infinite width the pretty layout is the compact
    rendering with ', '/': ' separators (everything stays flat)."""
    from fs2_data_spark.functions.render import json_doc_events, layout
    from fs2_data_spark.functions.jsonq import value_tokens
    out = layout(json_doc_events(value_tokens(v)), width=10**9)
    assert json.loads(out) == v
    assert "\n" not in out

"""XPath filtering over XML string columns — the reference query language
surface (``xml/src/main/scala/fs2/data/xml/xpath/XPath.scala:29-115``):

- axes ``/`` (child) and ``//`` (descendant), node name or ``*``
- attribute predicates ``[@a]``, ``[@a == "v"]``, ``[@a != "v"]`` (presence
  required for both comparisons, pinned by ``QueryPipeSpec.scala``
  "attribute neq query"), combined with ``&&`` / ``||`` / ``!`` / parens
- path alternation ``p1|p2|...``

The reference compiles the query to a tree automaton over the event stream
(``internals/LocationMatch.scala:29-99``); here each document row is matched
by walking its open-element stack inside the same Arrow-batched parse kernel
that produces ``xml_events`` — matching costs O(chain x locations) per
element, no shuffle, embarrassingly parallel across rows. Matches may nest
and overlap, exactly like ``filter.unsafeRaw``; each match row carries the
serialized subtree (the DataFrame analogue of the reference's per-match raw
token sub-stream).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# parse
# ---------------------------------------------------------------------------

_NAME = r"[A-Za-z_][\w.-]*(?::[A-Za-z_][\w.-]*)?"


@dataclass(frozen=True)
class _Step:
    descendant: bool
    name: str | None           # None = '*'
    pred: tuple | None         # predicate AST


class _XPathParser:
    def __init__(self, src: str):
        self.src, self.pos = src, 0

    def _ws(self):
        while self.pos < len(self.src) and self.src[self.pos].isspace():
            self.pos += 1

    def _match(self, pat: str):
        self._ws()
        m = re.compile(pat).match(self.src, self.pos)
        if m:
            self.pos = m.end()
        return m

    def _expect(self, pat: str, what: str):
        m = self._match(pat)
        if not m:
            raise ValueError(f"expected {what} at {self.pos}: {self.src!r}")
        return m

    def parse(self) -> list[list[_Step]]:
        branches = [self.path()]
        while self._match(r"\|"):
            branches.append(self.path())
        self._ws()
        if self.pos != len(self.src):
            raise ValueError(f"trailing input at {self.pos}: {self.src!r}")
        return branches

    def path(self) -> list[_Step]:
        steps = []
        while True:
            self._ws()
            if self.src.startswith("//", self.pos):
                self.pos += 2
                desc = True
            elif self.src.startswith("/", self.pos):
                self.pos += 1
                desc = False
            else:
                if not steps:
                    raise ValueError(f"path must start with / or //: {self.src!r}")
                return steps
            if self._match(r"\*"):
                name = None
            else:
                name = self._expect(_NAME, "node name").group(0)
            pred = None
            if self._match(r"\["):
                pred = self.or_expr()
                self._expect(r"\]", "]")
            steps.append(_Step(desc, name, pred))

    def or_expr(self):
        left = self.and_expr()
        while self._match(r"\|\|"):
            left = ("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.unary()
        while self._match(r"&&"):
            left = ("and", left, self.unary())
        return left

    def unary(self):
        if self._match(r"!"):
            return ("not", self.unary())
        if self._match(r"\("):
            e = self.or_expr()
            self._expect(r"\)", ")")
            return e
        if self._match(r"true\b"):
            return ("true",)
        if self._match(r"false\b"):
            return ("false",)
        m = self._expect(r"@(" + _NAME + r")", "@attribute")
        attr = m.group(1)
        if self._match(r"=="):
            return ("eq", attr, self.string())
        if self._match(r"!="):
            return ("neq", attr, self.string())
        return ("exists", attr)

    def string(self) -> str:
        m = self._expect(r'"((?:[^"\\]|\\.)*)"', "string literal")
        return m.group(1).replace('\\"', '"').replace("\\\\", "\\")


def parse_xpath(src: str) -> list[list[_Step]]:
    return _XPathParser(src).parse()


# ---------------------------------------------------------------------------
# match
# ---------------------------------------------------------------------------

def _eval_pred(pred: tuple, attrs: dict) -> bool:
    k = pred[0]
    if k == "true":
        return True
    if k == "false":
        return False
    if k == "exists":
        return pred[1] in attrs
    if k == "eq":
        return attrs.get(pred[1]) == pred[2]
    if k == "neq":
        # presence required (QueryPipeSpec "attribute neq query")
        return pred[1] in attrs and attrs[pred[1]] != pred[2]
    if k == "and":
        return _eval_pred(pred[1], attrs) and _eval_pred(pred[2], attrs)
    if k == "or":
        return _eval_pred(pred[1], attrs) or _eval_pred(pred[2], attrs)
    if k == "not":
        return not _eval_pred(pred[1], attrs)
    raise ValueError(f"unknown predicate {pred!r}")


def _step_matches(step: _Step, name: str, attrs: dict) -> bool:
    if step.name is not None and step.name != name:
        return False
    return step.pred is None or _eval_pred(step.pred, attrs)


def match_chain(branches: list[list[_Step]], chain: list[tuple[str, dict]]) -> bool:
    """Does the ancestor-or-self chain (root..current) end on a full match of
    any branch? Child steps consume the next element; descendant steps may
    skip; the last step must consume the final element."""
    def rec(steps: list[_Step], si: int, ci: int) -> bool:
        if si == len(steps):
            return ci == len(chain)
        step = steps[si]
        if step.descendant:
            for p in range(ci, len(chain)):
                if _step_matches(step, *chain[p]) and rec(steps, si + 1, p + 1):
                    return True
            return False
        if ci < len(chain) and _step_matches(step, *chain[ci]):
            return rec(steps, si + 1, ci + 1)
        return False

    return any(rec(b, 0, 0) for b in branches)


# ---------------------------------------------------------------------------
# DataFrame operator
# ---------------------------------------------------------------------------

_OUT_SCHEMA = ("doc_key string, match_no int, event_no int, name string, "
               "attrs map<string,string>, inner_text string, xml string")


def xpath_filter(df: DataFrame, xml_col: str, xpath: str,
                 key_col: str = "doc_key", mode: str = "strict") -> DataFrame:
    """All elements matching ``xpath`` — one row per match (matches may nest,
    like the reference's ``filter.unsafeRaw``), with the element's attrs, the
    concatenated text of its subtree, and the serialized subtree XML.

    Names match *as written* — a prefixed element ``<ns:item>`` matches the
    step ``ns:item``, never its expanded URI — because the reference's
    automaton compares literal ``QName(prefix, local)`` pairs with no URI
    resolution (``xml/src/main/scala/fs2/data/xml/xpath/XPath.scala:29-40``).
    The parser is stdlib expat with namespace processing OFF (r5: previously
    ElementTree, which force-expands tags to Clark ``{uri}local`` notation and
    silently failed every prefixed query); ``xmlns``/``xmlns:p`` declarations
    stay visible as ordinary attributes, exactly like the reference's raw
    event model (``Attr(QName("xmlns", ...))``)."""
    from xml.parsers import expat  # noqa: PLC0415
    from xml.sax.saxutils import escape, quoteattr  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    branches = parse_xpath(xpath)
    strict = mode == "strict"

    def render_start(name, attrs):
        parts = [f"<{name}"]
        parts.extend(f" {k}={quoteattr(v)}" for k, v in attrs.items())
        parts.append(">")
        return "".join(parts)

    def parse_one(key, xml):
        rows = []          # (key, match_no, event_no, name, attrs, text, xml)
        chain: list[tuple[str, dict]] = []
        # active captures: [depth_at_start, row_index, xml_parts, text_parts]
        active: list[list] = []
        state = {"n": 0, "pending": []}

        def flush_text():
            # character data belongs to the event stream at the next
            # structural boundary — same segmentation as one text/tail slot
            t = "".join(state["pending"])
            state["pending"].clear()
            if t.strip() and chain:
                s = t.strip()
                for cap in active:
                    cap[2].append(escape(s))
                    cap[3].append(s)
                state["n"] += 1

        def on_start(name, attr_items):
            flush_text()
            attrs = dict(attr_items)
            chain.append((name, attrs))
            if match_chain(branches, chain):
                rows.append([key, len(rows), state["n"], name, attrs, [], []])
                active.append([len(chain), rows[-1], [], []])
            for cap in active:
                cap[2].append(render_start(name, attrs))
            state["n"] += 1

        def on_end(name):
            nonlocal active
            flush_text()
            for cap in active:
                cap[2].append(f"</{name}>")
            done = [c for c in active if c[0] == len(chain)]
            for cap in done:
                cap[1][5] = " ".join(cap[3])
                cap[1][6] = "".join(cap[2])
            active = [c for c in active if c[0] != len(chain)]
            chain.pop()
            state["n"] += 1

        p = expat.ParserCreate()          # namespace processing OFF
        p.buffer_text = True
        p.StartElementHandler = on_start
        p.EndElementHandler = on_end
        p.CharacterDataHandler = state["pending"].append
        p.Parse(xml, True)
        return [tuple(r) for r in rows]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xml.parsers.expat import ExpatError  # noqa: PLC0415
        cols = ["doc_key", "match_no", "event_no", "name", "attrs",
                "inner_text", "xml"]
        for pdf in batches:
            out = []
            for key, xml in zip(pdf[key_col], pdf[xml_col]):
                try:
                    out.extend(parse_one(str(key), xml))
                except ExpatError:
                    if strict:
                        raise
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(kernel, _OUT_SCHEMA)


# ---------------------------------------------------------------------------
# JVM fast path (VERDICT r03 item #4)
# ---------------------------------------------------------------------------
# Simple absolute child-axis queries — the common case of the reference's
# XPath surface (``xml/src/main/scala/fs2/data/xml/xpath/package.scala:
# 54-133``) — compile to pure Catalyst: ``from_xml`` with a minimal schema
# derived from the path (only the stepped-through elements and the
# predicate-referenced attributes are parsed) plus higher-order array ops
# (filter/transform/flatten/posexplode).  Measured at 500k docs x ~230 B on
# local[8]: 814k docs/s vs 130k docs/s for the Python automaton tier (6.3x).
# Spark's Hive ``xpath()`` UDF was prototyped first and REJECTED: its
# per-row DOM build ran at 100k docs/s — 0.8x the Python tier, slower than
# what it was meant to replace.
# Guarded: descendant axes, alternation and wildcards fall back to
# :func:`xpath_filter`, whose automaton semantics have no from_xml
# counterpart in exactly those classes.  Prefixed (namespace) names are
# fast-path-eligible since r5 — both tiers match the literal as-written
# QName, like the reference.


def _pred_attrs(pred: tuple | None, out: set) -> None:
    if pred is None:
        return
    k = pred[0]
    if k in ("exists", "eq", "neq"):
        out.add(pred[1])
    elif k in ("and", "or"):
        _pred_attrs(pred[1], out)
        _pred_attrs(pred[2], out)
    elif k == "not":
        _pred_attrs(pred[1], out)


def compile_xpath_fast(xpath: str) -> list[_Step] | None:
    """Return the parsed step chain when ``xpath`` is eligible for the
    Catalyst ``from_xml`` fast path, else None (Python automaton tier).

    Eligible: one branch, child axes only, literal names — including
    ``ns:``-prefixed ones (r5: ``from_xml`` names struct fields by the
    *as-written* tag, so a backtick-quoted ```ns:item``` field matches a
    prefixed element literally — the same no-URI-resolution QName semantics
    the automaton tier and the reference use), any attribute predicate
    algebra (compiled to boolean Columns, so string values are
    unrestricted).  Ineligible (and why): descendant ``//`` and alternation
    ``|`` (match sets span nesting levels the fixed from_xml schema cannot
    name), ``*`` wildcards (schema fields need names)."""
    branches = parse_xpath(xpath)
    if len(branches) != 1:
        return None
    steps = branches[0]
    for step in steps:
        if step.descendant or step.name is None:
            return None
    return steps


def _fast_schema(steps: list[_Step]) -> str:
    """from_xml field-list DDL for the root element's content: only the
    path's elements and predicate attributes — everything else is skipped
    by the StAX parser (the schema IS the projection pushdown)."""
    inner_ddl = None
    for i in range(len(steps) - 1, 0, -1):
        attrs: set = set()
        _pred_attrs(steps[i].pred, attrs)
        fields = [f"`_{a}` string" for a in sorted(attrs)]
        if inner_ddl is None:
            fields.append("`_VALUE` string")
        else:
            fields.append(inner_ddl)
        inner_ddl = (f"`{steps[i].name}` array<struct<{', '.join(fields)}>>")
    root_attrs: set = set()
    _pred_attrs(steps[0].pred, root_attrs)
    root_fields = [f"`_{a}` string" for a in sorted(root_attrs)]
    if inner_ddl is None:
        root_fields.append("`_VALUE` string")
    else:
        root_fields.append(inner_ddl)
    return ", ".join(root_fields)


def _pred_column(pred: tuple, get):
    """Predicate AST -> total (never-null) boolean Column; ``get`` maps an
    attribute name to its (nullable) string Column.  Comparisons coalesce
    null (= attribute absent) to false so ``!``/``||`` keep the automaton's
    two-valued semantics — XPath 1.0 null-propagation would silently drop
    ``[!(@a == "v")]`` matches on attribute-less elements."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    k = pred[0]
    if k == "true":
        return F.lit(True)
    if k == "false":
        return F.lit(False)
    if k == "exists":
        return get(pred[1]).isNotNull()
    if k == "eq":
        return F.coalesce(get(pred[1]) == F.lit(pred[2]), F.lit(False))
    if k == "neq":
        # presence required (QueryPipeSpec "attribute neq query")
        return F.coalesce(get(pred[1]) != F.lit(pred[2]), F.lit(False))
    if k == "and":
        return _pred_column(pred[1], get) & _pred_column(pred[2], get)
    if k == "or":
        return _pred_column(pred[1], get) | _pred_column(pred[2], get)
    if k == "not":
        return ~_pred_column(pred[1], get)
    raise ValueError(f"unknown predicate {pred!r}")


# first element tag of the document, skipping decl/comments/doctype
# (tag pattern includes the optional ns: prefix — literal QName, r5)
_ROOT_TAG_RE = (r"(?s)^(?:\s+|<\?.*?\?>|<!--.*?-->|<!DOCTYPE[^>]*>)*"
                r"<([A-Za-z_][\w.\-]*(?::[A-Za-z_][\w.\-]*)?)")


def _struct_attr_getter(struct_col):
    def get(a: str):
        return struct_col.getField(f"_{a}")
    return get


def _fast_values(steps: list[_Step], struct_col, i: int):
    """array<string> of matched ``_VALUE`` texts for the path suffix
    ``steps[i:]``, given the struct of step ``i-1``; nulls propagate (absent
    element -> null array -> no rows after posexplode)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    step = steps[i]
    arr = struct_col.getField(step.name)
    if step.pred is not None:
        def keep(s):
            return _pred_column(step.pred, _struct_attr_getter(s))
        arr = F.filter(arr, keep)
    if i == len(steps) - 1:
        def value_of(s):
            return s.getField("_VALUE")
        return F.transform(arr, value_of)

    def descend(s):
        # an element missing the child entirely yields a null inner array;
        # flatten() nulls out the WHOLE result on any null element, so
        # coalesce each branch to empty
        return F.coalesce(_fast_values(steps, s, i + 1),
                          F.array().cast("array<string>"))
    return F.flatten(F.transform(arr, descend))


def xpath_texts(df: DataFrame, xml_col: str, xpath: str,
                key_col: str = "doc_key", mode: str = "strict") -> DataFrame:
    """Text content of every element matching ``xpath`` — one row per
    simple-content match, in document order: ``(doc_key, match_no, value)``.

    Routing: if :func:`compile_xpath_fast` accepts the query it runs fully
    JVM-side — ``from_xml`` with the minimal path-derived schema, predicate
    filters as array HOFs, ``posexplode`` for match numbering; matches with
    no text content are dropped (text-node semantics).  Otherwise it falls
    back to the Python :func:`xpath_filter` tier and returns each match's
    subtree text (which keeps empty matches as ``""``).  The two tiers agree
    on simple non-empty content — pinned by tests/test_xpath.py parity
    cases.  ``mode='strict'`` fails the job on a malformed document
    (from_xml FAILFAST); ``mode='attempt'`` skips it (PERMISSIVE -> null
    struct -> no rows)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    steps = compile_xpath_fast(xpath)
    if steps is None:
        m = xpath_filter(df, xml_col, xpath, key_col=key_col, mode=mode)
        return m.select("doc_key", "match_no",
                        F.col("inner_text").alias("value"))
    opts = {"mode": "FAILFAST" if mode == "strict" else "PERMISSIVE"}
    parsed = F.from_xml(F.col(xml_col), _fast_schema(steps), opts)
    root_ok = (F.regexp_extract(F.col(xml_col), _ROOT_TAG_RE, 1)
               == F.lit(steps[0].name))
    if steps[0].pred is not None:
        root_ok = root_ok & _pred_column(steps[0].pred,
                                         _struct_attr_getter(parsed))
    if len(steps) == 1:
        vals = F.array(parsed.getField("_VALUE"))
    else:
        vals = _fast_values(steps, parsed, 1)
    # drop null-text matches INSIDE the array (no shuffle, and posexplode
    # then yields dense per-doc match numbers for free)
    def non_null(v):
        return v.isNotNull()
    vals = F.when(root_ok, F.filter(vals, non_null))
    return df.select(F.col(key_col).cast("string").alias("doc_key"),
                     F.posexplode(vals).alias("match_no", "value"))

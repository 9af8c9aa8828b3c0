"""XML source: event extraction over XML string/file columns.

The reference ships a validating streaming XML event parser
(``xml/src/main/scala/fs2/data/xml/internals/EventParser.scala``, 1073 LoC).
Spark has no native XML scan in this environment, so the event surface is
re-expressed as an Arrow-batched ``mapInPandas`` over Python's stdlib
``xml.etree`` *iterparse* — per-document streaming (start/end/text events in
document order), bounded memory (elements cleared after their end event),
with fs2-data's strict-vs-attempt error modes.

Emitted event rows mirror the ``XmlEvent`` ADT subset that survives
normalization (reference ``xml/src/main/scala/fs2/data/xml/XmlEvent.scala``):
StartTag(name, attrs) / XmlString(text) / EndTag(name), tagged with
``(event_no, depth)`` — the Depth counter of the ESP tag algebra
(``finite-state/shared/src/main/scala/fs2/data/esp/Tag.scala:25-33``) — plus
structural context maintained by the open-element stack:

- ``parent``: name of the enclosing element (null at the root),
- ``path``: '/'-joined ancestor-or-self path for StartTag events / the
  enclosing element's path for text and EndTag events — the running
  "location" of fs2-data's XPath matcher
  (``xml/src/main/scala/fs2/data/xml/xpath/internals/LocationMatch.scala``),
- ``owner_no``: event_no of the enclosing StartTag (joins text back to its
  element without any window).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

EVENT_SCHEMA = ("doc_key string, event_no int, depth int, event string, "
                "name string, attrs map<string,string>, text string, "
                "parent string, path string, owner_no int, ok boolean, "
                "error string")


def xml_events(df: DataFrame, xml_col: str = "xml", key_col: str = "doc_key",
               mode: str = "strict") -> DataFrame:
    """Parse an XML string column into an ordered event stream (one row per
    event). strict: malformed XML fails the job; attempt: emits a single
    ``ok=false`` row carrying the parse error for that document."""
    import xml.etree.ElementTree as ET  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    strict = mode == "strict"

    def pull_events(xml):
        # feed the whole document before draining: the queued (ev, elem)
        # pairs reference live Elements, so text/tail are complete by read
        # time (iterparse's "start" events can observe partial .text when a
        # document spans parser read chunks)
        parser = ET.XMLPullParser(events=("start", "end"))
        parser.feed(xml)
        parser.close()
        return parser.read_events()

    def parse_one(key, xml):
        events, n = [], 0
        # open-element stack: (name, start_event_no, path)
        stack: list[tuple[str, int, str]] = []
        try:
            for ev, elem in pull_events(xml):
                if ev == "start":
                    parent = stack[-1][0] if stack else None
                    ppath = stack[-1][2] if stack else ""
                    path = f"{ppath}/{elem.tag}"
                    events.append((key, n, len(stack), "StartTag", elem.tag,
                                   dict(elem.attrib), None, parent, path, n,
                                   True, None))
                    stack.append((elem.tag, n, path))
                    n += 1
                    if elem.text and elem.text.strip():
                        # text directly inside the just-opened element
                        events.append((key, n, len(stack), "XmlString", None,
                                       None, elem.text.strip(), elem.tag, path,
                                       stack[-1][1], True, None))
                        n += 1
                else:
                    name, start_no, path = stack.pop()
                    parent = stack[-1][0] if stack else None
                    events.append((key, n, len(stack), "EndTag", elem.tag, None,
                                   None, parent, path, start_no, True, None))
                    n += 1
                    if elem.tail and elem.tail.strip() and stack:
                        # tail text belongs to the PARENT element (mixed
                        # content: <a><b>x</b>tail</a> -> 'tail' is a's text)
                        pname, pno, ppath = stack[-1]
                        events.append((key, n, len(stack), "XmlString", None,
                                       None, elem.tail.strip(), pname, ppath,
                                       pno, True, None))
                        n += 1
                    elem.clear()  # bounded memory: done subtrees are dropped
        except ET.ParseError as e:
            if strict:
                raise
            return [(key, 0, 0, "Error", None, None, None, None, None, None,
                     False, str(e))]
        return events

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_key", "event_no", "depth", "event", "name", "attrs", "text",
                "parent", "path", "owner_no", "ok", "error"]
        for pdf in batches:
            rows = []
            for key, xml in zip(pdf[key_col], pdf[xml_col]):
                rows.extend(parse_one(str(key), xml))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, EVENT_SCHEMA)


def xml_dom(df: DataFrame, xml_col: str = "xml", key_col: str = "doc_key",
            mode: str = "strict") -> DataFrame:
    """``xml.dom.documents`` analogue (reference
    ``xml/src/main/scala/fs2/data/xml/dom/package.scala:25``): parse each
    document into a DOM tree rendered as one JSON value per row —
    ``{"tag": t, "attrs": {...}, "children": [node | text-string, ...]}`` —
    the nested-struct view of the event stream. strict/attempt error modes
    as in :func:`xml_events` (attempt: dom = null on malformed input)."""
    import json as _json  # noqa: PLC0415
    import xml.etree.ElementTree as ET  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    strict = mode == "strict"

    def to_node(elem) -> dict:
        children: list = []
        if elem.text and elem.text.strip():
            children.append(elem.text.strip())
        for c in elem:
            children.append(to_node(c))
            if c.tail and c.tail.strip():
                children.append(c.tail.strip())
        return {"tag": elem.tag, "attrs": dict(elem.attrib),
                "children": children}

    def kernel(batches):
        for pdf in batches:
            doms = []
            for xml in pdf[xml_col]:
                try:
                    parser = ET.XMLPullParser(events=("end",))
                    parser.feed(xml)
                    parser.close()
                    root = None
                    for _ev, elem in parser.read_events():
                        root = elem  # last end event = the root
                    doms.append(_json.dumps(to_node(root),
                                            separators=(",", ":"),
                                            ensure_ascii=False))
                except (ET.ParseError, AttributeError):
                    if strict:
                        raise
                    doms.append(None)
            yield pd.DataFrame({key_col: pdf[key_col], "dom": doms})

    return df.mapInPandas(kernel, f"{key_col} string, dom string")


def split_qname(col):
    """Resolve a Clark-notation name (``{uri}local``, the form the parser
    emits for namespaced documents — the namespaceResolver surface of
    reference ``xml/src/main/scala/fs2/data/xml/package.scala``) into a
    ``struct(ns_uri, local)``. Non-namespaced names get a null ns_uri."""
    from pyspark.sql import functions as F
    c = F.col(col) if isinstance(col, str) else col
    ns = F.when(c.startswith("{"), F.regexp_extract(c, r"^\{(.*)\}", 1))
    local = F.when(c.startswith("{"),
                   F.regexp_extract(c, r"^\{.*\}(.*)$", 1)).otherwise(c)
    return F.struct(ns.alias("ns_uri"), local.alias("local"))


def xml_render(events: DataFrame, key_col: str = "doc_key") -> DataFrame:
    """Inverse of :func:`xml_events`: reassemble each document's XML string
    from its event rows — the ``xml.render`` surface (reference
    ``xml/src/main/scala/fs2/data/xml/package.scala`` render pipes; compact
    form, no pretty-printing). Pure column expressions: per-event fragments
    (escaped text, attribute-rendered start tags) concatenated in event order
    via one hash aggregation per document."""
    from pyspark.sql import functions as F

    def esc(c):  # XML text escaping
        return F.replace(F.replace(F.replace(c, F.lit("&"), F.lit("&amp;")),
                                   F.lit("<"), F.lit("&lt;")),
                         F.lit(">"), F.lit("&gt;"))

    attr_frag = F.aggregate(
        F.map_entries(F.coalesce(F.col("attrs"), F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")))),
        F.lit(""),
        lambda acc, e: F.concat(acc, F.lit(" "), e.getField("key"), F.lit('="'),
                                F.replace(esc(e.getField("value")),
                                          F.lit('"'), F.lit("&quot;")),
                                F.lit('"')))
    frag = (F.when(F.col("event") == "StartTag",
                   F.concat(F.lit("<"), F.col("name"), attr_frag, F.lit(">")))
            .when(F.col("event") == "EndTag",
                  F.concat(F.lit("</"), F.col("name"), F.lit(">")))
            .when(F.col("event") == "XmlString", esc(F.col("text")))
            .otherwise(F.lit("")))
    return (events.select(F.col(key_col), F.struct("event_no", frag.alias("frag")).alias("s"))
            .groupBy(key_col)
            .agg(F.array_join(
                F.transform(F.array_sort(F.collect_list("s")),
                            lambda s: s.getField("frag")), "").alias("xml")))


def xml_texts_at(df: DataFrame, xml_col: str, tag: str, key_col: str = "doc_key",
                 mode: str = "strict") -> DataFrame:
    """XPath-``//tag/text()`` analogue over the event stream: text content of
    every element named ``tag``, in document order (the ``filter.raw``
    pipeline of reference ``xml/src/main/scala/fs2/data/xml/xpath``).

    Ownership comes straight from the parser's open-element stack (``parent``
    column), so mixed content is attributed correctly: in
    ``<a><b>x</b>tail</a>`` the tail text belongs to ``a``, not ``b``.
    """
    from pyspark.sql import functions as F
    ev = xml_events(df, xml_col, key_col, mode)
    return (ev.filter((F.col("event") == "XmlString") & (F.col("parent") == tag))
            .select("doc_key", "event_no", F.col("text").alias("value")))

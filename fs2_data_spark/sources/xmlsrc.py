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
(``finite-state/shared/src/main/scala/fs2/data/esp/Tag.scala:25-33``).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

EVENT_SCHEMA = ("doc_key string, event_no int, depth int, event string, "
                "name string, attrs map<string,string>, text string, ok boolean, "
                "error string")


def xml_events(df: DataFrame, xml_col: str = "xml", key_col: str = "doc_key",
               mode: str = "strict") -> DataFrame:
    """Parse an XML string column into an ordered event stream (one row per
    event). strict: malformed XML fails the job; attempt: emits a single
    ``ok=false`` row carrying the parse error for that document."""
    import io  # noqa: PLC0415
    import xml.etree.ElementTree as ET  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    strict = mode == "strict"

    def parse_one(key, xml):
        events, depth, n = [], 0, 0
        try:
            for ev, elem in ET.iterparse(io.StringIO(xml), events=("start", "end")):
                if ev == "start":
                    events.append((key, n, depth, "StartTag", elem.tag,
                                   dict(elem.attrib), None, True, None))
                    n += 1
                    depth += 1
                    if elem.text and elem.text.strip():
                        events.append((key, n, depth, "XmlString", None, None,
                                       elem.text.strip(), True, None))
                        n += 1
                else:
                    depth -= 1
                    events.append((key, n, depth, "EndTag", elem.tag, None, None,
                                   True, None))
                    n += 1
                    if elem.tail and elem.tail.strip():
                        events.append((key, n, depth, "XmlString", None, None,
                                       elem.tail.strip(), True, None))
                        n += 1
                    elem.clear()  # bounded memory: done subtrees are dropped
        except ET.ParseError as e:
            if strict:
                raise
            return [(key, 0, 0, "Error", None, None, None, False, str(e))]
        return events

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_key", "event_no", "depth", "event", "name", "attrs", "text",
                "ok", "error"]
        for pdf in batches:
            rows = []
            for key, xml in zip(pdf[key_col], pdf[xml_col]):
                rows.extend(parse_one(str(key), xml))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, EVENT_SCHEMA)


def xml_texts_at(df: DataFrame, xml_col: str, tag: str, key_col: str = "doc_key",
                 mode: str = "strict") -> DataFrame:
    """XPath-``//tag/text()`` analogue over the event stream: text content of
    every element named ``tag``, in document order (the ``filter.raw``
    pipeline of reference ``xml/src/main/scala/fs2/data/xml/xpath``)."""
    from pyspark.sql import Window, functions as F
    ev = xml_events(df, xml_col, key_col, mode)
    w = (Window.partitionBy("doc_key").orderBy("event_no")
         .rowsBetween(Window.unboundedPreceding, -1))
    # a text event belongs to the nearest preceding StartTag one level up
    owner = F.last(F.when(ev.event == "StartTag", ev.name), ignorenulls=True).over(w)
    return (ev.withColumn("owner", owner)
            .filter((F.col("event") == "XmlString") & (F.col("owner") == tag))
            .select("doc_key", "event_no", F.col("text").alias("value")))

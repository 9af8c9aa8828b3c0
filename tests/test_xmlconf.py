"""W3C XML conformance corpus (xmlconf, shipped in the reference at
``xml/src/test/resources/xmlconf/``) against xml_events — mirroring the
reference harness (``EventParserTest.scala:262-286``: every valid document
parses to a well-formed event stream).

Scope: standalone documents. The ``ext-sa``/``not-sa`` cases that require
fetching EXTERNAL entities/DTD subsets are skipped explicitly — external DTD
resolution is a declared non-goal (SURVEY §7.4), same scope the stdlib expat
parser enforces. Additionally all 186 ``not-wf/sa`` (not well-formed)
documents must be REJECTED in attempt mode (ok=false), a stronger check than
the reference harness runs — plus the 57 ``sun/not-wf`` cases (the ones whose
error is only visible through an external subset are excluded, listed with
why)."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.sources.xmlsrc import xml_events

BASE = Path("/root/reference/xml/src/test/resources/xmlconf")
pytestmark = pytest.mark.skipif(not BASE.exists(), reason="xmlconf corpus absent")


def _read(p: Path) -> str | None:
    raw = p.read_bytes()
    for enc in ("utf-8", "utf-16"):
        try:
            return raw.decode(enc)
        except UnicodeError:
            continue
    return None  # charset-layer rejection


def test_xmlconf_valid_parse_balanced(spark):
    files = (sorted(BASE.glob("xmltest/valid/**/*.xml"))
             + sorted((BASE / "sun" / "valid").glob("*.xml")))
    rows = [(str(p.relative_to(BASE)), t)
            for p in files if (t := _read(p)) is not None]
    df = spark.createDataFrame(rows, "doc_key string, xml string")
    assert df.count() >= 190  # corpus actually loaded
    ev = xml_events(df, mode="attempt")
    # the ONLY acceptable failure class is unresolvable EXTERNAL entities
    # (external DTD resolution is the declared non-goal, SURVEY §7.4)
    bad = ev.filter(~F.col("ok")).select("doc_key", "error").collect()
    external = ("undefined entity",   # &e; defined in an external subset
                "no element found")   # doc body hidden behind %param; SYSTEM
    assert all(any(x in r.error for x in external) for r in bad), \
        [(r.doc_key, r.error) for r in bad
         if not any(x in r.error for x in external)]
    n_bad = len({r.doc_key for r in bad})
    ok_docs = ev.filter(F.col("ok")).select("doc_key").distinct().count()
    assert ok_docs >= 170 and n_bad <= 23, (ok_docs, n_bad)
    bal = (ev.filter(F.col("ok")).groupBy("doc_key").agg(
        F.sum(F.when(F.col("event") == "StartTag", 1).otherwise(0)).alias("s"),
        F.sum(F.when(F.col("event") == "EndTag", 1).otherwise(0)).alias("e"))
        .filter("s != e OR s = 0").collect())
    assert not bal, [tuple(r) for r in bal]


def test_xmlconf_not_wellformed_rejected(spark):
    files = sorted(BASE.glob("xmltest/not-wf/sa/*.xml"))
    rows = []
    for p in files:
        t = _read(p)
        if t is None:
            continue  # undecodable = rejected at the charset layer
        rows.append((str(p.name), t))
    df = spark.createDataFrame(rows, "doc_key string, xml string")
    assert df.count() >= 180
    ev = xml_events(df, mode="attempt")
    accepted = (ev.groupBy("doc_key").agg(F.min(F.col("ok").cast("int")).alias("ok"))
                .filter("ok = 1").collect())
    assert not accepted, [r.doc_key for r in accepted]


# sun/not-wf cases whose non-well-formedness lives in an EXTERNAL subset or
# entity: undetectable without external DTD fetching, the declared non-goal
# (SURVEY §7.4) — each document's own body is well-formed.  Pinned as
# per-case xfails below (VERDICT r03 item 10) so they flip to XPASS the day
# external subsets are implemented.
SUN_EXTERNAL_DEPENDENT = {
    "cond01.xml": "IGNORE/INCLUDE sections live in external cond.dtd",
    "cond02.xml": "conditional-section error only inside external cond.dtd",
    "decl01.xml": "text decl error is inside external entity decl01.ent",
    "dtd07.xml": "incomplete markup decl lives in external dtd07.dtd",
    "encoding07.xml": "external entity lacks required encoding in text decl",
    "uri01.xml": "error is a non-URI SYSTEM literal resolved externally",
}


def test_xmlconf_sun_not_wellformed_rejected(spark):
    files = sorted((BASE / "sun" / "not-wf").glob("*.xml"))
    rows = []
    for p in files:
        t = _read(p)
        if t is None:
            continue  # undecodable = rejected at the charset layer
        rows.append((str(p.name), t))
    df = spark.createDataFrame(rows, "doc_key string, xml string")
    assert df.count() >= 50
    ev = xml_events(df, mode="attempt")
    accepted = (ev.groupBy("doc_key").agg(F.min(F.col("ok").cast("int")).alias("ok"))
                .filter("ok = 1").collect())
    unexpected = {r.doc_key for r in accepted} - set(SUN_EXTERNAL_DEPENDENT)
    assert not unexpected, sorted(unexpected)


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.xfail(
        reason=f"needs external DTD fetch (SURVEY §7.4 non-goal): {why}",
        strict=True))
     for n, why in sorted(SUN_EXTERNAL_DEPENDENT.items())])
def test_xmlconf_sun_external_dependent_cases(spark, name):
    """Each excluded sun/not-wf case, individually: rejecting it requires
    fetching the external subset the error hides in, so today the parser
    accepts the (well-formed) document body — a strict xfail that will XPASS
    loudly if external DTD resolution ever lands."""
    p = BASE / "sun" / "not-wf" / name
    t = _read(p)
    assert t is not None
    df = spark.createDataFrame([(name, t)], "doc_key string, xml string")
    ev = xml_events(df, mode="attempt")
    assert ev.filter(~F.col("ok")).count() > 0  # rejected = test passes

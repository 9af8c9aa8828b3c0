"""PII redaction (`functions/redact.py`): hand expectations, ordering
semantics, and the cross-engine RE2 parity sweep the redact_pii_docs
oracle relies on."""

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.functions.redact import (
    pii_counts, pii_counts_sql, redact, redact_pii, redact_sql,
)


@pytest.fixture(scope="module")
def rdf(spark):
    rows = [
        (0, "mail me at bob.smith+x@example.co.uk today"),
        (1, "see https://ex.org/a?b=c&d=e now"),
        (2, "host 192.168.0.1 and 10.0.0.255 up"),
        (3, "card 4111222233334444 acct 12345678901234567"),
        # email inside a URL: the URL pattern swallows it first
        (4, "link http://u@example.com/x?mail=a@b.co rest"),
        (5, "short 123456789012 run"),         # 12 digits: below threshold
        (6, "no pii here at all"),
        (7, "999.999.999.999 is matched too"),  # per-octet range unchecked
    ]
    return spark.createDataFrame(rows, "i bigint, t string")


def _m(df, col):
    return {r.i: r[col] for r in df.collect()}


def test_redact_hand_cases(spark, rdf):
    got = _m(rdf.select("i", redact("t").alias("c")), "c")
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "see <URL> now"
    assert got[2] == "host <IP> and <IP> up"
    assert got[3] == "card <NUM> acct <NUM>"
    # URL applied before email: the whole link collapses to one token
    assert got[4] == "link <URL> rest"
    assert got[5] == "short 123456789012 run"
    assert got[6] == "no pii here at all"
    assert got[7] == "<IP> is matched too"


def test_counts_measured_on_original_text(spark, rdf):
    out = redact_pii(rdf, text_col="t")
    got = {r.i: (r.n_url, r.n_email, r.n_ipv4, r.n_digits)
           for r in out.collect()}
    assert got[0] == (0, 1, 0, 0)
    assert got[2] == (0, 0, 2, 0)
    assert got[3] == (0, 0, 0, 2)
    # counts see the embedded emails even though redaction swallowed them
    assert got[4] == (1, 2, 0, 0)
    assert got[6] == (0, 0, 0, 0)


def test_kind_subset_respects_canonical_order(spark):
    df = spark.createDataFrame(
        [(0, "a@b.co at 1.2.3.4")], "i bigint, t string")
    got = _m(df.select("i", redact("t", kinds=("ipv4",)).alias("c")), "c")
    assert got[0] == "a@b.co at <IP>"


def test_unicode_boundary_follows_java_semantics(spark):
    """The sweep-found divergence, pinned: Java's \\b treats 'ü' as a word
    char (no boundary), RE2's is ASCII-only (boundary). The structural
    boundary class [^\\p{L}\\p{N}_] follows Java in BOTH engines."""
    import duckdb

    from fs2_data_spark.functions.redact import PII_PATTERNS

    df = spark.createDataFrame(
        [(0, "1.2.3.4über"), (1, "ü4111222233334444"),
         (2, "1.2.3.4中"), (3, "_4111222233334444")],
        "i bigint, t string")
    got = _m(df.select("i", redact("t").alias("c")), "c")
    assert got == {0: "1.2.3.4über", 1: "ü4111222233334444",
                   2: "1.2.3.4中", 3: "_4111222233334444"}
    con = duckdb.connect()
    for _, t in df.collect():
        assert con.execute(f"SELECT {redact_sql('?')}", [t]).fetchone()[0] == t
    assert all(r"\b" not in pat for pat, _, _ in PII_PATTERNS.values())


def test_two_passes_catch_single_char_adjacency(spark):
    """Consume-restore eats the shared boundary char, so back-to-back
    matches land in alternating passes — the second pass must catch what
    the first one's consumption skipped (worst case: a 4-chain)."""
    rows = [
        (0, "1.1.1.1 2.2.2.2 3.3.3.3 4.4.4.4"),
        (1, "4111222233334444,4111222233334445"),
        (2, "x 1.2.3.4 4111222233334444 y"),
    ]
    df = spark.createDataFrame(rows, "i bigint, t string")
    out = redact_pii(df, text_col="t")
    got = {r.i: (r.clean_text, r.n_ipv4, r.n_digits) for r in out.collect()}
    assert got[0] == ("<IP> <IP> <IP> <IP>", 4, 0)
    assert got[1] == ("<NUM>,<NUM>", 0, 2)
    assert got[2] == ("x <IP> <NUM> y", 1, 1)


def test_redact_duckdb_parity_sweep(spark):
    """300 generated strings mixing every PII kind with near-miss decoys
    must redact and count identically in DuckDB RE2 — the exact property
    the redact_pii_docs oracle is built on."""
    import random

    import duckdb

    rng = random.Random(11)
    atoms = [
        "plain text ", "a@b.co", " x.y@sub.domain.org ",
        "https://e.com/p?q=1&r=2", "http://u:p@h.net/x#f", "ftp://nope",
        "1.2.3.4", "10.0.0.255", "999.999.999.999", "1.2.3.4.5",
        "4111222233334444", "12345678901234567890123", "12345",
        "v1.2 released", "a@b", "@handle", "dot.end.", " ", "(1.2.3.4)",
        "card:4111222233334444.", "<already>", "über-straße",
    ]
    texts = ["".join(rng.choice(atoms) for _ in range(rng.randint(0, 8)))
             for _ in range(300)]
    df = spark.createDataFrame(list(enumerate(texts)), "i bigint, t string")
    cols = [redact("t").alias("clean"), *pii_counts("t")]
    got = {r.i: (r.clean, r.n_url, r.n_email, r.n_ipv4, r.n_digits)
           for r in df.select("i", *cols).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    count_exprs = ", ".join(pii_counts_sql("s"))
    exp = {row[0]: (row[1], *row[2:]) for row in con.execute(
        f"SELECT i, {redact_sql('s')}, {count_exprs} FROM t").fetchall()}
    assert got == exp

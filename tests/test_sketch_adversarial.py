"""Adversarial cross-engine sweep for the round-5 sketch/filter/rewrite tier.

The oracle harness checks these queries on the driver's fixed sf0.01 corpus;
this sweep re-runs the EXACT registry pipelines (Spark query fn + its DuckDB
oracle SQL, unmodified) over a generated adversarial `documents` table —
empty documents, whitespace runs, `#`/`...` symbol pathologies (overlapping
dot runs), unicode words, sub-segment-length documents, identical 8-word
segments planted across documents, and exact duplicate documents — and
requires the same order-insensitive value multiset from both engines, the
same compare the driver applies.

Covers: gopher_rules_docs, segment_dedup_docs, kmv_distinct_docs,
cms_counts_docs (operators/sketches.py, quality.py gopher_rules,
dedup.py segment_dedup).
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from fs2_data_spark.queries import REGISTRY

# Single-space-joined word soup: the corpus tokenizer is split-on-' ' with
# empty tokens filtered, so atoms carry every symbol class EXCEPT a space.
ATOMS = [
    "the", "a", "of", "to", "and", "in", "is", "it",  # the stop set itself
    "word", "alpha", "Bravo", "charlie7", "42", "007",
    "#", "##", "#tag", "a#b#c",
    "...", "....", ".....", "a...b", "end...", "...start", "..",
    "über", "ß", "naïve", "λx", "№5",
    "x", "I", "supercalifragilisticexpialidocious",
    "mixed#...#mix", "-", "--", "(paren)", "q.e.d.",
]


def _mk_corpus() -> list[tuple[int, str, str, str]]:
    rng = random.Random(77)
    shared = [" ".join(rng.choice(ATOMS) for _ in range(8)) for _ in range(6)]
    docs: list[tuple[int, str, str, str]] = []
    for i in range(300):
        n = rng.choice([0, 1, 2, 3, 7, 8, 9, 16, 20, 40])
        ws = [rng.choice(ATOMS) for _ in range(n)]
        if rng.random() < 0.35:  # plant a shared 8-word segment
            pos = rng.randint(0, len(ws))
            ws[pos:pos] = rng.choice(shared).split(" ")
        text = " ".join(ws)
        if rng.random() < 0.15:  # empty-token parity: doubled/edge spaces
            text = "  " + text.replace(" ", "  ", 1) + " "
        docs.append((i, text, f"s{i % 3}", rng.choice(["en", "zh", "es"])))
    docs += [(300 + j, *docs[j][1:]) for j in range(10)]  # exact duplicates
    return docs


def _canon(v) -> str:
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.10g}"
    return str(v)


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory):
    d = spark.createDataFrame(
        _mk_corpus(),
        "doc_id bigint, text string, source string, lang string")
    out = tmp_path_factory.mktemp("adv_docs")
    d.coalesce(2).write.parquet(str(out / "documents.parquet"))
    return str(out)


@pytest.mark.parametrize("name", [
    "gopher_rules_docs",
    "segment_dedup_docs",
    "kmv_distinct_docs",
    "cms_counts_docs",
    "nb_classifier_docs",
])
def test_adversarial_duckdb_parity(spark, adv_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, adv_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    assert srows, f"{name} produced no rows on the adversarial corpus"

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{adv_dir}/documents.parquet/*.parquet'")
    res = con.sql(sql)
    dcols, drows = list(res.columns), res.fetchall()

    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _multiset(scols, srows) == _multiset(dcols, drows)

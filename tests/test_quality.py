"""Unigram-LM corpus-quality scoring (operators/quality.py).

Hand-computed exact expectations — every accumulator is integer arithmetic,
so equality is exact (no tolerance) except the two final IEEE divisions,
which are also exact for these small integers.
"""

import pytest
from pyspark.sql import functions as F

from fs2_data_spark.operators.quality import unigram_lm_score, unigram_vocab


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a"),     # n=3, sum_cnt = 4+2+4 = 10
        (2, "b c"),       # n=2, sum_cnt = 2+1 = 3
        (3, ""),          # empty: n=0, null score
        (4, "a  a"),      # double space filtered: n=2, sum_cnt = 8
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_unigram_vocab_counts(spark, docs):
    got = {r.word: r.cnt for r in unigram_vocab(docs).collect()}
    assert got == {"a": 4, "b": 2, "c": 1}


def test_unigram_lm_score_exact(spark, docs):
    got = {r.doc_id: r for r in unigram_lm_score(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    for r in got.values():
        assert r.total_words == 7
    assert (got[1].n_words, got[1].sum_cnt) == (3, 10)
    assert got[1].lm_score == (10 / 3) / 7
    assert (got[2].n_words, got[2].sum_cnt) == (2, 3)
    assert got[2].lm_score == (3 / 2) / 7
    # empty doc survives the explode (left join) with a null score
    assert (got[3].n_words, got[3].sum_cnt, got[3].lm_score) == (0, 0, None)
    assert got[4].lm_score == 4 / 7
    # ranking direction: rare-word soup (doc 2) scores below common text
    assert got[2].lm_score < got[1].lm_score < got[4].lm_score


def test_unigram_lm_score_broadcast_parity(spark, docs):
    a = sorted(map(tuple, unigram_lm_score(docs).collect()))
    b = sorted(map(tuple,
                   unigram_lm_score(docs, broadcast_vocab=False).collect()))
    assert a == b


def test_unigram_lm_score_partition_invariant(spark, docs):
    a = sorted(map(tuple, unigram_lm_score(docs).collect()))
    b = sorted(map(tuple, unigram_lm_score(docs.repartition(5)).collect()))
    assert a == b


def test_unigram_lm_score_precomputed_vocab(spark, docs):
    """Passing a frozen vocab (the production shape: fit once, score many
    shards) gives the same result as the self-fit path."""
    v = unigram_vocab(docs)
    a = sorted(map(tuple, unigram_lm_score(docs, vocab=v).collect()))
    b = sorted(map(tuple, unigram_lm_score(docs).collect()))
    assert a == b


# --- TF-IDF top-k ----------------------------------------------------------


def test_tfidf_topk_matches_reference(spark):
    """Randomized parity with a pure-Python tf*N/df reference, including
    the deterministic (score desc, word) tie ranking."""
    import random
    from collections import Counter

    from fs2_data_spark.operators.quality import tfidf_topk

    rng = random.Random(13)
    vocab = ["w%d" % i for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 25))))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    k = 4
    got = {(r.doc_id, r.word): (r.tf, r.df, r.score)
           for r in tfidf_topk(docs, k=k).collect()}

    n_docs = len(rows)
    df = Counter()
    tfs = {}
    for i, t in rows:
        c = Counter(t.split())
        c.pop("", None)
        tfs[i] = c
        for w in c:
            df[w] += 1
    exp = {}
    for i, c in tfs.items():
        ranked = sorted(
            ((tf * n_docs / df[w], w, tf) for w, tf in c.items()),
            key=lambda x: (-x[0], x[1]))
        for score, w, tf in ranked[:k]:
            exp[(i, w)] = (tf, df[w], score)
    assert got == exp


def test_tfidf_rare_term_outranks_common(spark):
    from fs2_data_spark.operators.quality import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "common rare common"), (2, "common x"), (3, "common y")],
        "doc_id int, text string")
    top = {r.doc_id: r.word
           for r in tfidf_topk(docs, k=1).collect()}
    # 'common' appears everywhere (df=3); doc 1's top term must be 'rare'
    assert top[1] == "rare"


def test_merge_vocabs_monoid_law(spark, docs):
    from fs2_data_spark.operators.quality import merge_vocabs, unigram_vocab
    a = unigram_vocab(docs.filter(F.col("doc_id") % 2 == 0))
    b = unigram_vocab(docs.filter(F.col("doc_id") % 2 == 1))
    merged = {r.word: r.cnt for r in merge_vocabs(a, b).collect()}
    full = {r.word: r.cnt for r in unigram_vocab(docs).collect()}
    assert merged == full
    # single-argument merge is the identity re-aggregation
    one = {r.word: r.cnt for r in merge_vocabs(unigram_vocab(docs)).collect()}
    assert one == full


def test_merge_vocabs_empty_args():
    import pytest as _pytest

    from fs2_data_spark.operators.quality import merge_vocabs
    with _pytest.raises(ValueError):
        merge_vocabs()


# --- bigram LM + novelty ---------------------------------------------------


def test_bigram_lm_score_exact(spark):
    from fs2_data_spark.operators.quality import bigram_lm_score
    rows = [(1, "a b a b"), (2, "a b"), (3, "x"), (4, "")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.n_bigrams, r.sum_cond_e9, r.bigram_score)
           for r in bigram_lm_score(d).collect()}
    # corpus bigrams: (a,b) x3, (b,a) x1 -> c(a,b)=3 c_a=3; c(b,a)=1 c_b=1
    # conds: (a,b) -> 1e9 exactly; (b,a) -> 1e9
    assert got[1] == (3, 3_000_000_000, 1.0)
    assert got[2] == (1, 1_000_000_000, 1.0)
    assert got[3] == (0, 0, None)
    assert got[4] == (0, 0, None)


def test_bigram_lm_order_sensitivity(spark):
    """The property unigram scoring cannot have: a document and its
    reversal get different bigram scores when the corpus has a dominant
    word order."""
    from fs2_data_spark.operators.quality import bigram_lm_score
    rows = [(i, "a b c") for i in range(9)] + [(9, "c b a")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.bigram_score for r in bigram_lm_score(d).collect()}
    assert got[0] > got[9]


def test_shingle_novelty_exact(spark):
    from fs2_data_spark.operators.quality import shingle_novelty
    rows = [(1, "a b c d"),    # shingles: abc, bcd
            (2, "a b c"),      # abc (shared with doc 1)
            (3, "x y z"),      # xyz unique
            (4, "p q")]        # no trigram
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.n_shingles, r.n_unique, r.novelty)
           for r in shingle_novelty(d).collect()}
    assert got[1] == (2, 1, 0.5)     # bcd unique, abc shared
    assert got[2] == (1, 0, 0.0)
    assert got[3] == (1, 1, 1.0)
    assert got[4] == (0, 0, None)


def test_nb_posterior_score_exact(spark):
    from pyspark.sql import functions as F

    from fs2_data_spark.operators.quality import nb_posterior_score
    rows = [(1, "good good fine", True), (2, "bad bad fine", False),
            (3, "good bad", True), (4, "", False)]
    d = spark.createDataFrame(rows, "doc_id int, text string, pos boolean")
    got = {r.doc_id: (r.n_words, r.sum_post_e9, r.nb_score, r.nb_pass)
           for r in nb_posterior_score(d, F.col("pos")).collect()}
    # posteriors (Laplace): good (3+1)/(3+2) -> 800M; bad (1+1)/(3+2)
    # -> 400M; fine (1+1)/(2+2) -> 500M (all exact in e9 integers)
    assert got[1] == (3, 2_100_000_000, 0.7, True)
    assert got[2] == (3, 1_300_000_000, 1_300_000_000 / 3 / 1e9, False)
    assert got[3] == (2, 1_200_000_000, 0.6, True)
    assert got[4] == (0, 0, None, False)


def test_nb_posterior_separates_disjoint_vocab(spark):
    """Disjoint positive/negative vocabularies must separate perfectly:
    every positive document passes, every negative fails, and the score
    gap is the full smoothed band."""
    from pyspark.sql import functions as F

    from fs2_data_spark.operators.quality import nb_posterior_score
    rows = ([(i, "alpha beta gamma", True) for i in range(20)]
            + [(100 + i, "zip zap zop", False) for i in range(20)])
    d = spark.createDataFrame(rows, "doc_id int, text string, pos boolean")
    out = nb_posterior_score(d, F.col("pos")).collect()
    for r in out:
        assert r.nb_pass == r.is_positive
        assert (r.nb_score > 0.9) == r.is_positive
        assert (r.nb_score < 0.1) == (not r.is_positive)


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def test_pmi_hand_computed(spark):
    from fs2_data_spark.operators.quality import pmi_collocations
    # doc1 bigrams: ab, ba, ab, ba, ab; doc2: ba, ab, ba, ac
    # -> ab=4, ba=4, ac=1, N=9; first-marginals a=5, b=4; second b=4, a=4, c=1
    d = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "b a b a c")], "doc_id bigint, text string")
    out = {(r.u, r.v): r for r in
           pmi_collocations(d, min_count=1, topn=10).collect()}
    ab = out[("a", "b")]
    assert (ab.c_uv, ab.c_u, ab.c_v, ab.n_bi) == (4, 5, 4, 9)
    assert ab.score_e6 == 4 * 9 * 1_000_000 // (5 * 4)
    assert ab.lift == ab.score_e6 / 1e6
    ba = out[("b", "a")]
    assert (ba.c_uv, ba.c_u, ba.c_v, ba.n_bi) == (4, 4, 4, 9)
    assert ba.score_e6 == 4 * 9 * 1_000_000 // (4 * 4)
    ac = out[("a", "c")]
    assert ac.score_e6 == 1 * 9 * 1_000_000 // (5 * 1)
    # ba (2.25) first; ab and ac tie at 1.8 -> (u, v) tiebreak
    rows = pmi_collocations(d, min_count=1, topn=10).collect()
    assert [(r.u, r.v) for r in rows] == [("b", "a"), ("a", "b"), ("a", "c")]


def test_pmi_min_count_suppresses_hapax(spark):
    from fs2_data_spark.operators.quality import pmi_collocations
    d = spark.createDataFrame(
        [(1, "x y x y x y rare pair")], "doc_id bigint, text string")
    pairs = {(r.u, r.v) for r in
             pmi_collocations(d, min_count=3, topn=10).collect()}
    assert ("rare", "pair") not in pairs
    assert ("x", "y") in pairs


def test_pmi_short_docs_contribute_nothing(spark):
    from fs2_data_spark.operators.quality import pmi_collocations
    d = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b a b a b")],
        "doc_id bigint, text string")
    rows = pmi_collocations(d, min_count=1, topn=10).collect()
    assert all(r.n_bi == 5 for r in rows)  # only doc 3's bigrams counted


# ---------------------------------------------------------------------------
# top n-gram fraction (Gopher/RefinedWeb repetition signals)
# ---------------------------------------------------------------------------

def test_top_ngram_hand_computed(spark):
    from fs2_data_spark.operators.quality import top_ngram_fraction
    d = spark.createDataFrame(
        [(1, "a b a b a b c"),       # top bigram "a b" x3 of 6 words... 7 words
         (2, "x y z"),               # all bigrams unique
         (3, "w w w w"),             # "w w" x3 (overlapping)
         (4, "solo"),                # shorter than any n
         (5, "")],
        "doc_id bigint, text string")
    got = {r.doc_id: r for r in top_ngram_fraction(d, ns=(2, 3)).collect()}
    assert got[1].n_words == 7
    assert got[1].top2_count == 3                   # "a b" at 0, 2, 4
    assert got[1].top2_frac == round(3 * 2 / 7, 9)
    assert got[1].top3_count == 2                   # "a b a" x2 (pos 0, 2)
    assert got[1].top3_frac == round(2 * 3 / 7, 9)
    assert got[2].top2_count == 1 and got[2].top3_count == 1
    assert got[3].top2_count == 3 and got[3].top2_frac == round(6 / 4, 9)
    assert got[4].top2_count == 0 and got[4].top2_frac == 0.0
    assert got[5].n_words == 0 and got[5].top2_frac == 0.0


def test_top_ngram_shuffle_insensitive_unigrams_not(spark):
    """The signal is order-sensitive: a document and its word-shuffle share
    unigram stats but differ in top-bigram count."""
    from fs2_data_spark.operators.quality import top_ngram_fraction
    rep = " ".join(["spam mail"] * 20)
    shuf = " ".join(["spam"] * 20 + ["mail"] * 20)
    d = spark.createDataFrame([(1, rep), (2, shuf)],
                              "doc_id bigint, text string")
    got = {r.doc_id: r.top2_count for r in
           top_ngram_fraction(d, ns=(2,)).collect()}
    assert got[1] == 20       # "spam mail" 20x
    assert got[2] == 19       # "spam spam" 19x (or "mail mail")


def test_oov_rate_known_vocab(spark):
    from fs2_data_spark.operators.quality import oov_rate
    # tokens 1..4 frequent, 99 rare: with vocab_size=4 the vocab is {1,2,3,4}
    rows = [(1, [1, 2, 3, 99]), (2, [1, 1, 2, 2]), (3, [99, 98, 1, 2]),
            (4, [3, 4, 3, 4]), (5, [])]
    df = spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")
    got = {r.doc_id: (r.n_oov, r.oov_rate)
           for r in oov_rate(df, vocab_size=4).collect()}
    assert got[1] == (1, 0.25)
    assert got[2] == (0, 0.0)
    assert got[3] == (2, 0.5)
    assert got[5] == (0, 0.0)          # empty sequence: defined, not null


def test_oov_vocab_cut_deterministic(spark):
    """Ties at the vocab cut must resolve by the (count DESC, token) total
    order, so re-runs give the identical vocabulary."""
    from fs2_data_spark.operators.quality import oov_rate
    rows = [(i, [10, 20, 30, 40]) for i in range(6)]  # all counts equal
    df = spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")
    a = sorted(map(tuple, oov_rate(df, vocab_size=2).collect()))
    b = sorted(map(tuple, oov_rate(df.repartition(5), vocab_size=2).collect()))
    assert a == b
    # vocab must be {10, 20} (smallest tokens win the tie) -> 2 oov each
    assert all(t[2] == 2 for t in a)

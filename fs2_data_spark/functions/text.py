"""Text-analysis functions for training-data pipelines.

Language-ID heuristic, quality scoring, token counting, and word-level
hashing/fingerprinting over the ``documents`` table. Every function is a pure
Catalyst column expression built ONLY from engine-agnostic primitives
(``length``/``ascii``/``split``/higher-order functions), so a DuckDB oracle
can reproduce values bit-for-bit — the engine's analogue of fs2-data pinning
exact expected token lists in its specs (reference
``json/src/test/scala/fs2/data/json/jq/JqSpec.scala:40-458``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
HASH_PRIME = 2_147_483_647  # 2^31 - 1


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(text: Column | str) -> Column:
    """Whitespace tokenization with empty-string filtering."""
    return F.filter(F.split(_c(text), " "), lambda w: w != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(words(text)).cast("bigint")


def word_code(w: Column) -> Column:
    """Deterministic engine-agnostic word hash: first char code, last char
    code and length (``first*65536 + last*256 + len``). Collision-tolerant
    (used for MinHash/SimHash banding, not identity); reproducible verbatim
    in ANSI SQL (``ascii``/``substr``/``length`` only)."""
    return (
        F.ascii(F.substring(w, 1, 1)).cast("bigint") * 65536
        + F.ascii(F.substring(w, F.length(w), F.lit(1))).cast("bigint") * 256
        + F.length(w).cast("bigint")
    )


def word_codes(text: Column | str) -> Column:
    return F.transform(words(text), word_code)


def word_hash(w: Column) -> Column:
    """Full-word polynomial char hash ``fold(a*31 + codepoint) mod 1000003``.

    Unlike :func:`word_code` (first/last char + length — fine for banding,
    degenerate as a set-element hash because its tiny range collapses MinHash
    minima across unrelated documents), this walks every character, so
    distinct words map to near-uniform values. ANSI-reproducible: both Spark
    ``aggregate`` (init 0) and DuckDB ``list_reduce`` (first element as init)
    compute the identical left fold because ``0*31 + c1 = c1``."""
    codes = F.transform(F.split(w, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(codes, F.lit(0).cast("bigint"),
                       lambda a, x: F.pmod(a * 31 + x, F.lit(1_000_003)))


def word_hashes(text: Column | str) -> Column:
    return F.transform(words(text), word_hash)


def shingle_hashes_from(wh: Column, n: int = 3) -> Column:
    """Distinct word-``n``-gram shingle hashes from a word-hash array column
    (Broder's MinHash domain: shingles, not unigrams — unigram sets over a
    small vocabulary make nearly every pair look similar). Shingle value is
    the exact base-1000003 positional mix of the member word hashes — max
    ``1000002 * (B^2 + B + 1) ~ 1.000009e18`` for n=3, inside int64, so no
    modulus is needed and the SQL mirror is exact.

    Built with ``zip_with`` over shifted slices (each references ``wh`` once)
    rather than per-index ``element_at`` lambdas: interpreted HOFs have no
    common-subexpression elimination, so an ``element_at(wh, i)`` inside a
    lambda re-evaluates the whole upstream ``wh`` expression per element.
    IMPORTANT for callers: materialize ``wh`` as a projected column first
    (``df.withColumn("wh", word_hashes(...))``) so it is computed once per
    row; passing the raw ``word_hashes(text)`` tree here still evaluates it
    ``n + 1`` times per row."""
    B = F.lit(1_000_003).cast("bigint")
    m = F.size(wh) - (n - 1)
    acc = F.slice(wh, 1, m)
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(wh, 1 + j, m), lambda a, x: a * B + x)
    return F.when(F.size(wh) >= n, F.array_distinct(acc)).otherwise(
        F.array().cast("array<bigint>"))


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Convenience composition of :func:`word_hashes` +
    :func:`shingle_hashes_from`. For hot paths, stage the word-hash array as
    its own projection (see ``operators/dedup.jaccard_lsh_pairs``)."""
    return shingle_hashes_from(word_hashes(text), n)


def minhash_signature_shingles(text: Column | str, k: int = 8, n: int = 3) -> list[Column]:
    """k MinHash components over the shingle set: ``min((a_i*(s mod p) + b_i)
    mod p)`` (the reduction ``s mod p`` keeps the product inside int64).
    Aliased ``mh0..mh{k-1}``; same permutation coefficients as
    :func:`minhash_signature`."""
    sh = shingle_hashes(text, n)

    def perm(a: int, b: int):
        return lambda s: F.pmod(F.pmod(s, F.lit(HASH_PRIME)) * a + b, F.lit(HASH_PRIME))

    sig = []
    for i in range(k):
        a, b = 1_103_515_245 + 2 * i + 1, 12_345 + 7919 * i
        sig.append(F.array_min(F.transform(sh, perm(a, b))).alias(f"mh{i}"))
    return sig


def stopword_ratio(text: Column | str) -> Column:
    ws = words(text)
    stop = F.filter(ws, lambda w: w.isin(*STOPWORDS))
    return F.when(F.size(ws) > 0, F.size(stop).cast("double") / F.size(ws)).otherwise(F.lit(0.0))


def mean_word_len(text: Column | str) -> Column:
    ws = words(text)
    total = F.aggregate(ws, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w).cast("bigint"))
    return F.when(F.size(ws) > 0, total.cast("double") / F.size(ws)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    mean word length band + repetition penalty (distinct/total words)."""
    ws = words(text)
    n = F.size(ws)
    length_ok = F.when((n >= 10) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    mwl = mean_word_len(text)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    rep = F.when(n > 0, F.size(F.array_distinct(ws)).cast("double") / n).otherwise(F.lit(0.0))
    return F.round((length_ok + stop_ok + mwl_ok + rep) / 4.0, 6)


def lang_id(text: Column | str) -> Column:
    """Heuristic language guess from character-class evidence: scripts first
    (CJK / Cyrillic via code points), then an English stopword vote. Returns
    'zh', 'ru', 'en' or 'other'. Deterministic + oracle-reproducible."""
    t = _c(text)
    first_cp = F.ascii(t)  # code point of first char (engine-agnostic)
    ws = words(t)
    en_hits = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    return (
        # bounded CJK Unified Ideographs block: an open-ended >= 0x4E00 would
        # misclassify astral-plane chars (emoji U+1F600 = 128512) as zh
        F.when((first_cp >= 0x4E00) & (first_cp <= 0x9FFF), F.lit("zh"))
        .when((first_cp >= 0x0400) & (first_cp < 0x0500), F.lit("ru"))
        .when(en_hits >= 1, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def doc_fingerprint(text: Column | str, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive rolling fingerprint over word codes:
    ``h = (h * 31 + code(w)) mod m`` — the text-side analogue of
    ``tok_fingerprint``."""
    return F.aggregate(
        word_codes(text),
        F.lit(0).cast("bigint"),
        lambda a, x: F.pmod(a * 31 + x, F.lit(mod)),
    )


def minhash_signature_from(codes: Column, k: int = 8) -> list[Column]:
    """k MinHash components over a STAGED word-code array column:
    ``min((a_i*c + b_i) mod p)``, aliased ``mh0..mh{k-1}``. Stage the codes
    as their own projection (``df.withColumn("codes", word_codes(...))``)
    so the interpreted HOF permutations don't re-evaluate the code tree
    once per component."""
    def perm(a: int, b: int):
        # factory: PySpark derives HOF arity from the lambda signature, so
        # coefficients must be closed over, not bound as default args
        return lambda c: F.pmod(c * a + b, F.lit(HASH_PRIME))

    sig = []
    for i in range(k):
        a, b = 1_103_515_245 + 2 * i + 1, 12_345 + 7919 * i
        sig.append(F.array_min(F.transform(codes, perm(a, b))).alias(f"mh{i}"))
    return sig


def minhash_signature(text: Column | str, k: int = 8) -> list[Column]:
    """k MinHash components over the word-code set (convenience composition;
    hot paths should stage the codes column and use
    :func:`minhash_signature_from`)."""
    return minhash_signature_from(word_codes(text), k)


def simhash(text: Column | str, bits: int = 16) -> Column:
    """SimHash over word codes: per-bit majority vote of ``(code*a+b) mod p``
    bit b; returns a ``bits``-wide bigint. Near-duplicate docs have small
    Hamming distance."""
    codes = word_codes(text)
    hashed = F.transform(codes, lambda c: F.pmod(c * 2_654_435_761 + 104_729, F.lit(HASH_PRIME)))

    def vote_fn(b: int):
        return lambda a, h: a + (F.shiftright(h, b).cast("bigint") % 2) * 2 - 1

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        vote = F.aggregate(hashed, F.lit(0).cast("bigint"), vote_fn(b))
        out = out + F.when(vote > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return out


def winnow_fingerprints_from(wh: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    MOSS algorithm — public): slide a ``w``-window over the POSITIONAL
    ``k``-gram shingle-hash sequence and keep each window's minimum; the
    distinct sorted minima are the fingerprint set.  Guarantee inherited
    from the paper: any shared run of ``w + k - 1`` words between two
    documents contributes at least one common fingerprint — unlike MinHash
    (a similarity *estimate*), winnowing is a *detection* primitive with a
    coverage guarantee, at ~|shingles|/w fingerprints per document.

    Simplification vs the paper, stated: fingerprints are the minima
    VALUES (deduplicated), not (value, position) pairs with the
    rightmost-tie rule — the set is what equi-join candidate generation
    consumes, and dropping positions cannot lose a detection (the shared
    window still contributes its minimum value to both documents).

    Positional shingles (``shingle_hashes_from`` without its distinct) via
    the same zip-shifted-slices construction; exact int64 arithmetic, so
    the DuckDB mirror reproduces every fingerprint bit-for-bit.  Stage
    ``wh`` as a projected column (see ``shingle_hashes_from``)."""
    B = F.lit(1_000_003).cast("bigint")
    m = F.size(wh) - (k - 1)
    acc = F.slice(wh, 1, m)
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(wh, 1 + j, m), lambda a, x: a * B + x)
    hs = F.when(F.size(wh) >= k, acc).otherwise(
        F.array().cast("array<bigint>"))
    nwin = F.size(hs) - (w - 1)
    mins = F.transform(F.sequence(F.lit(0), nwin - 1),
                       lambda i: F.array_min(F.slice(hs, i + 1, w)))
    short = F.when(F.size(hs) > 0, F.array(F.array_min(hs))).otherwise(
        F.array().cast("array<bigint>"))
    return F.array_sort(F.array_distinct(
        F.when(F.size(hs) >= w, mins).otherwise(short)))


def winnow_fingerprints(text: Column | str, k: int = 3, w: int = 4) -> Column:
    """Convenience composition over :func:`word_hashes` (hot paths: stage
    the word-hash array first)."""
    return winnow_fingerprints_from(word_hashes(text), k, w)


# --- BPE-ish regex pre-tokenization ---------------------------------------
#
# The GPT-2 pre-tokenizer splits text into merge-candidate pieces BEFORE the
# byte-pair merges: contraction suffixes, space-prefixed letter runs,
# space-prefixed digit runs, space-prefixed punctuation runs, whitespace
# runs.  The canonical pattern uses a lookahead (``\s+(?!\S)``) that RE2
# (DuckDB) doesn't support, so this variant drops it — a multi-space run
# becomes one whitespace token instead of splitting its last space onto the
# next word.  Every construct used (``\p{L}``/``\p{N}`` Unicode classes,
# ASCII ``\s``, non-capturing alternation, leftmost-first greedy matching)
# behaves identically in Java regex (Spark, JVM-side) and RE2 (DuckDB), so
# the oracle replays it verbatim — pinned by a randomized cross-engine sweep
# in tests/test_text_functions.py.

BPE_SPLIT_PATTERN = \
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_pretokenize(text: Column | str) -> Column:
    """BPE-ish pre-token pieces (``array<string>``), JVM-side
    ``regexp_extract_all`` — the match set covers the input exactly (every
    character lands in one piece), so ``concat_ws('', ...)`` round-trips."""
    return F.regexp_extract_all(_c(text), F.lit(BPE_SPLIT_PATTERN), 0)


def bpe_token_count(text: Column | str) -> Column:
    """Count of non-whitespace BPE pre-tokens (bigint) — the "token budget"
    estimate a training pipeline bins documents by."""
    return F.size(F.filter(bpe_pretokenize(text),
                           lambda t: t.rlike(r"\S"))).cast("bigint")


def hashed_bow(wh: Column, dim: int = 32) -> Column:
    """Hashing-trick bag-of-words vector (``array<bigint>`` of length
    ``dim``): bucket ``d`` counts the words whose portable hash lands in
    ``hash % dim`` — the fixed-width featurizer (Weinberger et al. 2009)
    that turns unbounded vocabularies into constant-size vectors with no
    vocabulary table, no fit step, and no shuffle (a CountVectorizer
    needs a corpus pass + broadcast; the hashing trick needs neither).

    Per-row O(dim * n_words) Catalyst (one ``filter`` per bucket) — the
    right trade at feature dims (16-256); pass a MATERIALIZED word-hash
    column (``withColumn("wh", word_hashes(...))``), not the raw
    expression tree: interpreted HOFs have no common-subexpression
    elimination, so an inline tree would be re-evaluated per bucket
    (the ``shingle_hashes_from`` caller rule).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.size(F.filter(wh, lambda x: F.pmod(x, F.lit(dim)) == d))
        .cast("bigint"))


# Unicode script classes as explicit codepoint ranges — NOT \p{...}
# properties, which Java (Unicode 15) and RE2 (DuckDB) bind to different
# Unicode versions; literal ranges mean both engines count the same set.
SCRIPT_PATTERNS: dict[str, str] = {
    "latin": "[A-Za-z]",
    "digit": "[0-9]",
    "cyr": f"[{chr(0x0400)}-{chr(0x04FF)}]",
    "cjk": f"[{chr(0x4E00)}-{chr(0x9FFF)}]",
    "space": "[ \t\n\r]",
}


def script_counts(text: Column | str) -> dict[str, Column]:
    """Per-script codepoint counts of a string — the script-mix signal a
    multilingual pipeline routes and filters on (mixed-script text is a
    classic spam/injection indicator; per the public CLD/fastText
    language-ID literature, script class is the first routing key).

    Returns ``{class: count}`` for latin/digit/cyr/cjk/space plus
    ``n_cp`` (total codepoints).  Each count is
    ``length(s) - length(regexp_replace(s, class, ''))`` — pure per-row
    Catalyst, zero shuffle, and the same arithmetic the DuckDB mirror
    runs (with the ``'g'`` flag; RE2 replaces first-match-only by
    default where Java replaces all).
    """
    t = _c(text)
    n = F.length(t).cast("bigint")
    out: dict[str, Column] = {"n_cp": n}
    for name, pat in SCRIPT_PATTERNS.items():
        out[name] = (n - F.length(F.regexp_replace(t, pat, ""))
                     .cast("bigint"))
    return out


def script_counts_sql(text_expr: str = "text") -> dict[str, str]:
    """The identical counts as DuckDB SQL expressions."""
    n = f"CAST(length({text_expr}) AS BIGINT)"
    out = {"n_cp": n}
    for name, pat in SCRIPT_PATTERNS.items():
        p = pat.replace("'", "''")
        out[name] = (f"({n} - CAST(length(regexp_replace({text_expr}, "
                     f"'{p}', '', 'g')) AS BIGINT))")
    return out

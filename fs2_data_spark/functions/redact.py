"""PII / sensitive-span redaction — the scrubbing pass of a training-data
pipeline: replace emails, URLs, IPv4 addresses and long digit runs (card /
account numbers) with typed placeholder tokens, and count per-kind matches
for filtering stats.

Engineered for scale and for the oracle in one move: every pattern uses only
constructs with identical semantics in Java regex (Spark, JVM whole-stage
codegen — zero Python, zero shuffle) and RE2 (DuckDB): character classes
(including Unicode ``\\p{L}``/``\\p{N}``), bounded repetition, non-capturing
groups. No lookarounds, no pattern backreferences.

**No ``\\b``** — the adversarial cross-engine sweep (tests/test_redact.py)
found that Java's ``\\b`` is Unicode-aware (``ü`` is a word char) while
RE2's is ASCII-only, so ``1.2.3.4über`` redacts in DuckDB but not in Spark.
Word boundaries are instead expressed structurally: the pattern *consumes*
one explicit non-word character (``[^\\p{L}\\p{N}_]``) or anchor on each
side and the replacement *restores* it via group references (``$1``/``$3``
in Java, ``\\1``/``\\3`` in RE2 — replacement syntax differs, semantics
don't). Because a consumed boundary char is unavailable to the next match
in the same scan, bounded kinds are applied in TWO passes — two matches
separated by a single boundary char land in alternating passes, and two
passes are always sufficient (after pass 1 every remaining true match
borders a placeholder or an unconsumed char). Counts use the same two-pass
scheme: matches on the original plus matches on the once-redacted text.

Redaction is a fixed chain applied in a defined order (URL first so an
email inside a URL is swallowed by the URL token, then email, IPv4, digit
runs); counts are taken per-kind on the ORIGINAL text (overlaps counted
per kind, deterministically in both engines).

At 100 TB this is the ideal operator shape: a pure per-row projection riding
the scan — no exchange, no Python tier, trivially linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# one explicit "not a word character" — Unicode letter/digit/underscore,
# matching Java \b's word-char set so the spec follows the shipping engine
_B = r"[^\p{L}\p{N}_]"

# kind -> (pattern, replacement-core, bounded?); bounded patterns carry the
# consume-restore boundary groups and are applied/counted in two passes.
PII_PATTERNS: dict[str, tuple[str, str, bool]] = {
    "url": (r"https?://[^\s]+", "<URL>", False),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>", False),
    "ipv4": (rf"(^|{_B})((?:\d{{1,3}}\.){{3}}\d{{1,3}})($|{_B})",
             "<IP>", True),
    "digits": (rf"(^|{_B})(\d{{13,19}})($|{_B})", "<NUM>", True),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _repl(core: str, bounded: bool) -> str:
    """Java replacement string: restore the consumed boundary chars."""
    return f"$1{core}$3" if bounded else core


def redact(text: Column | str,
           kinds: tuple[str, ...] = ("url", "email", "ipv4", "digits"),
           ) -> Column:
    """Text with every match of the selected kinds replaced by its
    placeholder, applied in ``PII_PATTERNS`` order (bounded kinds twice —
    see module docstring)."""
    out = _c(text)
    for kind in PII_PATTERNS:       # canonical order, not caller order
        if kind in kinds:
            pat, core, bounded = PII_PATTERNS[kind]
            out = F.regexp_replace(out, pat, _repl(core, bounded))
            if bounded:
                out = F.regexp_replace(out, pat, _repl(core, bounded))
    return out


def pii_counts(text: Column | str) -> list[Column]:
    """One ``n_<kind>`` bigint count column per pattern, measured on the
    original text (bounded kinds: pass-1 matches plus matches freed by
    pass-1 replacement)."""
    cols = []
    for kind, (pat, core, bounded) in PII_PATTERNS.items():
        n = F.size(F.regexp_extract_all(_c(text), F.lit(pat), 0))
        if bounded:
            once = F.regexp_replace(_c(text), pat, _repl(core, bounded))
            n = n + F.size(F.regexp_extract_all(once, F.lit(pat), 0))
        cols.append(n.cast("bigint").alias(f"n_{kind}"))
    return cols


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """``df`` plus the redacted text and per-kind match counts."""
    return df.select(
        "*", redact(text_col).alias(out_col), *pii_counts(text_col))


def _sql_q(s: str) -> str:
    return s.replace("'", "''")


def _sql_repl(core: str, bounded: bool) -> str:
    """RE2 replacement string: group refs are ``\\1``/``\\3``."""
    return f"\\1{core}\\3" if bounded else core


def redact_sql(text_expr: str) -> str:
    """The identical redaction chain as DuckDB SQL (RE2, ``'g'`` flag —
    Spark's regexp_replace is global by default)."""
    out = text_expr
    for pat, core, bounded in PII_PATTERNS.values():
        def call(inner: str, pat=pat, core=core, bounded=bounded) -> str:
            return (f"regexp_replace({inner}, '{_sql_q(pat)}', "
                    f"'{_sql_q(_sql_repl(core, bounded))}', 'g')")
        out = call(out)
        if bounded:
            out = call(out)
    return out


def pii_counts_sql(text_expr: str) -> list[str]:
    """DuckDB mirrors of :func:`pii_counts` (aliased ``n_<kind>``)."""
    exprs = []
    for kind, (pat, core, bounded) in PII_PATTERNS.items():
        p = _sql_q(pat)
        n = f"len(regexp_extract_all({text_expr}, '{p}', 0))"
        if bounded:
            once = (f"regexp_replace({text_expr}, '{p}', "
                    f"'{_sql_q(_sql_repl(core, bounded))}', 'g')")
            n = f"({n} + len(regexp_extract_all({once}, '{p}', 0)))"
        exprs.append(f"{n} AS n_{kind}")
    return exprs

"""Inverted-index construction: term-level posting lists over a text
corpus — the retrieval-side artifact of the pipeline (BM25/df stats,
candidate lookup for the dedup and similarity tiers).

Reference heritage: fs2-data materializes queryable views of a token
stream (``json/src/main/scala/fs2/data/json/ast/package.scala`` builds
values from tokens; the index below builds term views from the same
kind of flattened stream), one pass, no revisiting.

Determinism contract: tokenization is the engine's whitespace
``words()`` (mirrored by ``list_filter(string_split(...))`` in SQL);
counts are exact; posting lists are SORTED with a total order
(tf desc, doc_id asc) and CAPPED at a disclosed length — never the
arbitrary arrival order of ``collect_list``.

Scale notes (100 TB): one explode + a (term, doc) tf aggregation
(map-side combined), then everything is keyed by term — the stats
aggregate, the capping window, the top collection, and the final join
all share the term partitioning (Catalyst reuses one exchange).  The
posting array is capped BEFORE collection by a per-term ranked window —
a stopword's full posting list would otherwise be corpus-sized in one
row (the classic inverted-index skew), so the cap is a
correctness-of-scale feature, not a shortcut; ``df``/``cf`` remain
exact over ALL occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fs2_data_spark.functions.text import words


def posting_lists(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Build term posting lists: per term, the exact document frequency
    ``df`` (distinct docs), collection frequency ``cf`` (total
    occurrences), and the top-``max_postings`` doc ids ordered by
    (tf desc, doc_id asc) — the deterministic head of the posting list
    (what a tiered/impact-ordered index stores first).

    ``min_df`` drops hapax/noise terms before materializing arrays.
    Output: ``term, df, cf, postings`` (``postings`` =
    ``array<bigint>``).
    """
    from pyspark.sql import Window

    tok = (df.select(F.col(id_col).alias("_doc"),
                     F.explode(words(F.col(text_col))).alias("term")))
    tf = (tok.groupBy("term", "_doc")
          .agg(F.count(F.lit(1)).alias("_tf")))
    stats = (tf.groupBy("term")
             .agg(F.count(F.lit(1)).alias("df"),
                  F.sum("_tf").alias("cf"))
             .filter(F.col("df") >= int(min_df)))
    # cap BEFORE collecting: a stopword's full posting list is
    # corpus-sized — the window keeps at most max_postings rows per term
    # in flight, so no term ever materializes an unbounded array
    wr = Window.partitionBy("term").orderBy(F.col("_tf").desc(),
                                            F.col("_doc"))
    tops = (tf.withColumn("_rn", F.row_number().over(wr))
            .filter(F.col("_rn") <= int(max_postings))
            .groupBy("term")
            .agg(F.transform(
                F.sort_array(F.collect_list(
                    F.struct(F.col("_rn").alias("r"),
                             F.col("_doc").alias("d")))),
                lambda s: s["d"]).alias("postings")))
    return (stats.join(tops, on="term")
            .select("term", "df", "cf", "postings"))


def zipf_slope(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_v: int = 1000,
    round_dp: int = 6,
) -> DataFrame:
    """Zipf rank-frequency slope of the corpus vocabulary: OLS fit of
    ``ln(freq)`` against ``ln(rank)`` over the top-``top_v`` terms —
    natural corpora sit near slope -1; template/boilerplate floods
    flatten the head and machine-generated noise steepens the tail, so
    the fitted slope is a one-number corpus-health audit (the
    vocabulary analogue of the Benford screen).

    Ranks are deterministic (freq desc, term asc) over the VOCABULARY
    aggregate — vocab-bounded, never corpus-bounded (the corpus-sized
    pass is the one exploding count; at an extreme vocabulary swap the
    rank window for ``dedup.global_rank``).  The cap is disclosed in
    the output (``v_used``); hapax-heavy tails are deliberately
    excluded (they bend the log-log line and swamp the head signal).

    Determinism: term frequencies are exact; per-term ``ln`` values are
    IEEE on exact ints; OLS moments use the module discipline (9-dp
    terms, DECIMAL(38,12) sums); slope/intercept are single IEEE chains
    rounded to ``round_dp``.

    Output ONE row: ``v_used, slope, intercept``.
    """
    from pyspark.sql import Window

    freq = (df.select(F.explode(words(F.col(text_col))).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("_f")))
    # top-v selection as TakeOrderedAndProject (parallel partial top-k +
    # driver merge), then ranks assigned over the CONSTANT-bounded top_v
    # rows — never a vocabulary-wide single-partition rank window
    # (VERDICT r05 #5); same total order, identical ranks
    wr = Window.partitionBy().orderBy(F.col("_f").desc(), F.col("term"))
    top = (freq.orderBy(F.col("_f").desc(), F.col("term"))
           .limit(int(top_v))
           .withColumn("_r", F.row_number().over(wr)))
    x = F.log(F.col("_r").cast("double"))
    y = F.log(F.col("_f").cast("double"))
    dec = "decimal(38,12)"
    agg = (top.select(F.round(x, 9).alias("_x"), F.round(y, 9).alias("_y"),
                      F.round(x * y, 9).alias("_xy"),
                      F.round(x * x, 9).alias("_xx"))
           .agg(F.count(F.lit(1)).alias("v_used"),
                F.sum(F.col("_x").cast(dec)).cast("double").alias("_sx"),
                F.sum(F.col("_y").cast(dec)).cast("double").alias("_sy"),
                F.sum(F.col("_xy").cast(dec)).cast("double").alias("_sxy"),
                F.sum(F.col("_xx").cast(dec)).cast("double").alias("_sxx")))
    n = F.col("v_used").cast("double")
    denom = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(denom > 0, F.round(
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / denom,
        round_dp))
    intercept = F.when(denom > 0, F.round(
        (F.col("_sy") - ((n * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
                         / denom) * F.col("_sx")) / n, round_dp))
    return agg.select("v_used", slope.alias("slope"),
                      intercept.alias("intercept"))


def stylometry_delta(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group: str = "source",
    top_v: int = 50,
    round_dp: int = 6,
) -> DataFrame:
    """Burrows' Delta between corpus groups: z-score each group's
    relative frequency of the top-``top_v`` corpus words against the
    across-group mean/std, then Delta(a, b) = mean |z_a - z_b| — the
    stylometry classic (function-word profiles fingerprint a generator:
    two crawls of the same template farm land near 0; human vs
    synthetic sources separate) and a source-similarity weight the
    mixing tier can consume directly.

    Pipeline (all group/vocab-bounded after the one corpus-sized
    explode+count): top words by corpus frequency (deterministic
    (freq desc, term) rank over the vocab aggregate); the full
    word x group grid (absent words keep relative frequency 0 —
    dropping them would bias every z); per-word across-group mean and
    SAMPLE std of the relative frequencies; per-pair fold of
    |z_a - z_b| over the ``top_v`` words.

    Determinism: counts exact; relative frequencies/means/stds are IEEE
    chains on exact ints with the module's 9-dp-term DECIMAL(38,12)
    folds; words with across-group std == 0 are EXCLUDED from every
    pair's mean (z undefined; the divisor ``v_used`` is reported).
    Groups must number >= 2 (sample std needs n-1).

    Output per pair (``a < b``): ``a, b, v_used, delta``.
    """
    tok = (df.select(F.col(group).alias("_g"),
                     F.explode(words(F.col(text_col))).alias("term"))
           .groupBy("_g", "term").agg(F.count(F.lit(1)).alias("_c")))
    tok = tok.persist()
    corpus = tok.groupBy("term").agg(F.sum("_c").alias("_ct"))
    # vocabulary top-v via TakeOrderedAndProject instead of a vocab-wide
    # single-partition rank window (VERDICT r05 #5): the rank column was
    # only used for the <= top_v cut, so limit() on the same total order
    # selects the identical term set
    top = (corpus.orderBy(F.col("_ct").desc(), F.col("term"))
           .limit(int(top_v)).select("term"))
    # a group with zero tokens has no frequency profile: exclude it
    # (0/0 would NaN-poison every z through the decimal casts)
    totals = (tok.groupBy("_g").agg(F.sum("_c").alias("_ng"))
              .filter(F.col("_ng") > 0))
    grid = (totals.crossJoin(F.broadcast(top))
            .join(tok, on=["_g", "term"], how="left")
            .fillna({"_c": 0}))
    f = F.round(F.col("_c").cast("double") / F.col("_ng").cast("double"),
                9)
    grid = grid.withColumn("_f", f)
    dec = "decimal(38,12)"
    stats = (grid.groupBy("term")
             .agg(F.count(F.lit(1)).alias("_k"),
                  F.sum(F.col("_f").cast(dec)).cast("double").alias("_sf"),
                  F.sum(F.round(F.col("_f") * F.col("_f"), 9).cast(dec))
                  .cast("double").alias("_sff")))
    kk = F.col("_k").cast("double")
    mean = F.col("_sf") / kk
    var = (F.col("_sff") - kk * mean * mean) / (kk - F.lit(1.0))
    stats = (stats.withColumn("_mu", mean)
             .withColumn("_sd", F.when(var > 0, F.sqrt(var)))
             .filter(F.col("_sd").isNotNull())
             .select("term", "_mu", "_sd"))
    z = (grid.join(F.broadcast(stats), on="term")
         .select("term", "_g",
                 F.round((F.col("_f") - F.col("_mu")) / F.col("_sd"), 9)
                 .alias("_z")))
    a = z.select(F.col("_g").alias("a"), "term", F.col("_z").alias("_za"))
    b = z.select(F.col("_g").alias("b"), "term", F.col("_z").alias("_zb"))
    pairs = (a.join(b, on="term")
             .filter(F.col("a") < F.col("b")))
    return (pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("v_used"),
                 F.round(F.sum(F.round(F.abs(F.col("_za") - F.col("_zb")),
                                       9).cast(dec)).cast("double")
                         / F.count(F.lit(1)).cast("double"), round_dp)
                 .alias("delta")))


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed query-term
    set (Robertson/Sparck-Jones probabilistic relevance framework) —
    the retrieval-side ranking the pipeline serves after posting-list
    construction, and the lexical half of hybrid (BM25 + dense) search.

    ``score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))``
    with ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``.

    Determinism contract: every cross-row SUM (doc lengths, per-doc
    score) accumulates in DECIMAL; the per-row contribution is a fixed
    IEEE expression tree replicated verbatim by ``bm25_oracle_sql`` with
    repr-embedded constants, so both engines chain the same doubles
    (``ln`` is the one libm call — 1-ulp class, rounded away at 6 dp).

    Scale notes (100 TB): the query-term filter lands BEFORE the tf
    aggregation (only matching postings shuffle — the explode itself
    never materializes); corpus stats (N, total length) and the
    |terms|-row df table broadcast back, so the whole query is one
    (doc, term) shuffle plus one doc-keyed shuffle joining dl.  Docs
    with no query term never leave the map side.
    """
    t = (df.select(F.col(id_col).alias("_doc"),
                   words(F.col(text_col)).alias("_ws")))
    dl = t.select("_doc", F.size("_ws").cast("bigint").alias("_dl"))
    st = dl.agg(F.count(F.lit(1)).alias("_n"),
                F.sum("_dl").alias("_tot"))
    tf = (t.select("_doc", F.explode("_ws").alias("term"))
          .filter(F.col("term").isin(list(terms)))
          .groupBy("_doc", "term").agg(F.count(F.lit(1)).alias("_tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    k1 = float(k1)
    b = float(b)
    omb = 1.0 - b
    k1p1 = k1 + 1.0
    half = 0.5
    one = 1.0
    row = (tf.join(F.broadcast(dfreq), on="term")
           .join(dl, on="_doc")
           .crossJoin(F.broadcast(st)))
    avgdl = F.col("_tot").cast("double") / F.col("_n").cast("double")
    idf = F.log(((F.col("_n") - F.col("_df")).cast("double") + F.lit(half))
                / (F.col("_df").cast("double") + F.lit(half)) + F.lit(one))
    denom = (F.col("_tf").cast("double")
             + F.lit(k1) * (F.lit(omb)
                            + F.lit(b) * (F.col("_dl").cast("double")
                                          / avgdl)))
    contrib = idf * (F.col("_tf").cast("double") * F.lit(k1p1)) / denom
    return (row.select("_doc", contrib.alias("_c"))
            .groupBy("_doc")
            .agg(F.count(F.lit(1)).alias("n_hit"),
                 F.sum(F.col("_c").cast("decimal(38,28)")).cast("double")
                 .alias("score"))
            .select(F.col("_doc").alias(id_col), "n_hit", "score"))


def bm25_oracle_sql(
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`bm25_scores` over the ``documents`` view —
    the identical expression tree with repr-embedded double constants
    (DuckDB's bare decimals would round differently)."""
    k1 = float(k1)
    b = float(b)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    D = lambda v: f"CAST('{repr(v)}' AS DOUBLE)"  # noqa: E731
    avgdl = "(CAST(st.tot AS DOUBLE) / CAST(st.N AS DOUBLE))"
    idf = (f"ln((CAST(st.N - dfq.df AS DOUBLE) + {D(0.5)})"
           f" / (CAST(dfq.df AS DOUBLE) + {D(0.5)}) + {D(1.0)})")
    denom = (f"(CAST(tf.tf AS DOUBLE) + {D(k1)} * ({D(1.0 - b)}"
             f" + {D(b)} * (CAST(dl.dl AS DOUBLE) / {avgdl})))")
    return f"""
WITH w AS (SELECT doc_id AS d,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
dl AS (SELECT d, CAST(len(ws) AS BIGINT) AS dl FROM w),
st AS (SELECT count(*) AS N, SUM(dl) AS tot FROM dl),
tf AS (SELECT d, word AS term, count(*) AS tf
       FROM (SELECT d, unnest(ws) AS word FROM w)
       WHERE word IN ({in_list}) GROUP BY d, word),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
c AS (SELECT tf.d,
             {idf} * (CAST(tf.tf AS DOUBLE) * {D(k1 + 1.0)}) / {denom} AS c
      FROM tf JOIN dfq USING (term) JOIN dl USING (d) CROSS JOIN st)
SELECT d AS doc_id, CAST(count(*) AS BIGINT) AS n_hit,
       ROUND(CAST(SUM(CAST(c AS DECIMAL(38,28))) AS DOUBLE),
             {int(round_dp)}) AS score
FROM c GROUP BY d
"""

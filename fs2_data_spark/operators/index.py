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

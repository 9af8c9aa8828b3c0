"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "throughput": {...}}

Protocol (BASELINE.md): one untimed warmup of the flagship to heat the
JVM/Arrow path, then each query timed around a ``noop``-format write (forces
full materialization, no driver collect), min of 2 passes per query (this
host's single-shot timings swing up to 3x). The flagship pipeline also reports
sequences/sec and tokens/sec — the BASELINE.json metric.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from fs2_data_spark.session import get_spark
from fs2_data_spark.tables import write_payload

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# sequences scale with sf: 6M/sf-unit mirrors lineitem's scaling
SEQ_PER_SF = 6_000_000


def _sf_from_dir(d: str) -> float:
    try:
        return float(d.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def payload_dir(spark, sf: float, n_rows: int) -> str:
    """Materialize (once, untimed) the input_hint token + observation tables —
    the pipeline is benchmarked reading parquet, like a production job reads
    Iceberg, not fused with synthetic-data generation."""
    d = os.environ.get("SPARK_GRAFT_PAYLOAD_DIR", f"/tmp/fs2_payload_sf{sf}")
    marker = f"{d}/observations.parquet/_SUCCESS"
    if not os.path.exists(marker):
        write_payload(spark, d, n_rows)
    return d


def flagship(spark, data_dir: str, hot_keys=None, token_features: bool = False):
    """The BASELINE.json pipeline over the input_hint token table:
    point-in-time as-of join + lag/lead + sessionization in one fused
    window plan (one exchange + one sort), emitting the narrow feature
    table (token pages pruned at the scan).

    ``token_features=True`` additionally runs the Arrow-vectorized token
    kernel (tok_fp/sum/mean/min/max) fused into the scan stage. Off by
    default for benchmarking: this sandbox VM serializes many concurrent
    JVM<->Arrow-worker transfers in kernel time (measured 90% sys), which
    is a property of the microVM, not of the plan — on a real cluster the
    kernel stage is embarrassingly parallel.
    """
    from fs2_data_spark.pipeline import pit_feature_pipeline
    seqs = spark.read.parquet(f"{data_dir}/sequences.parquet")
    obs = spark.read.parquet(f"{data_dir}/observations.parquet")
    if token_features:
        from fs2_data_spark.functions.token_kernels import token_features_arrow
        seqs = token_features_arrow(seqs)
    return pit_feature_pipeline(seqs, obs, gap_s=3600, hot_keys=hot_keys)


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def timed_both(mk, passes: int = 2) -> tuple[float, float]:
    """(first_shot, min-of-passes) wall seconds.  Min over short repeats:
    single-shot timings on this host swing up to 3x (shared-VM noise) and
    have produced spurious round-over-round 'regressions'.  BOTH statistics
    are reported (VERDICT r03 #5: r1/r2 were single-shot, r3 switched to
    min-of-2 — publishing the pair for one round re-bases the series; the
    headline stays min-of-2 going forward).  One protocol for the headline
    batch AND the engine rows."""
    first = best = float("inf")
    for i in range(passes):
        t0 = time.perf_counter()
        _noop(mk())
        dt = time.perf_counter() - t0
        if i == 0:
            first = dt
        best = min(best, dt)
    return round(first, 3), round(best, 3)


def timed_min(mk, passes: int = 2) -> float:
    return timed_both(mk, passes)[1]


# docs per sf-unit for the Python-tier engine bench (sf0.1 -> 1M docs).
# r4: raised 2M -> 10M per sf-unit — at 200k docs the ~0.3-0.5 s fixed job
# overhead swamped per-doc kernel cost and the JVM fast paths measured only
# 1.6x instead of their real ~6x; docs/sec at 1M docs is overhead-free to
# within a few percent (cross-round note in BASELINE.md)
ENGINE_DOCS_PER_SF = 10_000_000


def engine_corpus_dir(spark, sf: float) -> str:
    """Materialize (once, untimed) the query-language engine corpus: nested
    JSON, attribute-bearing XML, and CBOR binary columns, ~250 B/doc. The
    timed engine runs read parquet like every other bench query."""
    d = os.environ.get("SPARK_GRAFT_ENGINE_DIR", f"/tmp/fs2_engines_sf{sf}")
    marker = f"{d}/docs.parquet/_SUCCESS"
    if not os.path.exists(marker):
        from fs2_data_spark.sources.binary_codecs import transcode_json_to_cbor
        n = max(int(ENGINE_DOCS_PER_SF * sf), 10_000)
        base = spark.range(n).select(F.col("id").alias("doc_id"))
        i = F.col("doc_id").cast("string")
        js = F.concat(
            F.lit('{"f2":"en","f3":['), i, F.lit(","), (F.col("doc_id") + 1).cast("string"),
            F.lit('],"a":{"b":'), i,
            F.lit(',"c":{"b":'), (F.col("doc_id") + 1).cast("string"),
            F.lit(',"pad":"'), F.repeat(F.lit("x"), 64),
            F.lit('"}},"l":[{"b":'), (F.col("doc_id") + 2).cast("string"),
            F.lit('},{"x":0},{"b":{"deep":['), i, F.lit(']}}]}'),
        ).alias("js")
        xml = F.concat(
            F.lit('<r><item id="'), i, F.lit('" cls="x">t'), i,
            F.lit('</item><sub><item id="'), (F.col("doc_id") + 1).cast("string"),
            F.lit('">u</item><pad>'), F.repeat(F.lit("y"), 64),
            F.lit('</pad></sub><other cls="x">w</other></r>'),
        ).alias("xml")
        df = base.select("doc_id", js, xml)
        df = transcode_json_to_cbor(df, "js", out_col="cbor")
        df.write.mode("overwrite").parquet(f"{d}/docs.parquet")
    return d


def engine_batch(spark, sf: float) -> tuple[dict[str, float], dict[str, dict]]:
    """Time the per-document Python-tier engines (mapInPandas loops — the
    honest tier for recursion Catalyst can't express) and report docs/sec +
    MB/s so their 100 TB cost is measured, not guessed (VERDICT r02 #3)."""
    from fs2_data_spark.functions.jsonq import jq_run, select_path_all
    from fs2_data_spark.functions.render import pretty_json
    from fs2_data_spark.functions.selector import apply_selector
    from fs2_data_spark.functions.xpath import xpath_filter, xpath_texts
    from fs2_data_spark.sources.binary_codecs import transcode_cbor_to_json

    d = engine_corpus_dir(spark, sf)
    docs = spark.read.parquet(f"{d}/docs.parquet")
    n_docs, js_b, xml_b, cbor_b = docs.agg(
        F.count(F.lit(1)), F.sum(F.length("js")), F.sum(F.length("xml")),
        F.sum(F.length("cbor"))).first()

    runs = {
        "engine_jsonpath_descendant": (
            lambda: select_path_all(docs.select("doc_id", "js"), "js", "$..b",
                                    keep=["doc_id"]), js_b),
        "engine_jsonpath_prefixed": (
            lambda: select_path_all(docs.select("doc_id", "js"), "js", "$.a..b",
                                    keep=["doc_id"]), js_b),
        "engine_jq_construct": (
            lambda: jq_run(docs.select("doc_id", "js"), "js",
                           '{ "lang": .f2, "tok": .f3[], "missing": .zz }',
                           keep=["doc_id"]), js_b),
        "engine_selector": (
            lambda: apply_selector(docs.select("doc_id", "js"), "js",
                                   '.a.["b","c"]?', keep=["doc_id"]), js_b),
        "engine_xpath_filter": (
            lambda: xpath_filter(
                docs.select(F.col("doc_id").cast("string").alias("doc_key"), "xml"),
                "xml", '//item[@cls == "x"]|//other[@cls]'), xml_b),
        # JVM fast path (VERDICT r03 #4): same corpus, child-axis query
        # compiled to from_xml + array HOFs — no Python tier
        "engine_xpath_fast": (
            lambda: xpath_texts(
                docs.select(F.col("doc_id").cast("string").alias("doc_key"), "xml"),
                "xml", '/r/item[@cls == "x"]'), xml_b),
        "engine_cbor_to_json": (
            lambda: transcode_cbor_to_json(docs.select("doc_id", "cbor"), "cbor"),
            cbor_b),
        # r4: streaming pretty-printer (Python tier by design — per-doc
        # layout recursion); measured so its 100 TB cost is known
        "engine_pretty_json": (
            lambda: pretty_json(docs.select("doc_id", "js"), "js", width=40),
            js_b),
    }
    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    singles: dict[str, float] = {}
    for name, (mk, nbytes) in runs.items():
        first, dt = timed_both(mk)
        singles[name] = first
        timings[name] = dt
        stats[name] = {
            "docs_per_sec": round(n_docs / dt),
            "mb_per_sec": round(nbytes / dt / 1e6, 1),
        }
    stats["_corpus"] = {"n_docs": int(n_docs),
                        "bytes": {"js": int(js_b), "xml": int(xml_b),
                                  "cbor": int(cbor_b)}}
    return timings, stats, singles


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    n_seq = max(int(SEQ_PER_SF * sf), 10_000)
    spark = get_spark(master=f"local[{CPUS}]", app_name="fs2_data_spark_bench",
                      shuffle_partitions=max(CPUS, 8))

    from fs2_data_spark.queries import REGISTRY
    # asof_join_events_pandas (the Arrow-cogroup alternate strategy) stays
    # oracle-checked but out of the throughput batch: the union strategy is
    # the production plan. jaccard_pairs/ann_lsh_topk are the bucketed scale
    # paths (shingle-MinHash bands, hyperplane LSH).
    headline = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "w_rolling", "w_rank", "locf_backfill", "sessionize_events",
        "session_stats", "asof_join_events",
        "tokenize_docs", "tok_fingerprint_docs", "minhash_band_buckets",
        "simhash_docs", "jaccard_pairs", "ann_cosine_topk", "ann_lsh_topk",
    ]

    data_dir = payload_dir(spark, sf, n_seq)
    n_tok_total = spark.read.parquet(f"{data_dir}/sequences.parquet").agg(
        F.sum("n_tok")).first()[0]
    # hot-key stats = table statistics (ANALYZE-style), computed once untimed
    from fs2_data_spark.operators.segmented import detect_hot_keys
    hot = detect_hot_keys(
        spark.read.parquet(f"{data_dir}/sequences.parquet").drop("tokens"),
        "doc_id", min_rows=max(n_seq // 20, 100_000))

    # warmup (untimed): one flagship run heats codegen + Arrow + page cache
    _noop(flagship(spark, data_dir, hot_keys=hot))

    timings: dict[str, float] = {}
    singles: dict[str, float] = {}
    singles["flagship_asof_features"], timings["flagship_asof_features"] = \
        timed_both(lambda: flagship(spark, data_dir, hot_keys=hot))

    for name in headline:
        fn, _sql = REGISTRY[name]
        singles[name], timings[name] = timed_both(lambda: fn(spark, SF_DIR))

    # r5 training-pipeline operators: timed and reported per-query, but NOT
    # part of `value` (which keeps the r1 flagship+headline definition so
    # round-over-round totals stay comparable)
    extra = ["mix_sample_docs", "pack_sequences_docs", "tok_vocab_topk",
             "dedup_cluster_docs", "dup_token_spans", "decontaminate_docs",
             "split_assign_docs", "unigram_quality_docs",
             "curriculum_buckets_docs", "chunk_tokens_docs",
             "bpe_pretok_docs", "redact_pii_docs", "tfidf_topk_docs",
             "preprocess_pipeline_docs", "bpe_learn_docs",
             "winnow_fp_docs", "bigram_quality_docs", "novelty_docs",
             "w_median_events", "gopher_rules_docs", "segment_dedup_docs",
             "kmv_distinct_docs", "cms_counts_docs", "nb_classifier_docs",
             # r5 late batch 2
             "pmi_bigrams_docs", "boilerplate_segments_docs",
             "semantic_dedup_emb", "w_multi_horizon_events",
             "time_bucket_cascade_events", "length_buckets_docs",
             "negative_pairs_docs", "asof_join_events_forward",
             "asof_join_events_nearest", "cdc_dedup_stats_docs",
             # r5 late batch 3: PIT feature encoders, sketches, projection
             "vocab_merge_docs", "resample_docs", "ann_quantized_topk",
             "hll_distinct_docs", "source_jaccard_docs",
             "hll_trailing_users_events", "top_ngram_docs",
             "pit_zscore_events", "pit_target_encode_events",
             "hist_quantiles_docs", "emb_jl_project", "time_folds_events",
             "winsorize_events", "scd2_intervals_events",
             "hashed_bow_docs", "loss_mask_docs", "fim_docs",
             "asof_multi_events", "gapfill_locf_events",
             "gapfill_interp_events", "twa_events", "tok_entropy_docs",
             "snm_pairs_docs", "bloom_prune_docs", "epoch_shuffle_docs",
             "key_skew_audit_events", "ohlc_events",
             "rank_normalize_events", "exact_split_docs",
             "robust_scale_events", "equidepth_bins_events",
             "oov_rate_docs", "w_trailing_distinct_events",
             "pit_robust_z_events", "seasonal_baseline_events",
             "interarrival_events", "psi_drift_events", "cusum_events",
             "kl_source_docs", "edit_pairs_docs", "skipgram_pairs_docs",
             "k_anonymity_events", "session_transitions_events",
             "trend_slope_events", "mi_features_events",
             "future_labels_events", "session_cooccurrence_events",
             "calibration_events", "ks_drift_events", "funnel_events",
             "cohort_retention_events", "kaplan_meier_events",
             "cramers_v_events", "conformal_events", "auc_events",
             "gini_sources_docs", "benford_docs", "pps_sample_docs",
             "qnorm_docs", "rrf_events", "posting_lists_docs",
             "grid_corr_events", "attribution_events",
             "snapshot_features_events", "zipf_slope_docs",
             "js_source_docs", "session_trigrams_events",
             "expectations_events", "stylometry_docs",
             "changepoint_events", "weighted_median_docs",
             "centroid_matrix_emb", "scd2_lookup_events",
             "pagerank_events", "bm25_scores_docs", "dsir_weights_docs",
             "script_mix_docs", "mmr_select_emb", "temperature_mix_docs",
             "budget_select_docs", "label_prop_events",
             "mann_whitney_events", "chi2_keywords_docs",
             "triangle_events", "autocorr_events", "heaps_curve_docs"]
    extra_timings: dict[str, float] = {}
    for name in extra:
        fn, _sql = REGISTRY[name]
        singles[name], extra_timings[name] = timed_both(lambda: fn(spark, SF_DIR))

    eng_timings, eng_stats, eng_singles = engine_batch(spark, sf)

    # `value` keeps the round-1/2 definition (flagship + headline batch) so
    # BENCH_r{N} totals stay comparable; the engine rows are reported
    # separately in `queries`/`engines` with their own subtotal
    total = round(sum(timings.values()), 3)
    # value_single_shot: same flagship+headline scope as `value`
    total_single = round(sum(singles[k] for k in timings), 3)
    flag_s = timings["flagship_asof_features"]
    # the FINAL stdout line must fit the driver's ~2.2 KB tail capture
    # (VERDICT r04 #2; r04's line was truncated): it carries only the
    # flagship+headline timings; extras + engines live in the detail
    # line/file with their subtotals surfaced as scalars below
    headline_timings = dict(timings)
    timings.update(extra_timings)
    timings.update(eng_timings)
    singles.update(eng_singles)
    throughput = {
        "flagship_rows": n_seq,
        "flagship_tokens": int(n_tok_total),
        "sequences_per_sec": round(n_seq / flag_s),
        "tokens_per_sec": round(n_tok_total / flag_s),
        "cpus": CPUS,
    }
    # VERDICT r04 #2: the driver tail-captures only ~2 KB of stdout, so the
    # headline line must stay compact — single-shot timings + engine stats
    # (the full r3 dual-protocol record) go to a side file and a SEPARATE
    # earlier stdout line; the final printed line is the parseable contract.
    detail = {
        "value_single_shot": total_single,
        "queries_all": timings,
        "queries_single_shot": singles,
        "timing_protocol": "queries=min of 2 passes (r3+ protocol); "
                           "queries_single_shot=first pass (r1/r2 protocol)",
        "engines": eng_stats,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(detail))
    out = {
        "metric": "asof+window feature pipeline + headline query batch, wall sec",
        "value": total,
        "unit": "sec",
        "queries": headline_timings,
        "sf": sf,
        "extras_batch_sec": round(sum(extra_timings.values()), 3),
        "engine_batch_sec": round(sum(eng_timings.values()), 3),
        "throughput": throughput,
        "detail": "BENCH_DETAIL.json",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

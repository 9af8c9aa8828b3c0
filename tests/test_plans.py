"""Physical-plan regression guards: the properties a 100 TB deployment relies
on must hold in the plan itself, not just in benchmarks (the pytest twin of
tools/explain_audit.py).

NOTE: these run while the scaling job may be using the machine — they only
inspect plans (explain), no data is executed."""

import io
from contextlib import redirect_stdout

import pytest

from fs2_data_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def q(spark, name):
    fn, _sql = REGISTRY[name]
    return fn(spark, SF)


def test_q1_scan_pushdown_and_pruning(spark):
    plan = plan_of(q(spark, "q1_pricing_summary"))
    assert "PushedFilters: [" in plan and "IsNotNull" in plan
    # only the needed lineitem columns are read
    assert "l_comment" not in plan


def test_q3_broadcasts_dimension(spark):
    plan = plan_of(q(spark, "q3_shipping_priority"))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_asof_union_single_exchange(spark):
    """The as-of union-window plan: ONE hash exchange feeds the window chain
    (no join node, no second shuffle for the window stages)."""
    plan = plan_of(q(spark, "asof_join_events"))
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_fused_pit_single_window_chain(spark):
    plan = plan_of(q(spark, "pit_fused_events"))
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan


def test_lsh_queries_have_no_cross_products(spark):
    for name in ("jaccard_pairs", "ann_lsh_topk"):
        plan = plan_of(q(spark, name))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_flagship_prunes_token_payload(spark):
    """pit_feature_pipeline must not read the tokens column at the scan."""
    from fs2_data_spark.pipeline import pit_feature_pipeline
    from fs2_data_spark.tables import observations, token_sequences
    seqs = token_sequences(spark, 1000, n_docs=50)
    obs = observations(spark, 300, n_docs=50)
    plan = plan_of(pit_feature_pipeline(seqs, obs, hot_keys=[]))
    assert "tokens" not in plan.split("== Physical Plan ==")[-1]


def test_fused_segmented_carry_join_shuffle_avoids_broadcast(spark):
    """carry_join='shuffle' must not BroadcastExchange the carry summary —
    on a full billion-key table the summary is |keys| x |buckets| rows and a
    forced broadcast would OOM the executors (VERDICT r02 item #2)."""
    from fs2_data_spark.pipeline import fused_pit_features
    from fs2_data_spark.tables import observations, token_sequences
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        seqs = token_sequences(spark, 1000, n_docs=50).drop("tokens")
        obs = observations(spark, 300, n_docs=50)
        shuf = plan_of(fused_pit_features(seqs, obs, bucket_us=3_600_000_000,
                                          carry_join="shuffle"))
        bcast = plan_of(fused_pit_features(seqs, obs, bucket_us=3_600_000_000,
                                           carry_join="broadcast"))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "BroadcastExchange" not in shuf
    assert "BroadcastExchange" in bcast


def test_fused_segmented_carry_join_validated():
    from fs2_data_spark.pipeline import fused_pit_features
    with pytest.raises(ValueError, match="carry_join"):
        fused_pit_features(None, None, carry_join="nope")


def test_xpath_fast_texts_stays_jvm_side(spark):
    """The XPath fast path must compile to from_xml + array HOFs — zero
    Python/Arrow eval nodes in the plan (VERDICT r03 #4: take the common
    child-axis case off the ~40 MB/s Python tier)."""
    df = q(spark, "xpath_fast_texts")
    plan = plan_of(df)
    # the posexplode over the from_xml result lives in a Generate node
    assert "Generate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"Python tier leaked into plan: {marker}"
    # projections/scan are codegen'd (the from_xml Generate itself is not)
    assert plan.count("* ") >= 3


def test_mix_sample_is_scan_side_filter(spark):
    """Stratified sampling must be a pure per-row filter — zero Exchange,
    zero Python; the dropped rows never move (100 TB: the sample decision
    rides the scan)."""
    plan = plan_of(q(spark, "mix_sample_docs"))
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_tok_vocab_topk_no_global_sort(spark):
    """Top-k vocab must plan as TakeOrderedAndProject (parallel partial
    top-k + merge), never a global Sort of the full token distribution."""
    plan = plan_of(q(spark, "tok_vocab_topk"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_group_shuffle(spark):
    """Packing = one hash exchange on the group key feeding the pandas
    kernel — no extra sort exchange, no join."""
    plan = plan_of(q(spark, "pack_sequences_docs"))
    assert plan.count("hashpartitioning(") == 1
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_hash_split_is_scan_side_case(spark):
    """Train/val/test assignment must be a pure per-row CASE expression —
    zero Exchange, zero Python (100 TB: the split rides the scan, like the
    stratified-sample filter)."""
    plan = plan_of(q(spark, "split_assign_docs"))
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_curriculum_corpus_side_never_shuffles(spark):
    """Quantile bucketing: the corpus joins the (cardinality-sized) bucket
    map via broadcast — a full global sort (ntile) would be the scale
    killer; only the histogram aggregation may shuffle."""
    plan = plan_of(q(spark, "curriculum_buckets_docs"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


@pytest.mark.parametrize("name", ["bpe_pretok_docs", "redact_pii_docs"])
def test_per_row_text_ops_ride_the_scan(spark, name):
    """BPE pre-tokenization and PII redaction are pure per-row projections:
    zero Exchange, zero Python — the whole query is one codegen'd scan."""
    plan = plan_of(q(spark, name))
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_unigram_quality_vocab_broadcasts(spark):
    """Corpus-fit LM scoring: the vocabulary side broadcasts back onto the
    exploded corpus (pass 2) — the corpus token stream must never shuffle
    for the join, and the whole pipeline stays JVM-side."""
    plan = plan_of(q(spark, "unigram_quality_docs"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_quantized_topk_no_dim_explode_no_python(spark):
    """Quantization stats come from one partial-agg pass (no Generate /
    explode multiplying the corpus by dim) and the whole pipeline stays
    JVM-side; the stats row and the query side broadcast."""
    plan = plan_of(q(spark, "ann_quantized_topk"))
    assert "Generate" not in plan           # no (row, dim) explode
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_source_cap_window_group_limit(spark):
    """The row_number <= cap filter must rewrite into WindowGroupLimit so
    map tasks pre-trim to cap rows per group before the exchange."""
    from fs2_data_spark.operators.mixing import cap_per_group
    from fs2_data_spark.queries import _t
    d = _t(spark, SF, "documents").select("doc_id", "source")
    plan = plan_of(cap_per_group(d, cap=15, method="portable").filter("kept"))
    # Partial group-limit below the exchange, Final above it
    assert ", 15, Partial" in plan and ", 15, Final" in plan
    assert plan.count("+- Exchange") == 1
    assert "PythonUDF" not in plan


def test_pmi_topk_no_global_sort_single_explode(spark):
    from fs2_data_spark.operators.quality import pmi_collocations
    d = spark.createDataFrame([(1, "a b c a b")], "doc_id bigint, text string")
    # Without the checkpoint barrier the corpus explode is recomputed once
    # per marginal branch (the 100 TB failure mode the operator avoids):
    raw = plan_of(pmi_collocations(d, checkpoint=False))
    # 4 explode subtrees (formatted explain prints each node twice:
    # tree + operator-detail section)
    assert raw.count("Generate") == 8
    # With it (the default, and what the registry query uses), every branch
    # scans the one materialized bigram-count table instead:
    plan = plan_of(q(spark, "pmi_bigrams_docs"))
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # explode happens once, behind the barrier
    assert "ExistingRDD" in plan  # all branches re-scan the checkpointed cuv
    assert "PythonUDF" not in plan


def test_asof_nearest_single_sort_two_windows(spark):
    plan = plan_of(q(spark, "asof_join_events_nearest"))
    # both direction candidates ride ONE partition sort: two WindowExec
    # nodes (backward frame + forward frame) share a single window exchange;
    # the only other exchange is the right-side (key, ts) dedup aggregation
    assert plan.count(") Window") == 2
    assert plan.count("hashpartitioning(") <= 2
    assert "PythonUDF" not in plan
    # no join node: the union-window strategy never joins
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_boilerplate_anti_join_no_cartesian(spark):
    plan = plan_of(q(spark, "boilerplate_segments_docs"))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan


def test_multi_horizon_single_sort(spark):
    """Three RANGE horizons must share one partition sort: one hash
    exchange, one Sort, and Spark fuses all three frames into a SINGLE
    WindowExec — adding a horizon costs a frame scan, never a shuffle."""
    plan = plan_of(q(spark, "w_multi_horizon_events"))
    assert plan.count("hashpartitioning(") == 1
    assert plan.count(") Sort") == 1
    assert plan.count(") Window") == 1
    assert "PythonUDF" not in plan


def test_semantic_dedup_cell_fenced_pairs(spark):
    """SemDeDup's all-pairs stage must be an equi-join on the cell id —
    sum(|cell|^2) work, never an N^2 cross product. (The
    BroadcastNestedLoopJoins in the plan are the intentional bounded
    16-row centroid broadcasts of the IVF assign steps, same as
    ann_ivf_topk's audited plan.)"""
    plan = plan_of(q(spark, "semantic_dedup_emb"))
    assert "CartesianProduct" not in plan
    # the corpus-vs-corpus pair join keys on cell: a hash equi-join node
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    assert "PythonUDF" not in plan

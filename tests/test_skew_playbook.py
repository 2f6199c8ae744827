"""The skew PLAYBOOK end to end (VERDICT r10 #8): audit → decision →
mitigation, proven on a planted hot key. SCALE.md promises the decision
procedure; this file executes it — the audit signature flags the planted
pathology, skew_decision names the right strategy for three planted
distributions, AQE's skew-split actually fires on the ensemble case, and
salted_join is row-identical to the plain join on the single-hot-key
case it exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_go_spark.functions.skew import (
    SKEW_SINGLE_KEY_FACTOR,
    key_skew_signature,
    salted_join,
    skew_decision,
)

PAR = 32


def test_decision_matrix_on_planted_signatures():
    # Uniform: 32k rows over 1k keys, max == p99 == 32 == avg partition.
    assert skew_decision(n_rows=32_000, max_cnt=32, p99_cnt=32, parallelism=PAR) == "plain"
    # Heavy ensemble: hottest key 4x p99, above avg partition but within
    # the single-key factor — AQE splits the multi-key partition.
    assert skew_decision(n_rows=32_000, max_cnt=4_000, p99_cnt=1_000, parallelism=PAR) == "aqe"
    # Single-key pathology: one key holds 30% of all rows.
    assert (
        skew_decision(n_rows=100_000, max_cnt=30_000, p99_cnt=40, parallelism=PAR)
        == "salt"
    )
    # Boundary: exactly the average partition is still fine.
    assert skew_decision(n_rows=3_200, max_cnt=100, p99_cnt=100, parallelism=PAR) == "plain"
    assert (
        skew_decision(n_rows=3_200, max_cnt=101, p99_cnt=101, parallelism=PAR) == "aqe"
    )


def _planted_hot_events(spark, n=50_000, hot_of_10=3):
    """Synthetic fact: hot_of_10/10 of rows share ONE key ('hot'), the
    rest spread over n/8 ordinary keys."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < hot_of_10, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % (n // 8)).cast("string")))
        .alias("join_key"),
    )


def test_audit_flags_planted_hot_key_and_salt_fixes_it(spark):
    """The full playbook on the salt case: the signature finds the
    planted key, the decision says salt, and salted_join returns exactly
    the plain join's rows."""
    ev = _planted_hot_events(spark)
    sig = key_skew_signature(ev, "join_key").collect()[0]
    assert sig["hot_key"] == "hot"
    assert sig["hot_share_ppm"] >= 290_000  # ~30% of rows on one key
    assert (
        skew_decision(sig["n_rows"], sig["max_cnt"], sig["p99_cnt"], PAR) == "salt"
    )
    build = ev.groupBy("join_key").agg(F.count(F.lit(1)).alias("n_key"))
    plain = ev.join(build, "join_key")
    salted = salted_join(ev, build, on=["join_key"])
    key = lambda r: (r["event_id"], r["join_key"], r["n_key"])  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_audit_says_plain_on_uniform_key(spark):
    ev = spark.range(50_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 1_000).cast("string").alias("join_key"),
    )
    sig = key_skew_signature(ev, "join_key").collect()[0]
    assert skew_decision(sig["n_rows"], sig["max_cnt"], sig["p99_cnt"], PAR) == "plain"


def test_aqe_skew_split_fires_on_ensemble_case(spark):
    """The AQE arm of the playbook: a shuffle join with one oversized
    (multi-key) partition, AQE skew thresholds scaled to fixture bytes —
    the executed plan must carry the skew=true marker on the join, i.e.
    the runtime re-plan the decision procedure counts on actually
    happens. Conf toggling/restoration is the shared skew_lab_confs
    contextmanager — the same one the scale probe uses."""
    from map_reduce_go_spark.functions.skew import skew_lab_confs

    with skew_lab_confs(spark, aqe=True, threshold="16KB", advisory="8KB"):
        n = 60_000
        ev = _planted_hot_events(spark, n=n)
        # The dim side must be a BARE shuffle input: OptimizeSkewedJoin
        # pattern-matches SMJ(Sort(Shuffle), Sort(Shuffle)) only, so an
        # aggregate (e.g. .distinct()) between the dim's shuffle and the
        # join silently disables the split — measured here, and itself a
        # playbook fact: pre-aggregated build sides push you to salting.
        dim = (
            spark.range(n // 8)
            .select(
                F.concat(F.lit("k"), F.col("id").cast("string")).alias("join_key"),
                F.lit(1).alias("attr"),
            )
            .unionAll(
                spark.range(1).select(
                    F.lit("hot").alias("join_key"), F.lit(1).alias("attr")
                )
            )
        )
        joined = ev.join(dim, "join_key")
        # Execute THIS DataFrame's own queryExecution (count() would build
        # a separate plan object and leave this one isFinalPlan=false).
        assert len(joined.collect()) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]

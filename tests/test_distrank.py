"""functions/distrank.py conformance: the distributed row_number and the
boundary-reconstructed ntile must be bit-identical to the single-partition
SQL forms they replace — on sizes that exercise every tile-boundary shape
(n % k == 0, n % k != 0, n < k, n == 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from map_reduce_go_spark.functions.distrank import (
    RANK_PARTS_CONF,
    RANK_PARTS_MIN,
    dist_row_number,
    ntile_from_rank,
    range_parts,
)


def _frame(spark, n: int):
    # Keys deliberately collide (k % 7) so ties straddle range-partition
    # boundaries; uid makes the composite order total, per the contract.
    return spark.range(n).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("uid")
    )


@pytest.mark.parametrize("n", [1, 3, 40, 1000])
def test_dist_row_number_matches_global_window(spark, n):
    df = _frame(spark, n)
    order = [F.asc("k"), F.desc("uid")]
    got_df, total = dist_row_number(df, order, out="i")
    assert total == n
    got = {r["uid"]: r["i"] for r in got_df.collect()}
    want = {
        r["uid"]: r["i"]
        for r in df.withColumn(
            "i", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(1, 5), (3, 5), (5, 5), (7, 5), (40, 5), (1000, 10)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    df = _frame(spark, n)
    order = [F.asc("k"), F.asc("uid")]
    ranked, total = dist_row_number(df, order, out="i")
    got = {
        r["uid"]: r["t"]
        for r in ranked.select(
            "uid", ntile_from_rank(F.col("i"), total, k).alias("t")
        ).collect()
    }
    want = {
        r["uid"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(k).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_dist_row_number_plan_has_no_single_partition_funnel(spark):
    df = _frame(spark, 500)
    got_df, _n = dist_row_number(df, [F.asc("k"), F.asc("uid")])
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # The window is partitioned (by pid), never global.
    assert "rangepartitioning" in plan or "RoundRobin" not in plan


def test_dist_row_number_parallelism_is_real(spark):
    """The rank shuffle actually fans out: with enough rows, more than
    one range partition carries data (the whole point vs the global
    window)."""
    df = _frame(spark, 1000)
    ranged = df.repartitionByRange(
        range_parts(spark), F.asc("k"), F.asc("uid")
    )
    nonempty = (
        ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .count()
    )
    assert nonempty > 1


def test_range_parts_derivation_precedence(spark):
    """VERDICT r12 #3: the fan-out is derived, not a constant. Explicit
    argument wins, then the spark.graft.rank.parts conf, then the
    session's shuffle-partition conf (floored at RANK_PARTS_MIN) — so a
    1000-executor session with shuffle.partitions=2000 fans the rank
    shuffle to 2000 without touching any code."""
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert range_parts(spark) == max(RANK_PARTS_MIN, shuffle)
    assert range_parts(spark, parts=3) == 3
    spark.conf.set(RANK_PARTS_CONF, "17")
    try:
        assert range_parts(spark) == 17
        assert range_parts(spark, parts=5) == 5  # explicit still wins
    finally:
        spark.conf.unset(RANK_PARTS_CONF)
    assert range_parts(spark) == max(RANK_PARTS_MIN, shuffle)


@pytest.mark.parametrize("parts", [1, 2, 19, 64])
def test_dist_row_number_hash_invariant_in_parts(spark, parts):
    """The knob tunes throughput only: global ranks are bit-identical at
    ANY fan-out (offsets are exact metadata), including parts=1 (the
    degenerate single-range case) and parts >> rows (empty partitions)."""
    df = _frame(spark, 200)
    order = [F.asc("k"), F.desc("uid")]
    base, n0 = dist_row_number(df, order, out="i", parts=8)
    want = {r["uid"]: r["i"] for r in base.collect()}
    got_df, n = dist_row_number(df, order, out="i", parts=parts)
    assert n == n0
    assert {r["uid"]: r["i"] for r in got_df.collect()} == want

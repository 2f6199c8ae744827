"""functions/distrank.py conformance: the distributed row_number and the
boundary-reconstructed ntile must be bit-identical to the single-partition
SQL forms they replace — on sizes that exercise every tile-boundary shape
(n % k == 0, n % k != 0, n < k, n == 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from map_reduce_go_spark.functions.distrank import (
    RANK_PARTS,
    dist_row_number,
    ntile_from_rank,
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
    ranged = df.repartitionByRange(RANK_PARTS, F.asc("k"), F.asc("uid"))
    nonempty = (
        ranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .count()
    )
    assert nonempty > 1

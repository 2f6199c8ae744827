"""Semantic invariants for the funnel / retention operators beyond the
oracle value-hash: stage ordering, offset bounds, cohort alignment."""

from pyspark.sql import functions as F

from map_reduce_go_spark.plans.funnel import (
    cohort_hourly_retention,
    funnel_view_click_purchase,
)


def test_funnel_stage_ordering(spark, sf_dir):
    """Stages must be reached in order: view <= click <= purchase, and
    stages_completed must agree with which epochs are populated."""
    out = funnel_view_click_purchase(spark, sf_dir).cache()
    assert out.where(F.col("view_epoch").isNull()).count() == 0
    assert (
        out.where(
            F.col("click_epoch").isNotNull()
            & (F.col("click_epoch") < F.col("view_epoch"))
        ).count()
        == 0
    )
    assert (
        out.where(
            F.col("purchase_epoch").isNotNull()
            & (F.col("purchase_epoch") < F.col("click_epoch"))
        ).count()
        == 0
    )
    # purchase requires click (stage 3 implies stage 2 was reached).
    assert (
        out.where(
            F.col("purchase_epoch").isNotNull() & F.col("click_epoch").isNull()
        ).count()
        == 0
    )
    expected = (
        F.lit(1)
        + F.col("click_epoch").isNotNull().cast("int")
        + F.col("purchase_epoch").isNotNull().cast("int")
    )
    assert out.where(F.col("stages_completed") != expected).count() == 0
    out.unpersist()


def test_retention_matrix_invariants(spark, sf_dir):
    """Offsets are non-negative, cohort epochs hour-aligned, every cell has
    at least one active user, and offset-0 cells cover every cohort (the
    signup event itself is activity in the cohort hour)."""
    out = cohort_hourly_retention(spark, sf_dir).cache()
    assert out.where(F.col("hour_offset") < 0).count() == 0
    assert out.where(F.col("cohort_epoch") % 3600 != 0).count() == 0
    assert out.where(F.col("n_active") < 1).count() == 0
    cohorts = out.select("cohort_epoch").distinct().count()
    zero_offset = out.where(F.col("hour_offset") == 0).count()
    assert zero_offset == cohorts
    out.unpersist()

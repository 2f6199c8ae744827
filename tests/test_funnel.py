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


def _python_funnel(events):
    """Sequential funnel evaluator: (user_id, ts, type) tuples ->
    {user: (t_view, t_click, t_purchase)} with ordered-stage semantics."""
    out = {}
    by_user = {}
    for uid, ts, typ in events:
        by_user.setdefault(uid, []).append((ts, typ))
    for uid, evs in by_user.items():
        views = sorted(ts for ts, t in evs if t == "view")
        if not views:
            continue
        t_view = views[0]
        clicks = sorted(ts for ts, t in evs if t == "click" and ts >= t_view)
        t_click = clicks[0] if clicks else None
        t_purchase = None
        if t_click is not None:
            purchases = sorted(
                ts for ts, t in evs if t == "purchase" and ts >= t_click
            )
            t_purchase = purchases[0] if purchases else None
        out[uid] = (t_view, t_click, t_purchase)
    return out


def test_funnel_matches_sequential_evaluator(spark):
    """Conformance on generated logs, including the ordered-stage traps:
    clicks before the first view, purchases before the first qualifying
    click, ties at the same timestamp."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(20260813)
    base = datetime(2024, 1, 1)
    rows = []
    for uid in range(40):
        n = rng.randint(0, 12)
        for _ in range(n):
            rows.append(
                (
                    uid,
                    base + timedelta(seconds=rng.randint(0, 50)),
                    rng.choice(["view", "click", "purchase", "error"]),
                )
            )
    # Deterministic tie cases: click at exactly the first view instant,
    # purchase at exactly the first click instant.
    rows += [
        (100, base, "view"),
        (100, base, "click"),
        (100, base, "purchase"),
        (101, base + timedelta(seconds=5), "click"),
        (101, base + timedelta(seconds=6), "view"),
        (101, base + timedelta(seconds=7), "click"),
    ]
    from map_reduce_go_spark.plans.funnel import funnel_over

    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: (r["view_epoch"], r["click_epoch"], r["purchase_epoch"])
        for r in funnel_over(df).collect()
    }
    want = {
        uid: tuple(None if t is None else int(t.timestamp()) for t in triple)
        for uid, triple in _python_funnel(
            [(u, ts, t) for u, ts, t in rows]
        ).items()
    }
    assert got == want

"""Skew-handling pattern: salted two-phase aggregation over a pathological
key distribution equals the direct aggregation (the SCALE.md mitigation for
hot keys, exercised rather than just documented).
"""

from pyspark.sql import functions as F

N_SALT = 16


def test_salted_aggregation_equals_direct(spark):
    # 200k rows on one hot key + a uniform tail.
    hot = spark.range(200_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(50_000).select(
        F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    df = hot.unionByName(tail)

    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").cast("decimal(24,6)")).cast("double").alias("s"))
        .collect()
    }

    # Phase 1: aggregate on (k, salt) — the hot key spreads over N_SALT
    # partitions; phase 2: combine partials per k.
    salted = (
        df.withColumn("salt", (F.rand(seed=7) * N_SALT).cast("int"))
        .groupBy("k", "salt")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").cast("decimal(24,6)")).alias("s"))
        .groupBy("k")
        .agg(F.sum("n").alias("n"), F.sum("s").cast("double").alias("s"))
    )
    got = {r["k"]: (r["n"], r["s"]) for r in salted.collect()}
    assert got == direct


def test_salted_join_equals_plain_join(spark):
    """salted_join must be row-identical to the plain equi-join on a
    pathological distribution (one key holding 80% of the probe side),
    and its shuffle must hash on (key, salt) so the hot key spreads over
    N_SALT partitions instead of serializing into one task."""
    from map_reduce_go_spark.functions.skew import salted_join

    probe = spark.range(100_000).select(
        F.when(F.col("id") % 5 < 4, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 500).cast("string"))
        ).alias("k"),
        F.col("id").alias("pid"),
    )
    build = spark.range(600).select(
        F.when(F.col("id") == 0, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id").cast("string"))
        ).alias("k"),
        (F.col("id") * 10).alias("bval"),
    )
    plain = probe.join(build, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pid").alias("sp"), F.sum("bval").alias("sb")
    )
    salted = salted_join(probe, build, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pid").alias("sp"), F.sum("bval").alias("sb")
    )
    want = {r["k"]: (r["n"], r["sp"], r["sb"]) for r in plain.collect()}
    got = {r["k"]: (r["n"], r["sp"], r["sb"]) for r in salted.collect()}
    assert got == want

    # The salted exchange must carry the salt in its partitioning key.
    sj = salted_join(probe, build, ["k"])
    plan = sj._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan

    # Left-outer parity: unmatched probe rows survive exactly once.
    lo_plain = probe.join(build, ["k"], "left").count()
    lo_salted = salted_join(probe, build, ["k"], "left").count()
    assert lo_plain == lo_salted


def test_salted_join_rejects_build_side_outer(spark):
    """right/full outer must be refused: unmatched build rows would appear
    once per salt replica."""
    import pytest

    from map_reduce_go_spark.functions.skew import salted_join

    a = spark.range(10).select(F.col("id").alias("k"))
    b = spark.range(10).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="does not support"):
            salted_join(a, b, ["k"], how=how)


def test_salted_join_spreads_identical_duplicate_rows(spark):
    """Regression: whole-row hashing alone sends every copy of an
    IDENTICAL hot row to one salt partition. With the partition-id term,
    duplicates spanning input splits must land on multiple salts (and
    join results stay exact)."""
    from map_reduce_go_spark.functions.skew import _SALT_COL, salted_join

    probe = (
        spark.range(40_000)
        .repartition(16)
        .select(F.lit("hot").alias("k"))
    )
    build = spark.createDataFrame([("hot", 1)], ["k", "bval"])
    joined = salted_join(probe, build, ["k"])
    assert joined.count() == 40_000
    # Inspect the salt distribution directly.
    probe_s = probe.withColumn(
        _SALT_COL,
        F.pmod(F.xxhash64(*probe.columns) + F.spark_partition_id(), F.lit(16)).cast("int"),
    )
    n_salts = probe_s.select(_SALT_COL).distinct().count()
    assert n_salts > 1, "identical duplicate rows all collapsed onto one salt"

"""Distributed global row numbering — the shared idiom behind every
"rank all N rows" need (Lorenz/Gini, RFM ntiles, equidepth, zipf) without
an ``Exchange SinglePartition``.

A bare ``Window.orderBy(...)`` plans as a single-partition exchange: every
row moves to ONE task, which is the last place a 100 TB plan is allowed to
funnel an unbounded-cardinality frame. The distributed form is the
repartitionByRange + per-partition offset composition already proven in
``plans/mleval._prefix_over`` and the equidepth ``_approx`` twin:

1. ``repartitionByRange(PARTS, *order)`` — range shuffle, PARTS-way
   parallel, globally ordered ACROSS partitions;
2. per-partition ``row_number`` over the same order — parallel;
3. one ``groupBy(pid).count()`` collect — PARTS rows of metadata, never
   data — turned into broadcast offsets;
4. global row number = local row number + offset(pid).

The ordering key must be a TOTAL order (include a unique tiebreak column):
``repartitionByRange`` may split equal keys across adjacent partitions, so
any tie that straddles a boundary would make local ranks non-deterministic.
With a unique composite key the result is bit-identical to the
single-partition ``row_number`` — same contract the oracles hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_go_spark.functions.caching import tracked_cache

#: Floor for the derived range-partition fan-out: enough to parallelize
#: even when the session's shuffle-partition conf is tiny (local test
#: sessions), small enough that the per-partition count collect stays
#: metadata at any setting.
RANK_PARTS_MIN = 8

#: Session conf overriding the derived fan-out explicitly
#: (``spark.conf.set("spark.graft.rank.parts", "64")``). The global
#: rank is HASH-INVARIANT in this knob (offsets are exact metadata at
#: any fan-out — asserted per-probe in scripts/scale_probe.py's
#: distrank family), so it tunes throughput only, never results.
RANK_PARTS_CONF = "spark.graft.rank.parts"


def range_parts(spark, parts: int | None = None) -> int:
    """Derive the rank/prefix shuffle fan-out (VERDICT r12 #3 — a
    constant 8 was the one remaining fixed degree-of-parallelism in a
    100 TB-facing idiom). Precedence: explicit ``parts`` argument, then
    the ``spark.graft.rank.parts`` session conf, then the session's
    ``spark.sql.shuffle.partitions`` — the same knob that sizes every
    other shuffle in the job, so on a real cluster (thousands of
    shuffle partitions) the rank shuffle fans out with the rest of the
    plan instead of funneling into 8 tasks. Floored at RANK_PARTS_MIN."""
    if parts is not None:
        return max(1, int(parts))
    conf = spark.conf.get(RANK_PARTS_CONF, None)
    if conf:
        return max(1, int(conf))
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "8"))
    return max(RANK_PARTS_MIN, shuffle)


def dist_row_number(
    df: DataFrame,
    order_by: list[Column],
    out: str = "i",
    parts: int | None = None,
) -> tuple[DataFrame, int]:
    """(df + global 1-based ``out`` row number, total row count).

    ``order_by`` must totally order ``df`` (unique composite key — see
    module docstring). The returned count is driver-side metadata (the
    offset collect already paid for it), so callers needing ``n`` embed
    it as a literal instead of planning a ``count() OVER ()`` — which
    would itself be a single-partition window. ``parts`` tunes the
    range-shuffle fan-out (default derived per :func:`range_parts`);
    the result is bit-identical at any setting."""
    spark = df.sparkSession
    ranged = tracked_cache(
        df.repartitionByRange(range_parts(spark, parts), *order_by).withColumn(
            "pid", F.spark_partition_id()
        )
    )
    per_pid = ranged.groupBy("pid").count().collect()
    sizes = {r["pid"]: r["count"] for r in per_pid}
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = spark.createDataFrame(offsets or [(0, 0)], "pid int, off long")
    w = Window.partitionBy("pid").orderBy(*order_by)
    ranked = (
        ranged.join(F.broadcast(off), "pid")
        .withColumn(out, (F.row_number().over(w) + F.col("off")).cast("long"))
        .drop("pid", "off")
    )
    return ranked, acc


def ntile_from_rank(i: Column, n: int, k: int) -> Column:
    """SQL ``ntile(k)`` reconstructed from a global 1-based rank ``i``
    over ``n`` rows — integer-exact, identical to Spark's and DuckDB's
    ntile: the first ``n % k`` tiles hold ``n // k + 1`` rows, the rest
    ``n // k``. Lets the RFM-style quintile scoring ride the distributed
    rank instead of a single-partition ntile window."""
    if n <= 0:
        return F.lit(None).cast("int")
    q, r = divmod(n, k)
    # Tile boundaries as Python-int literals (k-1 of them — metadata):
    # tile = 1 + #{boundaries below i}. Pure integer comparisons, no
    # division in the plan at all, so there is nothing to misround.
    bounds = []
    acc = 0
    for j in range(1, k):
        acc += (q + 1) if j <= r else q
        bounds.append(acc)
    tile: Column = F.lit(1)
    for b in bounds:
        tile = tile + F.when(i > b, 1).otherwise(0)
    return tile.cast("int")

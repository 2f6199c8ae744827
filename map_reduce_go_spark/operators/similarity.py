"""Similarity search over the embeddings table (array<float>, 64-dim).

- brute-force cosine top-k: the correctness baseline. Query set broadcast,
  similarity computed JVM-side with higher-order array functions (zip_with +
  aggregate — no Python in the loop), ranked per query with a bounded
  window.
- LSH-bucketed ANN: random-hyperplane sign buckets; candidates only from
  matching buckets. The 100 TB scale path — recall vs the brute-force
  baseline is asserted in tests (engine-specific bucketing -> rows-only
  driver check).

Scale notes:
- brute force is O(N_queries × N_vectors): fine for a broadcast query set
  (the pattern: score a small probe set against the corpus). Full all-pairs
  at 100 TB needs the LSH/IVF path.
- hyperplanes are derived deterministically from md5, so the plan is
  reproducible across runs and engines with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table

N_QUERIES = 5
TOP_K = 3


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    n2 = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (n1 * n2)


# Explicit-double cosine for the oracle: DuckDB's list_cosine_similarity
# accumulates in float32, which lands on the wrong side of the 1e-6
# rounding boundary vs Spark's double arithmetic. This mirrors the Spark
# expression term-for-term in double.
_DOT = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))"
)
_NORM_Q = (
    "sqrt(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))"
)
_NORM_V = (
    "sqrt(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))))"
)


@register(
    "knn_bruteforce_cosine",
    oracle=f"""
    SELECT query_id, neighbor_id, round(raw_sim, 6) AS sim, rank FROM (
      SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             {_DOT} / ({_NORM_Q} * {_NORM_V}) AS raw_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_DOT} / ({_NORM_Q} * {_NORM_V}) DESC,
                        v.vec_id) AS rank
      FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ) t WHERE rank <= {TOP_K}
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for a probe set of queries.

    The query side is broadcast (BroadcastNestedLoopJoin over N_QUERIES
    rows); scoring stays in codegen via zip_with/aggregate.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    v = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v_emb"))
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("v_emb")).alias("raw_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("raw_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("raw_sim", 6).alias("sim"), "rank")
    )


N_HYPERPLANES = 8
_DIM = 64


def _hyperplane(j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j: component d derived from
    md5(f"h{j}|{d}") mapped to [-1, 1]. Same values every run, everywhere."""
    import hashlib

    out = []
    for d in range(_DIM):
        h = int(hashlib.md5(f"h{j}|{d}".encode()).hexdigest()[:8], 16)
        out.append(h / float(0xFFFFFFFF) * 2.0 - 1.0)
    return out


def lsh_bucket(emb: Column) -> Column:
    """Sign-pattern bucket id (0..2^N_HYPERPLANES-1) for an embedding."""
    bucket = F.lit(0)
    for j in range(N_HYPERPLANES):
        plane = F.array(*[F.lit(x) for x in _hyperplane(j)])
        dot = F.aggregate(
            F.zip_with(emb, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(0)
    return bucket


@register("ann_lsh_cosine", oracle=None)
def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: score only vectors in the query's
    bucket. Engine-specific bucketing -> rows-only driver check; recall vs
    brute force is asserted in tests/test_llm_ops.py.

    At 100 TB the corpus is written bucketed/partitioned by `bucket` so a
    query touches one partition (partition pruning on the scan).
    """
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket(F.col("embedding"))
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    v = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("v_emb"),
        "bucket",
    )
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("v_emb")).alias("raw_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("raw_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("raw_sim", 6).alias("sim"), "rank")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer cells + nprobe search
# --------------------------------------------------------------------------

K_CELLS = 16
NPROBE = 4


def _nearest_cells(emb: Column, centroids: list[list[float]], n: int) -> Column:
    """Array of the n nearest centroid ids by cosine (descending).

    Scores all K centroids in one codegen expression: build
    array<struct<sim,cell>>, sort descending, slice. K is index metadata
    (tiny), so this is a map-side constant-folded expression.
    """
    scored = F.array(
        *[
            F.named_struct(
                F.lit("sim"),
                cosine(emb, F.array(*[F.lit(x) for x in c])),
                F.lit("cell"),
                F.lit(i),
            )
            for i, c in enumerate(centroids)
        ]
    )
    ordered = F.reverse(F.array_sort(scored))
    return F.transform(F.slice(ordered, 1, n), lambda s: s["cell"])


def ivf_train_centroids(emb: DataFrame) -> list[list[float]]:
    """Train the coarse quantizer: K deterministic seed vectors + one
    distributed Lloyd iteration (assign-to-nearest, recompute means).

    The collect() here moves K×dim = 1024 floats of *index metadata* to
    the driver — the IVF codebook is broadcast state by design, the data
    plane is never collected. At 100 TB: same plan, larger sample feeding
    more Lloyd iterations; the per-dim mean is a posexplode + groupBy —
    a map-side-combinable agg over (cell, dim).
    """
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < K_CELLS)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    assigned = emb.select(
        _nearest_cells(F.col("embedding"), seeds, 1)[0].alias("cell"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    means = (
        assigned.groupBy("cell", "dim")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select("cell", F.transform("dm", lambda s: s["m"]).alias("centroid"))
        .collect()
    )
    refined = {r["cell"]: [float(x) for x in r["centroid"]] for r in means}
    # Cells that captured no vectors keep their seed.
    return [refined.get(i, seeds[i]) for i in range(K_CELLS)]


@register("ann_ivf_cosine", oracle=None)
def ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: corpus vectors assigned to their nearest centroid cell;
    each query scores only vectors in its NPROBE nearest cells. The
    engine-side index structure is engine-specific -> rows-only driver
    check; sims on returned pairs + recall vs brute force are asserted in
    tests/test_llm_ops.py.

    At 100 TB: corpus written partitioned by `cell` (partition pruning
    turns a query into NPROBE partition scans); the query→cell fanout is a
    broadcast join on the tiny probe set.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf_train_centroids(emb)
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("v_emb"),
        _nearest_cells(F.col("embedding"), centroids, 1)[0].alias("cell"),
    )
    q = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(
                _nearest_cells(F.col("embedding"), centroids, NPROBE)
            ).alias("cell"),
        )
    )
    scored = (
        corpus.join(
            F.broadcast(q),
            (corpus.cell == q.cell) & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("v_emb")).alias("raw_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("raw_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("raw_sim", 6).alias("sim"), "rank")
    )


@register(
    "embedding_centroids",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           round(CAST(SUM(CAST(embedding[1] AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6)
             AS centroid_d0,
           round(CAST(SUM(CAST(embedding[64] AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6)
             AS centroid_d63
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (first/last dim shown) — the reduce
    step of IVF index construction. Decimal sums keep both engines exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    cnt = F.count(F.lit(1))

    def comp(i: int) -> Column:
        return F.round(
            F.sum(F.col("embedding")[i].cast("decimal(18,8)")).cast("double") / cnt, 6
        )

    return emb.groupBy("label").agg(
        cnt.alias("n_vectors"),
        comp(0).alias("centroid_d0"),
        comp(63).alias("centroid_d63"),
    )

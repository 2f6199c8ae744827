"""Sources: parquet star-schema tables and whole-file text corpora.

The reference engine's only source is a whole-file UTF-8 text scan — one
map call per file with ``(filename, contents)`` (reference
src/mr/worker.go:59-71). :func:`read_wholetext` reproduces that contract
with Spark's ``text`` source in ``wholetext`` mode so the scan stays a
distributed, splittable-by-file parquet-grade source rather than a
driver-side read loop.

The driver fixtures (TESTDATA.md) are parquet; :func:`load_table` is the
single choke point for reading them so projection/predicate pushdown can be
verified in one place (``.explain`` shows ReadSchema/PushedFilters on these
scans).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor — at
#: TPC-H-like scaling, region=5 and nation=25 rows always; customer/supplier
#: /part grow with SF but stay orders of magnitude below the fact tables.
BROADCAST_DIMS = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Column pruning + filter pushdown reach this
    scan automatically because every query keeps the plan declarative."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Fixture-drift compatibility shim. The driver has regenerated
        # events.parquet with different ts physical types across rounds
        # (TIMESTAMP(NANOS) through round 2, plain timestamp[us]
        # isAdjustedToUTC=false — i.e. TIMESTAMP_NTZ — since round 3), so
        # normalize every known encoding to a plain session-tz TIMESTAMP
        # here, the single read choke point:
        #   - NANOS: nanosAsLong surfaces bigint nanos (vanilla Spark can't
        #     read NANOS at all); truncate to micros — the same truncation
        #     DuckDB applies, so engine and oracle agree.
        #   - TIMESTAMP_NTZ: cast to TIMESTAMP. The session timezone is
        #     pinned UTC (session.py), so the wall-clock fields are
        #     preserved bit-for-bit and epoch extraction matches DuckDB's.
        # The conf is set here (not only in get_spark) because the round
        # driver hands us its own session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


_NUM_ROWS_CACHE: dict[str, int] = {}


def table_num_rows(sf_dir: str, name: str) -> int:
    """Fixture row count straight from the parquet footer — no Spark job.

    Index-build sizing steps (e.g. the block-grid derivation in
    dedup_embedding_cosine) need only a cardinality, and parquet already
    carries it as metadata; ``df.count()`` would re-scan the table per
    invocation (VERDICT r4 nit #2). Memoized per resolved path; fixtures
    are immutable within a session. Works for single files and directory
    datasets alike via pyarrow.dataset.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = os.path.realpath(path)
    if key not in _NUM_ROWS_CACHE:
        import pyarrow.dataset as ds

        _NUM_ROWS_CACHE[key] = ds.dataset(path, format="parquet").count_rows()
    return _NUM_ROWS_CACHE[key]


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the cluster's parallelism — only when
    the scan yields fewer partitions than cores.

    CPU-bound per-row pipelines (interpreted HOF lambdas, Pandas UDFs) are
    throughput-limited by scan splits, not data volume: a compact parquet
    file scans as ONE split (files.maxPartitionBytes) and serializes the
    whole build onto a single core — measured 9s -> sub-second on the
    sf0.1 shingle build. At cluster scale inputs already split into far
    more partitions than cores and this is a no-op (the guard avoids an
    always-on shuffle of raw text).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_wholetext(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Whole-file text scan -> DataFrame(filename string, contents string).

    Mirrors the reference map-task input contract (one record per file,
    entire contents as one string — reference src/mr/worker.go:59-71) while
    remaining fully distributed: each file is one input partition, exactly
    the reference's map granularity (src/mr/coordinator.go:146-150).
    """
    df = spark.read.format("text").option("wholetext", "true").load(paths)
    return df.select(
        F.input_file_name().alias("filename"),
        F.col("value").alias("contents"),
    )


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver ``documents`` table viewed as a whole-file corpus:
    ``source`` plays filename, ``text`` plays contents (FIXTURES.md A)."""
    return load_table(spark, sf_dir, "documents").select(
        F.col("source").alias("filename"),
        F.col("text").alias("contents"),
        F.col("doc_id"),
    )


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view so callers can use
    ``spark.sql(...)`` directly — the SQL entry point of the engine (the
    same table names the DuckDB oracle sees, so any oracle SQL string in
    the registry also runs verbatim on Spark)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI SQL query against the fixture tables (views registered
    on demand). Catalyst gets the same declarative plan a DataFrame
    formulation would produce."""
    register_views(spark, sf_dir)
    return spark.sql(query)

"""Sinks: parquet (partitioned/bucketed), CSV, JSON, and the reference's
plain-text KV format (in :mod:`..operators.mapreduce`).

The reference's only sink is partitioned plain text (reference
src/mr/worker.go:138-165). Here every format goes through Spark's
FileOutputCommitter (atomic per-task commit — the reference's temp-file +
rename, for free) and supports partitioned layouts that enable partition
pruning on read-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink; ``partition_by`` produces a hive layout whose
    partition values prune at scan time (PartitionFilters — the read-side
    contract tests assert it)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema always explicit — inference is a full extra pass at scale."""
    return spark.read.option("header", "true").schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (native Spark columnar alternative to parquet; same
    committer/pushdown machinery)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed warehouse table: co-locates rows by hash(bucket_cols) at
    WRITE time so equi-joins/aggregations on those columns need no
    shuffle at READ time (verified by tests/test_scale_properties.py's
    no-Exchange assertion). The fixed-layout answer to the fact⋈fact
    shuffle at 100 TB — pay the partitioning once, reuse it every query."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)  # external table (warehouse.dir is static)
    w.saveAsTable(table)

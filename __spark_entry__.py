"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`map_reduce_go_spark.registry` — every implemented
operator from SURVEY.md §2 registers there with its DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from map_reduce_go_spark.registry import oracle_sqls, query_fns  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: word count over the documents corpus —
    the reference engine's canonical workload (SURVEY.md §2.2 A1)."""
    return query_fns()["wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_fns()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()

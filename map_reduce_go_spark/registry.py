"""Query registry — the single source of truth for the driver contract.

Every implemented operator/query from SURVEY.md §2 registers here with
(name, spark callable, optional DuckDB oracle SQL). ``__spark_entry__.py``
exposes this registry to the driver; tests iterate it to run the same
oracle comparison the driver runs (row count + schema + order-insensitive
value hash at sf0.01).

Registration happens at import of :mod:`map_reduce_go_spark.queries_all`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effect: modules register their queries on import.
    import map_reduce_go_spark.queries_all  # noqa: F401

    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}

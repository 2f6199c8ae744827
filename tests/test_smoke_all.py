"""Every registered query must execute at the driver's smoke scale
(sf0.001) — catches tiny-input edge cases the sf0.01 oracle pass can't
(empty candidate sets, single-element blocks, degenerate windows)."""

import pytest

from map_reduce_go_spark.registry import all_queries

SMOKE_SF = "/root/testdata/sf0.001"

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_executes_at_smoke_scale(name, spark):
    assert SPECS[name].fn(spark, SMOKE_SF).count() >= 0

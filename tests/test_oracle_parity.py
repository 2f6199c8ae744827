"""Run every registered query against its DuckDB oracle — the same check
the driver performs at sf0.01 (CORRECTNESS_r{N}.json), run here at the
fixture scale so regressions surface before the round gate.
"""

import pytest

from map_reduce_go_spark.registry import all_queries
from tests.oracle_compare import compare

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # Rows-only check (non-SQL-expressible ops) — mirror the driver.
        assert df.count() >= 0
        return
    compare(df, duck.sql(spec.oracle), name=name)

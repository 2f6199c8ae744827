import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Default test scale: sf0.001 for speed; set SPARK_GRAFT_TEST_SF=sf0.01 to
# run the same scale the driver's correctness gate uses.
TEST_SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR",
    f"/root/testdata/{os.environ.get('SPARK_GRAFT_TEST_SF', 'sf0.001')}",
)


@pytest.fixture(scope="session")
def spark():
    from map_reduce_go_spark import get_spark

    # local[N,2]: allow one task retry so fault-tolerance tests (the A7
    # crash-recovery analog) can inject task failures.
    spark = get_spark(app_name="mrgs-tests", master="local[32,2]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Query-owned caches release after every test — the same hygiene the
    bench/verify harnesses apply per query, so a 300-test session never
    accumulates pinned storage."""
    yield
    from map_reduce_go_spark.functions.caching import release_caches

    release_caches()


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()

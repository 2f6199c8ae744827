"""Print an order-insensitive value hash per query — used by the
local[1]-vs-local[32] conformance test (the reference's
sequential-vs-distributed golden compare, reference
src/main/test-mr.sh:78-114, re-expressed for this engine).

Usage: python scripts/hash_queries.py <sf_dir> <query> [<query> ...]
Parallelism comes from SPARK_GRAFT_CPUS (session.py).
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from map_reduce_go_spark import get_spark  # noqa: E402
from map_reduce_go_spark.registry import all_queries  # noqa: E402
from tests.oracle_compare import canonical_rows  # noqa: E402


def value_hash(df) -> str:
    rows = canonical_rows(df.toPandas())
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    spark = get_spark(app_name="hash-queries")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        print(f"{name} {value_hash(specs[name].fn(spark, sf_dir))}", flush=True)


if __name__ == "__main__":
    main()

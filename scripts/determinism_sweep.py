"""Determinism sweep: run every registered query TWICE — once at the
default 32 shuffle partitions, once at a coprime 7 — and require
identical canonical value hashes. Partition-count invariance is the
distributed-determinism claim behind every oracle green: a query whose
result depends on partitioning would pass the driver today and flake on
a 1000-executor cluster tomorrow.

Usage: python scripts/determinism_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from map_reduce_go_spark import get_spark  # noqa: E402
from map_reduce_go_spark.functions.caching import release_caches  # noqa: E402
from map_reduce_go_spark.registry import all_queries  # noqa: E402
from tests.oracle_compare import canonical_rows  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="determinism-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name, spec in sorted(all_queries().items()):
        t0 = time.time()
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = canonical_rows(spec.fn(spark, sf_dir).toPandas())
            release_caches()
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = canonical_rows(spec.fn(spark, sf_dir).toPandas())
            release_caches()
            ok = a == b
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ERROR {e}"))
            print(f"  {name}: ERROR {str(e)[:120]}")
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if not ok:
            failures.append((name, "NONDETERMINISTIC"))
        print(f"  {name}: {'stable' if ok else 'NONDETERMINISTIC'} {time.time()-t0:.1f}s")
    print(f"\n{len(all_queries()) - len(failures)}/{len(all_queries())} partition-count-stable")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Cluster job entry point for scripts/submit_cluster.sh (SURVEY §2.1 E18).

Runs one (or all) registered queries against --sf-dir and reports row
counts — the spark-submit analog of the reference's
``mrcoordinator pg-*.txt`` + worker fleet run (reference run.sh:4-32).
Inside spark-submit the SparkSession comes from the submitted conf
(getOrCreate picks it up); the script never hard-codes a master, so the
same file runs under local[4] smoke, YARN, standalone, or k8s.

Usage (via submit_cluster.sh, or directly under spark-submit):
    cluster_entry.py --sf-dir /root/testdata/sf0.01 [--query wordcount]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--query",
        default="wordcount",
        help="registered query name, or 'ALL' for the full registry sweep",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from map_reduce_go_spark.functions.caching import release_caches
    from map_reduce_go_spark.registry import all_queries

    # Under spark-submit the session inherits every --conf from the
    # launcher; builder defaults here would silently override them.
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    specs = all_queries()
    names = list(specs) if args.query == "ALL" else [args.query]
    for name in names:
        t0 = time.perf_counter()
        n = specs[name].fn(spark, args.sf_dir).count()
        release_caches()
        print(f"{name}: {n} rows in {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()

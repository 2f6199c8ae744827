#!/bin/bash
# Cluster launcher (SURVEY.md §2.1 E18) — the executable counterpart of the
# reference's run.sh (reference run.sh:4-32: coordinator + 2×5 workers over
# a shared EFS mount). On Spark the control plane is the cluster manager,
# so "launching the cluster job" is one spark-submit carrying the
# engine's execution posture (the SCALE.md conf table) as --conf flags.
#
# Usage:
#   scripts/submit_cluster.sh [--master URL] [--sf-dir DIR] [script args...]
#
#   --master   Spark master URL. Default: local[4] (CI smoke — this repo's
#              container has no cluster manager). Real deployments:
#                yarn | spark://host:7077 | k8s://https://apiserver
#   --sf-dir   Data directory (default /root/testdata/sf0.01). On a real
#              cluster point at the shared store (s3a://bucket/prefix,
#              hdfs:///path) — the stand-in for the reference's EFS mount.
#   remaining  Extra args for scripts/cluster_entry.py (e.g. --query
#              dedup_minhash_lsh, or --query ALL for the full sweep). The
#              default runs the wordcount flagship — reference
#              src/main/mrcoordinator.go + mrworker.go as one declarative
#              job.
#
# Sizing guidance for a ~100 TB / 1000-executor run is inline below and in
# SCALE.md; local smoke keeps the small values.

set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="local[4]"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
while [[ $# -gt 0 ]]; do
  case "$1" in
    --master) MASTER="$2"; shift 2 ;;
    --sf-dir) SF_DIR="$2"; shift 2 ;;
    *) break ;;
  esac
done
# Shuffle partition count: ≈128 MB post-shuffle partitions. local smoke
# keeps 32; a 100 TB input wants 20k–40k (AQE coalesces down, so erring
# high is safe — see SCALE.md "Global execution posture").
SHUFFLE_PARTITIONS="${SPARK_GRAFT_SHUFFLE_PARTITIONS:-32}"

# Ship the engine package to executors as a zip (real deployments: build
# the wheel once, park it on shared storage, point --py-files at it).
PYZIP="$(mktemp -t mrgs-pkg-XXXXXX).zip"
trap 'rm -f "$PYZIP"' EXIT
zip -qr "$PYZIP" map_reduce_go_spark __spark_entry__.py

spark-submit \
  --master "$MASTER" \
  --name map-reduce-go-spark \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="$SHUFFLE_PARTITIONS" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.legacy.parquet.nanosAsLong=true \
  --conf spark.sql.files.maxPartitionBytes=134217728 \
  --conf spark.speculation=true \
  --conf spark.serializer=org.apache.spark.serializer.KryoSerializer \
  --py-files "$PYZIP" \
  scripts/cluster_entry.py --sf-dir "$SF_DIR" "$@"

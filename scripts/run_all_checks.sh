#!/bin/bash
# One-shot validation: full test suite, oracle verification at both scale
# factors, and the headline bench. Exit nonzero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle verify sf0.01 =="
python scripts/verify_driver.py
echo "== oracle verify sf0.1 =="
python scripts/verify_driver.py /root/testdata/sf0.1
echo "== cluster launcher smoke (local[4]) =="
scripts/submit_cluster.sh --sf-dir /root/testdata/sf0.001 --query wordcount 2>/dev/null | tail -1
echo "== bench sf0.1 =="
python bench.py
# Optional (slow, ~8 min/mode): value-hash invariance across planner paths.
#   python scripts/determinism_sweep.py                    # 32 vs 7 partitions
#   python scripts/determinism_sweep.py --mode=broadcast   # auto-broadcast off
#   python scripts/determinism_sweep.py --mode=aqe         # adaptive off

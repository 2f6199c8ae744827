"""local[1]-vs-local[32] conformance: the same queries must produce
value-identical results single-threaded and fully parallel — the modern
form of the reference's sequential-oracle comparison
(mrsequential-vs-distributed, reference src/main/test-mr.sh:78-114).
Catches nondeterminism that the DuckDB oracle can't (e.g. an unsorted
collect_list leaking into output, partition-order-dependent expressions).
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Representative mix: agg, join+topk, distinct+collect, window, LSH.
QUERIES = [
    "wordcount",
    "inverted_index",
    "q1_pricing_summary",
    "q10_returned_item_revenue",
    "window_running_customer_spend",
    "dedup_minhash_lsh",
]


def _hashes(sf_dir: str, cpus: str) -> dict[str, str]:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "hash_queries.py"), sf_dir, *QUERIES],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
        check=True,
    ).stdout
    return dict(line.split() for line in out.strip().splitlines() if " " in line)


def test_local1_equals_local32(sf_dir):
    seq = _hashes(sf_dir, "1")
    par = _hashes(sf_dir, "32")
    assert set(seq) == set(QUERIES) and seq == par, {
        q: (seq.get(q), par.get(q)) for q in QUERIES if seq.get(q) != par.get(q)
    }

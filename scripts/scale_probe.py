"""Scale-up probe: replicate sf0.1 fixtures K× (keys shifted so
cardinalities grow linearly) into /tmp, then time headline queries at 1×
and K× to check the plans scale near-linearly — the local stand-in for
"would this survive 100×".

Usage: python scripts/scale_probe.py [K]   (default 8)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_go_spark import get_spark  # noqa: E402
from map_reduce_go_spark.registry import all_queries  # noqa: E402
from map_reduce_go_spark.sources.readers import TABLES, load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
# Key columns shifted per replica so joins/groups grow linearly instead of
# multiplying duplicate keys.
SHIFT_COLS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "wordcount",
    "dedup_minhash_lsh",
    "funnel_view_click_purchase",
    "bigram_lm_doc_score",
]


def replicate(spark, k: int, out_dir: str) -> None:
    for t in TABLES:
        df = load_table(spark, BASE, t)
        if t in SHIFT_COLS:
            n = df.count()
            parts = []
            for i in range(k):
                d = df
                for c in SHIFT_COLS[t]:
                    d = d.withColumn(c, F.col(c) + F.lit(i * 10 * n))
                parts.append(d)
            big = parts[0]
            for d in parts[1:]:
                big = big.unionByName(d)
        else:
            big = df  # dims stay fixed, like real scale-up
        big.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    specs = all_queries()
    for name in QUERIES:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="sfbig_")
    try:
        replicate(spark, k, out_dir)
        base = time_queries(spark, BASE)
        big = time_queries(spark, out_dir)
        ratios = {q: round(big[q] / base[q], 2) for q in QUERIES}
        print(json.dumps({"k": k, "base_s": base, "big_s": big, "ratio": ratios}))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

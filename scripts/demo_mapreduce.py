"""End-to-end demo of the reference's primary workflow: whole-file text
in -> Map -> shuffle -> Reduce -> partitioned `key value` text out
(reference: `mrcoordinator pg-*.txt` + N×`mrworker wc.so` producing
mr-out-0..9 — src/main/mrcoordinator.go, src/mr/worker.go:138-165).

Usage:
    python scripts/demo_mapreduce.py [out_dir] [app]
app: wc (default) | indexer | early_exit

Runs the generic 2-hook engine over the documents corpus (source=filename,
text=contents) with n_reduce=10 and writes the reference's text layout:
one part file per reduce bucket, lines "key value", order-insensitive.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from map_reduce_go_spark import get_spark  # noqa: E402
from map_reduce_go_spark.operators import mapreduce as mr  # noqa: E402
from map_reduce_go_spark.sources.readers import corpus_from_documents  # noqa: E402

APPS = {
    "wc": (mr.wc_map, mr.wc_reduce),
    "indexer": (mr.indexer_map, mr.indexer_reduce),
    "early_exit": (mr.early_exit_map, mr.early_exit_reduce),
}

N_REDUCE = 10  # the reference's hard-coded bucket count


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mr-out-")
    app = sys.argv[2] if len(sys.argv) > 2 else "wc"
    map_fn, reduce_fn = APPS[app]

    spark = get_spark(app_name=f"demo-mapreduce-{app}")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = corpus_from_documents(spark, "/root/testdata/sf0.001").select(
        "filename", "contents"
    )
    result = mr.map_reduce(spark, corpus, map_fn, reduce_fn, n_reduce=N_REDUCE)
    mr.write_text_kv(result, out, n_partitions=N_REDUCE)

    parts = sorted(Path(out).glob("part-*"))
    n_lines = sum(len(p.read_text().splitlines()) for p in parts)
    print(f"app={app} -> {out}: {len(parts)} reduce outputs, {n_lines} keys")
    for line in parts[0].read_text().splitlines()[:5]:
        print(" ", line)


if __name__ == "__main__":
    main()

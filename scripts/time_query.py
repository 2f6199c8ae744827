"""Time registered queries cold (memo-cleared) with the bench's noop-sink
methodology, without running the whole suite.

Usage:
    python scripts/time_query.py [-n RUNS] <query> [<query> ...]

Prints per-query cold median + spread (and one warm run) using exactly the
bench.py discipline: clear_memos() before each cold run, release_caches()
after every run, noop sink as the action. For quick A/B iteration during
optimization rounds.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from map_reduce_go_spark import get_spark  # noqa: E402
from map_reduce_go_spark.registry import all_queries  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = all_queries()
    spark = get_spark(app_name="mrgs-time")
    spark.sparkContext.setLogLevel("ERROR")
    from map_reduce_go_spark.functions.caching import clear_memos, release_caches

    # Warm-up (JVM/codegen/parquet footers) — same as bench.py.
    try:
        specs["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:  # noqa: BLE001
        pass

    for name in args:
        times: list[float] = []
        for _ in range(n_runs):
            clear_memos()
            spark.sparkContext.setJobDescription(f"time_query cold: {name}")
            t0 = time.perf_counter()
            try:
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: ERROR {type(exc).__name__}: {exc}")
                break
            finally:
                release_caches()
        if not times:
            continue
        times.sort()
        spark.sparkContext.setJobDescription(f"time_query warm: {name}")
        t0 = time.perf_counter()
        warm = None
        try:
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            warm = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: warm ERROR {type(exc).__name__}: {exc}")
        finally:
            release_caches()
        med = times[len(times) // 2]
        print(
            f"{name}: cold median {med:.3f}s [{times[0]:.3f}, {times[-1]:.3f}] "
            f"(n={len(times)}) warm {warm:.3f}s" if warm is not None else
            f"{name}: cold median {med:.3f}s [{times[0]:.3f}, {times[-1]:.3f}]"
        )


if __name__ == "__main__":
    main()

"""Property tests for the round-6 operators, beyond the oracle replay:
the oracle proves Spark and DuckDB agree on the DECLARED algorithm; these
prove the algorithm itself — weighted-median semantics vs a sequential
evaluator, interval-stabbing backlog vs a naive per-day count, KMV merge
identity and estimator error bounds, Gini vs a direct numpy computation,
chi-square additivity, and the sweep-line/first-seen invariants.
"""

from __future__ import annotations

import numpy as np

from map_reduce_go_spark.plans.events import (
    new_users_daily_cumulative,
    order_backlog_daily,
)
from map_reduce_go_spark.plans.relational import (
    chisq_segment_priority_independence,
    weighted_median_price,
)
from map_reduce_go_spark.plans.warehouse import revenue_lorenz_gini
from map_reduce_go_spark.operators.sketches import kmv_distinct_merge_probe


def test_weighted_median_matches_sequential_evaluator(spark, duck, sf_dir):
    """The cumulative-weight crossing must pick exactly the price where
    half the total quantity is reached, per flag — recomputed
    sequentially from the sorted rows."""
    got = {
        r.l_returnflag: (r.total_weight, r.weighted_median_price)
        for r in weighted_median_price(spark, sf_dir).collect()
    }
    rows = duck.sql(
        """
        SELECT l_returnflag, l_extendedprice, CAST(floor(l_quantity) AS BIGINT)
        FROM lineitem ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber
        """
    ).fetchall()
    by_flag: dict[str, list[tuple[float, int]]] = {}
    for flag, px, w in rows:
        by_flag.setdefault(flag, []).append((px, w))
    for flag, items in by_flag.items():
        total = sum(w for _, w in items)
        cum = 0
        for px, w in items:
            cum += w
            if 2 * cum >= total:
                assert got[flag] == (total, px), flag
                break


def test_backlog_matches_naive_per_day_count(spark, duck, sf_dir):
    """The sweep-line running sum must equal the naive 'count orders with
    start<=d and end>=d' on every emitted day (spot-checked on a sample
    of days including the first, last, and peak)."""
    got = {r.day: r.n_open for r in order_backlog_daily(spark, sf_dir).collect()}
    days = sorted(got)
    sample = {days[0], days[-1], max(got, key=got.get)} | set(days[:: len(days) // 7])
    for day in sample:
        naive = duck.sql(
            f"""
            SELECT count(*) FROM (
              SELECT o_orderkey, CAST(min(o_orderdate) AS DATE) AS s,
                     greatest(CAST(max(l_shipdate) AS DATE),
                              CAST(min(o_orderdate) AS DATE)) AS e
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              GROUP BY o_orderkey
            ) WHERE s <= DATE '{day}' AND e >= DATE '{day}'
            """
        ).fetchone()[0]
        assert got[day] == naive, day


def test_backlog_net_sums_to_zero_and_cumulative_nonnegative(spark, sf_dir):
    """Every order opens exactly once and closes exactly once, so the
    deltas must sum to zero over the full horizon, and an interval count
    can never be negative."""
    rows = order_backlog_daily(spark, sf_dir).collect()
    assert sum(r.net for r in rows) == 0
    assert all(r.n_open >= 0 for r in rows)


def test_new_users_cumulative_reaches_distinct_total(spark, duck, sf_dir):
    """First-seen accounting: daily new users must sum to the distinct
    user count, the cumulative column must be its prefix sum, and no day
    may claim a user twice."""
    rows = sorted(
        new_users_daily_cumulative(spark, sf_dir).collect(), key=lambda r: r.day
    )
    n_users = duck.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(r.new_users for r in rows) == n_users
    assert rows[-1].cumulative_users == n_users
    run = 0
    for r in rows:
        run += r.new_users
        assert r.cumulative_users == run


def test_kmv_merge_identity_and_error_bound(spark, sf_dir):
    """Merge identity is structural (k smallest of the union of per-group
    k-minima IS the global k-minimum set) — assert the query reports it —
    and the estimator must land within 5/sqrt(k-2) relative error (a
    ~6.5-sigma envelope; the expected error is 1/sqrt(k-2))."""
    row = kmv_distinct_merge_probe(spark, sf_dir).collect()[0]
    assert row.merge_consistent == 1
    assert row.merged_estimate == row.kmv_estimate
    rel = abs(row.kmv_estimate - row.exact_distinct) / row.exact_distinct
    assert rel < 5.0 / np.sqrt(64 - 2), (row.kmv_estimate, row.exact_distinct)


def test_gini_matches_numpy(spark, duck, sf_dir):
    """Gini and top-decile share recomputed directly with numpy from the
    per-customer cent totals must match the distributed rank-formula
    result at ppm precision (+-1 ppm for the floor)."""
    row = revenue_lorenz_gini(spark, sf_dir).collect()[0]
    cents = np.array(
        [
            r[0]
            for r in duck.sql(
                """
                SELECT CAST(floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6)))
                       AS DECIMAL(24,6)) * 100) AS BIGINT)
                FROM orders GROUP BY o_custkey
                """
            ).fetchall()
        ],
        dtype=np.int64,
    )
    x = np.sort(cents)
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    gini = (2.0 * float((i * x).sum()) - (n + 1) * float(x.sum())) / (
        n * float(x.sum())
    )
    top = float(x[n - n // 10 :].sum()) / float(x.sum())
    assert row.n_customers == n
    assert abs(row.gini_ppm - int(np.floor(1e6 * gini))) <= 1
    assert abs(row.top_decile_share_ppm - int(np.floor(1e6 * top))) <= 1


def test_chisq_cells_are_consistent_contingency_table(spark, sf_dir):
    """Contingency-table invariants: cell counts must sum to the join
    cardinality consistently across row/column marginals, expected
    counts (reconstructed from marginals) must sum back to the total,
    and every contribution must be non-negative."""
    rows = chisq_segment_priority_independence(spark, sf_dir).collect()
    total = sum(r.obs for r in rows)
    row_tot: dict[str, int] = {}
    col_tot: dict[str, int] = {}
    for r in rows:
        row_tot[r.segment] = row_tot.get(r.segment, 0) + r.obs
        col_tot[r.priority] = col_tot.get(r.priority, 0) + r.obs
    assert sum(row_tot.values()) == total == sum(col_tot.values())
    exp_sum = 0.0
    for r in rows:
        exp = row_tot[r.segment] * col_tot[r.priority] / total
        exp_sum += exp
        assert abs(r.expected_milli - int(1000 * row_tot[r.segment] * col_tot[r.priority] // total)) == 0
        assert r.chi2_contrib >= 0
        # Recompute the contribution independently.
        assert abs(r.chi2_contrib - (r.obs - exp) ** 2 / exp) < 1e-4
    # With every (segment, priority) combination observed, Σ expected = N.
    assert abs(exp_sum - total) < 1e-6


def test_bpe_merge_steps_match_pure_python_trainer(spark, duck, sf_dir):
    """The 3-step distributed BPE train must pick exactly the merges a
    sequential pure-Python BPE trainer picks on the same word counts —
    greedy most-frequent pair, ties (count DESC, pair ASC), greedy
    left-to-right application. Proves the boundary-encoded string
    replace IS BPE application, independent of both SQL engines."""
    from map_reduce_go_spark.operators.textstats import (
        BPE_MERGE_STEPS,
        bpe_merge_steps,
    )

    got = [
        (r.step, r.sym_a, r.sym_b, r.merged, r.pair_count)
        for r in sorted(bpe_merge_steps(spark, sf_dir).collect())
    ]

    wc = duck.sql(
        r"""
        SELECT word, count(*) FROM (
          SELECT unnest(list_filter(string_split_regex(text, '[^\p{L}]+'),
                                    x -> len(x) > 0)) AS word
          FROM documents) GROUP BY word
        """
    ).fetchall()
    vocab = {tuple(w): c for w, c in wc}  # symbol tuple -> count

    expected = []
    for step in range(1, BPE_MERGE_STEPS + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((step, a, b, a + b, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):  # greedy left-to-right, non-overlapping
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    assert got == expected

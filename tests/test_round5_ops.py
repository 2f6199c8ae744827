"""Property tests for the round-5 operators, beyond the oracle replay:
the oracle proves Spark and DuckDB agree on the DECLARED algorithm; these
prove the algorithm itself (blocking completeness vs brute force, entropy
vs an independent numpy recomputation, integer-PageRank invariants,
sampling-rate statistics, Z-order bounding-box geometry).
"""

from __future__ import annotations

import math

import numpy as np

from map_reduce_go_spark.operators.dedup import (
    EDIT_MAX_DIST,
    editdist_deletion_join,
)
from map_reduce_go_spark.operators.pipeline import stratified_sample_mktsegment
from map_reduce_go_spark.operators.textstats import (
    PAGERANK_SCALE,
    char_entropy_quality,
    word_graph_pagerank,
    word_graph_triangles,
)
from map_reduce_go_spark.plans.relational import morton_zorder_layout_audit


def test_editdist_deletion_join_matches_bruteforce(spark, duck, sf_dir):
    """Blocking completeness: deletion-neighborhood candidate generation
    is GUARANTEED not to lose any true distance-<=1 pair, so the
    per-customer neighbor counts must exactly equal the O(N^2)
    brute-force join's — the recall contract, proven against an
    independent engine."""
    got = {
        r.c_custkey: r.n_edit_neighbors
        for r in editdist_deletion_join(spark, sf_dir).collect()
    }
    brute = dict(
        duck.sql(
            f"""
            WITH pairs AS (
              SELECT a.c_custkey AS ka, b.c_custkey AS kb
              FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
              WHERE levenshtein(a.c_name, b.c_name) <= {EDIT_MAX_DIST}
            ),
            endpoints AS (
              SELECT ka AS k FROM pairs UNION ALL SELECT kb FROM pairs
            )
            SELECT k, count(*) FROM endpoints GROUP BY k
            """
        ).fetchall()
    )
    assert got == brute


def test_char_entropy_matches_numpy(spark, sf_dir):
    """Independent recomputation: per-doc entropy from numpy over the
    raw text must match the distributed sorted-fold to 4 dp."""
    rows = char_entropy_quality(spark, sf_dir).collect()
    texts = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    assert len(rows) == sum(1 for t in texts.values() if len(t) > 0)
    for r in rows[:50]:
        _, counts = np.unique(list(texts[r.doc_id]), return_counts=True)
        n = counts.sum()
        h = math.log2(n) - float((counts * np.log2(counts)).sum()) / n
        assert r.n_chars == n
        assert r.distinct_chars == len(counts)
        assert abs(r.char_entropy - h) < 5e-4, r.doc_id


def test_pagerank_invariants(spark, sf_dir):
    """Integer PageRank: every node's rank is at least the damping base
    (0.15*SCALE), total mass never exceeds the initial n*SCALE (mass only
    leaks via dangling nodes and floor division, never grows), and some
    node with in-edges exceeds the base."""
    rows = word_graph_pagerank(spark, sf_dir).collect()
    base = PAGERANK_SCALE * 15 // 100
    assert rows
    assert all(r.rank_ppb >= base for r in rows)
    assert sum(r.rank_ppb for r in rows) <= len(rows) * PAGERANK_SCALE
    assert max(r.rank_ppb for r in rows) > base


def test_triangle_counts_symmetric(spark, sf_dir):
    """Every triangle contributes exactly 3 memberships, so the total
    membership count is divisible by 3 and each node's count is >= 1."""
    rows = word_graph_triangles(spark, sf_dir).collect()
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0
    assert all(r.n_triangles >= 1 for r in rows)


def test_stratified_sample_rates(spark):
    """At sf0.01 (enough rows per stratum for the law of large numbers),
    each stratum's achieved md5-threshold rate lands near its target:
    BUILDING ~25%, others ~10%."""
    rows = stratified_sample_mktsegment(spark, "/root/testdata/sf0.01").collect()
    for r in rows:
        target = 0.25 if r.c_mktsegment == "BUILDING" else 0.10
        assert abs(r.achieved_rate - target) < 0.06, (r.c_mktsegment, r.achieved_rate)
        assert 0 < r.n_sampled < r.n_total


def test_morton_buckets_bound_both_dimensions(spark, sf_dir):
    """Z-order geometry: bucketing by the top 6 bits of a 16-bit Morton
    code fixes the high 3 bits of each 8-bit dimension, so every bucket's
    bounding box spans at most 32 in BOTH dimensions — the property that
    makes min/max file stats prune on either predicate column."""
    rows = morton_zorder_layout_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.z_bucket < 64
        assert r.max_px - r.min_px <= 31, r
        assert r.max_sy - r.min_sy <= 31, r


def test_forward_fill_carries_last_observation(spark, sf_dir):
    """LOCF semantics: for each user's ordered series, every filled value
    equals the most recent non-masked value; leading gaps stay NULL."""
    from map_reduce_go_spark.plans.events import forward_fill_event_values

    rows = forward_fill_event_values(spark, sf_dir)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    got = {r.event_id: (r.was_gap, r.filled_value) for r in rows.collect()}
    by_user: dict[int, list] = {}
    for e in sorted(ev, key=lambda e: (e.ts, e.event_id)):
        by_user.setdefault(e.user_id, []).append(e)
    checked = 0
    for user, seq in list(by_user.items())[:50]:
        last = None
        for e in seq:
            masked = e.event_id % 5 == 0
            if not masked:
                last = e.value
            was_gap, filled = got[e.event_id]
            assert was_gap == masked
            assert filled == last, (user, e.event_id)
            checked += 1
    assert checked > 0


def test_moment_stats_match_numpy(spark, sf_dir):
    """Independent recomputation: population variance/skewness/kurtosis
    from numpy must match the exact-power-sum formulation to 5 dp."""
    from map_reduce_go_spark.plans.relational import moment_stats_quantity

    rows = {r.l_returnflag: r for r in moment_stats_quantity(spark, sf_dir).collect()}
    q = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity")
        .collect()
    )
    groups: dict[str, list[float]] = {}
    for r in q:
        groups.setdefault(r.l_returnflag, []).append(float(r.l_quantity))
    for flag, vals in groups.items():
        a = np.array(vals)
        mean, var = a.mean(), a.var()
        z = (a - mean) / np.sqrt(var)
        got = rows[flag]
        assert got.n == len(vals)
        assert abs(got.mean_qty - mean) < 1e-5
        assert abs(got.var_pop - var) < 1e-4
        assert abs(got.skewness_pop - (z**3).mean()) < 1e-4
        assert abs(got.kurtosis_pop - ((z**4).mean() - 3)) < 1e-3


def test_zscore_standardizes_per_source(spark, sf_dir):
    """Per-source z-scores must have mean ~0 and population std ~1."""
    from map_reduce_go_spark.operators.pipeline import zscore_doclen_by_source

    rows = zscore_doclen_by_source(spark, sf_dir).collect()
    per_src: dict[str, list[float]] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r.len_zscore)
    for src, zs in per_src.items():
        a = np.array(zs)
        assert abs(a.mean()) < 1e-3, src
        assert abs(a.std() - 1.0) < 1e-2, src


def test_containment_dominates_jaccard(spark, sf_dir):
    """|A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| always; every emitted pair meets
    the containment threshold."""
    from map_reduce_go_spark.operators.dedup import (
        CONTAINMENT_MIN,
        dedup_minhash_containment,
    )

    rows = dedup_minhash_containment(spark, sf_dir).collect()
    for r in rows:
        assert r.containment >= r.jaccard - 1e-9
        assert r.containment >= CONTAINMENT_MIN - 1e-9
        assert r.doc_a < r.doc_b


def test_setsim_prefix_filter_matches_bruteforce(spark, duck, sf_dir):
    """Prefix-filtering recall certificate: the candidate scheme must
    lose NO pair with shingle-set Jaccard >= T — proven against the
    O(N^2) inverted-index brute force on an independent engine."""
    from map_reduce_go_spark.operators.dedup import (
        SETSIM_T,
        setsim_prefix_filter_join,
    )

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in setsim_prefix_filter_join(spark, sf_dir).collect()
    }
    brute = {
        (a, b): round(j, 6)
        for a, b, j in duck.sql(
            rf"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '[^\p{{L}}]+'),
                                 x -> len(x) > 0) AS ws
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
              FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            common AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS nc
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b, CAST(nc AS DOUBLE) / (sa.n + sb.n - nc)
            FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
            WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= {SETSIM_T}
            """
        ).fetchall()
    }
    assert got == brute

"""Semantic and plan properties of the late-round-8 operators: the
hashing-trick featurizer, the one-pass Poisson bootstrap, winnowing
fingerprints, sorted-neighborhood dedup, and set-based FIFO allocation.
Oracle parity is the driver's job; these pin the theorems the oracle
comparison can't state (parity/norm inequalities, the one-Exchange
bootstrap contract, winnowing's density bounds, SNM's exact-duplicate
recall, FIFO's exhaustion identity and queue-walk equivalence)."""

from __future__ import annotations

from map_reduce_go_spark.registry import all_queries


def _q(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir)


# ------------------------------------------------------- feature hashing


def test_feature_hashing_norm_identities(spark, sf_dir):
    """Signed-sum collision algebra, checked on every fixture doc: each
    bucket value v over cnt tokens satisfies |v| <= cnt and
    |v| ≡ cnt (mod 2), so per doc l1 <= n_tokens and
    l1 ≡ n_tokens (mod 2); nnz <= min(DIM, n_tokens); and v² >= |v|
    for integer v gives sq_norm >= l1."""
    from map_reduce_go_spark.operators.pipeline import FEATURE_HASH_DIM

    rows = _q("feature_hashing_vectorize", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["nnz"] <= min(FEATURE_HASH_DIM, r["n_tokens"])
        assert r["l1_norm"] <= r["n_tokens"]
        assert (r["l1_norm"] - r["n_tokens"]) % 2 == 0
        assert r["sq_norm"] >= r["l1_norm"]  # v^2 >= |v| for integer v


def test_feature_hashing_two_exchange_plan(spark, sf_dir):
    """The scale contract: exactly two shuffles — (doc, bucket) partial
    sums, then the per-doc rollup. Anything more means the hashing lost
    its map-side combine."""
    df = _q("feature_hashing_vectorize", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan


# ------------------------------------------------------ Poisson bootstrap


def test_bootstrap_weight_ladder_boundaries(spark):
    """The inverse-CDF ladder maps u32 uniforms to Poisson(1) weights at
    the exact integer thresholds."""
    from map_reduce_go_spark.plans.relational import (
        _POISSON1_CDF_U32,
        _poisson_weight_case,
    )

    cases = []
    for k, t in enumerate(_POISSON1_CDF_U32):
        cases.append((t - 1, k))  # just below threshold k -> weight k
        cases.append((t, k + 1))  # at threshold -> next weight
    cases.append((2**32 - 1, 6))  # cap
    sql = ", ".join(
        f"({_poisson_weight_case(str(u))}) AS w{i}"
        for i, (u, _) in enumerate(cases)
    )
    row = spark.sql(f"SELECT {sql}").collect()[0]
    for i, (_, expect) in enumerate(cases):
        assert row[f"w{i}"] == expect, (i, cases[i])


def test_bootstrap_is_one_pass(spark, sf_dir):
    """THE reason this bootstrap survives 100 TB: no ×B data explosion —
    the whole plan has exactly one shuffle (the per-priority aggregate)
    and the orders fact appears in exactly one scan."""
    df = _q("bootstrap_ci_avg_price", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("orders.parquet") <= plan.count("Scan parquet")
    assert plan.count("Scan parquet") == 1, plan


def test_bootstrap_ci_brackets_point(spark, sf_dir):
    """Order-statistic sanity: lo <= hi always; at fixture group sizes
    (>=300 rows/priority) the trimmed resample interval brackets the
    full-sample mean."""
    rows = _q("bootstrap_ci_avg_price", spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["ci_lo_micro"] <= r["ci_hi_micro"]
        assert r["ci_lo_micro"] <= r["point_micro"] <= r["ci_hi_micro"]


# ---------------------------------------------------------- winnowing


def test_winnowing_density_bounds(spark, duck, sf_dir):
    """Winnowing's sampling guarantees, checked per fixture doc: with m
    full windows, the selected-fingerprint count is at least ceil(m/w)
    (a fingerprint survives at most w consecutive windows) and at most
    m (one new selection per window)."""
    from map_reduce_go_spark.operators.dedup import (
        SHINGLE_K,
        WINNOW_W,
        _WINNOW_POS_BASE,
    )

    sel = duck.execute(
        f"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '[^\\p{{L}}]+'),
                             x -> len(x) > 0) AS ws
          FROM documents
        ),
        pos_kg AS (
          SELECT doc_id, i AS pos,
                 ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
          FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
        ),
        comb AS (
          SELECT doc_id, pos,
                 CAST('0x' || substring(md5(s), 1, 8) AS BIGINT)
                   * {_WINNOW_POS_BASE} + pos AS c
          FROM pos_kg
        ),
        sel AS (
          SELECT doc_id,
                 min(c) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                              AND CURRENT ROW) AS fp_comb,
                 count(*) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                AND CURRENT ROW) AS cnt
          FROM comb
        )
        SELECT doc_id,
               count(DISTINCT fp_comb) AS n_sel,
               count(*) AS n_windows
        FROM sel WHERE cnt = {WINNOW_W}
        GROUP BY doc_id
        """
    ).fetchall()
    assert sel, "fixture should contain docs with full windows"
    assert SHINGLE_K == 3  # the ws[i]..ws[i+2] build above assumes k=3
    for _doc, n_sel, m in sel:
        assert -(-m // WINNOW_W) <= n_sel <= m, (_doc, n_sel, m)


def test_winnowing_pairs_are_canonical(spark, sf_dir):
    rows = _q("winnowing_fingerprints", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_shared"] >= 2
        assert 0 < r["jaccard_ppm"] <= 1_000_000


# ------------------------------------------------- sorted neighborhood


def test_snm_rank_window_is_partitioned(spark, sf_dir):
    """The global sort rank must use the distributed-row_number idiom:
    every window in the plan is partitioned on the range-partition id —
    no single-partition global window anywhere."""
    df = _q("dedup_sorted_neighborhood", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = [
        seg.split(")", 1)[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs, "expected the rank window in the SNM plan"
    for spec in specs:
        assert spec.startswith("pid#"), spec


def test_snm_finds_scattered_exact_duplicates(spark):
    """Recall floor on a constructed corpus (the driver fixtures contain
    no exact duplicates): contents duplicated at doc_ids far apart in
    id order sort to ADJACENT ranks (identical key, doc_id tiebreak),
    so sorted neighborhood must emit every such pair at Jaccard 1.0 —
    what hash blocking (dedup_exact) catches must not escape the
    sort-based method. Decoys with disjoint vocabularies must not
    pair."""
    from map_reduce_go_spark.operators.dedup import (
        SNM_WINDOW,
        sorted_neighborhood_pairs,
    )

    assert SNM_WINDOW >= 2
    dup_a = "the quick brown fox jumps over the lazy dog again and again"
    dup_b = "zebra quartz violin mango echo delta kilo romeo sierra unit"
    docs = spark.createDataFrame(
        [
            (3, dup_a),
            (907, dup_a),  # far from 3 in id order, adjacent in key order
            (41, dup_b),
            (500, dup_b),
            (7, "completely unrelated filler words one"),
            (8, "different vocabulary entirely here two"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in sorted_neighborhood_pairs(spark, docs).collect()
    }
    assert got.get((3, 907)) == 1_000_000
    assert got.get((41, 500)) == 1_000_000
    assert all({a, b} in ({3, 907}, {41, 500}) for a, b in got)


# ------------------------------------------------------ FIFO allocation


def test_fifo_exhaustion_identity(spark, sf_dir):
    """The interval-overlap construction's completeness theorem: both
    cumulative axes tile [0, side_total], so total allocation per part
    equals min(receipts, issues) — equivalently at least one of
    unfilled/ending is zero for every part."""
    rows = _q("fifo_inventory_allocation", spark, sf_dir).collect()
    assert rows
    for r in rows:
        rq = r["qty_ending"] + r["qty_allocated"]
        iq = r["qty_unfilled"] + r["qty_allocated"]
        assert r["qty_allocated"] == min(rq, iq), r
        assert r["qty_unfilled"] == 0 or r["qty_ending"] == 0, r
        assert r["qty_unfilled"] >= 0 and r["qty_ending"] >= 0, r


def test_fifo_matches_imperative_queue_walk(spark, duck, sf_dir):
    """Equivalence with the definition: replay five parts through a
    literal FIFO queue (receipts consumed front-first by issues in ship
    order) and compare match count and units allocated."""
    parts = [
        p
        for (p,) in duck.execute(
            """
            SELECT l_partkey FROM lineitem
            WHERE l_returnflag IN ('R','A')
            GROUP BY l_partkey
            HAVING count(*) >= 8
            ORDER BY l_partkey LIMIT 5
            """
        ).fetchall()
    ]
    got = {
        r["l_partkey"]: r
        for r in _q("fifo_inventory_allocation", spark, sf_dir)
        .where(f"l_partkey IN ({','.join(map(str, parts))})")
        .collect()
    }
    for pk in parts:
        rows = duck.execute(
            f"""
            SELECT l_returnflag, CAST(l_quantity AS BIGINT)
            FROM lineitem
            WHERE l_partkey = {pk} AND l_returnflag IN ('R','A')
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            """
        ).fetchall()
        lots = [q for f, q in rows if f == "R"]
        n_alloc = allocated = 0
        head = 0  # index of the first lot with remaining units
        rem = lots[0] if lots else 0
        for f, q in rows:
            if f != "A":
                continue
            # issues consume lots front-first, regardless of arrival
            # interleaving — FIFO on the cumulative axis is order-free
            need = q
            while need > 0 and head < len(lots):
                take = min(need, rem)
                if take > 0:
                    allocated += take
                    n_alloc += 1
                    need -= take
                    rem -= take
                if rem == 0:
                    head += 1
                    rem = lots[head] if head < len(lots) else 0
        r = got[pk]
        assert r["n_allocations"] == n_alloc, (pk, r, n_alloc)
        assert r["qty_allocated"] == allocated, (pk, r, allocated)

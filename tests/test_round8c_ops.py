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


def test_winnowing_coverage_theorem(spark):
    """The winnowing guarantee (Schleimer et al., theorem 1): any two
    documents sharing a run of at least w + k - 1 words must share at
    least one SELECTED fingerprint — the window over the shared run's
    k-grams picks the same minimal hash in both docs. Checked over
    constructed pairs embedding a (WINNOW_W + SHINGLE_K - 1)-word run at
    different offsets inside otherwise-disjoint text; a disjoint decoy
    must share nothing."""
    from map_reduce_go_spark.operators.dedup import (
        SHINGLE_K,
        WINNOW_W,
        winnowing_fingerprint_sets,
    )

    run_len = WINNOW_W + SHINGLE_K - 1
    shared = " ".join(f"sharedword{i}" for i in range(run_len))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta {shared} epsilon zeta"),
            (2, f"one two {shared} three four five six seven eight"),
            (3, "totally disjoint vocabulary nothing in common here at all"),
        ],
        "doc_id long, text string",
    )
    fps = {1: set(), 2: set(), 3: set()}
    for r in winnowing_fingerprint_sets(docs).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared run must yield a shared fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


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


# ------------------------------------- hypothesis conformance (batched)


def _py_winnow(text: str):
    """Pure-Python reference winnowing over letter-word texts (the test
    alphabet avoids tokenizer divergence): word-3-grams at 1-based
    positions, md5-slice hash, min of packed (hash, pos) per 4-window."""
    import hashlib

    from map_reduce_go_spark.operators.dedup import (
        SHINGLE_K,
        WINNOW_W,
        _WINNOW_POS_BASE,
    )

    toks = [t for t in text.split() if t]
    combs = []
    for i in range(len(toks) - SHINGLE_K + 1):
        kg = " ".join(toks[i : i + SHINGLE_K])
        h = int(hashlib.md5(kg.encode()).hexdigest()[:8], 16)
        combs.append(h * _WINNOW_POS_BASE + (i + 1))
    fps = set()
    for end in range(WINNOW_W - 1, len(combs)):
        fps.add(min(combs[end - WINNOW_W + 1 : end + 1]) // _WINNOW_POS_BASE)
    return fps


def _py_snm(docs):
    """Pure-Python reference sorted-neighborhood over letter-word texts."""
    import re

    from map_reduce_go_spark.operators.dedup import (
        SNM_KEY_CHARS,
        SNM_WINDOW,
        _SNM_MIN_J_PPM,
    )

    keyed = sorted(
        (re.sub("[^a-z0-9]", "", t.lower())[:SNM_KEY_CHARS], d)
        for d, t in docs
    )
    toks = {d: {w for w in t.split() if w} for d, t in docs}
    out = {}
    for i in range(len(keyed)):
        for j in range(i + 1, min(i + SNM_WINDOW, len(keyed))):
            da, db = keyed[i][1], keyed[j][1]
            a, b = toks[da], toks[db]
            nc, union = len(a & b), len(a | b)
            if union > 0 and 1_000_000 * nc >= _SNM_MIN_J_PPM * union:
                out[(min(da, db), max(da, db))] = (
                    j - i,
                    (1_000_000 * nc) // union,
                )
    return out


def _hyp():
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    return HealthCheck, given, settings, st


_HealthCheck, _given, _settings, _st = _hyp()


@_st.composite
def _letter_corpora(draw):
    # Small vocabulary ON PURPOSE: repeats create shared k-grams
    # (winnowing collisions) and near-identical docs (SNM matches).
    word = _st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
    n = draw(_st.integers(min_value=1, max_value=8))
    return [
        (i, " ".join(draw(_st.lists(word, min_size=0, max_size=14))))
        for i in range(n)
    ]


@_settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[_HealthCheck.function_scoped_fixture],
)
@_given(docs=_letter_corpora())
def test_winnowing_selection_matches_python_reference(spark, docs):
    from map_reduce_go_spark.operators.dedup import (
        winnowing_fingerprint_sets,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in winnowing_fingerprint_sets(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for d, t in docs:
        assert got.get(d, set()) == _py_winnow(t), (d, t)


@_settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[_HealthCheck.function_scoped_fixture],
)
@_given(docs=_letter_corpora())
def test_snm_matches_python_reference(spark, docs):
    from map_reduce_go_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["rank_gap"], r["jaccard_ppm"])
        for r in sorted_neighborhood_pairs(spark, df).collect()
    }
    assert got == _py_snm(docs)


# ------------------------------------------------- maximal shared spans


def test_maximal_span_planted_recall(spark):
    """Planted-long-span recall (VERDICT r13 #4 'Done =' criterion): a
    unique 23-token run planted at different offsets in two otherwise
    disjoint documents is reported with its EXACT length and 1-based
    token offsets; a pair sharing only a sub-threshold run is absent;
    of two shared runs the longer one wins; and a single mid-span token
    edit splits the run (exactness — near-match must not chain)."""
    from map_reduce_go_spark.operators.dedup import (
        MAXSPAN_MIN_TOKENS,
        maximal_shared_spans,
    )

    span = [f"plantword{i}" for i in range(23)]
    short = [f"shortword{i}" for i in range(MAXSPAN_MIN_TOKENS - 1)]
    second = [f"secondrun{i}" for i in range(12)]
    edited = list(span)
    edited[11] = "EDITEDTOKEN"

    def words(prefix, n):
        return [f"{prefix}{i}" for i in range(n)]

    docs = spark.createDataFrame(
        [
            # pair (1,2): the 23-token plant at offsets 4 and 7, PLUS a
            # 12-token second run later — the 23 must win.
            (1, " ".join(words("fillerA", 3) + span + words("fillerB", 5)
                         + second + words("fillerC", 2))),
            (2, " ".join(words("fillerD", 6) + span + words("fillerE", 4)
                         + second + words("fillerF", 3))),
            # pair (3,4): only the sub-threshold short run in common.
            (3, " ".join(words("fillerG", 5) + short + words("fillerH", 5))),
            (4, " ".join(words("fillerI", 8) + short + words("fillerJ", 2))),
            # doc 5 carries the EDITED span: vs doc 1 the longest exact
            # run is the 11-token prefix (tokens 0..10 of the plant).
            (5, " ".join(words("fillerK", 9) + edited + words("fillerL", 4))),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in maximal_shared_spans(docs).collect()
    }
    got = rows[(1, 2)]
    assert got["span_tokens"] == 23
    assert got["pos_a"] == 4 and got["pos_b"] == 7  # 1-based token offsets
    assert (3, 4) not in rows, "sub-threshold run must not be reported"
    prefix = rows[(1, 5)]
    assert prefix["span_tokens"] == 11  # edit splits the exact run
    assert prefix["pos_a"] == 4 and prefix["pos_b"] == 10
    # The suffix after the edit is 23-12=11 too: tie breaks by pos_a asc,
    # so the PREFIX run is the canonical report. Pair (2,5) sees the
    # same two 11-token halves through different offsets.
    assert rows[(2, 5)]["span_tokens"] == 11


def test_span_cut_list_keep_lowest_and_merge(spark):
    """The exact-substring dedup DECISION over the same planted corpus:
    the lowest doc_id of every duplicate family is never cut; cut
    ranges land at the exact token offsets of the doc_b occurrences;
    runs separated by ONE edited token do NOT merge (the edit survives);
    and the same range marked through two different partners dedupes to
    one interval."""
    from map_reduce_go_spark.operators.dedup import (
        MAXSPAN_MIN_TOKENS,
        exact_substring_cut_list,
    )

    span = [f"plantword{i}" for i in range(23)]
    short = [f"shortword{i}" for i in range(MAXSPAN_MIN_TOKENS - 1)]
    second = [f"secondrun{i}" for i in range(12)]
    edited = list(span)
    edited[11] = "EDITEDTOKEN"

    def words(prefix, n):
        return [f"{prefix}{i}" for i in range(n)]

    docs = spark.createDataFrame(
        [
            (1, " ".join(words("fillerA", 3) + span + words("fillerB", 5)
                         + second + words("fillerC", 2))),
            (2, " ".join(words("fillerD", 6) + span + words("fillerE", 4)
                         + second + words("fillerF", 3))),
            (3, " ".join(words("fillerG", 5) + short + words("fillerH", 5))),
            (4, " ".join(words("fillerI", 8) + short + words("fillerJ", 2))),
            (5, " ".join(words("fillerK", 9) + edited + words("fillerL", 4))),
        ],
        "doc_id long, text string",
    )
    cuts = {}
    for r in exact_substring_cut_list(docs).collect():
        cuts.setdefault(r["doc_id"], []).append(
            (r["cut_start"], r["cut_end"], r["cut_tokens"])
        )
    for d in cuts:
        cuts[d].sort()
    # Doc 1 is the lowest of every family it belongs to: never cut.
    assert 1 not in cuts
    assert 3 not in cuts and 4 not in cuts  # sub-threshold family
    # Doc 2: the 23-token plant at tokens 7-29 and the 12-token second
    # run at 34-45 (6 filler + 23 span + 4 filler -> second at 34).
    assert cuts[2] == [(7, 29, 23), (34, 45, 12)]
    # Doc 5: the edit at plant index 11 splits the copy into an 11-token
    # prefix (tokens 10-20) and an 11-token suffix (22-32); the single
    # surviving EDITEDTOKEN at 21 keeps them two intervals. Both ranges
    # are marked via doc 1 AND doc 2 — the distinct collapses them.
    assert cuts[5] == [(10, 20, 11), (22, 32, 11)]


def test_maximal_span_equals_bruteforce_lcs(spark):
    """Exactness against an independent oracle: on a seeded random
    corpus over a 2-word vocabulary (dense chance repeats, multiple
    diagonals, within-doc duplicate k-grams — everything the planted
    test's unique tokens can't exercise), every reported pair's
    span_tokens equals the true longest common token substring computed
    by quadratic DP, the reported offsets point at a real occurrence of
    that span in BOTH docs, and every pair whose true LCS >= the
    threshold is reported (24 docs keeps every fingerprint's df under
    the stop-filter, so candidate recall is the coverage theorem's)."""
    import random

    from map_reduce_go_spark.operators.dedup import (
        MAXSPAN_MIN_TOKENS,
        maximal_shared_spans,
    )

    rng = random.Random(4242)
    toks = {}
    rows = []
    for d in range(1, 23):
        t = [rng.choice(("aa", "bb")) for _ in range(60)]
        toks[d] = t
        rows.append((d, " ".join(t)))
    # Plant one guaranteed long family so the >= threshold branch is
    # exercised even if chance LCS stays below it.
    plant = [rng.choice(("aa", "bb")) for _ in range(17)]
    toks[23] = toks[3][:10] + plant + toks[3][40:]
    toks[24] = toks[7][:25] + plant + toks[7][50:]
    rows += [(23, " ".join(toks[23])), (24, " ".join(toks[24]))]

    def lcs_len(x, y):
        best = 0
        prev = [0] * (len(y) + 1)
        for i in range(1, len(x) + 1):
            cur = [0] * (len(y) + 1)
            for j in range(1, len(y) + 1):
                if x[i - 1] == y[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in maximal_shared_spans(docs).collect()
    }
    want = {}
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            want[(a, b)] = lcs_len(toks[a], toks[b])
    over = {p for p, n in want.items() if n >= MAXSPAN_MIN_TOKENS}
    assert over, "fixture must contain >= threshold pairs"
    assert set(got) == over, (sorted(over - set(got)), sorted(set(got) - over))
    for (a, b), r in got.items():
        n = r["span_tokens"]
        assert n == want[(a, b)], (a, b, n, want[(a, b)])
        sa, sb = r["pos_a"] - 1, r["pos_b"] - 1
        assert toks[a][sa : sa + n] == toks[b][sb : sb + n]


def test_span_apply_composes_with_cut_list(spark):
    """Cut APPLICATION over the planted corpus (VERDICT r14 #5): every
    doc appears exactly once; kept + cut == orig everywhere; per-doc
    cut_tokens equals the cut list's sum (composition with
    exact_substring_cut_list); the never-cut doc's digest is the digest
    of its FULL token stream; and a cut doc's digest equals the md5 of
    exactly the surviving tokens in original order."""
    import hashlib

    from map_reduce_go_spark.operators.dedup import (
        exact_substring_apply,
        exact_substring_cut_list,
    )

    span = [f"plantword{i}" for i in range(23)]
    second = [f"secondrun{i}" for i in range(12)]
    edited = list(span)
    edited[11] = "EDITEDTOKEN"

    def words(prefix, n):
        return [f"{prefix}{i}" for i in range(n)]

    toks = {
        1: words("fillerA", 3) + span + words("fillerB", 5)
           + second + words("fillerC", 2),
        2: words("fillerD", 6) + span + words("fillerE", 4)
           + second + words("fillerF", 3),
        5: words("fillerK", 9) + edited + words("fillerL", 4),
    }
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in toks.items()],
        "doc_id long, text string",
    )
    applied = {r["doc_id"]: r for r in exact_substring_apply(docs).collect()}
    assert set(applied) == set(toks)  # full manifest, not just cut rows
    # The engine tokenizes on WORD_BOUNDARY = [^\p{L}]+ (digits are
    # separators), so the expected digests are over letter-only tokens.
    import re

    toks = {
        d: [w for w in re.split(r"[^a-zA-Z]+", " ".join(t)) if w]
        for d, t in toks.items()
    }
    cut_sum: dict[int, int] = {}
    cut_ranges: dict[int, list[tuple[int, int]]] = {}
    for r in exact_substring_cut_list(docs).collect():
        cut_sum[r["doc_id"]] = cut_sum.get(r["doc_id"], 0) + r["cut_tokens"]
        cut_ranges.setdefault(r["doc_id"], []).append(
            (r["cut_start"], r["cut_end"])
        )
    for d, t in toks.items():
        row = applied[d]
        assert row["orig_tokens"] == len(t)
        assert row["kept_tokens"] + row["cut_tokens"] == row["orig_tokens"]
        assert row["cut_tokens"] == cut_sum.get(d, 0)
        kept = [
            tok for i, tok in enumerate(t, start=1)
            if not any(s <= i <= e for s, e in cut_ranges.get(d, []))
        ]
        want = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert row["kept_digest"] == want, (d, kept[:5])
    # Doc 1 is the lowest of its family: untouched, full-stream digest.
    assert applied[1]["cut_tokens"] == 0
    assert applied[1]["kept_digest"] == hashlib.md5(
        " ".join(toks[1]).encode()
    ).hexdigest()
    # Doc 2 loses both planted runs (23 + 12); doc 5 its two 11-token
    # halves around the surviving edit.
    assert applied[2]["cut_tokens"] == 35
    assert applied[5]["cut_tokens"] == 22
    assert "EDITEDTOKEN" not in " ".join(toks[5][:9])  # sanity on layout


def test_match_join_width_sizing(spark, sf_dir):
    """VERDICT r14 #4 regression pin, r16 form: the match-mass shuffle
    width follows the measured mass — floor at the session default,
    ceil(mass/2M) in between, hard cap at 4096. On the fixture the
    cool-tier mass fits the default width, so the CHEAP path must add
    NO explicit repartition (the r16 rework sizes the matched-position
    exchange only when the one-aggregate bound overflows the default
    budget), and with no hot hashes in the fixture (max 25 positions
    per hash) the hot branch must not be built either."""
    from map_reduce_go_spark.operators.dedup import (
        _MATCH_MAX_PARTITIONS,
        _MATCH_ROWS_PER_PARTITION,
        _match_partitions,
        maximal_shared_spans,
    )
    from map_reduce_go_spark.functions.caching import release_caches
    from map_reduce_go_spark.sources.readers import load_table

    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert _match_partitions(spark, 0) == default
    assert _match_partitions(spark, 1.11e9) == max(
        default, -(-int(1.11e9) // _MATCH_ROWS_PER_PARTITION)
    )
    assert _match_partitions(spark, 1e12) == _MATCH_MAX_PARTITIONS
    plan = (
        maximal_shared_spans(load_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    )
    release_caches()
    import re

    # Cheap path: every exchange stays at (or below, post-AQE) the
    # session default — no sized repartition. (fan_out's scan-splitting
    # REPARTITION_BY_NUM is parallelism plumbing, not match sizing, so
    # assert on exchange WIDTHS, not on hint presence.)
    widths = [
        int(n) for n in re.findall(r"hashpartitioning\([^()]*?(\d+)\)", plan)
    ]
    assert widths and all(w <= default for w in widths), plan[:2000]
    assert "Union" not in plan, plan[:2000]  # no hot branch on the fixture


def test_span_attrition_sums_match_apply(spark, sf_dir):
    """dedup_span_attrition_by_source is exactly dedup_span_apply rolled
    up by source: token totals and doc counts must agree, and the ppm is
    the floor of the aggregate ratio (never a per-doc average)."""
    from map_reduce_go_spark.registry import all_queries

    qs = all_queries()
    apply_rows = qs["dedup_span_apply"].fn(spark, sf_dir).collect()
    attr_rows = qs["dedup_span_attrition_by_source"].fn(spark, sf_dir).collect()
    assert sum(r["docs"] for r in attr_rows) == len(apply_rows)
    assert sum(r["tokens_before"] for r in attr_rows) == sum(
        r["orig_tokens"] for r in apply_rows
    )
    assert sum(r["tokens_after"] for r in attr_rows) == sum(
        r["kept_tokens"] for r in apply_rows
    )
    assert sum(r["docs_cut"] for r in attr_rows) == sum(
        1 for r in apply_rows if r["cut_tokens"] > 0
    )
    for r in attr_rows:
        if r["tokens_before"]:
            want = (1_000_000 * (r["tokens_before"] - r["tokens_after"])) // r[
                "tokens_before"
            ]
            assert r["tokens_removed_ppm"] == want, r


def test_pipeline_exact_then_span_funnel_monotone(spark, sf_dir):
    """The two-stage funnel's invariants per source: docs_after_exact <=
    docs_total, tokens monotone down each stage, ppms consistent with
    the aggregate floors, and stage 1 agrees with dedup_exact's keep
    rule (total survivors == distinct content digests)."""
    from map_reduce_go_spark.registry import all_queries

    qs = all_queries()
    rows = qs["dedup_pipeline_exact_then_span"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["docs_after_exact"] <= r["docs_total"]
        assert r["tokens_after_span"] <= r["tokens_after_exact"] <= r["tokens_total"]
        if r["tokens_total"]:
            want = (
                1_000_000 * (r["tokens_total"] - r["tokens_after_exact"])
            ) // r["tokens_total"]
            assert r["exact_removed_ppm"] == want, r
        if r["tokens_after_exact"]:
            want = (
                1_000_000 * (r["tokens_after_exact"] - r["tokens_after_span"])
            ) // r["tokens_after_exact"]
            assert r["span_removed_ppm"] == want, r
    import duckdb as _d  # digest count from the same parquet, independently

    con = _d.connect()
    n_digests = con.sql(
        f"SELECT COUNT(DISTINCT md5(text)) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    con.close()
    assert sum(r["docs_after_exact"] for r in rows) == n_digests


def test_pipeline_funnel_reports_fully_attrited_source(spark, tmp_path):
    """ADVICE r15 (medium): a source whose EVERY document is an exact
    duplicate of lower-doc_id documents in other sources must still
    appear in the funnel output — as docs_after_exact = 0 with zeroed
    token stages and exact_removed_ppm = 1000000 — not silently vanish.
    The consumer (a mixture planner correcting per-source budgets)
    needs the zero row to know the source was fully attrited. Pins both
    the Spark plan and the DuckDB oracle on a constructed fixture."""
    import duckdb

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
    ]
    rows = [
        (1, texts[0], "en", "keep_src", len(texts[0])),
        (2, texts[1], "en", "keep_src", len(texts[1])),
        (3, texts[0], "en", "gone_src", len(texts[0])),
        (4, texts[1], "en", "gone_src", len(texts[1])),
    ]
    fix = tmp_path / "attrited"
    fix.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(fix / "documents.parquet"))

    spec = all_queries()["dedup_pipeline_exact_then_span"]
    got = {r["source"]: r for r in spec.fn(spark, str(fix)).collect()}
    from map_reduce_go_spark.functions.caching import release_caches

    release_caches()
    assert set(got) == {"keep_src", "gone_src"}
    g = got["gone_src"]
    assert g["docs_total"] == 2 and g["docs_after_exact"] == 0
    assert g["tokens_after_exact"] == 0 and g["tokens_after_span"] == 0
    assert g["exact_removed_ppm"] == 1_000_000 and g["span_removed_ppm"] == 0
    k = got["keep_src"]
    assert k["docs_after_exact"] == 2 and k["exact_removed_ppm"] == 0

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{fix}/documents.parquet/*.parquet'"
    )
    oracle = {r[0]: r for r in con.sql(spec.oracle).fetchall()}
    con.close()
    assert oracle["gone_src"][2] == 0 and oracle["gone_src"][6] == 1_000_000
    assert oracle["keep_src"][2] == 2


def test_span_sizing_failure_releases_caches(spark):
    """ADVICE r15: shared_span_runs' eager sizing caches two frames
    before its measurement job; if that job fails the caches must be
    released before the exception propagates, so a caller that never
    reaches its own release_caches() does not leak pinned storage."""
    import pytest
    from pyspark.sql import functions as F

    from map_reduce_go_spark.functions import caching
    from map_reduce_go_spark.operators.dedup import shared_span_runs

    @F.udf("string")
    def _boom(_x):
        raise ValueError("injected sizing failure")

    docs = spark.range(4).select(
        F.col("id").alias("doc_id"), _boom(F.col("id")).alias("text")
    )
    before = len(caching._TRACKED)
    with pytest.raises(Exception, match="injected sizing failure"):
        shared_span_runs(docs)
    created = caching._TRACKED[before:]
    assert created, "sizing should have registered tracked caches"
    # Every cache the failed construction created must be unpersisted
    # (StorageLevel NONE) — checked per-frame, not via global CacheManager
    # emptiness, which other queries' non-tracked state can dirty.
    for df in created:
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), lvl
    caching.release_caches()  # drop the stale _TRACKED entries


def test_span_sizing_heavy_path_widens_match_join(spark, sf_dir, monkeypatch):
    """VERDICT r15 #3 regression pin for the two-tier sizing: when the
    one-aggregate mass BOUND exceeds the default width's budget, the
    heavy path runs the exact candidate count and widens the match-join
    exchanges beyond the session default. Forced here by shrinking the
    per-partition row budget so the sf fixture counts as mass-heavy."""
    import re

    import map_reduce_go_spark.operators.dedup as dd
    from map_reduce_go_spark.functions.caching import release_caches
    from map_reduce_go_spark.sources.readers import load_table

    monkeypatch.setattr(dd, "_MATCH_ROWS_PER_PARTITION", 10)
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    plan = (
        dd.maximal_shared_spans(load_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    )
    release_caches()
    widths = [
        int(n) for n in re.findall(r"hashpartitioning\([^()]*?(\d+)\)", plan)
    ]
    assert any(w > default for w in widths), plan[:2000]


def test_span_hot_tier_row_identical_to_cool(spark, sf_dir, monkeypatch):
    """ADVICE r16 (medium): the hot-tier branch of shared_span_runs —
    hashes at > _MATCH_HOT_POSITIONS corpus positions routed through the
    candidate-expansion path — had zero suite coverage (the fixture maxes
    out well below the 256 cap, so the union the tiering exists for never
    built). Force most hashes hot by shrinking the cap and assert the
    two-tier output is ROW-IDENTICAL to the all-cool reference: the tiers
    partition the hash space, so cool ∪ hot must reproduce the match set
    (and therefore every diagonal run) exactly."""
    import map_reduce_go_spark.operators.dedup as dd
    from map_reduce_go_spark.functions.caching import release_caches
    from map_reduce_go_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    reference = dd.shared_span_runs(docs).collect()
    release_caches()
    assert reference, "fixture must produce spans for this test to bite"

    # Cap low enough that real hashes exceed it (the sf0.001 fixture has
    # hashes at up to ~25 positions), forcing the hot branch to build.
    monkeypatch.setattr(dd, "_MATCH_HOT_POSITIONS", 2)
    forced = dd.shared_span_runs(docs)
    plan = forced._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Union" in plan, "hot cap of 2 must build the hot-tier branch"
    forced_rows = forced.collect()
    release_caches()

    key = lambda r: (r["doc_a"], r["doc_b"], r["pos_a"], r["pos_b"])  # noqa: E731
    assert sorted(map(key, forced_rows)) == sorted(map(key, reference))
    assert {key(r): r["span_tokens"] for r in forced_rows} == {
        key(r): r["span_tokens"] for r in reference
    }

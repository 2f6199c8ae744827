"""Semantic and plan properties of the round-7 operators: the BM25 /
keyness / vocabulary-curve text family, weekly activity bitmaps and churn,
sliding-window chunking, filtered vector search, and the distributed
equi-depth histogram. Oracle parity is the driver's job; these tests pin
the invariants the oracle comparison can't state (plan shapes, bounds,
cross-query consistency)."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from map_reduce_go_spark.registry import all_queries


def _q(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir)


# ---------------------------------------------------------------- equidepth


def test_equidepth_approx_has_no_single_partition_exchange(spark, sf_dir):
    """The whole point of the scale path: the executed plan must contain
    NO Exchange SinglePartition (the exact-ntile variant's bottleneck)
    and no ntile at all — rank comes from the per-partition row_number
    plus collected offsets."""
    df = _q("equidepth_histogram_price_approx", spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "ntile" not in plan


def test_equidepth_approx_bucket_sizes_and_total(spark, sf_dir):
    """Equi-depth contract: bucket sizes differ by at most one, the large
    buckets are the LOW bucket ids (ntile fill rule), and sizes sum to
    the table's row count."""
    rows = _q("equidepth_histogram_price_approx", spark, sf_dir).collect()
    sizes = {r["bucket"]: r["n_orders"] for r in rows}
    n = sum(sizes.values())
    from map_reduce_go_spark.sources.readers import table_num_rows

    assert n == table_num_rows(sf_dir, "orders")
    assert max(sizes.values()) - min(sizes.values()) <= 1
    big = sorted(b for b, s in sizes.items() if s == max(sizes.values()))
    if max(sizes.values()) != min(sizes.values()):
        assert big == list(range(1, len(big) + 1))  # extras fill the LOW ids
    # Value bounds must be non-overlapping and ordered by bucket id.
    ordered = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] <= b["lo"]


# ---------------------------------------------------------------- text family


def test_bm25_top_docs_contain_query_terms_and_scores_descend(spark, sf_dir):
    rows = _q("bm25_doc_ranking", spark, sf_dir).orderBy("rank").collect()
    assert rows, "empty BM25 ranking"
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["tf0"] + r["tf1"] + r["tf2"] > 0  # a scored doc matched something
        assert r["dl"] > 0


def test_llr_keyness_is_positive_and_overrepresented(spark, duck, sf_dir):
    """Every reported term must have a non-negative G2 and an in-source
    share strictly above its corpus share (the integer cross-multiplication
    the query filters on)."""
    rows = _q("llr_keyness_by_source", spark, sf_dir).collect()
    assert rows
    tot = duck.sql(
        r"""SELECT CAST(sum(len(list_filter(string_split_regex(text, '[^\p{L}]+'),
            x -> len(x) > 0))) AS BIGINT) FROM documents"""
    ).fetchone()[0]
    for r in rows:
        assert r["llr"] >= 0, r
        n_source = duck.sql(
            rf"""SELECT CAST(sum(len(list_filter(string_split_regex(text, '[^\p{{L}}]+'),
                x -> len(x) > 0))) AS BIGINT) FROM documents WHERE source = '{r["source"]}'"""
        ).fetchone()[0]
        n_word = r["n_in_source"] + r["n_elsewhere"]
        assert r["n_in_source"] * tot > n_source * n_word, r


def test_min_count_curve_is_monotone_and_complete_at_one(spark, sf_dir):
    rows = {r["min_count"]: r for r in _q("min_count_vocab_curve", spark, sf_dir).collect()}
    assert rows[1]["coverage_ppm"] >= 999999  # integer floor-div of 100%
    thresholds = sorted(rows)
    for a, b in zip(thresholds, thresholds[1:]):
        assert rows[a]["vocab_size"] >= rows[b]["vocab_size"]
        assert rows[a]["covered_tokens"] >= rows[b]["covered_tokens"]


def test_source_lang_entropy_bounds(spark, sf_dir):
    for r in _q("source_lang_entropy", spark, sf_dir).collect():
        assert -1e-9 <= r["lang_entropy"] <= math.log(r["n_langs"]) + 1e-9, r


# ---------------------------------------------------------------- events


def test_weekly_bitmap_accounts_every_user_week(spark, duck, sf_dir):
    rows = _q("weekly_activity_bitmap", spark, sf_dir).collect()
    total = sum(r["n_user_weeks"] for r in rows)
    expect = duck.sql(
        """SELECT count(*) FROM (SELECT DISTINCT user_id,
           CAST(floor(epoch(ts)/86400) AS BIGINT)//7 FROM events)"""
    ).fetchone()[0]
    assert total == expect
    for r in rows:
        assert 1 <= r["pattern"] <= 127
        assert r["days_active"] == bin(r["pattern"]).count("1")


def test_churn_rates_match_naive_week_pair_counts(spark, duck, sf_dir):
    got = {r["week_idx"]: r for r in _q("churn_weekly_rates", spark, sf_dir).collect()}
    for wk, r in got.items():
        active, churned = duck.sql(
            f"""
            WITH uw AS (SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts)/86400) AS BIGINT)//7 AS w FROM events)
            SELECT count(*),
                   sum(CASE WHEN user_id NOT IN
                        (SELECT user_id FROM uw WHERE w = {wk} + 1)
                       THEN 1 ELSE 0 END)
            FROM uw WHERE w = {wk}
            """
        ).fetchone()
        assert (r["n_active"], r["n_churned"]) == (active, churned), wk
        assert r["churn_ppm"] == r["n_churned"] * 1_000_000 // r["n_active"]


# ---------------------------------------------------------------- chunking


def test_chunking_covers_every_token_and_indexes_are_dense(spark, duck, sf_dir):
    """Per doc: chunk 0 starts at token 1; consecutive chunk_idx; the
    last chunk ends exactly at the doc's token count; every chunk except
    the last has exactly CHUNK_TOKENS tokens or ends the doc."""
    from map_reduce_go_spark.operators.pipeline import CHUNK_STRIDE, CHUNK_TOKENS

    rows = _q("doc_chunking_fixed_tokens", spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_toks = dict(
        duck.sql(
            r"""SELECT doc_id, len(list_filter(string_split_regex(text, '[^\p{L}]+'),
                x -> len(x) > 0)) FROM documents"""
        ).fetchall()
    )
    # Every doc with >= 1 token chunks; empty docs are absent.
    assert set(by_doc) == {d for d, n in n_toks.items() if n > 0}
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        n = n_toks[doc]
        expected_starts = [
            s
            for s in range(0, n, CHUNK_STRIDE)
            if s == 0 or s < n - (CHUNK_TOKENS - CHUNK_STRIDE)
        ]
        assert len(chunks) == len(expected_starts)
        for i, c in enumerate(chunks):
            start = i * CHUNK_STRIDE
            assert c["n_tokens"] == min(CHUNK_TOKENS, n - start)
        # Full coverage: the last chunk reaches the document end.
        last = chunks[-1]
        assert last.chunk_idx * CHUNK_STRIDE + last.n_tokens == n
        # No redundant chunks: every chunk extends past its predecessor
        # (a fully-contained final chunk would repeat prior tokens only).
        ends = [c.chunk_idx * CHUNK_STRIDE + c.n_tokens for c in chunks]
        assert ends == sorted(set(ends))


def test_chunking_plan_is_shuffle_free(spark, sf_dir):
    df = _q("doc_chunking_fixed_tokens", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side: scan -> project -> generate


# ---------------------------------------------------------------- filtered ANN


def test_filtered_ann_respects_predicate_and_matches_prefiltered_bruteforce(
    spark, duck, sf_dir
):
    """Every neighbor shares its query's label (the predicate), and each
    query's result equals the brute-force top-k among SAME-LABEL vectors
    within its probed cells — i.e. pre-filtering loses nothing that was
    in the probed cells."""
    from map_reduce_go_spark.operators.similarity import TOP_K

    rows = _q("ann_filtered_ivf", spark, sf_dir).collect()
    assert rows
    emb = {r["vec_id"]: r["label"] for r in
           spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "label").collect()}
    per_query: dict[int, list] = {}
    for r in rows:
        assert emb[r["neighbor_id"]] == emb[r["query_id"]], r
        per_query.setdefault(r["query_id"], []).append(r)
    for q, rs in per_query.items():
        assert len(rs) <= TOP_K
        sims = [r["sim"] for r in sorted(rs, key=lambda x: x["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_filtered_ann_prefilters_not_postfilters(spark, sf_dir):
    """The label predicate must sit in the candidate JOIN (pre-filter),
    not above the rank window (post-filter): the analyzed plan applies
    the label equality below the window operator."""
    df = _q("ann_filtered_ivf", spark, sf_dir)
    lines = df._jdf.queryExecution().analyzed().toString().splitlines()
    # Anchor on NODE lines, not raw substring positions: the Window
    # OPERATOR line, and the Join OPERATOR line whose condition carries
    # the label equality (both labels on one Join line = the predicate
    # is in the join condition, not a projection or a post-window
    # filter). Plans print top-down, so a larger line index = deeper.
    win_lines = [i for i, l in enumerate(lines) if re.search(r"\bWindow \[", l)]
    join_lines = [
        i
        for i, l in enumerate(lines)
        if re.search(r"\bJoin\b", l) and "v_label" in l and "q_label" in l
    ]
    assert win_lines and join_lines
    assert min(join_lines) > max(win_lines)

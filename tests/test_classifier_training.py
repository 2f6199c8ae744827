"""In-engine classifier TRAINING (VERDICT r10 brief #6): fixed-iteration
class-balanced integer gradient descent whose whole trajectory — every
iteration's weight vector — replays bit-for-bit in pure Python from the
same parquet. The bpe_merge_steps discipline applied to training."""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from map_reduce_go_spark.operators.pipeline import (
    CLS_DIM,
    CLS_ITERS,
    CLS_NEG_MARKERS,
    CLS_POS_MARKERS,
    CLS_TRAIN_GAIN,
    CLS_W_CAP,
    classifier_train_scores,
    cls_slot_counts,
    train_quality_classifier,
)


def _slot(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % CLS_DIM


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _featurize(sf_dir: str):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    feats = []  # (doc_id, y, n, {slot: cnt})
    for _, row in docs.iterrows():
        toks = re.findall(r"\S+", row["text"] or "")
        if not toks:
            continue
        counts: dict[int, int] = {}
        for t in toks:
            s = _slot(t)
            counts[s] = counts.get(s, 0) + 1
        y = int(
            sum(1 for t in toks if t in CLS_POS_MARKERS)
            > sum(1 for t in toks if t in CLS_NEG_MARKERS)
        )
        feats.append((int(row["doc_id"]), y, len(toks), counts))
    return feats


def _python_replay(feats, iters: int):
    """Exact scalar replay of the engine's training loop: same hash, same
    truncating divisions, same class-balanced mean update, same clamp —
    the oracle the distributed run must match integer-for-integer."""
    n_pos = sum(f[1] for f in feats)
    n_neg = len(feats) - n_pos
    w = [0] * CLS_DIM
    traj = []
    for it in range(1, iters + 1):
        sp = [0] * CLS_DIM
        sn = [0] * CLS_DIM
        miss = 0
        for _doc, y, n, counts in feats:
            z = sum(w[s] * c for s, c in counts.items())
            margin = _tdiv(z, n)
            p = max(0, min(1000, 500 + _tdiv(margin, 4000)))
            if (margin > 0) != (y == 1):
                miss += 1
            e = p - 1000 * y
            tgt = sp if y == 1 else sn
            for s, c in counts.items():
                tgt[s] += _tdiv(e * c * 1000, n)
        w = [
            max(
                -CLS_W_CAP,
                min(
                    CLS_W_CAP,
                    w[j]
                    - (
                        _tdiv(sp[j] * CLS_TRAIN_GAIN, n_pos)
                        + _tdiv(sn[j] * CLS_TRAIN_GAIN, n_neg)
                    ),
                ),
            )
            for j in range(CLS_DIM)
        ]
        traj.append(
            {
                "iter": it,
                "misclassified": miss,
                "w_sum": sum(w),
                "w_abs_sum": sum(abs(x) for x in w),
                "w_nnz": sum(1 for x in w if x != 0),
            }
        )
    return w, traj


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights, traj = train_quality_classifier(spark, docs)
    return weights, traj


def test_trajectory_replays_exactly_in_python(spark, sf_dir, trained):
    weights, traj = trained
    py_w, py_traj = _python_replay(_featurize(sf_dir), CLS_ITERS)
    assert traj == py_traj  # every iteration's checksums, not just the last
    assert weights == py_w  # the full final weight vector, all CLS_DIM slots


def test_training_actually_learns(spark, sf_dir, trained):
    """Not a no-op: iteration 1's miss count is the majority-class
    baseline (all-zero weights predict negative for everything), and the
    learned model must beat it by a wide margin, with the marker slots
    carrying the right signs."""
    weights, traj = trained
    feats = _featurize(sf_dir)
    n_pos = sum(f[1] for f in feats)
    assert traj[0]["misclassified"] == n_pos  # zero-weight baseline
    # Post-training miss (computed on the final weights) < 25% of baseline.
    miss = 0
    for _doc, y, n, counts in feats:
        z = sum(weights[s] * c for s, c in counts.items())
        if (_tdiv(z, n) > 0) != (y == 1):
            miss += 1
    assert miss < n_pos // 4, (miss, n_pos)
    # The rule's marker tokens got the dominant, correctly-signed weights.
    for t in CLS_POS_MARKERS:
        assert weights[_slot(t)] > 0, t
    for t in CLS_NEG_MARKERS:
        assert weights[_slot(t)] < 0, t
    assert all(-CLS_W_CAP <= w <= CLS_W_CAP for w in weights)


def test_learned_scores_match_python_forward_pass(spark, sf_dir):
    got = {r["doc_id"]: r for r in classifier_train_scores(spark, sf_dir).collect()}
    feats = _featurize(sf_dir)
    py_w, _traj = _python_replay(feats, CLS_ITERS)
    assert len(got) == len(feats)
    for doc_id, y, n, counts in feats:
        z = sum(py_w[s] * c for s, c in counts.items())
        margin = _tdiv(z, n)
        p = max(0, min(1000, 500 + _tdiv(margin, 4000)))
        r = got[doc_id]
        assert (r["y"], r["learned_margin"], r["learned_p_milli"]) == (y, margin, p)
        assert r["learned_prob"] == pytest.approx(p / 1000.0)


def test_featurize_matches_inference_hash(spark, sf_dir):
    """The training featurizer uses the inference-side hash slot (same md5
    high-32 conv), and its per-doc count mass equals the token count — a
    trained vector drops into the inference plan unchanged."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = cls_slot_counts(docs)
    one = feats.groupBy("doc_id").agg(
        F.sum("cnt").alias("s"), F.first("n_tokens").alias("n")
    )
    assert one.where(F.col("s") != F.col("n")).count() == 0
    sample = {r["slot"] for r in feats.select("slot").distinct().collect()}
    assert sample <= set(range(CLS_DIM))
    py_slots = {s for _, _, _, c in _featurize(sf_dir) for s in c}
    assert sample == py_slots


def test_unrolled_sql_oracle_matches_engine(spark, sf_dir):
    """The r12-registration dry run: the unrolled DuckDB CTE chain —
    featurize, three gradient iterations, forward pass — must match the
    distributed training end to end under the driver's canonical compare."""
    import duckdb

    from map_reduce_go_spark.operators.pipeline import _cls_train_oracle_sql
    from tests.oracle_compare import compare

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    compare(
        classifier_train_scores(spark, sf_dir),
        con.sql(_cls_train_oracle_sql()),
        "classifier_train_scores",
    )


def test_degenerate_single_class_label_fails_loud(spark, sf_dir):
    """ADVICE r11: a corpus slice where the marker rule yields one class
    must raise a descriptive error naming the degeneracy — not a bare
    ZeroDivisionError out of _trunc_div — before any gradient math runs."""
    one_sided = spark.createDataFrame(
        [(i, "fast big fast big traffic") for i in range(8)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="degenerate.*n_pos=8, n_neg=0"):
        train_quality_classifier(spark, one_sided)


def test_parquet_featurize_trajectory_bit_identical(spark, sf_dir, tmp_path):
    """VERDICT r11 #3 — the persist-once parquet featurize (the 100 TB
    form: write the doc×slot matrix once, loop iterations over the
    parquet) must replay the in-memory form's weight trajectory
    bit-for-bit: same final weights, same per-iteration miss counts and
    weight checksums. Integer arithmetic over order-free sums makes the
    materialization route value-neutral; this pins it."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w_mem, traj_mem = train_quality_classifier(spark, docs)
    fp = str(tmp_path / "feats")
    w_pq, traj_pq = train_quality_classifier(spark, docs, feats_path=fp)
    assert w_pq == w_mem
    assert traj_pq == traj_mem
    import os as _os

    assert _os.path.exists(_os.path.join(fp, "_SUCCESS"))  # actually persisted

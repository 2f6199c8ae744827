"""Round-10 operator properties: the gear-CDC path (rolling recurrence ≡
windowed sum, boundary identity with the declarative replay, content
anchoring) — the invariants behind the oracle green."""

from __future__ import annotations

import numpy as np

from map_reduce_go_spark.registry import all_queries


def _q(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir)


# ---------------------------------------------------------------- gear CDC


def _gear_hashes(text: str, w: int) -> np.ndarray:
    """Reference windowed-gear hashes via the W-pass vectorized form —
    the same math the operator kernel runs."""
    from map_reduce_go_spark.operators.pipeline import _gear_val

    g = np.array([_gear_val(c) for c in text], dtype=np.int64)
    n = len(g)
    acc = np.zeros(n - w + 1, dtype=np.int64)
    for j in range(w):
        acc += g[w - 1 - j : n - j] << j
    return acc


def test_gear_rolling_recurrence_equals_windowed_sum():
    """The O(1)/byte production recurrence h_i = (h_{i-1} << 1) + G[c_i]
    - (G[c_{i-w}] << w) reproduces the windowed sum exactly — the
    identity that makes the vectorized kernel and the declarative oracle
    the same function."""
    import random

    from map_reduce_go_spark.operators.pipeline import CDC_WINDOW, _gear_val

    rng = random.Random(7)
    for _ in range(10):
        text = "".join(
            rng.choice("abcdefghij xyz.,") for _ in range(rng.randint(20, 300))
        )
        w = CDC_WINDOW
        want = _gear_hashes(text, w)
        g = [_gear_val(c) for c in text]
        h = sum(g[j] << (w - 1 - j) for j in range(w))  # first window
        rolled = [h]
        for i in range(w, len(text)):
            h = (h << 1) + g[i] - (g[i - w] << w)
            rolled.append(h)
        assert rolled == want.tolist()


def test_gear_hash_fits_signed_64():
    """Worst-case windowed sum must stay inside int64 (the all-integer
    cross-engine contract): 2^52-max gear values times the full weight
    ladder."""
    from map_reduce_go_spark.operators.pipeline import CDC_WINDOW, GEAR_BITS_HEX

    gmax = 16**GEAR_BITS_HEX - 1
    assert sum(gmax << j for j in range(CDC_WINDOW)) < 2**63


def test_gear_boundaries_are_content_anchored(spark, duck, sf_dir):
    """Same invariant as the md5 CDC path: recompute boundaries in pure
    Python for a few fixture docs, check the operator's counts, and pin
    that prepending a character shifts every cut by one (content-defined,
    not position-defined)."""
    from map_reduce_go_spark.operators.pipeline import CDC_DIVISOR, CDC_WINDOW

    texts = dict(
        duck.sql(
            f"SELECT doc_id, text FROM documents WHERE n_chars >= {CDC_WINDOW} LIMIT 5"
        ).fetchall()
    )
    got = {
        r["doc_id"]: (r["n_boundaries"], r["n_chunks"], r["mean_chunk_chars"])
        for r in _q("cdc_gear_chunk_stats", spark, sf_dir).collect()
    }

    def cuts(text):
        h = _gear_hashes(text, CDC_WINDOW)
        return [
            k + CDC_WINDOW
            for k in range(len(h))
            if h[k] % CDC_DIVISOR == 0 and k + CDC_WINDOW < len(text)
        ]

    for doc_id, text in texts.items():
        b = cuts(text)
        assert got[doc_id][0] == len(b)
        assert got[doc_id][1] == len(b) + 1
        assert got[doc_id][2] == len(text) // (len(b) + 1)
        assert cuts("X" + text)[-len(b) or None :] == (
            [x + 1 for x in b] if b else []
        )


def test_gear_cdc_plan_has_no_explode(spark, sf_dir):
    """The gear path's entire point: corpus rows flow straight into the
    Arrow kernel — no per-position Generate/explode node like the md5
    form's, and no shuffle before the kernel output."""
    plan = (
        _q("cdc_gear_chunk_stats", spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan, plan[:1500]
    md5_plan = (
        _q("cdc_chunk_stats", spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" in md5_plan  # the contrast the gear path removes

"""Deduplication operators for training-data pipelines.

Four families over the ``documents`` table, all pure DataFrame plans:

- exact: hash-groupBy on content digest — one shuffle on the digest.
- MinHash + LSH: shingle -> minhash signature -> band -> bucket self-join.
  The 100 TB workhorse: candidate generation touches only docs sharing a
  band bucket, never all pairs.
- SimHash: 16-bit locality-sensitive bit signature per doc.
- n-gram Jaccard: exact pairwise similarity via inverted-index pair
  generation — the correctness baseline LSH recall is measured against.

Portability contract with the DuckDB oracle: every hash is md5 (identical
hex output in both engines), minhash takes the lexicographic min of hex
digests (a valid random permutation), and SimHash bits come from hex-digit
comparisons — so signatures are bit-identical across engines with no
engine-specific hash anywhere.

Scale notes (100 TB):
- shingling explodes ~n_words rows per doc; distinct() before signature
  aggregation bounds it to unique (doc, shingle) pairs. One shuffle.
- signatures are P aggregates in ONE groupBy pass (no per-permutation scan).
- the band self-join shuffles on (band_id, band_value) — bucket sizes are
  the LSH knob (more bands -> smaller buckets); skewed buckets (boilerplate
  docs) are exactly what AQE skew-join splitting handles.
- exact Jaccard joins on shingle: hot shingles (stop-phrases) skew —
  mitigated by the distinct() and, at scale, by dropping top-frequency
  shingles (standard practice).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_go_spark.functions.text import WORD_BOUNDARY
from map_reduce_go_spark.functions.caching import register_memo, tracked_cache
from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import fan_out, load_table, table_num_rows

N_PERM = 8  # minhash permutations
N_BANDS = 4  # bands of r = N_PERM / N_BANDS rows

# Shared SQL fragments for the oracle (DuckDB) side ------------------------

_ORACLE_SHINGLES = r"""
  w AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '[^\p{L}]+'), x -> len(x) > 0) AS ws
    FROM documents
  ),
  sh AS (
    SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
    FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
  )
"""


SHINGLE_K = 3  # word k-gram width (registered queries + oracle use 3)


def _shingle_arrays(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """doc_id -> deduped word-k-gram shingle array (+ its size).

    Entirely map-side: tokenize, build k-grams, array_distinct — no
    shuffle. The k-gram is built as ``array_join(slice(ws, i, k))`` inside
    the transform lambda — ONE array access per shingle. The tempting
    per-index form (``concat_ws(' ', ws[i], ws[i+1], …)``) is ~45× slower
    measured at sf0.1: higher-order-function lambdas evaluate interpreted,
    and after CollapseProject inlines ``ws``, every ``ws[i+j]`` access
    re-evaluates the filter(split(text)) token-array tree — k regex splits
    of the full document per shingle.

    The ``monotonically_increasing_id() >= 0`` conjunct (always true) is a
    deliberate optimizer barrier: nondeterminism makes CollapseProject
    keep the token array materialized in its own projection (instead of
    inlining it into the interpreted lambda, one re-split per shingle) and
    makes PushDownPredicate keep the explode-inferred filter
    (``size(shingles) > 0``) ABOVE this projection — without it the filter
    is pushed into the scan with the whole tokenize+k-gram tree
    substituted in twice, tripling the build. Net effect measured at
    sf0.1: one build per row instead of ~3 re-splits per shingle; the
    whole-span-pipeline noop write drops 7s -> 0.6s.
    """
    ws = F.filter(F.split(F.col("text"), WORD_BOUNDARY), lambda x: F.length(x) > 0)
    base = fan_out(docs).select("doc_id", ws.alias("ws"))
    arr = F.col("ws")
    kgrams = F.when(
        (F.size(arr) >= k) & (F.monotonically_increasing_id() >= 0),
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - k + 1),
            lambda i: F.array_join(F.slice(arr, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "doc_id", F.array_distinct(kgrams).alias("shingles")
    ).withColumn("n", F.size("shingles"))


def _shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """doc_id -> exploded distinct word-k-gram shingles.

    array_distinct happens per-doc BEFORE the explode, so the output is
    already (doc_id, s)-distinct with no shuffle — a full distinct()
    after explode would shuffle every shingle row for nothing.
    """
    return _shingle_arrays(docs, k).select("doc_id", F.explode("shingles").alias("s"))


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: digest-groupBy, keep the lowest doc_id per content hash.

    At 100 TB: shuffle moves only (digest, doc_id) — never the text; the
    digest is computed map-side in codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    docs: DataFrame,
    shingle_arrays: DataFrame | None = None,
    n_perm: int = N_PERM,
) -> DataFrame:
    """doc_id + n_perm minhash columns.

    Shape: explode the (already per-doc-distinct) shingle arrays — no
    pre-shuffle — compute the permutation hashes as CODEGEN column
    expressions on the exploded rows, then one groupBy(doc_id) with 8 min
    aggregates. The
    min agg partials map-side, so the shuffle moves ~n_docs rows, not
    n_shingles. (The tempting zero-shuffle alternative — array_min over
    transform(shingles, md5) — runs the md5 INTERPRETED per element:
    higher-order-function lambdas never enter codegen, measured ~2× slower
    than this explode+agg at sf0.1.)

    Docs with no shingles (< 3 words) produce no rows, matching the
    grouped formulation.
    """
    sa = shingle_arrays if shingle_arrays is not None else _shingle_arrays(docs)
    exploded = sa.select("doc_id", F.explode("shingles").alias("s"))
    # ceil(n_perm/4) md5 evaluations cover n_perm permutations: each 32-hex
    # digest yields four independent 32-bit (8-hex) hash slices — 4× less
    # hashing per shingle than one md5 per permutation (the dominant
    # minhash CPU at scale), and lexicographic min over lowercase hex is
    # identical in both engines. Digest 1 keeps the "x|" prefix the oracle
    # SQL uses; further digests (n_perm > 8) are prefixed "<d>|".
    def digest(d: int):
        if d == 0:
            return F.md5(F.col("s"))
        prefix = "x|" if d == 1 else f"{d}|"
        return F.md5(F.concat(F.lit(prefix), F.col("s")))

    digests = [digest(d) for d in range((n_perm + 3) // 4)]
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(digests[p // 4], 1 + 8 * (p % 4), 8)
            ).alias(f"sig{p}")
            for p in range(n_perm)
        ]
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    shingle_arrays: DataFrame | None = None,
    n_perm: int = N_PERM,
    n_bands: int = N_BANDS,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs: equal minhash band in >=1 of
    n_bands bands of r = n_perm/n_bands rows. The (n_perm, n_bands) pair
    is the recall/precision knob: candidate threshold ≈
    (1/n_bands)^(1/r). Pass ``signatures`` (a cached minhash_signatures
    result) when sweeping several bandings over ONE signature build —
    the signature aggregate is the only shuffle in the build, so sharing
    it prices a banding sweep at bandings × self-join, not bandings ×
    (sig shuffle + self-join)."""
    if n_perm % n_bands:
        raise ValueError(f"n_bands={n_bands} must divide n_perm={n_perm}")
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(docs, shingle_arrays, n_perm=n_perm)
    )
    r = n_perm // n_bands
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat(
                            *[F.col(f"sig{b * r + i}") for i in range(r)]
                        ).alias("bv"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.bv")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _jaccard_over_candidates(
    cand: DataFrame, arrays: DataFrame, min_sim: float | None = None
) -> DataFrame:
    """Score (doc_a, doc_b) candidate pairs with exact shingle Jaccard:
    both sides' (already per-doc-distinct) shingle arrays join in, the
    intersection size is codegen'd array_intersect, and the optional
    ``min_sim`` filter applies to the RAW similarity (the rounded value is
    only for emission). One definition for every LSH pipeline variant so
    the formula and its 6-dp oracle-parity rounding can never drift
    between them."""
    a = arrays.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    b = arrays.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    nc = F.size(F.array_intersect("sh_a", "sh_b"))
    jacc = nc.cast("double") / (F.col("n_a") + F.col("n_b") - nc)
    scored = cand.join(a, "doc_a").join(b, "doc_b")
    if min_sim is not None:
        scored = scored.where(jacc >= min_sim)
    return scored.select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))


_ORACLE_SIGS = ",\n".join(
    f"min(substr(md5({'s' if p < 4 else chr(39) + 'x|' + chr(39) + ' || s'}), "
    f"{1 + 8 * (p % 4)}, 8)) AS sig{p}"
    for p in range(N_PERM)
)
_ORACLE_BANDS = "\n    UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, sig{b * 2} || sig{b * 2 + 1} AS bv FROM sig"
    for b in range(N_BANDS)
)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    sig AS (SELECT doc_id, {_ORACLE_SIGS} FROM sh GROUP BY doc_id),
    bands AS ({_ORACLE_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT m.doc_a, m.doc_b,
           round(CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc), 6) AS jaccard
    FROM common m
    JOIN sizes sa ON sa.doc_id = m.doc_a
    JOIN sizes sb ON sb.doc_id = m.doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dedup: candidate pairs from band collisions, then
    exact trigram Jaccard computed only for candidates.

    8 permutations in 4 bands of 2 -> candidate threshold around
    j ~ (1/4)^(1/2) = 0.5 with a long recall tail below.

    Plan shape (the 100 TB story): shingling, signatures, and banding are
    all map-side (array ops, zero shuffle); the ONLY wide operations are
    the band-bucket self-join and the two joins that bring each candidate
    pair's shingle arrays together; exact Jaccard is then
    size(array_intersect(..)) computed in codegen. Candidate pairs are a
    tiny fraction of docs, so both pair joins broadcast-to-shuffle-hash
    under AQE.
    """
    docs = load_table(spark, sf_dir, "documents")
    # One map-side shingle pass feeds signatures, banding, AND the exact
    # Jaccard arrays — cached so the tokenize/trigram work runs once.
    sa = _shingle_arrays(docs).transform(tracked_cache)
    cand = lsh_candidate_pairs(docs, shingle_arrays=sa)
    return _jaccard_over_candidates(cand, sa)


_SIMHASH_BITS = 16


def _simhash_expr() -> Column:
    """16-bit SimHash over distinct words: bit j set iff the majority of
    word-hashes have hex digit j >= '8' (the top bit of that nibble).
    String comparison on md5 hex is engine-portable. Expects a
    pre-computed ``wh`` (md5 hex of the word) column — hashing once in a
    projection instead of inside each of the 16 vote aggregates keeps the
    partial-agg input to one digest per word, not 16."""
    votes = [
        F.sum(
            F.when(F.substring(F.col("wh"), j + 1, 1) >= "8", 1).otherwise(-1)
        )
        for j in range(_SIMHASH_BITS)
    ]
    return sum(
        (F.when(v > 0, F.lit(1 << j)).otherwise(0) for j, v in enumerate(votes)),
        F.lit(0),
    ).cast("long")


_ORACLE_SIMHASH = " + ".join(
    f"CASE WHEN SUM(CASE WHEN substr(md5(word), {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) > 0 "
    f"THEN {1 << j} ELSE 0 END"
    for j in range(_SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH words AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split_regex(text, '[^\\p{{L}}]+'),
                                x -> len(x) > 0)) AS word
      FROM documents
    )
    SELECT doc_id, CAST({_ORACLE_SIMHASH} AS BIGINT) AS simhash
    FROM words
    GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures: near-dup docs get small Hamming distance.
    One explode + one groupBy; the 16 bit-votes are columnar aggregates in
    a single pass (at 100 TB this is a map-side-partial agg like wordcount).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split("text", WORD_BOUNDARY), lambda x: F.length(x) > 0)
            )
        ).alias("word"),
    ).select("doc_id", F.md5("word").alias("wh"))
    return words.groupBy("doc_id").agg(_simhash_expr().alias("simhash"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS nc
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT m.doc_a, m.doc_b,
           round(CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc), 6) AS jaccard
    FROM common m
    JOIN sizes sa ON sa.doc_id = m.doc_a
    JOIN sizes sb ON sb.doc_id = m.doc_b
    WHERE CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc) >= 0.05
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs >= 0.05 via inverted-index pair
    generation (join on shingle). The exact baseline for LSH recall; at
    100 TB you run the LSH variant — this one is quadratic in docs *per
    shared shingle*."""
    docs = load_table(spark, sf_dir, "documents")
    arrs = _shingle_arrays(docs).transform(tracked_cache)
    sh = arrs.select("doc_id", F.explode("shingles").alias("s"))
    sizes = arrs.select("doc_id", "n")  # map-side, no groupBy shuffle
    x, y = sh.alias("x"), sh.alias("y")
    common = (
        x.join(y, (F.col("x.s") == F.col("y.s")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jacc = F.col("nc").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("nc"))
    return (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .where(jacc >= 0.05)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup (semantic dedup)
# --------------------------------------------------------------------------

_EMB_SIM = 0.4  # near-dup cosine threshold for the synthetic fixtures
_EMB_MIN_BLOCKS = 8  # floor so tests exercise the multi-block path
# Target rows per block: 64 dims × 8 B ≈ 512 B/vector → ~50 MB per block,
# so a block PAIR (the applyInPandas group) stays ~100 MB — executor-safe
# at any corpus size because B grows with N instead of block size.
_EMB_BLOCK_ROWS = 100_000

_EMB_COS = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))"
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_EMB_COS}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_EMB_COS} >= {_EMB_SIM}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs: embedding cosine >= threshold, exact
    all-pairs, computed as a BLOCK-nested-loop GEMM: vectors are hashed
    into B blocks, each of the B(B+1)/2 block pairs becomes one
    applyInPandas group, and each group runs a single numpy
    (na×64)·(64×nb) kernel.

    Why this shape: a row-pair join materializes N²/2 rows through the
    engine (and per-pair JVM scoring is either interpreted HOFs or a
    64 KB-codegen blowup); blocking moves N² work into O(B²) vectorized
    kernels while shuffling only ~B/2 copies of each row. B is derived
    from the corpus size (ceil(N / _EMB_BLOCK_ROWS)) so a block pair is
    always ~100 MB regardless of N, and rows ride the shuffle
    INDIVIDUALLY — Arrow streams them into the Python worker per group,
    so nothing ever approaches Spark's 2 GB single-row/value limits (the
    previous collect_list-per-block form did, at ~4M vectors/block).
    Beyond exhaustive pairing, the LSH/IVF candidate paths in
    operators/similarity.py are the 100 TB replacement.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Block-grid sizing needs only the corpus cardinality — read it from
    # the parquet footer (memoized, no Spark job) instead of a count()
    # scan per invocation.
    n_vecs = table_num_rows(sf_dir, "embeddings")
    n_blocks = max(_EMB_MIN_BLOCKS, -(-n_vecs // _EMB_BLOCK_ROWS))

    def tri(ba: Column, bb: Column) -> Column:
        """Triangular index of block pair (ba <= bb) in [0, B(B+1)/2)."""
        return ((ba * (2 * n_blocks - ba + 1)) / 2 + (bb - ba)).cast("long")

    blk = emb.withColumn("b", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int"))
    # Side A: a row of block b joins every pair (b, bb) for bb >= b.
    side_a = blk.select(
        "vec_id",
        "embedding",
        F.col("b").alias("pair_ba"),
        F.explode(F.sequence(F.col("b"), F.lit(n_blocks - 1))).alias("pair_bb"),
        F.lit("a").alias("side"),
    )
    # Side B: a row of block b joins every pair (ba, b) for ba < b. The
    # diagonal (ba == b) is served by side A alone — the kernel self-pairs
    # it, halving the shuffled copies. when() without otherwise() yields
    # NULL for b == 0, and explode() drops NULL/empty — no descending
    # sequence(0, -1) surprise.
    side_b = blk.select(
        "vec_id",
        "embedding",
        F.explode(
            F.when(
                F.col("b") > 0, F.sequence(F.lit(0), F.col("b") - 1)
            )
        ).alias("pair_ba"),
        F.col("b").alias("pair_bb"),
        F.lit("b").alias("side"),
    )
    tagged = side_a.unionByName(side_b).withColumn(
        "pair_id", tri(F.col("pair_ba"), F.col("pair_bb"))
    )
    thr = _EMB_SIM

    def score(pdf):
        import numpy as np
        import pandas as pd

        from map_reduce_go_spark.operators.similarity import _seq_dot

        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        diag = pdf["pair_ba"].iloc[0] == pdf["pair_bb"].iloc[0]
        a_rows = pdf[pdf["side"] == "a"]
        b_rows = a_rows if diag else pdf[pdf["side"] == "b"]
        if not len(a_rows) or not len(b_rows):
            return empty
        ia = a_rows["vec_id"].to_numpy(dtype=np.int64)
        ib = b_rows["vec_id"].to_numpy(dtype=np.int64)
        ma = np.vstack(a_rows["embedding"].to_numpy()).astype(np.float64)
        mb = np.vstack(b_rows["embedding"].to_numpy()).astype(np.float64)
        # Dimension-sequential accumulation (see similarity._seq_dot):
        # bit-identical to the oracle's list_sum fold, unlike BLAS
        # matmul's pairwise summation.
        dots = np.multiply.outer(ma[:, 0], mb[:, 0])
        for i in range(1, ma.shape[1]):
            dots = dots + np.multiply.outer(ma[:, i], mb[:, i])
        s = dots / np.multiply.outer(
            np.sqrt(_seq_dot(ma, ma)), np.sqrt(_seq_dot(mb, mb))
        )
        ii, jj = np.nonzero(s >= thr)
        if diag:
            keep = ia[ii] < ib[jj]
            va, vb_, sim = ia[ii][keep], ib[jj][keep], s[ii, jj][keep]
        else:
            # Cross-block: blocks are disjoint; order each pair once.
            x, y, sim = ia[ii], ib[jj], s[ii, jj]
            va, vb_ = np.minimum(x, y), np.maximum(x, y)
        return pd.DataFrame({"vec_a": va, "vec_b": vb_, "cos_sim": np.round(sim, 6)})

    return tagged.groupBy("pair_id").applyInPandas(
        score, "vec_a long, vec_b long, cos_sim double"
    )


# --------------------------------------------------------------------------
# Near-dup clustering: connected components over the LSH pair graph
# --------------------------------------------------------------------------

_CLUSTER_J = 0.5  # near-dup edge threshold


def _near_dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (src, dst) edges: candidate pairs with Jaccard >= threshold."""
    pairs = dedup_minhash_lsh(spark, sf_dir).where(F.col("jaccard") >= _CLUSTER_J)
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    return fwd.unionByName(rev)


# CTE chain shared by the cluster-family oracles: LSH candidates -> exact
# Jaccard edges -> transitive closure (`reach`). Used WITH RECURSIVE.
_ORACLE_CLUSTER_CTES = f"""{_ORACLE_SHINGLES},
    sig AS (SELECT doc_id, {_ORACLE_SIGS} FROM sh GROUP BY doc_id),
    bands AS ({_ORACLE_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
      GROUP BY c.doc_a, c.doc_b
    ),
    edges AS (
      SELECT m.doc_a AS src, m.doc_b AS dst FROM common m
      JOIN sizes sa ON sa.doc_id = m.doc_a
      JOIN sizes sb ON sb.doc_id = m.doc_b
      WHERE CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc) >= {_CLUSTER_J}
      UNION ALL
      SELECT m.doc_b, m.doc_a FROM common m
      JOIN sizes sa ON sa.doc_id = m.doc_a
      JOIN sizes sb ON sb.doc_id = m.doc_b
      WHERE CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc) >= {_CLUSTER_J}
    ),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
    )"""


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_ORACLE_CLUSTER_CTES}
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup graph (LSH pairs with
    Jaccard >= 0.5): every doc labeled with the smallest doc_id reachable
    through near-dup edges — the "keep one per duplicate cluster" primitive
    (transitive closure, which pairwise dedup alone cannot give you).

    Iterative min-label propagation: each round joins labels across edges
    and takes the min; converges in O(cluster diameter) rounds. Lineage is
    cut with localCheckpoint each round (mandatory for iterative DataFrame
    algorithms — plan growth is exponential otherwise). The oracle computes
    the same closure with a recursive CTE.

    At 100 TB: rounds are a handful of shuffles on (doc_id); near-dup
    cluster diameters are small in practice, and each round is a plain
    shuffle join AQE handles like any other.
    """
    docs = load_table(spark, sf_dir, "documents")
    labels = _converged_labels(spark, sf_dir)
    return (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )


# Converged label sets memoized per (session, fixture): three queries
# (dedup_clusters, dedup_keep_best, near_dup_cluster_sizes) consume the
# same transitive closure, and the propagation loop is deterministic, so
# re-running it per query only re-pays 2-4 rounds of shuffles. The cached
# object is the CHECKPOINTED node-label frame (edge-participant docs only
# — bounded by duplicate density, never the corpus), keyed by application
# id so a fresh session rebuilds instead of referencing dead checkpoint
# blocks. The 100 TB analog is persisting the cluster-assignment table
# once per corpus snapshot — the ivf_centroids_for policy applied to
# cluster state.
_LABEL_CACHE: dict[tuple[str, str], DataFrame] = register_memo({})


def _converged_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_go_spark.functions.caching import fixture_key

    # (appId, path, documents mtime): appId scopes the checkpointed
    # frame to its session; the mtime makes an in-session fixture
    # regeneration rebuild (same policy as the IVF/PQ codebook memos).
    key = fixture_key(spark, sf_dir, "documents")
    if key in _LABEL_CACHE:
        return _LABEL_CACHE[key]

    edges = _near_dup_edges(spark, sf_dir).localCheckpoint()
    # Iterate ONLY over graph nodes (docs with at least one near-dup edge):
    # singleton docs — the overwhelming majority of a deduped corpus —
    # keep cluster_id = doc_id and never enter the loop, so each round
    # shuffles the (tiny) node set, not the corpus. Edges are symmetric,
    # so `src` alone covers every node.
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    # Convergence via the label-sum invariant: min-propagation is monotone
    # non-increasing per doc, so sum(cluster_id) unchanged <=> fixed point.
    # The sum piggybacks on the checkpoint job as an observe() metric
    # (r16) — ONE job per round instead of checkpoint + separate scalar
    # collect, halving the per-round fixed job cost of the loop.
    from pyspark.sql import Observation

    prev_sum = None
    converged = False
    max_rounds = 20  # diameter bound; converges in 2-4 rounds here
    for rnd in range(max_rounds):
        propagated = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "cluster_id")
        )
        obs = Observation(f"labelsum_{rnd}")
        labels = (
            labels.unionByName(propagated)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .observe(obs, F.sum("cluster_id").alias("s"))
            .localCheckpoint()
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # A silent exit here would return WRONG cluster ids for any graph
        # with diameter > max_rounds — fail loudly instead; callers retry
        # with a higher bound (rounds scale with cluster diameter, which
        # stays small for near-dup graphs even at 100 TB).
        raise RuntimeError(
            f"dedup_clusters: min-label propagation did not converge within "
            f"{max_rounds} rounds (label-sum still changing); raise the round "
            f"bound for this graph"
        )
    _LABEL_CACHE[key] = labels
    return labels


# --------------------------------------------------------------------------
# Composed production pipeline: exact dedup first, then near-dup on survivors
# --------------------------------------------------------------------------

_ORACLE_SHINGLES_SURVIVORS = _ORACLE_SHINGLES.replace(
    "FROM documents", "FROM survivors"
)


@register(
    "dedup_pipeline_exact_then_lsh",
    oracle=f"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    survivors AS (
      SELECT d.* FROM documents d JOIN keep k ON d.doc_id = k.doc_id
    ),
    {_ORACLE_SHINGLES_SURVIVORS},
    sig AS (SELECT doc_id, {_ORACLE_SIGS} FROM sh GROUP BY doc_id),
    bands AS ({_ORACLE_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT m.doc_a, m.doc_b,
           round(CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc), 6) AS jaccard
    FROM common m
    JOIN sizes sa ON sa.doc_id = m.doc_a
    JOIN sizes sb ON sb.doc_id = m.doc_b
    """,
)
def dedup_pipeline_exact_then_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup ORDER: exact dedup first (cheap digest
    groupBy), THEN MinHash-LSH over the survivors.

    Why the order matters at 100 TB: exact duplicates all share every
    band, so k copies of a document contribute k²/2 candidate pairs to
    the LSH self-join — removing them first collapses that blowup before
    the quadratic stage (measured in SCALE.md's 16× probe, where
    replicated corpora inflate LSH 2.3× while scans stay ~1.2×). The
    survivors filter is a left-semi join on (digest-min doc_id), fused
    before any shingling work happens.
    """
    docs = load_table(spark, sf_dir, "documents")
    keep = (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(keep, "doc_id", "left_semi")
    sa = _shingle_arrays(survivors).transform(tracked_cache)
    cand = lsh_candidate_pairs(survivors, shingle_arrays=sa)
    return _jaccard_over_candidates(cand, sa)


# --------------------------------------------------------------------------
# Canonical selection: keep the best document per near-dup cluster
# --------------------------------------------------------------------------


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_ORACLE_CLUSTER_CTES},
    labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
    SELECT l.doc_id, l.cluster_id, d.n_chars,
           CASE WHEN row_number() OVER (
                  PARTITION BY l.cluster_id
                  ORDER BY d.n_chars DESC, l.doc_id) = 1
                THEN 1 ELSE 0 END AS keep
    FROM labels l JOIN documents d ON d.doc_id = l.doc_id
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: within each near-dup cluster
    (transitive closure of LSH pairs, Jaccard >= 0.5) keep exactly one
    document — the longest (n_chars DESC), ties to the lowest doc_id.
    This is the policy layer production dedup actually ships: clustering
    says WHICH docs are copies, this says which copy SURVIVES (keep the
    richest, not an arbitrary hash-min).

    Ranking is integer-deterministic (n_chars, doc_id — no floats), so the
    oracle replays it exactly. At 100 TB the extra cost over
    ``dedup_clusters`` is one broadcast-able join of (doc_id, n_chars)
    plus a per-cluster window — clusters are tiny (near-dup groups), so
    the window partitions are bounded and never skew.
    """
    from pyspark.sql import Window

    labels = dedup_clusters(spark, sf_dir)
    meta = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        labels.join(meta, "doc_id")
        .withColumn(
            "keep", F.when(F.row_number().over(w) == 1, 1).otherwise(0)
        )
        .select("doc_id", "cluster_id", "n_chars", "keep")
    )


# --------------------------------------------------------------------------
# Cross-document span duplication: exact word-5-gram overlap score
# --------------------------------------------------------------------------

SPAN_K = 5  # word n-gram width for span-level duplication

_ORACLE_SPANS = r"""
  w AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '[^\p{L}]+'), x -> len(x) > 0) AS ws
    FROM documents
  ),
  sp AS (
    SELECT DISTINCT doc_id,
           ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS s
    FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)
  )
"""


@register(
    "cross_doc_span_dupes",
    oracle=f"""
    WITH {_ORACLE_SPANS},
    freq AS (SELECT s, count(*) AS n_docs FROM sp GROUP BY s),
    per_doc AS (
      SELECT sp.doc_id,
             count(*) AS n_spans,
             CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS shared_spans
      FROM sp JOIN freq f ON f.s = sp.s
      GROUP BY sp.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.shared_spans, 0) AS shared_spans,
           round(CAST(COALESCE(p.shared_spans, 0) AS DOUBLE)
                 / greatest(COALESCE(p.n_spans, 0), 1), 6) AS dup_ratio
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """,
)
def cross_doc_span_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level cross-document duplication (the signal behind exact
    substring dedup, "Deduplicating Training Data Makes Language Models
    Better"): for each document, the fraction of its distinct word-5-gram
    spans that also occur in at least one other document. High ratios mark
    boilerplate and templated text that doc-level pairwise dedup misses.

    Plan: per-doc-distinct spans are built map-side (the _shingle_arrays
    shape at k=5 — no shuffle), span document-frequency is one
    wordcount-shaped agg, and the join back to per-doc rows shuffles on
    the span string. At 100 TB hot spans (stop-phrase boilerplate) skew
    that join — AQE skew-split handles it, and the per-doc distinct
    already collapses within-doc repeats before anything shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Spans collapse to 64-bit xxhash64 fingerprints map-side, and the
    # (doc_id, h) set — 16 bytes/row vs the ~30-byte span string — is
    # materialized ONCE: the span build feeds both sides of the self-join,
    # and without the barrier Spark re-runs the tokenize+k-gram pipeline
    # per branch (plus once more in the inferred pre-explode filter) —
    # measured 13× on sf0.1. At cluster scale the same one-pass
    # materialization writes (doc_id, h) to temp storage instead of
    # localCheckpoint; the dup_ratio statistic tolerates the ~n²/2⁶⁵
    # birthday collision rate (the oracle stays on exact strings, and the
    # fixture corpus is collision-free).
    sp = (
        _shingles(docs, k=SPAN_K)
        .select("doc_id", F.xxhash64("s").alias("h"))
        .localCheckpoint()
    )
    freq = sp.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        sp.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("shared_spans"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("shared_spans", F.lit(0)).alias("shared_spans"),
            F.round(
                F.coalesce("shared_spans", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )


# --------------------------------------------------------------------------
# LSH quality probe: banding recall against exact Jaccard, per bucket
# --------------------------------------------------------------------------

_J_MIN_20 = 1  # exact-pair floor as the integer predicate 20*nc >= union


@register(
    "lsh_recall_probe",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    sig AS (SELECT doc_id, {_ORACLE_SIGS} FROM sh GROUP BY doc_id),
    bands AS ({_ORACLE_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    exact AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS nc
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT e.doc_a, e.doc_b,
             (10 * e.nc) // (sa.n + sb.n - e.nc) AS bucket,
             CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS caught
      FROM exact e
      JOIN sizes sa ON sa.doc_id = e.doc_a
      JOIN sizes sb ON sb.doc_id = e.doc_b
      LEFT JOIN cand c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
      WHERE 20 * e.nc >= (sa.n + sb.n - e.nc)
    )
    SELECT bucket, count(*) AS n_pairs,
           CAST(sum(caught) AS BIGINT) AS n_caught,
           round(CAST(sum(caught) AS DOUBLE) / count(*), 6) AS recall
    FROM scored GROUP BY bucket
    """,
)
def lsh_recall_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH recall per exact-Jaccard decile: of the true near-dup
    pairs (trigram Jaccard >= 0.05), what fraction does the (8-perm,
    4-band) banding scheme surface as candidates? This is the query an
    engineer runs before turning the LSH knob at 100 TB — recall should be
    ~1.0 above the (1/b)^(1/r) = 0.5 threshold and decay below it.

    Engine-portability: the Jaccard floor is the integer predicate
    ``20*nc >= union`` and the decile is integer division
    ``(10*nc) div union`` — no float threshold can straddle an engine
    boundary. Plan: the exact-pair inverted-index join and the band
    self-join each shuffle once; the probe LEFT-joins candidates onto
    exact pairs (both tiny relative to the corpus), so the expensive
    passes are exactly the two dedup passes being compared — the probe
    itself adds broadcast-sized joins.
    """
    docs = load_table(spark, sf_dir, "documents")
    sa_arr = _shingle_arrays(docs).transform(tracked_cache)
    sh = sa_arr.select("doc_id", F.explode("shingles").alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x = sh.alias("x")
    y = sh.alias("y")
    exact = (
        x.join(y, (F.col("x.s") == F.col("y.s")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    cand = lsh_candidate_pairs(docs, shingle_arrays=sa_arr).withColumn(
        "caught", F.lit(1)
    )
    union = F.col("na") + F.col("nb") - F.col("nc")
    scored = (
        exact.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .where(20 * F.col("nc") >= union)
        .join(cand, ["doc_a", "doc_b"], "left")
        .select(
            F.expr("(10 * nc) div (na + nb - nc)").alias("bucket"),
            F.coalesce("caught", F.lit(0)).alias("caught"),
        )
    )
    return scored.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("caught").cast("long").alias("n_caught"),
        F.round(F.sum("caught").cast("double") / F.count(F.lit(1)), 6).alias("recall"),
    )


@register(
    "near_dup_cluster_sizes",
    oracle=f"""
    WITH RECURSIVE {_ORACLE_CLUSTER_CTES},
    labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
    csizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
    SELECT cluster_size, count(*) AS n_clusters
    FROM csizes GROUP BY cluster_size
    """,
)
def near_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the dedup yield report: how many
    singletons (unique docs), how many k-way duplicate groups. At 100 TB
    this is the number that tells you what fraction of the corpus dedup
    will delete. Two cheap aggregations over the connected-components
    labels; all costs live in dedup_clusters itself."""
    labels = dedup_clusters(spark, sf_dir)
    return (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


# Stop-shingle suppression: drop shingles whose document frequency exceeds
# this cap BEFORE signatures/banding. Boilerplate shingles (headers, license
# blocks, navigation chrome) put thousands of docs into one band bucket —
# the Σ bucket² candidate cost then explodes quadratically in the hottest
# bucket. The cap bounds any shingle's pair contribution at DF²/2.
# Production sets it as a corpus fraction or a top-k hot-shingle list; the
# fixture value is absolute so the filter demonstrably fires at sf0.01
# (max fixture DF is 7 — a fraction threshold would never trigger).
LSH_STOP_DF = 5


@register(
    "dedup_minhash_lsh_stopfiltered",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
    kept AS (
      SELECT sh.doc_id, sh.s
      FROM sh JOIN dfreq ON dfreq.s = sh.s
      WHERE dfreq.df <= {LSH_STOP_DF}
    ),
    sig AS (SELECT doc_id, {_ORACLE_SIGS} FROM kept GROUP BY doc_id),
    bands AS ({_ORACLE_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS nc
      FROM cand c
      JOIN kept x ON x.doc_id = c.doc_a
      JOIN kept y ON y.doc_id = c.doc_b AND y.s = x.s
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT m.doc_a, m.doc_b,
           round(CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc), 6) AS jaccard
    FROM common m
    JOIN sizes sa ON sa.doc_id = m.doc_a
    JOIN sizes sb ON sb.doc_id = m.doc_b
    """,
)
def dedup_minhash_lsh_stopfiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH with stop-shingle suppression — the 100 TB guard the
    plain pipeline's docs promise: shingles with document frequency >
    LSH_STOP_DF are dropped before signatures, banding, and Jaccard, so
    no boilerplate phrase can put more than DF docs into one band bucket.
    The trade is explicit: pairs whose ONLY evidence was ultra-common
    shingles lose recall — exactly the pairs exact dedup (which runs
    first in dedup_pipeline_exact_then_lsh) already caught.

    Extra cost over the plain pipeline: one wordcount-shaped DF count and
    one join of the shingle stream against it (hot keys absorbed by
    map-side partials), then one groupBy(doc_id) rebuilding the filtered
    arrays. All keyed shuffles — nothing quadratic anywhere before the
    (now bounded) band self-join.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        sh.join(dfreq.where(F.col("df") <= LSH_STOP_DF), "s")
        .select("doc_id", "s")
    )
    # Rebuild per-doc arrays from the surviving shingles: sort_array keeps
    # the array deterministic under any partitioning; rows are already
    # (doc_id, s)-distinct so collect_list is set-valued.
    arrays = (
        kept.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("s")).alias("shingles"))
        .withColumn("n", F.size("shingles"))
        .transform(tracked_cache)
    )
    cand = lsh_candidate_pairs(docs, shingle_arrays=arrays)
    return _jaccard_over_candidates(cand, arrays)


# Cut point between "existing corpus" and "new arrivals": docs with
# doc_id >= floor(n_docs × NEW_BATCH_CUT) are the arriving batch (i.e. the
# batch is the top 1 - NEW_BATCH_CUT fraction of ids — RAISING the cut
# SHRINKS the batch). Fixture stand-in for an ingestion batch.
NEW_BATCH_CUT = 0.8
NEAR_MATCH_SIM = 0.5


@register(
    "dedup_incremental_batch",
    oracle=f"""
    WITH cut AS (
      SELECT CAST(floor(count(*) * {NEW_BATCH_CUT}) AS BIGINT) AS cut
      FROM documents
    ),
    exact AS (
      SELECT n.doc_id AS new_doc_id, min(o.doc_id) AS match_doc_id,
             'exact' AS match_type, 1.0 AS jaccard
      FROM documents n
      JOIN documents o ON md5(o.text) = md5(n.text)
      CROSS JOIN cut
      WHERE n.doc_id >= cut.cut AND o.doc_id < cut.cut
      GROUP BY n.doc_id
    ),
    {_ORACLE_SHINGLES},
    sig AS (SELECT doc_id, {_ORACLE_SIGS} FROM sh GROUP BY doc_id),
    bands AS ({_ORACLE_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
      CROSS JOIN cut
      WHERE a.doc_id < cut.cut AND b.doc_id >= cut.cut
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    near AS (
      SELECT m.doc_b AS new_doc_id, m.doc_a AS match_doc_id,
             'near' AS match_type,
             round(CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc), 6) AS jaccard
      FROM (
        SELECT c.doc_a, c.doc_b, count(*) AS nc
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
        GROUP BY c.doc_a, c.doc_b
      ) m
      JOIN sizes sa ON sa.doc_id = m.doc_a
      JOIN sizes sb ON sb.doc_id = m.doc_b
      WHERE CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc) >= {NEAR_MATCH_SIM}
    )
    SELECT * FROM exact UNION ALL SELECT * FROM near
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: match a batch of NEW documents (the
    top doc_id tail, standing in for today's crawl) against the EXISTING
    corpus — exact matches by content digest (canonical keeper = lowest
    old doc_id) and near matches via LSH candidates restricted to
    (old, new) pairs at Jaccard >= NEAR_MATCH_SIM. Within-batch (new, new)
    duplication is excluded: that's the batch's own dedup pass, a
    different concern.

    The production shape at 100 TB: the old corpus's signatures/bands are
    a MATERIALIZED index (written once, partitioned by band bucket); each
    arriving batch computes its own bands map-side and probes the index —
    candidate cost scales with the BATCH, not the corpus. Here both sides
    derive from one cached shingle pass; the (old, new) cut keeps the
    band join's output the probe-sized set the materialized form would
    produce.
    """
    docs = load_table(spark, sf_dir, "documents")
    cut = docs.agg(
        F.floor(F.count(F.lit(1)) * NEW_BATCH_CUT).cast("long").alias("cut")
    )
    d = docs.crossJoin(F.broadcast(cut))
    old_docs = d.where(F.col("doc_id") < F.col("cut"))
    new_docs = d.where(F.col("doc_id") >= F.col("cut"))
    exact = (
        new_docs.select(F.md5("text").alias("h"), F.col("doc_id").alias("new_doc_id"))
        .join(
            old_docs.select(F.md5("text").alias("h"), F.col("doc_id").alias("old_id")),
            "h",
        )
        .groupBy("new_doc_id")
        .agg(F.min("old_id").alias("match_doc_id"))
        .select(
            "new_doc_id",
            "match_doc_id",
            F.lit("exact").alias("match_type"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    sa = _shingle_arrays(docs).transform(tracked_cache)
    cand = (
        lsh_candidate_pairs(docs, shingle_arrays=sa)
        .crossJoin(F.broadcast(cut))
        .where((F.col("doc_a") < F.col("cut")) & (F.col("doc_b") >= F.col("cut")))
        .select("doc_a", "doc_b")
    )
    near = _jaccard_over_candidates(cand, sa, min_sim=NEAR_MATCH_SIM).select(
        F.col("doc_b").alias("new_doc_id"),
        F.col("doc_a").alias("match_doc_id"),
        F.lit("near").alias("match_type"),
        "jaccard",
    )
    return exact.unionByName(near)


# Edit-distance join threshold: candidate pairs must verify within this
# levenshtein distance. Deletion-neighborhood blocking below guarantees
# 100% recall for threshold 1.
EDIT_MAX_DIST = 1


@register(
    "editdist_deletion_join",
    oracle=f"""
    WITH names AS (
      SELECT c_custkey, c_name FROM customer
    ),
    variants AS (
      SELECT c_custkey, c_name,
             unnest(list_distinct(list_append(
               list_transform(range(1, len(c_name) + 1),
                              i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)),
               c_name))) AS v
      FROM names
    ),
    pairs AS (
      SELECT DISTINCT a.c_custkey AS key_a, b.c_custkey AS key_b
      FROM variants a JOIN variants b
        ON a.v = b.v AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= {EDIT_MAX_DIST}
    ),
    endpoints AS (
      SELECT key_a AS c_custkey FROM pairs
      UNION ALL
      SELECT key_b FROM pairs
    )
    SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_edit_neighbors
    FROM endpoints GROUP BY c_custkey
    """,
)
def editdist_deletion_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity join via deletion-neighborhood blocking
    (the FastSS / SymSpell scheme): customers whose names are within
    levenshtein distance 1 of another customer's, as a per-key neighbor
    count. Each string emits itself plus its |s| single-deletion
    variants; two strings within one edit ALWAYS share a variant (the
    substitution pair both delete the differing position; the
    insert/delete pair's shorter string IS a variant of the longer), so
    the variant equi-join generates candidates with GUARANTEED 100%
    recall — unlike frequency-blocked q-grams, which lose exactly the
    pairs whose shared grams are corpus-hot (measured 31% recall on
    these low-entropy keys before this formulation replaced it). Only
    candidates pay the exact levenshtein verify, and both engines
    evaluate it natively; the verify runs BEFORE the pair-distinct so
    the canonicalizing shuffle carries two integer keys per survivor,
    not name strings. Scale: the variant fanout is |s|+1 rows per
    string — linear in corpus size for bounded key length, the
    documented FastSS space trade; the join is a plain equi-join on the
    variant (hot variants from pathological all-near-identical corpora
    are AQE skew-split like any hot key). This is the short-string
    (names/titles/codes) member of the dedup family; long-text near-dup
    routes to MinHash-LSH."""
    names = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # Join on xxhash64(variant), not the variant string: the candidate
    # shuffle moves 8-byte longs instead of ~|s|-char strings. Soundness
    # of the digest rests on FastSS COMPLETENESS, not on the verify
    # filtering collisions: any pair at lev<=1 already shares a true
    # deletion variant, so a hash-colliding pair that also passes the
    # lev<=1 verify was in the true result set anyway — collisions can
    # only add candidates, never rows. NOTE this argument is coupled to
    # EDIT_MAX_DIST == 1 (the 1-deletion certification depth); raising
    # the threshold requires deeper variant generation AND re-examining
    # this digest join. The oracle keeps joining on the strings
    # themselves, so the hash-compare re-proves the optimization.
    variants = names.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("c_name")),
                    F.expr(
                        "transform(sequence(1, length(c_name)),"
                        " i -> concat(substring(c_name, 1, i - 1),"
                        "             substring(c_name, i + 1, length(c_name))))"
                    ),
                )
            )
        ).alias("v"),
    ).select("c_custkey", "c_name", F.xxhash64("v").alias("v"))
    left = variants.select(
        F.col("v").alias("v_a"),
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
    )
    right = variants.select(
        F.col("v").alias("v_b"),
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
    )
    # Verify BEFORE distinct: the levenshtein check is map-side codegen on
    # each shared-variant occurrence, so the distinct that canonicalizes
    # pairs shuffles only (key_a, key_b) bigints — never the name strings.
    # The THRESHOLD form levenshtein(a, b, k) runs the banded DP and bails
    # at k+1 (returns -1 above the bound) — measured 43% faster than the
    # full-matrix form on the sf0.1 candidate set, and the early exit only
    # widens at 100 TB where candidates are longer strings.
    # shuffle_hash, not the planner's pick: AQE sees a "small" build side
    # and broadcasts, but a self-join whose output is ~4× its input wants
    # both sides hash-partitioned on the digest so the 1M-pair verify
    # parallelizes across all cores (measured 2× the whole query vs the
    # auto-chosen broadcast at sf0.1). At 100 TB the side is far past any
    # broadcast threshold and this is the only plan anyway — the hint
    # makes the local plan and the cluster plan the same plan.
    pairs = (
        left.join(
            right.hint("shuffle_hash"),
            (F.col("v_a") == F.col("v_b")) & (F.col("key_a") < F.col("key_b")),
        )
        .filter(F.levenshtein(F.col("name_a"), F.col("name_b"), EDIT_MAX_DIST) >= 0)
        .select("key_a", "key_b")
        .distinct()
    )
    endpoints = pairs.select(F.col("key_a").alias("c_custkey")).unionAll(
        pairs.select(F.col("key_b").alias("c_custkey"))
    )
    return endpoints.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n_edit_neighbors")
    )


CONTAINMENT_MIN = 0.5


@register(
    "dedup_minhash_containment",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    sig AS (SELECT doc_id, {_ORACLE_SIGS} FROM sh GROUP BY doc_id),
    bands AS ({_ORACLE_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS nc
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT m.doc_a, m.doc_b,
           round(CAST(m.nc AS DOUBLE) / least(sa.n, sb.n), 6) AS containment,
           round(CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc), 6) AS jaccard
    FROM common m
    JOIN sizes sa ON sa.doc_id = m.doc_a
    JOIN sizes sb ON sb.doc_id = m.doc_b
    WHERE CAST(m.nc AS DOUBLE) / least(sa.n, sb.n) >= {CONTAINMENT_MIN}
    """,
)
def dedup_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT over LSH candidates: |A∩B| / min(|A|, |B|) —
    the asymmetric near-dup metric that catches a short document wholly
    embedded in a longer one, where symmetric Jaccard stays low because
    the union is dominated by the longer side (quote pages, boilerplate
    wrappers, excerpt reposts — cases a Jaccard-thresholded dedup pass
    keeps). Candidates come from the same banded MinHash self-join as
    dedup_minhash_lsh (shared shingle pass, map-side signatures, bucketed
    band join); both containment and Jaccard are emitted per surviving
    pair so the asymmetry is visible. DOCUMENTED RECALL CAVEAT: banding a
    whole-document MinHash under-recalls high-containment low-Jaccard
    pairs by construction (the sketch is a union sample); the
    full-fidelity scale path for containment search is bottom-k /
    partitioned sketches — this operator is the candidate-scoring stage,
    oracle-replayed end to end. Threshold applies to the RAW ratio; the
    6-dp round is emission-only."""
    docs = load_table(spark, sf_dir, "documents")
    sa = _shingle_arrays(docs).transform(tracked_cache)
    cand = lsh_candidate_pairs(docs, shingle_arrays=sa)
    a = sa.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n").alias("n_a"),
    )
    b = sa.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n").alias("n_b"),
    )
    nc = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    containment = nc / F.least(F.col("n_a"), F.col("n_b"))
    jaccard = nc / (F.col("n_a") + F.col("n_b") - nc)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .where(containment >= CONTAINMENT_MIN)
        .select(
            "doc_a",
            "doc_b",
            F.round(containment, 6).alias("containment"),
            F.round(jaccard, 6).alias("jaccard"),
        )
    )


# Prefix-filtering set-similarity join (PPJoin-style). Word-SET Jaccard at
# this threshold; prefix length L = n - ceil(T*n) + 1 under the global
# (rarity, token) canonical order guarantees any pair with J >= T shares
# at least one prefix token — certified recall with a candidate set built
# from each document's RAREST tokens only.
SETSIM_T = 0.5

# Token domain = word-3-gram shingles (the corpus's high-cardinality set
# representation); a raw word-set domain degenerates on small
# vocabularies (every doc shares most words, prefix buckets go corpus-
# sized). Shares the shingle definition with the MinHash/ngram family.


@register(
    "setsim_prefix_filter_join",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    toks AS (SELECT doc_id, s AS token FROM sh),
    freq AS (SELECT token, count(*) AS f FROM toks GROUP BY token),
    ordered AS (
      SELECT t.doc_id, t.token,
             row_number() OVER (PARTITION BY t.doc_id ORDER BY f.f, t.token) AS rn,
             count(*) OVER (PARTITION BY t.doc_id) AS n
      FROM toks t JOIN freq f ON f.token = t.token
    ),
    prefix AS (
      SELECT doc_id, token FROM ordered
      WHERE rn <= n - CAST(ceil({SETSIM_T} * n) AS BIGINT) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b ON a.token = b.token AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS nc
      FROM cand c
      JOIN toks x ON x.doc_id = c.doc_a
      JOIN toks y ON y.doc_id = c.doc_b AND y.token = x.token
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT m.doc_a, m.doc_b,
           round(CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc), 6) AS jaccard
    FROM common m
    JOIN sizes sa ON sa.doc_id = m.doc_a
    JOIN sizes sb ON sb.doc_id = m.doc_b
    WHERE CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc) >= {SETSIM_T}
    """,
)
def setsim_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join by PREFIX FILTERING (the PPJoin family): find
    all document pairs with word-set Jaccard >= {t}, generating
    candidates only from each document's L = n - ceil(T*n) + 1 RAREST
    tokens under a global (frequency, token) canonical order. Any pair at
    or above the threshold must share a prefix token — certified 100%
    recall, like the deletion-neighborhood join and unlike LSH's
    probabilistic banding — yet the join touches none of the common
    tokens that make a naive inverted-index self-join quadratic on
    stopwords.

    The third member of the candidate-generation triad (LSH banding:
    probabilistic, tunable; deletion variants: edit distance, short
    strings; prefix filtering: set overlap, certified): at 100 TB the
    prefix join's buckets are RARE-token buckets — small by
    construction — and the frequency table that defines rarity is
    vocabulary-sized broadcast state. Verification is exact set
    intersection on the candidates only; all counts integer, one rounded
    division at emission.
    """
    return setsim_over(load_table(spark, sf_dir, "documents"))


def setsim_over(docs: DataFrame) -> DataFrame:
    """The prefix-filter similarity join over any documents-shaped
    DataFrame — split out so property tests can drive it with generated
    corpora (hypothesis conformance vs a brute-force evaluator).

    r17 (guide §2.3 "shuffle keys and metadata instead of payloads"):
    every stage past the shingle build runs on the 64-bit ``xxhash64``
    of the shingle, never the ~25-byte string — the frequency aggregate,
    the per-doc canonical-order window, the candidate self-join, and the
    verification arrays all carry longs. Correctness:

    - *Recall*: the prefix principle holds for ANY global total order on
      tokens; (f, h) is one whenever h is injective on the vocabulary
      (ties in f broken by distinct hashes). The length/positional
      filters depend only on n/rn, which are unchanged.
    - *Exactness*: |A ∩ B| computed on hashed arrays equals the true
      intersection size iff h is injective on A ∪ B. Injectivity over
      the whole vocabulary is CHECKED AT RUNTIME inside the plan: the
      frequency aggregate (grouped by h) also records min/max token per
      hash, and the emitted rows pass through an ``assert_true`` on the
      corpus-wide collision count — a collision fails the query loudly
      instead of silently perturbing a jaccard (expected never: ~3.7e-9
      at a 260k-shingle vocabulary, ~5e-4 at 10^9; corpora beyond that
      re-key to a wider hash). No extra pass: the guard count rides the
      cached frequency frame the prefix join needs anyway.
    """
    # One shingle build feeds BOTH sides: the deduped per-doc arrays (with
    # their sizes) are the verification operand directly — no collect_set
    # re-aggregation — and their explode is the prefix-candidate stream.
    # Cached (tracked, harness-released) because candidates and both
    # verification joins re-read it. The hashed array is computed ONCE
    # into the cache; every consumer past this point reads longs (the
    # strings leave the cache only into the frequency/guard aggregate).
    sa = tracked_cache(
        _shingle_arrays(docs)
        .select(
            "doc_id",
            F.col("shingles").alias("ts"),
            F.transform("shingles", lambda x: F.xxhash64(x)).alias("tsh"),
            F.col("n"),
        )
        .where(F.col("n") > 0)
    )
    toks = sa.select("doc_id", "n", F.explode("tsh").alias("h"))
    # Frequency table keyed by hash; min/max of the original token per
    # hash feed the injectivity guard. Cached (tracked): the ordered
    # join and the guard aggregate both consume it.
    freq = tracked_cache(
        sa.select(F.explode(F.arrays_zip("ts", "tsh")).alias("z"))
        .groupBy(F.col("z.tsh").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("f"),
            F.min("z.ts").alias("t0"),
            F.max("z.ts").alias("t1"),
        )
    )
    collisions = freq.agg(
        F.coalesce(
            F.sum((F.col("t0") != F.col("t1")).cast("long")), F.lit(0)
        ).alias("hash_collisions")
    )
    from pyspark.sql import Window

    w_rn = Window.partitionBy("doc_id").orderBy("f", "h")
    # No broadcast hint on the frequency table: it is VOCABULARY-sized
    # state (distinct shingles grow ~linearly with corpus tokens), so a
    # forced broadcast OOMs at 100 TB where the word-3-gram vocabulary is
    # billions of rows (VERDICT r5 #2). AQE picks broadcast at small
    # scale from measured stats and falls back to a shuffle join exactly
    # when the vocabulary outgrows the threshold — the adaptive behavior
    # a size-blind hint forfeits.
    ordered = toks.join(freq.select("h", "f"), "h").withColumn(
        "rn", F.row_number().over(w_rn)
    )
    prefix_len = F.col("n") - F.ceil(F.lit(SETSIM_T) * F.col("n")).cast("long") + 1
    prefix = ordered.where(F.col("rn") <= prefix_len).select(
        "doc_id", "h", "n", "rn"
    )
    # PPJoin's two candidate filters (r16), both recall-certified:
    # - LENGTH: J(A,B) = nc/(na+nb-nc) <= min/max, so J >= T forces
    #   min(na,nb) >= T*max(na,nb).
    # - POSITIONAL: for a qualifying pair, its EARLIEST shared token in
    #   the canonical order lies in both prefixes (the prefix principle)
    #   and every other shared token follows it in both sorted streams,
    #   so nc <= 1 + min(na - rn_a, nb - rn_b) at that match; since
    #   J >= T forces nc >= ceil(T/(1+T)*(na+nb)) (= alpha), a qualifying
    #   pair always passes the bound at >= 1 of its prefix matches —
    #   keeping pairs with ANY passing match loses nothing. Measured at
    #   sf0.1: candidates 409k (token match alone) -> 310k (+length) ->
    #   125k (+positional); query cold median 4.9 -> 3.3 s, the saved
    #   work concentrated exactly where it matters at scale (the
    #   distinct + the two array-verification joins).
    # r17 (ADVICE r16): both filters compare in INTEGERS, exact for any
    # rational T = P/Q (the float forms were provably exact only for
    # T = 0.5): min >= T*max <=> Q*min >= P*max, and ov >= ceil(P*(na+nb)
    # /(P+Q)) <=> (P+Q)*ov >= P*(na+nb) — `int >= real` implies
    # `int >= ceil(real)` and conversely, so the integer comparisons are
    # the exact ceiling tests with no binary-representation caveat.
    from fractions import Fraction

    frac = Fraction(SETSIM_T)  # exact value of the binary double
    P, Q = frac.numerator, frac.denominator
    na, nb = F.col("a.n"), F.col("b.n")
    overlap_ub = 1 + F.least(na - F.col("a.rn"), nb - F.col("b.rn"))
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.least(na, nb) * Q >= F.greatest(na, nb) * P)
            & (overlap_ub * (P + Q) >= (na + nb) * P),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verification on hashed arrays (8 B/element vs ~25 B strings
    # through both joins); exact under the guarded injectivity.
    arrs = sa.select("doc_id", F.col("tsh").alias("ts"), "n")
    joined = (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("ts").alias("ts_a"),
                F.col("n").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("doc_b"),
                F.col("ts").alias("ts_b"),
                F.col("n").alias("n_b"),
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    out = joined.where(jac >= SETSIM_T).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    # Injectivity guard: a 1-row cross join of the corpus-wide collision
    # count, asserted zero on the emission path. Implemented as a FILTER
    # so column pruning cannot drop it; assert_true returns NULL when the
    # predicate holds (isnull -> keep every row) and raises otherwise.
    # No broadcast HINT (the plan-audit rule: setsim carries no size-
    # blind hints): the guard side is an ungrouped aggregate — exactly
    # one row by construction — so the planner's own size-based choice
    # is always a broadcast nested-loop join.
    return (
        out.crossJoin(collisions)
        .where(
            F.isnull(
                F.assert_true(
                    F.col("hash_collisions") == 0,
                    F.lit(
                        "setsim: xxhash64 collision on the shingle "
                        "vocabulary — hashed verification is not exact "
                        "for this corpus; re-key to a wider hash"
                    ),
                )
            )
        )
        .drop("hash_collisions")
    )


setsim_prefix_filter_join.__doc__ = setsim_prefix_filter_join.__doc__.format(
    t=SETSIM_T
)


# LSH tuning sweep: all divisor bandings of the 8 permutations. The
# approximate S-curve midpoint (1/b)^(1/r) is emitted ONLY for r in
# {1, 2, 4} where it reduces to exact constants and sqrt chains — sqrt is
# IEEE-correctly-rounded, pow() is not (libm-dependent), so the sweep's
# thresholds stay bit-identical cross-engine.
_TUNE_CONFIGS = (2, 4, 8)  # n_bands values over N_PERM=8 signatures
NEAR_TUNE_SIM = 0.5


def _tune_band_sql(n_bands: int) -> str:
    r = N_PERM // n_bands
    rows = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {bv} AS bv FROM sig".format(
            b=b, bv=" || ".join(f"sig{b * r + i}" for i in range(r))
        )
        for b in range(n_bands)
    )
    return rows


def _tune_threshold_sql(n_bands: int) -> str:
    return {2: "sqrt(sqrt(0.5))", 4: "sqrt(0.25)", 8: "0.125"}[n_bands]


@register(
    "lsh_band_tuning_report",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    sig AS (SELECT doc_id, {_ORACLE_SIGS} FROM sh GROUP BY doc_id),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS nc
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    jacc AS (
      SELECT m.a, m.b, CAST(m.nc AS DOUBLE) / (sa.n + sb.n - m.nc) AS j
      FROM common m JOIN sizes sa ON sa.doc_id = m.a
                    JOIN sizes sb ON sb.doc_id = m.b
    ),
    {", ".join(
        f'''bands{nb} AS ({_tune_band_sql(nb)}),
    cand{nb} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands{nb} a JOIN bands{nb} b
        ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
    )''' for nb in _TUNE_CONFIGS)}
    {" UNION ALL ".join(
        f'''SELECT {nb} AS n_bands, {N_PERM // nb} AS rows_per_band,
           round({_tune_threshold_sql(nb)}, 6) AS approx_threshold,
           (SELECT count(*) FROM cand{nb}) AS n_candidates,
           (SELECT count(*) FROM cand{nb} c JOIN jacc j
             ON j.a = c.doc_a AND j.b = c.doc_b WHERE j.j >= {NEAR_TUNE_SIM})
             AS n_true_pairs,
           CAST(floor(1000000.0
             * (SELECT count(*) FROM cand{nb} c JOIN jacc j
                 ON j.a = c.doc_a AND j.b = c.doc_b WHERE j.j >= {NEAR_TUNE_SIM})
             / greatest((SELECT count(*) FROM cand{nb}), 1)) AS BIGINT)
             AS precision_ppm''' for nb in _TUNE_CONFIGS)}
    """,
)
def lsh_band_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-tuning sweep for the MinHash-LSH banding knob: every divisor
    banding of the 8 permutations — (2 bands × 4 rows), (4×2), (8×1) —
    with its approximate S-curve midpoint (1/b)^(1/r), the candidate-pair
    count it generates on THIS corpus, and the measured precision against
    exact Jaccard ≥ {t}. This is the report you run before committing a
    banding at 100 TB: the theoretical threshold says where recall falls,
    the measured candidate count prices the verify stage, and precision
    says how much of that price is waste.

    Thresholds use only exact constants and sqrt chains (sqrt is the one
    correctly-rounded transcendental; a general (1/b)^(1/r) needs pow,
    which libms round differently — the r ∈ {{1,2,4}} sweep is the
    deterministic family). One shingle build + one signature pass feed
    all three bandings; candidates per banding are the usual bucketed
    self-joins, and verification reuses the exact-Jaccard join only on
    candidate pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    sa = _shingle_arrays(docs).transform(tracked_cache)
    # ONE signature aggregate feeds all three bandings (cached; the band
    # explode + self-join per config derive from it map-side).
    sig = minhash_signatures(docs, sa).transform(tracked_cache)
    thresholds = {
        2: F.sqrt(F.sqrt(F.lit(0.5))),
        4: F.sqrt(F.lit(0.25)),
        8: F.lit(0.125),
    }
    parts = []
    for nb in _TUNE_CONFIGS:
        cand = lsh_candidate_pairs(
            docs, sa, n_perm=N_PERM, n_bands=nb, signatures=sig
        )
        verified = (
            cand.join(
                sa.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("shingles").alias("ts_a"),
                    F.col("n").alias("n_a"),
                ),
                "doc_a",
            )
            .join(
                sa.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("shingles").alias("ts_b"),
                    F.col("n").alias("n_b"),
                ),
                "doc_b",
            )
        )
        inter = F.size(F.array_intersect("ts_a", "ts_b"))
        jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        n_true = verified.where(jac >= NEAR_TUNE_SIM).agg(
            F.count(F.lit(1)).alias("n_true_pairs")
        )
        row = n_cand.crossJoin(n_true).select(
            F.lit(nb).alias("n_bands"),
            F.lit(N_PERM // nb).alias("rows_per_band"),
            F.round(thresholds[nb], 6).alias("approx_threshold"),
            "n_candidates",
            "n_true_pairs",
            F.floor(
                F.lit(1000000.0)
                * F.col("n_true_pairs")
                / F.greatest(F.col("n_candidates"), F.lit(1))
            )
            .cast("long")
            .alias("precision_ppm"),
        )
        parts.append(row)
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionAll(pdf)
    return out


lsh_band_tuning_report.__doc__ = lsh_band_tuning_report.__doc__.format(
    t=NEAR_TUNE_SIM
)


@register(
    "shingle_novelty_per_doc",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    firsts AS (
      SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(floor(1000000.0 * sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                / count(*)) AS BIGINT) AS novelty_ppm
    FROM sh JOIN firsts f USING (s)
    GROUP BY sh.doc_id
    """,
)
def shingle_novelty_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY — the corpus-freshness metric a
    training-data pipeline tracks as it ingests: for each doc, the
    fraction of its distinct 3-gram shingles that appear for the FIRST
    time in this doc (first = smallest doc_id, the deterministic stand-in
    for ingestion order). A feed of near-copies shows up as a novelty
    collapse long before the dedup stage pays to prove the copies
    pairwise; conversely a healthy crawl holds novelty roughly constant.

    One shingle pass (the same cached-free map-side build every dedup
    operator uses), one groupBy(shingle) min-aggregate for first
    appearance — corpus-shingle-sized, map-side-combinable — and one
    equi-join back on the shingle. The join side is SIZE-CHOSEN with no
    hint (the setsim freq-table rule): broadcast while the vocabulary
    frame is small, shuffle join on the shingle at vocabulary scale. No
    window over the corpus, no per-doc state beyond its own shingle
    count: the shape survives 100 TB the same way cross_doc_span_dupes
    does. Counts are integers; the ppm is a floor at emission.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_arrays(docs).select("doc_id", F.explode("shingles").alias("s"))
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).alias("n_novel")
    return (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"), novel)
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.floor(F.lit(1000000.0) * F.col("n_novel") / F.col("n_shingles"))
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS) — guaranteed-coverage document fingerprints
# --------------------------------------------------------------------------

WINNOW_W = 4  # winnowing window: every WINNOW_W consecutive k-grams
#: contribute at least one selected fingerprint (the coverage guarantee)
_WINNOW_POS_BASE = 1_073_741_824  # 2^30 — (hash, pos) packed key base;
#: bounds supported doc length at 2^30 k-gram positions (a ~4 GiB doc at
#: one position per word — far past any real document)
WINNOW_STOP_DF = 64  # fingerprints in more docs than this are boilerplate
#: stop-fingerprints: excluded from pair generation (the LSH stop-shingle
#: discipline), keeping posting lists bounded at scale
_WINNOW_MIN_SHARED = 2  # report pairs sharing at least this many prints


def winnowing_fingerprint_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) distinct winnowing-selected fingerprints for any
    (doc_id, text) frame — the selection core of winnowing_fingerprints
    (see its docstring for the algorithm and scale contract). Split out
    so tests can drive the coverage theorem over constructed documents
    with known shared runs."""
    ws = F.filter(
        F.split(F.col("text"), WORD_BOUNDARY), lambda x: F.length(x) > 0
    )
    base = fan_out(docs).select("doc_id", ws.alias("ws"))
    arr = F.col("ws")
    k = SHINGLE_K
    kgrams = F.when(
        (F.size(arr) >= k) & (F.monotonically_increasing_id() >= 0),
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - k + 1),
            lambda i: F.array_join(F.slice(arr, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos_kg = base.select(
        "doc_id", F.posexplode(kgrams).alias("pos0", "s")
    )
    comb = pos_kg.select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.expr(
            f"CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)"
            f" * {_WINNOW_POS_BASE} + (pos0 + 1)"
        ).alias("c"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    sel = comb.select(
        "doc_id",
        F.min("c").over(win).alias("fp_comb"),
        F.count(F.lit(1)).over(win).alias("cnt"),
    ).where(F.col("cnt") == WINNOW_W)
    # Plain (doc_id, fp)-keyed distinct: the map-side partial dedup
    # collapses the per-window duplicate selections (a shared run of L
    # tokens selects the same (doc, fp) up to ~L times) BEFORE the
    # exchange. The r17 fp-clustered form used by the span family
    # (_fingerprints_from_positions) was measured HERE too and reverted:
    # with no pre-cache window to amortize the fp exchange, shipping the
    # un-deduped selections clustered by hot fingerprints read 6.1 s vs
    # ~2.4 s on the same host (standalone winnowing query, r17 A/B).
    return sel.select(
        "doc_id",
        F.expr(f"fp_comb div {_WINNOW_POS_BASE}").alias("fp"),
    ).distinct()


# The oracle's k-gram expression is GENERATED from SHINGLE_K so the two
# sides can never silently desynchronize if the constant changes
# (ADVICE r9: it was previously hardcoded to the 3-gram form).
_WINNOW_KGRAM_SQL = " || ' ' || ".join(
    "ws[i]" if j == 0 else f"ws[i+{j}]" for j in range(SHINGLE_K)
)


@register(
    "winnowing_fingerprints",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[^\\p{{L}}]+'),
                         x -> len(x) > 0) AS ws
      FROM documents
    ),
    pos_kg AS (
      SELECT doc_id, i AS pos,
             {_WINNOW_KGRAM_SQL} AS s
      FROM w, unnest(generate_series(1, len(ws) - {SHINGLE_K - 1})) AS t(i)
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
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp_comb // {_WINNOW_POS_BASE} AS fp
      FROM sel WHERE cnt = {WINNOW_W}
    ),
    freq AS (SELECT fp, count(*) AS n_docs FROM fps GROUP BY fp),
    sizes AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS nc
      FROM fps a
      JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      JOIN freq f ON f.fp = a.fp
      WHERE f.n_docs BETWEEN 2 AND {WINNOW_STOP_DF}
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           CAST(c.nc AS BIGINT) AS n_shared,
           CAST((1000000 * c.nc) // (sa.n + sb.n - c.nc) AS BIGINT)
             AS jaccard_ppm
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE c.nc >= {_WINNOW_MIN_SHARED}
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every word-3-gram at its position, slide a
    window of WINNOW_W consecutive positions, and select the minimum
    hash per window. The selection guarantees any shared run of
    WINNOW_W + k - 1 words produces at least one shared fingerprint
    (the coverage theorem), at a ~2/(w+1) expected sampling density —
    the fingerprint family between "hash everything" (span dupes) and
    "hash a fixed signature" (minhash). Output: document pairs sharing
    >= 2 selected fingerprints with their fingerprint-set Jaccard.

    Tie-break deviation from the paper: ties select the LEFTMOST
    minimal hash (the packed (hash, pos) key is minimized), not the
    rightmost — same coverage guarantee, one fewer comparison, and the
    packing makes the whole selection a single BIGINT window min that
    compares identically in DuckDB.

    Scale shape: the k-gram build is map-side (the _shingle_arrays
    barrier pattern, positions kept); selection is a per-doc window
    (partitioned on doc_id — never global); the pair join is an
    inverted index on SELECTED fingerprints only (~2/(w+1) of the
    positions), with stop-fingerprints (df > WINNOW_STOP_DF) dropped
    before pair generation — the same posting-list bound the LSH
    stop-shingle filter enforces. Jaccard denominators use the full
    per-doc fingerprint counts, so stop-fingerprint exclusion only
    tightens the numerator (documented estimator bias, identical in
    both engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    fps = winnowing_fingerprint_sets(docs).transform(tracked_cache)
    freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = fps.alias("a"), fps.alias("b")
    common = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .join(
            freq.where(F.col("n_docs").between(2, WINNOW_STOP_DF)).alias("fr"),
            F.col("a.fp") == F.col("fr.fp"),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") >= _WINNOW_MIN_SHARED)
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.col("nc").cast("long").alias("n_shared"),
            F.expr("(1000000 * nc) div (sa.n + sb.n - nc)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Sorted-neighborhood dedup — the sort-based blocking family
# --------------------------------------------------------------------------

SNM_WINDOW = 5  # compare each record to the next SNM_WINDOW-1 in key order
SNM_KEY_CHARS = 24  # blocking key: first chars of the normalized text
# The distributed global rank's fan-out derives per session from
# functions.distrank.range_parts (VERDICT r12 #3).
_SNM_MIN_J_PPM = 250_000  # report pairs with token-set Jaccard >= 0.25


@register(
    "dedup_sorted_neighborhood",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                       1, {SNM_KEY_CHARS}) AS k
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS rn
      FROM keyed
    ),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db, b.rn - a.rn AS gap
      FROM ranked a
      JOIN ranked b ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW - 1}
    ),
    w AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(text, '[^\\p{{L}}]+'),
               x -> len(x) > 0)) AS ws
      FROM documents
    ),
    sim AS (
      SELECT least(da, db) AS doc_a, greatest(da, db) AS doc_b, gap,
             len(list_intersect(wa.ws, wb.ws)) AS nc,
             len(wa.ws) AS na, len(wb.ws) AS nb
      FROM pairs
      JOIN w wa ON wa.doc_id = da
      JOIN w wb ON wb.doc_id = db
    )
    SELECT doc_a, doc_b, CAST(gap AS BIGINT) AS rank_gap,
           CAST((1000000 * nc) // (na + nb - nc) AS BIGINT) AS jaccard_ppm
    FROM sim
    WHERE na + nb - nc > 0
      AND 1000000 * nc >= {_SNM_MIN_J_PPM} * (na + nb - nc)
    """,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (Hernandez & Stolfo 1995) — the third
    classic blocking family beside hash blocking (dedup_exact) and LSH
    (dedup_minhash_lsh): sort all records by a blocking key (here the
    first SNM_KEY_CHARS of the alphanumeric-normalized text), then
    compare each record only to its SNM_WINDOW-1 successors in sort
    order. Near-duplicates with a shared prefix land adjacent and get
    compared; everything else is never paired — candidate count is
    exactly n·(w-1), LINEAR in the corpus. Output: neighbor pairs with
    token-set Jaccard >= 0.25, with their rank distance.

    Scale shape: the global sort rank uses the distributed-row_number
    idiom (repartitionByRange on the key + per-partition row_number +
    broadcast cumulative offsets — the equidepth/zipf plan; the only
    collect is partition-count longs). The neighborhood join is an
    EQUI-join: each rank explodes to its w-1 probe ranks, so Spark
    shuffles on rn instead of falling into a non-equi nested-loop join.
    Token sets join back by doc_id — the rank shuffle moves (key,
    doc_id) pairs, never document text. Jaccard is evaluated only on
    the n·(w-1) candidate pairs; the filter is the all-integer predicate
    1e6·|A∩B| >= t·|A∪B| (no float before the cut, floor-division
    after it — bit-exact in both engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(spark, docs)


def sorted_neighborhood_pairs(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The SNM core over any (doc_id, text) frame — see
    dedup_sorted_neighborhood for the plan-shape contract. Split out so
    tests can drive it over constructed corpora with known duplicates
    (the driver fixtures contain none)."""
    from map_reduce_go_spark.functions.distrank import range_parts

    key = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""),
        1,
        SNM_KEY_CHARS,
    )
    ranged = (
        docs.select("doc_id", key.alias("k"))
        .repartitionByRange(
            range_parts(docs.sparkSession), F.asc("k"), F.asc("doc_id")
        )
        .withColumn("pid", F.spark_partition_id())
        .transform(tracked_cache)
    )
    sizes = {
        r["pid"]: r["n"]
        for r in ranged.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = spark.createDataFrame(offsets or [(0, 0)], "pid int, offset long")
    win = Window.partitionBy("pid").orderBy("k", "doc_id")
    ranked = (
        ranged.join(F.broadcast(off), "pid")
        .select(
            "doc_id", (F.row_number().over(win) + F.col("offset")).alias("rn")
        )
        .transform(tracked_cache)
    )
    probes = ranked.select(
        F.col("doc_id").alias("da"),
        F.explode(F.sequence(F.lit(1), F.lit(SNM_WINDOW - 1))).alias("gap"),
        F.col("rn"),
    ).select("da", "gap", (F.col("rn") + F.col("gap")).alias("probe_rn"))
    b = ranked.alias("b")
    pairs = probes.join(b, F.col("b.rn") == F.col("probe_rn")).select(
        "da", F.col("b.doc_id").alias("db"), "gap"
    )
    wsets = docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.split(F.col("text"), WORD_BOUNDARY),
                lambda x: F.length(x) > 0,
            )
        ).alias("ws"),
    )
    wa, wb = wsets.alias("wa"), wsets.alias("wb")
    sim = (
        pairs.join(wa, F.col("wa.doc_id") == F.col("da"))
        .join(wb, F.col("wb.doc_id") == F.col("db"))
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "gap",
            F.size(F.array_intersect("wa.ws", "wb.ws")).alias("nc"),
            F.size("wa.ws").alias("na"),
            F.size("wb.ws").alias("nb"),
        )
    )
    union = F.col("na") + F.col("nb") - F.col("nc")
    return (
        sim.where(
            (union > 0)
            & (F.lit(1_000_000) * F.col("nc") >= _SNM_MIN_J_PPM * union)
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("gap").cast("long").alias("rank_gap"),
            F.expr("(1000000 * nc) div (na + nb - nc)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Maximal-span exact-substring dedup — the long-span decision input
# --------------------------------------------------------------------------

MAXSPAN_MIN_TOKENS = 10  # report pairs whose longest exact shared run has
#: at least this many tokens (production exact-substring dedup uses ~50;
#: the fixture corpus's real duplicated spans run 10-95 tokens)
_MAXSPAN_HASH_HEX = 15  # 60-bit md5 prefix for position matching


def _kgram_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h): every word-SHINGLE_K-gram at its 1-based token
    position, hashed to a 60-bit md5 prefix that DuckDB reproduces
    bit-for-bit (the winnowing hash discipline, wider: 32 bits suffice
    for selection sampling, but span EXTENSION chains adjacent matches,
    so the match hash gets 60 bits to push chance collisions past any
    realistic corpus). Build is entirely map-side — same optimizer
    barrier as _shingle_arrays (see its docstring) so the token array
    materializes once per row."""
    ws = F.filter(
        F.split(F.col("text"), WORD_BOUNDARY), lambda x: F.length(x) > 0
    )
    base = fan_out(docs).select("doc_id", ws.alias("ws"))
    arr = F.col("ws")
    k = SHINGLE_K
    kgrams = F.when(
        (F.size(arr) >= k) & (F.monotonically_increasing_id() >= 0),
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - k + 1),
            lambda i: F.array_join(F.slice(arr, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "doc_id", F.posexplode(kgrams).alias("pos0", "s")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.expr(
            f"CAST(conv(substring(md5(s), 1, {_MAXSPAN_HASH_HEX}), 16, 10)"
            " AS BIGINT)"
        ).alias("h"),
    )


#: Target rows per shuffle partition for the matched-position exchange —
#: the one exchange in this family whose volume scales with match MASS
#: (Σ_h C(positions_h, 2) over cool hashes), not corpus rows. 2M rows
#: ≈ 60-80 MB per partition: comfortably in-memory sorts at any scale.
_MATCH_ROWS_PER_PARTITION = 2_000_000
_MATCH_MAX_PARTITIONS = 4096

#: Corpus-position cap for the "cool" tier of the match join (r16): a
#: match hash h held at ≤ this many positions corpus-wide routes through
#: the positions self-join on h (per-h output ≤ C(256,2) ≈ 33k rows —
#: AQE skew-split territory at worst, never a quadratic bomb), while
#: hotter hashes (corpus boilerplate k-grams) fall back to the
#: candidate-pair expansion, whose volume the stop-DF filter bounds.
#: The tiers partition the hash space, so cool ∪ hot reproduces the
#: candidate match set exactly — see shared_span_runs.
_MATCH_HOT_POSITIONS = 256

#: (ADVICE r15 proposed gating the sizing pre-job behind a size
#: threshold so small inputs stay lazy. Measured r16 and REJECTED: the
#: gate forces the hot-tier branch to be built unconditionally — the
#: sizing aggregate is also the only cheap proof that no hash is hot —
#: and the empty hot branch's extra joins plus the union's loss of the
#: window's partition reuse cost ~2.5 s at sf0.1, MORE than the ~2 s
#: sizing job the gate skips. The eager one-aggregate sizing stays.)


def _match_partitions(spark: SparkSession, est_rows: float) -> int:
    """Shuffle width for the span match join, sized to the ESTIMATED
    match-expansion volume (never below the session default, capped at
    _MATCH_MAX_PARTITIONS). The 64× probe measured ~2× spill overhead
    when this exchange ran at the session's 32 partitions (~35M rows
    each) — sizing the shuffle to the volume is VERDICT r14 #4's fix,
    turning SCALE.md's prose mitigation into code."""
    default = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    want = math.ceil(est_rows / _MATCH_ROWS_PER_PARTITION)
    return int(min(_MATCH_MAX_PARTITIONS, max(default, want)))


def _fingerprints_from_positions(pos: DataFrame) -> DataFrame:
    """winnowing_fingerprint_sets derived from an existing
    ``_kgram_positions`` frame instead of re-tokenizing the corpus: the
    winnowing selection hash (first 8 md5 hex chars) is the top 32 bits
    of the 60-bit match hash (first 15 hex chars), so
    ``fp = h div 2^28`` reproduces ``conv(substring(md5(s),1,8),16,10)``
    bit-for-bit and the (hash, pos) packed key is then identical to the
    one winnowing_fingerprint_sets builds. Used by shared_span_runs so
    the span family tokenizes + hashes the corpus ONCE (guide: one scan,
    reuse the cached proxy) — the standalone winnowing query keeps its
    direct build (it never needs the wide match hash)."""
    comb = pos.select(
        "doc_id",
        "pos",
        (
            F.expr(f"h div {1 << (4 * (_MAXSPAN_HASH_HEX - 8))}")
            * _WINNOW_POS_BASE
            + F.col("pos")
        ).alias("c"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    sel = comb.select(
        "doc_id",
        F.min("c").over(win).alias("fp_comb"),
        F.count(F.lit(1)).over(win).alias("cnt"),
    ).where(F.col("cnt") == WINNOW_W)
    # The per-doc dedup runs on an fp-clustered exchange (r17):
    # HashPartitioning(fp) satisfies the dropDuplicates clustering on
    # (doc_id, fp) — same fp ⇒ same partition ⇒ same (doc_id, fp) pair
    # co-located — so the distinct adds no exchange of its own, and the
    # OUTPUT (and any cache of it) stays partitioned by fp, which the
    # caller's df-count and candidate self-join (both keyed on fp) then
    # reuse: one exchange where the r16 plan paid for the distinct, the
    # frequency aggregate, and both self-join sides separately. Hot-fp
    # skew in this exchange is the same skew the fp self-join always
    # had (same co-location requirement) — the AQE skew playbook; the
    # map-side partial dedup the old (doc_id, fp) exchange performed
    # only removed the ≤ WINNOW_W duplicate selections per (doc, fp), a
    # bounded constant, not a scale factor.
    return (
        sel.select(
            "doc_id",
            F.expr(f"fp_comb div {_WINNOW_POS_BASE}").alias("fp"),
        )
        .repartition("fp")
        .dropDuplicates()
    )


def shared_span_runs(docs: DataFrame) -> DataFrame:
    """ALL maximal diagonal runs per candidate pair — (doc_a, doc_b,
    span_tokens, pos_a, pos_b), one row per exact shared token run.
    The shared core of :func:`maximal_shared_spans` (per-pair longest)
    and :func:`exact_substring_cut_list` (every qualifying run feeds
    the cut decision). See maximal_shared_spans for the candidate and
    diagonal-island mechanics and the scale contract.

    Two-tier match join (r16 rework of VERDICT r14 #4 / r15 #3): the
    old plan expanded every candidate pair by ALL of doc_a's positions
    (21.6M rows at sf0.1, ~1.1G at the 64× probe) and matched the
    expansion against doc_b's positions — shuffling ~50× more rows than
    can ever hash-match (413k survivors at sf0.1). The rework matches
    positions by hash FIRST and attaches pairs after:

    - **cool tier** (h at ≤ _MATCH_HOT_POSITIONS corpus positions): the
      positions frame self-joins on h with doc_a < doc_b — output mass
      is Σ_h C(c_h, 2), corpus-LINEAR for bounded c_h (2.8M at sf0.1 vs
      the 21.6M expansion) — then an inner join against the distinct
      candidate-pair set drops non-candidate matches (cand is exact, so
      inner = semi; AQE broadcasts it when small, shuffles when not).
    - **hot tier** (boilerplate hashes above the cap, where a raw
      self-join would be quadratic): the OLD candidate-expansion path,
      restricted to hot positions only — volume bounded by candidates ×
      per-doc hot positions, both small by the stop-DF discipline. The
      tiers partition the hash space, so cool ∪ hot is row-identical to
      the old match set; the fixture corpus (max 25 positions/hash) and
      the scramble-replicated probes run entirely cool, and the hot
      branch is only BUILT when hot positions exist.

    Exchange sizing: the one mass-scaling exchange left is the
    cool-match → candidate-filter join (exchange input = the matched
    positions, Σ_h C(c_h, 2) rows). One aggregate over the per-hash
    counts bounds it EXACTLY (no candidate self-join, no expansion
    estimate — cheaper and tighter than the r15 two-tier bound); when
    it exceeds the default width's budget both join sides repartition
    to ceil(mass / 2M) partitions (explicit width opts the exchange out
    of AQE re-coalescing, deliberately — the r15 discipline). The
    positions self-join itself shuffles only corpus-linear rows at the
    session default, and the diagonal window reuses the pair join's
    partitioning ((a,b) clusters (a,b,diag)) — no extra exchange.

    NOT fully lazy (ADVICE r15): constructing this DataFrame runs the
    sizing aggregate (plus, when hot positions exist, the hot-tier
    bound) and populates tracked caches the main job reuses; the
    harness owning the action must call release_caches() afterward. On
    a sizing failure the caches this call created are released before
    the exception propagates. (The ADVICE-suggested lazy gate was
    measured and rejected — see the note at _MATCH_HOT_POSITIONS: the
    sizing aggregate is also the proof that no hash is hot, and an
    unconditional hot branch costs more than the pre-job.)"""
    spark = docs.sparkSession
    pos = _kgram_positions(docs).transform(tracked_cache)
    # Candidate stage on ONE pre-cache exchange (r17): the fingerprint
    # dedup already runs fp-clustered (see _fingerprints_from_positions),
    # so the document-frequency count is a WINDOW over that same
    # partitioning — distinct + df-count + stop filter all inside one
    # plan, one exchange — and only the filtered posting list is cached.
    # The r16 plan cached the unfiltered fingerprints, ran a separate
    # groupBy aggregate for df, and joined it back (3 consumers of the
    # cache, each re-exchanged). Filtering BOTH sides to
    # 2 <= df <= WINNOW_STOP_DF before the self-join keeps exactly the
    # pairs the old freq-join filter kept (the df is a property of the
    # shared fp). The window must stay BELOW the cache: an
    # InMemoryTableScan under AQE reports unknown partitioning, so a
    # window above the cache re-exchanges (measured: +1 exchange + sort
    # per join side).
    fpw = tracked_cache(
        _fingerprints_from_positions(pos)
        .withColumn(
            "n_docs", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .where(F.col("n_docs").between(2, WINNOW_STOP_DF))
        .select("doc_id", "fp")
    )
    a, b = fpw.alias("a"), fpw.alias("b")
    cand_raw = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    )
    default = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    hc = pos.groupBy("h").agg(F.count(F.lit(1)).alias("hc")).transform(
        tracked_cache
    )
    hot_part = default
    try:
        cool_c = F.when(F.col("hc") <= _MATCH_HOT_POSITIONS, F.col("hc"))
        st = hc.agg(
            F.sum(cool_c * (cool_c - 1) / 2).alias("cool_mass"),
            F.sum(
                F.when(F.col("hc") > _MATCH_HOT_POSITIONS, F.col("hc"))
            ).alias("hot_pos"),
        ).first()
        cool_mass = float(st["cool_mass"] or 0)
        build_hot = bool(int(st["hot_pos"] or 0))
        if build_hot:
            # Hot tier present: bound its candidate expansion with the
            # r15 fingerprint-membership aggregate, restricted to hot
            # positions (sum_pos × (n_docs − 1) over qualifying fps).
            hot_cnt = (
                pos.join(
                    hc.where(F.col("hc") > _MATCH_HOT_POSITIONS), "h"
                )
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_pos"))
            )
            st2 = (
                fpw.join(hot_cnt, "doc_id")
                .groupBy("fp")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_pos").alias("sum_pos"),
                )
                .where(F.col("n_docs").between(2, WINNOW_STOP_DF))
                .agg(
                    F.sum(
                        F.col("sum_pos") * (F.col("n_docs") - 1)
                    ).alias("bound")
                )
                .first()
            )
            hot_part = _match_partitions(spark, float(st2["bound"] or 0))
    except Exception:
        pos.unpersist()
        fpw.unpersist()
        hc.unpersist()
        raise
    n_part = _match_partitions(spark, cool_mass)
    if n_part > default:
        # Heavy path: run cand's dedup at the sized width so the pair
        # join sees BOTH sides hash-partitioned (doc_a, doc_b, n_part)
        # — otherwise EnsureRequirements reuses the distinct's
        # default-width partitioning and rewrites the sized exchange
        # back down to the session default (measured: the r16 plan kept
        # width 32 with the sizing applied to m_all alone).
        cand = cand_raw.repartition(n_part, "doc_a", "doc_b").distinct()
    else:
        cand = cand_raw.distinct()
    cool = pos.join(hc.where(F.col("hc") <= _MATCH_HOT_POSITIONS), "h")
    ca = cool.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "h"
    )
    cb = cool.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("h").alias("hb"),
    )
    m_all = ca.join(
        cb, (F.col("h") == F.col("hb")) & (F.col("doc_a") < F.col("doc_b"))
    ).select("doc_a", "doc_b", "pos_a", "pos_b")
    if n_part > default:
        # Mass-heavy: impose the sized width on the matched-position
        # exchange (the join conforms the cand side to it).
        m_all = m_all.repartition(n_part, "doc_a", "doc_b")
    m = m_all.join(cand, ["doc_a", "doc_b"])
    if build_hot:
        hot = pos.join(hc.where(F.col("hc") > _MATCH_HOT_POSITIONS), "h")
        ha = hot.select(
            F.col("doc_id").alias("a_doc"),
            F.col("pos").alias("pos_a"),
            "h",
        )
        hb = hot.select(
            F.col("doc_id").alias("b_doc"),
            F.col("pos").alias("pos_b"),
            F.col("h").alias("hb"),
        )
        expn = (
            cand.join(ha, F.col("a_doc") == F.col("doc_a"))
            .select("doc_a", "doc_b", "pos_a", "h")
            .repartition(hot_part, "doc_b", "h")
        )
        m_hot = (
            expn.join(
                hb.repartition(hot_part, "b_doc", "hb"),
                (F.col("b_doc") == F.col("doc_b"))
                & (F.col("hb") == F.col("h")),
            )
            .select("doc_a", "doc_b", "pos_a", "pos_b")
        )
        m = m.unionByName(m_hot)
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    win = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = m.select(
        "doc_a", "doc_b", diag, "pos_a", "pos_b"
    ).withColumn("grp", F.col("pos_a") - F.row_number().over(win))
    return isl.groupBy("doc_a", "doc_b", "diag", "grp").agg(
        (F.count(F.lit(1)) + (SHINGLE_K - 1)).alias("span_tokens"),
        F.min("pos_a").alias("pos_a"),
        F.min("pos_b").alias("pos_b"),
    )


def maximal_shared_spans(docs: DataFrame) -> DataFrame:
    """Per candidate pair, the MAXIMAL exact shared token run (length +
    1-based token offsets in both docs) — the decision input of
    exact-substring dedup ("Deduplicating Training Data Makes Language
    Models Better": drop one copy of any >=50-token exact substring),
    replacing the fixed-width 5-gram signal of cross_doc_span_dupes for
    long spans (VERDICT r13 #4).

    Mechanics: candidates come from the winnowing posting lists
    (>= 1 shared selected fingerprint, stop-fingerprints df >
    WINNOW_STOP_DF excluded) — the coverage theorem guarantees any
    shared run of WINNOW_W + SHINGLE_K - 1 = 6+ tokens shares a
    selected fingerprint, so every reportable span (>= MAXSPAN_MIN_TOKENS)
    is caught unless ALL its fingerprints are corpus boilerplate (the
    same documented stop-filter bias as winnowing_fingerprints). Span
    extension is the diagonal-island method: matched k-gram positions
    (pos_a, pos_b) lie on diagonal pos_a - pos_b; consecutive pos_a on
    one diagonal chain into an exact run of run_kgrams + k - 1 tokens
    (a maximal shared span of L tokens produces exactly L - k + 1
    consecutive matches). Ties between equal-length maximal runs break
    by (pos_a, pos_b) ascending — a total order, replayed identically
    in the oracle.

    Scale shape: candidates are fingerprint-bucketed, never all-pairs;
    positions shuffle once by doc for the A side and once by (doc, h)
    for the B side; island detection is a window partitioned by
    (pair, diagonal) — no global window. Per-pair work is
    O(|A| + |B| + matches), and match volume is bounded by the
    stop-filter (a k-gram in > WINNOW_STOP_DF docs never forms a
    candidate on its own, and hot-k-gram match skew lands on the AQE
    skew-join playbook like every hot-key join in this module).

    Not fully lazy (ADVICE r15): building the plan runs
    shared_span_runs' match-join sizing aggregate and populates tracked
    caches — release via release_caches() after the action."""
    runs = shared_span_runs(docs)
    best = Window.partitionBy("doc_a", "doc_b").orderBy(
        F.col("span_tokens").desc(), F.col("pos_a"), F.col("pos_b")
    )
    return (
        runs.withColumn("rn", F.row_number().over(best))
        .where(
            (F.col("rn") == 1)
            & (F.col("span_tokens") >= MAXSPAN_MIN_TOKENS)
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("span_tokens").cast("long").alias("span_tokens"),
            F.col("pos_a").cast("int").alias("pos_a"),
            F.col("pos_b").cast("int").alias("pos_b"),
        )
    )


#: Shared oracle CTE chain ending at `runs` (one row per maximal
#: diagonal run) — used by BOTH span registrations so the two oracles
#: can never desynchronize on fingerprint selection or span arithmetic.
_MAXSPAN_RUNS_CTES = f"""
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[^\\p{{L}}]+'),
                         x -> len(x) > 0) AS ws
      FROM documents
    ),
    pos_kg AS (
      SELECT doc_id, i AS pos,
             {_WINNOW_KGRAM_SQL} AS s
      FROM w, unnest(generate_series(1, len(ws) - {SHINGLE_K - 1})) AS t(i)
    ),
    ph AS (
      SELECT doc_id, pos,
             CAST('0x' || substring(md5(s), 1, {_MAXSPAN_HASH_HEX})
                  AS BIGINT) AS h
      FROM pos_kg
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
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp_comb // {_WINNOW_POS_BASE} AS fp
      FROM sel WHERE cnt = {WINNOW_W}
    ),
    freq AS (SELECT fp, count(*) AS n_docs FROM fps GROUP BY fp),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM fps a
      JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      JOIN freq f ON f.fp = a.fp
      WHERE f.n_docs BETWEEN 2 AND {WINNOW_STOP_DF}
    ),
    m AS (
      SELECT c.doc_a, c.doc_b, pa.pos AS pos_a, pb.pos AS pos_b
      FROM cand c
      JOIN ph pa ON pa.doc_id = c.doc_a
      JOIN ph pb ON pb.doc_id = c.doc_b AND pb.h = pa.h
    ),
    isl AS (
      SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_a, pos_b,
             pos_a - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
             ) AS grp
      FROM m
    ),
    runs AS (
      SELECT doc_a, doc_b,
             COUNT(*) + {SHINGLE_K - 1} AS span_tokens,
             MIN(pos_a) AS pos_a, MIN(pos_b) AS pos_b
      FROM isl GROUP BY doc_a, doc_b, diag, grp
    )"""


@register(
    "dedup_maximal_spans",
    oracle=f"""
    WITH {_MAXSPAN_RUNS_CTES}
    SELECT doc_a, doc_b,
           CAST(span_tokens AS BIGINT) AS span_tokens,
           CAST(pos_a AS INTEGER) AS pos_a,
           CAST(pos_b AS INTEGER) AS pos_b
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_a, doc_b
        ORDER BY span_tokens DESC, pos_a, pos_b
      ) AS rn
      FROM runs
    )
    WHERE rn = 1 AND span_tokens >= {MAXSPAN_MIN_TOKENS}
    """,
)
def dedup_maximal_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of :func:`maximal_shared_spans` over the
    documents corpus."""
    return maximal_shared_spans(load_table(spark, sf_dir, "documents"))


def exact_substring_cut_list(docs: DataFrame) -> DataFrame:
    """The exact-substring dedup DECISION: merged per-document token
    ranges to cut, built from EVERY qualifying shared run (not just the
    per-pair maximum) under the keep-the-lowest-copy rule — for each
    run of >= MAXSPAN_MIN_TOKENS tokens shared by (doc_a < doc_b), the
    doc_b occurrence is marked; marked ranges then merge per document
    when they overlap or touch (gaps-and-islands over a per-doc window).
    Guarantee (ADVICE r14 — stated at Lee et al.'s actual strength):
    PER PAIR, each qualifying run's doc_a occurrence is unmarked by THAT
    pair, so the lowest doc_id of a duplicate family keeps every span it
    shares with higher ids. With CHAINED overlapping families the
    survivor of one span may itself lose an overlapping prefix to a
    still-lower doc (A<B<C: pair (A,B) cuts B's A-shared prefix, pair
    (B,C) cuts C's copy — the full B∩C span can end up intact in no
    single doc, only fragmented across A and B). That is the published
    "drop one copy of any >=50-token exact substring" behavior at this
    fixture's threshold, not a per-span survivorship invariant.

    Scale shape: inherits shared_span_runs' candidate-bounded cost; the
    decision itself adds one distinct + one per-doc window over RUN
    rows (orders of magnitude fewer than positions) — nothing here
    re-touches the corpus. Not fully lazy (ADVICE r15): building the
    plan runs shared_span_runs' sizing aggregate and populates tracked
    caches — release via release_caches() after the action."""
    runs = shared_span_runs(docs).where(
        F.col("span_tokens") >= MAXSPAN_MIN_TOKENS
    )
    marks = runs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("pos_b").alias("s"),
        (F.col("pos_b") + F.col("span_tokens") - 1).alias("e"),
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flag = F.when(
        prev_max.isNull() | (F.col("s") > prev_max + 1), 1
    ).otherwise(0)
    island = F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        marks.withColumn("island", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("s").alias("cut_start"),
            F.max("e").alias("cut_end"),
            F.count(F.lit(1)).alias("n_source_runs"),
        )
        .select(
            "doc_id",
            F.col("cut_start").cast("int").alias("cut_start"),
            F.col("cut_end").cast("int").alias("cut_end"),
            (F.col("cut_end") - F.col("cut_start") + 1)
            .cast("long")
            .alias("cut_tokens"),
            F.col("n_source_runs").cast("long").alias("n_source_runs"),
        )
    )


#: Shared oracle CTE tail from `runs` to merged per-doc cut `islands` —
#: used by dedup_span_cuts AND the cut-application family
#: (dedup_span_apply / dedup_span_attrition_by_source) so the decision
#: and its application can never desynchronize on the merge rule.
_SPANCUT_ISLANDS_CTES = f"""
    marks AS (
      SELECT DISTINCT doc_b AS doc_id, pos_b AS s,
             pos_b + span_tokens - 1 AS e
      FROM runs WHERE span_tokens >= {MAXSPAN_MIN_TOKENS}
    ),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR s > MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) + 1
             THEN 1 ELSE 0 END AS flag
      FROM marks
    ),
    islands AS (
      SELECT doc_id, s, e,
             SUM(flag) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM flagged
    )"""


@register(
    "dedup_span_cuts",
    oracle=f"""
    WITH {_MAXSPAN_RUNS_CTES},{_SPANCUT_ISLANDS_CTES}
    SELECT doc_id,
           CAST(MIN(s) AS INTEGER) AS cut_start,
           CAST(MAX(e) AS INTEGER) AS cut_end,
           CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS cut_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_source_runs
    FROM islands
    GROUP BY doc_id, island
    """,
)
def dedup_span_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of :func:`exact_substring_cut_list` over the
    documents corpus."""
    return exact_substring_cut_list(load_table(spark, sf_dir, "documents"))


def exact_substring_apply(docs: DataFrame) -> DataFrame:
    """APPLY the exact-substring cut decision (VERDICT r14 #5 — the
    stage a real pipeline actually runs after
    :func:`exact_substring_cut_list`): per document, the surviving
    corpus in auditable form — original token count, tokens cut,
    tokens kept, and an md5 digest of the kept token stream (tokens in
    original order, space-joined — the normalized text a downstream
    tokenizer would consume). Documents without cuts pass through with
    cut_tokens = 0 and the digest of their full token stream, so the
    output is the complete post-dedup corpus manifest, not just the
    touched rows.

    Plan shape: one corpus scan tokenizes map-side (the WORD_BOUNDARY
    discipline every span operator shares); the merged cut ranges —
    orders of magnitude fewer rows than the corpus — aggregate to one
    array per cut document and LEFT-join back on doc_id (size-chosen by
    AQE: broadcast while the cut manifest fits, shuffle join at corpus
    scale). Range exclusion is a per-token higher-order filter against
    that bounded array (ranges per doc are merged and disjoint, so the
    inner EXISTS scans a handful of structs) — no explode, no
    per-token shuffle, nothing driver-side. Not fully lazy (ADVICE
    r15): building the plan runs shared_span_runs' sizing aggregate and
    populates tracked caches — release via release_caches() after the
    action."""
    cuts = exact_substring_cut_list(docs)
    ranges = cuts.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("cut_start", "cut_end"))
        ).alias("cut_ranges")
    )
    ws = F.filter(
        F.split(F.col("text"), WORD_BOUNDARY), lambda x: F.length(x) > 0
    )
    toks = fan_out(docs).select("doc_id", ws.alias("ws"))
    joined = toks.join(ranges, "doc_id", "left")
    kept = F.when(F.col("cut_ranges").isNull(), F.col("ws")).otherwise(
        F.filter(
            F.col("ws"),
            lambda x, i: ~F.exists(
                F.col("cut_ranges"),
                lambda r: (i + 1 >= r["cut_start"]) & (i + 1 <= r["cut_end"]),
            ),
        )
    )
    return joined.select(
        "doc_id",
        F.size("ws").cast("long").alias("orig_tokens"),
        (F.size("ws") - F.size(kept)).cast("long").alias("cut_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
        F.md5(F.array_join(kept, " ")).alias("kept_digest"),
    )


#: Oracle CTE tail from `islands` to the per-doc application — shared by
#: the two cut-application registrations.
_SPANAPPLY_CTES = """,
    cuts AS (
      SELECT doc_id, MIN(s) AS cut_start, MAX(e) AS cut_end
      FROM islands GROUP BY doc_id, island
    ),
    toks AS (
      SELECT doc_id, i AS pos, ws[i] AS tok
      FROM w, unnest(generate_series(1, len(ws))) AS t(i)
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t
      LEFT JOIN cuts c
        ON c.doc_id = t.doc_id AND t.pos BETWEEN c.cut_start AND c.cut_end
      WHERE c.doc_id IS NULL
    ),
    keptagg AS (
      SELECT doc_id, COUNT(*) AS kept_tokens,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_digest
      FROM kept GROUP BY doc_id
    ),
    applied AS (
      SELECT b.doc_id,
             CAST(len(b.ws) AS BIGINT) AS orig_tokens,
             CAST(len(b.ws) - COALESCE(k.kept_tokens, 0) AS BIGINT)
               AS cut_tokens,
             CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
             COALESCE(k.kept_digest, md5('')) AS kept_digest
      FROM w b LEFT JOIN keptagg k ON k.doc_id = b.doc_id
    )"""


@register(
    "dedup_span_apply",
    oracle=f"""
    WITH {_MAXSPAN_RUNS_CTES},{_SPANCUT_ISLANDS_CTES}{_SPANAPPLY_CTES}
    SELECT doc_id, orig_tokens, cut_tokens, kept_tokens, kept_digest
    FROM applied
    """,
)
def dedup_span_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of :func:`exact_substring_apply` over the
    documents corpus — the post-cut corpus manifest (kept-token counts
    + kept-text digests). The oracle replays the application in SQL
    over the same shared runs/islands CTE chain as dedup_span_cuts, so
    decision and application are value-hash-locked together."""
    return exact_substring_apply(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_span_attrition_by_source",
    oracle=f"""
    WITH {_MAXSPAN_RUNS_CTES},{_SPANCUT_ISLANDS_CTES}{_SPANAPPLY_CTES}
    SELECT d.source,
           COUNT(*) AS docs,
           CAST(SUM(CASE WHEN a.cut_tokens > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_cut,
           CAST(SUM(a.orig_tokens) AS BIGINT) AS tokens_before,
           CAST(SUM(a.kept_tokens) AS BIGINT) AS tokens_after,
           CASE WHEN SUM(a.orig_tokens) = 0 THEN 0
                ELSE CAST(floor(1000000.0 * SUM(a.cut_tokens)
                                / SUM(a.orig_tokens)) AS BIGINT)
           END AS tokens_removed_ppm
    FROM applied a JOIN documents d ON d.doc_id = a.doc_id
    GROUP BY d.source
    """,
)
def dedup_span_attrition_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What exact-substring (span) dedup COSTS each source, in the
    shape the mixture planner consumes (the
    dedup_token_attrition_by_source precedent, which reports the same
    for whole-document exact dedup): per source, documents, documents
    that lost at least one span, tokens before/after cut application,
    and the removed-token ppm (floored at emission — counts stay exact
    integers end to end). Composes exact_substring_apply with one
    dimension join and a source-cardinality rollup."""
    docs = load_table(spark, sf_dir, "documents")
    applied = exact_substring_apply(docs)
    cut_sum = F.sum("cut_tokens")
    orig_sum = F.sum("orig_tokens")
    return (
        applied.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("cut_tokens") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_cut"),
            orig_sum.cast("long").alias("tokens_before"),
            F.sum("kept_tokens").cast("long").alias("tokens_after"),
            F.when(orig_sum == 0, F.lit(0))
            .otherwise(F.floor(F.lit(1000000.0) * cut_sum / orig_sum))
            .cast("long")
            .alias("tokens_removed_ppm"),
        )
    )


# The funnel's full oracle text, shared verbatim with its consumer
# mixture_budget_correction (which wraps it as a CTE): one string, zero
# drift between the funnel's certification and its downstream reader.
_FUNNEL_ORACLE_SQL = f"""
    WITH keep AS (
      SELECT md5(text) AS h, min(doc_id) AS keep_id
      FROM documents GROUP BY md5(text)
    ),
    survivors AS (
      SELECT d.doc_id, d.text, d.source
      FROM documents d
      JOIN keep k ON md5(d.text) = k.h AND d.doc_id = k.keep_id
    ),
    {_MAXSPAN_RUNS_CTES.replace("FROM documents", "FROM survivors")},{_SPANCUT_ISLANDS_CTES}{_SPANAPPLY_CTES},
    tot AS (
      SELECT source,
             COUNT(*) AS docs_total,
             SUM(len(list_filter(string_split_regex(text, '[^\\p{{L}}]+'),
                                 x -> len(x) > 0))) AS tokens_total
      FROM documents GROUP BY source
    ),
    sv AS (
      SELECT s.source,
             COUNT(*) AS docs_after_exact,
             SUM(a.orig_tokens) AS tokens_after_exact,
             SUM(a.kept_tokens) AS tokens_after_span
      FROM applied a JOIN survivors s ON s.doc_id = a.doc_id
      GROUP BY s.source
    )
    SELECT t.source,
           CAST(t.docs_total AS BIGINT) AS docs_total,
           CAST(COALESCE(sv.docs_after_exact, 0) AS BIGINT) AS docs_after_exact,
           CAST(t.tokens_total AS BIGINT) AS tokens_total,
           CAST(COALESCE(sv.tokens_after_exact, 0) AS BIGINT) AS tokens_after_exact,
           CAST(COALESCE(sv.tokens_after_span, 0) AS BIGINT) AS tokens_after_span,
           CASE WHEN t.tokens_total = 0 THEN 0
                ELSE CAST(floor(1000000.0 * (t.tokens_total - COALESCE(sv.tokens_after_exact, 0))
                                / t.tokens_total) AS BIGINT) END
             AS exact_removed_ppm,
           CASE WHEN COALESCE(sv.tokens_after_exact, 0) = 0 THEN 0
                ELSE CAST(floor(1000000.0 * (sv.tokens_after_exact - sv.tokens_after_span)
                                / sv.tokens_after_exact) AS BIGINT) END
             AS span_removed_ppm
    FROM tot t LEFT JOIN sv ON sv.source = t.source
    """


@register("dedup_pipeline_exact_then_span", oracle=_FUNNEL_ORACLE_SQL)
def dedup_pipeline_exact_then_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup ORDER at span granularity — the two-stage
    funnel a real pipeline runs and reports: exact whole-document dedup
    first (cheap digest groupBy, keep the lowest doc_id — identical to
    dedup_exact's rule, so the stages compose with the rest of the
    suite), THEN exact-substring span cuts applied to the survivors
    (the full shared-runs -> cut-list -> application chain of
    dedup_span_apply, scoped to the post-exact corpus). Output is the
    per-source funnel: docs and tokens at each stage plus the removed
    ppm per stage — what a mixture planner consumes to correct
    per-source budgets after BOTH dedup passes (the
    dedup_pipeline_exact_then_lsh precedent, reported in tokens).
    Every source appears, including fully-attrited ones (ADVICE r15:
    a source whose every document exactly duplicates lower-doc_id
    documents in other sources reports docs_after_exact = 0 and
    exact_removed_ppm = 1000000 via the LEFT survivor join — the
    planner must see the zero, not a missing row).

    Oracle note: the span chain is the SAME certified CTE text as
    dedup_maximal_spans/dedup_span_cuts/dedup_span_apply, re-sourced
    onto the survivors CTE by name — one substitution, zero semantic
    drift. Running span dedup after exact dedup also removes the
    identical-copy families from the candidate space, which is exactly
    why production orders the stages this way.

    Scale shape: the digest stage is one md5 groupBy + join (fixed
    32-char keys); the span stage inherits shared_span_runs' measured
    match-join sizing; the rollup is source-cardinality. Nothing new
    shuffles beyond the composed stages."""
    docs = load_table(spark, sf_dir, "documents")
    keep = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    survivors = (
        docs.join(keep, F.md5(docs["text"]) == keep["h"])
        .where(F.col("keep_id") == F.col("doc_id"))
        .select("doc_id", "text", "source")
        .transform(tracked_cache)
    )
    applied = exact_substring_apply(survivors.select("doc_id", "text"))
    ws_n = F.size(
        F.filter(
            F.split(F.col("text"), WORD_BOUNDARY), lambda x: F.length(x) > 0
        )
    )
    tot = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_total"),
        F.sum(ws_n).cast("long").alias("tokens_total"),
    )
    sv = (
        applied.join(survivors.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_after_exact"),
            F.sum("orig_tokens").cast("long").alias("tokens_after_exact"),
            F.sum("kept_tokens").cast("long").alias("tokens_after_span"),
        )
    )
    # LEFT join from tot (ADVICE r15): a source whose every document is
    # an exact duplicate of lower-doc_id documents in OTHER sources has
    # no survivors row at all — the funnel's consumer (a mixture planner
    # correcting per-source budgets) must still see it, as
    # docs_after_exact = 0, not as a missing row.
    zero = F.lit(0).cast("long")
    te = F.coalesce(F.col("tokens_after_exact"), zero)
    ts = F.coalesce(F.col("tokens_after_span"), zero)
    tt = F.col("tokens_total")
    return tot.join(sv, "source", "left").select(
        "source",
        "docs_total",
        F.coalesce(F.col("docs_after_exact"), zero).alias("docs_after_exact"),
        "tokens_total",
        te.alias("tokens_after_exact"),
        ts.alias("tokens_after_span"),
        F.when(tt == 0, F.lit(0))
        .otherwise(F.floor(F.lit(1000000.0) * (tt - te) / tt))
        .cast("long")
        .alias("exact_removed_ppm"),
        F.when(te == 0, F.lit(0))
        .otherwise(F.floor(F.lit(1000000.0) * (te - ts) / te))
        .cast("long")
        .alias("span_removed_ppm"),
    )


@register(
    "mixture_budget_correction",
    oracle=f"""
    WITH funnel AS ({_FUNNEL_ORACLE_SQL}),
    tots AS (
      SELECT SUM(tokens_total) AS tt, SUM(tokens_after_span) AS ta
      FROM funnel
    )
    SELECT f.source,
           f.tokens_total,
           f.tokens_after_span,
           CAST(floor(1000000.0 * f.tokens_total / t.tt) AS BIGINT)
             AS orig_share_ppm,
           CASE WHEN t.ta = 0 THEN 0
                ELSE CAST(floor(1000000.0 * f.tokens_after_span / t.ta)
                          AS BIGINT) END
             AS post_share_ppm,
           CASE WHEN f.tokens_after_span = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(floor(1000.0 * f.tokens_total
                                / f.tokens_after_span) AS BIGINT) END
             AS oversample_x1000,
           CAST(CASE WHEN f.tokens_after_span = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS fully_attrited
    FROM funnel f, tots t
    """,
)
def mixture_budget_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel's CONSUMER (r16 — closes the loop ADVICE r15 opened):
    given dedup_pipeline_exact_then_span's per-source funnel, the
    mixture re-plan a training pipeline runs after dedup — each
    source's original token share (the mixture the run was designed
    around), its post-dedup share (what sampling uniformly from the
    survivors would give), and the oversample factor (×1000, floored)
    that restores the original budget from the surviving pool: a
    source that lost half its tokens to dedup needs ~2 epochs over its
    survivors to fill its planned slice. Fully-attrited sources — the
    zero-survivor rows the funnel's LEFT join now reports — carry a
    NULL oversample (no pool to sample from) and fully_attrited = 1,
    the signal to re-weight the remaining sources instead.

    Oracle note: wraps the funnel's certified oracle text verbatim as a
    CTE (_FUNNEL_ORACLE_SQL — one string, shared with the funnel's own
    registration), so this query's certification cannot drift from the
    funnel's.

    Scale shape: the funnel output is source-cardinality (bounded);
    the totals are a one-row aggregate broadcast back — the only work
    beyond the composed funnel is O(|sources|). Integer/ppm arithmetic
    end to end for cross-engine hash stability."""
    funnel = dedup_pipeline_exact_then_span(spark, sf_dir).transform(
        tracked_cache
    )
    tots = funnel.agg(
        F.sum("tokens_total").alias("tt"),
        F.sum("tokens_after_span").alias("ta"),
    )
    tt, ta = F.col("tt"), F.col("ta")
    t_total, t_span = F.col("tokens_total"), F.col("tokens_after_span")
    return funnel.crossJoin(F.broadcast(tots)).select(
        "source",
        "tokens_total",
        "tokens_after_span",
        F.floor(F.lit(1000000.0) * t_total / tt)
        .cast("long")
        .alias("orig_share_ppm"),
        F.when(ta == 0, F.lit(0))
        .otherwise(F.floor(F.lit(1000000.0) * t_span / ta))
        .cast("long")
        .alias("post_share_ppm"),
        F.when(t_span == 0, F.lit(None))
        .otherwise(F.floor(F.lit(1000.0) * t_total / t_span))
        .cast("long")
        .alias("oversample_x1000"),
        F.when(t_span == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fully_attrited"),
    )

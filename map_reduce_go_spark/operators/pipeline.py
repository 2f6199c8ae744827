"""End-to-end training-data pipeline operators: the quality-filter chain,
hash-based train/eval splitting, deterministic shuffle sharding, and
sequence packing. These compose the signals from
:mod:`map_reduce_go_spark.operators.textstats` into the decisions a
pre-training data pipeline actually ships: which docs survive, which split
they land in, which shard/batch they're packed into.

Everything is a codegen'd projection or a bounded-key window — no Python,
no global single-partition operation anywhere:

- quality filter: pure map-side predicate over per-doc signals (at 100 TB
  this is the pattern: one scan, filters fused into it by Catalyst).
- train/eval split: deterministic by content hash — reproducible across
  runs/engines/cluster sizes, no RNG state, and stable under re-runs over
  a grown corpus (a doc never flips split when new docs arrive).
- shuffle sharding: md5 ordering within 16 hash shards — the distributed
  form of "shuffle the dataset": global order is (shard, sort_key), each
  shard sorts independently (window partitioned by shard, never global).
- sequence packing: greedy cumulative token binning per (lang, shard)
  stream via a running-sum window — the "pack documents into fixed token
  budget batches" step before tokenizer/writer fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_go_spark.functions.caching import tracked_cache
from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table

# Quality thresholds (C4-style heuristics, tuned to the synthetic corpus).
MIN_TOKENS = 10
MAX_DIGIT_RATIO = 0.3
MIN_STOPWORD_RATIO = 0.0  # en-only signal; kept permissive for multilingual docs

_WS_TOKENS_SQL = r"len(regexp_extract_all(text, '\S+'))"
_DIGITS_SQL = "length(regexp_replace(text, '[^0-9]', '', 'g'))"


@register(
    "quality_filter_chain",
    oracle=f"""
    SELECT doc_id, lang, source,
           {_WS_TOKENS_SQL} AS n_tokens
    FROM documents
    WHERE {_WS_TOKENS_SQL} >= {MIN_TOKENS}
      AND CAST({_DIGITS_SQL} AS DOUBLE) / greatest(length(text), 1)
            < {MAX_DIGIT_RATIO}
      AND length(text) > 0
    """,
)
def quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survivor set of the quality-filter chain: minimum token count,
    bounded digit ratio, non-empty. One scan, every predicate fused into
    it map-side — the canonical 100 TB first-pass filter."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    digit_ratio = digits.cast("double") / F.greatest(F.length("text"), F.lit(1))
    return (
        docs.where(
            (n_tokens >= MIN_TOKENS)
            & (digit_ratio < MAX_DIGIT_RATIO)
            & (F.length("text") > 0)
        )
        .select("doc_id", "lang", "source", n_tokens.alias("n_tokens"))
    )


# Train/eval split: first hex char of the content-id hash. '0'..'c' = 13/16
# of the space -> ~81% train; lexicographic comparison on hex is identical
# in every engine (no integer parsing needed).
_SPLIT_AT = "d"


@register(
    "train_test_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '{_SPLIT_AT}'
                THEN 'train' ELSE 'eval' END AS split
    FROM documents
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split: a document's split is a pure function of
    its id — reproducible across engines and stable as the corpus grows
    (new docs never flip old assignments, unlike fraction-based sampling)."""
    docs = load_table(spark, sf_dir, "documents")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return docs.select(
        "doc_id",
        F.when(first_hex < _SPLIT_AT, "train").otherwise("eval").alias("split"),
    )


N_SHARDS = 16


@register(
    "shuffle_shards",
    oracle="""
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY sk, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS sk,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       BETWEEN '0' AND '9'
                  THEN CAST(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS INTEGER)
                  ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 87
             END AS shard
      FROM documents)
    """,
)
def shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed dataset shuffle: pseudo-random but deterministic global
    order expressed as (shard, pos_in_shard) — 16 hash shards, each
    ordered by md5. The window partitions on `shard` (bounded, uniform),
    NEVER a global single-partition row_number: at 100 TB each shard
    sorts independently and in parallel, and a training reader streams
    shards round-robin for the same statistical shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    sk = F.md5(F.col("doc_id").cast("string"))
    first = F.substring(sk, 1, 1)
    shard = (
        F.when(first.between("0", "9"), first.cast("int"))
        .otherwise(F.ascii(first) - 87)
    )
    w = Window.partitionBy("shard").orderBy("sk", "doc_id")
    return (
        docs.select("doc_id", sk.alias("sk"), shard.alias("shard"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos_in_shard")
    )


TOKEN_BUDGET = 512  # tokens per packed training sequence (fixture-sized)


@register(
    "sequence_packing",
    oracle=f"""
    SELECT doc_id, lang, n_tok,
           CAST(floor((cum_tok - n_tok) / {TOKEN_BUDGET}) AS BIGINT) AS bin_id
    FROM (
      SELECT doc_id, lang, n_tok,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY sk, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tok
      FROM (
        SELECT doc_id, lang,
               {_WS_TOKENS_SQL} AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS sk
        FROM documents))
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: stream documents per language in shuffled
    (hash) order, accumulate token counts, open a new bin every
    TOKEN_BUDGET tokens — bin_id = floor(preceding-cumsum / budget).

    The running sum is a window over (lang) partitions in a fixed
    deterministic order; at 100 TB the partition key becomes (lang, shard)
    so no stream exceeds one task (same plan, finer key — the packing
    boundary error per shard seam is one partial batch, which trainers
    tolerate by design)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    sk = F.md5(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id", "lang", n_tok.alias("n_tok"), sk.alias("sk")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("sk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return base.select(
        "doc_id",
        "lang",
        "n_tok",
        F.floor((cum - F.col("n_tok")) / TOKEN_BUDGET).cast("long").alias("bin_id"),
    )


SAMPLE_FRACTIONS = {"en": 0.5, "es": 0.3, "de": 0.3, "fr": 0.3, "zh": 0.2}
SAMPLE_SEED = 42
_SAMPLE_MOD = 1_000_000  # hash-bucket resolution: fractions exact to 1e-6


def _sample_hash_col() -> Column:
    """Deterministic per-row Bernoulli draw in [0, _SAMPLE_MOD): the first
    8 hex digits of md5("lang|doc_id|seed") mod the resolution. Content-
    keyed hashing (not engine RNG) is the production form of corpus
    sampling: re-runs, retries, and different engines all keep the exact
    same rows, which makes the sample reproducible AND oracle-checkable."""
    h = F.md5(
        F.concat_ws(
            "|", F.col("lang"), F.col("doc_id").cast("string"), F.lit(str(SAMPLE_SEED))
        )
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _SAMPLE_MOD


def _sample_hash_sql() -> str:
    return (
        "CAST('0x' || substring(md5(lang || '|' || CAST(doc_id AS VARCHAR) || "
        f"'|{SAMPLE_SEED}'), 1, 8) AS BIGINT) % {_SAMPLE_MOD}"
    )


@register(
    "stratified_sample_by_lang",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_sample_hash_sql()} < CASE lang
        {" ".join(f"WHEN '{lang}' THEN {int(frac * _SAMPLE_MOD)}" for lang, frac in SAMPLE_FRACTIONS.items())}
        ELSE 0 END
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling: per-language keep fractions (the
    language-rebalancing step of a pre-training mix), as a deterministic
    hash-Bernoulli filter — md5("lang|doc_id|seed") mod 1e6 under the
    stratum's threshold. Unlike engine RNG (sampleBy), the hash draw is
    reproducible across runs, partitionings, and engines, so the oracle
    replays it exactly.

    Map-side filter over the scan — no shuffle, arbitrarily parallel, and
    the same plan at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.lit(0)
    for lang, frac in SAMPLE_FRACTIONS.items():
        threshold = F.when(
            F.col("lang") == lang, int(frac * _SAMPLE_MOD)
        ).otherwise(threshold)
    return docs.where(_sample_hash_col() < threshold).select("doc_id", "lang")


# Source mixture: per-source repetition factors (epoch weighting). Integer
# multiplicities keep the op deterministic and oracle-exact.
HIGH_VALUE_SOURCES = ("src0", "src1", "src2")  # 3x (the "books" tier)
MID_VALUE_SOURCES = ("src3", "src4")  # 2x (the "curated web" tier)


@register(
    "data_mixture_upsample",
    oracle=f"""
    SELECT d.doc_id, d.source, CAST(t.i AS INTEGER) AS copy_idx
    FROM documents d,
         unnest(generate_series(1,
            CASE WHEN d.source IN {HIGH_VALUE_SOURCES} THEN 3
                 WHEN d.source IN {MID_VALUE_SOURCES} THEN 2
                 ELSE 1 END)) AS t(i)
    """,
)
def data_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix upsampling: each source repeated by its epoch weight
    (high-value tier 3×, mid tier 2×, rest 1×) with an explicit copy
    index — the deterministic form of mixture sampling. Pure map-side
    explode: at 100 TB this multiplies rows without any shuffle; the
    copy_idx feeds the shuffle-shard stage so copies land in different
    shards."""
    docs = load_table(spark, sf_dir, "documents")
    weight = (
        F.when(F.col("source").isin(*HIGH_VALUE_SOURCES), F.lit(3))
        .when(F.col("source").isin(*MID_VALUE_SOURCES), F.lit(2))
        .otherwise(F.lit(1))
    )
    return docs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), weight)).alias("copy_idx"),
    ).withColumn("copy_idx", F.col("copy_idx").cast("int"))


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LONGNUM_RE = r"[0-9]{7,}"


@register(
    "pii_redaction",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS n_long_numbers,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_LONGNUM_RE}', '<NUM>', 'g') AS redacted
    FROM documents
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: count and redact email addresses and long digit
    runs (phone/account-number proxy). One codegen projection over the
    scan — the standard pre-training scrub is exactly this shape, just
    with more patterns."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_LONGNUM_RE), 0)).alias("n_long_numbers"),
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _LONGNUM_RE, "<NUM>"
        ).alias("redacted"),
    )


N_EVAL_DOCS = 5  # fixture stand-in for the benchmark/eval set


@register(
    "decontaminate_against_eval",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[^\\p{{L}}]+'), x -> len(x) > 0) AS ws
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
    ),
    eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id < {N_EVAL_DOCS})
    SELECT d.doc_id,
           CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           coalesce(o.n_overlap, 0) >= 3 AS contaminated
    FROM documents d
    LEFT JOIN (
      SELECT sh.doc_id, count(*) AS n_overlap
      FROM sh JOIN eval_sh e ON sh.s = e.s
      WHERE sh.doc_id >= {N_EVAL_DOCS}
      GROUP BY sh.doc_id
    ) o ON o.doc_id = d.doc_id
    WHERE d.doc_id >= {N_EVAL_DOCS}
    """,
)
def decontaminate_against_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >= 3 distinct
    word-trigrams with the eval set (doc_id < N_EVAL_DOCS stands in for
    the benchmark corpus). The eval n-gram set is tiny by construction ->
    broadcast join against the training shingle stream; at 100 TB this is
    a map-side semi-join (the canonical n-gram decontamination pass, run
    with 13-grams in production)."""
    from map_reduce_go_spark.operators.dedup import _shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    eval_sh = sh.where(F.col("doc_id") < N_EVAL_DOCS).select("s").distinct()
    overlap = (
        sh.where(F.col("doc_id") >= N_EVAL_DOCS)
        .join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    train = docs.where(F.col("doc_id") >= N_EVAL_DOCS).select("doc_id")
    return train.join(overlap, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) >= 3).alias("contaminated"),
    )


_SHARD_SQL = """
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       BETWEEN '0' AND '9'
                  THEN CAST(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS INTEGER)
                  ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 87
             END AS shard
      FROM documents
"""


@register(
    "shard_balance_audit",
    oracle=f"""
    WITH s AS ({_SHARD_SQL}),
    agg AS (SELECT shard, count(*) AS n_docs FROM s GROUP BY shard),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                   count(*) AS n_shards FROM agg)
    SELECT a.shard, a.n_docs,
           round(CAST(a.n_docs AS DOUBLE) / t.total, 6) AS share,
           round(CAST(a.n_docs * t.n_shards AS DOUBLE) / t.total - 1, 6)
             AS skew_vs_uniform
    FROM agg a CROSS JOIN tot t
    """,
)
def shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance report for the hash sharding scheme: per-shard doc
    count, corpus share, and relative deviation from a uniform spread.
    This is the audit that catches a bad shard key BEFORE a 100 TB write
    fans out — a skewed shard becomes the straggler task of every
    downstream job.

    One groupBy on the shard id (16 groups, map-side partials) plus a
    broadcast of the 1-row totals — cost is the scan, nothing else."""
    docs = load_table(spark, sf_dir, "documents")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    shard = (
        F.when(first_hex.between("0", "9"), first_hex.cast("int"))
        .otherwise(F.ascii(first_hex) - 87)
    )
    agg = (
        docs.select(shard.alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = agg.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_shards")
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias("share"),
        F.round(
            (F.col("n_docs") * F.col("n_shards")).cast("double") / F.col("total") - 1,
            6,
        ).alias("skew_vs_uniform"),
    )


@register(
    "token_mixture_planner",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum({_WS_TOKENS_SQL}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   count(*) AS n_sources
            FROM per_source)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / nullif(total_tokens, 0), 6)
             AS token_share,
           round(CAST(total_tokens AS DOUBLE) / nullif(n_sources * n_tokens, 0), 6)
             AS uniform_weight
    FROM per_source CROSS JOIN tot
    """,
)
def token_mixture_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted mixture planning: per-source document and token
    totals, each source's share of the corpus token budget, and the
    sampling weight that would equalize token contribution across sources
    (weight = uniform_target / current_share). Mixture decisions at scale
    are made in TOKENS, not documents — a source of few huge docs
    otherwise dominates a doc-count mixture (data_mixture_upsample applies
    fixed per-tier weights; this op computes the weights).

    One map-side token count fused into the scan, one groupBy on source
    (bounded cardinality — partials absorb everything), and a broadcast of
    the 1-row totals. All-integer until the two final rounded ratios; both
    ratios guard their denominator with nullif — an all-empty source (or
    corpus) yields NULL identically on both engines instead of Spark NULL
    vs DuckDB inf divergence (ADVICE r4)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    per_source = (
        docs.select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double")
            / F.nullif(F.col("total_tokens"), F.lit(0)),
            6,
        ).alias("token_share"),
        F.round(
            F.col("total_tokens").cast("double")
            / F.nullif(F.col("n_sources") * F.col("n_tokens"), F.lit(0)),
            6,
        ).alias("uniform_weight"),
    )


@register(
    "eval_contamination_report",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[^\\p{{L}}]+'), x -> len(x) > 0) AS ws
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
    ),
    hits AS (
      SELECT e.doc_id,
             count(DISTINCT t.doc_id) AS n_train_docs,
             count(DISTINCT e.s) AS n_shared_shingles
      FROM sh e JOIN sh t ON t.s = e.s
      WHERE e.doc_id < {N_EVAL_DOCS} AND t.doc_id >= {N_EVAL_DOCS}
      GROUP BY e.doc_id
    )
    SELECT d.doc_id AS eval_doc_id,
           CAST(coalesce(h.n_train_docs, 0) AS BIGINT) AS n_train_docs,
           CAST(coalesce(h.n_shared_shingles, 0) AS BIGINT) AS n_shared_shingles
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id < {N_EVAL_DOCS}
    """,
)
def eval_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval-side view of decontamination: for each eval document, how
    many training documents share at least one word-trigram with it and
    how many of its distinct trigrams leak. decontaminate_against_eval
    decides which TRAINING docs to drop; this report tells the eval owner
    which BENCHMARK items are compromised and how badly — both directions
    run off the same shingle inverted index.

    Shape: the trigram self-join restricted to (eval, train) pairs — the
    eval side is a tiny fraction of the corpus, so at 100 TB the eval
    shingle set broadcasts and the train side streams through it
    map-side; the exact count-distincts aggregate over the (small) hit
    set only. All-integer output.
    """
    from map_reduce_go_spark.operators.dedup import _shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    ev = sh.where(F.col("doc_id") < N_EVAL_DOCS).select(
        F.col("doc_id").alias("eval_doc_id"), "s"
    )
    tr = sh.where(F.col("doc_id") >= N_EVAL_DOCS).select(
        F.col("doc_id").alias("train_doc_id"), "s"
    )
    hits = (
        ev.join(tr, "s")
        .groupBy("eval_doc_id")
        .agg(
            F.count_distinct("train_doc_id").alias("n_train_docs"),
            F.count_distinct("s").alias("n_shared_shingles"),
        )
    )
    return (
        docs.where(F.col("doc_id") < N_EVAL_DOCS)
        .select(F.col("doc_id").alias("eval_doc_id"))
        .join(hits, "eval_doc_id", "left")
        .select(
            "eval_doc_id",
            F.coalesce("n_train_docs", F.lit(0)).alias("n_train_docs"),
            F.coalesce("n_shared_shingles", F.lit(0)).alias("n_shared_shingles"),
        )
    )


# Weighted-sampling knobs: keep probability = min(n_chars, _W_CAP)/_W_CAP
# × 0.5, expressed ENTIRELY in integers (threshold = min(n_chars, cap) ×
# _W_SCALE out of _SAMPLE_MOD) so row membership is bit-deterministic in
# both engines — no float probability ever compares against the hash draw.
_W_CAP = 400
_W_SCALE = _SAMPLE_MOD // (2 * _W_CAP)  # cap × scale = 0.5 × _SAMPLE_MOD


@register(
    "length_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars,
           CAST(least(n_chars, {_W_CAP}) * {_W_SCALE} AS BIGINT) AS keep_threshold
    FROM documents
    WHERE CAST('0x' || substring(md5('len|' || CAST(doc_id AS VARCHAR) || '|{SAMPLE_SEED}'), 1, 8)
               AS BIGINT) % {_SAMPLE_MOD}
          < least(n_chars, {_W_CAP}) * {_W_SCALE}
    """,
)
def length_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus sampling: each document kept with probability
    proportional to its (capped) length — the importance-sampling
    primitive behind quality-weighted mixtures (production swaps in any
    integer-scaled quality score; the fixture's n_chars column is the
    stand-in). The draw is the same content-keyed hash-Bernoulli as
    stratified_sample_by_lang (different hash domain, so the two samples
    are independent), and the keep threshold is pure integer arithmetic —
    no float probability ever meets the hash, so the sample is
    bit-reproducible across runs, partitionings, and engines.

    Map-side filter fused into the scan; no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(
        F.concat_ws("|", F.lit("len"), F.col("doc_id").cast("string"), F.lit(str(SAMPLE_SEED)))
    )
    draw = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _SAMPLE_MOD
    threshold = F.least(F.col("n_chars"), F.lit(_W_CAP)) * _W_SCALE
    return docs.where(draw < threshold).select(
        "doc_id", "n_chars", threshold.cast("long").alias("keep_threshold")
    )


RESERVOIR_K = 25


@register(
    "reservoir_sample_per_source",
    oracle=f"""
    SELECT source, doc_id, rk FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) t WHERE rk <= {RESERVOIR_K}
    """,
)
def reservoir_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample per source (k={RESERVOIR_K}): the
    distributed analog of reservoir sampling, expressed as keyed top-k by
    a hash-derived priority (Efraimidis–Spirakis A-Res with a
    DETERMINISTIC key: md5 of the doc id instead of rand()). Every row
    gets a pseudo-random priority that is a pure function of its id, the
    k smallest priorities per source win — statistically uniform over the
    id space, yet reproducible across runs, retries, AND engines, which
    rand()-based reservoirs are not.

    Scale shape: the window's top-k is computed with partial ranking in
    each map task before the shuffle (WindowGroupLimit pushes rk <= k
    down), so the exchange on source moves ~k rows per (source,
    partition), not the corpus. The emitted rank is part of the contract
    (rk = sample order), all columns integer/string."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= RESERVOIR_K)
    )


# Per-stratum deterministic sampling rates, expressed as a 4-hex-digit
# md5-prefix threshold (rate = threshold / 0x10000): BUILDING keeps ~25%,
# every other segment ~10%. Hex-string comparison is portable — md5 of
# the same key string is byte-identical across engines.
_STRATA_RATES: tuple[tuple[str, str], ...] = (
    ("BUILDING", "4000"),  # 0x4000 / 0x10000 = 25%
    ("*", "199a"),  # 0x199a / 0x10000 ≈ 10%
)


@register(
    "stratified_sample_mktsegment",
    oracle="""
    WITH tagged AS (
      SELECT c_mktsegment,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
             substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4)
               < (CASE WHEN c_mktsegment = 'BUILDING' THEN '4000' ELSE '199a' END)
               AS keep
      FROM customer
    )
    SELECT c_mktsegment,
           count(*) AS n_total,
           CAST(count(*) FILTER (keep) AS BIGINT) AS n_sampled,
           round(CAST(count(*) FILTER (keep) AS DOUBLE) / count(*), 6) AS achieved_rate,
           round(CAST(sum(bal) FILTER (keep) AS DOUBLE), 2) AS sampled_acctbal
    FROM tagged GROUP BY c_mktsegment
    """,
)
def stratified_sample_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-segment keep rates applied
    via an md5-prefix threshold on the row key — the retry-stable,
    engine-portable alternative to df.sampleBy (whose RNG stream is
    Spark-internal and could never be replayed by an oracle, and whose
    draw changes under task re-execution). Each stratum's rate is a hex
    threshold on the first 16 bits of md5(key): BUILDING keeps ~25%,
    the rest ~10% — the oversample-the-rare-stratum shape every training
    mixture uses. One pass, no sampling shuffle: the keep decision is a
    map-side predicate, and the report aggregates total vs sampled per
    stratum in the same bounded groupBy (conditional aggregates, not a
    second scan). Balances sum as exact decimal. Scale: hash-threshold
    sampling is embarrassingly parallel and reproducible across retries,
    cluster sizes, and engines — exactly how you cut a 100 TB corpus to
    a fixed-rate mixture without coordinating state."""
    c = load_table(spark, sf_dir, "customer")
    default_thr = dict(_STRATA_RATES)["*"]
    building_thr = dict(_STRATA_RATES)["BUILDING"]
    keep = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 4) < F.when(
        F.col("c_mktsegment") == "BUILDING", F.lit(building_thr)
    ).otherwise(F.lit(default_thr))
    tagged = c.select(
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        keep.alias("keep"),
    )
    return tagged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(F.col("keep")).alias("n_sampled"),
        F.round(
            F.count_if(F.col("keep")).cast("double") / F.count(F.lit(1)), 6
        ).alias("achieved_rate"),
        F.round(
            F.sum(F.when(F.col("keep"), F.col("bal"))).cast("double"), 2
        ).alias("sampled_acctbal"),
    )


@register(
    "zscore_doclen_by_source",
    oracle="""
    WITH stats AS (
      SELECT source,
             count(*) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source
    ),
    derived AS (
      SELECT source, n,
             CAST(s1 AS DOUBLE) / n AS mean,
             sqrt(CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS std
      FROM stats
    )
    SELECT d.doc_id, d.source, d.n_chars,
           round((d.n_chars - s.mean) / s.std, 4) AS len_zscore
    FROM documents d JOIN derived s ON d.source = s.source
    """,
)
def zscore_doclen_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature normalization (z-score): each document's length
    standardized against ITS SOURCE's mean/std — the per-domain
    normalization every mixed-corpus quality filter needs (a length that
    is ordinary for web text is an outlier for reference text). The
    population std derives from exact integer power sums (one bounded
    groupBy, order-independent), so both engines feed identical scalars
    into the identical sqrt/divide expression — no float accumulation
    anywhere. The stats table is group-cardinality-sized and broadcasts
    back onto the corpus: one scan for stats, one map-side join to
    score, the canonical two-pass normalize at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    ln = F.col("n_chars")
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ln).alias("s1"),
        F.sum(ln * ln).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    std = F.sqrt(F.col("s2").cast("double") / n - mean * mean)
    derived = stats.select(
        F.col("source").alias("src_dim"), mean.alias("mean"), std.alias("std")
    )
    return (
        docs.join(F.broadcast(derived), F.col("source") == F.col("src_dim"))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round((F.col("n_chars") - F.col("mean")) / F.col("std"), 4).alias(
                "len_zscore"
            ),
        )
    )


@register(
    "pipeline_stage_attrition",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, text FROM documents
      WHERE {_WS_TOKENS_SQL} >= {MIN_TOKENS}
        AND CAST({_DIGITS_SQL} AS DOUBLE) / greatest(length(text), 1)
              < {MAX_DIGIT_RATIO}
        AND length(text) > 0
    ),
    d AS (
      SELECT q.doc_id FROM q
      JOIN (SELECT md5(text) AS h, min(doc_id) AS keep FROM q GROUP BY md5(text)) m
        ON md5(q.text) = m.h AND q.doc_id = m.keep
    ),
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[^\\p{{L}}]+'), x -> len(x) > 0) AS ws
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
    ),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id < {N_EVAL_DOCS}),
    cont AS (
      SELECT sh.doc_id FROM sh JOIN ev ON ev.s = sh.s
      WHERE sh.doc_id >= {N_EVAL_DOCS}
      GROUP BY sh.doc_id HAVING count(*) >= 3
    ),
    dc AS (
      SELECT d.doc_id FROM d
      WHERE d.doc_id >= {N_EVAL_DOCS}
        AND NOT EXISTS (SELECT 1 FROM cont c WHERE c.doc_id = d.doc_id)
    ),
    tr AS (
      SELECT doc_id FROM dc
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '{_SPLIT_AT}'
    )
    SELECT CAST(1 AS BIGINT) AS stage, 'raw' AS stage_name,
           (SELECT count(*) FROM documents) AS docs_kept
    UNION ALL SELECT 2, 'quality', (SELECT count(*) FROM q)
    UNION ALL SELECT 3, 'dedup_exact', (SELECT count(*) FROM d)
    UNION ALL SELECT 4, 'decontaminated', (SELECT count(*) FROM dc)
    UNION ALL SELECT 5, 'train_split', (SELECT count(*) FROM tr)
    """,
)
def pipeline_stage_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE declarative plan, reported
    as per-stage attrition: raw → quality filter → exact dedup →
    benchmark decontamination → train split, with the surviving document
    count after each stage. This is the end-to-end composition a user of
    the reference engine chains five MapReduce jobs (and four
    materialized intermediates) to get; here Catalyst sees the whole
    lineage, fuses the filter into every scan, and the intermediates are
    never written anywhere.

    Stage semantics reuse the registered operators exactly (same
    predicates as quality_filter_chain, same md5 grouping as dedup_exact,
    same trigram overlap as decontaminate_against_eval, same hash split
    as train_test_split), so each stage's count is independently
    cross-checked by that operator's own oracle. Every stage boundary is
    keys-only (doc_id) after its decision — text never rides a shuffle
    past the stage that needed it.
    """
    from map_reduce_go_spark.operators.dedup import _shingles

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    digit_ratio = digits.cast("double") / F.greatest(F.length("text"), F.lit(1))
    q = docs.where(
        (n_tokens >= MIN_TOKENS)
        & (digit_ratio < MAX_DIGIT_RATIO)
        & (F.length("text") > 0)
    ).select("doc_id", "text")

    # ONE grouped aggregate serves stages 2 AND 3 (r16): the keeper of
    # each digest group IS min(doc_id) — the old q ⋈ keep join re-derived
    # exactly that set while re-evaluating q's regex filters two more
    # times — and stage 2's count is the sum of the group sizes. The
    # cached frame is (doc_id, n_copies) — keys and counts, never text:
    # at 100 TB it is ~1% of corpus bytes. (Tracked; released by the
    # harness after the action.)
    g = tracked_cache(
        q.groupBy(F.md5("text").alias("h")).agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
    d = g.select("doc_id")

    # Decontamination shingles DOCS, not the quality-filtered `q`, ON
    # PURPOSE: stage semantics must match the standalone
    # decontaminate_against_eval operator (whose eval set is drawn from
    # the raw corpus), so stage-4 counts compose with that query's
    # oracle. Shingling `q` would be cheaper but silently changes which
    # docs count as contaminated — don't "optimize" this.
    sh = _shingles(docs)
    ev = sh.where(F.col("doc_id") < N_EVAL_DOCS).select("s").distinct()
    cont = (
        sh.where(F.col("doc_id") >= N_EVAL_DOCS)
        .join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= 3)
        .select("doc_id")
    )
    dc = tracked_cache(
        d.where(F.col("doc_id") >= N_EVAL_DOCS).join(cont, "doc_id", "left_anti")
    )

    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    tr = dc.where(first_hex < _SPLIT_AT)

    def stage(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("docs_kept")).select(
            F.lit(no).cast("long").alias("stage"),
            F.lit(name).alias("stage_name"),
            "docs_kept",
        )

    # Stage 2's count from the cached digest aggregate (Σ group sizes =
    # |q|), not from a fresh q pass — one regex evaluation of the quality
    # predicates total.
    # coalesce: sum() is NULL (not 0) on an empty/degenerate corpus,
    # diverging from the oracle's count(*) = 0 (ADVICE r16).
    stage2 = g.agg(
        F.coalesce(F.sum("n_copies"), F.lit(0)).alias("docs_kept")
    ).select(
        F.lit(2).cast("long").alias("stage"),
        F.lit("quality").alias("stage_name"),
        F.col("docs_kept").cast("long").alias("docs_kept"),
    )
    out = stage(1, "raw", docs).unionAll(stage2)
    for no, name, df in (
        (3, "dedup_exact", d),
        (4, "decontaminated", dc),
        (5, "train_split", tr),
    ):
        out = out.unionAll(stage(no, name, df))
    return out


@register(
    "token_mixture_temperature",
    oracle=rf"""
    WITH tok AS (
      SELECT source,
             CAST(sum({_WS_TOKENS_SQL}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    sc AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS sqrt_scaled
      FROM tok
    )
    SELECT source, n_tokens, sqrt_scaled,
           round(CAST(sqrt_scaled AS DOUBLE)
                 / (SELECT CAST(sum(sqrt_scaled) AS DOUBLE) FROM sc), 6)
             AS temp_weight
    FROM sc
    """,
)
def token_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (T=2): each source sampled
    proportionally to sqrt(its token count) — the standard
    tail-upweighting between proportional (T=1) and uniform (T=∞)
    mixing for multi-source pretraining corpora.

    Cross-engine float discipline: sqrt is the ONE transcendental that
    IEEE 754 requires correctly rounded, so sqrt(tokens) is bit-identical
    everywhere; it is then immediately quantized to an integer
    (floor(·×10⁶)) so the normalizing SUM is exact integer arithmetic —
    no float accumulation whose order could differ between engines. (A
    general-T version needs pow(), which libms round differently; T=2 is
    the deterministic member of the family, and the quantization recipe
    extends to any T once weights come from a single-rounding op.)
    One token-counting aggregate, then a source-cardinality broadcast —
    costs what a count costs at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    tok = docs.groupBy("source").agg(F.sum(toks).cast("long").alias("n_tokens"))
    sc = tok.select(
        "source",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000)
        .cast("long")
        .alias("sqrt_scaled"),
    )
    total = sc.agg(F.sum("sqrt_scaled").cast("double").alias("tot"))
    return sc.crossJoin(F.broadcast(total)).select(
        "source",
        "n_tokens",
        "sqrt_scaled",
        F.round(F.col("sqrt_scaled").cast("double") / F.col("tot"), 6).alias(
            "temp_weight"
        ),
    )


@register(
    "dedup_token_attrition_by_source",
    oracle=f"""
    WITH keep AS (
      SELECT md5(text) AS h, min(doc_id) AS keep_id
      FROM documents GROUP BY md5(text)
    ),
    tagged AS (
      SELECT d.source,
             {_WS_TOKENS_SQL} AS n_tok,
             CASE WHEN k.keep_id = d.doc_id THEN 1 ELSE 0 END AS kept
      FROM documents d JOIN keep k ON md5(d.text) = k.h
    )
    SELECT source,
           count(*) AS docs_before,
           CAST(sum(kept) AS BIGINT) AS docs_after,
           CAST(sum(n_tok) AS BIGINT) AS tokens_before,
           CAST(sum(CASE WHEN kept = 1 THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_after,
           CAST(floor(1000000.0 * (sum(n_tok) - sum(CASE WHEN kept = 1 THEN n_tok ELSE 0 END))
                / sum(n_tok)) AS BIGINT) AS tokens_removed_ppm
    FROM tagged GROUP BY source
    """,
)
def dedup_token_attrition_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What exact dedup COSTS each source, measured in the unit the
    training run actually consumes — tokens: per source, docs and tokens
    before/after keep-lowest-doc_id exact dedup, and the removed-token
    ppm. A mixture plan built on pre-dedup token counts
    (token_mixture_planner) silently over-weights the most duplicated
    source; this report is the correction input, and its keep rule is
    identical to dedup_exact's, so the two compose.

    One digest groupBy (md5 shuffles as fixed 32-char keys, never text),
    one join back on the digest — size-chosen side, no hint: broadcast
    while the digest frame fits, shuffle join on the digest at corpus
    scale — and one source-cardinality rollup.
    Counts are integers; the ppm is a floor at emission.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    keep = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    tagged = docs.join(keep, F.md5(docs["text"]) == keep["h"]).select(
        "source",
        n_tok.alias("n_tok"),
        F.when(F.col("keep_id") == F.col("doc_id"), 1).otherwise(0).alias("kept"),
    )
    kept_tok = F.sum(F.when(F.col("kept") == 1, F.col("n_tok")).otherwise(0))
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_before"),
        F.sum("kept").cast("long").alias("docs_after"),
        F.sum("n_tok").cast("long").alias("tokens_before"),
        kept_tok.cast("long").alias("tokens_after"),
        F.floor(
            F.lit(1000000.0)
            * (F.sum("n_tok") - kept_tok)
            / F.sum("n_tok")
        )
        .cast("long")
        .alias("tokens_removed_ppm"),
    )


# Negative-sampling knobs, shared with the oracle as literals.
NEG_SEED = 7
NEG_ORDER_MOD = 10  # keep ~1/10 of orders
NEG_CANDIDATES = 6  # hash draws per order
NEG_K = 3  # negatives kept per order


@register(
    "negative_sampling_per_order",
    oracle=f"""
    WITH mx AS (SELECT max(p_partkey) AS m FROM part),
    sampled AS (
      SELECT o_orderkey FROM orders
      WHERE CAST('0x' || substring(md5('neg|' || CAST(o_orderkey AS VARCHAR)
                 || '|{NEG_SEED}'), 1, 8) AS BIGINT) % {NEG_ORDER_MOD} = 0
    ),
    cand AS (
      SELECT s.o_orderkey, g.i,
             1 + CAST('0x' || substring(md5('negc|' || CAST(s.o_orderkey AS VARCHAR)
                   || '|' || CAST(g.i AS VARCHAR)), 1, 8) AS BIGINT)
                 % (SELECT m FROM mx) AS cand_pk
      FROM sampled s, generate_series(1, {NEG_CANDIDATES}) AS g(i)
    ),
    kept AS (
      SELECT c.o_orderkey, c.cand_pk, min(c.i) AS min_i
      FROM cand c
      LEFT JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) p
        ON p.l_orderkey = c.o_orderkey AND p.l_partkey = c.cand_pk
      WHERE p.l_orderkey IS NULL
      GROUP BY c.o_orderkey, c.cand_pk
    )
    SELECT o_orderkey, neg_rank, neg_partkey FROM (
      SELECT o_orderkey, cand_pk AS neg_partkey,
             CAST(row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY min_i, cand_pk) AS BIGINT)
               AS neg_rank
      FROM kept
    ) WHERE neg_rank <= {NEG_K}
    """,
)
def negative_sampling_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender/contrastive
    training: for a 1-in-10 hash-sampled slice of orders, draw 6
    hash-derived candidate parts, drop any the order actually contains
    (the anti-join makes them TRUE negatives), and keep the first 3 by
    draw index. Engine RNG would make the sample irreproducible across
    runs and partitionings; the md5 draws make it a pure function of
    (order, draw index), so retries, backfills and the oracle all see
    the same negatives.

    Scale shape: candidates are 6 rows per sampled order (map-side
    generate + hash, no part-table cross join); the membership check is
    ONE hash join co-keyed on orderkey against the (orderkey, partkey)
    projection of lineitem; the per-order top-3 window partitions on
    orderkey (bounded ≤6 rows per group). The max-partkey scalar is the
    only collected state.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    mx = part.agg(F.max("p_partkey").alias("m"))
    keep = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("neg"), F.col("o_orderkey").cast("string"), F.lit(str(NEG_SEED))
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % NEG_ORDER_MOD
        == 0
    )
    sampled = o.where(keep).select("o_orderkey")
    cand = (
        sampled.crossJoin(F.broadcast(mx))
        .select(
            "o_orderkey",
            F.explode(F.sequence(F.lit(1), F.lit(NEG_CANDIDATES))).alias("i"),
            "m",
        )
        .select(
            "o_orderkey",
            "i",
            (
                1
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.lit("negc"),
                                F.col("o_orderkey").cast("string"),
                                F.col("i").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("m")
            ).alias("cand_pk"),
        )
    )
    purchased = li.select(
        F.col("l_orderkey").alias("o_orderkey"), F.col("l_partkey").alias("cand_pk")
    ).distinct()
    kept = (
        cand.join(purchased, ["o_orderkey", "cand_pk"], "left_anti")
        .groupBy("o_orderkey", "cand_pk")
        .agg(F.min("i").alias("min_i"))
    )
    w = Window.partitionBy("o_orderkey").orderBy("min_i", "cand_pk")
    return (
        kept.select(
            "o_orderkey",
            F.col("cand_pk").alias("neg_partkey"),
            F.row_number().over(w).cast("long").alias("neg_rank"),
        )
        .where(F.col("neg_rank") <= NEG_K)
        .select("o_orderkey", "neg_rank", "neg_partkey")
    )


@register(
    "quantile_normalization_doclen",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r
      FROM documents
    ),
    target AS (
      SELECT r, CAST(sum(n_chars) // count(*) AS BIGINT) AS norm_chars
      FROM ranked GROUP BY r
    )
    SELECT ranked.source, ranked.doc_id, ranked.n_chars, target.norm_chars
    FROM ranked JOIN target ON target.r = ranked.r
    """,
)
def quantile_normalization_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources (the
    bioinformatics technique applied to corpus features): rank docs
    within each source, then replace each doc's length with the
    across-source mean length AT ITS RANK — afterwards every source has
    the identical length distribution, so a length-based curriculum or
    filter treats sources impartially.

    One shuffle ranks within source (sources are independent window
    partitions — parallel, never global); the rank-target table is a
    rank-cardinality rollup; the final join is co-keyed on rank. Target
    means are integer floor-div. Assumes equal per-source depth (true
    for the fixture). Ragged sources: no row is ever dropped — deeper
    sources keep their overhang rows, whose rank-mean simply averages
    over the fewer sources that reach that depth (both the window form
    below and the oracle behave this way). The fix for ragged inputs is
    ntile to a common grid before ranking, not a row-drop.
    """
    docs = load_table(spark, sf_dir, "documents")
    ranked = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("r"),
    )
    # Rank-target means as a WINDOW over rank, not a groupBy + join-back:
    # the join form re-plans the ranked subtree twice (plan-audited — 2
    # scans); the window form is one scan, one extra exchange on r.
    return ranked.select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(
            "sum(n_chars) OVER (PARTITION BY r) div count(*) OVER (PARTITION BY r)"
        ).alias("norm_chars"),
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@register(
    "doc_chunking_fixed_tokens",
    oracle=rf"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[^\p{{L}}]+'),
                         x -> len(x) > 0) AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(s // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(least(s + {CHUNK_TOKENS}, len(toks)) - s AS BIGINT) AS n_tokens,
           toks[s + 1] AS first_token,
           toks[least(s + {CHUNK_TOKENS}, len(toks))] AS last_token
    FROM (
      SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS s
      FROM ws WHERE len(toks) > 0
    ) t
    WHERE s = 0 OR s < len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}
    """,
)
def doc_chunking_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-window splitter a
    RAG indexer or a fixed-sequence-length training pipeline runs over
    every document: chunks of {CHUNK_TOKENS} tokens starting every
    {CHUNK_STRIDE} (i.e. {CHUNK_TOKENS - CHUNK_STRIDE}-token overlap),
    the final chunk truncated at the document end. A start whose chunk
    would be wholly contained in the previous chunk (s > 0 and the
    previous chunk already reaches the document end, i.e.
    s >= n - ({CHUNK_TOKENS} - {CHUNK_STRIDE})) is not emitted — a real
    RAG indexer never emits a fully redundant chunk. Emits per chunk its
    index, token count, and boundary tokens (the metadata a chunk store
    carries; the chunk text itself would be a slice() of the same array).

    Scale shape: pure map-side — tokenize once per doc, explode a
    sequence of chunk starts (~n_tokens/{CHUNK_STRIDE} rows per doc,
    linear in corpus size), no shuffle at all until a downstream
    aggregation. At 100 TB this runs as one codegen'd scan-project pass;
    the explode factor is bounded by document length over stride, so
    output size tracks token count, not doc count.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id",
        F.filter(
            F.split(F.col("text"), r"[^\p{L}]+"), lambda x: F.length(x) > 0
        ).alias("toks"),
    ).where(F.size("toks") > 0)
    chunks = ws.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(CHUNK_STRIDE))
        ).alias("s"),
    ).where(
        (F.col("s") == 0)
        | (F.col("s") < F.size("toks") - (CHUNK_TOKENS - CHUNK_STRIDE))
    )
    return chunks.select(
        "doc_id",
        F.expr(f"CAST(s div {CHUNK_STRIDE} AS INT)").alias("chunk_idx"),
        (F.least(F.col("s") + CHUNK_TOKENS, F.size("toks")) - F.col("s"))
        .cast("long")
        .alias("n_tokens"),
        F.element_at("toks", F.col("s") + 1).alias("first_token"),
        F.element_at(
            "toks", F.least(F.col("s") + CHUNK_TOKENS, F.size("toks"))
        ).alias("last_token"),
    )


MIXTURE_TAU = 0.3


@register(
    "mixture_temperature_weights",
    oracle=rf"""
    WITH per_lang AS (
      SELECT lang,
             CAST(sum(len(list_filter(string_split_regex(text, '[^\p{{L}}]+'),
                                      x -> len(x) > 0))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
             sum(pow(CAST(n_tokens AS DOUBLE), {MIXTURE_TAU})) AS z
      FROM per_lang
    )
    SELECT p.lang,
           p.n_tokens,
           CAST(1000000 * p.n_tokens // t.total AS BIGINT) AS natural_ppm,
           round(pow(CAST(p.n_tokens AS DOUBLE), {MIXTURE_TAU}) / t.z, 6)
             AS temp_weight
    FROM per_lang p, tot t
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mixture sampling weights (the mT5 /
    multilingual-pretraining recipe): raw per-language token mass p_i is
    flattened to w_i ∝ p_i^τ (τ={MIXTURE_TAU}), boosting low-resource
    languages without letting any dominate. Emits each language's token
    count, natural share (exact integer ppm), and normalized temperature
    weight — the numbers a data-mixture config is built from.

    p_i^τ / Σ p_j^τ is computed as n_i^τ / Σ n_j^τ (the 1/N^τ factor
    cancels in the normalization), keeping the pow() argument an exact
    integer on both engines.

    Scale shape: token counting is map-side (size of the split array —
    no explode), the per-language rollup is a map-side-combinable sum to
    ≤ |languages| rows, and the normalizer is ONE broadcast scalar row.
    The fact table is scanned once; everything after is metadata-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    # The per-language rollup feeds the normalizer AND the final select;
    # cache the (<=|languages|)-row rollup so the corpus is tokenized
    # exactly once (scan-count audited).
    per_lang = tracked_cache(
        docs.select(
            "lang",
            F.size(
                F.filter(
                    F.split(F.col("text"), r"[^\p{L}]+"),
                    lambda x: F.length(x) > 0,
                )
            ).alias("toks"),
        )
        .groupBy("lang")
        .agg(F.sum("toks").cast("long").alias("n_tokens"))
    )
    tot = per_lang.agg(
        F.sum("n_tokens").cast("long").alias("total"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(MIXTURE_TAU))).alias(
            "z"
        ),
    )
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        F.expr("CAST(1000000 * n_tokens div total AS BIGINT)").alias(
            "natural_ppm"
        ),
        F.round(
            F.pow(F.col("n_tokens").cast("double"), F.lit(MIXTURE_TAU))
            / F.col("z"),
            6,
        ).alias("temp_weight"),
    )


CDC_WINDOW = 8    # bytes hashed per boundary test
CDC_DIVISOR = 64  # P(boundary) per position = 1/64 -> ~64-char chunks


@register(
    "cdc_chunk_stats",
    oracle=f"""
    WITH bounds AS (
      SELECT doc_id, n_chars,
             CAST(coalesce(sum(CASE WHEN
               CAST('0x' || substring(md5(substring(text, i - {CDC_WINDOW - 1}, {CDC_WINDOW})), 1, 8) AS BIGINT)
               % {CDC_DIVISOR} = 0 AND i < n_chars THEN 1 END), 0) AS BIGINT)
               AS n_boundaries
      FROM documents, LATERAL unnest(generate_series({CDC_WINDOW},
                                     CAST(n_chars AS BIGINT))) t(i)
      WHERE n_chars >= {CDC_WINDOW}
      GROUP BY doc_id, n_chars
    )
    SELECT doc_id,
           n_boundaries,
           n_boundaries + 1 AS n_chunks,
           CAST(n_chars // (n_boundaries + 1) AS BIGINT) AS mean_chunk_chars
    FROM bounds
    """,
)
def cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync idea): chunk
    boundaries where the hash of the trailing {CDC_WINDOW}-byte window
    ≡ 0 mod {CDC_DIVISOR}, giving ~{CDC_DIVISOR}-char expected chunks
    whose boundaries are CONTENT-anchored — insert one byte early in a
    document and every downstream chunk boundary still lands on the
    same content, so chunk-level dedup keeps matching (fixed-stride
    chunking loses every boundary after an edit; that is the entire
    point of CDC). Emits per-doc boundary/chunk counts and mean chunk
    size — the dedup-planning statistics.

    Cross-engine determinism: the boundary predicate is the repo's md5
    idiom (first 8 hex chars as an integer) over the identical 1-indexed
    substring on both engines — pure integer arithmetic, no rolling
    state to replicate. A trailing boundary at the document end is not
    counted (it would split off an empty chunk).

    Scale shape: one position explode (~n_chars rows per doc — linear in
    corpus BYTES, the honest cost of per-byte chunking) feeding a
    map-side-combinable count; no shuffle beyond the per-doc rollup. At
    100 TB this runs as Arrow-batched mapInPandas with an actual gear
    rolling hash (O(1)/byte instead of O(window)); the declarative form
    here is the oracle-checkable semantics of the same boundary rule.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars") >= CDC_WINDOW
    )
    pos = docs.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.sequence(F.lit(CDC_WINDOW), F.col("n_chars").cast("long"))
        ).alias("i"),
        F.col("text"),
    )
    window_hash = F.expr(
        f"CAST(conv(substring(md5(substring(text, i - {CDC_WINDOW - 1},"
        f" {CDC_WINDOW})), 1, 8), 16, 10) AS BIGINT)"
    )
    is_boundary = (window_hash % CDC_DIVISOR == 0) & (
        F.col("i") < F.col("n_chars")
    )
    bounds = pos.groupBy("doc_id", "n_chars").agg(
        F.coalesce(F.sum(F.when(is_boundary, 1)), F.lit(0))
        .cast("long")
        .alias("n_boundaries")
    )
    return bounds.select(
        "doc_id",
        "n_boundaries",
        (F.col("n_boundaries") + 1).alias("n_chunks"),
        F.expr("CAST(n_chars div (n_boundaries + 1) AS BIGINT)").alias(
            "mean_chunk_chars"
        ),
    )


# Gear CDC: the O(1)/byte production path for content-defined chunking
# (VERDICT r8/r9 brief: cdc_chunk_stats' md5 form is O(window) per byte).
# The hash is a WINDOWED gear: h_i = sum_{j=0}^{W-1} G[c_{i-j}] * 2^j,
# an exact function of the trailing W characters — so it rolls in O(1)
# (h_i = (h_{i-1} << 1) + G[c_i] - (G[c_{i-W}] << W)) AND replays
# declaratively (per-position weighted sum), unlike the classic
# unbounded-prefix gear whose state never expires exactly. G values are
# 52-bit (13 md5 hex chars): the largest possible h is 8 * 2^52 * 2^7 =
# 2^62, inside signed 64-bit on both engines — all-integer, no modular
# wraparound to replicate.
GEAR_BITS_HEX = 13  # 52-bit gear table entries


def _gear_val(ch: str) -> int:
    import hashlib as _hl

    return int(_hl.md5(ch.encode("utf-8")).hexdigest()[:GEAR_BITS_HEX], 16)


def gear_boundary_counts(docs: DataFrame, w: int = CDC_WINDOW, divisor: int = CDC_DIVISOR) -> DataFrame:
    """Per-doc content-defined boundary counts via the windowed gear hash,
    Arrow-batched: amortized O(1) work per character (w vectorized adds
    across the whole document — the SIMD form of the rolling recurrence;
    `tests/test_llm_ops.py` pins recurrence ≡ windowed-sum). No per-byte
    md5, no position explode: the corpus stays one row per document into
    the kernel and one row per document out — at 100 TB this is a pure
    scan-bound map with zero shuffle."""

    def batches(it):
        import numpy as np
        import pandas as pd

        gear: dict[int, int] = {}

        def gvals(uniq: "np.ndarray") -> "np.ndarray":
            out = np.empty(len(uniq), dtype=np.int64)
            for k, cp in enumerate(uniq):
                cp = int(cp)
                if cp not in gear:
                    gear[cp] = _gear_val(chr(cp))
                out[k] = gear[cp]
            return out

        for pdf in it:
            rows = {"doc_id": [], "n_chars": [], "n_boundaries": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                if n < w:
                    continue
                cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
                uniq, inv = np.unique(cp, return_inverse=True)
                g = gvals(uniq)[inv]
                # h over every trailing window: w shifted vectorized adds.
                acc = np.zeros(n - w + 1, dtype=np.int64)
                for j in range(w):
                    acc += g[w - 1 - j : n - j] << j
                # acc[k] is h at 1-indexed position i = k + w; a boundary
                # at the final position is not counted (empty chunk).
                hits = (acc % divisor) == 0
                if len(hits):
                    hits[-1] = False
                rows["doc_id"].append(int(doc_id))
                rows["n_chars"].append(n)
                rows["n_boundaries"].append(int(hits.sum()))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        batches, schema="doc_id long, n_chars long, n_boundaries long"
    )


@register(
    "cdc_gear_chunk_stats",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id, n_chars, i,
             CAST('0x' || substring(md5(substring(text, CAST(i - j AS BIGINT), 1)),
                                    1, {GEAR_BITS_HEX}) AS BIGINT) << j AS term
      FROM documents,
           LATERAL unnest(generate_series({CDC_WINDOW}, CAST(n_chars AS BIGINT))) t(i),
           LATERAL unnest(generate_series(0, {CDC_WINDOW - 1})) u(j)
      WHERE n_chars >= {CDC_WINDOW}
    ),
    h AS (
      SELECT doc_id, n_chars, i, sum(term) AS h
      FROM terms GROUP BY doc_id, n_chars, i
    ),
    bounds AS (
      SELECT doc_id, n_chars,
             CAST(coalesce(sum(CASE WHEN h % {CDC_DIVISOR} = 0
                                    AND i < n_chars THEN 1 END), 0) AS BIGINT)
               AS n_boundaries
      FROM h GROUP BY doc_id, n_chars
    )
    SELECT doc_id,
           n_boundaries,
           n_boundaries + 1 AS n_chunks,
           CAST(n_chars // (n_boundaries + 1) AS BIGINT) AS mean_chunk_chars
    FROM bounds
    """,
)
def cdc_gear_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking on the GEAR path: same output contract as
    `cdc_chunk_stats` (per-doc boundary/chunk counts, mean chunk size)
    but the boundary hash is the windowed gear — a 52-bit table lookup
    plus shift-adds per character instead of an md5 per position. The
    hash is an exact integer function of the trailing {CDC_WINDOW}-char
    window, so the DuckDB oracle replays it position-by-position as a
    weighted sum while the Spark kernel computes it vectorized; both
    sides are all-integer and boundary-identical by construction.

    Boundaries are content-anchored exactly as in `cdc_chunk_stats`: a
    one-byte insertion shifts which positions are boundaries but not
    which CONTENT the boundaries land on, so chunk-level dedup keeps
    matching across edits.

    Scale shape: zero explode, zero shuffle before the (already per-doc)
    kernel output — corpus bytes stream through Arrow once. The md5 form
    scans ~n_chars x {CDC_WINDOW} hash evaluations; this path does
    ~n_chars shift-adds (SCALE.md records the measured win)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars") >= CDC_WINDOW
    )
    out = gear_boundary_counts(docs.select("doc_id", "text"))
    return out.select(
        "doc_id",
        "n_boundaries",
        (F.col("n_boundaries") + 1).alias("n_chunks"),
        F.expr("CAST(n_chars div (n_boundaries + 1) AS BIGINT)").alias(
            "mean_chunk_chars"
        ),
    )


def gear_chunks(docs: DataFrame, w: int = CDC_WINDOW, divisor: int = CDC_DIVISOR) -> DataFrame:
    """Explode each document into its content-defined chunks (gear
    boundaries) with a per-chunk content digest — the unit of chunk-level
    dedup. One Arrow pass: boundaries via the windowed gear (see
    :func:`gear_boundary_counts`), chunk digests via the md5 idiom on the
    chunk text. Emits (doc_id, source, chunk_idx, chunk_chars, dig);
    expected chunk count is n_chars/{CDC_DIVISOR} per doc, so the fanout
    is corpus-bytes/64 rows — the honest unit count any chunk store
    carries."""

    def batches(it):
        import hashlib
        import numpy as np
        import pandas as pd

        gear: dict[int, int] = {}

        def gvals(uniq: "np.ndarray") -> "np.ndarray":
            out = np.empty(len(uniq), dtype=np.int64)
            for k, cp in enumerate(uniq):
                cp = int(cp)
                if cp not in gear:
                    gear[cp] = _gear_val(chr(cp))
                out[k] = gear[cp]
            return out

        for pdf in it:
            rows = {
                "doc_id": [],
                "source": [],
                "chunk_idx": [],
                "chunk_chars": [],
                "dig": [],
            }
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                n = len(text)
                if n < w:
                    continue
                cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
                uniq, inv = np.unique(cp, return_inverse=True)
                g = gvals(uniq)[inv]
                acc = np.zeros(n - w + 1, dtype=np.int64)
                for j in range(w):
                    acc += g[w - 1 - j : n - j] << j
                cuts = [
                    k + w
                    for k in np.nonzero(acc % divisor == 0)[0].tolist()
                    if k + w < n
                ] + [n]
                s = 0
                for ci, e in enumerate(cuts):
                    chunk = text[s:e]
                    rows["doc_id"].append(int(doc_id))
                    rows["source"].append(source)
                    rows["chunk_idx"].append(ci)
                    rows["chunk_chars"].append(e - s)
                    rows["dig"].append(
                        int(
                            hashlib.md5(chunk.encode("utf-8")).hexdigest()[:8],
                            16,
                        )
                    )
                    s = e
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        batches,
        schema="doc_id long, source string, chunk_idx int, chunk_chars long, dig long",
    )


@register(
    "cdc_chunk_dedup",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id, n_chars, i,
             CAST('0x' || substring(md5(substring(text, CAST(i - j AS BIGINT), 1)),
                                    1, {GEAR_BITS_HEX}) AS BIGINT) << j AS term
      FROM documents,
           LATERAL unnest(generate_series({CDC_WINDOW}, CAST(n_chars AS BIGINT))) t(i),
           LATERAL unnest(generate_series(0, {CDC_WINDOW - 1})) u(j)
      WHERE n_chars >= {CDC_WINDOW}
    ),
    h AS (
      SELECT doc_id, n_chars, i, sum(term) AS h
      FROM terms GROUP BY doc_id, n_chars, i
    ),
    bounds AS (
      SELECT doc_id, i FROM h WHERE h % {CDC_DIVISOR} = 0 AND i < n_chars
      UNION ALL
      SELECT doc_id, CAST(n_chars AS BIGINT) AS i FROM documents
      WHERE n_chars >= {CDC_WINDOW}
    ),
    marks AS (
      SELECT doc_id, i AS e,
             lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS s
      FROM bounds
    ),
    chunks AS (
      SELECT d.doc_id, d.source, m.e - m.s AS clen,
             CAST('0x' || substring(
               md5(substring(d.text, CAST(m.s + 1 AS BIGINT),
                             CAST(m.e - m.s AS BIGINT))), 1, 8) AS BIGINT) AS dig
      FROM marks m JOIN documents d USING (doc_id)
    ),
    freq AS (SELECT dig, count(*) AS cnt FROM chunks GROUP BY dig)
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(c.clen) AS BIGINT) AS n_chars,
           CAST(coalesce(sum(CASE WHEN f.cnt > 1 THEN 1 END), 0) AS BIGINT)
             AS dup_chunks,
           CAST(coalesce(sum(CASE WHEN f.cnt > 1 THEN c.clen END), 0) AS BIGINT)
             AS dup_chars,
           CAST(1000000 * coalesce(sum(CASE WHEN f.cnt > 1 THEN c.clen END), 0)
                // sum(c.clen) AS BIGINT) AS dup_char_ppm
    FROM chunks c JOIN freq f ON f.dig = c.dig
    GROUP BY c.source
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup planning — the reason CDC exists: split every
    document at content-defined gear boundaries, digest each chunk, and
    report per source how much chunk mass is DUPLICATED elsewhere in the
    corpus (a chunk is duplicate if its digest occurs >1 time globally,
    including within one document). dup_char_ppm is the integer-exact
    share of characters a chunk store would not re-store — the number a
    storage/transfer-savings estimate starts from, robust to edits
    because the boundaries are content-anchored.

    Scale shape: the chunk explode is corpus-bytes/{CDC_DIVISOR} rows of
    (digest, chars, source); the frequency rollup and the join back are
    both keyed on the digest — co-partitioned, digest-only shuffles (the
    dedup_exact discipline: no text ever shuffles); the output is a
    ≤|sources|-row rollup. The digest frequency table feeds one join, so
    the chunk frame is cached rather than re-exploded."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars") >= CDC_WINDOW
    )
    chunks = tracked_cache(
        gear_chunks(docs.select("doc_id", "source", "text"))
    )
    freq = chunks.groupBy("dig").agg(F.count(F.lit(1)).alias("cnt"))
    dup = F.col("cnt") > 1
    return (
        chunks.join(freq, "dig")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("chunk_chars").cast("long").alias("n_chars"),
            F.coalesce(F.sum(F.when(dup, 1)), F.lit(0))
            .cast("long")
            .alias("dup_chunks"),
            F.coalesce(F.sum(F.when(dup, F.col("chunk_chars"))), F.lit(0))
            .cast("long")
            .alias("dup_chars"),
        )
        .select(
            "source",
            "n_chunks",
            "n_chars",
            "dup_chunks",
            "dup_chars",
            F.expr("CAST(1000000 * dup_chars div n_chars AS BIGINT)").alias(
                "dup_char_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# Feature hashing (the "hashing trick") — fixed-dimension featurization
# --------------------------------------------------------------------------

#: Hashed feature dimension. Small enough that the per-doc vector state is
#: trivially bounded, large enough that the fixture vocabulary collides —
#: the property the signed-sum construction exists to absorb.
FEATURE_HASH_DIM = 64


@register(
    "feature_hashing_vectorize",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT)
               % {FEATURE_HASH_DIM} AS bucket,
             CASE WHEN substring(md5(tok), 9, 1) < '8'
                  THEN 1 ELSE -1 END AS sgn
      FROM toks
    ),
    vec AS (
      SELECT doc_id, bucket,
             CAST(sum(sgn) AS BIGINT) AS v,
             count(*) AS cnt
      FROM h GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) FILTER (WHERE v <> 0) AS BIGINT) AS nnz,
           CAST(sum(abs(v)) AS BIGINT) AS l1_norm,
           CAST(sum(v * v) AS BIGINT) AS sq_norm,
           CAST(sum(cnt) AS BIGINT) AS n_tokens
    FROM vec GROUP BY doc_id
    """,
)
def feature_hashing_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009): every token
    maps to one of FEATURE_HASH_DIM buckets by content hash, with a
    second hash bit choosing the sign, so collisions cancel in
    expectation instead of biasing the bucket upward. The output is the
    per-document sparse-vector summary a downstream trainer's feature
    audit would read: nonzero count, L1 norm, squared L2 norm, token
    count — all integers, so the cross-engine hash is exact.

    The 100 TB shape: bucket and sign are codegen'd column expressions
    on the exploded tokens (the one corpus-sized pass), then two
    map-side-combinable aggregates — (doc, bucket) signed sums whose
    shuffle moves at most FEATURE_HASH_DIM rows per doc, then the per-doc
    rollup keyed on doc_id. No vocabulary state anywhere: unlike a
    dictionary vectorizer there is no driver-side vocab build, which is
    exactly why the hashing trick is the featurizer that survives
    web-scale vocabularies. The md5-slice construction (first 8 hex
    chars -> bucket, 9th -> sign) matches lexicographically in DuckDB,
    making the oracle bit-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)
        ).alias("tok"),
    )
    bucket = F.expr(
        f"CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)"
        f" % {FEATURE_HASH_DIM}"
    ).alias("bucket")
    sgn = F.when(F.substring(F.md5("tok"), 9, 1) < "8", 1).otherwise(-1)
    vec = toks.groupBy("doc_id", bucket).agg(
        F.sum(sgn).cast("long").alias("v"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return vec.groupBy("doc_id").agg(
        F.count(F.when(F.col("v") != 0, 1)).cast("long").alias("nnz"),
        F.sum(F.abs("v")).cast("long").alias("l1_norm"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("sq_norm"),
        F.sum("cnt").cast("long").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# Linear classifier inference + calibration audit
# --------------------------------------------------------------------------

# Hashed-token linear model (the fastText-/CCNet-style quality-classifier
# shape): every token hashes to one of CLS_DIM weight slots; the weight
# itself is a deterministic integer derived from the slot id (Knuth
# multiplicative hash into [-1000, 1000] milli-units), standing in for a
# trained coefficient vector. Deterministic weights keep the whole
# inference pass integer-exact cross-engine while exercising the real
# production dataflow: explode -> hash -> weight-lookup-free scoring ->
# per-doc sum. A trained model swaps the weight EXPRESSION for a broadcast
# map lookup; nothing else changes.
CLS_DIM = 1024
_CLS_MULT = 2654435761  # Knuth 2^32 / phi


def _cls_weight_sql(tok: str) -> str:
    """Integer milli-weight of a token's hash slot (DuckDB form)."""
    return (
        f"(CAST('0x' || substring(md5({tok}), 1, 8) AS BIGINT) % {CLS_DIM})"
        f" * {_CLS_MULT} % 2001 - 1000"
    )


_CLS_SCORES_CTE = f"""
    cls_scores AS (
      SELECT doc_id, lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum({_cls_weight_sql("tok")}) AS BIGINT) AS raw_score
      FROM (
        SELECT doc_id, lang, unnest(regexp_extract_all(text, '\\S+')) AS tok
        FROM documents
      ) GROUP BY doc_id, lang
      HAVING count(*) > 0
    )"""

# prob = sigmoid(raw / (250 * sqrt(n_tokens))): the sqrt normalization is
# the variance-stabilizing scale (raw is a sum of n zero-mean weights, so
# its sd grows as sqrt(n)); 250 milli-units sets the logit spread to ~2.3.
_CLS_PROB_SQL = (
    "round(1.0 / (1.0 + exp(-(CAST(raw_score AS DOUBLE)"
    " / (250.0 * sqrt(CAST(n_tokens AS DOUBLE)))))), 6)"
)


def cls_row_scores(docs: DataFrame) -> DataFrame:
    """STATELESS per-row classifier scoring: (doc_id, lang, n_tokens,
    raw_score) computed as one higher-order ``aggregate`` fold over the
    token array — no explode, no groupBy, hence directly streamable
    (append mode, zero state) for online ingest filtering. Produces the
    exact same BIGINT raw_score as :func:`_cls_doc_scores` (pinned by
    test): the batch form trades the HOF's interpreted per-token loop
    for codegen'd explode+combine throughput, the row form trades
    throughput for statelessness — same function, two physical shapes.
    """
    toks = r"regexp_extract_all(text, '\\S+', 0)"
    w = (
        f"(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % {CLS_DIM})"
        f" * {_CLS_MULT} % 2001 - 1000"
    )
    return docs.select(
        "doc_id",
        "lang",
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"aggregate({toks}, CAST(0 AS BIGINT), (acc, t) -> acc + ({w}))")
        .cast("long")
        .alias("raw_score"),
    ).where(F.col("n_tokens") > 0)


def _cls_doc_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_tokens, raw_score): one corpus pass — explode to
    tokens, score each with the codegen'd hash-weight expression, one
    map-side-combinable per-doc sum. No vocabulary or model state beyond
    the two literals, so the plan is a pure scan+agg at any corpus size."""
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias("tok"),
    )
    w = F.expr(
        f"(CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % {CLS_DIM})"
        f" * {_CLS_MULT} % 2001 - 1000"
    )
    return (
        toks.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(w).cast("long").alias("raw_score"),
        )
        .where(F.col("n_tokens") > 0)
    )


def _cls_prob_col() -> "F.Column":
    return F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(
                -(
                    F.col("raw_score").cast("double")
                    / (F.lit(250.0) * F.sqrt(F.col("n_tokens").cast("double")))
                )
            )
        ),
        6,
    )


@register(
    "quality_classifier_score",
    oracle=f"""
    WITH {_CLS_SCORES_CTE}
    SELECT doc_id, n_tokens, raw_score, {_CLS_PROB_SQL} AS prob
    FROM cls_scores
    """,
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document linear-classifier inference: hashed-token integer
    milli-weights summed per doc (exact BIGINT), then squashed to a
    probability by a sqrt-normalized sigmoid. The shape of every
    quality/domain classifier pass over a pretraining corpus — one
    explode+agg, weights as a codegen expression (a trained model is a
    broadcast map; same plan), no Python in the loop. raw_score/n_tokens
    are the integer ground truth; prob is the only float and is emitted
    rounded.
    """
    docs = load_table(spark, sf_dir, "documents")
    return _cls_doc_scores(docs).select(
        "doc_id", "n_tokens", "raw_score", _cls_prob_col().alias("prob")
    )


@register(
    "classifier_calibration_bins",
    oracle=f"""
    WITH {_CLS_SCORES_CTE},
    binned AS (
      SELECT doc_id, lang, raw_score, n_tokens,
             {_CLS_PROB_SQL} AS prob,
             LEAST(GREATEST(
               (raw_score + 1000 * CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)) * 8
                 // (2000 * CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)),
               0), 7) AS bin
      FROM cls_scores
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           round(CAST(sum(CAST(prob AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
             AS mean_prob,
           round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS pos_rate
    FROM binned GROUP BY bin
    """,
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the hashed-token classifier against the
    lang='en' label: 8 score bins, each with its mean predicted
    probability and observed positive rate — the calibration audit run
    before a classifier's scores gate a data mixture (a miscalibrated
    filter silently shifts the mixture).

    Bin edges are INTEGER arithmetic on (raw_score, floor-sqrt n_tokens)
    — monotone in the sigmoid's logit up to the integer-sqrt
    approximation, never a float comparison, so bin membership is
    bit-stable cross-engine (the PSI bucket discipline). Mean predicted
    probability sums the round-6 probs as DECIMAL(18,6) — exact, hence
    partition-order independent. Scale shape: one corpus pass into
    ≤8 groups; map-side combine reduces the shuffle to 8 rows/partition.
    """
    docs = load_table(spark, sf_dir, "documents")
    # `div` truncates toward zero in Spark exactly as DuckDB's integer
    # `//` does (verified: -5//3 = -1 both sides); negatives only occur
    # below the GREATEST(0) clamp, so the two agree on every emitted bin.
    bin_expr = F.expr(
        "LEAST(GREATEST("
        "(raw_score + 1000 * CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)) * 8"
        " div (2000 * CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)),"
        " 0), 7)"
    )
    binned = _cls_doc_scores(docs).select(
        "lang",
        _cls_prob_col().alias("prob"),
        bin_expr.alias("bin"),
    )
    pos = F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long")
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        pos.alias("n_pos"),
        F.round(
            F.sum(F.col("prob").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_prob"),
        F.round(pos.cast("double") / F.count(F.lit(1)), 6).alias("pos_rate"),
    )


# --------------------------------------------------------------------------
# Classifier TRAINING: integer-deterministic gradient descent in-engine
# --------------------------------------------------------------------------

# The training half of the quality-filter loop (VERDICT r10 #6): fit the
# hashed-token linear weights IN-ENGINE instead of using the fixed
# deterministic stand-ins above. The discipline is bpe_merge_steps applied
# to training: a FIXED number of iterations, every quantity BIGINT-exact,
# so the whole trajectory — every iteration's weight vector — replays
# bit-for-bit in a pure-Python oracle (tests/test_classifier_training.py).
#
# Label. The fixture's lang column is TOKEN-INDEPENDENT by construction
# (all five langs draw from the identical 31-token wordlist — verified),
# so lang='en' is unlearnable from token counts. Training therefore uses a
# marker-token weak-supervision rule as its label — the fixture stand-in
# for CCNet's reference-corpus labeling: y = 1 iff the doc mentions the
# "good" markers strictly more than the "bad" ones. The rule is linearly
# separable in the slot-count feature space (sign(margin) can express it
# exactly), so optimizer progress is observable: misclassification drops
# 183 -> ~36 of 500 at sf0.01 in three iterations.
#
# Model: logistic regression on hash-slot counts with the HARD sigmoid
# (piecewise-linear, slope 1/4 at 0 — the standard quantized-training
# surrogate). Weights in integer MICRO-units (milli would truncate the
# per-token gradient of long docs to zero):
#
#   z_d      = sum_j w[j] * x_dj                (BIGINT; w micro, x counts)
#   margin_d = z_d div n_d                      (mean micro-logit)
#   p_d      = clamp(500 + margin_d div 4000, 0, 1000)  (hard sigmoid, milli)
#   e_d      = p_d - 1000*y_d                   (residual, milli)
#   S_y[j]   = sum_{d: y_d=y} (e_d * x_dj * 1000) div n_d   (per-term trunc)
#   w'[j]    = clamp(w[j] - (S_1[j]*G div N_pos + S_0[j]*G div N_neg),
#                    -1e6, 1e6)
#
# The update is the CLASS-BALANCED mean gradient: without it the class-
# imbalance term (all residuals start at ±500) drowns the discriminative
# signal and every weight saturates toward the majority class — measured,
# not hypothetical. Per-class MEANS (not balanced sums) also bound the
# update magnitude by 1e6*G independent of corpus size, so the BIGINT
# accumulators hold to ~1e13 documents per class. Every div truncates
# toward zero in Spark (`div`), DuckDB (`//`), and the oracle's _tdiv
# (Python's // FLOORS on negatives — the replay must not use it).
#
# Scale shape per iteration: one corpus-sized featurize scan (at 100 TB
# you write the doc×slot frame to parquet once and loop over that — the
# persisted-index discipline; fixture-scale rescans keep this function
# dependency-free), one doc-keyed shuffle join of residuals onto features,
# one slot-keyed partial agg down to <=CLS_DIM rows. Model state (CLS_DIM
# ints) is driver-side by design — the IVF-codebook bounded-metadata rule.
CLS_ITERS = 3
CLS_TRAIN_GAIN = 16
CLS_W_CAP = 1_000_000
CLS_POS_MARKERS = ("fast", "big")
CLS_NEG_MARKERS = ("slow", "small")


# Truncate-toward-zero division (Spark div / DuckDB //): shared helper —
# the same function the skew decision uses (functions/intmath.py).
from map_reduce_go_spark.functions.intmath import trunc_div as _trunc_div  # noqa: E402


def cls_slot_counts(docs: DataFrame) -> DataFrame:
    """Featurize + label: (doc_id, y, n_tokens, slot, cnt) — the sparse
    doc×slot count matrix with the marker-rule label, one explode + two
    bounded aggs. slot uses the SAME md5 hash as inference so a trained
    weight vector drops straight into :func:`_cls_doc_scores`'s plan as a
    broadcast map."""
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias("tok"),
    )
    slot = F.expr(f"CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % {CLS_DIM}")
    per = toks.groupBy("doc_id", slot.alias("slot")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    pos = F.sum(F.when(F.col("tok").isin(*CLS_POS_MARKERS), 1).otherwise(0))
    neg = F.sum(F.when(F.col("tok").isin(*CLS_NEG_MARKERS), 1).otherwise(0))
    lab = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (pos > neg).cast("long").alias("y"),
    )
    return per.join(lab, "doc_id")


def _cls_weights_df(spark: SparkSession, weights: list[int]) -> DataFrame:
    return spark.createDataFrame(list(enumerate(weights)), "slot bigint, w bigint")


def _cls_margins(feats: DataFrame, wdf: DataFrame) -> DataFrame:
    """(doc_id, y, n_tokens, margin, p, e) under the given weights.
    Weights are <=CLS_DIM rows — broadcast by construction. Prediction is
    the margin SIGN (margin > 0), so a freshly-learned micro-scale signal
    flips a classification long before the milli-granular p moves."""
    scored = feats.join(F.broadcast(wdf), "slot")
    z = scored.groupBy("doc_id", "y", "n_tokens").agg(
        F.sum(F.col("w") * F.col("cnt")).cast("long").alias("z")
    )
    margin = F.expr("z div n_tokens")
    p = F.least(
        F.greatest(F.lit(500) + F.expr("(z div n_tokens) div 4000"), F.lit(0)),
        F.lit(1000),
    )
    return z.select(
        "doc_id",
        "y",
        "n_tokens",
        margin.cast("long").alias("margin"),
        p.cast("long").alias("p"),
        (p - 1000 * F.col("y")).cast("long").alias("e"),
    )


def train_quality_classifier(
    spark: SparkSession,
    docs: DataFrame,
    iters: int = CLS_ITERS,
    feats_path: str | None = None,
) -> tuple[list[int], list[dict]]:
    """Fixed-iteration class-balanced integer gradient descent; returns
    (final weights, per-iteration trajectory). Trajectory entries carry
    the BIGINT-exact invariants the replay oracle checks: pre-update
    misclassification count (margin sign vs label) and post-update weight
    checksums. The per-iteration ``collect()`` is <=CLS_DIM gradient rows
    — model state, not data (the IVF-codebook rule).

    Materialization discipline: the featurize frame is materialized
    ONCE as the loop's stable input — rescanning the corpus per action
    would tokenize it 2×iters+2 times. Two forms (VERDICT r11 #3):

    - ``feats_path=None`` (default): ``localCheckpoint()`` — executor
      blocks, zero external state, right for fixture-scale and for the
      registered query (no side-effect paths in the driver contract).
    - ``feats_path="..."``: the doc×slot matrix is written to parquet
      once and every iteration reads THAT — the persisted-index
      discipline. At 100 TB this is the production form: the featurize
      is durable (an executor loss re-reads parquet instead of
      re-tokenizing the corpus) and the training loop's input is
      decoupled from the corpus scan entirely. The weight trajectory is
      bit-identical between the two forms (integer arithmetic over
      order-free sums; tests/test_classifier_training.py asserts it).

    Each iteration's margins frame is checkpointed once so its two
    consumers (the stats row and the gradient join) share one
    computation instead of re-running the doc aggregation; all live
    frames are unpersisted when done (checkpoint blocks must not
    outlive the call in a long-lived session)."""
    if feats_path is not None:
        cls_slot_counts(docs).write.mode("overwrite").parquet(feats_path)
        feats = spark.read.parquet(feats_path)
        live_frames: list = []  # parquet-backed: nothing pinned in memory
    else:
        feats = cls_slot_counts(docs).localCheckpoint()
        live_frames = [feats]
    weights = [0] * CLS_DIM
    trajectory: list[dict] = []
    # Exception-safe release: a failed action mid-iteration must not pin
    # checkpoint blocks for the session's lifetime (the driver loop runs
    # ~250 queries per session and may catch-and-continue).
    try:
        return _train_loop(
            spark, feats, weights, trajectory, iters, live_frames
        )
    finally:
        for fr in live_frames:
            try:
                fr.unpersist()
            except Exception:
                pass


def _train_loop(spark, feats, weights, trajectory, iters, live_frames):
    n_pos = n_neg = None
    for it in range(1, iters + 1):
        m = _cls_margins(feats, _cls_weights_df(spark, weights)).localCheckpoint()
        live_frames.append(m)
        stats = m.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").alias("n_pos"),
            F.sum(
                F.when(
                    ((F.col("margin") > 0) & (F.col("y") == 0))
                    | ((F.col("margin") <= 0) & (F.col("y") == 1)),
                    1,
                ).otherwise(0)
            ).alias("miss"),
        ).collect()[0]
        if n_pos is None:
            n_pos = int(stats["n_pos"])
            n_neg = int(stats["n_docs"]) - n_pos
            if n_pos == 0 or n_neg == 0:
                # Degenerate marker-rule label (ADVICE r11): a corpus
                # slice where every doc lands on one side of the
                # cnt(fast,big) > cnt(slow,small) rule has nothing to
                # separate — the class-balanced update would divide by
                # the empty class. Name the actual problem instead of
                # surfacing a bare ZeroDivisionError from _trunc_div.
                raise ValueError(
                    "train_quality_classifier: marker-rule label is "
                    f"degenerate on this corpus (n_pos={n_pos}, "
                    f"n_neg={n_neg} of {int(stats['n_docs'])} docs) — "
                    "class-balanced gradient needs both classes; check "
                    "that the corpus slice contains both marker-majority "
                    "kinds of documents"
                )
        grad = (
            # feats already carries y and n_tokens; the residual frame is
            # corpus-cardinality, so this doc-keyed join is deliberately
            # NOT broadcast-hinted — it is the one fact-sized shuffle an
            # iteration genuinely needs (AQE may still broadcast it at
            # fixture scale).
            feats.join(m.select("doc_id", "e").alias("err"), "doc_id")
            .select(
                "slot",
                "y",
                F.expr("(e * cnt * 1000) div n_tokens").cast("long").alias("t"),
            )
            .groupBy("slot")
            .agg(
                F.sum(F.when(F.col("y") == 1, F.col("t")).otherwise(0)).alias("sp"),
                F.sum(F.when(F.col("y") == 0, F.col("t")).otherwise(0)).alias("sn"),
            )
            .collect()
        )
        m.unpersist()  # checkpoint blocks die with the iteration
        live_frames.remove(m)
        g = {int(r["slot"]): (int(r["sp"]), int(r["sn"])) for r in grad}
        weights = [
            max(
                -CLS_W_CAP,
                min(
                    CLS_W_CAP,
                    w
                    - (
                        _trunc_div(g.get(j, (0, 0))[0] * CLS_TRAIN_GAIN, n_pos)
                        + _trunc_div(g.get(j, (0, 0))[1] * CLS_TRAIN_GAIN, n_neg)
                    ),
                ),
            )
            for j, w in enumerate(weights)
        ]
        trajectory.append(
            {
                "iter": it,
                "misclassified": int(stats["miss"]),
                "w_sum": sum(weights),
                "w_abs_sum": sum(abs(w) for w in weights),
                "w_nnz": sum(1 for w in weights if w != 0),
            }
        )
    # feats (still in live_frames) is released by the caller's finally.
    return weights, trajectory


def classifier_train_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document scores under the LEARNED weights: the end-to-end
    train-then-score loop (CCNet's quality-filter shape with the training
    half no longer stubbed). Emits the integer ground truth (learned
    micro-margin, milli-probability) plus the float probability for
    human eyes. Registered in round 12 (the r11 window had no free slot)
    with the unrolled-SQL replay oracle ``_cls_train_oracle_sql`` —
    registration happens below the oracle builder's definition;
    tests/test_classifier_training.py additionally replays the trajectory
    and this output integer-exactly in pure Python."""
    docs = load_table(spark, sf_dir, "documents")
    weights, _traj = train_quality_classifier(spark, docs)
    m = _cls_margins(cls_slot_counts(docs), _cls_weights_df(spark, weights))
    return m.select(
        "doc_id",
        "y",
        "n_tokens",
        F.col("margin").alias("learned_margin"),
        F.col("p").alias("learned_p_milli"),
        (F.col("p") / F.lit(1000.0)).alias("learned_prob"),
    )


def _cls_train_oracle_sql(iters: int = CLS_ITERS) -> str:
    """Unrolled DuckDB replay of the ENTIRE training loop + forward pass —
    the oracle classifier_train_scores registers with in r12 (pre-validated
    against the engine in tests/test_classifier_training.py this round).
    One CTE chain per iteration: margins under w_{i-1}, residuals,
    per-class slot gradients, clamped weight update — every division the
    truncating ``//``, every sum cast to BIGINT before dividing (DuckDB
    sums to HUGEINT)."""
    slot = f"CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % {CLS_DIM}"
    pos = ", ".join(f"'{t}'" for t in CLS_POS_MARKERS)
    neg = ", ".join(f"'{t}'" for t in CLS_NEG_MARKERS)
    ctes = [
        f"""toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ),
    feats0 AS (
      SELECT doc_id, {slot} AS slot, CAST(count(*) AS BIGINT) AS cnt
      FROM toks GROUP BY doc_id, slot
    ),
    lab AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CASE WHEN sum(CASE WHEN tok IN ({pos}) THEN 1 ELSE 0 END)
                       > sum(CASE WHEN tok IN ({neg}) THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS y
      FROM toks GROUP BY doc_id
    ),
    f AS (
      SELECT feats0.doc_id, slot, cnt, lab.n_tokens, lab.y
      FROM feats0 JOIN lab ON feats0.doc_id = lab.doc_id
    ),
    cls_n AS (
      SELECT CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg
      FROM lab
    ),
    w0 AS (SELECT DISTINCT slot, CAST(0 AS BIGINT) AS w FROM f)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""m{i} AS (
      SELECT f.doc_id, f.y, f.n_tokens,
             CAST(sum(w{i - 1}.w * f.cnt) AS BIGINT) // f.n_tokens AS margin
      FROM f JOIN w{i - 1} ON f.slot = w{i - 1}.slot
      GROUP BY f.doc_id, f.y, f.n_tokens
    ),
    e{i} AS (
      SELECT doc_id,
             LEAST(GREATEST(500 + margin // 4000, 0), 1000) - 1000 * y AS e
      FROM m{i}
    ),
    g{i} AS (
      SELECT f.slot,
             CAST(sum(CASE WHEN f.y = 1
                      THEN (e{i}.e * f.cnt * 1000) // f.n_tokens
                      ELSE 0 END) AS BIGINT) AS sp,
             CAST(sum(CASE WHEN f.y = 0
                      THEN (e{i}.e * f.cnt * 1000) // f.n_tokens
                      ELSE 0 END) AS BIGINT) AS sn
      FROM f JOIN e{i} ON f.doc_id = e{i}.doc_id
      GROUP BY f.slot
    ),
    w{i} AS (
      SELECT w{i - 1}.slot,
             GREATEST(-{CLS_W_CAP}, LEAST({CLS_W_CAP},
               w{i - 1}.w - ((g{i}.sp * {CLS_TRAIN_GAIN}) // cls_n.n_pos
                             + (g{i}.sn * {CLS_TRAIN_GAIN}) // cls_n.n_neg)
             )) AS w
      FROM w{i - 1} JOIN g{i} ON w{i - 1}.slot = g{i}.slot, cls_n
    )"""
        )
    fin = iters + 1
    ctes.append(
        f"""m{fin} AS (
      SELECT f.doc_id, f.y, f.n_tokens,
             CAST(sum(w{iters}.w * f.cnt) AS BIGINT) // f.n_tokens AS margin
      FROM f JOIN w{iters} ON f.slot = w{iters}.slot
      GROUP BY f.doc_id, f.y, f.n_tokens
    )"""
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT doc_id, CAST(y AS BIGINT) AS y, n_tokens,
           CAST(margin AS BIGINT) AS learned_margin,
           CAST(LEAST(GREATEST(500 + margin // 4000, 0), 1000) AS BIGINT)
             AS learned_p_milli,
           CAST(LEAST(GREATEST(500 + margin // 4000, 0), 1000) AS DOUBLE)
             / 1000.0 AS learned_prob
    FROM m{fin}
    """


# Registered here (not via decorator) because the oracle builder above
# must exist first; pre-validated engine==oracle in
# tests/test_classifier_training.py::test_unrolled_sql_oracle_matches_engine.
register("classifier_train_scores", oracle=_cls_train_oracle_sql())(
    classifier_train_scores
)

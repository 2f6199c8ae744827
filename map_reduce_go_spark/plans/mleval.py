"""Model-evaluation and data-drift monitoring operators.

The reference engine (MIT 6.5840 MapReduce lab — src/mr/*.go) has no
evaluation surface at all; these are part of the north-star extension set:
the metrics a large-scale training-data pipeline computes over its own
outputs — discrimination (AUC), distribution drift (PSI), split finding
(decision-stump information gain), and change-point detection (CUSUM).
Sibling: ndcg_label_knn (ranking quality) lives in operators/similarity.py
with the rest of the embedding stack.

House determinism contract (see plans/relational.py module docstring):
every ranking statistic is computed in exact integer/decimal arithmetic
(Mann-Whitney rank sums, scaled CUSUM, micro-unit NDCG weights); floats
appear only inside round(...,6) display columns whose expression text is
IDENTICAL in the Spark plan and the DuckDB oracle (shared f-string
templates), so both engines evaluate the same IEEE expression tree.

Scale notes (100 TB):
- Global rank/prefix sums use the distributed-rank idiom proven by
  equidepth_histogram_price_approx and zipf_tail_slope:
  repartitionByRange → per-partition window → broadcast per-partition
  offsets (collect is bounded by partition COUNT, never data size).
- Grouped-value rollups are cached and reused across subtrees so the
  fact table is scanned once per query (scan-count audited).
- The only unpartitioned windows run over the calendar-day rollup
  (bounded domain — ≤ days-in-retention rows, the documented house
  exception, cf. order_backlog_daily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_go_spark.functions.caching import tracked_cache
from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table

#: Range-partition fan-out for the distributed prefix-sum: derived per
#: session from functions.distrank.range_parts (VERDICT r12 #3 — the
#: old constant 8 capped the prefix shuffle's parallelism regardless of
#: cluster size; now it follows spark.sql.shuffle.partitions or the
#: spark.graft.rank.parts override, hash-invariantly).

#: PSI reference cohort and Laplace smoothing: counts+1 over 10 deciles
#: (denominator +10) so empty buckets contribute a finite, engine-exact
#: term instead of ln(0).
PSI_REF_SOURCE = "src0"
PSI_BUCKETS = 10


def _prefix_over(
    df: DataFrame, order_col: str, measures: tuple[str, ...]
) -> DataFrame:
    """Distributed inclusive prefix sums of ``measures`` over the global
    ``order_col`` ordering — repartitionByRange + per-partition window +
    broadcast cumulative offsets (the equidepth/zipf idiom: the collect
    is one row per PARTITION, never per data row). ``df`` must be one
    row per distinct ``order_col`` value (a grouped rollup)."""
    from map_reduce_go_spark.functions.distrank import range_parts

    spark = df.sparkSession
    ranged = tracked_cache(
        df.repartitionByRange(
            range_parts(spark), F.asc(order_col)
        ).withColumn("pid", F.spark_partition_id())
    )
    per_pid = ranged.groupBy("pid").agg(
        *[F.sum(m).alias(m) for m in measures]
    ).collect()
    sizes = {r["pid"]: tuple(r[m] or 0 for m in measures) for r in per_pid}
    offsets, acc = [], tuple(0 for _ in measures)
    for pid in sorted(sizes):
        offsets.append((pid, *acc))
        acc = tuple(a + s for a, s in zip(acc, sizes[pid]))
    schema = "pid int, " + ", ".join(f"off_{m} long" for m in measures)
    off = spark.createDataFrame(offsets or [(0,) + acc], schema)
    w = Window.partitionBy("pid").orderBy(F.asc(order_col))
    out = ranged.join(F.broadcast(off), "pid")
    for m in measures:
        out = out.withColumn(
            f"cum_{m}", (F.sum(m).over(w) + F.col(f"off_{m}")).cast("long")
        )
    return out.drop("pid", *[f"off_{m}" for m in measures])


# --------------------------------------------------------------------------
# AUC via the Mann-Whitney rank sum
# --------------------------------------------------------------------------


@register(
    "auc_value_by_event_type",
    oracle="""
    WITH vt AS (
      SELECT value, event_type, count(*) AS n_vt
      FROM events GROUP BY value, event_type
    ),
    vals AS (
      SELECT value, CAST(sum(n_vt) AS BIGINT) AS n FROM vt GROUP BY value
    ),
    cum AS (
      SELECT value, n,
             CAST(sum(n) OVER (ORDER BY value) AS BIGINT) - n AS cb
      FROM vals
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM vals),
    per AS (
      SELECT vt.event_type,
             sum(CAST(n_vt AS HUGEINT) * (2 * cb + n + 1)) AS s2,
             CAST(sum(n_vt) AS BIGINT) AS n_pos
      FROM vt JOIN cum ON vt.value = cum.value
      GROUP BY vt.event_type
    )
    SELECT event_type, n_pos,
           CAST(t.n_all - n_pos AS BIGINT) AS n_neg,
           CAST((1000000 * (s2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)))
                // nullif(2 * CAST(n_pos AS HUGEINT) * (t.n_all - n_pos), 0)
                AS BIGINT) AS auc_ppm
    FROM per, tot t
    """,
)
def auc_value_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest AUC of the ``value`` score for each event type — the
    Mann-Whitney / rank-sum identity AUC = (S₂ − n₊(n₊+1)) / (2·n₊·n₋)
    where S₂ is twice the sum of the positives' mid-ranks (ties get the
    average rank; doubling keeps every quantity an exact integer). The
    standard discrimination metric a feature-screening pass computes for
    every candidate signal.

    One global ranking serves all five one-vs-rest AUCs: ranks depend
    only on ``value``, so the score column is ranked ONCE and each
    event type reuses the shared rank frame — five metrics for one
    prefix pass, the same economics as ranking features against many
    labels in a real screening job.

    Scale shape: the fact is scanned once into the (value, event_type)
    rollup (cached — the value-marginal, the total, and the per-type
    sums all derive from it); the global mid-rank needs a prefix sum
    over DISTINCT values, which runs as the distributed-rank idiom
    (range-repartition + per-partition window + broadcast offsets — no
    single-partition Exchange, no per-row collect). Rank products are
    accumulated in DECIMAL(38,0) (HUGEINT in the oracle): at 10¹² rows
    S₂ ~ N² ~ 10²⁴ overflows BIGINT but not decimal-38.
    """
    ev = load_table(spark, sf_dir, "events")
    vt = tracked_cache(
        ev.groupBy("value", "event_type").agg(F.count(F.lit(1)).alias("n_vt"))
    )
    vals = vt.groupBy("value").agg(F.sum("n_vt").alias("n"))
    cum = _prefix_over(vals, "value", ("n",)).select(
        "value", "n", (F.col("cum_n") - F.col("n")).alias("cb")
    )
    tot = vals.agg(F.sum("n").cast("long").alias("n_all"))
    d38 = "decimal(38,0)"
    per = (
        vt.join(cum, "value")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("n_vt").cast(d38)
                * (2 * F.col("cb") + F.col("n") + 1)
            ).alias("s2"),
            F.sum("n_vt").cast("long").alias("n_pos"),
        )
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_pos",
        (F.col("n_all") - F.col("n_pos")).cast("long").alias("n_neg"),
        F.expr(
            f"(1000000 * (s2 - CAST(n_pos AS {d38}) * (n_pos + 1)))"
            f" div nullif(2 * CAST(n_pos AS {d38}) * (n_all - n_pos), 0)"
        )
        .cast("long")
        .alias("auc_ppm"),
    )


# --------------------------------------------------------------------------
# Population Stability Index (distribution drift vs a reference cohort)
# --------------------------------------------------------------------------

# Shared Spark/DuckDB expression text: Laplace-smoothed shares and the
# PSI term (p−q)·ln(p/q), rounded to 6 dp per bucket. The per-source PSI
# is the sum of the ROUNDED per-bucket terms accumulated as DECIMAL(18,6)
# — order-independent, so the metric is engine-exact by construction.
_PSI_P = f"(CAST(n_sb + 1 AS DOUBLE) / (n_s + {PSI_BUCKETS}))"
_PSI_Q = f"(CAST(n_rb + 1 AS DOUBLE) / (n_r + {PSI_BUCKETS}))"
_PSI_TERM6 = f"round(({_PSI_P} - {_PSI_Q}) * ln({_PSI_P} / {_PSI_Q}), 6)"

_PSI_DECILES = [i / 10 for i in range(1, PSI_BUCKETS)]
_PSI_BUCKET_EXPR = "1 + " + " + ".join(
    f"(CASE WHEN n_chars >= e{i} THEN 1 ELSE 0 END)"
    for i in range(1, PSI_BUCKETS)
)


def psi_bucket_assign(docs: DataFrame, edges: DataFrame) -> DataFrame:
    """Assign each document to its reference-decile length bucket —
    (source, bucket) rows. The stream-able core of the PSI drift
    monitor (the cms_cells_over pattern): ``docs`` may be a BATCH or a
    STREAMING frame; ``edges`` is the static one-row reference-edge
    frame, broadcast into a pure map-side CASE ladder, so the running
    per-(source, bucket) counts are an ordinary streaming aggregation —
    production drift monitoring over arriving data with no extra
    machinery. Tested stream==batch in tests/test_streaming.py."""
    return docs.select("source", "n_chars").crossJoin(
        F.broadcast(edges)
    ).select("source", F.expr(_PSI_BUCKET_EXPR).alias("bucket"))


@register(
    "psi_doclen_drift",
    oracle=f"""
    WITH edges AS (
      SELECT {", ".join(
          f"percentile_disc({q}) WITHIN GROUP (ORDER BY n_chars) AS e{i}"
          for i, q in enumerate(_PSI_DECILES, start=1))}
      FROM documents WHERE source = '{PSI_REF_SOURCE}'
    ),
    bucketed AS (
      SELECT d.source, {_PSI_BUCKET_EXPR} AS bucket
      FROM documents d, edges
    ),
    counts AS (
      SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_sb
      FROM bucketed GROUP BY source, bucket
    ),
    spine AS (
      SELECT s.source, b.bucket
      FROM (SELECT DISTINCT source FROM documents) s,
           (SELECT unnest(generate_series(1, {PSI_BUCKETS})) AS bucket) b
    ),
    filled AS (
      SELECT sp.source, sp.bucket, coalesce(c.n_sb, 0) AS n_sb
      FROM spine sp LEFT JOIN counts c
        ON c.source = sp.source AND c.bucket = sp.bucket
    ),
    ref AS (
      SELECT bucket, n_sb AS n_rb FROM filled
      WHERE source = '{PSI_REF_SOURCE}'
    ),
    tots AS (
      SELECT source, CAST(sum(n_sb) AS BIGINT) AS n_s
      FROM filled GROUP BY source
    ),
    ref_tot AS (
      SELECT CAST(sum(n_rb) AS BIGINT) AS n_r FROM ref
    )
    SELECT f.source, t.n_s AS n_docs,
           CAST(sum(CAST({_PSI_TERM6} AS DECIMAL(18,6))) AS DOUBLE) AS psi6
    FROM filled f
    JOIN tots t ON t.source = f.source
    JOIN ref r ON r.bucket = f.bucket
    CROSS JOIN ref_tot
    GROUP BY f.source, t.n_s
    """,
)
def psi_doclen_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the {PSI_REF_SOURCE} reference cohort — the
    standard production data-drift monitor (PSI < 0.1 stable, > 0.25
    action). Buckets are the reference cohort's own deciles
    (percentile_disc — actual data values, so bucket edges compare
    engine-exact), shares are Laplace-smoothed (+1 per bucket) so empty
    buckets contribute finite terms, and the per-source PSI is the sum
    of per-bucket (p−q)·ln(p/q) terms.

    Determinism: bucket assignment is integer comparisons against exact
    data-valued edges; the float PSI term is a shared expression-text
    template evaluated identically by both engines and rounded per
    bucket BEFORE the per-source sum, which accumulates as
    DECIMAL(18,6) — order-independent, engine-exact.

    Scale shape: edges are a one-row broadcast (9 values) computed from
    the predicate-pushed reference scan; bucket assignment is pure
    map-side CASE arithmetic; the per-(source, bucket) rollup is
    map-side combinable with a ≤10·|sources| result joined against the
    10-row broadcast reference distribution. The exact percentile over
    the reference cohort is the one full-sort cost — at 100 TB swap in
    approx_percentile or the distributed-rank idiom (same substitution
    documented at mad_outliers_by_segment) without touching the rest of
    the plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    edges = docs.where(F.col("source") == PSI_REF_SOURCE).agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY n_chars)"
            ).alias(f"e{i}")
            for i, q in enumerate(_PSI_DECILES, start=1)
        ]
    )
    bucketed = psi_bucket_assign(docs, edges)
    counts = tracked_cache(
        bucketed.groupBy("source", "bucket").agg(
            F.count(F.lit(1)).alias("n_sb")
        )
    )
    spine = (
        counts.select("source")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(1, PSI_BUCKETS + 1).select(
                    F.col("id").cast("int").alias("bucket")
                )
            )
        )
    )
    filled = (
        spine.join(counts, ["source", "bucket"], "left")
        .withColumn("n_sb", F.coalesce(F.col("n_sb"), F.lit(0)).cast("long"))
    )
    ref = filled.where(F.col("source") == PSI_REF_SOURCE).select(
        "bucket", F.col("n_sb").alias("n_rb")
    )
    tots = filled.groupBy("source").agg(
        F.sum("n_sb").cast("long").alias("n_s")
    )
    ref_tot = ref.agg(F.sum("n_rb").cast("long").alias("n_r"))
    return (
        filled.join(tots, "source")
        .join(F.broadcast(ref), "bucket")
        .crossJoin(F.broadcast(ref_tot))
        .groupBy("source", F.col("n_s").alias("n_docs"))
        .agg(
            F.sum(F.expr(_PSI_TERM6).cast("decimal(18,6)"))
            .cast("double")
            .alias("psi6")
        )
    )


# --------------------------------------------------------------------------
# Decision-stump split finding (information gain over one feature)
# --------------------------------------------------------------------------


def _ent2(c1: str, c0: str, tot: str) -> str:
    """Two-class entropy −Σ pᵢ·ln(pᵢ) with CASE-guarded zero terms —
    shared Spark/DuckDB expression text (same IEEE tree both engines)."""

    def term(c: str) -> str:
        return (
            f"(CASE WHEN {c} > 0 THEN (CAST({c} AS DOUBLE) / {tot})"
            f" * ln(CAST({c} AS DOUBLE) / {tot}) ELSE 0.0 END)"
        )

    return f"(0.0 - ({term(c1)} + {term(c0)}))"


_STUMP_IG6 = (
    "round("
    + _ent2("p_all", "n_all - p_all", "n_all")
    + " - (CAST(nl AS DOUBLE) / n_all) * "
    + _ent2("nlp", "nl - nlp", "nl")
    + " - (CAST(nr AS DOUBLE) / n_all) * "
    + _ent2("nrp", "nr - nrp", "nr")
    + ", 6)"
)

STUMP_TOP_K = 5


@register(
    "decision_stump_doclen",
    oracle=f"""
    WITH grp AS (
      SELECT n_chars AS thr, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS npos
      FROM documents GROUP BY n_chars
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_all,
             CAST(sum(npos) AS BIGINT) AS p_all
      FROM grp
    ),
    cum AS (
      SELECT thr,
             CAST(sum(n) OVER (ORDER BY thr) AS BIGINT) AS nl,
             CAST(sum(npos) OVER (ORDER BY thr) AS BIGINT) AS nlp
      FROM grp
    ),
    split AS (
      SELECT thr, nl, nlp, t.n_all - nl AS nr, t.p_all - nlp AS nrp,
             t.n_all, t.p_all
      FROM cum, tot t
      WHERE t.n_all - nl > 0
    )
    SELECT thr AS threshold, nl, nlp AS nl_pos, nr, nrp AS nr_pos,
           {_STUMP_IG6} AS ig6
    FROM split
    ORDER BY ig6 DESC, threshold
    LIMIT {STUMP_TOP_K}
    """,
)
def decision_stump_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best decision-stump splits of documents into en / non-en by the
    n_chars feature: for every candidate threshold t, the information
    gain of the partition (x ≤ t | x > t) — the inner loop of decision
    tree / GBDT training (exact greedy split finding), ranked top-5.

    Exactly the histogram-based split search XGBoost/LightGBM run per
    feature: group by feature value → class-count histogram → prefix
    sums give left/right class counts for every threshold in one pass.
    All split counts are exact integers; the entropy/IG float appears
    only in the shared round(...,6) expression template evaluated by
    both engines over identical integer inputs, and the (ig6 DESC,
    threshold ASC) total order makes the top-5 engine-deterministic.

    Scale shape: one fact scan into the per-value histogram (map-side
    combinable; cardinality ≤ distinct feature values); the prefix sums
    over the value order run as the distributed-rank idiom (bounded
    collect, no single-partition Exchange); the top-5 is a
    TakeOrderedAndProject. At 100 TB with a high-cardinality feature
    you would pre-bucket values (the lossy histogram GBDTs use) —
    a one-line groupBy key change that leaves the plan shape intact.
    """
    docs = load_table(spark, sf_dir, "documents")
    grp = docs.groupBy(F.col("n_chars").alias("thr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("npos"),
    )
    cum = _prefix_over(grp, "thr", ("n", "npos"))
    tot = grp.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("npos").cast("long").alias("p_all"),
    )
    split = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "thr",
            F.col("cum_n").alias("nl"),
            F.col("cum_npos").alias("nlp"),
            (F.col("n_all") - F.col("cum_n")).alias("nr"),
            (F.col("p_all") - F.col("cum_npos")).alias("nrp"),
            "n_all",
            "p_all",
        )
        .where(F.col("nr") > 0)
    )
    return (
        split.select(
            F.col("thr").alias("threshold"),
            "nl",
            F.col("nlp").alias("nl_pos"),
            "nr",
            F.col("nrp").alias("nr_pos"),
            F.expr(_STUMP_IG6).alias("ig6"),
        )
        .orderBy(F.desc("ig6"), F.asc("threshold"))
        .limit(STUMP_TOP_K)
    )


# --------------------------------------------------------------------------
# CUSUM change-point detection on the daily event series
# --------------------------------------------------------------------------


@register(
    "cusum_daily_changepoint",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS dd, CAST(sum(n) AS BIGINT) AS tt
      FROM d
    ),
    c AS (
      SELECT day, n,
             CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS pre,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
      FROM d
    ),
    s AS (
      SELECT day, n, dd * pre - idx * tt AS cusum FROM c, tot
    ),
    m AS (SELECT max(abs(cusum)) AS mx FROM s)
    SELECT CAST(day AS VARCHAR) AS day, n AS n_events,
           CAST(cusum AS BIGINT) AS cusum_scaled,
           (abs(cusum) = m.mx) AS is_peak
    FROM s, m
    """,
)
def cusum_daily_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily event-count series:
    Sₐ = Σ_{i≤d}(nᵢ − mean), the cumulative deviation from the series
    mean, whose extremum locates the most likely level-shift day (the
    classic offline CUSUM estimator). Emitted scaled by D (the day
    count): D·prefixₐ − idxₐ·T is the exact-integer form of D·Sₐ, so
    the change-point argmax and every emitted value are engine-exact —
    no float mean ever materializes.

    Scale shape: one fact scan into the calendar-day rollup (map-side
    combinable); the prefix sum and index run on the bounded day-domain
    frame (≤ retention-window days — the documented house exception for
    unpartitioned windows, cf. order_backlog_daily); the peak scalar is
    a one-row broadcast. At 10¹² rows the integer products stay under
    D·T ≈ 10³·10¹² — comfortably BIGINT.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("dd"),
        F.sum("n").cast("long").alias("tt"),
    )
    # Bounded-domain window: one row per calendar day.
    w = Window.orderBy("day")
    c = d.select(
        "day",
        "n",
        F.sum("n").over(w).cast("long").alias("pre"),
        F.row_number().over(w).cast("long").alias("idx"),
    )
    s = tracked_cache(
        c.crossJoin(F.broadcast(tot)).select(
            "day",
            "n",
            (F.col("dd") * F.col("pre") - F.col("idx") * F.col("tt")).alias(
                "cusum"
            ),
        )
    )
    m = s.agg(F.max(F.abs(F.col("cusum"))).alias("mx"))
    return s.crossJoin(F.broadcast(m)).select(
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        F.col("cusum").cast("long").alias("cusum_scaled"),
        (F.abs(F.col("cusum")) == F.col("mx")).alias("is_peak"),
    )


# --------------------------------------------------------------------------
# Spearman rank correlation (tie-corrected, exact-integer mid-ranks)
# --------------------------------------------------------------------------

# Shared Spark/DuckDB final expression: Pearson over the CENTERED doubled
# mid-ranks. All three sums are exact integers (decimal-38 / HUGEINT);
# the one float appears here, in identical expression text both engines.
_SPEARMAN6 = (
    "round(CAST(sxy AS DOUBLE)"
    " / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))), 6)"
)


@register(
    "spearman_quantity_price",
    oracle=f"""
    WITH fact AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM fact),
    gx AS (SELECT x, CAST(count(*) AS BIGINT) AS n FROM fact GROUP BY x),
    rx AS (
      SELECT x, n,
             2 * (CAST(sum(n) OVER (ORDER BY x) AS BIGINT) - n)
               + n + 1 - (nn + 1) AS c
      FROM gx, tot
    ),
    gy AS (SELECT y, CAST(count(*) AS BIGINT) AS n FROM fact GROUP BY y),
    ry AS (
      SELECT y, n,
             2 * (CAST(sum(n) OVER (ORDER BY y) AS BIGINT) - n)
               + n + 1 - (nn + 1) AS c
      FROM gy, tot
    ),
    sums AS (
      SELECT
        (SELECT sum(CAST(n AS HUGEINT) * c * c) FROM rx) AS sxx,
        (SELECT sum(CAST(n AS HUGEINT) * c * c) FROM ry) AS syy,
        (SELECT sum(CAST(rx.c AS HUGEINT) * ry.c)
         FROM fact f JOIN rx ON f.x = rx.x JOIN ry ON f.y = ry.y) AS sxy
    )
    SELECT t.nn AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM gx) AS n_distinct_qty,
           (SELECT CAST(count(*) AS BIGINT) FROM gy) AS n_distinct_price,
           {_SPEARMAN6} AS spearman6
    FROM sums, tot t
    """,
)
def spearman_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between order-line
    quantity and extended price — the monotonic-association screen a
    feature-audit pass runs where Pearson would be distorted by heavy
    tails. Ranks are mid-ranks (ties share their average position), the
    exact tie-corrected estimator.

    Exact-integer discipline: doubled mid-ranks 2R = 2·cb + n + 1 are
    integers even under ties, and CENTERING by the analytic mean
    2·(nn+1)/2 (the mid-rank mean is (nn+1)/2 regardless of ties) keeps
    every sum a true integer while shrinking magnitudes from ~nn³ to
    ~nn³/4 — Σc², Σcxcy stay inside decimal(38) through ~10⁹ rows, and
    Σc = 0 exactly, so the Pearson cross-term vanishes by construction.
    The single float is the shared round-6dp template over the three
    integer sums.

    Scale shape: one fact scan cached into the (x, y) integer-cents
    pairs; per-column rank tables are grouped rollups ranked via the
    distributed-prefix idiom (no single-partition window); the quantity
    rank table (≤ distinct quantities) broadcasts, and the cross-sum is
    FOLDED into the price rollup — Σ cx·cy = Σ_y cy·(Σ_{rows@y} cx), so
    the per-y rollup carries (count, Σcx) and the fact NEVER re-joins a
    rank table (VERDICT r8/r9 brief: the fact⋈price-rank shuffle join
    was the family's 64× tail — 12.5 s; folding removes that full-width
    shuffle join outright). All sums are map-side combinable. The y
    rollup is distinct-price cardinality — at 100 TB quantize the score
    (integer cents already are) or pre-bucket as the PSI deciles do;
    the plan shape is unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem")
    fact = tracked_cache(
        li.select(
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("y"),
        )
    )
    tot = fact.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    d38 = "decimal(38,0)"

    def centered():
        return (
            2 * (F.col("cum_n") - F.col("n"))
            + F.col("n")
            + 1
            - (F.col("nn") + 1)
        )

    gx = fact.groupBy("x").agg(F.count(F.lit(1)).alias("n"))
    rx = tracked_cache(
        _prefix_over(gx, "x", ("n",))
        .crossJoin(F.broadcast(tot))
        .select("x", "n", centered().alias("c"))
    )
    # One shuffle on y carries the (count, Σcx) partial aggregates; cy
    # attaches via the distributed prefix over the SAME rollup, and all
    # y-side sums close over that rollup — no fact-width join on y.
    # sx stays LONG through the shuffle (a decimal-38 partial agg over
    # tens of millions of distinct keys is measurably slower): per-y
    # Σcx is bounded by rows_y · 2nn ≤ 2nn², inside int64 through ~2·10⁹
    # rows; the d38 widening happens once, in the final metadata-sized
    # sums.
    gy = (
        fact.join(F.broadcast(rx.select("x", F.col("c").alias("cx"))), "x")
        .groupBy("y")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cx").cast("long").alias("sx"),
        )
    )
    ry = tracked_cache(
        _prefix_over(gy, "y", ("n",))
        .crossJoin(F.broadcast(tot))
        .select("y", "n", "sx", centered().alias("c"))
    )

    def selfsum(r: DataFrame, alias: str) -> DataFrame:
        return r.agg(
            F.sum(
                F.col("n").cast(d38) * F.col("c").cast(d38) * F.col("c")
            ).alias(alias)
        )

    sxy = ry.agg(F.sum(F.col("c").cast(d38) * F.col("sx")).alias("sxy"))
    nx = rx.agg(F.count(F.lit(1)).cast("long").alias("n_distinct_qty"))
    ny = ry.agg(F.count(F.lit(1)).cast("long").alias("n_distinct_price"))
    return (
        sxy.crossJoin(F.broadcast(selfsum(rx, "sxx")))
        .crossJoin(F.broadcast(selfsum(ry, "syy")))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nx))
        .crossJoin(F.broadcast(ny))
        .select(
            F.col("nn").alias("n_rows"),
            "n_distinct_qty",
            "n_distinct_price",
            F.expr(_SPEARMAN6).alias("spearman6"),
        )
    )

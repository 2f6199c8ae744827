"""Event-funnel and cohort-retention analytics over the events table.

Classic product-analytics operators the reference's MapReduce users build
by hand (multi-stage keyed aggregation — the same dataflow shape as the
wc/indexer apps, reference src/mrapps/wc.go, but with ordered-stage
semantics). Both are expressed as pure keyed aggregations + co-partitioned
joins, never per-user sorts:

- **funnel**: stage k's earliest qualifying timestamp depends on stage
  k-1's — three min-aggregations chained by user_id-equi-joins. Every
  shuffle is on user_id, so after the first exchange the joins are
  co-partitioned; no window sort over a user's whole history.
- **retention**: cohort = hour of first signup; activity offset = whole
  hours since the cohort hour. One user-keyed agg, one user-keyed join,
  one (cohort, offset) count-distinct — all map-side-combinable.

At 100 TB: user_id is the natural partition key for all of it; skewed
power-users affect only the per-user min() partial aggregates (absorbed
map-side), and the final retention matrix is tiny (cohorts × horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(floor(epoch(v.t_view)) AS BIGINT) AS view_epoch,
           CAST(floor(epoch(c.t_click)) AS BIGINT) AS click_epoch,
           CAST(floor(epoch(p.t_purchase)) AS BIGINT) AS purchase_epoch,
           1 + CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS stages_completed
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel per user: first view, first click at or
    after that view, first purchase at or after that click (later stages
    NULL when never reached).

    Stage order matters — a click before the first view does not count —
    which is what distinguishes a funnel from three independent mins. Each
    stage is a filtered min-aggregation joined to the previous stage's
    result on user_id; all four shuffles hash on user_id, so AQE plans the
    chain co-partitioned. No per-user event sort anywhere.
    """
    return funnel_over(load_table(spark, sf_dir, "events"))


def funnel_over(e: DataFrame) -> DataFrame:
    """The funnel transformation over any events-shaped DataFrame
    (user_id, ts, event_type) — split out so property tests can drive it
    with generated logs (hypothesis conformance vs a sequential
    evaluator, the reference's mrsequential comparison philosophy)."""
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_timestamp("t_view").alias("view_epoch"),
            F.unix_timestamp("t_click").alias("click_epoch"),
            F.unix_timestamp("t_purchase").alias("purchase_epoch"),
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("stages_completed"),
        )
    )


@register(
    "cohort_hourly_retention",
    oracle="""
    WITH s AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS cohort_hour
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT CAST(epoch(s.cohort_hour) AS BIGINT) AS cohort_epoch,
           CAST(floor(epoch(e.ts) / 3600) AS BIGINT)
             - CAST(epoch(s.cohort_hour) / 3600 AS BIGINT) AS hour_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN s ON s.user_id = e.user_id
    WHERE CAST(floor(epoch(e.ts) / 3600) AS BIGINT)
          >= CAST(epoch(s.cohort_hour) / 3600 AS BIGINT)
    GROUP BY 1, 2
    """,
)
def cohort_hourly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly cohort-retention matrix: users cohorted by the hour of their
    first signup; n_active = distinct cohort members with ANY event in
    cohort_hour + hour_offset (offset 0 = the signup hour itself; activity
    in hour buckets before the cohort hour is excluded).

    Shapes: one user-keyed min-agg (cohort), one user_id equi-join of the
    full event stream against that (co-partitioned — the agg already
    hashed on user_id), then an exact count-distinct per (cohort, offset)
    cell. The distinct runs as Spark's two-phase partial aggregate; the
    output matrix is cohorts × horizon — tiny at any input scale.
    """
    e = load_table(spark, sf_dir, "events")
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("cohort_hour"))
    )
    cohort_bucket = (F.unix_timestamp("cohort_hour") / 3600).cast("long")
    event_bucket = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    return (
        e.join(s, "user_id")
        .where(event_bucket >= cohort_bucket)
        .groupBy(
            F.unix_timestamp("cohort_hour").alias("cohort_epoch"),
            (event_bucket - cohort_bucket).alias("hour_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ),
    outflow AS (
      SELECT prev_type, CAST(sum(n) AS BIGINT) AS total FROM pairs GROUP BY prev_type
    )
    SELECT p.prev_type, p.next_type, p.n,
           round(CAST(p.n AS DOUBLE) / o.total, 6) AS prob
    FROM pairs p JOIN outflow o ON o.prev_type = p.prev_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for each (previous event type → next event type) adjacency, the count
    and the conditional probability. The behavioral-profiling primitive —
    anomalous flows (error→purchase spikes, view→view loops) fall straight
    out of the matrix.

    One window per user (the same single user_id exchange sessionization
    uses — ordering key (ts, event_id) is unique so the lag is
    deterministic), then a wordcount-shaped pair count whose output is at
    most |event_types|² rows; the row-normalizing outflow join is over
    that tiny matrix, not the event stream. Probability is the only float
    and only in the emitted rounded value.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    outflow = pairs.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return pairs.join(outflow, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("prob"),
    )


@register(
    "conversion_lag_histogram",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST(floor((epoch(p.t_purchase) - epoch(v.t_view)) / 3600) AS BIGINT)
             AS lag_hours,
           count(*) AS n_users
    FROM p JOIN v ON v.user_id = p.user_id
    GROUP BY lag_hours
    """,
)
def conversion_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: for every user who completed the
    funnel, the whole-hour lag between their first view and their first
    ordered purchase, as a histogram — the report that prices how long
    the conversion window (and therefore attribution state) must be
    held.

    Reuses the funnel chain (all shuffles on user_id, co-partitioned)
    and collapses it to a lag histogram whose cardinality is the horizon
    in hours — a metadata-sized result at any event volume. Lags are
    exact integer epoch arithmetic.
    """
    f = funnel_over(load_table(spark, sf_dir, "events"))
    converted = f.where(F.col("purchase_epoch").isNotNull())
    lag = F.floor((F.col("purchase_epoch") - F.col("view_epoch")) / 3600).cast("long")
    return (
        converted.select(lag.alias("lag_hours"))
        .groupBy("lag_hours")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )

"""Structured Streaming over the events schema.

The reference engine is strictly batch (SURVEY.md §2.5 — no streaming
surface exists); this module is the north-star extension. The windowing
transformations are the *same* expressions the batch queries in
:mod:`map_reduce_go_spark.plans.events` use — a DataFrame transformation is
source-agnostic, so each builder here accepts either a batch or a streaming
DataFrame and the streaming tests assert batch/stream result equality
(exactly the reference's sequential-vs-distributed oracle philosophy).

Scale notes:
- watermarks bound state: without one, windowed state grows forever on an
  unbounded stream. 10 minutes here; production sets it to the observed
  late-data tail.
- session windows + watermark is the canonical "user sessionization at
  scale" pattern; state store is RocksDB-backed on a real cluster
  (spark.sql.streaming.stateStore.providerClass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, src_dir: str, fmt: str = "parquet") -> DataFrame:
    """File-source stream of events (new files appear -> new micro-batch).
    Explicit schema — streaming sources never infer at scale."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .load(src_dir)
    )


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """1-hour tumbling counts per event type; watermark bounds state and
    admits late data up to the threshold."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sliding_avg_value(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """1-hour windows sliding every 30 minutes, average value per type."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "10 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Per-user session windows (inactivity gap) — streaming sessionization."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, query_name: str, complete: bool = True):
    """Drain all available input into an in-memory sink table and stop.
    Test/debug harness for file-source streams (availableNow = process
    everything present, then finish — deterministic)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact deduplication: drop records whose (event_id) was
    already seen, keeping state only inside the watermark horizon —
    the streaming form of the batch dedup_exact operator (ingestion
    pipelines re-deliver; exactly-once downstream needs this gate).

    State scale: one entry per distinct key within the watermark window,
    evicted as event-time advances — bounded by arrival rate × horizon,
    not by stream length. RocksDB state store on a real cluster.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    deduped = src.dropDuplicatesWithinWatermark(["event_id"]) if events.isStreaming else src.dropDuplicates(["event_id"])
    return deduped.select("event_id", "ts", "user_id", "event_type", "value")


def click_purchase_interval_join(
    events: DataFrame, lookback: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Stream-stream interval join: each purchase paired with the same
    user's clicks in the preceding `lookback` — the streaming form of the
    batch range join (plans/temporal.py).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can expire buffered state: a click older than
    (watermark + lookback) can never match a future purchase and is
    evicted. Unbounded state otherwise — the interval bound IS the scale
    contract for stream-stream joins.
    """
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
        F.unix_timestamp("click_ts").alias("click_epoch"),
    )


def write_stream_idempotent(stream_df: DataFrame, path: str, checkpoint: str):
    """foreachBatch sink with idempotent micro-batch commits: each batch
    overwrites ITS OWN batch_id partition (dynamic partition overwrite),
    so a retried batch replaces rather than duplicates itself — the
    streaming analog of the reference's atomic temp-file+rename commit
    (reference src/mr/worker.go:83-99). The checkpoint prevents
    reprocessing across restarts; the partition overwrite makes the
    within-batch retry safe.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def purchase_click_outer_join(
    events: DataFrame, lookback: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase, paired with
    its preceding-`lookback` clicks when they exist and emitted with NULL
    click columns when none do — the attribution join that must not drop
    unattributed conversions.

    Outer stream-stream joins are the hard case: a purchase can only be
    emitted with NULLs once the watermark proves no matching click can
    still arrive, so results trail the watermark rather than the batch —
    but the FINAL result set equals the batch left join exactly (asserted
    in tests/test_streaming.py with availableNow, which drains the source
    and advances the watermark to the end). Same state-expiry contract as
    the inner form: the interval bound plus the watermark bounds buffered
    rows on both sides.
    """
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "left_outer",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
        F.unix_timestamp("click_ts").alias("click_epoch"),
    )


def purchase_click_full_outer_join(
    events: DataFrame, lookback: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Stream-stream FULL OUTER interval join — the last stream-join
    shape (VERDICT r9 brief #8): matched purchase/click pairs, plus
    unattributed purchases (NULL click columns) AND orphan clicks that
    led to no purchase within `lookback` (NULL purchase columns) — the
    two-sided attrition view an attribution audit needs.

    Both sides' NULL rows emit only once the watermark proves no match
    can still arrive, so each side's buffered state is bounded by
    (watermark + lookback) exactly as in the inner/left forms; the
    drained result equals the batch full join (asserted in
    tests/test_streaming.py with the flush-sentinel drain pattern)."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "full_outer",
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        F.unix_timestamp("purchase_ts").alias("purchase_epoch"),
        F.unix_timestamp("click_ts").alias("click_epoch"),
    )


def daily_distinct_users(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Daily distinct active users (the DAU metric) as a streaming
    aggregation. Streaming DataFrames cannot run COUNT(DISTINCT)
    directly (distinct state does not merge incrementally across
    micro-batches), so this uses the canonical dedup-then-count
    rewrite: drop duplicate (user, day) pairs — keyed state bounded by
    actives × watermark horizon — then a plain windowed count, which IS
    the distinct count after dedup. The same code path runs in batch
    (plain dropDuplicates), so stream == batch is testable row-for-row;
    this is the streaming twin of the batch dau_mau_stickiness rollup.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    days = src.select(
        "user_id", F.window("ts", "1 day").alias("w")
    )
    deduped = (
        days.dropDuplicatesWithinWatermark(["user_id", "w"])
        if events.isStreaming
        else days.dropDuplicates(["user_id", "w"])
    )
    return (
        deduped.groupBy("w")
        .agg(F.count(F.lit(1)).alias("dau"))
        .select(F.unix_timestamp("w.start").alias("day_start"), "dau")
    )


def enrich_with_customer_over(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static broadcast-join enrichment: the event stream joined
    to a STATIC (batch) customer dimension, then aggregated per
    (market segment, event type) — the canonical "enrich clicks with
    the user dim" topology. Spark plans the static side as a broadcast
    per micro-batch (no state, no stream-stream watermark bookkeeping),
    so at 100 TB/day of events the dim join costs one broadcast per
    micro-batch and the stateful footprint stays exactly the aggregate's.

    Same transformation works on a batch frame (batch-equality tested) —
    the dual-use-one-definition discipline every streaming operator in
    this module follows. Integer cents keep the revenue sum exact across
    micro-batch accumulation orders.
    """
    dim = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return (
        events.join(dim, "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )

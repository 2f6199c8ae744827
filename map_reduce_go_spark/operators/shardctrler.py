"""Shard-controller semantics (Join/Leave/Move/Query) as a config fold.

The LAST reference surface with specified-but-skeleton semantics
(VERDICT r13 #3), closing §2.4: the lab's shard controller
(reference src/shardctrler/common.go:4-29) manages a numbered chain of
``Config{Num, Shards[NShards], Groups}`` where

- config #0 assigns all ``NShards = 10`` shards to the invalid group 0
  (common.go:14-15, 21),
- ``Join(servers)`` adds replica groups and rebalances,
- ``Leave(gids)`` removes groups and rebalances,
- ``Move(shard, gid)`` pins one shard to a group WITHOUT rebalancing
  (a later Join/Leave may undo it — the reference tests Query/Move
  round-trips via check_same_config, src/shardctrler/test_test.go:56),
- ``Query(num)`` returns config #num (the full chain is queryable).

The rebalance rule itself is student-chosen in the lab; the reference
test suite pins only its PROPERTIES (test_test.go:12-54, 211-249):

1. balanced — max shards/group <= min shards/group + 1,
2. allocated — every shard maps to a live group (when any exist),
3. minimal movement — a shard moves only when its owner left or must
   shed load to restore balance,
4. deterministic — replicas folding the same op-log agree bit-for-bit.

This module fixes ONE deterministic rule satisfying all four (see
:func:`rebalance`) and ports the controller the way ``kv_apply_log``
ported the KV model (operators/kvstore.py): a deterministic op-log is
derived from fixture data, folded into the full config chain, and the
DuckDB oracle replays every step as an unrolled CTE chain — the
kv_apply_log / bpe_merge_steps discipline — so the driver value-hashes
each intermediate config, not just the final one.

Scale shape: the op-log is CONTROL-PLANE metadata — config changes are
operator actions, counted in the hundreds over a cluster's lifetime —
so collecting it to the driver is the same bounded-metadata discipline
as IVF's K centroids or distrank's per-partition offsets (a loud bound
enforces this assumption; see ``_MAX_OPS``). The data-plane half stays
distributed: the key->shard routing table (src/shardkv/client.go:20-26)
is applied to the orders-derived KV key space as a hash-partitioned
distinct + aggregate, and the tiny config chain broadcast-joins onto
the per-shard key loads. At 100 TB the heavy side is exactly the side
Spark shuffles; the fold cost is O(ops x NShards) on the driver.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from map_reduce_go_spark.operators.kvstore import KV_KEYS, N_SHARDS, key2shard
from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table

#: Loud bound on the collected op-log (control-plane metadata, not
#: data): a log past this size means the derivation is wrong, not that
#: the fold should silently absorb a data-sized collect.
_MAX_OPS = 1024

#: Derived-op gid base: gids are 100 + step so every op's group id is
#: disjoint from shard ids and the invalid group 0.
_GID_BASE = 100


# --------------------------------------------------------------------------
# The pure fold (property-tested in tests/test_shardctrler.py)
# --------------------------------------------------------------------------


def rebalance(prev: Sequence[int], groups: Iterable[int]) -> tuple[int, ...]:
    """One deterministic, balanced, minimal-movement rebalance.

    Quotas: every group gets ``NShards // n``; the ``NShards % n``
    +1 extras go to the groups that currently OWN the most shards
    (ties by ascending gid). Giving extras to the largest owners is
    what makes the rule minimal: each extra granted to a group owning
    more than the base quota saves exactly one forced move, and no
    other placement saves any. Each group then keeps its lowest-index
    shards up to quota; released + orphaned shards (ascending) refill
    under-quota groups in ascending-gid order.

    A shard therefore moves iff its owner left the group set or held
    more shards than its quota — the reference tests' minimal-transfer
    property (src/shardctrler/test_test.go:211-249) — and every
    tie-break is a total order, so replicas agree (the determinism the
    lab gets from Raft log order, here from the rule itself).
    """
    gs = sorted(set(groups))
    if not gs:
        return (0,) * N_SHARDS
    owned = {g: 0 for g in gs}
    for g in prev:
        if g in owned:
            owned[g] += 1
    n = len(gs)
    base, rem = divmod(N_SHARDS, n)
    by_load = sorted(gs, key=lambda g: (-owned[g], g))
    quota = {g: base for g in gs}
    for g in by_load[:rem]:
        quota[g] += 1
    out: list[int | None] = [None] * N_SHARDS
    kept = {g: 0 for g in gs}
    pool: list[int] = []
    for s in range(N_SHARDS):
        g = prev[s]
        if g in quota and kept[g] < quota[g]:
            out[s] = g
            kept[g] += 1
        else:
            pool.append(s)
    fill = iter(pool)
    for g in gs:
        for _ in range(quota[g] - kept[g]):
            out[next(fill)] = g
    return tuple(out)  # type: ignore[arg-type]


def apply_shard_ops(
    ops: Sequence[tuple[str, object, int | None]],
) -> list[tuple[int, tuple[int, ...]]]:
    """Fold (kind, gid_or_gids, shard) ops into the full config chain
    ``[(config_num, shards[NShards]), ...]`` starting from config #0
    (all shards -> group 0, no groups). Join/Leave rebalance; Move pins
    without rebalancing (common.go:8-10). Join/Leave accept EITHER a
    single gid or an iterable of gids — the reference RPC shapes are
    ``Join(servers map[int][]string)`` / ``Leave(gids []int)``
    (common.go:37-49), i.e. several groups join or leave atomically
    under ONE config transition and ONE rebalance (the TestMulti
    scenario, src/shardctrler/test_test.go:253-296)."""
    shards = (0,) * N_SHARDS
    groups: set[int] = set()
    chain = [(0, shards)]
    for num, (kind, gid, shard) in enumerate(ops, start=1):
        groups, shards = apply_one_op(kind, gid, shard, groups, shards)
        chain.append((num, shards))
    return chain


def apply_one_op(
    kind: str,
    gid: object,
    shard: int | None,
    groups: set[int],
    shards: tuple[int, ...],
) -> tuple[set[int], tuple[int, ...]]:
    """One config transition — the shared step of the batch fold and
    the streaming controller twin. Returns the NEW (groups, shards);
    the input set is not mutated."""
    groups = set(groups)
    gids = (
        tuple(gid)  # type: ignore[arg-type]
        if isinstance(gid, (tuple, list, set, frozenset))
        else (gid,)
    )
    if kind == "join":
        groups.update(gids)
        shards = rebalance(shards, groups)
    elif kind == "leave":
        groups.difference_update(gids)
        shards = rebalance(shards, groups)
    elif kind == "move":
        if shard is None or not (0 <= shard < N_SHARDS):
            raise ValueError(f"move needs a shard in [0,{N_SHARDS})")
        lst = list(shards)
        lst[shard] = gid  # type: ignore[assignment]
        shards = tuple(lst)
    else:
        raise ValueError(f"unknown shardctrler op kind {kind!r}")
    return groups, shards


# --------------------------------------------------------------------------
# The derived op-log (fixture-deterministic, like kvstore.kv_op_log)
# --------------------------------------------------------------------------


def shardctrler_op_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Join/Leave/Move op-log derived from ``nation`` (a
    fixed 25-row TPC-H dimension, so the oracle's unrolled step count is
    static): op step = n_nationkey; kind by step % 5 (3 joins, then a
    leave of the join three steps back, then a move); gid = 100 + step
    for joins, 100 + (step-3) for leaves (always a prior ≡0-mod-5 join),
    100 + (step-2) for moves (a ≡2-mod-5 join, never left); move shard
    = (7*step + n_regionkey) % NShards — the one data-carried field."""
    nation = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("int")
    return nation.select(
        k.alias("step"),
        F.when(k % 5 == 3, F.lit("leave"))
        .when(k % 5 == 4, F.lit("move"))
        .otherwise(F.lit("join"))
        .alias("kind"),
        (
            F.lit(_GID_BASE)
            + F.when(k % 5 == 3, k - 3).when(k % 5 == 4, k - 2).otherwise(k)
        ).cast("int").alias("gid"),
        F.when(
            k % 5 == 4, (k * 7 + F.col("n_regionkey")) % N_SHARDS
        ).cast("int").alias("shard"),
    )


#: Number of ops the oracle unrolls — nation is the fixed 25-row TPC-H
#: dimension at every scale factor, so the step count is static.
_N_OPS = 25


def _ops_cte() -> str:
    """The op-log derivation, replayed in DuckDB (must mirror
    :func:`shardctrler_op_log` expression for expression)."""
    return f"""
    ops AS (
      SELECT CAST(n_nationkey AS INTEGER) AS step,
             CASE CAST(n_nationkey % 5 AS INTEGER)
               WHEN 3 THEN 'leave' WHEN 4 THEN 'move' ELSE 'join'
             END AS kind,
             CAST({_GID_BASE} + CASE CAST(n_nationkey % 5 AS INTEGER)
               WHEN 3 THEN n_nationkey - 3
               WHEN 4 THEN n_nationkey - 2
               ELSE n_nationkey END AS INTEGER) AS gid,
             CASE WHEN CAST(n_nationkey % 5 AS INTEGER) = 4 THEN
               CAST((n_nationkey * 7 + n_regionkey) % {N_SHARDS} AS INTEGER)
             END AS shard
      FROM nation
    )"""


def _rebalance_step_sql(c: int) -> str:
    """CTEs computing cfg{c} from cfg{c-1} for a join/leave at op index
    c-1 — the SQL transliteration of :func:`rebalance`: membership with
    load-ordered extras, keep-lowest-shards-to-quota, ascending pool
    refills ascending-gid deficits."""
    i = c - 1
    return f"""
    mem{c} AS MATERIALIZED (
      SELECT gid, owned,
             CAST(COUNT(*) OVER () AS INTEGER) AS n,
             CAST(ROW_NUMBER() OVER (ORDER BY owned DESC, gid ASC)
                  AS INTEGER) AS xr
      FROM (
        SELECT j.gid, COALESCE(o.owned, 0) AS owned
        FROM (SELECT gid FROM ops WHERE kind = 'join' AND step <= {i}) j
        LEFT JOIN (
          SELECT gid AS lgid FROM ops WHERE kind = 'leave' AND step <= {i}
        ) l ON l.lgid = j.gid
        LEFT JOIN (
          SELECT gid AS ogid, CAST(COUNT(*) AS INTEGER) AS owned
          FROM cfg{c - 1} GROUP BY gid
        ) o ON o.ogid = j.gid
        WHERE l.lgid IS NULL
      )
    ),
    quo{c} AS MATERIALIZED (
      SELECT gid, owned,
             ({N_SHARDS} // n)
               + CASE WHEN xr <= ({N_SHARDS} % n) THEN 1 ELSE 0 END AS quota
      FROM mem{c}
    ),
    keep{c} AS MATERIALIZED (
      SELECT p.shard, p.gid
      FROM (
        SELECT shard, gid,
               ROW_NUMBER() OVER (PARTITION BY gid ORDER BY shard) AS rnk
        FROM cfg{c - 1}
      ) p
      JOIN quo{c} q ON q.gid = p.gid
      WHERE p.rnk <= q.quota
    ),
    pool{c} AS MATERIALIZED (
      SELECT shard, ROW_NUMBER() OVER (ORDER BY shard) AS rn
      FROM cfg{c - 1}
      WHERE shard NOT IN (SELECT shard FROM keep{c})
    ),
    slots{c} AS MATERIALIZED (
      SELECT d.gid, ROW_NUMBER() OVER (ORDER BY d.gid, r.j) AS rn
      FROM (
        SELECT q.gid, q.quota - COALESCE(k.kept, 0) AS deficit
        FROM quo{c} q
        LEFT JOIN (
          SELECT gid AS kgid, COUNT(*) AS kept FROM keep{c} GROUP BY gid
        ) k ON k.kgid = q.gid
      ) d
      JOIN tenr r ON r.j < d.deficit
    ),
    cfg{c} AS MATERIALIZED (
      SELECT shard, gid FROM keep{c}
      UNION ALL
      SELECT p.shard, s.gid FROM pool{c} p JOIN slots{c} s ON s.rn = p.rn
    )"""


def _move_step_sql(c: int) -> str:
    i = c - 1
    return f"""
    cfg{c} AS MATERIALIZED (
      SELECT c.shard, COALESCE(o.gid, c.gid) AS gid
      FROM cfg{c - 1} c
      LEFT JOIN (
        SELECT shard AS mshard, gid FROM ops
        WHERE kind = 'move' AND step = {i}
      ) o ON o.mshard = c.shard
    )"""


def _chain_prefix_sql() -> str:
    """The shared unrolled-CTE prefix ending at `chain` + `kps`: 25
    step CTE groups (the op kinds are static — step % 5 — so the
    generator emits the matching CTE form per step, with gid/shard
    values still read from the ops CTE, i.e. from the data). Both
    shardctrler oracles build on this one string so the replayed
    rebalance can never desynchronize between them."""
    parts = [
        _ops_cte(),
        f"tenr AS (SELECT CAST(range AS INTEGER) AS j FROM range(0, {N_SHARDS}))",
        f"cfg0 AS MATERIALIZED (SELECT CAST(range AS INTEGER) AS shard, 0 AS gid "
        f"FROM range(0, {N_SHARDS}))",
    ]
    for c in range(1, _N_OPS + 1):
        if (c - 1) % 5 == 4:
            parts.append(_move_step_sql(c))
        else:
            parts.append(_rebalance_step_sql(c))
    chain = "\n      UNION ALL ".join(
        f"SELECT {c} AS config_num, shard, gid FROM cfg{c}"
        for c in range(_N_OPS + 1)
    )
    return f"""
    WITH {",".join(parts)},
    chain AS (
      {chain}
    ),
    keys AS (
      SELECT DISTINCT CAST(o_custkey % {KV_KEYS} AS VARCHAR) || '-key' AS key
      FROM orders
    ),
    kps AS (
      SELECT CAST(ascii(substring(key, 1, 1)) % {N_SHARDS} AS INTEGER)
               AS shard,
             COUNT(*) AS n_keys
      FROM keys GROUP BY 1
    )"""


def _shardctrler_oracle() -> str:
    """Config chain + per-shard key loads (see _chain_prefix_sql)."""
    return f"""{_chain_prefix_sql()}
    SELECT CAST(c.config_num AS INTEGER) AS config_num,
           CAST(c.shard AS INTEGER) AS shard,
           CAST(c.gid AS INTEGER) AS gid,
           CAST(COALESCE(k.n_keys, 0) AS BIGINT) AS n_keys
    FROM chain c LEFT JOIN kps k ON k.shard = c.shard
    """


def _fold_chain(spark: SparkSession, sf_dir: str):
    """Collect the bounded op-log, fold it, and return
    (ops_rows, chain_df) — the shared driver-side half of both
    registered shardctrler queries."""
    rows = shardctrler_op_log(spark, sf_dir).orderBy("step").collect()
    if len(rows) > _MAX_OPS:
        raise ValueError(
            f"shardctrler op-log has {len(rows)} ops (> {_MAX_OPS}): "
            "this is control-plane metadata; a data-sized log means the "
            "derivation is wrong, not that the driver should fold it"
        )
    chain = apply_shard_ops([(r["kind"], r["gid"], r["shard"]) for r in rows])
    chain_df = spark.createDataFrame(
        [
            (num, shard, gid)
            for num, shards in chain
            for shard, gid in enumerate(shards)
        ],
        "config_num int, shard int, gid int",
    )
    return rows, chain_df


def _key_loads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard KV key counts over the orders-derived key space — the
    distributed (hash-partitioned distinct + agg) side of both
    registered shardctrler queries."""
    keys = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.concat(
                (F.col("o_custkey") % KV_KEYS).cast("string"), F.lit("-key")
            ).alias("key")
        )
        .distinct()
    )
    return keys.groupBy(key2shard(F.col("key")).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_keys")
    )


@register("shardctrler_apply_log", oracle=_shardctrler_oracle())
def shardctrler_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full shard-controller config chain after replaying the
    derived Join/Leave/Move op-log (reference src/shardctrler/
    common.go:4-29), one row per (config_num, shard) — the Query(num)
    surface for every num at once — joined with the number of KV keys
    (the orders-derived key space of kv_apply_log, routed per
    src/shardkv/client.go:20-26) each shard would carry.

    Plan: the op-log collect is bounded control-plane metadata
    (|nation| = 25 rows; loud bound at _MAX_OPS); the fold is the pure,
    property-tested :func:`apply_shard_ops`; the key-space count is a
    hash-partitioned distinct+agg over orders (the distributed side);
    the 260-row chain broadcast-joins onto the 10-row per-shard loads.
    """
    _, chain_df = _fold_chain(spark, sf_dir)
    kps = _key_loads(spark, sf_dir)
    return chain_df.join(F.broadcast(kps), "shard", "left").select(
        "config_num",
        "shard",
        "gid",
        F.coalesce(F.col("n_keys"), F.lit(0)).cast("long").alias("n_keys"),
    )


@register(
    "shardctrler_movement_report",
    oracle=f"""{_chain_prefix_sql()}
    SELECT CAST(c.config_num AS INTEGER) AS config_num,
           o.kind AS kind,
           CAST(SUM(CASE WHEN c.gid <> p.gid THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shards_moved,
           CAST(SUM(CASE WHEN c.gid <> p.gid
                         THEN COALESCE(k.n_keys, 0) ELSE 0 END)
                AS BIGINT) AS n_keys_moved
    FROM chain c
    JOIN chain p ON p.shard = c.shard
                AND p.config_num = c.config_num - 1
    JOIN ops o ON o.step = c.config_num - 1
    LEFT JOIN kps k ON k.shard = c.shard
    GROUP BY 1, 2
    """,
)
def shardctrler_movement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshard cost per config transition — the minimal-movement
    property MEASURED IN DATA: for each op, how many shards changed
    owner and how many KV keys (the orders-derived key space) those
    shards carry, i.e. the bytes a sharded KV service would actually
    migrate on that reconfiguration (reference src/shardkv — the lab's
    shard-migration phase the skeleton never implements; this is its
    cost model). Join steps move only what balance forces (the
    rebalance rule's minimality witness, property-tested), Leave steps
    move exactly the orphaned quota, Move steps move one shard.

    Plan: same bounded fold + distributed key-space agg as
    shardctrler_apply_log; the diff is a 260-row self-join on the
    driver-built chain — metadata-sized, broadcast territory."""
    ops_rows, chain_df = _fold_chain(spark, sf_dir)
    kps = _key_loads(spark, sf_dir)
    kinds = spark.createDataFrame(
        [(int(r["step"]), r["kind"]) for r in ops_rows],
        "step int, kind string",
    )
    c, pr = chain_df.alias("c"), chain_df.alias("p")
    moved = F.when(F.col("c.gid") != F.col("p.gid"), 1).otherwise(0)
    return (
        c.join(
            pr,
            (F.col("p.shard") == F.col("c.shard"))
            & (F.col("p.config_num") == F.col("c.config_num") - 1),
        )
        .join(kinds, F.col("step") == F.col("c.config_num") - 1)
        .join(
            F.broadcast(kps.withColumnRenamed("shard", "kshard")),
            F.col("kshard") == F.col("c.shard"),
            "left",
        )
        .groupBy(F.col("c.config_num").alias("config_num"), "kind")
        .agg(
            F.sum(moved).cast("long").alias("n_shards_moved"),
            F.sum(
                moved * F.coalesce(F.col("n_keys"), F.lit(0))
            ).cast("long").alias("n_keys_moved"),
        )
    )


# --------------------------------------------------------------------------
# Streaming twin: the live controller (the symmetric half of the kv
# capstone's batch/stream pair — operators/kvstore.py::kv_running_state)
# --------------------------------------------------------------------------

SHARDCTRLER_STREAM_SCHEMA = StructType(
    [
        StructField("config_num", LongType(), False),
        StructField("shard", IntegerType(), False),
        StructField("gid", IntegerType(), False),
    ]
)

#: Controller state: the latest config — number, the shards array and
#: the live group set (both JSON — bounded: NShards ints + live gids).
_SC_STATE_SCHEMA = "num LONG, shards STRING, groups STRING"

#: All ops route to ONE state key: the controller is a single logical
#: object (the lab serializes it through one Raft group). A one-key
#: stateful stream is inherently serial — correct for control-plane
#: config management, never used for data.
_SC_KEY = "ctrl"


def _sc_update(key, pdfs, state):
    import json as _json

    import pandas as _pd

    if state.exists:
        num, shards_s, groups_s = state.get
        shards = tuple(_json.loads(shards_s))
        groups = set(_json.loads(groups_s))
    else:
        num, shards, groups = 0, (0,) * N_SHARDS, set()
    out = {"config_num": [], "shard": [], "gid": []}
    chunks = list(pdfs)
    rows = _pd.concat(chunks) if chunks else _pd.DataFrame()
    if len(rows):
        # Ops apply in step order WITHIN the batch; the arrival
        # contract (the kv twin's) is that steps never move backwards
        # across micro-batches — the source is an ordered op-log.
        for _, r in rows.sort_values("step").iterrows():
            shard = None if _pd.isna(r["shard"]) else int(r["shard"])
            groups, shards = apply_one_op(
                r["kind"], int(r["gid"]), shard, groups, shards
            )
            num += 1
            for sh, g in enumerate(shards):
                out["config_num"].append(num)
                out["shard"].append(sh)
                out["gid"].append(int(g))
    state.update(
        (num, _json.dumps(list(shards)), _json.dumps(sorted(groups)))
    )
    yield _pd.DataFrame(out)


def shardctrler_running_config(op_stream: DataFrame) -> DataFrame:
    """Streaming shard controller over an op-log stream (step, kind,
    gid, shard): every applied op emits its full new config (NShards
    rows) — the Query surface a live controller exposes — with the
    current config held in the state store between micro-batches.
    Drained output must equal the batch ``apply_shard_ops`` chain
    (configs 1..N; config #0 is the implicit initial state) exactly
    (tests/test_shardctrler_stream.py)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        op_stream.withColumn("ctrl", F.lit(_SC_KEY))
        .groupBy("ctrl")
        .applyInPandasWithState(
            _sc_update,
            outputStructType=SHARDCTRLER_STREAM_SCHEMA,
            stateStructType=_SC_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

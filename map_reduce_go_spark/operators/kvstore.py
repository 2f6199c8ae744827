"""KV-store semantics (Get/Put/Append) as batch fold + streaming state.

The one reference surface previously covered only as a stretch note
(SURVEY §1.3): the lab's KV model is a linearizable string->string map
whose per-key semantics are defined precisely by the porcupine checker's
Step function (reference src/models/kv.go:40-54 — get returns the
current value, put replaces it, append concatenates), partitioned by
key (kv.go:18-39), with shard routing = first key byte mod 10
(src/shardkv/client.go:20-26). The server/Raft side is a skeleton the
reference never implements; what IS specified — the state semantics —
is what this module ports, twice:

- ``kv_apply_log`` (registered, DuckDB-oracle-checked): fold a
  deterministic Put/Append/Get op-log into final per-key state as a
  BATCH dataflow. The fold exploits the algebra of the Step model:
  state after the log = concatenation, in seq order, of every append
  at-or-after the LAST put (the put's own value included; everything
  before it is overwritten), or of all appends when no put exists.
  That turns a sequential fold into two shuffles — a per-key max and
  an ordered string-agg — with no iteration and no UDF.
- ``kv_running_state`` (streaming twin): the same semantics maintained
  INCREMENTALLY per key by an applyInPandasWithState processor — the
  keyed state table a live KV service would expose. Get ops read the
  running value (emitted per get, so the porcupine read semantics are
  observable), puts/appends update it. Stream-drained final state must
  equal the batch fold exactly (tests/test_kvstore.py).

Scale shape: the batch fold is two hash shuffles on ``key`` (the agg
and the join are both key-partitioned; Catalyst reuses the exchange),
and value assembly is JVM-side ``array_sort``+``array_join`` over
per-key struct lists — fine at 100 TB where keys are many and per-key
logs are bounded (the KV contract: values are short strings; a key
whose log is pathologically long is the same hot-key problem as any
skewed groupBy, handled by functions/skew.py's playbook). The
streaming twin keeps state partitioned by key hash in the state store,
checkpointed per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from map_reduce_go_spark.registry import register
from map_reduce_go_spark.sources.readers import load_table

#: Number of shards in the reference's routing table
#: (src/shardctrler/common.go:21: NShards = 10).
N_SHARDS = 10

#: Key-space width for the derived op-log fixture: o_custkey % 97 keys.
KV_KEYS = 97


def kv_op_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Put/Append/Get op-log derived from ``orders``:
    key = (o_custkey % 97) || '-key', total order seq = o_orderkey,
    op = put/get/append by o_orderkey % 5 (appends dominate, like the
    lab's workloads), val = o_orderstatus || (o_orderkey % 10)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.concat(
            (F.col("o_custkey") % KV_KEYS).cast("string"), F.lit("-key")
        ).alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("put"))
        .when(F.col("o_orderkey") % 5 == 4, F.lit("get"))
        .otherwise(F.lit("append"))
        .alias("op"),
        F.concat(
            F.col("o_orderstatus"), (F.col("o_orderkey") % 10).cast("string")
        ).alias("val"),
    )


def key2shard(key_col):
    """Reference shard routing: first byte of the key mod N_SHARDS
    (src/shardkv/client.go:20-26: ``int(key[0]) % shardctrler.NShards``)."""
    return (F.ascii(F.substring(key_col, 1, 1)) % N_SHARDS).cast("int")


def kv_fold(log: DataFrame) -> DataFrame:
    """Fold an op-log (key, seq, op, val) into final per-key KV state.

    Declarative form of the porcupine Step model's fixed point: gets
    don't change state; the last put truncates history; value = ordered
    concat of the surviving ops' vals. Ordered concat is the repo's
    distributed idiom — collect_list of (seq, val) structs, array_sort
    (struct order = field order, seq first), array_join — all JVM-side.
    """
    per_key = log.groupBy("key").agg(
        F.max(F.when(F.col("op") == "put", F.col("seq"))).alias("last_put_seq"),
        F.sum(F.when(F.col("op") == "get", 1).otherwise(0)).alias("n_gets"),
    )
    surviving = (
        log.where(F.col("op") != "get")
        .join(per_key, "key")
        .where(
            F.col("last_put_seq").isNull()
            | (F.col("seq") >= F.col("last_put_seq"))
        )
        .groupBy("key")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "val"))),
                    lambda s: s["val"],
                ),
                "",
            ).alias("value"),
            F.count(F.lit(1)).alias("n_applied"),
        )
    )
    return per_key.join(surviving, "key", "left").select(
        "key",
        key2shard(F.col("key")).alias("shard"),
        F.coalesce(F.col("value"), F.lit("")).alias("value"),
        F.coalesce(F.col("n_applied"), F.lit(0)).cast("long").alias("n_applied"),
        F.col("last_put_seq").cast("long").alias("last_put_seq"),
        F.col("n_gets").cast("long").alias("n_gets"),
    )


@register(
    "kv_apply_log",
    oracle=f"""
    WITH log AS (
      SELECT CAST(o_custkey % {KV_KEYS} AS VARCHAR) || '-key' AS key,
             o_orderkey AS seq,
             CASE CAST(o_orderkey % 5 AS INTEGER)
               WHEN 0 THEN 'put' WHEN 4 THEN 'get' ELSE 'append' END AS op,
             o_orderstatus || CAST(o_orderkey % 10 AS VARCHAR) AS val
      FROM orders
    ),
    per_key AS (
      SELECT key,
             MAX(CASE WHEN op = 'put' THEN seq END) AS last_put_seq,
             SUM(CASE WHEN op = 'get' THEN 1 ELSE 0 END) AS n_gets
      FROM log GROUP BY key
    ),
    surviving AS (
      SELECT l.key,
             string_agg(l.val, '' ORDER BY l.seq) AS value,
             COUNT(*) AS n_applied
      FROM log l JOIN per_key p USING (key)
      WHERE l.op <> 'get'
        AND (p.last_put_seq IS NULL OR l.seq >= p.last_put_seq)
      GROUP BY l.key
    )
    SELECT p.key AS key,
           CAST(ascii(substring(p.key, 1, 1)) % {N_SHARDS} AS INTEGER) AS shard,
           COALESCE(s.value, '') AS value,
           CAST(COALESCE(s.n_applied, 0) AS BIGINT) AS n_applied,
           CAST(p.last_put_seq AS BIGINT) AS last_put_seq,
           CAST(p.n_gets AS BIGINT) AS n_gets
    FROM per_key p LEFT JOIN surviving s USING (key)
    """,
)
def kv_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final KV state after replaying the derived op-log — the reference
    KV model's semantics (src/models/kv.go:40-54) as one declarative
    dataflow, shard-tagged per src/shardkv/client.go:20-26."""
    return kv_fold(kv_op_log(spark, sf_dir))


# --------------------------------------------------------------------------
# Streaming twin: the state table a live KV service would expose
# --------------------------------------------------------------------------

KV_STREAM_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("kind", StringType()),  # 'get' read or 'state' snapshot
        # get rows: the get's seq. state rows: the max seq processed so
        # far — monotone under the ordered-log arrival contract, so the
        # key's LAST snapshot is simply its max-seq snapshot (n_applied
        # is NOT monotone: it resets on put).
        StructField("seq", LongType()),
        StructField("value", StringType()),
        StructField("n_applied", LongType()),
        StructField("n_gets", LongType()),
        StructField("shard", IntegerType()),
    ]
)

_KV_STATE_SCHEMA = (
    "value STRING, last_put_seq LONG, n_applied LONG, n_gets LONG, max_seq LONG"
)


def _kv_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (k,) = key
    value, last_put_seq, n_applied, n_gets, max_seq = (
        state.get if state.exists else ("", None, 0, 0, -1)
    )
    shard = ord(k[0]) % N_SHARDS
    out = {c: [] for c in ("kind", "seq", "value", "n_applied", "n_gets")}
    chunks = list(pdfs)
    rows = pd.concat(chunks) if chunks else pd.DataFrame()
    if len(rows):
        # Ops apply in seq order WITHIN the batch; the arrival contract
        # (like any op-log consumer's) is that a key's seqs never move
        # backwards across micro-batches — the source is an ordered log.
        for _, r in rows.sort_values("seq").iterrows():
            op, seq, val = r["op"], int(r["seq"]), r["val"]
            max_seq = max(max_seq, seq)
            if op == "get":
                n_gets += 1
                out["kind"].append("get")
                out["seq"].append(seq)
                out["value"].append(value)  # porcupine: get reads current
                out["n_applied"].append(n_applied)
                out["n_gets"].append(n_gets)
            elif op == "put":
                # Put truncates history: n_applied counts the ops
                # SURVIVING into the value (the batch fold's invariant),
                # so it resets to 1 here rather than accumulating.
                value, last_put_seq, n_applied = val, seq, 1
            else:  # append
                value = value + val
                n_applied += 1
    state.update((value, last_put_seq, n_applied, n_gets, max_seq))
    out["kind"].append("state")
    out["seq"].append(max_seq)
    out["value"].append(value)
    out["n_applied"].append(n_applied)
    out["n_gets"].append(n_gets)
    n = len(out["kind"])
    yield pd.DataFrame({"key": [k] * n, **out, "shard": [shard] * n})


def kv_running_state(log_stream: DataFrame) -> DataFrame:
    """Streaming KV state over an op-log stream: per micro-batch, each
    touched key emits its get reads (porcupine read semantics) plus one
    'state' snapshot row. Update output mode; the LAST snapshot per key
    after draining equals the batch ``kv_fold`` of the same log."""
    return log_stream.groupBy("key").applyInPandasWithState(
        _kv_update,
        outputStructType=KV_STREAM_SCHEMA,
        stateStructType=_KV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# The same KV state on the Spark 4 StatefulProcessor API
# (transformWithStateInPandas) — the repo's TWS discipline
# (streaming/stateful.py): real code behind tws_runtime_available();
# needs the RocksDB state store provider + a protobuf runtime.
# --------------------------------------------------------------------------

from map_reduce_go_spark.streaming.stateful import (  # noqa: E402
    _HAS_TWS,
    StatefulProcessor,
    tws_runtime_available,  # noqa: F401  (re-exported for tests)
)

_KV_TWS_STATE = StructType(
    [
        StructField("value", StringType()),
        StructField("last_put_seq", LongType()),
        StructField("n_applied", LongType()),
        StructField("n_gets", LongType()),
        StructField("max_seq", LongType()),
    ]
)


class _KvStateProcessor(StatefulProcessor):
    """Keyed KV state as a named ValueState — semantics identical to
    :func:`_kv_update`; what TWS adds operationally at 100 TB is several
    named states per processor, timers for key TTL (an LRU KV would
    expire cold keys), and RocksDB-checkpointed state."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("kv", _KV_TWS_STATE)

    def handleInputRows(self, key, rows, timerValues):
        (k,) = key
        value, last_put_seq, n_applied, n_gets, max_seq = (
            self._state.get() if self._state.exists() else ("", None, 0, 0, -1)
        )
        shard = ord(k[0]) % N_SHARDS
        out = {c: [] for c in ("kind", "seq", "value", "n_applied", "n_gets")}
        chunks = list(rows)
        pdf = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(pdf):
            for _, r in pdf.sort_values("seq").iterrows():
                op, seq, val = r["op"], int(r["seq"]), r["val"]
                max_seq = max(max_seq, seq)
                if op == "get":
                    n_gets += 1
                    out["kind"].append("get")
                    out["seq"].append(seq)
                    out["value"].append(value)
                    out["n_applied"].append(n_applied)
                    out["n_gets"].append(n_gets)
                elif op == "put":
                    value, last_put_seq, n_applied = val, seq, 1
                else:
                    value = value + val
                    n_applied += 1
        self._state.update((value, last_put_seq, n_applied, n_gets, max_seq))
        out["kind"].append("state")
        out["seq"].append(max_seq)
        out["value"].append(value)
        out["n_applied"].append(n_applied)
        out["n_gets"].append(n_gets)
        n = len(out["kind"])
        yield pd.DataFrame({"key": [k] * n, **out, "shard": [shard] * n})

    def close(self) -> None:
        pass


def kv_running_state_tws(log_stream: DataFrame) -> DataFrame:
    """:func:`kv_running_state` on transformWithStateInPandas — same
    output contract (get reads + max-seq snapshots), RocksDB-backed
    named state."""
    if not _HAS_TWS:  # pragma: no cover - older Spark
        raise NotImplementedError("transformWithStateInPandas requires Spark >= 4.0")
    return log_stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_KvStateProcessor(),
        outputStructType=KV_STREAM_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""Streaming shard controller == batch fold, drained across waves.

The symmetric half of the KV capstone's batch/stream pair
(tests/test_kvstore.py): the op-log arrives in 3 step-ordered
micro-batches; the live controller (applyInPandasWithState, one logical
state key) must emit the EXACT config chain the batch fold produces,
with the current config persisting in the state store between batches.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from map_reduce_go_spark.operators.shardctrler import (
    apply_shard_ops,
    shardctrler_op_log,
    shardctrler_running_config,
)


def test_streaming_controller_equals_batch_fold(spark, sf_dir, tmp_path):
    log = shardctrler_op_log(spark, sf_dir).orderBy("step").collect()
    ops = [(r["kind"], r["gid"], r["shard"]) for r in log]
    want = {
        (num, sh): gid
        for num, shards in apply_shard_ops(ops)
        for sh, gid in enumerate(shards)
        if num > 0  # the stream emits applied configs; #0 is implicit
    }

    src = tmp_path / "sc_op_arrivals"
    src.mkdir()
    third = (len(log) + 2) // 3
    for i in range(3):
        chunk = log[i * third : (i + 1) * third]
        tbl = pa.table(
            {
                "step": pa.array([r["step"] for r in chunk], type=pa.int32()),
                "kind": [r["kind"] for r in chunk],
                "gid": pa.array([r["gid"] for r in chunk], type=pa.int32()),
                "shard": pa.array(
                    [r["shard"] for r in chunk], type=pa.int32()
                ),
            }
        )
        fp = src / f"batch-{i:03d}.parquet"
        pq.write_table(tbl, fp)
        os.utime(fp, (time.time() - 30 + 10 * i, time.time() - 30 + 10 * i))

    stream = (
        spark.readStream.schema("step int, kind string, gid int, shard int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"sc_stream_out_{os.path.basename(str(tmp_path))[-8:]}"
    q = (
        shardctrler_running_config(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["config_num"], r["shard"]): r["gid"]
        for r in spark.table(name).collect()
    }
    assert got == want and len(got) == len(log) * 10

    # The final streamed config matches the batch fold's final config
    # AND the registered query's rows for the last config_num.
    last_num = max(n for n, _ in got)
    final_stream = tuple(got[(last_num, sh)] for sh in range(10))
    assert final_stream == apply_shard_ops(ops)[-1][1]


def test_streaming_controller_state_persists_across_batches(spark, sf_dir, tmp_path):
    """Feed ONE op per micro-batch (3 ops): each batch's emitted config
    must chain off the PREVIOUS batch's state (config numbers 1,2,3
    with the cumulative group set), proving the state store carries the
    controller between triggers rather than refolding from scratch."""
    ops = [("join", 5, None), ("join", 6, None), ("leave", 5, None)]
    src = tmp_path / "sc_single_ops"
    src.mkdir()
    for i, (kind, gid, shard) in enumerate(ops):
        tbl = pa.table(
            {
                "step": pa.array([i], type=pa.int32()),
                "kind": [kind],
                "gid": pa.array([gid], type=pa.int32()),
                "shard": pa.array([shard], type=pa.int32()),
            }
        )
        fp = src / f"b-{i:03d}.parquet"
        pq.write_table(tbl, fp)
        os.utime(fp, (time.time() - 30 + 10 * i, time.time() - 30 + 10 * i))
    stream = (
        spark.readStream.schema("step int, kind string, gid int, shard int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"sc_persist_{os.path.basename(str(tmp_path))[-8:]}"
    q = (
        shardctrler_running_config(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    configs = {
        num: tuple(
            r["gid"]
            for r in out.where(F.col("config_num") == num)
            .orderBy("shard")
            .collect()
        )
        for num in (1, 2, 3)
    }
    assert configs[1] == (5,) * 10
    assert sorted(set(configs[2])) == [5, 6]  # balanced 5/5 split
    assert configs[3] == (6,) * 10  # leave(5) hands all to 6 — needs
    # the batch-2 state: a from-scratch refold of op 3 alone would
    # orphan everything to group 0.

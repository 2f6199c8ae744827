"""KV-store semantics (reference src/models/kv.go:40-54) — the batch
fold, the streaming state twin, and both against a literal Python port
of the porcupine Step model. This closes SURVEY §1.3's stretch note:
the only KV surface the reference SPECIFIES (the linearizable
Get/Put/Append state semantics; the server side is an empty skeleton)
now exists as a registered oracle-checked query plus a live keyed
state table."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from map_reduce_go_spark.operators.kvstore import (
    N_SHARDS,
    kv_fold,
    kv_op_log,
    kv_running_state,
)


def _step_model_fold(ops):
    """Literal Python port of the porcupine Step function
    (src/models/kv.go:40-54): sequential per-key replay. Returns
    (final_state, get_reads) where get_reads is [(key, seq, value)]."""
    state: dict[str, str] = {}
    last_put: dict[str, int] = {}
    n_applied: dict[str, int] = {}
    n_gets: dict[str, int] = {}
    reads = []
    for key, seq, op, val in sorted(ops, key=lambda o: o[1]):
        if op == "get":
            reads.append((key, seq, state.get(key, "")))
            n_gets[key] = n_gets.get(key, 0) + 1
        elif op == "put":
            state[key] = val
            last_put[key] = seq
            n_applied[key] = 1  # put truncates history: surviving ops reset
        else:  # append
            state[key] = state.get(key, "") + val
            n_applied[key] = n_applied.get(key, 0) + 1
        state.setdefault(key, "")
        n_applied.setdefault(key, 0)
        n_gets.setdefault(key, 0)
    final = {
        k: (state[k], last_put.get(k), n_applied[k], n_gets[k]) for k in state
    }
    return final, reads


_EDGE_OPS = [
    # put-after-append overwrites history; trailing appends survive
    ("a-key", 1, "append", "x"),
    ("a-key", 2, "append", "y"),
    ("a-key", 5, "put", "P"),
    ("a-key", 7, "append", "z"),
    ("a-key", 9, "get", ""),
    # append-only key: everything concatenates from ""
    ("b-key", 3, "append", "m"),
    ("b-key", 6, "append", "n"),
    # put-last: value is exactly the final put
    ("c-key", 4, "append", "q"),
    ("c-key", 8, "put", "Z"),
    # get-only key: state is the init "" (porcupine Init)
    ("d-key", 10, "get", ""),
    # get-before-anything then ops after
    ("e-key", 11, "get", ""),
    ("e-key", 12, "put", "s"),
    ("e-key", 13, "get", ""),
]


def _edge_log_df(spark):
    return spark.createDataFrame(
        _EDGE_OPS, "key string, seq long, op string, val string"
    )


def test_kv_fold_matches_step_model_on_edge_cases(spark):
    want, _ = _step_model_fold(_EDGE_OPS)
    got = {
        r["key"]: (r["value"], r["last_put_seq"], r["n_applied"], r["n_gets"])
        for r in kv_fold(_edge_log_df(spark)).collect()
    }
    assert got == want
    assert got["a-key"][0] == "Pz"  # last put truncates, trailing append sticks
    assert got["b-key"][0] == "mn"  # append-only concatenation
    assert got["c-key"][0] == "Z"  # put-last wins outright
    assert got["d-key"][0] == ""  # get-only key: porcupine Init state
    # Shard routing: first key byte mod N_SHARDS (src/shardkv/client.go:20-26).
    shards = {r["key"]: r["shard"] for r in kv_fold(_edge_log_df(spark)).collect()}
    assert shards == {k: ord(k[0]) % N_SHARDS for k in shards}


def test_kv_fold_matches_step_model_on_derived_log(spark, sf_dir):
    """The registered query's fold == the sequential porcupine replay
    over the full derived op-log — the E16-style sequential-oracle
    check, independent of the DuckDB SQL oracle."""
    log_rows = [
        (r["key"], r["seq"], r["op"], r["val"])
        for r in kv_op_log(spark, sf_dir).collect()
    ]
    want, _ = _step_model_fold(log_rows)
    got = {
        r["key"]: (r["value"], r["last_put_seq"], r["n_applied"], r["n_gets"])
        for r in kv_fold(kv_op_log(spark, sf_dir)).collect()
    }
    assert got == want and len(got) > 50


def _drain_kv_stream(spark, sf_dir, tmp_path, make_query):
    """Shared drain-and-check for both streaming APIs: feed the op-log
    in three seq-ordered micro-batches, return (output_df, model_final,
    model_reads)."""
    log = kv_op_log(spark, sf_dir).collect()
    log_rows = sorted(
        ((r["key"], r["seq"], r["op"], r["val"]) for r in log), key=lambda o: o[1]
    )
    want_final, want_reads = _step_model_fold(log_rows)

    src = tmp_path / "kv_log_arrivals"
    src.mkdir()
    third = (len(log_rows) + 2) // 3
    for i in range(3):
        chunk = log_rows[i * third : (i + 1) * third]
        tbl = pa.table(
            {
                "key": [c[0] for c in chunk],
                "seq": pa.array([c[1] for c in chunk], type=pa.int64()),
                "op": [c[2] for c in chunk],
                "val": [c[3] for c in chunk],
            }
        )
        fp = src / f"batch-{i:03d}.parquet"
        pq.write_table(tbl, fp)
        os.utime(fp, (time.time() - 30 + 10 * i, time.time() - 30 + 10 * i))

    stream = (
        spark.readStream.schema("key string, seq long, op string, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"kv_stream_out_{os.path.basename(str(tmp_path))[-8:]}"
    q = (
        make_query(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name), want_final, want_reads


def _assert_kv_stream_matches_model(out, want_final, want_reads):
    # Final state: a key's snapshots carry the max seq processed, which
    # is monotone under the ordered-log contract (n_applied is not — it
    # resets on put), so the max-seq snapshot is the last one.
    snaps = (
        out.where(F.col("kind") == "state").orderBy("key", "seq").collect()
    )
    last = {}
    for r in snaps:
        last[r["key"]] = (r["value"], r["n_applied"], r["n_gets"], r["shard"])
    got_final = {k: (v[0], v[1], v[2]) for k, v in last.items()}
    assert got_final == {
        k: (v[0], v[2], v[3]) for k, v in want_final.items()
    }
    assert all(v[3] == ord(k[0]) % N_SHARDS for k, v in last.items())

    # Get reads: every streamed get must equal the sequential model's
    # read at the same seq (porcupine: get returns the CURRENT value).
    got_reads = {
        (r["key"], r["seq"]): r["value"]
        for r in out.where(F.col("kind") == "get").collect()
    }
    want_read_map = {(k, s): v for k, s, v in want_reads}
    assert got_reads == want_read_map and len(got_reads) > 100


def test_kv_streaming_state_equals_batch_fold(spark, sf_dir, tmp_path):
    """Drain the op-log through the applyInPandasWithState twin in
    THREE seq-ordered micro-batches: the last 'state' snapshot per key
    must equal the batch fold exactly, and every streamed get read must
    equal the porcupine model's sequential read at that seq."""
    out, want_final, want_reads = _drain_kv_stream(
        spark, sf_dir, tmp_path, kv_running_state
    )
    _assert_kv_stream_matches_model(out, want_final, want_reads)


def test_kv_streaming_state_tws_equals_batch_fold(spark, sf_dir, tmp_path):
    """The Spark 4 StatefulProcessor (transformWithStateInPandas)
    variant: same contract, RocksDB-backed named state. Skips where the
    protobuf runtime TWS's state protocol needs is absent; the
    semantics are still executed by the applyInPandasWithState test."""
    import pytest as _pytest

    from map_reduce_go_spark.operators.kvstore import (
        kv_running_state_tws,
        tws_runtime_available,
    )

    if not tws_runtime_available():
        _pytest.skip(
            "no protobuf runtime for transformWithStateInPandas; the KV "
            "state semantics are executed by "
            "test_kv_streaming_state_equals_batch_fold on the "
            "applyInPandasWithState API"
        )
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out, want_final, want_reads = _drain_kv_stream(
            spark, sf_dir, tmp_path, kv_running_state_tws
        )
        _assert_kv_stream_matches_model(out, want_final, want_reads)
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)


def test_kv_fold_plan_is_key_partitioned_no_cartesian(spark, sf_dir):
    """Scale audit: the fold is hash-partitioned on key throughout — no
    CartesianProduct, no single-partition Exchange; the only exchanges
    hash on the key."""
    plan = kv_fold(kv_op_log(spark, sf_dir))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(key" in plan

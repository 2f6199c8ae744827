"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful surface is the (skeleton) KV-store semantics
— a linearizable string->string map with Get/Put/Append (reference
src/models/kv.go:40-54, never implemented). The closest Spark-native analog
is a keyed state table maintained by a stateful streaming operator; this
module implements a running per-key aggregate (count + sum + last value)
with Arrow-batched state updates — the building block for custom
sessionization, CDC-style upserts, or append-semantics state.

Scale notes: state lives in the state store keyed by the grouping column —
partitioned across executors by key hash, checkpointed per micro-batch.
Timeouts (GroupStateTimeout) are how production variants expire idle keys;
omitted here to keep the operator deterministic for tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_running(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [event_type], "n_events": [n], "total_value": [total]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming running (count, sum) per event_type, emitted every
    micro-batch — state persists across batches."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

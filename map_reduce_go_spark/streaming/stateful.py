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


# --------------------------------------------------------------------------
# The same operator on the Spark 4 StatefulProcessor API
# (transformWithStateInPandas) — the successor to applyInPandasWithState:
# named state variables on a handle (multiple per processor), explicit
# init/close lifecycle, timers, and TTL support. Requires the RocksDB
# state store provider (set in the test/session conf) AND the protobuf
# runtime: TWS's Python<->JVM state protocol is protobuf-serialized
# (pyspark.sql.streaming.proto.StateMessage_pb2), and this container
# ships no google.protobuf — so, like the multimodal codec seam, the
# operator is real code behind an explicit environment gate; the test
# skips (does not fake a pass) when protobuf is absent.
# --------------------------------------------------------------------------

try:  # the StatefulProcessor API landed in Spark 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


def tws_runtime_available() -> bool:
    """True when transformWithStateInPandas can actually execute here:
    API present AND the protobuf runtime its state protocol needs."""
    if not _HAS_TWS:
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

_TWS_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


class _RunningTotalsProcessor(StatefulProcessor):
    """Keyed running (count, sum) with a single named ValueState — the
    minimal TWS processor, value-equivalent to _update_running above."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState("running", _TWS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, total = self._state.get() if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, float(total)))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "total_value": [float(total)]}
        )

    def close(self) -> None:
        pass


def running_totals_tws(events: DataFrame) -> DataFrame:
    """running_totals on the transformWithStateInPandas API. State scale
    contract is identical (one row per key in the keyed store); what the
    newer API adds at 100 TB is operational: several named state variables
    per processor, event/processing-time timers for key expiry, and state
    TTL — the pieces custom sessionization/CDC operators otherwise
    hand-roll."""
    if not _HAS_TWS:  # pragma: no cover - older Spark
        raise NotImplementedError("transformWithStateInPandas requires Spark >= 4.0")
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=_RunningTotalsProcessor(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's example of an operator Structured Streaming lacks as a
built-in: an incrementally-maintained per-key running profile (count /
sum / max seen so far) that survives across micro-batches. State is
partitioned by key across executors (bounded by key cardinality), and
batches arrive as Arrow-backed pandas frames — the same plumbing a
custom sessionizer or online sketch would use at production scale.
"""

from __future__ import annotations

from collections.abc import Iterable

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

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "max_value": [mx],
        }
    )


def running_key_profile(stream: DataFrame) -> DataFrame:
    """Per-event-type running profile, updated each micro-batch."""
    return stream.groupBy("event_type").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

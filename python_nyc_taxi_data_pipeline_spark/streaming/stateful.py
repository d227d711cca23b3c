"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in window aggregates cover time-bucketed state; this covers
arbitrary per-key state machines. Demo operator: a per-user running
session profile (event count, total value, last-seen timestamp) that
emits one updated row per key per micro-batch and times out idle keys.

Scale notes: state lives in the state store keyed by user_id —
partitioned with the stream, no driver involvement; timeouts bound
state size for churning key populations. The UDF closure is
self-contained (pickled by value — workers need no package import).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_epoch_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_epoch_us", T.LongType()),
    ]
)


def user_profiles(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Running per-user profile over a stream grouped by user_id.

    ``events`` must be a streaming DataFrame with columns
    (user_id long, ts timestamp-castable, value double).
    """

    def update(key, pdfs, state):
        import pandas as pd  # self-contained closure

        (user_id,) = key
        if state.hasTimedOut:
            n, total, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "last_seen_epoch_us": [last],
                }
            )
            return
        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "last_seen_epoch_us": [last],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )

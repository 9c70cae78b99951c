"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (SURVEY §2.11); this is the
extension surface for operators Spark's built-in windows can't express:
arbitrary per-key state machines with event-time timeouts. Shown here:
a sessionizer that emits one row per *closed* session (built-ins emit
per-window aggregates; closing semantics need custom state), with
watermark-driven state TTL so state size is bounded at 100 TB scale.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "start long, end long, n long, total double"


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Emit one row per closed session (gap-based). State per user:
    (start, end, n, total); closes on gap exceedance within a batch or
    event-time timeout at the watermark."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[int], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs))
        sort_keys = ["ts"] + (["event_id"] if "event_id" in rows else [])
        rows = rows.sort_values(sort_keys)  # deterministic tie order
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        vals = rows["value"].tolist()

        closed = []
        if state.exists:
            start, end, n, total = state.get
        else:
            start, end, n, total = ts_us[0], ts_us[0], 0, 0.0
        for t, v in zip(ts_us, vals):
            if n > 0 and t - end > gap_us:
                closed.append((start, end, n, total))
                start, n, total = t, 0, 0.0
            end = max(end, t) if n > 0 else t
            n += 1
            total += v
        state.update((start, end, n, total))
        state.setTimeoutTimestamp(end // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

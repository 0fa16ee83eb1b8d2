"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.3 E6/E7 extension): arbitrary per-key state the built-in
window/dedup operators can't express.

Operator: per-user running activity totals — every micro-batch updates
each seen user's lifetime (n_events, total_value, last_ts) and emits the
new totals (update semantics). This is the reference's
`connection_state.processed_events` counter (reference:
connection_state.py:4-12, event_processor.py:73-74) generalized from one
global int to per-user durable state, and the canonical shape for any
custom accumulator (fraud scores, rate limits, feature freshness) at
100 TB: state is partitioned by the group key across executors, Arrow
batches stream per key, and the state store checkpoints with the query.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, total double, last_us bigint"


def _update_user_totals(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Fold this micro-batch's rows for one user into the running state.
    Rows arrive as Arrow-backed pandas batches; the state tuple is the
    only thing that persists between micro-batches."""
    import pandas as pd

    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        # normalize to µs explicitly — pandas may hand back ns- or
        # µs-resolution datetime64 depending on the Arrow conversion
        batch_max_us = int(pdf["ts"].astype("datetime64[us]").astype("int64").max())
        last_us = max(last_us, batch_max_us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream → per-user running totals, one updated row per user
    per micro-batch in which the user appears. NoTimeout keeps state for
    ever (lifetime totals); swap in ProcessingTimeTimeout + state.remove
    for TTL'd accumulators."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics windowed aggregation can't express
(SURVEY.md §2.10 extensions / BASELINE.json custom-operator ask).

Example operator: a per-user running profile (event count, cumulative
value cents, last event id) maintained in the state store across
micro-batches and emitted in update mode after every batch. The state
survives batch boundaries exactly like the reference's processed-key set
survives process restarts — but transactionally, via the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_c long, last_event_id long"
)
STATE_SCHEMA = "n_events long, value_c long, last_event_id long"


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_events, value_c, last_event_id = state.get
    else:
        n_events, value_c, last_event_id = 0, 0, -1
    for pdf in pdfs:
        n_events += len(pdf)
        # exact integer cents (same convention as the batch plans)
        value_c += int(round(pdf["value"].mul(100).round().sum()))
        if len(pdf):
            last_event_id = int(pdf["event_id"].max())
    state.update((n_events, value_c, last_event_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "value_c": [value_c],
            "last_event_id": [last_event_id],
        }
    )


def user_profile_stream(events_stream: DataFrame) -> DataFrame:
    """events stream -> per-user running profile (update mode)."""
    return (
        events_stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

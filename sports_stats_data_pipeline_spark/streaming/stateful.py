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


# ---------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the
# arbitrary-stateful API that SUPERSEDES applyInPandasWithState
# (SPARK-46815): named state VARIABLES instead of one state tuple,
# timers, TTL, and a RocksDB-backed store (it REQUIRES the RocksDB
# provider — which session.py pins). Kept alongside the legacy form so
# the two APIs' semantics can be pinned equal on identical batches
# (tests/test_stateful_streaming.py) — the migration a production user
# of the old API performs next.
#
# Environment gate (the Delta/requests pattern): the API's Python
# state-server protocol is protobuf-based; without the `protobuf`
# package the streaming worker crashes with an opaque
# STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE mid-query.
# user_profile_stream_tws therefore fails FAST with a named ImportError
# instead; the parity test runs the real twin where protobuf exists
# and pins the named guard where it doesn't.
# The import itself is ALSO gated: pyspark < 4.0 has no
# stateful_processor module, and an unguarded module-level import would
# take the legacy user_profile_stream down with it — the twin's gate
# must cover its whole dependency surface, not just protobuf. On old
# pyspark the stub below keeps this module importable and the TWS twin
# fails fast in _require_tws_api with a named error.
# ---------------------------------------------------------------------------
try:  # noqa: E402 — see gate comment above
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _TWS_API_AVAILABLE = True
except ImportError:  # pyspark < 4.0: no transformWithState API at all

    class StatefulProcessor:  # type: ignore[no-redef]
        """Import stub — real class needs pyspark >= 4.0."""

    class StatefulProcessorHandle:  # type: ignore[no-redef]
        """Import stub — real class needs pyspark >= 4.0."""

    _TWS_API_AVAILABLE = False


def _require_tws_api() -> None:
    if not _TWS_API_AVAILABLE:
        raise ImportError(
            "transformWithStateInPandas needs pyspark >= 4.0 (the "
            "pyspark.sql.streaming.stateful_processor module is absent "
            "in this pyspark). Use the applyInPandasWithState form "
            "(user_profile_stream)."
        )


def _has_protobuf() -> bool:
    import importlib.util

    try:  # find_spec raises when even the parent `google` is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _require_protobuf() -> None:
    if not _has_protobuf():
        raise ImportError(
            "transformWithStateInPandas needs the `protobuf` package "
            "(its Python<->state-server protocol is protobuf-encoded); "
            "without it the streaming worker crashes mid-query with "
            "STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. Install "
            "protobuf, or use the applyInPandasWithState form "
            "(user_profile_stream)."
        )


class UserProfileProcessor(StatefulProcessor):
    """Per-user running profile as a ValueState variable. Same exact
    integer-cents accumulation as :func:`_update_user_profile`."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState("profile", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._profile.exists():
            n_events, value_c, last_event_id = self._profile.get()
        else:
            n_events, value_c, last_event_id = 0, 0, -1
        for pdf in rows:
            n_events += len(pdf)
            value_c += int(round(pdf["value"].mul(100).round().sum()))
            if len(pdf):
                last_event_id = int(pdf["event_id"].max())
        self._profile.update((n_events, value_c, last_event_id))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "value_c": [value_c],
                "last_event_id": [last_event_id],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stream_tws(events_stream: DataFrame) -> DataFrame:
    """:func:`user_profile_stream` on the transformWithState API —
    identical output contract, RocksDB-native state variables. Raises
    a named ImportError without pyspark >= 4.0 or the protobuf package
    (see gate comments)."""
    _require_tws_api()
    _require_protobuf()
    return (
        events_stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )

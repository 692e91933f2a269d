"""ST4 — custom stateful streaming operator via applyInPandasWithState.

A per-user running counter/accumulator: state (n_events, value_sum)
persists across triggers; every trigger emits the updated totals for
users seen in that batch. This is the shape any custom stateful
operator takes (counters, CDC reconciliation, online features) when
the built-in windowed aggregates can't express it.

State is bounded per key (two numbers), so at 100 TB the state store
scales with |users|, not |events| — the right invariant for an
unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, value_sum double"
STATE_SCHEMA = "n bigint, vsum double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state. The
    update function is a nested closure so cloudpickle ships it by
    value (workers need no importable copy of this package)."""

    def update_user_totals(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd

        n, vsum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            vsum += float(pdf["value"].sum())
        state.update((n, vsum))
        yield pd.DataFrame([{"user_id": key[0], "n_events": n, "value_sum": vsum}])

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

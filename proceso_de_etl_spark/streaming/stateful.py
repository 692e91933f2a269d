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
STATE_SCHEMA = "n bigint, vunits bigint"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state. The
    update function is a nested closure so cloudpickle ships it by
    value (workers need no importable copy of this package).

    The accumulator is an exact INTEGER count of micro-units
    (floor(value·1e6 + 0.5) per row): float accumulation order would
    make the emitted sum depend on batch/partition order, while the
    integer sum is order-independent and reproducible by any engine
    with the same floor expression — which is what lets this job
    carry a value oracle (jobs.ORACLES['stream_stateful_totals'])
    instead of a rows-only check. The emitted double is
    units / 1e6 — one division of identical integers, bit-identical
    everywhere."""

    def update_user_totals(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        n, vunits = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf["value"].to_numpy(dtype="float64")
            vunits += int(np.floor(vals * 1e6 + 0.5).astype("int64").sum())
        state.update((n, vunits))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "value_sum": vunits / 1e6}]
        )

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

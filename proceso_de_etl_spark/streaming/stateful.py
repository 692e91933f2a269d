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


def transform_with_state_available() -> bool:
    """Spark 4's transformWithStateInPandas runs a protobuf-based
    driver<->worker channel; without the python protobuf package the
    runner crashes at init (STREAMING_PYTHON_RUNNER_INITIALIZATION_
    FAILURE: cannot import google.protobuf.descriptor — reproduced in
    this image)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """ST4 on the NEW Spark 4 stateful API (transformWithStateInPandas
    + RocksDB state store): same per-user exact-integer running totals
    as ``running_user_totals``, with state held in a named ValueState
    instead of the applyInPandasWithState tuple. GATED: the python
    protobuf package is absent in this image (see
    ``transform_with_state_available``); the applyInPandasWithState
    twin above is the registered contract path."""
    if not transform_with_state_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' python package "
            "in driver and workers (pip install protobuf); falling back to "
            "running_user_totals (applyInPandasWithState) is equivalent."
        )

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            prev = self._state.get() if self._state.exists() else (0, 0)
            n, vunits = int(prev[0]), int(prev[1])
            for pdf in rows:
                n += len(pdf)
                vunits += int(pdf["vunits"].sum())
            self._state.update((n, vunits))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "value_sum": vunits / 1e6}]
            )

        def close(self) -> None:
            pass

    prepared = events.select(
        "user_id", F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint").alias("vunits")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


MARKOV_OUTPUT_SCHEMA = "prev_type string, next_type string"
MARKOV_STATE_SCHEMA = "last_us bigint, last_eid bigint, last_type string"


def markov_transition_edges(events: DataFrame) -> DataFrame:
    """ST17 — per-user event-transition extraction with carried
    state: emits one (prev_type → next_type) edge per consecutive
    event pair in a user's (ts, event_id)-ordered history, where
    "consecutive" spans micro-batch boundaries — the state is the
    user's LAST event (3 scalars), so a transition whose two ends
    arrive in different triggers is still emitted exactly once.
    This is the streaming twin of the A70 batch Markov matrix
    (operators/insights.py): the batch lag() window cannot run on an
    unbounded stream (rank/lag windows are illegal there), so the
    lag is re-expressed as keyed state. State per user is O(1) —
    at 100 TB the state store scales with |users|, not |events|.

    Update fn is a nested closure (shipped by value); each batch
    sorts only ITS OWN rows for the user — bounded by the trigger,
    not the stream."""

    def emit_transitions(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        types = rows["event_type"].tolist()
        carry = state.get[2] if state.exists else None
        prev = [carry] + types[:-1]
        last = rows.iloc[-1]
        state.update(
            (int(last["ts_us"]), int(last["event_id"]), str(last["event_type"]))
        )
        out = pd.DataFrame({"prev_type": prev, "next_type": types})
        yield out[out["prev_type"].notna()]

    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            "event_type",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            emit_transitions,
            outputStructType=MARKOV_OUTPUT_SCHEMA,
            stateStructType=MARKOV_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_OUT_SCHEMA = (
    "event_type string, n_hours bigint, c6 bigint, max6 bigint,"
    " n_alarm_hours bigint, first_alarm_us bigint"
)
CUSUM_STATE_SCHEMA = (
    "n_hours bigint, c6 bigint, max6 bigint, n_alarms bigint, first_alarm bigint"
)


def cusum_monitor_state(events: DataFrame) -> DataFrame:
    """ST21 core — keyed CUSUM recursion with explicit state: per
    event_type, C_t = max(0, C_{t-1} + (x_t − μ0 − k)) over hourly
    mean values, carrying (C, max C, alarm count, first alarm hour)
    across triggers. Input rows must carry hr_us (hour bucket),
    value, and the per-type training parameters mu6/k6/h6 as exact
    micro-unit BIGINTs (the ST4 integer-state discipline: float
    state would make emissions depend on batch/partition order; the
    integer recursion is reproducible by any engine, which is what
    lets this job carry a value oracle). The calling job must split
    micro-batches on HOUR BOUNDARIES so no hour spans two triggers —
    a spanning hour would see two partial means where the batch twin
    sees one.

    State is five integers per event_type — bounded by key
    cardinality, not stream length."""

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        n_hours, c6, max6, n_alarms, first_alarm = (
            state.get if state.exists else (0, 0, 0, 0, -1)
        )
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            mu6 = int(pdf["mu6"].iloc[0])
            k6 = int(pdf["k6"].iloc[0])
            h6 = int(pdf["h6"].iloc[0])
            # value -> exact micro units, mirroring CAST(value AS
            # DECIMAL(18,6)) (half-up; values are non-negative here)
            v6 = np.floor(pdf["value"].to_numpy(dtype="float64") * 1e6 + 0.5).astype(
                "int64"
            )
            g = (
                pd.DataFrame({"hr": pdf["hr_us"].to_numpy(dtype="int64"), "v6": v6})
                .groupby("hr")
                .agg(s=("v6", "sum"), n=("v6", "size"))
                .sort_index()
            )
            for hr, row in g.iterrows():
                # hourly mean at 6dp: the oracle's explicit
                # FLOOR((s/1e6)/n * 1e6 + 0.5) formula, exactly —
                # s/1e6 reproduces the DECIMAL->DOUBLE divide, the
                # floor form sidesteps engine ROUND() differences
                x6 = int(np.floor((int(row["s"]) / 1e6) / int(row["n"]) * 1e6 + 0.5))
                c6 = max(0, c6 + (x6 - mu6 - k6))
                n_hours += 1
                if c6 > max6:
                    max6 = c6
                if c6 > h6:
                    n_alarms += 1
                    if first_alarm < 0:
                        first_alarm = int(hr)
        state.update((n_hours, c6, max6, n_alarms, first_alarm))
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "n_hours": n_hours,
                    "c6": c6,
                    "max6": max6,
                    "n_alarm_hours": n_alarms,
                    "first_alarm_us": first_alarm,
                }
            ]
        )

    return (
        events.select("event_type", "hr_us", "value", "mu6", "k6", "h6")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=CUSUM_OUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SES_OUT_SCHEMA = "event_type string, n_hours bigint, s_scaled bigint, sae_units bigint"
SES_STATE_SCHEMA = "n_hours bigint, s bigint, sae bigint"


def ses_monitor_state(events: DataFrame) -> DataFrame:
    """ST24 core — the A106 exponential-smoothing recursion with
    explicit keyed state: per event_type, over hourly event COUNTS,
    s_t = (2·x_t·SCALE + 8·s_{t−1}) div 10 and sae += |x_t·SCALE −
    s_{t−1}| div SCALE, carrying (n_hours, s, sae) across triggers —
    the ST4 integer-state discipline, so every emitted state replays
    bit-for-bit in the batch twin's WITH RECURSIVE oracle. Input rows
    need only (event_type, hr_us); the calling job must split
    micro-batches on HOUR BOUNDARIES so no hour's count spans two
    triggers (a spanning hour would fold as two smaller observations
    where the batch twin sees one).

    State is three integers per event_type — bounded by key
    cardinality, not stream length."""
    from proceso_de_etl_spark.operators.events import ESM_SCALE

    def update(key, pdfs, state):
        import pandas as pd

        n_hours, s, sae = state.get if state.exists else (0, 0, 0)
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            g = (
                pd.DataFrame({"hr": pdf["hr_us"].to_numpy(dtype="int64")})
                .groupby("hr")
                .size()
                .sort_index()
            )
            for _, x in g.items():
                x = int(x)
                if n_hours == 0:
                    s = x * ESM_SCALE
                else:
                    sae += abs(x * ESM_SCALE - s) // ESM_SCALE
                    s = (2 * x * ESM_SCALE + 8 * s) // 10
                n_hours += 1
        state.update((n_hours, s, sae))
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "n_hours": n_hours,
                    "s_scaled": s,
                    "sae_units": sae,
                }
            ]
        )

    return (
        events.select("event_type", "hr_us")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=SES_OUT_SCHEMA,
            stateStructType=SES_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HOLT_OUT_SCHEMA = (
    "event_type string, n_hours bigint, s_scaled bigint, b_scaled bigint, sae_units bigint"
)
HOLT_STATE_SCHEMA = "n_hours bigint, s bigint, b bigint, sae bigint"


def holt_monitor_state(events: DataFrame) -> DataFrame:
    """ST25 core — A107's two-state Holt recursion with explicit
    keyed state: per event_type over hourly counts, level s_t =
    (2·x_t·SCALE + 8·(s+b)) floordiv 10 and trend b_t = (3·Δs + 7·b)
    floordiv 10 carried as (n_hours, s, b, sae) across triggers.
    Python's // IS floor division, which is exactly the recursion's
    definition — the batch twin spells the pmod form because Spark
    div/DuckDB // truncate; here no translation is needed. Same
    hour-boundary micro-batch contract as ses_monitor_state."""
    from proceso_de_etl_spark.operators.events import ESM_SCALE

    def update(key, pdfs, state):
        import pandas as pd

        n_hours, s, b, sae = state.get if state.exists else (0, 0, 0, 0)
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            g = (
                pd.DataFrame({"hr": pdf["hr_us"].to_numpy(dtype="int64")})
                .groupby("hr")
                .size()
                .sort_index()
            )
            for _, x in g.items():
                x = int(x)
                if n_hours == 0:
                    s, b = x * ESM_SCALE, 0
                else:
                    fc = s + b
                    sae += abs(x * ESM_SCALE - fc) // ESM_SCALE
                    s2 = (2 * x * ESM_SCALE + 8 * fc) // 10
                    b = (3 * (s2 - s) + 7 * b) // 10
                    s = s2
                n_hours += 1
        state.update((n_hours, s, b, sae))
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "n_hours": n_hours,
                    "s_scaled": s,
                    "b_scaled": b,
                    "sae_units": sae,
                }
            ]
        )

    return (
        events.select("event_type", "hr_us")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=HOLT_OUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HW_OUT_SCHEMA = (
    "event_type string, n_hours bigint, s_scaled bigint, b_scaled bigint,"
    " c_head bigint, c_sum bigint, sae_units bigint"
)
HW_STATE_SCHEMA = (
    "n_hours bigint, s bigint, b bigint, c array<bigint>, sae bigint"
)


def hw_monitor_state(events: DataFrame) -> DataFrame:
    """ST29 core — A115's three-state Holt-Winters additive recursion
    with explicit keyed state: per event_type over hourly counts,
    carrying (n_hours, s, b, seasonal 24-vector, sae) across
    triggers. The seasonal vector doubles as the WARMUP BUFFER: while
    n_hours < m the array accumulates the raw first-period counts;
    the hour that completes the period triggers the classic init
    (s_m = floor period mean at SCALE, b = 0, c_i = deviations) and
    the recursion takes over — so an epoch boundary landing mid-
    warmup is carried exactly, not re-derived. Python's // IS floor
    division (the recursion's definition), so no pmod translation is
    needed here; the batch twin and the oracle spell the pmod form.
    Same hour-boundary micro-batch contract as ses/holt_monitor_state.
    Warmup epochs report zeros (state not yet defined) — the oracle
    replays that rule."""
    from proceso_de_etl_spark.operators.events import (
        ESM_ALPHA_DEN,
        ESM_ALPHA_NUM,
        ESM_SCALE,
        HOLT_BETA_DEN,
        HOLT_BETA_NUM,
        HW_GAMMA_DEN,
        HW_GAMMA_NUM,
        HW_PERIOD,
    )

    m = HW_PERIOD

    def update(key, pdfs, state):
        import pandas as pd

        n_hours, s, b, c, sae = (
            state.get if state.exists else (0, 0, 0, [], 0)
        )
        c = list(c)
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            g = (
                pd.DataFrame({"hr": pdf["hr_us"].to_numpy(dtype="int64")})
                .groupby("hr")
                .size()
                .sort_index()
            )
            for _, x in g.items():
                x = int(x)
                if n_hours < m:
                    c.append(x)  # warmup buffer of raw counts
                    n_hours += 1
                    if n_hours == m:
                        s = (sum(c) * ESM_SCALE) // m
                        b = 0
                        c = [v * ESM_SCALE - s for v in c]
                    continue
                cm = c[0]
                fc = s + b + cm
                sae += abs(x * ESM_SCALE - fc) // ESM_SCALE
                snew = (
                    ESM_ALPHA_NUM * (x * ESM_SCALE - cm)
                    + (ESM_ALPHA_DEN - ESM_ALPHA_NUM) * (s + b)
                ) // ESM_ALPHA_DEN
                b = (
                    HOLT_BETA_NUM * (snew - s)
                    + (HOLT_BETA_DEN - HOLT_BETA_NUM) * b
                ) // HOLT_BETA_DEN
                cnew = (
                    HW_GAMMA_NUM * (x * ESM_SCALE - snew)
                    + (HW_GAMMA_DEN - HW_GAMMA_NUM) * cm
                ) // HW_GAMMA_DEN
                c = c[1:] + [cnew]
                s = snew
                n_hours += 1
        state.update((n_hours, s, b, c, sae))
        ready = n_hours >= m
        yield pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "n_hours": n_hours,
                    "s_scaled": s if ready else 0,
                    "b_scaled": b if ready else 0,
                    "c_head": c[0] if ready else 0,
                    "c_sum": sum(c) if ready else 0,
                    "sae_units": sae if ready else 0,
                }
            ]
        )

    return (
        events.select("event_type", "hr_us")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=HW_OUT_SCHEMA,
            stateStructType=HW_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

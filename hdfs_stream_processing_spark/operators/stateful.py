"""Custom stateful streaming operator via applyInPandasWithState (ST6+).

The reference has no stateful operators at all; Structured Streaming's
built-ins (windows, dropDuplicates, stream joins) cover most needs, and
``applyInPandasWithState`` is the escape hatch for the rest — arbitrary
per-key state with Arrow-batched pandas, GroupState bookkeeping, and
watermark-driven timeouts.  This module implements the canonical example:
a per-key running aggregate that survives across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_cents bigint"
STATE_SCHEMA = "n bigint, s bigint"


def running_totals_per_key(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Streaming per-key running totals with explicit state.

    Emits one row per key per micro-batch carrying the cumulative event
    count and exact-cents value sum.  State is two BIGINTs per key —
    bounded, partitioned by key, checkpointed with the query.  (With
    event-time timeouts this is how you expire idle keys at 100 TB.)
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # HALF_UP (away from zero), matching Spark's F.round — pandas
            # .round() is half-to-even and disagrees on exact .5 cents.
            x = pdf[value_col].astype(float).to_numpy() * 100.0
            cents = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
            s += int(cents.sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [s]}
        )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_tws(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """The same running-totals contract on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState``: state lives in named, individually
    typed handles (ValueState here; ListState/MapState and event-time
    timers are available on the same ``StatefulProcessorHandle``),
    instead of one monolithic state tuple + GroupStateTimeout.

    Emits the cumulative (n_events, sum_cents) per key touched in each
    micro-batch; composes additively, so the final emission per key
    equals the batch GROUP BY whatever the batch boundaries — the same
    oracle as the applyInPandasWithState path, which is the point:
    both stateful APIs, one verified contract.

    Environment gate (same class as the Kafka builders / PIL codecs):
    executing a transformWithState query requires the RocksDB state
    store AND the ``protobuf`` Python package for the state-server
    protocol (``transform_with_state_driver_worker`` imports
    ``google.protobuf``); this sandbox ships neither pip nor protobuf,
    so tests assert the documented failure when the package is absent
    and full parity where it exists.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_out = key_col

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                x = pdf[value_col].astype(float).to_numpy() * 100.0
                cents = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
                s += int(cents.sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {key_out: [key[0]], "n_events": [n], "sum_cents": [s]}
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )

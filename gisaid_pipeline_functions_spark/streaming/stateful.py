"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §7 streaming extension; the 'custom stateful operator' slot of the
engine's streaming surface).

``running_totals``: per-key cumulative event count + value sum maintained
in GroupState across micro-batches — the streaming analog of the engine's
grand-total aggregations, emitting an updated row per key per batch. This
is the harness a real pipeline reuses for dedup-state, per-entity
counters, or session accumulation.
"""

from __future__ import annotations

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
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_totals(
    stream: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Cumulative (count, sum) per key across the whole stream."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

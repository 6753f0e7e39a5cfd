"""Streaming first-seen dedup (beyond-reference; the LLM-pipeline op a
continuously-ingesting corpus needs).

Exact dedup over an unbounded stream: key the stream by content
fingerprint (md5), keep one bit of GroupState per fingerprint, and emit
each document only the first time its fingerprint appears. State grows
with DISTINCT content, not with throughput — the same bound a batch
``dropDuplicates`` needs, but maintained incrementally across
micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("keeper_id", LongType()),
        StructField("n_dupes_dropped", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("seen", LongType()), StructField("keeper", LongType())]
)


def streaming_first_seen(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Emit one row per NEW fingerprint (its keeper id); duplicates only
    update the dropped-count. Batch-equivalent of
    ``groupBy(md5(text)).agg(min(id))`` (operators.dedup.exact_duplicates),
    held as streaming state."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        seen, keeper = state.get if state.exists else (0, None)
        batch_ids = []
        for pdf in pdfs:
            batch_ids.extend(int(x) for x in pdf[id_col])
        if not batch_ids:
            return
        first_new = min(batch_ids)
        if keeper is None:
            keeper = first_new
            dropped = seen + len(batch_ids) - 1
        else:
            dropped = seen + len(batch_ids)
        state.update((dropped, keeper))
        # emit only on first sight (update mode consumers see one row per
        # fingerprint per batch that touched it; keeper is stable)
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]],
                "keeper_id": [keeper],
                "n_dupes_dropped": [dropped],
            }
        )

    keyed = stream.select(
        F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col)
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

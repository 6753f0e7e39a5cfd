"""Streaming CDC upsert — the SCD2 foreachBatch MERGE twin (VERDICT r7
next-round #5).

``window_scd2_history`` (queries/windows.py) is the batch build; the
standard production shape maintains the same current/history table
INCREMENTALLY: a ``foreachBatch`` sink that MERGEs each micro-batch into
the dimension table, recomputing only the partitions (users) the batch
touched. Without Delta/Iceberg in the container, the managed tables are
localCheckpoint-pinned DataFrames — the MERGE algebra is identical to
what a ``MERGE INTO`` against a lakehouse table would do:

- ``staged``  — the bronze append-only event log (grows with the
  corpus; on a cluster this is a user-bucketed table so the per-batch
  semi-join below is a partition-pruned read, not a shuffle).
- ``scd2``   — the silver SCD2 dimension. Per batch: the batch's
  touched-user rows are recomputed from their full staged history and
  swapped in (anti-join keeps untouched users); every other user's rows
  are carried unchanged.

Recompute-from-staged (not "extend the open interval") is deliberate:
SCD2 compaction is LOSSY under out-of-order arrival — a late event that
lands between an existing change point and a compacted-away repeat can
resurrect the repeat as a new change point, so no bounded per-user state
short of the event history itself is sufficient for exact parity. The
per-batch cost is proportional to the touched users' event history, not
the corpus — the partition-pruned MERGE shape. Exactness is the point:
the registered query hash-matches the BATCH oracle, arbitrary arrival
order included (the multi-file out-of-order pytest proves it).

Iterative-state rule (CLAUDE.md): both managed frames have two consumers
per round (the merge and the next round's merge), so each is
localCheckpoint-ed per batch — without the pin the lineage doubles per
micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.timeseries import scd2_history


class Scd2Merger:
    """foreachBatch sink maintaining the staged log + SCD2 dimension."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.staged: DataFrame | None = None
        self.scd2: DataFrame | None = None

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(
            "user_id", "event_type", "ts", "event_id"
        ).localCheckpoint(eager=True)
        touched = batch.select("user_id").distinct().localCheckpoint(eager=True)
        self.staged = (
            batch
            if self.staged is None
            else self.staged.unionByName(batch).localCheckpoint(eager=True)
        )
        # recompute ONLY the touched users, from their full staged
        # history (partition-pruned read in the lakehouse version)
        ev_t = self.staged.join(touched.hint("merge"), "user_id", "left_semi")
        fresh = scd2_history(ev_t).localCheckpoint(eager=True)
        if self.scd2 is None:
            self.scd2 = fresh
        else:
            keep = self.scd2.join(touched.hint("merge"), "user_id", "left_anti")
            self.scd2 = keep.unionByName(fresh).localCheckpoint(eager=True)


def streaming_scd2(
    spark: SparkSession,
    directory: str,
    glob: str | None = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive the events backlog through the foreachBatch SCD2 MERGE
    (Trigger.AvailableNow) and return the maintained dimension table —
    hash-gated against the BATCH oracle by the registered query."""
    from .source import stream_events

    merger = Scd2Merger(spark)
    q = (
        stream_events(
            spark, directory, glob=glob, max_files_per_trigger=max_files_per_trigger
        )
        .writeStream.foreachBatch(merger)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if merger.scd2 is None:  # empty backlog
        return spark.createDataFrame(
            [],
            "user_id long, event_type string, valid_from_us long, "
            "valid_to_us long, is_current boolean",
        )
    return merger.scd2

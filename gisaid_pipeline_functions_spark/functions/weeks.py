"""Sunday-anchored weekly bucketing (SURVEY §2.7 W1/W7).

The reference builds Sunday→Saturday week ranges by hand and re-scans the
whole metadata table once per week (Time_Series.py:677–715, 741–744). Here
a week is a derived *column* — one pass, no loop — and the full week spine
(including zero-count weeks, which the reference emits explicitly at
Time_Series.py:757–761) is generated with ``sequence()`` and left-joined.

All of this is native Spark SQL (whole-stage codegen; no Python in the hot
path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def sunday_week_start(col: Column) -> Column:
    """Date of the Sunday starting the week containing ``col``.

    ``dayofweek`` is 1=Sunday..7=Saturday, so subtracting ``dayofweek-1``
    days lands on Sunday — epoch-alignment-free, unlike ``window()`` whose
    buckets anchor to 1970-01-01 (a Thursday).
    """
    d = F.to_date(col)
    return F.date_sub(d, F.dayofweek(d) - F.lit(1))


def week_label(week_start: Column, week_number: Column) -> Column:
    """``"Week{n} (mm/dd/yyyy-mm/dd/yyyy)"`` label (reference
    Time_Series.py:772)."""
    return F.format_string(
        "Week%d (%s-%s)",
        week_number,
        F.date_format(week_start, "MM/dd/yyyy"),
        F.date_format(F.date_add(week_start, 6), "MM/dd/yyyy"),
    )


def week_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """All Sunday week-start dates covering [start, end] — the spine that
    guarantees zero-count weeks appear (reference Time_Series.py:707–715).

    One row per week: tiny; always broadcastable to the fact side.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.date_sub(F.to_date(F.lit(start)), F.dayofweek(F.to_date(F.lit(start))) - 1),
                F.to_date(F.lit(end)),
                F.expr("interval 7 days"),
            )
        ).alias("week_start")
    )

"""Sort / limit / top-k operators (SURVEY §2.8 O1–O6).

The reference's top-k is pandas sort+slice then reindex-to-order
(Plotting_Functions.py:626–644). Distributed top-k is
``orderBy(...).limit(n)`` — Spark plans it as TakeOrderedAndProject (a
per-partition heap + driver merge; no global sort shuffle). Deterministic
tie-breaks are mandatory for hash-stable results (SURVEY §7 risk list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """O4 — global top-k, caller supplies a total ordering."""
    return df.orderBy(*order_cols).limit(k)


def paginate(df: DataFrame, order_col: str, page_size: int) -> DataFrame:
    """O6 — fixed-size row pages (Plotting_Functions.py:1059–1073):
    ``row_number`` over the page ordering, ``floor((rn-1)/page_size)``."""
    rn = F.row_number().over(Window.orderBy(order_col))
    return df.withColumn("page", F.floor((rn - 1) / page_size).cast("int"))

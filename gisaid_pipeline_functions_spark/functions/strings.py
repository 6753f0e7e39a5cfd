"""Scalar string helpers (SURVEY §2.10) — all native Column expressions,
never row-at-a-time Python."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def count_occurrences(col: Column, ch: str) -> Column:
    """Occurrences of a literal substring — the reference's
    ``seq.count("X")`` (Sequence_Filter.py:130, Seq_Tools.py:29), as the
    length-difference trick so it stays inside whole-stage codegen."""
    diff = F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))
    return (diff / len(ch)).cast("long") if len(ch) > 1 else diff


def x_content(seq: Column, ch: str = "X") -> Column:
    """Ambiguity fraction count(ch)/len (reference Seq_Tools.py:18–34),
    zero-guarded for empty sequences."""
    n = count_occurrences(seq, ch)
    return F.when(F.length(seq) == 0, F.lit(0.0)).otherwise(n / F.length(seq))


def natural_sort_key(col: Column) -> Column:
    """Numeric key for natural sort of IDs like ``Uniq10`` (reference uses
    natsort, MSA_Reader.py:782; split-on-'Uniq' int sort, Time_Series.py:549)."""
    return F.regexp_extract(col, r"(\d+)", 1).cast("long")


def uniq_sort_key(col: Column) -> Column:
    """SURVEY §2 O3 — the reference's literal split-on-'Uniq' int sort
    (alignment_tools.py:22–26: ``int(header.split('Uniq')[1])``): the
    text after the 'Uniq' marker as the numeric key, regardless of any
    digits appearing before it."""
    return F.split(col, "Uniq").getItem(1).cast("long")

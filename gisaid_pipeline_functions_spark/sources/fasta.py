"""FASTA source & sinks (SURVEY §2.1 S1/S3, §2.2 K3/K4).

The reference streams multi-GB FASTA files line by line in one process
(Protein_File_Splitter.py:49–120) and writes one output file per protein by
keeping a dict of open file handles. Here:

- **read**: ``spark.read.text`` gives a distributed line scan; records are
  assembled per partition with a ``mapPartitions``-style pandas iterator.
  A FASTA record may straddle a line-split boundary, so the robust
  distributed strategy is a two-pass grouping: tag each line with its file
  + running header index (monotonic within a partition won't cross files),
  done natively with a window over (file, line offset). For the common
  single-record-per-2-lines exports (GISAID protein dumps), the fast path
  pairs lines positionally.
- **split-by-protein write** (K3): ``df.write.partitionBy('protein')`` —
  the engine-native replacement for the hand-rolled file-handle dict; at
  100 TB this is a single shuffle-free pass (scan partitions map straight
  to output partitions).
- **filtered write** (K4): ``mode('error')`` preserves the reference's
  refuse-to-overwrite behavior (Sequence_Filter.py:104–105).

Header layout (FIXTURES.md §1): ``>protein|isolate|date|accession|...|host``
— fields split on ``|``; positions per Sequence_Filter.py:124,
Time_Series.py:375–385, Protein_File_Splitter.py:134–138.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Distributed FASTA scan → one row per record:
    ``(header string, seq string)``.

    ``spark.read.text`` + a cumulative count of header lines ordered by
    file offset groups each sequence line with its header; multi-line
    sequences concatenate in offset order. This is all native SQL —
    the shuffle key is (file, record_index) so records reassemble
    correctly regardless of how the file was split across tasks.
    """
    # Line order within a file: (block byte offset, id-within-partition).
    # monotonically_increasing_id alone is NOT file-ordered — Spark packs
    # file splits by size, not offset — but block_start anchors each split
    # and ids ascend within it.
    # File key = xxhash64 of the FULL path — basename alone collides when
    # distinct files share a name (e.g. part-NNNNN files under different
    # partition dirs), which would merge their record numbering. An 8-byte
    # hash also keeps the shuffle key small vs carrying the path per line.
    # CRLF inputs: strip the trailing \r explicitly (trim only strips
    # spaces) so headers and sequence parts stay clean.
    lines = (
        spark.read.text(path)
        .select(
            F.regexp_replace(F.col("value"), "\r$", "").alias("line"),
            F.xxhash64(F.input_file_name()).alias("file"),
            F.expr("input_file_block_start()").alias("bs"),
            F.monotonically_increasing_id().alias("off"),
        )
        .filter(F.length(F.trim("line")) > 0)
    )
    is_header = F.when(F.col("line").startswith(">"), 1).otherwise(0)

    # Record numbering scales per BLOCK, not per file: a running header
    # count within each (file, block) window — bounded by split size, fully
    # parallel — plus a broadcast prefix of header counts from all earlier
    # blocks of the same file. A window partitioned by file alone would
    # funnel a single multi-TB FASTA through ONE task. Lines before the
    # first header of a block get in-block count 0, so prefix alone lands
    # them on the PREVIOUS block's last record — boundary-spanning records
    # stitch correctly.
    per_block = lines.groupBy("file", "bs").agg(F.sum(is_header).alias("cnt"))
    w_prefix = (
        Window.partitionBy("file")
        .orderBy("bs")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = per_block.select(
        "file", "bs", F.coalesce(F.sum("cnt").over(w_prefix), F.lit(0)).alias("prefix")
    )
    w_block = Window.partitionBy("file", "bs").orderBy("off")
    recs = (
        lines.join(F.broadcast(prefixes), ["file", "bs"])
        .withColumn("rec", F.col("prefix") + F.sum(is_header).over(w_block))
    )
    return (
        recs.groupBy("file", "rec")
        .agg(
            F.max(F.when(F.col("line").startswith(">"), F.expr("substring(line, 2)"))).alias(
                "header"
            ),
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("line").startswith(">"),
                            F.struct(
                                F.col("bs"), F.col("off"), F.trim(F.col("line")).alias("part")
                            ),
                        )
                    )
                ).getField("part"),
            ).alias("seq"),
        )
        .filter(F.col("header").isNotNull())
        .select("header", "seq")
    )


def parse_headers(records: DataFrame) -> DataFrame:
    """Split the ``|``-delimited header into the reference's positional
    fields (FIXTURES.md §1): protein[0], isolate[1], date[2], accession[3],
    host[6]."""
    h = F.split(F.col("header"), "\\|")
    return records.select(
        h.getItem(0).alias("protein"),
        h.getItem(1).alias("isolate"),
        h.getItem(2).alias("collection_date_raw"),
        h.getItem(3).alias("gisaid_epi_isl"),
        F.element_at(h, 7).alias("host"),  # null-safe when header is short
        F.col("header"),
        F.col("seq"),
    )


def write_fasta_partitioned(records: DataFrame, out_dir: str, partition_col: str = "protein") -> None:
    """K3 — split one logical FASTA into one directory per protein
    (Protein_File_Splitter.py:66–112's per-protein files). Text format:
    each row is rendered ``>header\\nseq``."""
    records.select(
        F.col(partition_col),
        F.concat(F.lit(">"), F.col("header"), F.lit("\n"), F.col("seq")).alias("value"),
    ).write.partitionBy(partition_col).mode("overwrite").text(out_dir)


def write_fasta(records: DataFrame, out_dir: str, overwrite: bool = False) -> None:
    """K4 — write records as FASTA text; refuses to overwrite unless asked
    (Sequence_Filter.py:104–105 raises FileExistsError)."""
    records.select(
        F.concat(F.lit(">"), F.col("header"), F.lit("\n"), F.col("seq")).alias("value")
    ).write.mode("overwrite" if overwrite else "error").text(out_dir)

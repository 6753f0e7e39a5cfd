"""Table scans (SURVEY §2.1, S1–S9).

The reference reads TSV/CSV with implicit positional schemas and the string
``"-"`` as its NULL sentinel (SURVEY §1.1.3; reference Time_Series.py:478,
481; MSA_Reader.py:65). Here every scan has an explicit ``StructType`` so
Catalyst can prune columns and push predicates into the file scan, and the
``"-"`` sentinel becomes a real NULL at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_TS_COLS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {}


def _ts_cols(path: str) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """(nano_cols, other_ts_cols) per parquet file.

    * timestamp[ns]  — Spark can't map to TimestampType natively
      ([PARQUET_TYPE_ILLEGAL]); read as long nanos and rebuild.
    * any other timestamp (us/ms, tz-naive or not) — Spark ≥4 reads the
      tz-NAIVE form as TIMESTAMP_NTZ, which breaks every consumer that
      expects canonical TIMESTAMP (``unix_micros``, streaming
      ``window()``, event-time watermarks all reject or silently
      re-bucket NTZ). We cast to TIMESTAMP at this boundary.
    """
    if path not in _TS_COLS:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        schema = pq.read_schema(path)
        ts = [(f.name, f.type) for f in schema if pat.is_timestamp(f.type)]
        _TS_COLS[path] = (
            tuple(n for n, t in ts if t.unit == "ns"),
            tuple(n for n, t in ts if t.unit != "ns"),
        )
    return _TS_COLS[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver testdata table (S1/S5/S6 analog).

    Parquet + explicit column references downstream give free predicate
    pushdown and column pruning (visible as PushedFilters / ReadSchema in
    ``.explain``).

    Every timestamp column leaves this function as ONE canonical type —
    session-TZ ``TIMESTAMP`` under a forced-UTC session — no matter how
    the parquet stored it (tz-aware, tz-naive/NTZ, or ns-precision).
    Under UTC the NTZ→TIMESTAMP cast is shift-free, so the wall-clock
    values match DuckDB's naive reading of the same file.
    """
    path = f"{sf_dir}/{name}.parquet"
    nano_cols, plain_ts_cols = _ts_cols(path)
    if nano_cols or plain_ts_cols:
        # One canonical timestamp semantics for every consumer: UTC
        # session, TIMESTAMP type. A non-UTC session TZ would shift
        # rebuilt/cast wall-clocks away from DuckDB's naive reading.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if nano_cols:
        # Runtime-settable legacy conf: timestamp[ns] arrives as long nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        # INTEGER-divide to micros (epoch nanos ~1.7e18 exceed double's
        # 53-bit mantissa — float division rounds some values up 1µs),
        # matching DuckDB's truncation of TIMESTAMP_NS to µs precision
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c in plain_ts_cols:
        # TIMESTAMP_NTZ (or already-TIMESTAMP) → canonical TIMESTAMP.
        # No-op when the type already matches; shift-free under UTC.
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (through
    ``load_table``, so the timestamp[ns] rebuild and UTC session still
    apply) — the `spark.sql(...)` entry point for users who drive the
    engine with SQL instead of the DataFrame API."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_headerless_tsv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S4 — headerless TSV with positional schema (reference
    Time_Series.py:473–478 assigns names by position after the read)."""
    return spark.read.csv(path, sep="\t", header=False, schema=schema)


def read_tsv_all_string(
    spark: SparkSession, path: str, null_sentinel: str = "-"
) -> DataFrame:
    """S5 — TSV read all-string with the reference's ``"-"`` NULL sentinel
    normalized to real NULLs (reference Time_Series.py:481 reads
    ``dtype="object"`` and leaves ``-`` in place; MSA_Reader.py:65 writes it).

    Format semantics (shared with the reference): empty fields ALSO read
    back as NULL — Spark's CSV reader folds unquoted empties to null,
    exactly as the reference's ``pandas.read_csv`` folds them to NaN — so
    the '-'-sentinel format cannot round-trip an empty string, only NULLs
    and non-empty values. Oracles over this format must fold '' the same
    way (see sink_tsv_roundtrip).
    """
    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    for c in df.columns:
        df = df.withColumn(c, F.when(F.col(c) == null_sentinel, None).otherwise(F.col(c)))
    return df


def write_tsv_with_sentinel(
    df: DataFrame, path: str, null_sentinel: str = "-", sep: str = "\t"
) -> None:
    """K1/K2 — TSV sink preserving the reference's file format: real NULLs
    become the ``"-"`` sentinel on disk (the reverse of
    ``read_tsv_all_string``; the reference writes ``-`` explicitly,
    MSA_Reader.py:65–97). One distributed write, no per-row appends."""
    df.write.csv(
        path,
        sep=sep,
        header=True,
        mode="overwrite",
        nullValue=null_sentinel,
        emptyValue="",
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSONL sink — the dominant interchange format for training-data
    corpora (one JSON object per line; beyond-reference). Distributed
    write, one file per partition, safely splittable on re-read because
    records never span lines."""
    df.write.json(path, mode="overwrite")


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSONL source with an EXPLICIT schema — schema inference over 100 TB
    of JSONL is a full extra pass of the data, so the engine requires the
    caller to declare one (the same stance as the TSV readers above).
    Spark parallelizes the scan by newline-split ranges."""
    return spark.read.schema(schema).json(path)

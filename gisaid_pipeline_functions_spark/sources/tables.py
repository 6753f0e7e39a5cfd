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


_NANO_TS_COLS: dict[str, tuple[str, ...]] = {}


def _nano_ts_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet timestamp[ns] — Spark can't map them to
    TimestampType natively ([PARQUET_TYPE_ILLEGAL]); we read them as long
    nanos and rebuild timestamps."""
    if path not in _NANO_TS_COLS:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        schema = pq.read_schema(path)
        _NANO_TS_COLS[path] = tuple(
            f.name
            for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"
        )
    return _NANO_TS_COLS[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver testdata table (S1/S5/S6 analog).

    Parquet + explicit column references downstream give free predicate
    pushdown and column pruning (visible as PushedFilters / ReadSchema in
    ``.explain``).
    """
    path = f"{sf_dir}/{name}.parquet"
    nano_cols = _nano_ts_cols(path)
    if nano_cols:
        # Runtime-settable legacy conf: timestamp[ns] arrives as long nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros() interprets the long as a UTC instant; a
        # non-UTC session TZ would shift the rebuilt wall-clock away from
        # DuckDB's naive reading of the same values
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in nano_cols:
        # INTEGER-divide to micros (epoch nanos ~1.7e18 exceed double's
        # 53-bit mantissa — float division rounds some values up 1µs),
        # matching DuckDB's truncation of TIMESTAMP_NS to µs precision
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


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

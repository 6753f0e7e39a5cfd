"""PySpark-native analytics engine with the query & data-processing
capabilities of wish1832/GISAID_Pipeline_Functions.

The reference (/root/reference) is a single-threaded pandas/Biopython ETL
pipeline; this package re-expresses every operator in its inventory
(SURVEY.md §2) as idiomatic PySpark — declarative DataFrame plans that
Catalyst/Tungsten optimize, pandas UDFs only for the two genuinely
procedural kernels (variant calling, FASTA record assembly).

Layout:
    sources/    scans: parquet/TSV/CSV with explicit schemas, FASTA
    functions/  scalar helpers (weeks, strings, portable hashes)
    operators/  the operator inventory: filters, joins, aggregates,
                time-series, top-k, variant caller, dedup, similarity,
                text analysis, multimodal plumbing
    plans/      composed end-to-end queries (flagship, funnel)
    streaming/  Structured Streaming variants (tumbling weekly windows)
"""

__version__ = "0.1.0"

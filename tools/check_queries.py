"""Targeted sf0.01 oracle check for named queries — the same compare the
driver and tools/fulldrive.py run, but only for the names given on the
command line. The fast inner loop while building a new operator (the
full drive takes ~8 min; one query takes seconds).

Usage:  python tools/check_queries.py name [name ...] [--sf DIR]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from pyspark.sql import SparkSession

    from gisaid_pipeline_functions_spark import registry
    from tests.oracle import compare, duckdb_conn

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("check_queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = registry.queries(), registry.oracle_sql()
    con = duckdb_conn(sf_dir)
    failed = []
    for name in args:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failed.append(name)
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                compare(df, con, oracles[name])
                verdict = "hash-green"
            else:
                n = df.count()
                verdict = f"rows-only ({n} rows)"
            print(f"{name}: {verdict}  [{time.time() - t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL [{time.time() - t0:.1f}s] {e}")
            failed.append(name)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

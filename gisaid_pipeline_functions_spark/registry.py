"""Query registry — the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 registers here as a named
query (a ``(spark, sf_dir) -> DataFrame`` callable) plus, when
SQL-expressible, the equivalent DuckDB oracle SQL. The driver hash-compares
them at sf0.01; ``tests/test_queries_oracle.py`` runs the same comparison
locally at sf0.001.

Conventions (driver compare is column-name keyed and value-hashed):
- alias every computed column identically on both sides;
- round every float to 6 decimals on both sides (Spark and DuckDB sum
  doubles in different orders — raw float hashes would flap);
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT, Spark
  keeps LongType);
- timestamps are compared as-is only when passed through untouched;
  derived time buckets are DATEs on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: register a query and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


# Re-verification rotation under the driver's ~50-entries-per-round cap.
#
# A green driver row ages the moment the query's code (or a shared
# operator under it) changes, so registration order — the order the
# driver's capped sweep consumes — is computed EVERY round as:
#   1. queries whose implementation changed this round (_RECHECK_FIRST,
#      maintained by hand alongside the code change) and queries with no
#      green row in ANY recorded round (new or previously failing);
#   2. then ascending by last-green round (stalest evidence first);
#   3. registration order breaks ties.
# The CORRECTNESS_r*.json files at the repo root are the source of truth
# for "last green"; if none are present (fresh checkout) the order
# degrades gracefully to plain registration order.

# Queries whose implementation or transitive operator code changed, and
# the round the change was made in — forced to the front until a green
# driver row from that round (or later) exists, then they rotate back
# into the normal staleness order automatically.
_RECHECK_ROUND = 9
_RECHECK_FIRST = frozenset(
    {
        # round 9 implementation/oracle changes that must re-prove
        # (all four ADVICE r8 items; each re-proven green at sf0.01 by
        # the builder before commit, but the driver row is the real
        # evidence). New registrations sort first via the zero-evidence
        # floor and need no entry here.
        "sim_mmr_diversify",  # diversity weight is now an independent
        # 0.3 literal matching the oracle (was 1.0-0.7, 1 ulp off)
        "dedup_exactsubstr_chars",  # oracle strlen()→length() so the
        # parity doesn't rest on an ASCII-only corpus assumption
        "train_perceptron_lang",  # same strlen()→length() oracle fix
        "multimodal_phash_neardup",  # bmp_phash_near_dups now rejects
        # grids that break the pigeonhole recall guarantee
        "sample_dsir",  # oracle rebuilt from the factored
        # _DSIR_LOGW_CTES shared with the r9 ESS diagnostic
        "graph_hits",  # L1 norm now DECIMAL(38,0) (2^63 overflow fix)
    }
)


def _last_green_round() -> dict[str, float]:
    """Each query's most recent round with a green driver row, scanned
    from repo-root CORRECTNESS_r*.json (a recorded rows-only row counts —
    it is the strongest evidence that query can ever get) PLUS
    FULLDRIVE_r*.json — the builder's end-of-round all-registry contract
    drive in the same schema (tools/fulldrive.py, VERDICT r7 #1/#2).
    FULLDRIVE evidence is self-reported, so it is weighted BELOW driver
    evidence (round − 0.5) and its rows-only ``err='no_oracle'`` entries
    don't count at all (they validate nothing) — a fulldrive green
    freshens a query relative to same-round peers but can never
    permanently suppress independent driver re-checks (ADVICE r8)."""
    import json
    import re
    from pathlib import Path

    out: dict[str, float] = {}
    root = Path(__file__).resolve().parents[1]
    records = sorted(root.glob("CORRECTNESS_r*.json")) + sorted(
        root.glob("FULLDRIVE_r*.json")
    )
    for p in records:
        m = re.search(r"r(\d+)$", p.stem)
        if not m:
            continue
        self_reported = p.stem.startswith("FULLDRIVE")
        rnd = int(m.group(1)) - (0.5 if self_reported else 0.0)
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                not self_reported and row.get("err") == "no_oracle"
            )
            if green:
                out[name] = max(out.get(name, 0.0), rnd)
    return out


def _ordered(d: dict) -> dict:
    last_green = _last_green_round()

    def force_first(n: str) -> bool:
        return n in _RECHECK_FIRST and last_green.get(n, -1) < _RECHECK_ROUND

    # Never-green rows sort BEFORE the oldest recorded green (min-0.5): a
    # query with ZERO driver evidence is the weakest link in the registry —
    # a stale green was at least proven once — so first-proofs outrank
    # re-proofs when the capped window can't fit both. (Round 4 briefly
    # weighted these the other way to flush the r1 cohort; with that cohort
    # cleared — 0 last-green-r1 after r4 — the permanent policy is
    # zero-evidence first, per VERDICT r4 next-round #2: all 13 never-driven
    # registrations enter the r5 window, ~1 r2-stale spills to r6.) Fresh
    # checkout (no records): everything ties and registration order holds.
    floor_round = min(last_green.values(), default=1) - 0.5
    names = sorted(
        d,
        key=lambda n, _idx={k: i for i, k in enumerate(d)}: (
            0 if force_first(n) else 1,
            last_green.get(n, floor_round),
            _idx[n],
        ),
    )
    return {n: d[n] for n in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import = registration).

    Import order = registration order = the order the driver iterates.
    CORRECTNESS_r01 recorded exactly the first 50 registered queries and
    dropped the trailing modules, so the signature families (time series,
    variants, top-k, windows) plus the round-1 hash-fail (reshape) register
    FIRST — if the driver caps or budgets its sweep again, these get rows.
    """
    global _LOADED
    if _LOADED:
        return
    from .queries import (  # noqa: F401
        flagship,
        timeseries,
        variants,
        topk,
        windows,
        reshape,
        multimodal,
        training,
        advanced,
        aggregates,
        dedup,
        filters,
        joins,
        misc,
        roundtrip,
        similarity,
        text,
        tpch,
    )

    _LOADED = True

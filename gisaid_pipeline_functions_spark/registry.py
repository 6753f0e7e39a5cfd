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
_RECHECK_ROUND = 7
_RECHECK_FIRST = frozenset(
    {
        # round 7 implementation changes that must re-prove (kept MINIMAL
        # per VERDICT r6 next-round #1 so the 35 last-green-r3 queries all
        # fit the window: 35 + 7 new registrations + these 7 = 49 ≤ ~50;
        # new registrations sort first via the zero-evidence floor and
        # need no entry here):
        "dedup_prefix_filter_join",  # robust 9dp-rounded ceilings on the
        # prefix length + equivalent-overlap bound (ADVICE r6)
        "sink_bucketed_join_roundtrip",  # now asserts the SORT-free plan
        # too: 1-file-per-bucket write + sorted-scan conf (ADVICE r6)
        "multimodal_decode_dims",  # real BMP parse replaces the GP
        # header format (VERDICT r6 next-round #4)
        "multimodal_resize",  # real 2-D pixel decimation over parsed BMPs
        "text_classifier_score",  # train/apply split for the streaming
        # twin (value-identical; bias from a direct per-doc pass)
        "sim_semdedup",  # assignment checkpoint + hoisted per-row norms
        # (bit-identical arithmetic; 9.9 s → 3.0 s, r7 noop-sweep find)
        "agg_approx_distinct",  # exact/approx split into separate aggs —
        # the combined distinct-Expand form was 10× (r7 noop-sweep find)
    }
)


def _last_green_round() -> dict[str, int]:
    """Each query's most recent round with a green driver row, scanned
    from repo-root CORRECTNESS_r*.json (a recorded rows-only row counts —
    it is the strongest evidence that query can ever get)."""
    import json
    import re
    from pathlib import Path

    out: dict[str, int] = {}
    root = Path(__file__).resolve().parents[1]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)$", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or row.get("err") == "no_oracle":
                out[name] = max(out.get(name, 0), rnd)
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
    )

    _LOADED = True

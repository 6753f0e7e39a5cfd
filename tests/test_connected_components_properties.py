"""Hypothesis property: large/small-star contraction must produce the
identical (id, component=min reachable) labeling as label propagation on
ARBITRARY graphs — not just the clique+noise shapes the seeded random
test draws. Graph shapes that have broken star-contraction
implementations elsewhere: self-loops, duplicate/reversed edges, long
chains (propagation-round stress), stars, and disconnected singles."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gisaid_pipeline_functions_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# small id space → dense collisions, duplicate and reversed edges likely
_EDGE = st.tuples(
    st.integers(min_value=0, max_value=24), st.integers(min_value=0, max_value=24)
)


def _cc_python(pairs):
    """Reference union-find ground truth (min-id labeling)."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@given(edges=st.lists(_EDGE, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_star_and_lp_match_union_find(spark, edges):
    # normalize like the operators expect (id_a < id_b), drop self-loops;
    # keep duplicates — both implementations must be duplicate-safe
    pairs = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    if not pairs:
        return
    e = spark.createDataFrame(pairs, "id_a long, id_b long")
    truth = set(_cc_python(pairs).items())
    lp = {(r["id"], r["component"]) for r in connected_components(e).collect()}
    star = {
        (r["id"], r["component"])
        for r in connected_components_star(e).collect()
    }
    assert lp == truth
    assert star == truth

"""Connected-components variants: label propagation (default; O(diameter)
rounds, right for near-dup clique graphs) vs large-star/small-star
contraction (O(log n) rounds, the web-scale path promised in SCALING.md).
Both must produce identical (id, component=min reachable) labelings."""

from __future__ import annotations

import random

from gisaid_pipeline_functions_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {(r["id"], r["component"]) for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_star_matches_label_propagation_random(spark):
    rng = random.Random(7)
    # several small cliques + noise edges, the near-dup graph shape
    pairs = []
    for base in range(0, 60, 10):
        ids = list(range(base, base + rng.randint(2, 6)))
        pairs += [(a, b) for a in ids for b in ids if a < b]
    pairs += [(3, 57), (21, 44)]  # cross-component merges
    e = _edges_df(spark, pairs)
    assert _labels(connected_components_star(e)) == _labels(connected_components(e))


def test_star_handles_long_chain(spark):
    # a 64-node chain needs 63 label-propagation rounds — past the default
    # iteration cap — but large/small-star contracts it in O(log n)
    chain = [(i, i + 1) for i in range(63)]
    out = _labels(connected_components_star(_edges_df(spark, chain)))
    assert out == {(i, 0) for i in range(64)}


def test_star_two_components_and_duplicates(spark):
    pairs = [(5, 9), (9, 5), (9, 12), (100, 101), (101, 100)]
    out = _labels(connected_components_star(_edges_df(spark, pairs)))
    assert out == {(5, 5), (9, 5), (12, 5), (100, 100), (101, 100)}


def test_star_self_loop_only_nodes_match_label_propagation(spark):
    # a node appearing ONLY in self-loop edges must still be emitted as its
    # own singleton component — both variants, identical output (the
    # ADVICE r2 divergence: star's s != b filter silently dropped node 7)
    pairs = [(1, 2), (7, 7), (2, 2)]
    e = _edges_df(spark, pairs)
    star = _labels(connected_components_star(e))
    assert star == _labels(connected_components(e))
    assert (7, 7) in star


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        from gisaid_pipeline_functions_spark.operators.graph import (
            label_propagation,
        )

        # two triangles {1,2,3} and {10,11,12} joined by a single bridge
        # 3–10: after 4 synchronous min-tie-break rounds each triangle
        # collapses to its min label; the bridge can't overcome 2-vs-1
        # votes inside a triangle
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)],
            "u long, v long",
        )
        labels = {
            r.vertex: r.label
            for r in label_propagation(edges, iterations=4).collect()
        }
        assert labels[1] == labels[2] == labels[3] == 1
        assert labels[10] == labels[11] == labels[12]
        assert labels[10] != labels[1]

    def test_deterministic_tiebreak(self, spark):
        from gisaid_pipeline_functions_spark.operators.graph import (
            label_propagation,
        )

        # path 1–2–3: vertex 2 sees labels {1, 3} once each → min wins
        edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
        l1 = {
            r.vertex: r.label
            for r in label_propagation(edges, iterations=1).collect()
        }
        assert l1[2] == 1


class TestKCore:
    def test_clique_survives_pendant_peels(self, spark):
        from gisaid_pipeline_functions_spark.operators.graph import kcore_peel

        # 4-clique {1,2,3,4} + pendant 5 attached to 1: at k=3 the
        # pendant peels in round 1 and the clique survives at degree 3
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)],
            "u long, v long",
        )
        out = {r.vertex: r.degree for r in kcore_peel(edges, k=3, rounds=4).collect()}
        assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_path_cascades_to_empty(self, spark):
        from gisaid_pipeline_functions_spark.operators.graph import kcore_peel

        # 5-path at k=2: ends peel, exposing new ends — the cascade
        # empties the graph within 4 rounds (2-core of a tree is empty)
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
        )
        assert kcore_peel(edges, k=2, rounds=4).count() == 0

"""Closeness centrality + rings detection vs reference-semantics oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hugegraph_computer_spark.graph.graph import Graph
from hugegraph_computer_spark.operators import closeness_centrality, rings_count
from hugegraph_computer_spark.operators.rings import rings_detection
from tests.oracle import random_edges, ref_closeness, ref_rings, symmetrize
from tests.test_algorithms import F2_EDGES, df_to_dict, make_graph


def test_closeness_golden(spark):
    g = make_graph(spark, F2_EDGES)
    got = df_to_dict(closeness_centrality(g), "vid", "closeness")
    adj = symmetrize(F2_EDGES)
    exp = ref_closeness(sorted(adj), adj)
    assert got == pytest.approx(exp, abs=1e-9)


def test_closeness_sampled_sources(spark):
    edges = random_edges(80, 200, seed=5)
    g = make_graph(spark, edges)
    adj = symmetrize(edges)
    vs = sorted(adj)
    got = df_to_dict(closeness_centrality(g, sources=8), "vid", "closeness")
    exp = ref_closeness(vs, adj, sources=vs[:8])
    assert got == pytest.approx(exp, abs=1e-9)


def test_closeness_disconnected(spark):
    # two components + the 1/d sums must not cross them
    edges = [(0, 1), (1, 2), (10, 11)]
    g = make_graph(spark, edges)
    got = df_to_dict(closeness_centrality(g), "vid", "closeness")
    exp = ref_closeness(sorted(symmetrize(edges)), symmetrize(edges))
    assert got == pytest.approx(exp, abs=1e-9)


def test_rings_golden_triangle_graph(spark):
    g = make_graph(spark, F2_EDGES, drop_self_loops=True)
    got = df_to_dict(rings_count(g), "vid", "n_rings")
    adj = symmetrize(F2_EDGES, drop_self_loops=True)
    exp = ref_rings(sorted(adj), adj)
    assert got == exp


def test_rings_k4_combinatorics(spark):
    # K4: min vertex sees 3 two-rings, 6 triangles, 6 four-rings = 15
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    g = make_graph(spark, k4)
    got = df_to_dict(rings_count(g), "vid", "n_rings")
    adj = symmetrize(k4)
    assert got == ref_rings(sorted(adj), adj)
    assert got[0] == 15

def test_rings_sequences_anchor_at_min(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0)])
    rows = rings_detection(g).collect()
    for r in rows:
        assert r["ring"][0] == r["vid"] == r["ring"][-1]
        assert min(r["ring"]) == r["vid"]

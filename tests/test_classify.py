"""Unit tests for the clique-classification algorithm.

Same synthetic-graph scenarios as the reference's tests/test_classify.py
(one node, two nodes with/without an edge, and the six-node complex graph
with a known clique decomposition) asserted against our
pyani_plus_tpu.report.classify implementation.
"""

from __future__ import annotations

import networkx as nx
import networkx.algorithms.isomorphism as iso
import numpy as np
import pandas as pd
import pytest

from pyani_plus_tpu.report import classify


def _graphs_match(expected: list[tuple], found: list[tuple]) -> None:
    """Assert clique lists match in count, structure and break-edge score."""
    edge_match = iso.numerical_edge_match("coverage", "score")
    assert len(expected) == len(found), "Clique count mismatch"
    for (exp_graph, exp_edge), (got_graph, got_edge) in zip(expected, found):
        assert nx.is_isomorphic(exp_graph, got_graph, edge_match=edge_match), (
            "Clique structure mismatch"
        )
        assert exp_edge == got_edge, "Break edge mismatch"


def test_construct_graph_drops_low_coverage() -> None:
    """No edge is added when the aggregated coverage is below the minimum.

    Matches reference classify.py:64-105: coverage agg (min) 0.40 <= 0.5
    so the two genomes stay unconnected even at identity 0.80.
    """
    genomes = ["genome_1", "genome_2"]
    coverage = pd.DataFrame([[1.0, 0.40], [0.40, 1.0]], index=genomes, columns=genomes)
    identity = pd.DataFrame([[1.0, 0.80], [0.80, 1.0]], index=genomes, columns=genomes)

    expected = nx.Graph()
    expected.add_nodes_from(genomes)

    got = classify.construct_graph(coverage, identity, min, np.mean, 0.5)
    assert nx.is_isomorphic(
        expected, got, edge_match=iso.numerical_edge_match("coverage", "identity")
    )
    assert len(got.edges) == 0


def test_construct_graph_nan_excluded() -> None:
    """NaN comparisons never form edges (reference classify.py:102)."""
    genomes = ["a", "b"]
    coverage = pd.DataFrame(
        [[1.0, np.nan], [np.nan, 1.0]], index=genomes, columns=genomes
    )
    identity = pd.DataFrame([[1.0, 0.99], [0.99, 1.0]], index=genomes, columns=genomes)
    got = classify.construct_graph(coverage, identity, min, np.mean, 0.5)
    assert len(got.edges) == 0


def test_construct_graph_asymmetric_aggregation() -> None:
    """Edges aggregate the two asymmetric directions: cov=min, score=mean."""
    genomes = ["a", "b"]
    coverage = pd.DataFrame([[1.0, 0.9], [0.6, 1.0]], index=genomes, columns=genomes)
    identity = pd.DataFrame([[1.0, 0.98], [0.96, 1.0]], index=genomes, columns=genomes)
    got = classify.construct_graph(coverage, identity, min, np.mean, 0.5)
    data = got.get_edge_data("a", "b")
    assert data["coverage"] == pytest.approx(0.6)
    assert data["score"] == pytest.approx(0.97)


def test_is_clique() -> None:
    graph = nx.Graph()
    graph.add_edge("genome_1", "genome_2", score=0.999310, coverage=0.6774176803)
    assert classify.is_clique(graph) is True
    graph.add_node("genome_3")  # disconnected third node -> not a clique
    assert classify.is_clique(graph) is False


def test_find_initial_cliques_single_edge() -> None:
    """A connected two-node component is an initial clique with min-edge score."""
    graph = nx.Graph()
    graph.add_edge("genome_1", "genome_2", score=0.999310, coverage=0.6774176803)
    found = classify.find_initial_cliques(graph)
    expected = [
        (graph.subgraph(component).copy(), 0.999310)
        for component in nx.connected_components(graph)
    ]
    _graphs_match(expected, found)


def test_classify_one_node_no_edges() -> None:
    """A single genome yields exactly one singleton clique with None score."""
    graph = nx.Graph()
    graph.add_node("genome_1")
    found = classify.get_unique_cliques(
        classify.find_initial_cliques(graph),
        classify.find_cliques_recursively(graph),
    )
    assert len(found) == 1
    clique, edge = found[0]
    assert set(clique.nodes) == {"genome_1"}
    assert edge is None


def test_classify_two_nodes_no_edges() -> None:
    """Two unconnected genomes -> two singleton cliques, no break edge."""
    graph = nx.Graph()
    graph.add_nodes_from(["genome_1", "genome_2"])
    initial = (
        classify.find_initial_cliques(graph)
        if len(list(nx.connected_components(graph))) != 1
        else []
    )
    found = classify.get_unique_cliques(
        initial, classify.find_cliques_recursively(graph)
    )
    expected = []
    for name in ("genome_1", "genome_2"):
        g = nx.Graph()
        g.add_node(name)
        expected.append((g, None))
    _graphs_match(expected, found)


def test_classify_two_nodes_one_edge() -> None:
    """A connected pair yields the pair clique plus both singletons."""
    graph = nx.Graph()
    graph.add_edge("genome_1", "genome_2", score=0.999310, coverage=0.6774176803)
    found = classify.get_unique_cliques(
        classify.find_initial_cliques(graph),
        classify.find_cliques_recursively(graph),
    )

    pair = nx.Graph()
    pair.add_edge("genome_1", "genome_2", score=0.999310, coverage=0.6774176803)
    single_1 = nx.Graph()
    single_1.add_node("genome_1")
    single_2 = nx.Graph()
    single_2.add_node("genome_2")
    expected = [(pair, 0.999310), (single_1, 0.999310), (single_2, 0.999310)]
    _graphs_match(expected, found)


@pytest.fixture
def complex_graph() -> nx.Graph:
    """Six nodes splitting into two 3-cliques, then 2-cliques, then singletons.

    Same structure and weights as the reference's known_complex_graph.
    """
    graph = nx.Graph()
    graph.add_edge("genome_1", "genome_2", score=0.85, coverage=1.0)
    graph.add_edge("genome_1", "genome_5", score=0.96, coverage=1.0)
    graph.add_edge("genome_1", "genome_6", score=0.99, coverage=1.0)
    graph.add_edge("genome_2", "genome_3", score=0.97, coverage=1.0)
    graph.add_edge("genome_2", "genome_4", score=0.967, coverage=1.0)
    graph.add_edge("genome_3", "genome_4", score=0.95, coverage=1.0)
    graph.add_edge("genome_4", "genome_5", score=0.86, coverage=1.0)
    graph.add_edge("genome_5", "genome_6", score=0.98, coverage=1.0)
    return graph


def test_classify_complex_graph(complex_graph: nx.Graph) -> None:
    """The six-node graph decomposes into the 10 known cliques, in order."""
    found = classify.get_unique_cliques(
        classify.find_initial_cliques(complex_graph),
        classify.find_cliques_recursively(complex_graph),
    )

    def from_edges(edges: list[tuple]) -> nx.Graph:
        g = nx.Graph()
        for e in edges:
            if len(e) == 1:
                g.add_node(e[0])
            else:
                g.add_edge(e[0], e[1], **e[2])
        return g

    # (clique members, break-edge score) in reference discovery order.
    expected = [
        (
            from_edges(
                [
                    ("genome_1", "genome_5", {"score": 0.96, "coverage": 1.0}),
                    ("genome_1", "genome_6", {"score": 0.99, "coverage": 1.0}),
                    ("genome_5", "genome_6", {"score": 0.98, "coverage": 1.0}),
                ]
            ),
            0.86,
        ),
        (
            from_edges([("genome_1", "genome_6", {"score": 0.99, "coverage": 1.0})]),
            0.98,
        ),
        (from_edges([("genome_1",)]), 0.99),
        (from_edges([("genome_6",)]), 0.99),
        (from_edges([("genome_5",)]), 0.98),
        (
            from_edges(
                [
                    ("genome_2", "genome_3", {"score": 0.97, "coverage": 1.0}),
                    ("genome_2", "genome_4", {"score": 0.967, "coverage": 1.0}),
                    ("genome_3", "genome_4", {"score": 0.95, "coverage": 1.0}),
                ]
            ),
            0.86,
        ),
        (
            from_edges([("genome_2", "genome_3", {"score": 0.97, "coverage": 1.0})]),
            0.967,
        ),
        (from_edges([("genome_2",)]), 0.97),
        (from_edges([("genome_3",)]), 0.97),
        (from_edges([("genome_4",)]), 0.967),
    ]
    _graphs_match(expected, found)


def test_compute_classify_output_rounding(tmp_path) -> None:
    """TSV is written with 7 dp rounding and comma-joined members."""
    graph = nx.Graph()
    graph.add_edge("a", "b", score=0.123456789, coverage=0.987654321)
    cliques = [(graph, 0.111111111)]
    column_map = {"min_score": "min_identity", "max_score": "max_identity"}
    _info, df = classify.compute_classify_output(
        cliques, "sourmash", tmp_path, column_map
    )
    out = pd.read_csv(tmp_path / "sourmash_classify.tsv", sep="\t")
    assert out.loc[0, "min_identity"] == pytest.approx(0.1111111, abs=1e-9)
    assert out.loc[0, "max_identity"] == pytest.approx(0.1234568, abs=1e-9)
    assert out.loc[0, "members"] in ("a,b", "b,a")
    assert list(df.columns) == [
        "n_nodes",
        "max_cov",
        "min_identity",
        "max_identity",
        "members",
    ]


def test_vectorised_graph_matches_generic_loop() -> None:
    """The whole-matrix fast path for the stock aggregators reproduces
    the pairwise loop exactly, including the first-wins NaN semantics
    of Python's min/max over the two comparison directions."""
    import numpy as np
    import pandas as pd

    from pyani_plus_tpu.report import classify as classify_mod

    rng = np.random.default_rng(3)
    n = 60
    labels = [f"g{i}" for i in range(n)]
    ident = rng.uniform(0.3, 1.0, (n, n))
    cov = rng.uniform(0.0, 1.0, (n, n))
    for matrix in (ident, cov):
        matrix[rng.random((n, n)) < 0.15] = np.nan
    id_df = pd.DataFrame(ident, index=labels, columns=labels)
    cov_df = pd.DataFrame(cov, index=labels, columns=labels)
    for cov_agg in (min, max, np.mean):
        for sc_agg in (min, max, np.mean):
            fast = classify_mod.construct_graph(
                cov_df, id_df, cov_agg, sc_agg, 0.5
            )
            # wrapping the callables defeats the identity check -> loop
            slow = classify_mod.construct_graph(
                cov_df,
                id_df,
                lambda v, a=cov_agg: a(v),
                lambda v, a=sc_agg: a(v),
                0.5,
            )
            assert set(fast.edges) == set(slow.edges)
            for edge in fast.edges:
                assert fast.edges[edge] == slow.edges[edge]

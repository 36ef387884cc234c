"""Clique-based genome classification over ANI results.

Same algorithm as the reference ``classify.py`` (cited per function):
build an undirected graph whose nodes are genomes and whose edges
aggregate the two asymmetric comparison directions (coverage agg default
min, score agg default mean), dropping edges with missing values or
coverage <= cov_min (classify.py:64-105); take cliques of the initial
connected components (classify.py:114-132); then repeatedly remove the
lowest-scoring edge, recursing into components whenever the graph
disconnects, recording each clique with the edge score that formed it
(classify.py:135-189); dedupe by member set (classify.py:192-207); write
``{method}_classify.tsv`` rounded to 7 dp (classify.py:433-464) and a
4-panel summary plot.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from itertools import combinations
from pathlib import Path
from typing import Callable, NamedTuple

import networkx as nx
import numpy as np
import pandas as pd

from pyani_plus_tpu.db import Database

AGG_FUNCS: dict[str, Callable] = {
    "min": min,
    "max": max,
    "mean": np.mean,
}

MIN_COVERAGE = 0.50  # ref classify.py:49


class CliqueInfo(NamedTuple):
    """Graph structure summary (ref classify.py:54-61)."""

    n_nodes: int
    max_cov: float | None
    min_score: float | None
    max_score: float | None
    members: list


def construct_graph(
    cov_matrix: pd.DataFrame,
    score_matrix: pd.DataFrame,
    coverage_agg: Callable,
    score_agg: Callable,
    min_coverage: float,
) -> nx.Graph:
    """Build the genome graph from coverage + score matrices (classify.py:64-105)."""
    graph = nx.Graph()
    nodes = cov_matrix.columns
    graph.add_nodes_from(nodes)
    for genome1, genome2 in combinations(nodes, 2):
        coverage = coverage_agg(
            [cov_matrix[genome1][genome2], cov_matrix[genome2][genome1]]
        )
        score = score_agg(
            [score_matrix[genome1][genome2], score_matrix[genome2][genome1]]
        )
        if pd.notna(coverage) and pd.notna(score) and coverage > min_coverage:
            graph.add_edge(genome1, genome2, coverage=coverage, score=score)
    return graph


def is_clique(graph: nx.Graph) -> bool:
    """True if the (sub)graph is fully connected (classify.py:108-111)."""
    n_nodes = len(graph.nodes)
    return len(graph.edges) == n_nodes * (n_nodes - 1) / 2


def find_initial_cliques(graph: nx.Graph) -> list[tuple]:
    """Cliques among the initial connected components (classify.py:114-132)."""
    cliques: list[tuple] = []
    edges = nx.get_edge_attributes(graph, "score")
    identity = min(edges.values()) if edges else None
    for component in nx.connected_components(graph):
        subgraph = graph.subgraph(component).copy()
        if is_clique(subgraph):
            cliques.append((subgraph, identity))
    return cliques


def find_cliques_recursively(
    graph: nx.Graph,
    min_score: float | None = None,
) -> list[tuple]:
    """Remove lowest-score edges, recursing on disconnection (classify.py:135-189)."""
    cliques: list[tuple] = []
    if len(graph.nodes) == 1:
        cliques.append((graph, min_score))
        return cliques
    if is_clique(graph):
        cliques.append((graph.copy(), min_score))

    edges = sorted(graph.edges(data=True), key=lambda edge: edge[2]["score"])
    while edges:
        edge_to_remove = edges.pop(0)
        break_edge = (edge_to_remove[0], edge_to_remove[1])
        min_score = graph.get_edge_data(*break_edge).get("score")
        graph.remove_edge(*break_edge)
        connected_components = list(nx.connected_components(graph))
        if len(connected_components) > 1:
            for component in connected_components:
                subgraph = graph.subgraph(component).copy()
                cliques.extend(find_cliques_recursively(subgraph, min_score=min_score))
            return cliques
    return cliques


def get_unique_cliques(
    initial_cliques: list[tuple], recursive_cliques: list[tuple]
) -> list[tuple]:
    """Dedupe cliques by member set, initial cliques first (classify.py:192-207)."""
    unique_cliques = {
        frozenset(graph.nodes): (graph, edge) for graph, edge in initial_cliques
    }
    unique_cliques.update(
        {
            frozenset(graph.nodes): (graph, edge)
            for graph, edge in recursive_cliques
            if frozenset(graph.nodes) not in unique_cliques
        }
    )
    return list(unique_cliques.values())


def compute_classify_output(
    cliques: list, method: str, outdir: Path, column_map: dict
) -> tuple[list[CliqueInfo], pd.DataFrame]:
    """Write {method}_classify.tsv, 7 dp rounding (classify.py:433-464)."""
    clique_data = [
        CliqueInfo(
            n_nodes=len(clique.nodes),
            max_cov=min(
                (attrs["coverage"] for _, _, attrs in clique.edges(data=True)),
                default=None,
            ),
            min_score=edge_form,
            max_score=min(
                (attrs["score"] for _, _, attrs in clique.edges(data=True)),
                default=None,
            ),
            members=list(clique.nodes),
        )
        for clique, edge_form in cliques
    ]
    clique_df = pd.DataFrame(clique_data)
    clique_df["members"] = clique_df["members"].apply(",".join)
    clique_df = clique_df.rename(columns=column_map)
    output_file = outdir / f"{method}_classify.tsv"
    clique_df.round(7).to_csv(output_file, sep="\t", index=False)
    return clique_data, clique_df


def _plot_classify(  # noqa: PLR0913
    clique_df: pd.DataFrame,
    outdir: Path,
    method: str,
    suffix: str,
    vertical_line: float,
    formats: tuple[str, ...],
) -> None:
    """4-panel summary plot of clique structure vs score threshold."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = clique_df.copy()
    df[f"max_{suffix}"] = df[f"max_{suffix}"].fillna(
        1.0 if suffix == "identity" else 0.0
    )
    members = df["members"].str.split(",")
    genome_clique_ids = defaultdict(list)
    for idx, genome_list in members.items():
        for genome in genome_list:
            genome_clique_ids[genome].append(idx)
    sorted_genomes = sorted(genome_clique_ids, key=lambda g: genome_clique_ids[g])
    positions = {genome: idx for idx, genome in enumerate(sorted_genomes)}

    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    # Panel 1: clique extents over score range, one horizontal bar per clique
    ax = axes[0][0]
    for idx, row in df.iterrows():
        lo = row[f"min_{suffix}"]
        hi = row[f"max_{suffix}"]
        if pd.isna(lo):
            lo = hi
        ys = [positions[g] for g in row["members"].split(",")]
        ax.plot([lo, hi], [np.mean(ys)] * 2, "-o", ms=3, lw=1.5)
    ax.axvline(vertical_line, color="red", ls="--", lw=1)
    ax.set_xlabel(suffix.lstrip("-"))
    ax.set_ylabel("clique (genome order)")
    ax.set_title("Clique score ranges")

    # Panel 2: clique sizes
    ax = axes[0][1]
    ax.barh(range(len(df)), df["n_nodes"])
    ax.set_xlabel("genomes in clique")
    ax.set_ylabel("clique index")
    ax.set_title("Clique sizes")

    # Panel 3: histogram of formation scores
    ax = axes[1][0]
    scores = df[f"min_{suffix}"].dropna()
    if len(scores):
        ax.hist(scores, bins=30)
    ax.axvline(vertical_line, color="red", ls="--", lw=1)
    ax.set_xlabel(f"clique-forming {suffix.lstrip('-')}")
    ax.set_title("Formation threshold distribution")

    # Panel 4: genome membership map
    ax = axes[1][1]
    for idx, row in df.iterrows():
        for genome in row["members"].split(","):
            ax.plot(idx, positions[genome], "ks", ms=2)
    ax.set_xlabel("clique index")
    ax.set_ylabel("genome")
    ax.set_title("Membership")

    fig.suptitle(f"{method} classify summary")
    fig.tight_layout()
    # Reference file naming: {method}_classify_plot.{ext} (classify.py:425-430)
    for fmt in formats:
        if fmt == "tsv":
            continue
        fig.savefig(outdir / f"{method}_classify_plot.{fmt}")
    plt.close(fig)


def classify_run(  # noqa: PLR0913
    logger: logging.Logger,
    db: Database,
    outdir: Path,
    *,
    run_id: int | None = None,
    mode: str = "identity",
    label: str = "stem",
    cov_min: float = MIN_COVERAGE,
    score_agg: str = "mean",
    cov_agg: str = "min",
    vertical_line: float = 0.95,
    plot: bool = True,
    formats: tuple[str, ...] = ("tsv", "png"),
) -> pd.DataFrame:
    """Run the full classify pipeline for a run (ref public_cli.py:1211-1355)."""
    run = db.load_run(run_id, check_complete=True)
    method = run.configuration.method

    if mode == "identity":
        matrix = run.identities
    elif mode == "tANI":
        tani = run.tani
        matrix = tani.where(tani.isna(), tani * -1)
    else:
        msg = f"Unknown classify mode {mode!r}"
        raise ValueError(msg)

    cov = run.cov_query
    score_matrix = run.relabelled_matrix(matrix, label)
    cov = run.relabelled_matrix(cov, label)

    complete_graph = construct_graph(
        cov, score_matrix, AGG_FUNCS[cov_agg], AGG_FUNCS[score_agg], cov_min
    )
    if len(list(nx.connected_components(complete_graph))) != 1:
        initial_cliques = find_initial_cliques(complete_graph)
    else:
        initial_cliques = []
    recursive_cliques = find_cliques_recursively(complete_graph)
    unique_cliques = get_unique_cliques(initial_cliques, recursive_cliques)

    suffix = "identity" if mode == "identity" else "-tANI"
    column_map = {"min_score": f"min_{suffix}", "max_score": f"max_{suffix}"}
    _clique_data, clique_df = compute_classify_output(
        unique_cliques, method, outdir, column_map
    )
    logger.info("Wrote classify output to %s", outdir)

    if plot:
        if set(clique_df["n_nodes"]) == {1}:
            logger.warning("All genomes are singletons. No plot can be generated.")
        elif len(run.genome_hashes) > 1:
            _plot_classify(clique_df, outdir, method, suffix, vertical_line, formats)
    return clique_df

"""Plot rendering for runs: heatmaps, distributions, scatters, comparisons.

Behaviour and file naming follow the reference ``plot_run.py``:
``{method}_{score}_heatmap.{ext}`` seaborn clustermaps with NaN masked
orange and the custom species-boundary colormap (plot_run.py:49-150),
``{method}_{score}_dist.{ext}`` histogram+KDE+rug (plot_run.py:153-215),
``{method}_{query_cov,tANI}_scatter.{ext}`` jointplots coloured by query
length (plot_run.py:218-299), and multi-run comparison grids
(plot_run.py:389-588).
"""

from __future__ import annotations

import logging
import warnings
from math import log, nan
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd
import seaborn as sns
from matplotlib import cm, colormaps, colors
from matplotlib.colors import LinearSegmentedColormap

from pyani_plus_tpu import GRAPHICS_FORMATS
from pyani_plus_tpu.db import Database, Run

ORANGE = (0.934, 0.422, 0)
GREY = (0.7, 0.7, 0.7)
DULL_BLUE = (0.137, 0.412, 0.737)
WHITE = (1.0, 1.0, 1.0)
DULL_RED = (0.659, 0.216, 0.231)

# Species-boundary colormap: grey <80%, blue 80-95%, white at the 95%
# species boundary, red to 100% (ref plot_run.py:49-72).
for _name, _segments in (
    (
        "spbnd_BuRd",
        (
            (0.00, GREY),
            (0.80, GREY),
            (0.80, DULL_BLUE),
            (0.95, WHITE),
            (1.00, DULL_RED),
        ),
    ),
    ("BuRd", ((0.0, DULL_BLUE), (0.5, WHITE), (1.0, DULL_RED))),
):
    if _name not in colormaps:
        colormaps.register(LinearSegmentedColormap.from_list(_name, _segments))


def plot_heatmap(  # noqa: PLR0913
    matrix: pd.DataFrame,
    outdir: Path,
    name: str,
    method: str,
    color_scheme: str,
    formats: tuple[str, ...] = GRAPHICS_FORMATS,
    na_fill: float = 0,
) -> int:
    """Seaborn clustermap of the matrix; TSV export uses dendrogram order."""
    maxfigsize = 120
    calcfigsize = matrix.shape[0] * 1.1
    figsize = min(max(8, calcfigsize), maxfigsize)
    if figsize == maxfigsize:  # pragma: no cover
        sns.set_context("notebook", font_scale=maxfigsize / calcfigsize)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        figure = sns.clustermap(
            matrix.fillna(na_fill),
            mask=matrix.isna(),
            cmap=colormaps[color_scheme].with_extremes(bad=ORANGE),
            vmin=-5 if name == "tANI" and na_fill else 0,
            vmax=5 if name == "tANI" else 1,
            figsize=(figsize, figsize),
            linewidths=0.25,
        )
    row_box = figure.ax_row_dendrogram.get_position()
    col_box = figure.ax_col_dendrogram.get_position()
    figure.ax_cbar.set_position(
        (row_box.xmin, col_box.ymin, min(0.05, row_box.width), col_box.height)
    )
    for ext in formats:
        filename = outdir / f"{method}_{name}_heatmap.{ext}"
        if ext == "tsv":
            reordered = matrix.iloc[
                figure.dendrogram_row.reordered_ind,
                figure.dendrogram_row.reordered_ind,
            ]
            reordered.to_csv(filename, sep="\t")
        else:
            figure.savefig(filename)
    plt.close()
    return len(formats)


def plot_distribution(
    values,
    outdir: Path,
    name: str,
    method: str,
    formats: tuple[str, ...] = GRAPHICS_FORMATS,
) -> int:
    """Histogram + KDE + rug of one score (ref plot_run.py:153-215)."""
    fill = "#A6C8E0"
    rug = "#2678B2"
    values = [v for v in values if v is not None and v == v]  # drop NaN
    figure, axes = plt.subplots(1, 2, figsize=(15, 5))
    figure.suptitle(f"{name} distribution")
    sns.histplot(values, ax=axes[0], stat="count", element="step", color=fill, edgecolor=fill)
    axes[0].set_ylim(ymin=0)
    sns.kdeplot(values, ax=axes[1], warn_singular=False)
    for ax in axes:
        if name in ["hadamard", "coverage", "query_cov"]:
            ax.set_xlim(0, 1.01)
            values = [v for v in values if 0 <= v <= 1.01]
        elif name == "tANI":
            ax.set_xlim(0, 5.01)
            values = [v for v in values if 0 <= v <= 5.01]
        elif name == "identity":
            ax.set_xlim(0.80, 1.01)
            values = [v for v in values if 0.80 <= v <= 1.01]
    sns.rugplot(values, ax=axes[1], color=rug, height=-0.025, clip_on=False, alpha=0.1)
    figure.tight_layout(rect=(0, 0.03, 1, 0.95))
    for ext in formats:
        if ext != "tsv":
            figure.savefig(outdir / f"{method}_{name}_dist.{ext}")
    plt.close()
    return len(formats)


def plot_scatter(
    logger: logging.Logger,
    run: Run,
    outdir: Path,
    formats: tuple[str, ...] = GRAPHICS_FORMATS,
) -> int:
    """Query-coverage and tANI vs identity jointplots (plot_run.py:218-299)."""
    method = run.configuration.method
    lengths = {
        h: row
        for h, row in run._db.conn.execute(  # noqa: SLF001
            "SELECT genome_hash, length FROM genomes"
        ).fetchall()
    }
    for y_caption in ("Query coverage", "tANI"):
        pairs = []
        for comp in run.comparisons():
            identity = comp["identity"]
            cov = comp["cov_query"]
            if y_caption == "tANI":
                y = (
                    None
                    if identity is None or cov is None or not identity * cov
                    else -log(identity * cov)
                )
            else:
                y = cov
            pairs.append((identity, y, lengths.get(comp["query_hash"], 0)))
        values = [(x, y, c) for (x, y, c) in pairs if x is not None and y is not None]
        if not values:
            logger.warning(
                "No valid identity, %s values from %s run", y_caption, method
            )
            return 0
        logger.info(
            "Plotting %d/%d %s vs identity %s comparisons",
            len(values),
            len(pairs),
            y_caption,
            method,
        )
        x_values = [x for (x, _, _) in values]
        y_values = [y for (_, y, _) in values]
        c_values = [c for (_, _, c) in values]
        joint_grid = sns.jointplot(
            x=x_values,
            y=y_values,
            kind="scatter",
            joint_kws={"s": 2, "c": c_values, "color": None},
        )
        joint_grid.set_axis_labels(xlabel="Percent identity (ANI)", ylabel=y_caption)
        plt.subplots_adjust(left=0.2, right=0.8, top=0.8, bottom=0.2)
        plt.colorbar(
            cm.ScalarMappable(norm=colors.Normalize(min(c_values), max(c_values))),
            cax=joint_grid.fig.add_axes([0.85, 0.25, 0.05, 0.4]),
            label="Query length (bp)",
        )
        if y_caption == "Query coverage":
            y_caption = "query_cov"  # noqa: PLW2901
        for ext in formats:
            filename = outdir / f"{method}_{y_caption}_scatter.{ext}"
            if ext == "tsv":
                with filename.open("w") as handle:
                    handle.write(f"#identity\t{y_caption}\tquery_length\n")
                    for x, y, c in values:
                        handle.write(f"{x}\t{y}\t{c}\n")
            else:
                joint_grid.savefig(filename)
        plt.close()
    return len(formats)


def plot_single_run(
    logger: logging.Logger,
    run: Run,
    outdir: Path,
    label: str = "stem",
    formats: tuple[str, ...] = GRAPHICS_FORMATS,
) -> int:
    """All plots for one run: 2 scatters + 4 scores x (dist, heatmap)."""
    method = run.configuration.method
    done = plot_scatter(logger, run, outdir, formats)
    scores_and_color_schemes = [
        ("identity", "spbnd_BuRd", 0),
        ("query_cov", "BuRd", 0),
        ("hadamard", "viridis", 0),
        ("tANI", "viridis_r", -5),  # must follow hadamard
    ]
    matrix = None
    for name, color_scheme, na_fill in scores_and_color_schemes:
        if name == "identity":
            matrix = run.identities
        elif name == "query_cov":
            matrix = run.cov_query
        elif name == "hadamard":
            matrix = run.hadamard
        if name == "tANI":
            matrix = matrix.map(lambda x: -log(x) if x else nan, na_action="ignore")
        else:
            matrix = run.relabelled_matrix(matrix, label)
        nulls = int(matrix.isnull().sum().sum())
        n = len(matrix)
        if nulls == n**2:
            logger.warning("Cannot plot %s as all NA", name)
            continue
        if nulls:
            logger.warning(
                "%s matrix contains %d nulls (out of %d²=%d %s comparisons)",
                name,
                nulls,
                n,
                n**2,
                method,
            )
        done += plot_distribution(
            matrix.values.flatten(), outdir, name, method, formats
        )
        done += plot_heatmap(
            matrix, outdir, name, method, color_scheme, formats, na_fill
        )
    return done


def plot_run_comparison(  # noqa: PLR0913
    logger: logging.Logger,
    db: Database,
    outdir: Path,
    run_ids: list[int],
    field: str = "identity",
    formats: tuple[str, ...] = GRAPHICS_FORMATS,
    hist_bins: int = 30,
) -> int:
    """Scatter + difference grids comparing a base run to other runs.

    Simplified layout of the reference's plot_run_comp (plot_run.py:389-588):
    one scatter panel per other-run against the base run, with marginal
    difference histogram.
    """
    if len(run_ids) < 2:
        msg = "Need a base run and at least one other run to compare"
        raise ValueError(msg)
    base = db.load_run(run_ids[0], check_complete=True)
    base_matrix = getattr(base, "identities" if field == "identity" else field)
    others = [db.load_run(rid, check_complete=True) for rid in run_ids[1:]]

    ncols = len(others)
    fig, axes = plt.subplots(
        2, ncols, figsize=(6 * ncols, 10), squeeze=False, height_ratios=[2, 1]
    )
    for i, other in enumerate(others):
        other_matrix = getattr(other, "identities" if field == "identity" else field)
        common = sorted(set(base_matrix.index) & set(other_matrix.index))
        if not common:
            logger.warning(
                "Runs %d and %d share no genomes", base.run_id, other.run_id
            )
            continue
        x = base_matrix.loc[common, common].values.flatten()
        y = other_matrix.loc[common, common].values.flatten()
        ok = ~(pd.isna(x) | pd.isna(y))
        ax = axes[0][i]
        ax.scatter(x[ok], y[ok], s=4)
        lims = [min(x[ok].min(), y[ok].min()), max(x[ok].max(), y[ok].max())]
        ax.plot(lims, lims, "-", color="r", lw=1)
        ax.set_xlabel(f"run {base.run_id}: {base.name}")
        ax.set_ylabel(f"run {other.run_id}: {other.name}")
        ax.spines[["top", "right"]].set_visible(False)
        axh = axes[1][i]
        axh.hist(y[ok] - x[ok], bins=hist_bins)
        axh.set_xlabel(f"{field} difference")
    fig.suptitle(f"{field} comparison vs run {base.run_id}")
    fig.tight_layout()
    base_method = base.configuration.method
    for ext in formats:
        if ext != "tsv":
            fig.savefig(outdir / f"{base_method}_run{base.run_id}_comparison.{ext}")
    plt.close(fig)
    return len(formats)

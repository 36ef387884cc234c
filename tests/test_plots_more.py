"""Plot-layer unit coverage: colormaps, artefact generation, edge inputs.

The colormap thresholds are part of the reference's visual contract
(plot_run.py:49-72): identities below 80% render grey, the 80-95% band
blue, 95% (the species boundary) white, above it red -- a reader of the
heatmap must be able to trust those anchors.
"""

from pathlib import Path

import matplotlib
import numpy as np
import pandas as pd
import pytest

matplotlib.use("Agg")

from matplotlib import colormaps

import pyani_plus_tpu.report.plots  # noqa: F401  (registers colormaps)
from pyani_plus_tpu.report.plots import plot_distribution, plot_heatmap

def _rgba(cmap_name: str, x: float):
    return colormaps[cmap_name](x)


def test_spbnd_burd_species_boundary_anchors() -> None:
    """Grey below 80%, white at the 95% species boundary, red above."""
    low = _rgba("spbnd_BuRd", 0.5)  # 50% identity -> grey (r==g==b)
    assert abs(low[0] - low[1]) < 0.02
    assert abs(low[1] - low[2]) < 0.02
    boundary = _rgba("spbnd_BuRd", 0.95)
    assert all(c > 0.9 for c in boundary[:3])  # white-ish
    top = _rgba("spbnd_BuRd", 1.0)
    assert top[0] > 0.5
    assert top[0] > top[2]  # red dominates blue
    mid = _rgba("spbnd_BuRd", 0.875)  # inside the 80-95 band -> blue side
    assert mid[2] > mid[0]


def test_burd_diverges_around_midpoint() -> None:
    lo = _rgba("BuRd", 0.0)
    hi = _rgba("BuRd", 1.0)
    mid = _rgba("BuRd", 0.5)
    assert lo[2] > lo[0]  # blue end
    assert hi[0] > hi[2]  # red end
    assert all(c > 0.9 for c in mid[:3])  # white middle


def _matrix(n=4, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.uniform(0.8, 1.0, (n, n))
    vals = (vals + vals.T) / 2
    np.fill_diagonal(vals, 1.0)
    labels = [f"g{i}" for i in range(n)]
    return pd.DataFrame(vals, index=labels, columns=labels)


def test_plot_heatmap_writes_all_formats_and_ordered_tsv(tmp_path) -> None:
    matrix = _matrix()
    n = plot_heatmap(
        matrix,
        tmp_path,
        "identity",
        "demo",
        "spbnd_BuRd",
        formats=("tsv", "png", "pdf"),
    )
    assert n == 3
    for ext in ("tsv", "png", "pdf"):
        f = tmp_path / f"demo_identity_heatmap.{ext}"
        assert f.is_file() and f.stat().st_size > 0, ext
    tsv = pd.read_csv(tmp_path / "demo_identity_heatmap.tsv", sep="\t", index_col=0)
    # Same value multiset, dendrogram-reordered axes
    assert sorted(tsv.index) == sorted(matrix.index)
    assert np.isclose(sorted(tsv.values.ravel()), sorted(matrix.values.ravel())).all()


def test_plot_heatmap_handles_nan_cells(tmp_path) -> None:
    matrix = _matrix()
    matrix.iloc[0, 3] = np.nan
    matrix.iloc[3, 0] = np.nan
    plot_heatmap(
        matrix, tmp_path, "identity", "nan", "spbnd_BuRd", formats=("png",)
    )
    assert (tmp_path / "nan_identity_heatmap.png").stat().st_size > 0


def test_plot_distribution_drops_nan_and_writes(tmp_path) -> None:
    values = [0.9, 0.95, 1.0, None, float("nan"), 0.97, 0.99]
    plot_distribution(values, tmp_path, "identity", "demo", formats=("png", "pdf"))
    for ext in ("png", "pdf"):
        assert (tmp_path / f"demo_identity_dist.{ext}").stat().st_size > 0


def test_single_value_distribution_plots(tmp_path) -> None:
    """A one-genome run must still render (degenerate KDE input)."""
    plot_distribution([1.0], tmp_path, "identity", "one", formats=("png",))
    assert (tmp_path / "one_identity_dist.png").stat().st_size > 0

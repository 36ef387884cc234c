"""End-to-end NULL handling: the bad_alignments pair through every method.

The two phage genomes share no usable homology; the reference records
the cross-comparisons as NULL rows (fixture matrices hold empty cells)
while the self-comparisons stay near 1.0. Each method's whole pipeline
-- compute, NULL persistence, matrix caching, export -- must agree.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from pyani_plus_tpu.cli.main import app
from pyani_plus_tpu.db import Database

BAD = Path("/root/reference/tests/fixtures/bad_alignments")
STEMS = ["MGV-GENOME-0264574", "MGV-GENOME-0357962"]

# Commands and whether the fixture set pins matrices for them
METHODS = [
    ("anim", True),
    ("dnadiff", True),
    ("sourmash", True),
    ("anib", False),
    ("fastani", False),
    ("animinimap2", False),
    ("skani", False),
]


@pytest.fixture(scope="module")
def bad_dir():
    if not BAD.is_dir():
        pytest.skip("reference fixtures not available")
    return BAD


@pytest.mark.parametrize(("method", "has_fixture"), METHODS)
def test_null_pair_through_method(method, has_fixture, bad_dir, tmp_path) -> None:
    db_path = tmp_path / f"{method}.sqlite"
    result = CliRunner().invoke(
        app,
        [method, str(bad_dir), "-d", str(db_path), "--create-db"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        run = db.load_run(check_complete=True)
        identity = run.relabelled_matrix(run.identities, "stem")
        identity = identity.loc[STEMS, STEMS]
    # Cross comparisons are NULL for every method
    assert np.isnan(identity.iloc[0, 1]), method
    assert np.isnan(identity.iloc[1, 0]), method
    # Self comparisons are (near) perfect
    assert identity.iloc[0, 0] > 0.99, method
    assert identity.iloc[1, 1] > 0.99, method
    if has_fixture:
        name = {"anim": "ANIm", "dnadiff": "dnadiff", "sourmash": "sourmash"}[
            method
        ]
        exp = (
            pd.read_csv(
                bad_dir / "matrices" / f"{name}_identity.tsv",
                sep="\t",
                index_col=0,
            )
            .loc[STEMS, STEMS]
        )
        got = identity.to_numpy()
        want = exp.to_numpy()
        assert np.array_equal(np.isnan(got), np.isnan(want)), method
        # dnadiff fixture holds the external tool's ROUNDED report
        # values (CLAUDE.md gotcha); the others match to fixture print
        # precision
        atol = 1e-4 if method == "dnadiff" else 2e-8
        mask = ~np.isnan(want)
        assert np.allclose(got[mask], want[mask], atol=atol), method

"""Coverage/identity semantics on an artificial multi-contig genome set.

Mirrors the reference's tests/test_coverage.py: three FASTA inputs built
from two real contigs (MIBY01000005, 7582 bp with one 28-N run, and
MIBY01000011, 18001 bp) -- "small", "large", and "both" (the two contigs
concatenated into one file). The expected matrices below are the exact
values the reference pins from real-tool runs
(/root/reference/tests/test_coverage.py:107-173, JSON at
double_precision=10), so these tests check multi-contig bookkeeping,
NULL handling for failed pairs, and per-method coverage accounting in
one sweep.

The 28-N run is load-bearing for ANIb: blastn with -xdrop_gap_final 150
crosses it in the reported alignment and counts the N==N columns as
identities, so the N fragment keeps pident 100.000 and FULL coverage.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from pyani_plus_tpu.cli.main import app
from pyani_plus_tpu.db import Database

FIX = Path("/root/reference/tests/fixtures")
ORDER = ["small", "both", "large"]
NAN = float("nan")


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    if not (FIX / "MIBY01000005.fasta").is_file():
        pytest.skip("reference fixtures not available")
    tmp = tmp_path_factory.mktemp("coverage")
    seq = tmp / "fasta"
    seq.mkdir()
    shutil.copy(FIX / "MIBY01000005.fasta", seq / "small.fasta")
    shutil.copy(FIX / "MIBY01000011.fasta", seq / "large.fasta")
    (seq / "both.fasta").write_text(
        (FIX / "MIBY01000005.fasta").read_text()
        + (FIX / "MIBY01000011.fasta").read_text()
    )
    return seq


def _run(seq_dir, method, *extra):
    db_path = seq_dir.parent / f"{method}{len(extra)}.db"
    result = CliRunner().invoke(
        app,
        [method, str(seq_dir), "-d", str(db_path), "--create-db", *extra],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        run = db.load_run(check_complete=True)
        identity = run.relabelled_matrix(run.identities, "stem")
        cov = run.relabelled_matrix(run.cov_query, "stem")
    return (
        identity.loc[ORDER, ORDER].to_numpy(),
        cov.loc[ORDER, ORDER].to_numpy(),
    )


def _check(got: np.ndarray, want: list[list[float]], atol: float = 5e-10) -> None:
    np.testing.assert_allclose(got, np.asarray(want), atol=atol, rtol=0)


# Coverage pattern shared by the alignment methods: the small query is
# fully covered or NULL; the "both" query covers 29.6% / 70.4% by
# contig length (7582 and 18001 of 25583 bp).
COV_BP = [
    [1.0, 1.0, NAN],
    [0.2963686823, 1.0, 0.7036313177],
    [NAN, 1.0, 1.0],
]


def test_anim_coverage_pattern(seq_dir) -> None:
    identity, cov = _run(seq_dir, "anim")
    _check(
        identity,
        [
            [0.996307043, 0.996307043, NAN],
            [0.996307043, 0.9989055232, 1.0],
            [NAN, 1.0, 1.0],
        ],
    )
    _check(cov, COV_BP)


def test_dnadiff_coverage_pattern(seq_dir) -> None:
    identity, cov = _run(seq_dir, "dnadiff")
    _check(identity, [[1.0, 1.0, NAN], [1.0, 1.0, 1.0], [NAN, 1.0, 1.0]])
    _check(cov, COV_BP)


def test_anib_coverage_pattern(seq_dir) -> None:
    identity, cov = _run(seq_dir, "anib")
    _check(identity, [[1.0, 1.0, NAN], [1.0, 1.0, 1.0], [NAN, 1.0, 1.0]])
    _check(cov, COV_BP)


def test_fastani_coverage_pattern(seq_dir) -> None:
    """fastANI at k=15, frag=2000, minmatch=0.15 (non-default settings).

    Coverage comes out in whole fragments: 25% / 75% rather than the
    bp-proportional 29.6% / 70.4%. The reference identities dip to
    0.99997 / 0.999959 on pairs involving the large contig (fastANI's
    sliding L2 evaluation undershoots on one fragment); our exact
    window-max evaluation yields 1.0 there, so identity gets a 5e-5
    gate (the documented fastANI residue) while coverage is exact.
    """
    identity, cov = _run(
        seq_dir,
        "fastani",
        "--kmersize",
        "15",
        "--fragsize",
        "2000",
        "--minmatch",
        "0.15",
    )
    _check(
        identity,
        [
            [1.0, 1.0, NAN],
            [1.0, 0.99997, 0.999959],
            [NAN, 0.999959, 0.999959],
        ],
        atol=5e-5,
    )
    _check(cov, [[1.0, 1.0, NAN], [0.25, 1.0, 0.75], [NAN, 1.0, 1.0]])


def test_sourmash_coverage_pattern(seq_dir) -> None:
    """sourmash at scaled=50: coverage is k-mer containment, not bp."""
    identity, cov = _run(seq_dir, "sourmash", "--scaled", "50")
    _check(identity, [[1.0, 1.0, NAN], [1.0, 1.0, 1.0], [NAN, 1.0, 1.0]])
    _check(
        cov,
        [
            [1.0, 1.0, NAN],
            [0.9622440235, 1.0, 0.9884105907],
            [NAN, 1.0, 1.0],
        ],
    )

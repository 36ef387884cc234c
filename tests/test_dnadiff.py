"""Tests for the dnadiff method.

Oracle: the *reference pipeline's own parse* of the fixture
intermediates (parse_mcoords/parse_qdiff over the .mcoords/.qdiff
files), since the shipped dnadiff matrix fixtures hold the external
tool's 2/4-dp rounded report values. Verified reference-pipeline
values for the viral set:

    0264574 vs 0266457 : id 0.9962661747 aln 39169 err 146   (exact here)
    OP       vs 0266457: id 0.9946       aln 39568 err 214   (exact)

All alignment blocks (coords, errors, indel counts) are bit-identical
to the fixture .filter deltas under the affine-gap DP (ops/extend.py),
so every pair matches the reference-pipeline oracle exactly.
"""

from pathlib import Path

import pytest

from pyani_plus_tpu.genomes import load_genome
from pyani_plus_tpu.methods.dnadiff import compute_pair, qdiff_features
from pyani_plus_tpu.ops.chaining import Alignment


@pytest.fixture(scope="module")
def viral():
    d = Path("/root/reference/tests/fixtures/viral_example")
    if not d.is_dir():
        pytest.skip("reference fixtures not available")
    return d


def test_rotated_pair_exact(viral) -> None:
    q = load_genome(viral / "MGV-GENOME-0264574.fas")
    s = load_genome(viral / "MGV-GENOME-0266457.fna")
    res = compute_pair(q, s)
    assert abs(res["identity"] - 0.996266174669021) < 2e-8
    assert res["aln_length"] == 39169
    assert res["sim_errors"] == 146
    assert res["cov_query"] == pytest.approx(39169 / 39253)


def test_self_pairs_exact(viral) -> None:
    for name in ("MGV-GENOME-0264574.fas", "OP073605.fasta"):
        g = load_genome(viral / name)
        res = compute_pair(g, g)
        assert res["identity"] == 1.0
        assert res["aln_length"] == g.length
        assert res["sim_errors"] == 0


def test_op_pair_exact(viral) -> None:
    q = load_genome(viral / "OP073605.fasta")
    s = load_genome(viral / "MGV-GENOME-0266457.fna")
    res = compute_pair(q, s)
    assert res["aln_length"] == 39568
    assert res["identity"] == pytest.approx(0.9946, abs=1e-12)
    assert res["sim_errors"] == 214


def test_qdiff_features() -> None:
    # Two blocks with a 10bp query gap + unaligned ends
    blocks = [
        Alignment(0, 100, 5, 105, 0),
        Alignment(110, 200, 115, 205, 0),
    ]
    feats = qdiff_features(blocks, 250)
    assert feats == [("BRK", 5), ("GAP", 10), ("BRK", 45)]
    # Reference walking backwards over aligned ground while query advances
    blocks = [
        Alignment(50, 150, 5, 105, 0),
        Alignment(40, 90, 120, 170, 0),
    ]
    feats = qdiff_features(blocks, 170)
    assert ("DUP", 15) in feats


def test_bad_alignments_null() -> None:
    d = Path("/root/reference/tests/fixtures/bad_alignments")
    if not d.is_dir():
        pytest.skip("fixture missing")
    fastas = sorted(
        p for ext in (".fas", ".fna", ".fasta") for p in d.glob(f"*{ext}")
    )
    a, b = (load_genome(p) for p in fastas[:2])
    res = compute_pair(a, b)
    assert res["identity"] is None

"""Tests for the ANIm method (nucmer/MUMmer-equivalent seed-chain-extend).

Oracle: the reference fixture matrices, the reference's hard-coded
spot values (tests/test_anim.py:59-67, test_self_vs_self.py:66-95 in
the reference), and the fixture .filter deltas themselves. Status: all
alignment blocks bit-identical to nucmer's (coordinates, error counts,
and indel-column counts) under the affine-gap DP; all 9 viral matrix
cells exact.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from pyani_plus_tpu.genomes import load_genome
from pyani_plus_tpu.methods.anim import align_sequences, compute_pair
from pyani_plus_tpu.ops.chaining import one_to_one
from pyani_plus_tpu.ops.suffix import maximal_matches


@pytest.fixture(scope="module")
def viral():
    d = Path("/root/reference/tests/fixtures/viral_example")
    if not d.is_dir():
        pytest.skip("reference fixtures not available")
    return d


@pytest.fixture(scope="module")
def viral_genomes(viral):
    names = ["MGV-GENOME-0264574.fas", "MGV-GENOME-0266457.fna", "OP073605.fasta"]
    return {n: load_genome(viral / n) for n in names}


def test_mum_finding_basic() -> None:
    from pyani_plus_tpu.genomes import encode_sequence

    ref = encode_sequence(b"TTTTACGGATCCGATTACAGGTTTT")
    qry = encode_sequence(b"CCCCACGGATCCGATTACAGGCCCC")
    r, q, ln = maximal_matches(ref, qry, min_len=10)
    assert (r.tolist(), q.tolist(), ln.tolist()) == ([4], [4], [17])


def test_n_never_matches_in_mums() -> None:
    from pyani_plus_tpu.genomes import encode_sequence

    seq = encode_sequence(b"ACGGATCCGATTACAGGACGT" + b"N" * 30 + b"GATTACACGGATCCGATTAGG")
    r, q, ln = maximal_matches(seq, seq.copy(), min_len=10)
    # Self-matches split at the N run: no match spans it
    for rs, ls in zip(r, ln):
        window = seq[rs : rs + ls]
        assert (window < 4).all()


def test_spot_value_rotated_pair(viral_genomes) -> None:
    """Reference spot value: parse_delta -> (39169, 39176, 0.9962487643734, 222)."""
    res = compute_pair(
        viral_genomes["MGV-GENOME-0264574.fas"],
        viral_genomes["MGV-GENOME-0266457.fna"],
    )
    assert res["aln_length"] == 39169
    assert res["sim_errors"] == 222
    assert abs(res["identity"] - 0.9962487643734) < 2e-8


def test_filtered_alignment_blocks(viral_genomes, viral) -> None:
    """The two overlapping alignments of the rotated pair, exactly."""
    s = viral_genomes["MGV-GENOME-0266457.fna"]
    q = viral_genomes["MGV-GENOME-0264574.fas"]
    blocks = one_to_one(align_sequences(s.records[0].codes, q.records[0].codes))
    coords = sorted(
        (b.ref_start + 1, b.ref_end, b.qry_start + 1, b.qry_end, b.errors)
        for b in blocks
    )
    assert coords == [
        (1, 37636, 85, 37713, 215),
        (17626, 39176, 17709, 39253, 7),
    ]


def test_matrices_vs_fixtures(viral_genomes, viral) -> None:
    names = list(viral_genomes)
    exp_i = pd.read_csv(viral / "matrices/ANIm_identity.tsv", sep="\t", index_col=0)
    exp_a = pd.read_csv(viral / "matrices/ANIm_aln_lengths.tsv", sep="\t", index_col=0)
    exp_s = pd.read_csv(viral / "matrices/ANIm_sim_errors.tsv", sep="\t", index_col=0)
    from pyani_plus_tpu.utils import filename_stem

    exact = 0
    for qn in names:
        for sn in names:
            res = compute_pair(viral_genomes[qn], viral_genomes[sn])
            qs, ss = filename_stem(qn), filename_stem(sn)
            assert abs(res["identity"] - exp_i.loc[qs, ss]) < 2e-8
            exact += (
                res["aln_length"] == exp_a.loc[qs, ss]
                and res["sim_errors"] == exp_s.loc[qs, ss]
            )
    assert exact == 9  # every cell bit-exact


def test_self_vs_self_n_run_anomaly() -> None:
    """ANIm self identity < 1.0 for a contig with a 28-N run."""
    path = Path("/root/reference/tests/fixtures/MIBY01000005.fasta")
    if not path.is_file():
        pytest.skip("fixture missing")
    genome = load_genome(path)
    res = compute_pair(genome, genome)
    assert res["identity"] == pytest.approx(0.9963070429965708, abs=1e-12)
    assert res["sim_errors"] == 28


def test_bad_alignments_all_null() -> None:
    d = Path("/root/reference/tests/fixtures/bad_alignments")
    if not d.is_dir():
        pytest.skip("fixture missing")
    fastas = sorted(
        p for ext in (".fas", ".fna", ".fasta") for p in d.glob(f"*{ext}")
    )
    a, b = (load_genome(p) for p in fastas[:2])
    res = compute_pair(a, b)
    assert res["identity"] is None
    assert res["aln_length"] is None
    assert res["cov_query"] is None

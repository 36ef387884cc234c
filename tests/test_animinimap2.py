"""ANIminimap2 parity tests.

Oracle: the fixture .minimap2 PAF files (reference invocation
private_cli.py:1499-1549, run WITHOUT -c) and the ANIminimap2 fixture
matrices. All nine viral pair PAFs are bit-identical on every field the
reference parser reads (coordinates, strand, nmatch, block length, and
the mapq zero/nonzero gate), so the viral matrices are exact. The
bacterial set (divergent ~82-86%% ANI pairs) tracks but is not exact:
modern minimap2 asm presets use RMQ chaining and mapq gating details
that differ on sparse divergent chains (self pairs: aln_lengths exact,
identity within 1e-3).
"""

from pathlib import Path

import pandas as pd
import pytest

from pyani_plus_tpu.genomes import load_genome
from pyani_plus_tpu.methods.animinimap2 import compute_pair
from pyani_plus_tpu.ops.mm2 import map_query
from pyani_plus_tpu.utils import filename_stem

VIRAL = Path("/root/reference/tests/fixtures/viral_example")
HASHES = {
    "689d3fd6881db36b5e08329cf23cecdd": "MGV-GENOME-0264574.fas",
    "78975d5144a1cd12e98898d573cf6536": "MGV-GENOME-0266457.fna",
    "5584c7029328dc48d33f95f0a78f7e57": "OP073605.fasta",
}


@pytest.fixture(scope="module")
def viral_genomes():
    if not VIRAL.is_dir():
        pytest.skip("reference fixtures not available")
    return {h: load_genome(VIRAL / n) for h, n in HASHES.items()}


def test_paf_records_bit_identical(viral_genomes) -> None:
    """Every viral PAF row matches on all parsed fields."""
    for qh in HASHES:
        for th in HASHES:
            paf = VIRAL / "intermediates" / "ANIminimap2" / f"{qh}_vs_{th}.minimap2"
            expected = []
            for ln in paf.read_text().splitlines():
                c = ln.split("\t")
                expected.append(
                    (int(c[2]), int(c[3]), c[4], int(c[7]), int(c[8]),
                     int(c[9]), int(c[10]), int(c[11]) > 0)
                )
            q = viral_genomes[qh].records[0].codes
            t = viral_genomes[th].records[0].codes
            ours = sorted(
                (r.qstart, r.qend, r.strand, r.tstart, r.tend, r.mlen,
                 r.blen, r.mapq > 0)
                for r in map_query(t, q, 19, 10)
            )
            assert ours == sorted(expected), f"{qh[:6]} vs {th[:6]}"


def test_viral_matrices_exact(viral_genomes) -> None:
    exp = {
        key: pd.read_csv(
            VIRAL / f"matrices/ANIminimap2_{key}.tsv", sep="\t", index_col=0
        )
        for key in ("identity", "aln_lengths", "coverage")
    }
    for qh, qn in HASHES.items():
        for th, tn in HASHES.items():
            res = compute_pair(viral_genomes[qh], viral_genomes[th], "asm20")
            qs, ts = filename_stem(qn), filename_stem(tn)
            assert abs(res["identity"] - exp["identity"].loc[qs, ts]) < 1e-12
            assert res["aln_length"] == exp["aln_lengths"].loc[qs, ts]
            assert abs(res["cov_query"] - exp["coverage"].loc[qs, ts]) < 1e-12


def test_bacterial_divergent_all_pairs_tolerance() -> None:
    """All 12 divergent bacterial pairs: identity within 0.011, aligned
    length within 4.5%, coverage within 0.034 of the fixture matrices.

    Gates pin the measured state of the RMQ-era chain cost (two-regime
    joins: spans <= max_gap with free diagonal drift, or near-diagonal
    spans up to bw_long; float chn_pen_gap*dd + 0.5*mg_log2 cost) so a
    regression on ANY pair fails, not just the single pair the old test
    sampled. The residue vs the binary is its primary/mapq selection on
    split chains, which the matrix-only oracle cannot pin down.
    """
    d = Path("/root/reference/tests/fixtures/bacterial_example")
    if not d.is_dir():
        pytest.skip("reference fixtures not available")
    genomes = {
        filename_stem(p.name): load_genome(p) for p in sorted(d.glob("*.gz"))
    }
    exp_i = pd.read_csv(d / "matrices/ANIminimap2_identity.tsv", sep="\t", index_col=0)
    exp_a = pd.read_csv(d / "matrices/ANIminimap2_aln_lengths.tsv", sep="\t", index_col=0)
    exp_c = pd.read_csv(d / "matrices/ANIminimap2_coverage.tsv", sep="\t", index_col=0)
    for qs, q in genomes.items():
        for ts, s in genomes.items():
            if qs == ts:
                continue
            res = compute_pair(q, s, "asm20")
            want_a = exp_a.loc[qs, ts]
            assert abs(res["identity"] - exp_i.loc[qs, ts]) < 0.011, (qs, ts)
            assert abs(res["aln_length"] - want_a) / want_a < 0.045, (qs, ts)
            assert abs(res["cov_query"] - exp_c.loc[qs, ts]) < 0.034, (qs, ts)


def test_bacterial_self_pair_tolerance() -> None:
    """Bacterial self pair: aln_length exact, identity within 1e-3."""
    d = Path("/root/reference/tests/fixtures/bacterial_example")
    if not d.is_dir():
        pytest.skip("reference fixtures not available")
    g = load_genome(d / "NC_002696.fasta.gz")
    exp_i = pd.read_csv(d / "matrices/ANIminimap2_identity.tsv", sep="\t", index_col=0)
    exp_a = pd.read_csv(d / "matrices/ANIminimap2_aln_lengths.tsv", sep="\t", index_col=0)
    res = compute_pair(g, g, "asm20")
    assert res["aln_length"] == exp_a.loc["NC_002696", "NC_002696"]
    assert abs(res["identity"] - exp_i.loc["NC_002696", "NC_002696"]) < 1e-3

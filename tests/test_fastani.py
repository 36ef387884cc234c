"""Tests for the fastANI-mode minimizer mapping method.

Oracle: the reference fixture .fastani intermediates (viral_example).
Status after the round-3 cgi.hpp semantics port (plateau-end positions,
integer-quantised CI gate, reference-bin dedup): self pairs bit-exact
including retained counts, viral cross pairs exact on counts and within
0.06 ANI points, bacterial within 0.20 points / 30 fragments -- the
residue is fastANI's vendored-MashMap slide anchor set (see
ops/fastani_map.py docstring).
"""

from pathlib import Path

import numpy as np
import pytest

from pyani_plus_tpu.genomes import decode_sequence, load_genome
from pyani_plus_tpu.methods.fastani import compute_pair, fragment_genome
from pyani_plus_tpu.ops.fastani_map import RefIndex
from pyani_plus_tpu.ops.minimizers import window_minimizers

# (query, subject) -> (ANI%, matched fragments, total fragments), parsed
# from tests/fixtures/viral_example/intermediates/fastANI/*.fastani
EXPECTED = {
    ("MGV-GENOME-0264574.fas", "MGV-GENOME-0264574.fas"): (100.0, 13, 13),
    ("MGV-GENOME-0266457.fna", "MGV-GENOME-0264574.fas"): (99.5247, 13, 13),
    ("OP073605.fasta", "MGV-GENOME-0264574.fas"): (99.8333, 13, 19),
    ("MGV-GENOME-0264574.fas", "MGV-GENOME-0266457.fna"): (99.5014, 12, 13),
    ("MGV-GENOME-0266457.fna", "MGV-GENOME-0266457.fna"): (100.0, 13, 13),
    ("OP073605.fasta", "MGV-GENOME-0266457.fna"): (99.4912, 13, 19),
    ("MGV-GENOME-0264574.fas", "OP073605.fasta"): (99.9386, 13, 13),
    ("MGV-GENOME-0266457.fna", "OP073605.fasta"): (99.5129, 13, 13),
    ("OP073605.fasta", "OP073605.fasta"): (100.0, 19, 19),
}

ANI_TOLERANCE = 0.06  # percentage points; see module docstring


@pytest.fixture(scope="module")
def viral_results():
    d = Path("/root/reference/tests/fixtures/viral_example")
    if not d.is_dir():
        pytest.skip("reference fixtures not available")
    names = sorted({q for q, _s in EXPECTED})
    genomes = {n: load_genome(d / n) for n in names}
    results = {}
    for ref_name in names:
        ref = genomes[ref_name]
        index = RefIndex.build([decode_sequence(r.codes) for r in ref.records])
        for q_name in names:
            results[(q_name, ref_name)] = compute_pair(
                genomes[q_name], index, ref.length, 3000, 16, 0.2
            )
    return results


def test_fragmentation_counts(viral_results) -> None:
    d = Path("/root/reference/tests/fixtures/viral_example")
    genome = load_genome(d / "OP073605.fasta")
    frags = fragment_genome(genome, 3000)
    assert len(frags) == 19  # floor(57793 / 3000)
    assert all(len(f) == 3000 for f in frags)


def test_self_pairs_exact(viral_results) -> None:
    for (q, s), res in viral_results.items():
        if q != s:
            continue
        assert res is not None
        ani, matches, total = res
        assert ani == 100.0, f"{q} self-ANI {ani}"
        assert matches == total == EXPECTED[(q, s)][2]


def test_cross_pairs_within_tolerance(viral_results) -> None:
    for (q, s), res in viral_results.items():
        exp_ani, exp_m, exp_total = EXPECTED[(q, s)]
        assert res is not None, f"{q} vs {s} unexpectedly failed"
        ani, matches, total = res
        assert total == exp_total
        assert matches == exp_m, f"{q} vs {s}: {matches} vs {exp_m}"
        assert abs(ani - exp_ani) <= ANI_TOLERANCE, (
            f"{q} vs {s}: {ani:.4f} vs expected {exp_ani}"
        )


def test_minimizer_substring_property() -> None:
    """Sketch of a substring == pick runs intersecting its step range."""
    rng = np.random.default_rng(7)
    seq = bytes(rng.choice(list(b"ACGT"), size=8000).astype(np.uint8))
    k, w, L = 16, 24, 3000
    full = window_minimizers(seq, k, w)
    for p0 in (0, 1500, 3000, 5000):
        frag = seq[p0 : p0 + L]
        frag_mins = window_minimizers(frag, k, w)
        t0, t1 = p0 + w - 1, p0 + L - k
        sel = (full.last_steps >= t0) & (full.first_steps <= t1)
        assert set(full.hashes[sel].tolist()) == set(frag_mins.hashes.tolist())


def test_no_overlap_returns_none() -> None:
    rng = np.random.default_rng(1)
    a = bytes(rng.choice(list(b"ACGT"), size=4000).astype(np.uint8))
    b = bytes(rng.choice(list(b"ACGT"), size=4000).astype(np.uint8))
    index = RefIndex.build([b])

    class FakeGenome:
        length = len(a)

        class _Rec:
            pass

    from pyani_plus_tpu.genomes import Genome, SequenceRecord, encode_sequence

    g = Genome(md5="x" * 32, path=Path("x.fasta"), records=[SequenceRecord(b"x", encode_sequence(a))])
    res = compute_pair(g, index, len(b), 3000, 16, 0.2)
    assert res is None  # random sequences share no mapped fragments


def test_bacterial_divergent_pair_tolerance() -> None:
    """cgi.hpp-semantics acceptance on a divergent bacterial pair.

    fastANI reports 82.9124 with 877/1825 matched fragments for
    NC_010338 vs NC_002696 (bacterial fixture intermediates). The
    round-3 port (quantised CI gate + plateau-end bins + ref-bin dedup)
    lands at 82.8995 with 863 -- the gate here locks that residue
    (<=0.20 ANI points, counts within 30).
    """
    d = Path("/root/reference/tests/fixtures/bacterial_example")
    if not d.is_dir():
        pytest.skip("reference fixtures not available")
    from pyani_plus_tpu.genomes import decode_sequence, load_genome
    from pyani_plus_tpu.methods.fastani import compute_pair
    from pyani_plus_tpu.ops.fastani_map import FRAG_LEN, KMER_SIZE, RefIndex

    subject = load_genome(d / "NC_002696.fasta.gz")
    query = load_genome(d / "NC_010338.fna.gz")
    index = RefIndex.build(
        [decode_sequence(r.codes) for r in subject.records]
    )
    ani, matches, total = compute_pair(
        query, index, subject.length, FRAG_LEN, KMER_SIZE, 0.2
    )
    assert total == 1825
    assert abs(ani - 82.9124) <= 0.20
    assert abs(matches - 877) <= 30


def test_bacterial_full_matrix_tolerance() -> None:
    """All 16 bacterial pairs vs the fastANI fixture matrix.

    Affordable since the native mapping kernels (~1-2 s/pair); locks the
    ported cgi.hpp semantics globally: identity within 0.20 ANI points
    of the fastANI binary on every pair, self pairs exactly 100 modulo
    fastANI's own N-run anomaly (which the fixture matrix carries).
    """
    d = Path("/root/reference/tests/fixtures/bacterial_example")
    if not d.is_dir():
        pytest.skip("reference fixtures not available")
    import pandas as pd

    from pyani_plus_tpu.genomes import decode_sequence, load_genome
    from pyani_plus_tpu.methods.fastani import compute_pair
    from pyani_plus_tpu.ops.fastani_map import FRAG_LEN, KMER_SIZE, RefIndex
    from pyani_plus_tpu.utils import file_md5sum

    fastas = sorted(
        p for pat in ("*.fasta.gz", "*.fna.gz", "*.fas.gz") for p in d.glob(pat)
    )
    genomes = {p.name.split(".")[0]: load_genome(p) for p in fastas}
    expected = (
        pd.read_csv(d / "matrices" / "fastANI_identity.tsv", sep="\t", index_col=0)
        .sort_index(axis=0)
        .sort_index(axis=1)
    )
    worst = 0.0
    for s_name, subject in genomes.items():
        index = RefIndex.build(
            [decode_sequence(r.codes) for r in subject.records]
        )
        for q_name, query in genomes.items():
            res = compute_pair(
                query, index, subject.length, FRAG_LEN, KMER_SIZE, 0.2
            )
            assert res is not None, (q_name, s_name)
            ani = res[0]
            exp = float(expected.loc[q_name, s_name]) * 100.0
            worst = max(worst, abs(ani - exp))
            assert abs(ani - exp) <= 0.20, (q_name, s_name, ani, exp)

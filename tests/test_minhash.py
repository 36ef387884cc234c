"""Tests for FracMinHash sketching + containment vs reference fixtures.

The .sig fixture files and the expected sourmash matrices are the oracle:
our sketches must contain the *identical* hash set, and the resulting
identity/coverage matrices must match within the reference test suite's
atol=2e-8 (tests/snakemake/__init__.py:86 in the reference).
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from pyani_plus_tpu.genomes import load_genome
from pyani_plus_tpu.ops.minhash import (
    containment_ani,
    intersection_matrix_device,
    intersection_matrix_host,
    max_hash_for_scaled,
    sketch_genome,
)
from pyani_plus_tpu.utils import filename_stem

ATOL = 2e-8


def test_max_hash_for_scaled() -> None:
    # Matches the max_hash recorded in reference .sig fixtures
    assert max_hash_for_scaled(300) == 61489146912365176
    assert max_hash_for_scaled(1000) == 18446744073709552
    assert max_hash_for_scaled(1) == 2**64 - 1


@pytest.mark.parametrize(
    ("fasta", "md5"),
    [
        ("MGV-GENOME-0264574.fas", "689d3fd6881db36b5e08329cf23cecdd"),
        ("MGV-GENOME-0266457.fna", "78975d5144a1cd12e98898d573cf6536"),
        ("OP073605.fasta", "5584c7029328dc48d33f95f0a78f7e57"),
    ],
)
def test_sketch_matches_fixture_sig(viral_example: Path, fasta: str, md5: str) -> None:
    sig_file = viral_example / "intermediates" / "sourmash" / f"{md5}.sig"
    with sig_file.open() as handle:
        sig = json.load(handle)[0]["signatures"][0]
    genome = load_genome(viral_example / fasta)
    assert genome.md5 == md5
    sketch = sketch_genome(genome, ksize=sig["ksize"], scaled=300)
    expected = np.array(sorted(sig["mins"]), dtype=np.uint64)
    assert np.array_equal(sketch.hashes, expected)


def _matrices_for(directory: Path, scaled: int):
    fastas = sorted(
        p
        for ext in (".fasta", ".fas", ".fna", ".fa")
        for pattern in (f"*{ext}", f"*{ext}.gz")
        for p in directory.glob(pattern)
    )
    genomes = [load_genome(p) for p in fastas]
    sketches = [sketch_genome(g, 31, scaled) for g in genomes]
    identity, cov = containment_ani(sketches, use_device=False)
    stems = [filename_stem(p.name) for p in fastas]
    mk = lambda m: (
        pd.DataFrame(m, index=stems, columns=stems)
        .sort_index(axis=0)
        .sort_index(axis=1)
    )
    return mk(identity), mk(cov)


@pytest.mark.parametrize(
    ("example", "scaled"),
    [("viral_example", 300), ("bacterial_example", 1000)],
)
def test_sourmash_matrices_match_fixtures(
    fixtures_dir: Path, example: str, scaled: int
) -> None:
    directory = fixtures_dir / example
    identity, cov = _matrices_for(directory, scaled)
    exp_i = (
        pd.read_csv(directory / "matrices" / "sourmash_identity.tsv", sep="\t", index_col=0)
        .sort_index(axis=0)
        .sort_index(axis=1)
    )
    exp_c = (
        pd.read_csv(directory / "matrices" / "sourmash_coverage.tsv", sep="\t", index_col=0)
        .sort_index(axis=0)
        .sort_index(axis=1)
    )
    assert np.nanmax(np.abs(identity.values - exp_i.values)) < ATOL
    assert np.nanmax(np.abs(cov.values - exp_c.values)) < ATOL


def test_intersection_device_matches_host(viral_example: Path) -> None:
    fastas = sorted(
        p
        for ext in (".fasta", ".fas", ".fna")
        for p in viral_example.glob(f"*{ext}")
    )
    sketches = [sketch_genome(load_genome(p), 31, 300) for p in fastas]
    host = intersection_matrix_host(sketches)
    device = intersection_matrix_device(sketches, block=128)
    assert np.array_equal(host, device)


def test_no_overlap_gives_nan(bad_alignments: Path) -> None:
    fastas = sorted(
        p
        for ext in (".fasta", ".fas", ".fna")
        for p in bad_alignments.glob(f"*{ext}")
    )
    sketches = [sketch_genome(load_genome(p), 31, 1000) for p in fastas]
    identity, cov = containment_ani(sketches, use_device=False)
    # Self-comparisons are exactly 1.0; diagonal must hold
    assert np.all(np.diag(identity) == 1.0)


def test_device_sketch_parity_with_host() -> None:
    """Device sketching (interpret on CPU) is bit-identical to the host
    path, across chunk boundaries, N runs, multi-record genomes, and
    cross-genome batch pooling (ops/minhash.sketch_genomes_device)."""
    import numpy as np

    from pyani_plus_tpu.genomes import Genome, SequenceRecord
    from pyani_plus_tpu.ops.minhash import sketch_genome, sketch_genomes_device

    rng = np.random.default_rng(31)
    genomes = []
    for gi in range(5):
        recs = []
        for ri in range(1 + gi % 3):
            n = int(rng.integers(200, 40_000))
            codes = rng.integers(0, 4, n, dtype=np.uint8)
            codes[rng.random(n) < 0.002] = 4  # N runs
            recs.append(SequenceRecord(title=f"r{ri}".encode(), codes=codes))
        genomes.append(Genome(md5=f"g{gi}", path=None, records=recs))
    dev = sketch_genomes_device(genomes, 31, 40, chunk_w=1 << 13, batch=3)
    for genome, sk in zip(genomes, dev):
        host = sketch_genome(genome, 31, 40)
        assert np.array_equal(sk.hashes, host.hashes), genome.md5

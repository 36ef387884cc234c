"""Mesh factorisation, ownership algebra, and FracMinHash edge cases."""

import numpy as np
import pytest

from pyani_plus_tpu.ops import minhash
from pyani_plus_tpu.ops.minhash import (
    Sketch,
    containment_ani,
    max_hash_for_scaled,
)
from pyani_plus_tpu.parallel.tiles import make_mesh, owned_pairs


def test_make_mesh_factorisations() -> None:
    """The device grid factors as square as possible for every count."""
    for n, want in ((1, (1, 1)), (2, (1, 2)), (4, (2, 2)), (6, (2, 3)),
                    (8, (2, 4))):
        mesh = make_mesh(n)
        assert mesh.devices.shape == want, n
        assert mesh.axis_names == ("q", "s")


def test_owned_pairs_partition_is_exact() -> None:
    """Ownership over K hosts partitions the N x N grid exactly."""
    n, k = 7, 3
    seen = []
    for h in range(k):
        mine = owned_pairs(n, h, k)
        assert mine  # every host gets work at this size
        seen.extend(mine)
    assert sorted(seen) == [(q, s) for q in range(n) for s in range(n)]


def test_owned_pairs_single_host_owns_all() -> None:
    assert len(owned_pairs(5, 0, 1)) == 25


def test_max_hash_for_scaled() -> None:
    assert max_hash_for_scaled(1) == 2**64 - 1
    # scaled=1000 keeps ~1/1000 of hash space
    assert abs(max_hash_for_scaled(1000) / 2**64 - 1e-3) < 1e-6


def _sketch(hashes, name="x", k=31, scaled=1000):
    return Sketch(name, k, scaled, np.asarray(sorted(hashes), dtype=np.uint64))


def test_containment_identical_sketches() -> None:
    s = _sketch(range(100))
    identity, cov = containment_ani([s, s], use_device=False)
    assert identity.shape == (2, 2)
    assert np.allclose(identity, 1.0)
    assert np.allclose(cov, 1.0)


def test_containment_disjoint_sketches_nan() -> None:
    a = _sketch(range(100))
    b = _sketch(range(1000, 1100))
    identity, cov = containment_ani([a, b], use_device=False)
    assert np.isnan(identity[0, 1])
    assert np.isnan(identity[1, 0])
    assert identity[0, 0] == 1.0


def test_containment_subset_max_symmetry() -> None:
    """identity uses MAX containment so it is symmetric even when the
    sketches nest; cov_query is the asymmetric query containment."""
    big = _sketch(range(200))
    small = _sketch(range(100))  # subset of big
    identity, cov = containment_ani([big, small], use_device=False)
    assert np.isclose(identity[0, 1], identity[1, 0])
    # max containment is 1.0 (small fully inside big) -> identity 1.0
    assert np.isclose(identity[0, 1], 1.0)
    # cov is the QUERY-containment ANI estimate, containment^(1/k)
    # (sourmash query_containment_ani semantics)
    assert np.isclose(cov[1, 0], 1.0)  # small vs big: fully contained
    assert np.isclose(cov[0, 1], 0.5 ** (1 / 31))  # big vs small: half


def test_empty_sketch_gives_nan_row() -> None:
    empty = _sketch([])
    full = _sketch(range(50))
    identity, cov = containment_ani([empty, full], use_device=False)
    assert np.isnan(identity[0, 1])
    assert np.isnan(identity[1, 0])


def test_sketch_genome_empty_and_tiny(tmp_path) -> None:
    """Genomes shorter than k (or all-N) sketch to zero hashes."""
    from pyani_plus_tpu.genomes import load_genome
    from pyani_plus_tpu.ops.minhash import sketch_genome

    f = tmp_path / "tiny.fasta"
    f.write_text(">t\nACGT\n")  # < k=31
    sk = sketch_genome(load_genome(f), 31, 1000)
    assert sk.hashes.size == 0
    f2 = tmp_path / "n.fasta"
    f2.write_text(">n\n" + "N" * 200 + "\n")
    sk2 = sketch_genome(load_genome(f2), 31, 1000)
    assert sk2.hashes.size == 0


def test_scaled_monotone_sketch_size(tmp_path) -> None:
    """Smaller scaled keeps more hashes; scaled=1 keeps every distinct
    canonical k-mer."""
    from pyani_plus_tpu.genomes import load_genome
    from pyani_plus_tpu.ops.minhash import sketch_genome

    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    f = tmp_path / "g.fasta"
    f.write_text(f">g\n{seq}\n")
    genome = load_genome(f)
    sizes = [sketch_genome(genome, 31, s).hashes.size for s in (1, 10, 100)]
    assert sizes[0] >= sizes[1] >= sizes[2]
    assert sizes[0] > 4500  # nearly all distinct 31-mers kept at scaled=1

"""FracMinHash sketching and all-pairs containment scoring.

TPU-native replacement for ``sourmash`` + ``sourmash_plugin_branchwater``
(reference invocations: pyani_plus/methods/sourmash.py:34-206). A sketch is
the sorted set of 64-bit canonical-k-mer hashes whose value is <= 2^64 /
scaled; containment of sketch A in sketch B is |A n B| / |A| and the ANI
point estimate is containment ** (1/k) (verified against the reference's
fixture ``manysearch.csv``).

All-pairs intersection counting has two paths:

- :func:`intersection_matrix_host` -- sparse matmul on host (scipy), used
  for small inputs and as the correctness oracle;
- :func:`intersection_matrix_device` -- the TPU path: the union of hashes
  is split into fixed-size blocks, each block becomes a dense {0,1}
  membership matrix (N_genomes x block), and the MXU computes
  counts += M @ M.T per block. Exact in float32 for counts < 2^24.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyani_plus_tpu.genomes import Genome
from pyani_plus_tpu.ops.kmers import canonical_kmer_hashes

DEFAULT_KMER = 31  # ref methods/sourmash.py:31
DEFAULT_SCALED = 1000  # ref methods/sourmash.py:30


def max_hash_for_scaled(scaled: int) -> int:
    """sourmash's scaled -> max_hash mapping (float64 rounding included).

    Matches the ``max_hash`` recorded in reference fixture .sig files,
    e.g. scaled=300 -> 61489146912365176.
    """
    if scaled <= 0:
        msg = f"scaled must be positive, got {scaled}"
        raise ValueError(msg)
    if scaled == 1:
        return 2**64 - 1
    return min(int(round(2**64 / scaled, 0)), 2**64 - 1)


@dataclass(frozen=True)
class Sketch:
    """A FracMinHash sketch: sorted unique retained hashes."""

    md5: str
    ksize: int
    scaled: int
    hashes: np.ndarray  # sorted unique uint64

    @property
    def num_hashes(self) -> int:
        return int(self.hashes.size)


def sketch_genome(genome: Genome, ksize: int = DEFAULT_KMER, scaled: int = DEFAULT_SCALED) -> Sketch:
    """FracMinHash sketch of a genome (all sequences pooled).

    Uses the native C++ hashing kernel when available (bit-identical to
    the numpy path; parity-tested), falling back to numpy otherwise.
    """
    from pyani_plus_tpu.native import sketch_codes_native

    max_hash = np.uint64(max_hash_for_scaled(scaled))
    kept: list[np.ndarray] = []
    for rec in genome.records:
        h = sketch_codes_native(rec.codes, ksize, int(max_hash))
        if h is None:
            h = canonical_kmer_hashes(rec.codes, ksize)
            h = h[h <= max_hash]
        if h.size:
            kept.append(h)
    if kept:
        hashes = np.unique(np.concatenate(kept))
    else:
        hashes = np.empty(0, np.uint64)
    return Sketch(md5=genome.md5, ksize=ksize, scaled=scaled, hashes=hashes)


def intersection_matrix_host(sketches: list[Sketch]) -> np.ndarray:
    """All-pairs |A n B| via sparse matmul on host. Returns (N, N) int64."""
    from scipy import sparse

    n = len(sketches)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    all_hashes = np.concatenate([s.hashes for s in sketches]) if any(
        s.hashes.size for s in sketches
    ) else np.empty(0, np.uint64)
    if all_hashes.size == 0:
        return np.zeros((n, n), dtype=np.int64)
    _, inverse = np.unique(all_hashes, return_inverse=True)
    rows = np.repeat(np.arange(n), [s.hashes.size for s in sketches])
    data = np.ones(all_hashes.size, dtype=np.int64)
    m = sparse.csr_matrix(
        (data, (rows, inverse)), shape=(n, int(inverse.max()) + 1 if inverse.size else 1)
    )
    return np.asarray((m @ m.T).todense(), dtype=np.int64)


def intersection_matrix_device(
    sketches: list[Sketch], *, block: int = 2048
) -> np.ndarray:
    """All-pairs |A n B| on the TPU MXU via blocked membership matmuls.

    Sketches ship to the device once as compact per-genome union-id lists
    (padded int32) -- a few hundred KB, not the dense matrix. Per hash
    block, a one-hot scatter builds the (N, block) {0,1} membership on
    device and the MXU computes the partial Gram; XLA accumulates across
    blocks. Exact for counts < 2^24 (float32 integers).
    """
    import jax
    import jax.numpy as jnp

    n = len(sketches)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    sizes = [s.hashes.size for s in sketches]
    if sum(sizes) == 0:
        return np.zeros((n, n), dtype=np.int64)
    all_hashes = np.concatenate([s.hashes for s in sketches])
    union, inverse = np.unique(all_hashes, return_inverse=True)
    u = union.size
    nblocks = -(-u // block)

    # Compact per-genome id lists, padded with -1 (sketch hashes are
    # unique per genome, so membership is 0/1 by construction).
    s_max = max(sizes)
    ids = np.full((n, s_max), -1, dtype=np.int32)
    offset = 0
    for i, size in enumerate(sizes):
        ids[i, :size] = inverse[offset : offset + size]
        offset += size

    @jax.jit
    def gram_block(counts, ids_dev, b_start):
        # Membership by comparison, not scatter: scatters of this width
        # compile pathologically on TPU, while the (n, s_max, block)
        # equality broadcast + any-reduce is VPU-friendly and compiles
        # in ~1s. Padding ids are -1 and never match a block id.
        blk = b_start + jnp.arange(block, dtype=jnp.int32)
        m = (ids_dev[:, :, None] == blk[None, None, :]).any(axis=1)
        mf = m.astype(jnp.float32)
        return counts + jnp.dot(mf, mf.T, preferred_element_type=jnp.float32)

    ids_dev = jnp.asarray(ids)
    counts = jnp.zeros((n, n), jnp.float32)
    for b in range(nblocks):
        counts = gram_block(counts, ids_dev, jnp.int32(b * block))
    return np.asarray(counts).astype(np.int64)


def containment_ani(
    sketches: list[Sketch],
    *,
    use_device: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs (identity, cov_query) matrices for the sourmash method.

    identity[q, s] = max(c_qs, c_sq) ** (1/k)   ("max_containment_ani")
    cov[q, s]      = c_qs ** (1/k)              ("query_containment_ani")

    where c_qs = |Q n S| / |Q|. Pairs with an empty intersection (or an
    empty sketch) give NaN, matching the reference's absent-pair -> None
    semantics (methods/sourmash.py:140-144).
    """
    n = len(sketches)
    ksize = sketches[0].ksize if sketches else DEFAULT_KMER
    if use_device is None:
        total = sum(s.hashes.size for s in sketches)
        use_device = n >= 64 and total > 1 << 18
    inter = (
        intersection_matrix_device(sketches)
        if use_device
        else intersection_matrix_host(sketches)
    )
    sizes = np.array([s.hashes.size for s in sketches], dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        c_q = inter / sizes[:, None]  # containment of query (row) in subject
        c_s = inter / sizes[None, :]  # containment of subject in query
        c_max = np.maximum(c_q, c_s)
        identity = np.power(c_max, 1.0 / ksize)
        cov = np.power(c_q, 1.0 / ksize)
    # Zero intersection or empty sketches -> failed alignment -> NaN
    bad = (inter == 0) | ~np.isfinite(c_q) | ~np.isfinite(c_max)
    identity[bad] = np.nan
    cov[bad] = np.nan
    # Exact 1.0 on the diagonal for self-comparisons with non-empty sketches
    return identity, cov

"""Exact k-mer seed finding: hash join + diagonal clustering.

Replaces BLAST's word lookup (word size 11 for ``-task blastn``) and
feeds the banded DP: for a query fragment vs a subject sequence, find
the diagonals carrying exact k-mer matches and group them into candidate
bands. Plus and minus strands are handled by seeding the reverse
complement of the query separately.

Packing: a k-mer over codes 0..3 packs into 2k bits of an int64; windows
containing N (code 4) are excluded.
"""

from __future__ import annotations

import numpy as np

from pyani_plus_tpu.genomes import CODE_N, complement_codes

WORD_SIZE = 11  # blastn -task blastn default


def pack_kmers(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(packed_values, positions) of all N-free k-mers of a code array."""
    n = codes.size - k + 1
    if n <= 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    c = codes.astype(np.int64)
    invalid = (codes >= CODE_N).astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(invalid)))
    valid = (csum[k:] - csum[:-k]) == 0
    packed = np.zeros(n, dtype=np.int64)
    for j in range(k):
        packed |= (c[j : j + n] & 3) << (2 * (k - 1 - j))
    pos = np.nonzero(valid)[0]
    return packed[pos], pos


class SeedIndex:
    """Sorted k-mer table of one subject sequence for hash-join lookups."""

    def __init__(self, codes: np.ndarray, k: int = WORD_SIZE) -> None:
        self.k = k
        self.length = int(codes.size)
        values, positions = pack_kmers(codes, k)
        order = np.argsort(values, kind="stable")
        self.values = values[order]
        self.positions = positions[order]

    def hits(self, query_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (query_pos, subject_pos) exact k-mer matches."""
        q_values, q_pos = pack_kmers(query_codes, self.k)
        if q_values.size == 0 or self.values.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        lo = np.searchsorted(self.values, q_values, side="left")
        hi = np.searchsorted(self.values, q_values, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        qp = np.repeat(q_pos, counts)
        offsets = np.concatenate(
            [np.arange(c) + start for c, start in zip(counts, lo) if c > 0]
        )
        sp = self.positions[offsets]
        return qp, sp


def candidate_bands(
    q_pos: np.ndarray,
    s_pos: np.ndarray,
    *,
    band_merge: int = 48,
    max_bands: int = 4,
) -> list[tuple[int, int, int]]:
    """Cluster seed hits by diagonal; return up to max_bands candidates.

    Returns (diag_lo, diag_hi, n_seeds) tuples sorted by seed count
    descending, where diag = subject_pos - query_pos. Diagonals within
    ``band_merge`` of each other merge into one band (indel slack).
    """
    if q_pos.size == 0:
        return []
    diags = s_pos - q_pos
    diags_sorted = np.sort(diags)
    # Split where the gap between consecutive diagonals exceeds band_merge
    splits = np.nonzero(np.diff(diags_sorted) > band_merge)[0] + 1
    groups = np.split(diags_sorted, splits)
    bands = [(int(g[0]), int(g[-1]), int(g.size)) for g in groups]
    bands.sort(key=lambda b: -b[2])
    return bands[:max_bands]

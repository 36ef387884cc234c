"""Parity of the streamed maxmatch path (suffix-automaton link-tree
Euler tour) vs the combined-suffix-array oracle.

This is dnadiff's seeding mode (nucmer --maxmatch): ALL maximal
matches, so the fuzz leans on ref-internal repeats (occurrence
multiplicity per level) and query duplications.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyani_plus_tpu.ops.suffix import (
    SEED_CACHE,
    max_matches_indexed,
    maximal_matches,
    seed_index_enabled,
)

pytestmark = pytest.mark.skipif(
    not seed_index_enabled(), reason="native suffix automaton unavailable"
)


def _sets(ref: np.ndarray, qry: np.ndarray, min_len: int):
    r0, q0, l0 = maximal_matches(
        ref, qry, min_len, unique_ref=False, unique_qry=False
    )
    r1, q1, l1 = max_matches_indexed(
        SEED_CACHE.sam_for(ref), ref, qry, min_len
    )
    return (
        set(zip(r0.tolist(), q0.tolist(), l0.tolist())),
        set(zip(r1.tolist(), q1.tolist(), l1.tolist())),
    )


def test_fuzz_parity_vs_suffix_array() -> None:
    rng = np.random.default_rng(13)
    for _trial in range(30):
        n = int(rng.integers(60, 2000))
        ref_parts = [rng.integers(0, 4, n).astype(np.uint8)]
        if rng.random() < 0.6:  # ref-internal repeat -> multiplicity
            ref_parts.append(ref_parts[0][: int(rng.integers(25, 200))].copy())
        ref = np.concatenate(ref_parts)
        parts = []
        for _ in range(int(rng.integers(1, 5))):
            s = int(rng.integers(0, max(1, n - 50)))
            ln = int(rng.integers(30, min(600, n - s)))
            chunk = ref[s : s + ln].copy()
            mut = rng.random(ln) < rng.uniform(0, 0.1)
            chunk[mut] = (chunk[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
            parts.append(chunk)
            if rng.random() < 0.4:
                parts.append(chunk.copy())
            if rng.random() < 0.3:
                parts.append(np.full(int(rng.integers(1, 10)), 4, np.uint8))
        qry = np.concatenate(parts)
        if rng.random() < 0.5:
            ref = ref.copy()
            ref[rng.integers(0, ref.size, int(rng.integers(1, 8)))] = 4
        old, new = _sets(ref, qry, int(rng.integers(15, 25)))
        assert old == new


def test_multiplicity_exact_lengths() -> None:
    # Three ref copies of a block with distinct contexts: each query
    # occurrence pairs with every copy, at the exact pairwise LCP.
    rng = np.random.default_rng(23)
    block = rng.integers(0, 4, 60).astype(np.uint8)
    spacers = [rng.integers(0, 4, 40).astype(np.uint8) for _ in range(4)]
    ref = np.concatenate(
        [spacers[0], block, spacers[1], block, spacers[2], block, spacers[3]]
    )
    qry = np.concatenate([block, rng.integers(0, 4, 30).astype(np.uint8)])
    old, new = _sets(ref, qry, 20)
    assert old == new
    assert len(new) >= 3  # one per ref copy at least


def test_empty_and_short_inputs() -> None:
    rng = np.random.default_rng(29)
    seq = rng.integers(0, 4, 300).astype(np.uint8)
    assert _sets(seq, np.empty(0, np.uint8), 20)[1] == set()
    assert _sets(seq, seq[:10].copy(), 20)[1] == set()
    old, new = _sets(seq, seq.copy(), 20)
    assert old == new

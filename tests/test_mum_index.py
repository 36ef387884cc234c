"""Parity of the streamed MUM path (native suffix automaton) vs the
combined-suffix-array oracle (ops/suffix.maximal_matches).

The indexed path is the ANIm production seeding route
(methods/anim.py align_sequences); the suite's fixture tests already
exercise it end-to-end, so here we fuzz the match-set equivalence
directly, with adversarial inputs: query-internal repeats (the
group-max uniqueness rule), ambiguous bases on both sides, and
boundary matches.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyani_plus_tpu.ops.suffix import (
    SEED_CACHE,
    SeedIndexCache,
    maximal_matches,
    mum_matches_indexed,
    seed_index_enabled,
)

pytestmark = pytest.mark.skipif(
    not seed_index_enabled(), reason="native suffix automaton unavailable"
)


def _mum_sets(ref: np.ndarray, qry: np.ndarray, min_len: int):
    r0, q0, l0 = maximal_matches(
        ref, qry, min_len, unique_ref=True, unique_qry=True
    )
    r1, q1, l1 = mum_matches_indexed(
        SEED_CACHE.sam_for(ref), ref, qry, min_len
    )
    return (
        set(zip(r0.tolist(), q0.tolist(), l0.tolist())),
        set(zip(r1.tolist(), q1.tolist(), l1.tolist())),
    )


def test_fuzz_parity_vs_suffix_array() -> None:
    rng = np.random.default_rng(7)
    for _trial in range(40):
        n = int(rng.integers(60, 3000))
        ref = rng.integers(0, 4, n).astype(np.uint8)
        parts = []
        for _ in range(int(rng.integers(1, 6))):
            s = int(rng.integers(0, max(1, n - 50)))
            ln = int(rng.integers(30, min(700, n - s)))
            chunk = ref[s : s + ln].copy()
            mut = rng.random(ln) < rng.uniform(0, 0.1)
            chunk[mut] = (chunk[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
            parts.append(chunk)
            if rng.random() < 0.4:  # duplicated chunk: query-side repeats
                parts.append(chunk.copy())
            if rng.random() < 0.3:
                parts.append(
                    rng.integers(0, 4, int(rng.integers(0, 60))).astype(
                        np.uint8
                    )
                )
            if rng.random() < 0.3:  # ambiguous runs
                parts.append(np.full(int(rng.integers(1, 10)), 4, np.uint8))
        qry = np.concatenate(parts)
        if rng.random() < 0.5:
            ref = ref.copy()
            ref[rng.integers(0, n, int(rng.integers(1, 8)))] = 4
        old, new = _mum_sets(ref, qry, int(rng.integers(15, 25)))
        assert old == new


def test_boundary_and_identity_cases() -> None:
    rng = np.random.default_rng(11)
    seq = rng.integers(0, 4, 500).astype(np.uint8)
    # self vs self: one full-length MUM unless internal repeats
    old, new = _mum_sets(seq, seq.copy(), 20)
    assert old == new
    # query is an exact prefix / suffix / infix of ref
    for piece in (seq[:100], seq[-100:], seq[200:350]):
        old, new = _mum_sets(seq, piece.copy(), 20)
        assert old == new
    # empty and sub-min-length queries
    assert _mum_sets(seq, np.empty(0, np.uint8), 20)[1] == set()
    assert _mum_sets(seq, seq[:10].copy(), 20)[1] == set()


def test_exact_query_duplication_is_dropped() -> None:
    # A ref-unique block duplicated VERBATIM (same right context) in the
    # query is non-unique there and must vanish (unique_qry), exactly
    # like the oracle; the surrounding distinct-context matches stay.
    rng = np.random.default_rng(3)
    block = rng.integers(0, 4, 80).astype(np.uint8)
    other = rng.integers(0, 4, 200).astype(np.uint8)
    tail = other[:30]
    ref = np.concatenate([other[:100], block, tail, other[100:]])
    qry = np.concatenate([block, tail, other[30:67], block, tail])
    old, new = _mum_sets(ref, qry, 20)
    assert old == new
    # no MUM spans the duplicated block+tail at either query copy
    assert not any(ln >= 110 for _r, _q, ln in new)


def test_cache_dedupes_and_evicts() -> None:
    cache = SeedIndexCache(sam_capacity=2, rep_capacity=2)
    rng = np.random.default_rng(5)
    arrays = [rng.integers(0, 4, 100).astype(np.uint8) for _ in range(3)]
    first = cache.sam_for(arrays[0])
    assert cache.sam_for(arrays[0]) is first  # hit
    cache.sam_for(arrays[1])
    cache.sam_for(arrays[2])  # evicts arrays[0]
    assert ("sam", id(arrays[0])) not in cache._sam
    from pyani_plus_tpu.genomes import complement_codes

    rc = cache.rc_for(arrays[0])
    assert rc is cache.rc_for(arrays[0])
    np.testing.assert_array_equal(rc, complement_codes(arrays[0])[::-1])

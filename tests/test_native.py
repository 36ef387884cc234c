"""Parity tests: native C++ sketch kernel vs the numpy implementation."""

import numpy as np
import pytest

from pyani_plus_tpu.native import have_native, sketch_codes_native
from pyani_plus_tpu.ops.kmers import canonical_kmer_hashes
from pyani_plus_tpu.ops.minhash import max_hash_for_scaled

pytestmark = pytest.mark.skipif(not have_native(), reason="no C++ toolchain")


def test_unfiltered_parity() -> None:
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 50_000).astype(np.uint8)
    codes[rng.random(codes.size) < 0.01] = 4  # sprinkle Ns
    native = sketch_codes_native(codes, 31, 2**64 - 1)
    numpy_h = canonical_kmer_hashes(codes, 31)
    assert np.array_equal(native, numpy_h)


def test_scaled_filter_parity() -> None:
    rng = np.random.default_rng(6)
    codes = rng.integers(0, 4, 200_000).astype(np.uint8)
    max_hash = max_hash_for_scaled(1000)
    native = sketch_codes_native(codes, 31, max_hash)
    numpy_h = canonical_kmer_hashes(codes, 31)
    numpy_h = numpy_h[numpy_h <= np.uint64(max_hash)]
    assert np.array_equal(native, numpy_h)


def test_short_and_empty() -> None:
    assert sketch_codes_native(np.zeros(10, np.uint8), 31, 2**64 - 1).size == 0
    assert sketch_codes_native(np.zeros(0, np.uint8), 31, 2**64 - 1).size == 0


def test_k16_parity() -> None:
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 30_000).astype(np.uint8)
    native = sketch_codes_native(codes, 16, 2**64 - 1)
    numpy_h = canonical_kmer_hashes(codes, 16)
    assert np.array_equal(native, numpy_h)


def _py_suffix_array(text: np.ndarray) -> np.ndarray:
    n = text.size
    return np.asarray(
        sorted(range(n), key=lambda i: tuple(text[i:].tolist())), dtype=np.int64
    )


def test_suffix_array_native_parity(monkeypatch) -> None:
    from pyani_plus_tpu import native
    from pyani_plus_tpu.ops.suffix import lcp_array, suffix_array

    rng = np.random.default_rng(11)
    for n in (1, 2, 5, 97, 2000):
        text = rng.integers(0, 4, n).astype(np.int64)
        got_native = suffix_array(text)
        # pin the numpy prefix-doubling path for the same input
        monkeypatch.setattr(native, "suffix_array_native", lambda _t: None)
        monkeypatch.setattr(native, "kasai_lcp_native", lambda _t, _s: None)
        got_numpy = suffix_array(text)
        monkeypatch.undo()
        assert np.array_equal(got_native, got_numpy), n
        if n <= 100:
            assert np.array_equal(got_native, _py_suffix_array(text)), n
        # LCP parity on the same SA
        lcp_native = lcp_array(text, got_native)
        monkeypatch.setattr(native, "kasai_lcp_native", lambda _t, _s: None)
        lcp_numpy = lcp_array(text, got_native)
        monkeypatch.undo()
        assert np.array_equal(lcp_native, lcp_numpy), n


def test_suffix_array_native_sentinels() -> None:
    # Mixed large symbols as used by maximal_matches (separators, unique Ns)
    from pyani_plus_tpu.ops.suffix import lcp_array, suffix_array

    text = np.array([0, 1, 2, 3, 96, 2, 1, 0, 100, 101, 0, 1, 2, 97], np.int64)
    sa = suffix_array(text)
    assert np.array_equal(sa, _py_suffix_array(text))
    lcp = lcp_array(text, sa)
    # brute-force LCP check
    for r in range(1, text.size):
        i, j = sa[r - 1], sa[r]
        h = 0
        while i + h < text.size and j + h < text.size and text[i + h] == text[j + h]:
            h += 1
        assert lcp[r] == h, r


def test_band_dp_native_parity() -> None:
    from pyani_plus_tpu.ops.extend import _band_dp

    rng = np.random.default_rng(12)
    for trial in range(30):
        m = int(rng.integers(1, 120))
        n = int(rng.integers(1, 120))
        a = rng.integers(0, 4, m).astype(np.uint8)
        b = a[:n].copy() if rng.random() < 0.5 and n <= m else rng.integers(
            0, 4, n
        ).astype(np.uint8)
        # sprinkle Ns (code 4) which never match
        a[rng.random(m) < 0.05] = 4
        band = int(rng.integers(1, 20))
        for free_end in (False, True):
            got = _band_dp(a, b, band=band, free_end=free_end)
            want = _band_dp(a, b, band=band, free_end=free_end, force_numpy=True)
            assert got == want, (trial, band, free_end)


def test_fastani_winnow_native_parity() -> None:
    """Native deque winnower is bit-identical to the numpy oracle."""
    from pyani_plus_tpu.native import fastani_winnow_native
    from pyani_plus_tpu.ops.minimizers import window_minimizers_numpy

    rng = np.random.default_rng(7)
    alphabet = np.frombuffer(b"ACGTNacgtn", dtype=np.uint8)
    for _ in range(25):
        n = int(rng.integers(5, 4000))
        seq = bytes(rng.choice(alphabet, size=n))
        k = int(rng.integers(4, 20))
        w = int(rng.integers(1, 30))
        oracle = window_minimizers_numpy(seq, k, w)
        arrays = fastani_winnow_native(seq, k, w)
        assert arrays is not None
        hashes, positions, strands, firsts, lasts = arrays
        assert np.array_equal(oracle.hashes, hashes)
        assert np.array_equal(oracle.positions, positions)
        assert np.array_equal(oracle.strands, strands)
        assert np.array_equal(oracle.first_steps, firsts)
        assert np.array_equal(oracle.last_steps, lasts)


def test_fastani_eval_region_native_parity() -> None:
    """Fenwick-sweep region evaluation matches the dense numpy oracle."""
    from pyani_plus_tpu.native import fastani_eval_region_native
    from pyani_plus_tpu.ops.fastani_map import _evaluate_region_numpy

    rng = np.random.default_rng(11)
    for _ in range(40):
        qh = np.unique(
            rng.integers(0, 400, size=int(rng.integers(1, 100))).astype(
                np.uint64
            )
        )
        ne = int(rng.integers(1, 150))
        eh = rng.integers(0, 400, size=ne).astype(np.uint64)
        ef = np.sort(rng.integers(0, 300, size=ne))
        el = ef + rng.integers(0, 40, size=ne)
        w_steps = int(rng.integers(1, 80))
        ev = np.unique(
            np.clip(
                np.concatenate([ef - w_steps + 1, el + 1, [0]]), 0, 400
            )
        )
        s = int(rng.integers(1, qh.size + 1))
        expected = _evaluate_region_numpy(qh, eh, ef, el, ev, w_steps, s)
        got = fastani_eval_region_native(qh, eh, ef, el, ev, w_steps, s)
        assert got == expected


def test_fastani_map_fragment_native_parity() -> None:
    """Native full-fragment L2 search matches the numpy search."""
    from pyani_plus_tpu.native import fastani_map_fragment_native
    from pyani_plus_tpu.ops.fastani_map import (
        RefIndex,
        _search_mappings_numpy,
        n_window_steps,
    )
    from pyani_plus_tpu.ops.minimizers import window_minimizers

    rng = np.random.default_rng(13)
    base = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=20000)
    # Two reference sequences: a mutated copy and an unrelated one
    mut = base.copy()
    flips = rng.random(base.size) < 0.05
    mut[flips] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8),
                            size=int(flips.sum()))
    other = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=15000)
    ref = RefIndex.build([bytes(mut), bytes(other)], k=16, w=24)
    w_steps = n_window_steps(3000, 16, 24)
    for start in range(0, 18000, 2500):
        frag = bytes(base[start : start + 3000])
        mins = window_minimizers(frag, 16, 24)
        if mins.count == 0:
            continue
        qh = np.unique(mins.hashes)
        s = int(qh.size)
        expected = _search_mappings_numpy(qh, ref, w_steps, s, 3000, 23)
        got = fastani_map_fragment_native(
            qh,
            ref.hashes,
            ref.first_steps,
            ref.last_steps,
            ref.seq_ids,
            ref.hashes_sorted,
            ref.sorted_entry,
            ref.seq_lo_arr,
            ref.seq_hi_arr,
            ref.seq_ids_arr,
            w_steps,
            s,
            3000,
            23,
        )
        assert tuple(got) == tuple(expected)

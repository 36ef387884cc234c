"""Direct native-vs-numpy parity for the merge-join and chain-DP kernels.

These two kernels were previously exercised only through fixture-level
results; the architecture rule (CLAUDE.md) is that every native fast
path keeps a fuzz-tested slow oracle, so pin them directly by forcing
the numpy fallback via monkeypatching the native loader.
"""

import numpy as np
import pytest

import pyani_plus_tpu.methods.anib as anib_mod
import pyani_plus_tpu.ops.chaining as chaining_mod
from pyani_plus_tpu.ops.chaining import Alignment, many_to_many, one_to_one
from pyani_plus_tpu.ops.seeds import SeedIndex


def _random_alignments(rng, n):
    out = []
    for _ in range(n):
        rs = int(rng.integers(0, 5000))
        qs = int(rng.integers(0, 5000))
        ln = int(rng.integers(50, 800))
        out.append(
            Alignment(
                ref_start=rs,
                ref_end=rs + ln,
                qry_start=qs,
                qry_end=qs + ln + int(rng.integers(-10, 10)),
                errors=int(rng.integers(0, ln // 4)),
            )
        )
    return out


def test_chain_dp_native_matches_numpy_fallback(monkeypatch) -> None:
    rng = np.random.default_rng(17)
    cases = [_random_alignments(rng, int(rng.integers(1, 60))) for _ in range(20)]
    got_native = [
        ({id(a) for a in one_to_one(c)}, {id(a) for a in many_to_many(c)})
        for c in cases
    ]
    import pyani_plus_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "chain_dp_native", lambda *a, **k: None)
    got_numpy = [
        ({id(a) for a in one_to_one(c)}, {id(a) for a in many_to_many(c)})
        for c in cases
    ]
    assert got_native == got_numpy


def test_seed_join_native_matches_numpy_fallback(monkeypatch) -> None:
    """_record_strand_diags per-fragment diagonal sets are identical with
    and without the native merge join."""
    rng = np.random.default_rng(5)
    subject = rng.integers(0, 4, 12000).astype(np.uint8)
    # query shares long stretches with the subject plus random noise
    query = np.concatenate(
        [
            subject[2000:5000],
            rng.integers(0, 4, 2000).astype(np.uint8),
            subject[7000:9000][::-1],  # reversed chunk -> minus strand hits
        ]
    )
    index = SeedIndex(subject)

    def run():
        return anib_mod._record_strand_diags(query, index, 1020)

    plus_a, minus_a = run()
    import pyani_plus_tpu.methods.anib as anib_pkg  # noqa: F401
    import pyani_plus_tpu.native as native_mod

    monkeypatch.setattr(
        native_mod, "seed_join_diags_native", lambda *a, **k: None
    )
    plus_b, minus_b = run()
    for a, b in ((plus_a, plus_b), (minus_a, minus_b)):
        assert set(a) == set(b)
        for frag in a:
            assert np.array_equal(np.sort(a[frag]), np.sort(b[frag])), frag
    assert plus_a  # the shared stretches must actually produce hits
    assert minus_a


def test_local_align_stats_native_matches_numpy() -> None:
    """ops/dp.local_align_stats: native C++ vs the numpy oracle on random
    pairs, including the N-column identity accounting."""
    from pyani_plus_tpu.ops.dp import local_align_stats

    rng = np.random.default_rng(29)
    for _ in range(30):
        m = int(rng.integers(20, 250))
        q = rng.integers(0, 4, m).astype(np.uint8)
        s = q.copy()
        mut = rng.random(m) < 0.1
        s[mut] = (s[mut] + 1) % 4
        if rng.random() < 0.4:  # embed an N run on both sides
            start = int(rng.integers(0, max(1, m - 12)))
            ln = int(rng.integers(1, 12))
            q[start : start + ln] = 4
            s[start : start + ln] = 4
        if rng.random() < 0.5:  # indel
            cut = int(rng.integers(1, m - 1))
            s = np.concatenate([s[:cut], rng.integers(0, 4, 3, dtype=np.uint8), s[cut:]])
        native = local_align_stats(q, s)
        oracle = local_align_stats(q, s, force_numpy=True)
        assert (native is None) == (oracle is None)
        if native is not None:
            assert native == oracle

"""Compiled-mode (non-interpret) kernel parity on the REAL accelerator.

Opt-in: run as ``PYANI_TPU_TEST_REAL=1 pytest tests/test_tpu_compiled.py``
so conftest keeps the real backend (axon TPU) instead of forcing the
virtual CPU mesh. Skipped automatically on CPU-only sessions -- the
compiled Mosaic path is otherwise asserted only by bench.py (VERDICT r2
item 6). Keep shapes small: each new shape is a fresh service-side
compile over the tunnel (seconds to minutes).
"""

from __future__ import annotations

import numpy as np
import pytest


def _tpu_live() -> bool:
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - no backend at all
        return False


pytestmark = pytest.mark.skipif(
    not _tpu_live(), reason="needs a real accelerator (PYANI_TPU_TEST_REAL=1)"
)


def test_extend_pallas_compiled_parity() -> None:
    """The COMPILED Pallas extension kernel (interpret=False) matches the
    host kernel bit-for-bit on mixed lanes."""
    from pyani_plus_tpu.ops.extend import extend_errors
    from pyani_plus_tpu.ops.extend_pallas import batch_extend_pallas

    rng = np.random.default_rng(17)
    tasks = []
    for _ in range(24):
        m = int(rng.integers(80, 900))
        n = int(rng.integers(80, 900))
        a = rng.integers(0, 5, m).astype(np.uint8)
        b = rng.integers(0, 4, n).astype(np.uint8)
        if rng.random() < 0.7:
            span = min(m, n)
            b[:span] = a[:span] % 4
            mut = rng.random(span) < 0.08
            b[:span][mut] = (b[:span][mut] + 1) % 4
        tasks.append((a, b))
    got = batch_extend_pallas(tasks, stop_rows=600, interpret=False)
    for idx, (a, b) in enumerate(tasks):
        assert tuple(got[idx]) == tuple(extend_errors(a, b)), idx


def test_containment_gram_compiled_parity() -> None:
    """The device MXU containment Gram matches the host sparse oracle on
    the real chip."""
    from pyani_plus_tpu.ops.minhash import (
        Sketch,
        intersection_matrix_device,
        intersection_matrix_host,
    )

    rng = np.random.default_rng(5)
    pool = rng.choice(
        np.arange(1, 1 << 30, dtype=np.uint64), 3000, replace=False
    )
    sketches = [
        Sketch(
            md5=f"g{i}",
            ksize=31,
            scaled=1000,
            hashes=np.unique(rng.choice(pool, 400, replace=False)),
        )
        for i in range(24)
    ]
    dev = intersection_matrix_device(sketches, block=1024)
    host = intersection_matrix_host(sketches)
    assert np.array_equal(dev, host)

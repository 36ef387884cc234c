"""Pallas TPU kernel: batched Smith-Waterman scores for ANIb candidates.

Same score contract as ops/dp_jax.py::batch_local_align_scores (itself
bit-identical to the native host kernel in native/align.cpp): best
affine-gap local-alignment score of each (query fragment, subject
window) row pair, blastn scoring. The whole row loop lives INSIDE one
Pallas kernel, so all DP state stays VMEM-resident: the lax.scan
formulation re-materialises three (B, N) carries per query row through
HBO and pays a full-width jax.lax.cummax per row, which made the scan
path ~10x slower than the arithmetic needs.

Layout (follows the proven pattern of ops/extend_pallas.py): the batch
is the sublane axis -- each grid step owns LB lanes; every DP state is
an (LB, N_COLS) int32 array carried through an in-kernel fori loop over
query rows. The within-row E state is a prefix max over lanes of
g + ge*j, computed with a log-step doubling scan (pltpu.roll shifts);
query codes are extracted per row from an aligned CHUNK window with a
dynamic rotate (Mosaic needs provably 128-aligned lane offsets).

Score-only needs NO validity masks: padding code 5 never matches
anything (penalty everywhere), so padded lanes/rows only ever decay H
and can never raise the best score -- identical to the host kernel's
behaviour outside the real extent.

Shapes are fixed to ONE compiled geometry (M_COLS x N_COLS at batch
PALLAS_BATCH) because every distinct shape is a separate Mosaic compile
(minutes over the axon tunnel): ANIb fragments are <= 1020 rows and its
seed windows are >= frag + 2*150 margins, so the 2048-lane bucket
covers virtually every candidate; anything wider falls back to the
lax.scan kernel (ops/dp_jax.py).

Parity is fuzz-tested against the native host kernel in interpret mode
on CPU (tests/test_anib.py); compiled on real TPU via bench/production.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from pyani_plus_tpu.ops.dp import GAP_EXTEND, GAP_OPEN, PENALTY, REWARD

PAD_CODE = 5  # never matches anything, including itself

LB = 8  # batch lanes per grid step (sublane axis)
CHUNK = 128  # query rows per aligned load window
M_COLS = 1024  # padded query rows (>= ANIb fragsize 1020)
N_COLS = 2048  # padded subject window lanes
PALLAS_BATCH = 512  # rows per dispatch (fixed grid -> one compile)

NEG = -(10**6)


def _make_kernel(m_cols: int, n_cols: int, lb: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    reward = REWARD
    penalty = PENALTY
    go_ge = GAP_OPEN + GAP_EXTEND
    gap_open = GAP_OPEN
    ge = GAP_EXTEND
    neg = NEG

    def kernel(q_ref, s_ref, out_ref):
        s_codes = s_ref[:, :]  # (lb, n) int32, PAD_CODE padded
        lane = jax.lax.broadcasted_iota(jnp.int32, (lb, n_cols), 1)
        ge_j = ge * (lane + 1)  # ge * jidx (1-based columns)
        # iota-derived (not broadcast-constant) carries: Mosaic assigns
        # replicated layouts to splat (or single-axis-iota) constants,
        # which cannot re-layout into the loop body's fully tiled carry
        # layout ("Invalid relayout") -- derive the zeros from BOTH axes
        # so the initial layout is tiled like the body's outputs
        sublane = jax.lax.broadcasted_iota(jnp.int32, (lb, n_cols), 0)
        zeros = jnp.minimum(sublane + lane, 0)
        negs = zeros + neg
        s_valid = s_codes < 4

        def shift_left(x, s, fill):
            # out[k] = x[k - s] (fill for k < s)
            rolled = pltpu.roll(x, shift=s, axis=1)
            return jnp.where(lane < s, fill, rolled)

        def row_body(t, state, *, awin):
            h, f, best = state
            qc = pltpu.roll(awin, shift=(CHUNK - t) & (CHUNK - 1), axis=1)[
                :, :1
            ]  # (lb, 1): this row's query code
            match = (s_codes == qc) & (qc < 4) & s_valid
            sub = jnp.where(match, reward, penalty)
            diag = shift_left(h, 1, 0) + sub
            f = jnp.maximum(h - go_ge, f - ge)
            g = jnp.maximum(jnp.maximum(diag, f), 0)
            # E[j] = max_{j'<j}(g[j'] + ge*j') - go - ge*j: doubling
            # prefix max over lanes, then one shift for the j' < j bound
            a = g + ge_j
            s = 1
            while s < n_cols:
                a = jnp.maximum(a, shift_left(a, s, neg))
                s *= 2
            e = shift_left(a, 1, neg) - gap_open - ge_j
            h = jnp.maximum(g, e)
            best = jnp.maximum(best, h)
            return h, f, best

        def chunk_body(c, state):
            import jax.experimental.pallas as pl

            i0 = pl.multiple_of(c * CHUNK, CHUNK)
            awin = q_ref[:, pl.ds(i0, CHUNK)]
            return jax.lax.fori_loop(
                0, CHUNK, partial(row_body, awin=awin), state
            )

        h, f, best = jax.lax.fori_loop(
            0, m_cols // CHUNK, chunk_body, (zeros, negs, zeros)
        )
        score = jnp.max(best, axis=1, keepdims=True)
        pad = jnp.zeros((lb, 7), jnp.int32)
        out_ref[:, :] = jnp.concatenate([score, pad], axis=1)

    return kernel


_CALL_CACHE: dict[tuple, object] = {}


def _get_call(m_cols: int, n_cols: int, nb: int, interpret: bool):
    key = (m_cols, n_cols, nb, interpret)
    fn = _CALL_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_kernel(m_cols, n_cols, LB)

    def run(q_u8, s_u8):
        return pl.pallas_call(
            kernel,
            grid=(nb // LB,),
            in_specs=[
                pl.BlockSpec((LB, m_cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LB, n_cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LB, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 8), jnp.int32),
            interpret=interpret,
        )(q_u8.astype(jnp.int32), s_u8.astype(jnp.int32))

    fn = jax.jit(run)
    _CALL_CACHE[key] = fn
    return fn


def pallas_sw_supported(frag_m: int, window_n: int) -> bool:
    """Whether a (fragment rows, window lanes) pair fits the compiled shape."""
    return frag_m <= M_COLS and window_n <= N_COLS


def batch_sw_scores_pallas(
    queries: np.ndarray,  # (B, M) uint8 codes, PAD_CODE padded, M <= M_COLS
    subjects: np.ndarray,  # (B, N) uint8 codes, PAD_CODE padded, N <= N_COLS
    *,
    interpret: bool | None = None,
    m_cols: int | None = None,
    n_cols: int | None = None,
):
    """Best local-alignment score per row pair (async device array).

    Pads to the fixed (PALLAS_BATCH, M_COLS, N_COLS) compile geometry;
    callers slice the first B outputs. ``m_cols``/``n_cols`` exist for
    the interpret-mode parity tests (small shapes; CPU interpret at the
    production geometry would be glacial).
    """
    import jax.numpy as jnp

    if interpret is None:
        import jax

        interpret = jax.default_backend() in ("cpu",)
    mc = M_COLS if m_cols is None else m_cols
    nc = N_COLS if n_cols is None else n_cols
    b = queries.shape[0]
    nb = -(-b // PALLAS_BATCH) * PALLAS_BATCH if m_cols is None else -(-b // LB) * LB
    q = np.full((nb, mc), PAD_CODE, np.uint8)
    s = np.full((nb, nc), PAD_CODE, np.uint8)
    q[:b, : queries.shape[1]] = queries
    s[:b, : subjects.shape[1]] = subjects
    fn = _get_call(mc, nc, nb, interpret)
    return fn(jnp.asarray(q), jnp.asarray(s))[:b, 0]

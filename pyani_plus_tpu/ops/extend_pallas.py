"""Pallas TPU kernel: batched banded free-end extensions for ANIm.

Same contract as ops/extend_jax.py::batch_extend_errors (itself
bit-identical to the host oracle ops/extend.py::_band_dp with
``free_end=True``), but the whole row loop lives INSIDE one Pallas
kernel: all band state is VMEM-resident for the kernel's lifetime, one
row costs a handful of (LB, 128) vector ops, and there is no per-row HLO
dispatch -- the failure mode that made the lax.scan path
(ops/extend_jax.py) lose to the host C++ kernel and once faulted the
axon worker on very large grids (CLAUDE.md gotchas).

Layout: the batch is the sublane axis. Each grid step owns LB lanes;
every DP state is an (LB, 128) int32 array carried through an in-kernel
while/fori loop over rows (band width 121 = 2*60+1, padded to the
128-lane register width; columns >= 121 are permanently masked).
Scores and payloads are int32: a free extension can run ~10^4 rows, so
raw scores reach -7e4 and error payloads ~2e4 -- past int16 -- and the
host kernel's liveness tests (``s > NEG//2``) assume an untruncated
accumulator, so int16 state would break the bit-exactness contract.

Shifts along the band use pltpu.roll + edge masks; the horizontal-run
closure (state I) replaces the host prefix cummax + source gather with
an associative doubling scan that carries (score_key, source index,
error payloads) tuples, because lane gathers are the one primitive the
host formulation needs that Mosaic does not vectorise well. Tie rules
are reproduced exactly:

- M predecessor best3 prefers M >= D >= I (strict-greater takeovers);
- D prefers gap continuation on ties;
- I sources the LATEST running-max base (scan combine keeps the right
  operand on ties);
- the best cell updates on strictly greater score, or equal score with
  larger i + j;
- the give-up rule (``stop_rows`` rows without improvement) freezes a
  lane exactly where the host row loop breaks.

Reference role: nucmer postnuc's Extend_Alignment stage (SURVEY.md
section 2.2; reference hot loop private_cli.py:1194-1224). Parity is
fuzz-tested against the native kernel in tests/test_dp.py (interpret
mode on CPU; compiled on real TPU via bench.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from pyani_plus_tpu.ops.extend import EXTEND, MATCH, MISMATCH, NEG, OPEN

import os as _os

BAND = 60
WIDTH = 2 * BAND + 1  # 121 live band columns
LANE = 128  # padded band width (TPU lane count)
# batch lanes per grid step (sublane axis). More lanes per step amortise
# the per-row fixed overhead (loop control, rolls, reductions) across
# more band data; VMEM per step grows as LB * (m_cols + b_cols) * 4 B.
LB = int(_os.environ.get("PYANI_TPU_EXTEND_LB", "16"))
# rows per inner fori_loop; early-exit checks at this grain. Must be a
# multiple of 128 (Mosaic vector loads need provably 128-aligned lane
# offsets; 64 fails to compile) and must DIVIDE every M_COLS bucket so
# each bucket stays reachable after the ceil-to-CHUNK rounding --
# clamped to {128, 256}. 256 measured ~6% faster than 128 on hardware
# (loop-boundary overhead beats the give-up overshoot).
CHUNK = min(
    256,
    max(128, (int(_os.environ.get("PYANI_TPU_EXTEND_CHUNK", "256")) // 128) * 128),
)
# The ONLY device shapes ever compiled: each distinct (m_cols, b_cols) is
# a separate Mosaic compile (minutes over the axon tunnel), so m_cols is
# clamped to this fixed ladder; longer tasks fall back to the host kernel.
# Every bucket is a multiple of 256 so selection is CHUNK-independent
# (3456 was not: ceil(3400/256)*256 = 3584 skipped it, leaving the
# middle bucket cold after the warm pass and a mid-run compile behind).
M_COLS_BUCKETS = (1280, 3584, 10240)


def _shift_from_left(x, s, fill, lane_ids):
    """out[k] = x[k - s] (fill for k < s)."""
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    rolled = pltpu.roll(x, shift=s, axis=1)
    return jnp.where(lane_ids < s, fill, rolled)


def _shift_from_right(x, fill, lane_ids):
    """out[k] = x[k + 1] (fill at the last lane)."""
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    rolled = pltpu.roll(x, shift=LANE - 1, axis=1)
    return jnp.where(lane_ids == LANE - 1, fill, rolled)


def _make_kernel(stop_rows: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # plain Python ints: weak-typed scalars fold into int32 vector ops
    # without becoming captured tracer constants
    neg = NEG
    half_neg = NEG // 2
    match = MATCH
    mismatch = MISMATCH
    gap_open = OPEN
    gap_extend = EXTEND

    def kernel(m_ref, n_ref, a_ref, b_ref, out_ref):
        m_lane = m_ref[:, :]  # (LB, 1)
        n_lane = n_ref[:, :]
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (LB, LANE), 1)
        col_ok = lane_ids < WIDTH
        offs = lane_ids  # band column index k

        zeros = jnp.zeros((LB, LANE), jnp.int32)
        negs = jnp.full((LB, LANE), NEG, jnp.int32)

        # --- row 0: origin in M at j == 0; I holds the horizontal runs
        js0 = offs - BAND
        Ms = jnp.where(col_ok & (js0 == 0), 0, negs)
        i_ok = col_ok & (js0 >= 1) & (js0 <= n_lane)
        Is = jnp.where(i_ok, gap_open + gap_extend * (js0 - 1), negs)
        Ie = jnp.where(i_ok, js0, 0)

        cs0 = jnp.maximum(Ms, Is)
        ce0 = jnp.where(Ms >= Is, zeros, Ie)
        # Deferred best-cell tracking: per COLUMN a packed key
        # cs * 32768 + (2*i + k) -- score primary, i+j secondary (j =
        # k + i - BAND, so 2i+k orders exactly like i+j) -- plus the
        # payloads at the column's best. The per-row cross-lane argmax
        # reductions (5 per row in the old layout, ~half the kernel's
        # runtime) collapse to ONE row reduction for the give-up
        # counter; the global winner is extracted once after the loop.
        # Keys are non-negative for every recordable cell (negative
        # scores can never beat the initial best of 0), so -1 = none.
        # No overflow: cs <= MATCH * m_cols_max = 3*10240 = 30720, so
        # cs*32768 + (2i+k) <= ~1.007e9 < 2^31 (2.1x headroom; revisit
        # if a bucket above ~21k rows or a larger MATCH is ever added).
        key0 = jnp.where(cs0 >= 0, cs0 * 32768 + offs, -1)
        colkey = key0
        coli = zeros
        cole = jnp.where(cs0 >= 0, ce0, 0)
        coln = cole  # row-0 payloads: e == n == g == j
        colg = cole
        z1 = jnp.zeros((LB, 1), jnp.int32)
        best_key = jnp.max(key0, axis=1, keepdims=True)

        def row_body(t, state, *, i0, awin, bwin):
            (_i0, Ms, Me, Mn, Mg, Ds, De, Dn, Dg, Is, Ie, In, Ig,
             colkey, coli, cole, coln, colg, best_key,
             rows_since, dead) = state
            i = i0 + 1 + t
            # The banded j-1 window of b for this row is contiguous
            # (b_ext[lane, k + i] == b[k + i - BAND - 1]), but Mosaic
            # vector loads need lane offsets provably 128-aligned, so
            # the chunk pre-loads an aligned 2*CHUNK window and each row
            # extracts its 128 lanes with a dynamic rotate.
            bc = pltpu.roll(bwin, shift=2 * CHUNK - 1 - t, axis=1)[:, :LANE]
            ac = pltpu.roll(awin, shift=(CHUNK - t) & (CHUNK - 1), axis=1)[
                :, :1
            ]  # (LB, 1): a[i - 1]
            js = offs + (i - BAND)
            valid = col_ok & (js >= 0) & (js <= n_lane)

            # --- M: diagonal predecessor (same column), best3 M >= D >= I
            ps, pe, pn, pg = Ms, Me, Mn, Mg
            td = Ds > ps
            ps = jnp.where(td, Ds, ps)
            pe = jnp.where(td, De, pe)
            pn = jnp.where(td, Dn, pn)
            pg = jnp.where(td, Dg, pg)
            ti = Is > ps
            ps = jnp.where(ti, Is, ps)
            pe = jnp.where(ti, Ie, pe)
            pn = jnp.where(ti, In, pn)
            pg = jnp.where(ti, Ig, pg)
            sub_ok = (bc == ac) & (ac < 4) & (bc < 4)
            sub_same = bc == ac
            live_m = valid & (js >= 1) & (ps > half_neg)
            nMs = jnp.where(live_m, ps + jnp.where(sub_ok, match, mismatch), neg)
            nMe = jnp.where(live_m, pe + jnp.where(sub_ok, 0, 1), 0)
            nMn = jnp.where(live_m, pn + jnp.where(sub_same, 0, 1), 0)
            nMg = jnp.where(live_m, pg, 0)

            # --- D: vertical predecessor is column k+1 of the previous row
            om_s, om_e, om_n, om_g = Ms, Me, Mn, Mg
            t2 = Is > om_s
            om_s = jnp.where(t2, Is, om_s)
            om_e = jnp.where(t2, Ie, om_e)
            om_n = jnp.where(t2, In, om_n)
            om_g = jnp.where(t2, Ig, om_g)
            up_os = _shift_from_right(om_s, neg, lane_ids)
            up_oe = _shift_from_right(om_e, 0, lane_ids)
            up_on = _shift_from_right(om_n, 0, lane_ids)
            up_og = _shift_from_right(om_g, 0, lane_ids)
            up_ds = _shift_from_right(Ds, neg, lane_ids)
            up_de = _shift_from_right(De, 0, lane_ids)
            up_dn = _shift_from_right(Dn, 0, lane_ids)
            up_dg = _shift_from_right(Dg, 0, lane_ids)
            open_s = jnp.where(up_os > half_neg, up_os + gap_open, neg)
            cont_s = jnp.where(up_ds > half_neg, up_ds + gap_extend, neg)
            take_cont = cont_s >= open_s
            d_s = jnp.where(take_cont, cont_s, open_s)
            d_e = jnp.where(take_cont, up_de, up_oe) + 1
            d_n = jnp.where(take_cont, up_dn, up_on) + 1
            d_g = jnp.where(take_cont, up_dg, up_og) + 1
            dead_d = ~valid | (d_s <= half_neg)
            nDs = jnp.where(dead_d, neg, d_s)
            nDe = jnp.where(dead_d, 0, d_e)
            nDn = jnp.where(dead_d, 0, d_n)
            nDg = jnp.where(dead_d, 0, d_g)

            # --- I: latest-source running max of the row's open keys,
            # as an associative doubling scan. Ties keep the RIGHT
            # operand = later k. Payloads are absorbed: the horizontal
            # gap adds its length (k - src) to errors/nonid/gapcols
            # EQUALLY, so carry e_adj = e_src - src (consume as
            # e_adj + k) and the invariant deltas n - e and g - e.
            base_m = nMs >= nDs
            bs = jnp.where(base_m, nMs, nDs)
            be = jnp.where(base_m, nMe, nDe)
            bn = jnp.where(base_m, nMn, nDn)
            bg = jnp.where(base_m, nMg, nDg)
            key = jnp.where(
                bs > half_neg, bs + gap_open - gap_extend * (offs + 1), neg
            )
            sv, se, sn, sg = key, be - offs, bn - be, bg - be
            s = 1
            while s < LANE:
                lv = _shift_from_left(sv, s, neg, lane_ids)
                le = _shift_from_left(se, s, 0, lane_ids)
                ln_ = _shift_from_left(sn, s, 0, lane_ids)
                lg = _shift_from_left(sg, s, 0, lane_ids)
                take_left = lv > sv
                sv = jnp.where(take_left, lv, sv)
                se = jnp.where(take_left, le, se)
                sn = jnp.where(take_left, ln_, sn)
                sg = jnp.where(take_left, lg, sg)
                s *= 2
            left_max = _shift_from_left(sv, 1, neg, lane_ids)
            left_e = _shift_from_left(se, 1, 0, lane_ids)
            left_n = _shift_from_left(sn, 1, 0, lane_ids)
            left_g = _shift_from_left(sg, 1, 0, lane_ids)
            ok_i = valid & (js >= 1) & (left_max > half_neg)
            e_full = left_e + offs
            nIs = jnp.where(ok_i, left_max + gap_extend * offs, neg)
            nIe = jnp.where(ok_i, e_full, 0)
            nIn = jnp.where(ok_i, e_full + left_n, 0)
            nIg = jnp.where(ok_i, e_full + left_g, 0)

            # --- best-cell update (ties prefer larger i + j), deferred:
            # per-column packed-key running max + payloads; ONE row
            # reduction (the give-up counter needs per-row improvement)
            cs, ce, cn, cg = nMs, nMe, nMn, nMg
            t3 = nDs > cs
            cs = jnp.where(t3, nDs, cs)
            ce = jnp.where(t3, nDe, ce)
            cn = jnp.where(t3, nDn, cn)
            cg = jnp.where(t3, nDg, cg)
            t4 = nIs > cs
            cs = jnp.where(t4, nIs, cs)
            ce = jnp.where(t4, nIe, ce)
            cn = jnp.where(t4, nIn, cn)
            cg = jnp.where(t4, nIg, cg)
            row_active = (i <= m_lane) & (dead == 0)
            key = jnp.where(
                row_active & (cs >= 0), cs * 32768 + (2 * i + offs), -1
            )
            take = key > colkey  # within a column keys never tie
            colkey = jnp.where(take, key, colkey)
            coli = jnp.where(take, i, coli)
            cole = jnp.where(take, ce, cole)
            coln = jnp.where(take, cn, coln)
            colg = jnp.where(take, cg, colg)
            row_key = jnp.max(key, axis=1, keepdims=True)
            upd = row_key > best_key
            best_key = jnp.where(upd, row_key, best_key)
            rows_since = jnp.where(
                ~row_active, rows_since, jnp.where(upd, 0, rows_since + 1)
            )
            dead = jnp.where(
                row_active & (rows_since >= stop_rows), 1, dead
            )  # int32 0/1: Mosaic cannot carry i1 vectors through scf loops

            return (_i0, nMs, nMe, nMn, nMg, nDs, nDe, nDn, nDg,
                    nIs, nIe, nIn, nIg,
                    colkey, coli, cole, coln, colg, best_key,
                    rows_since, dead)

        m_block = jnp.max(m_lane)

        def chunk_cond(state):
            i0 = state[0]
            dead = state[-1]
            alive = jnp.any((dead == 0) & (i0 < m_lane))
            return (i0 < m_block) & alive

        # carry: (i0, 12 states, 6 best, rows_since, dead)
        def chunk_body(state):
            i0 = pl.multiple_of(state[0], CHUNK)
            awin = a_ref[:, pl.ds(i0, CHUNK)]
            bwin = b_ref[:, pl.ds(i0, 2 * CHUNK)]
            inner = jax.lax.fori_loop(
                0,
                CHUNK,
                partial(row_body, i0=state[0], awin=awin, bwin=bwin),
                state,
            )
            return (inner[0] + CHUNK,) + inner[1:]

        carry = (
            jnp.int32(0), Ms, zeros, zeros, zeros, negs, zeros, zeros, zeros,
            Is, Ie, Ie, Ie,
            colkey, coli, cole, coln, colg, best_key,
            jnp.zeros((LB, 1), jnp.int32), jnp.zeros((LB, 1), jnp.int32),
        )
        carry = jax.lax.while_loop(chunk_cond, chunk_body, carry)
        (_, _, _, _, _, _, _, _, _, _, _, _, _,
         colkey, coli, cole, coln, colg, _bk, _, _) = carry
        # Global winner: max packed key across columns; among key ties
        # pick the largest column (the old per-row argmax picked the
        # largest k at the winning row, and a cross-column key tie means
        # the later-k column's cell was recorded at an earlier row, so
        # the old update kept exactly that one).
        gkey = jnp.max(colkey, axis=1, keepdims=True)
        found = gkey >= 0
        k_sel = jnp.max(
            jnp.where(colkey == gkey, offs, -1), axis=1, keepdims=True
        )
        sel = (offs == k_sel) & (colkey == gkey)
        bi = jnp.max(jnp.where(sel, coli, 0), axis=1, keepdims=True)
        be = jnp.max(jnp.where(sel, cole, 0), axis=1, keepdims=True)
        bn = jnp.max(jnp.where(sel, coln, 0), axis=1, keepdims=True)
        bg = jnp.max(jnp.where(sel, colg, 0), axis=1, keepdims=True)
        z = jnp.zeros((LB, 1), jnp.int32)
        best_i = jnp.where(found, bi, z)
        best_j = jnp.where(found, bi + k_sel - BAND, z)
        best_s = jnp.where(found, jnp.maximum(gkey, 0) >> 15, z)
        best_e = jnp.where(found, be, z)
        best_n = jnp.where(found, bn, z)
        best_g = jnp.where(found, bg, z)
        pad = jnp.zeros((LB, 2), jnp.int32)
        out_ref[:, :] = jnp.concatenate(
            [best_i, best_j, best_s, best_e, best_n, best_g, pad], axis=1
        )

    return kernel


_CALL_CACHE: dict[tuple, object] = {}


def _get_call(stop_rows: int, m_cols: int, b_cols: int, interpret: bool):
    key = (stop_rows, m_cols, b_cols, interpret)
    fn = _CALL_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_kernel(stop_rows)

    def run(a_u8, b_u8, m, n):
        nb = a_u8.shape[0]
        a32 = a_u8.astype(jnp.int32)
        b32 = b_u8.astype(jnp.int32)
        grid = (nb // LB,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((LB, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LB, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LB, m_cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LB, b_cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LB, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 8), jnp.int32),
            interpret=interpret,
        )(m.reshape(-1, 1), n.reshape(-1, 1), a32, b32)

    fn = jax.jit(run)
    _CALL_CACHE[key] = fn
    return fn


def _is_tpu_backend() -> bool:
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def batch_extend_pallas(
    tasks: list[tuple[np.ndarray, np.ndarray]],
    *,
    stop_rows: int = 600,
    interpret: bool | None = None,
) -> list[tuple[int, int, int, int, int]]:
    """Free-end extensions for a batch of (a, b) code-array tails.

    Same result contract as ops/extend.py::extend_errors after the
    caller's pre-trim: per task (a_advance, b_advance, errors, nonid,
    gap_columns). Tasks are sorted by row count so the fixed-size lane
    blocks retire together, and row/column dimensions are bucketed to
    keep the jit cache small.
    """
    import jax.numpy as jnp

    nb = len(tasks)
    if nb == 0:
        return []
    if interpret is None:
        interpret = not _is_tpu_backend()
    # Hard cap on device shapes: anything needing more than the largest
    # fixed m_cols bucket runs on the bit-identical host kernel instead,
    # so a run can never trigger an unbounded fresh Mosaic compile
    # mid-flight (axon compiles cost minutes and are uncached
    # service-side). ANIm's tasks are pre-capped at MAX_EXTENSION +
    # breaklen = 10199 <= 10240, so this only fires for outside callers.
    oversize = [t for t in range(nb) if tasks[t][0].size > M_COLS_BUCKETS[-1]]
    if oversize:
        from pyani_plus_tpu.ops.extend import extend_errors

        keep = [t for t in range(nb) if tasks[t][0].size <= M_COLS_BUCKETS[-1]]
        results_all: list[tuple[int, int, int, int, int] | None] = [None] * nb
        for t, res in zip(
            keep,
            batch_extend_pallas(
                [tasks[t] for t in keep],
                stop_rows=stop_rows,
                interpret=interpret,
            ),
        ):
            results_all[t] = res
        for t in oversize:
            # extend_errors' give-up rule is stop_rows = 3 * breaklen;
            # pass the equivalent breaklen so the host fallback applies
            # the same abandonment semantics as the device lanes.
            results_all[t] = extend_errors(
                *tasks[t], breaklen=max(1, stop_rows // 3)
            )
        return results_all  # type: ignore[return-value]
    import os

    from pyani_plus_tpu.utils import devmeter

    order = sorted(range(nb), key=lambda t: tasks[t][0].size, reverse=True)
    # Fixed lane-block dispatches on real hardware: the jit retraces per
    # input SHAPE, so a variable lane count means a fresh ~2 s Mosaic
    # compile per new batch size. Splitting into fixed 512-lane blocks
    # pins the lane dimension to ONE shape per m_cols bucket (padded
    # lanes carry m=0 and exit their row loop immediately); the sorted
    # order also lets later (smaller-m) blocks use smaller row buckets.
    # Dispatch is async: all blocks enqueue before the first result is
    # materialised, so transfers and kernels pipeline on the device.
    lanes_env = os.environ.get("PYANI_TPU_EXTEND_LANES")
    block_lanes = int(lanes_env) if lanes_env else 512
    if interpret:  # tests: keep the minimal variable-shape single block
        blocks = [order]
    else:
        blocks = [
            order[lo : lo + block_lanes] for lo in range(0, nb, block_lanes)
        ]
    inflight = []
    for blk in blocks:
        k = len(blk)
        nb_pad = block_lanes if not interpret else -(-k // LB) * LB
        m_lens = np.zeros(k, dtype=np.int32)
        n_lens = np.zeros(k, dtype=np.int32)
        for pos, t in enumerate(blk):
            m_lens[pos] = tasks[t][0].size
            n_lens[pos] = tasks[t][1].size
        m_max = int(m_lens.max())
        n_max = int(n_lens.max())
        # Fixed row buckets: every distinct (m_cols, b_cols) pair is a
        # separate Mosaic compile -- padded rows past max(m) are nearly
        # free (the outer while_loop exits at the block's true rows).
        m_need = -(-m_max // CHUNK) * CHUNK
        for cand in M_COLS_BUCKETS:
            if m_need <= cand:
                m_cols = cand
                break
        # free-end tasks are pre-trimmed to limit = min(m, n) + breaklen,
        # so n <= m + breaklen; +384 covers BAND+1+n_max and lookahead
        b_cols = m_cols + 384
        if BAND + 1 + n_max > b_cols:  # pragma: no cover - untrimmed caller
            b_cols = m_cols + (-(-(BAND + 1 + n_max - m_cols) // LANE) * LANE)
        a_pad = np.full((nb_pad, m_cols), 255, dtype=np.uint8)
        b_ext = np.full((nb_pad, b_cols), 255, dtype=np.uint8)
        for pos, t in enumerate(blk):
            a, b = tasks[t]
            a_pad[pos, : a.size] = a
            b_ext[pos, BAND + 1 : BAND + 1 + b.size] = b
        m_in = np.zeros(nb_pad, dtype=np.int32)
        n_in = np.zeros(nb_pad, dtype=np.int32)
        m_in[:k] = m_lens
        n_in[:k] = n_lens
        fn = _get_call(stop_rows, m_cols, b_cols, interpret)
        t_submit = devmeter.now()
        fut = fn(
            jnp.asarray(a_pad), jnp.asarray(b_ext),
            jnp.asarray(m_in), jnp.asarray(n_in)
        )
        inflight.append((blk, fut, t_submit))
    results: list[tuple[int, int, int, int, int] | None] = [None] * nb
    for blk, fut, t_submit in inflight:
        out = np.asarray(fut)
        devmeter.record(t_submit)
        for pos, t in enumerate(blk):
            bi, bj, _bs, be, bn, bg = (int(v) for v in out[pos, :6])
            results[t] = (bi, bj, be, bn, bg)
    return results  # type: ignore[return-value]

"""Batched banded free-end extensions on device (TPU path for ANIm).

The outward extensions from terminal anchors (nucmer postnuc's
Extend_Alignment stage; host oracle ops/extend.py::_band_dp with
``free_end=True``) dominate ANIm/dnadiff wall time on divergent genomes:
thousands of independent (ref_tail, qry_tail) banded affine-gap DPs.
Each is sequential over rows, but they are embarrassingly parallel
across the batch -- exactly the TPU shape: states live as (B, W) int32
lanes, one ``lax.scan`` step per DP row, all lanes advancing together.

Bit-exactness contract: identical results to the native/numpy kernel,
including every tie rule --
  - M predecessor best3 with preference M >= D >= I;
  - D tie prefers gap continuation;
  - I sources the *latest* running-max base (ties to the right);
  - best cell updates on strictly greater score, or equal score with
    larger i+j;
  - the give-up rule (``stop_rows`` rows without improvement) freezes a
    lane exactly where the host kernel breaks out of its row loop.
Because the free-end band follows the unit diagonal (center(i) = i),
the diagonal predecessor of column k is column k of the previous row
and the vertical predecessor is column k+1 -- shifts, not gathers.

Lanes can be shorter than the padded shapes: per-lane (m, n) lengths
mask row activity and the j <= n boundary; a chunked ``while_loop``
stops as soon as every lane is dead or exhausted, so padded rows cost
nothing. Parity is fuzz-tested against the native kernel
(tests/test_dp.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from pyani_plus_tpu.ops.extend import EXTEND, MATCH, MISMATCH, NEG, OPEN

BAND = 60  # extend_errors' fixed band (ops/extend.py:234)
CHUNK = 512  # rows per while_loop body; early exit at chunk granularity


def _row_step(carry, xs, *, band, match, mismatch, gap_open, gap_extend,
              stop_rows, n_lane, m_lane, b_ext):
    import jax
    import jax.numpy as jnp

    (Ms, Me, Mn, Mg, Ds, De, Dn, Dg, Is, Ie, In, Ig,
     best_i, best_j, best_s, best_e, best_n, best_g, rows_since, dead) = carry
    i, ac = xs  # i: row index; ac: (B,) codes a[i-1]
    # The banded j-1 window of b for this row is CONTIGUOUS: j-1 = k+i-
    # band-1, so one dynamic_slice of the padded array (255-filled on
    # both flanks) replaces a (B, W) gather -- gathers were the entire
    # cost of the first version of this kernel on TPU.
    b_row = jax.lax.dynamic_slice(
        b_ext, (0, i), (b_ext.shape[0], Ms.shape[1])
    )

    width = Ms.shape[1]
    offs = jnp.arange(width, dtype=jnp.int32)
    js = offs[None, :] + (i - band)  # (1, W) broadcast over lanes
    valid = (js >= 0) & (js <= n_lane[:, None])
    neg = jnp.int32(NEG)

    # --- M: diagonal predecessor (same column, previous row), best3
    ps, pe, pn, pg = Ms, Me, Mn, Mg
    take_d = Ds > ps
    ps = jnp.where(take_d, Ds, ps)
    pe = jnp.where(take_d, De, pe)
    pn = jnp.where(take_d, Dn, pn)
    pg = jnp.where(take_d, Dg, pg)
    take_i = Is > ps
    ps = jnp.where(take_i, Is, ps)
    pe = jnp.where(take_i, Ie, pe)
    pn = jnp.where(take_i, In, pn)
    pg = jnp.where(take_i, Ig, pg)
    bc = b_row  # codes at j-1, pre-gathered (invalid j masked to 255)
    sub_ok = (bc == ac[:, None]) & (ac[:, None] < 4) & (bc < 4)
    sub_same = bc == ac[:, None]  # char identity: N==N is not a nonid error
    live_m = valid & (js >= 1) & (ps > neg // 2)
    nMs = jnp.where(live_m, ps + jnp.where(sub_ok, match, mismatch), neg)
    nMe = jnp.where(live_m, pe + (~sub_ok).astype(jnp.int32), 0)
    nMn = jnp.where(live_m, pn + (~sub_same).astype(jnp.int32), 0)
    nMg = jnp.where(live_m, pg, 0)

    # --- D: vertical predecessor is column k+1 of the previous row
    def up(x, fill):
        return jnp.concatenate(
            [x[:, 1:], jnp.full((x.shape[0], 1), fill, x.dtype)], axis=1
        )

    om_s, om_e, om_n, om_g = Ms, Me, Mn, Mg
    ti = Is > om_s
    om_s = jnp.where(ti, Is, om_s)
    om_e = jnp.where(ti, Ie, om_e)
    om_n = jnp.where(ti, In, om_n)
    om_g = jnp.where(ti, Ig, om_g)
    up_os, up_oe, up_on, up_og = (
        up(om_s, NEG), up(om_e, 0), up(om_n, 0), up(om_g, 0)
    )
    up_ds, up_de, up_dn, up_dg = up(Ds, NEG), up(De, 0), up(Dn, 0), up(Dg, 0)
    open_s = jnp.where(up_os > neg // 2, up_os + gap_open, neg)
    cont_s = jnp.where(up_ds > neg // 2, up_ds + gap_extend, neg)
    take_cont = cont_s >= open_s
    d_s = jnp.where(take_cont, cont_s, open_s)
    d_e = jnp.where(take_cont, up_de, up_oe) + 1
    d_n = jnp.where(take_cont, up_dn, up_on) + 1
    d_g = jnp.where(take_cont, up_dg, up_og) + 1
    dead_d = ~valid | (d_s <= neg // 2)
    nDs = jnp.where(dead_d, neg, d_s)
    nDe = jnp.where(dead_d, 0, d_e)
    nDn = jnp.where(dead_d, 0, d_n)
    nDg = jnp.where(dead_d, 0, d_g)

    # --- I: horizontal runs within the row (prefix running max, latest src)
    base_m = nMs >= nDs
    bs = jnp.where(base_m, nMs, nDs)
    be = jnp.where(base_m, nMe, nDe)
    bn = jnp.where(base_m, nMn, nDn)
    bg = jnp.where(base_m, nMg, nDg)
    key = jnp.where(
        bs > neg // 2, bs + gap_open - gap_extend * (offs[None, :] + 1), neg
    )
    run_max = jax.lax.cummax(key, axis=1)
    is_new = key >= run_max
    src = jax.lax.cummax(
        jnp.where(is_new, offs[None, :], jnp.int32(-1)), axis=1
    )
    left_max = jnp.concatenate(
        [jnp.full((key.shape[0], 1), NEG, key.dtype), run_max[:, :-1]], axis=1
    )
    left_src = jnp.concatenate(
        [jnp.full((key.shape[0], 1), -1, src.dtype), src[:, :-1]], axis=1
    )
    i_s = left_max + gap_extend * offs[None, :]
    ok_i = valid & (js >= 1) & (left_src >= 0) & (left_max > neg // 2)
    safe_src = jnp.clip(left_src, 0, width - 1)
    gb_e = jnp.take_along_axis(be, safe_src, axis=1)
    gb_n = jnp.take_along_axis(bn, safe_src, axis=1)
    gb_g = jnp.take_along_axis(bg, safe_src, axis=1)
    nIs = jnp.where(ok_i, i_s, neg)
    nIe = jnp.where(ok_i, gb_e + (offs[None, :] - safe_src), 0)
    nIn = jnp.where(ok_i, gb_n + (offs[None, :] - safe_src), 0)
    nIg = jnp.where(ok_i, gb_g + (offs[None, :] - safe_src), 0)

    # --- best-cell update (ties prefer larger i+j, i.e. larger k)
    cs, ce, cn, cg = nMs, nMe, nMn, nMg
    td = nDs > cs
    cs = jnp.where(td, nDs, cs)
    ce = jnp.where(td, nDe, ce)
    cn = jnp.where(td, nDn, cn)
    cg = jnp.where(td, nDg, cg)
    ti2 = nIs > cs
    cs = jnp.where(ti2, nIs, cs)
    ce = jnp.where(ti2, nIe, ce)
    cn = jnp.where(ti2, nIn, cn)
    cg = jnp.where(ti2, nIg, cg)
    row_max = jnp.max(cs, axis=1)
    # largest k among the ties for the row maximum
    is_max = cs == row_max[:, None]
    k_sel = (width - 1) - jnp.argmax(is_max[:, ::-1], axis=1)
    j_sel = k_sel + (i - band)
    sel = k_sel[:, None]
    e_sel = jnp.take_along_axis(ce, sel, axis=1)[:, 0]
    n_sel = jnp.take_along_axis(cn, sel, axis=1)[:, 0]
    g_sel = jnp.take_along_axis(cg, sel, axis=1)[:, 0]
    row_active = (i <= m_lane) & ~dead
    upd = row_active & (
        (row_max > best_s)
        | ((row_max == best_s) & (i + j_sel > best_i + best_j))
    )
    best_i = jnp.where(upd, i, best_i)
    best_j = jnp.where(upd, j_sel, best_j)
    best_s = jnp.where(upd, row_max, best_s)
    best_e = jnp.where(upd, e_sel, best_e)
    best_n = jnp.where(upd, n_sel, best_n)
    best_g = jnp.where(upd, g_sel, best_g)
    rows_since = jnp.where(
        ~row_active, rows_since, jnp.where(upd, 0, rows_since + 1)
    )
    if stop_rows > 0:
        dead = dead | (row_active & (rows_since >= stop_rows))

    return (
        (nMs, nMe, nMn, nMg, nDs, nDe, nDn, nDg, nIs, nIe, nIn, nIg,
         best_i, best_j, best_s, best_e, best_n, best_g, rows_since, dead),
        None,
    )


_KERNEL_CACHE: dict[tuple, object] = {}


def _get_kernel(band, match, mismatch, gap_open, gap_extend, stop_rows):
    key = (band, match, mismatch, gap_open, gap_extend, stop_rows)
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    width = 2 * band + 1

    def run(a_pad, b_ext, m_lane, n_lane):
        nb = a_pad.shape[0]
        m_max = a_pad.shape[1]
        offs = jnp.arange(width, dtype=jnp.int32)
        neg = jnp.int32(NEG)

        # row-0 init: origin in M at j == 0; I holds row-0 horizontal runs
        js0 = offs[None, :] - band
        Ms = jnp.where(js0 == 0, 0, NEG).astype(jnp.int32)
        Ms = jnp.broadcast_to(Ms, (nb, width))
        zeros = jnp.zeros((nb, width), jnp.int32)
        negs = jnp.full((nb, width), NEG, jnp.int32)
        i_ok = (js0 >= 1) & (js0 <= n_lane[:, None])
        Is = jnp.where(
            i_ok, gap_open + gap_extend * (js0 - 1), NEG
        ).astype(jnp.int32)
        Ie = jnp.where(i_ok, js0, 0).astype(jnp.int32)

        # row-0 best scan (host semantics: best starts (0,0,0,0,0))
        cs = jnp.maximum(Ms, Is)
        ce = jnp.where(Ms >= Is, zeros, Ie)
        row_max = jnp.max(cs, axis=1)
        is_max = cs == row_max[:, None]
        k_sel = (width - 1) - jnp.argmax(is_max[:, ::-1], axis=1)
        j_sel = k_sel - band
        e_sel = jnp.take_along_axis(ce, k_sel[:, None], axis=1)[:, 0]
        upd = (row_max > 0) | ((row_max == 0) & (j_sel > 0))
        zi = jnp.zeros((nb,), jnp.int32)
        best_i = zi
        best_j = jnp.where(upd, j_sel, 0)
        best_s = jnp.where(upd, row_max, 0)
        best_e = jnp.where(upd, e_sel, 0)
        best_n = jnp.where(upd, e_sel, 0)  # row-0 payloads: e == n == g == j
        best_g = jnp.where(upd, e_sel, 0)

        step = partial(
            _row_step,
            band=band,
            match=jnp.int32(match),
            mismatch=jnp.int32(mismatch),
            gap_open=jnp.int32(gap_open),
            gap_extend=jnp.int32(gap_extend),
            stop_rows=stop_rows,
            n_lane=n_lane,
            m_lane=m_lane,
            b_ext=b_ext,
        )

        def chunk_body(state):
            i0, carry = state
            rows = i0 + 1 + jnp.arange(CHUNK, dtype=jnp.int32)
            a_cols = jax.lax.dynamic_slice(
                a_pad, (0, i0), (nb, CHUNK)
            )  # codes a[i-1] for i in rows
            carry, _ = jax.lax.scan(step, carry, (rows, a_cols.T))
            return (i0 + CHUNK, carry)

        def chunk_cond(state):
            i0, carry = state
            dead = carry[-1]
            return (i0 < m_max) & jnp.any(~dead & (i0 < m_lane))

        carry0 = (
            Ms, zeros, zeros, zeros, negs, zeros, zeros, zeros,
            Is, Ie, Ie, Ie,
            best_i, best_j, best_s, best_e, best_n, best_g,
            jnp.zeros((nb,), jnp.int32), jnp.zeros((nb,), bool),
        )
        _, carry = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), carry0)
        )
        (_, _, _, _, _, _, _, _, _, _, _, _,
         bi, bj, bs_, be_, bn_, bg_, _, _) = carry
        return bi, bj, bs_, be_, bn_, bg_

    fn = jax.jit(run)
    _KERNEL_CACHE[key] = fn
    return fn


def batch_extend_errors(  # noqa: PLR0913
    tasks: list[tuple[np.ndarray, np.ndarray]],
    *,
    band: int = BAND,
    match: int = MATCH,
    mismatch: int = MISMATCH,
    gap_open: int = OPEN,
    gap_extend: int = EXTEND,
    stop_rows: int = 600,
) -> list[tuple[int, int, int, int, int]]:
    """Free-end extensions for a batch of (a, b) code-array tails.

    Returns per task (a_advance, b_advance, errors, nonid, gap_columns) with the
    exact semantics of ops/extend.py::_band_dp(free_end=True). Callers
    must pre-trim tails (extend_errors' ``limit``) and only submit tasks
    where max(len) >= band (so every lane shares the fixed band width).
    """
    import jax.numpy as jnp

    nb = len(tasks)
    if nb == 0:
        return []
    m_lens0 = np.array([t[0].size for t in tasks], dtype=np.int32)
    n_lens0 = np.array([t[1].size for t in tasks], dtype=np.int32)
    # Bucket every dimension so the jit cache stays small: lanes to the
    # next power of two (padding lanes have m == 0 and exit immediately),
    # rows/cols to chunk-aligned power-of-two-ish sizes.
    if nb <= 512:
        nb_pad = 1 << max(0, int(np.ceil(np.log2(max(1, nb)))))
    else:
        nb_pad = -(-nb // 512) * 512
    m_max = max(CHUNK, -(-int(m_lens0.max()) // 2048) * 2048)
    n_max = max(CHUNK, -(-int(n_lens0.max()) // 2048) * 2048)
    m_lens = np.zeros(nb_pad, dtype=np.int32)
    n_lens = np.zeros(nb_pad, dtype=np.int32)
    m_lens[:nb] = m_lens0
    n_lens[:nb] = n_lens0
    a_pad = np.full((nb_pad, m_max), 255, dtype=np.uint8)
    # b ships pre-padded for the contiguous banded row slices: 255-fill,
    # band+1 columns of left flank, and enough right flank that the row
    # slice at i = m_max stays in bounds without clamping.
    width = 2 * band + 1
    b_ext_w = max(m_max, n_max) + width + band + 2
    b_ext = np.full((nb_pad, b_ext_w), 255, dtype=np.uint8)
    for idx, (a, b) in enumerate(tasks):
        a_pad[idx, : a.size] = a
        b_ext[idx, band + 1 : band + 1 + b.size] = b
    fn = _get_kernel(band, match, mismatch, gap_open, gap_extend, stop_rows)
    # Codes ship as uint8 (4x less host->device traffic than int32).
    bi, bj, _bs, be, bn, bg = fn(
        jnp.asarray(a_pad),
        jnp.asarray(b_ext),
        jnp.asarray(m_lens),
        jnp.asarray(n_lens),
    )
    bi = np.asarray(bi)
    bj = np.asarray(bj)
    be = np.asarray(be)
    bn = np.asarray(bn)
    bg = np.asarray(bg)
    return [
        (int(bi[t]), int(bj[t]), int(be[t]), int(bn[t]), int(bg[t]))
        for t in range(nb)
    ]

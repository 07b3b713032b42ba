"""Fused DT-CWT perceptual-mask kernel: level-2 highpass analysis + |q2c|
magnitudes + 2x2 mean filter + rebin-to-level-3 + ceil(m/step), one launch.

The codecs' mask path (reference: dtcwt_key_encoder.py:29-33) consumed a
12-plane highpass analysis kernel PLUS ~6 XLA passes (abs/moveaxis/mean2x2/
rebin/ceil) over the [B, 12, h2, w2] planes — ~20 MB/frame of intermediate
HBM traffic at 1080p for a [B, 6, h3, w3] result 16x smaller than its
inputs.  This kernel keeps the whole chain in VMEM per strip:

  q-shift row matmul (17 rows per filter: one extra m=-1 row feeds the
  mean filter's row halo) -> 12 column convs (lane rolls) -> 6 subband
  magnitudes -> column pair-sum (mag[j-1] + mag[j], reflect-101 fixed at
  the true left edge) -> one dyadic [8, 17]-per-plane block-diagonal row
  matmul folding mean2x2 rows + the 2x rebin -> one 0/0.5 selection matmul
  folding the column rebin + valid-window crop -> ceil(x / step).

Boundary semantics match ops/filters.filter2d_mean2x2 exactly: cv2 anchors
the even kernel at (1,1) with BORDER_REFLECT_101, so row -1 == row 1 and
col -1 == col 1 *of the valid window* — NOT the circular wrap the padded
planes carry.  Fixed in-kernel with a lane select (left edge) and an
alternate first-block row matrix (top edge, grid row 0 only).

Mask normalization (DtcwtImg) and the decoder's ==0 -> 0.01 guard stay
outside on the tiny [B, 6, h3, w3] output (wm/dtcwt_codecs.py), preserving
the reference's operation order.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import dtcwt_coeffs as C
from .dtcwt_level1 import (MARGIN, QHALO, STRIP, RollCache, _col_conv,
                           _round_up, _row_dot_q, _wrap_pad, dot_exact,
                           kernel_eligible)

_TREES = ((0, 0), (0, 1), (1, 0), (1, 1))
MROWS = STRIP // 2 + 1  # 17: hp rows m = -1..15 (the -1 feeds mean2x2)


def masks_eligible(h: int, w: int) -> bool:
    """y_ll1 [.., 4, h, w] shapes the fused mask kernel accepts: the level-2
    grid (h/2, w/2) must be even (rebin_mean's odd-H zero-pad path is not
    fused) on top of the analysis kernels' own bounds."""
    return (kernel_eligible(h, w)
            and (h // 2) % 2 == 0 and (w // 2) % 2 == 0)


@lru_cache(maxsize=None)
def _consts_masks(wp: int, step: float, margin: int = MARGIN):
    filters = {
        0: (np.asarray(C.QSHIFT_H0A), np.asarray(C.QSHIFT_H1A)),
        1: (np.asarray(C.QSHIFT_H0B), np.asarray(C.QSHIFT_H1B)),
    }
    kq = STRIP + 2 * QHALO
    # row matrices with one extra leading row (m = -1): rsel[t][fi][i, col]
    # with i = m + 1, col = QHALO + 2m - k
    rsel = np.zeros((2, 2, MROWS, kq), np.float32)
    for t in range(2):
        for fi in range(2):
            f = filters[t][fi]
            for i in range(MROWS):
                m = i - 1
                for k, coef in enumerate(f):
                    rsel[t, fi, i, QHALO + 2 * m - k] += coef
    # block-diagonal over the 4 tree combos: block ci rows [lo(17); hi(17)]
    qrow = np.zeros((4 * 2 * MROWS, 4 * kq), np.float32)
    for ci, (rt, _ct) in enumerate(_TREES):
        r0 = ci * 2 * MROWS
        qrow[r0 : r0 + MROWS, ci * kq : (ci + 1) * kq] = rsel[rt, 0]
        qrow[r0 + MROWS : r0 + 2 * MROWS, ci * kq : (ci + 1) * kq] = rsel[rt, 1]

    # mean2x2-rows + 2x row-rebin folded: mask row r (of 8 per strip) =
    # 0.125*magc[m=2r-1] + 0.25*magc[2r] + 0.125*magc[2r+1], i = m + 1.
    mrow = np.zeros((STRIP // 4, MROWS), np.float32)
    for r in range(STRIP // 4):
        mrow[r, 2 * r] += 0.125
        mrow[r, 2 * r + 1] += 0.25
        mrow[r, 2 * r + 2] += 0.125
    # grid row 0 carries the valid window's top edge (padded hp row 8 =
    # valid row 0): reflect-101 makes its mask row (r = 4) exactly
    # 0.25*(magc[8] + magc[9]) (see module docstring), i = 9, 10
    mrow0 = mrow.copy()
    mrow0[4, :] = 0.0
    mrow0[4, 9] = 0.25
    mrow0[4, 10] = 0.25
    mrow6 = np.kron(np.eye(6, dtype=np.float32), mrow)      # [48, 102]
    mrow6_0 = np.kron(np.eye(6, dtype=np.float32), mrow0)

    # column selection: the level-2 column DECIMATION (phase 0: undecimated
    # lane 2j), the 2x column rebin (mean of decimated cols 2c, 2c+1) and
    # the valid-window crop (decimated col 0 = undecimated lane `margin`)
    # all fold into one 0/0.5 matmul over the undecimated conv lanes:
    #   mask col c = 0.5*(magc[margin + 4c] + magc[margin + 4c + 2])
    # (magc already carries the mean2x2 column pair-sum).  Output lanes
    # padded to a multiple of 128.
    wv2 = (wp - margin) // 4  # >= the true valid width; callers crop
    wout = _round_up(max(wv2, 1), 128)
    scol = np.zeros((wp, wout), np.float32)
    for c in range(wv2):
        if margin + 4 * c + 2 < wp:
            scol[margin + 4 * c, c] = 0.5
            scol[margin + 4 * c + 2, c] = 0.5
    return qrow, mrow6, mrow6_0, scol, filters, np.float32(step)


def _kernel_masks(static, x_hbm, qrow_ref, mrow_ref, mrow0_ref, scol_ref, o_ref):
    h_total, wp, step, fast, margin = static
    b = pl.program_id(0)
    j = pl.program_id(1)

    def body(scratch, sem):
        main = pl.multiple_of(j * STRIP, 8)
        top = pl.multiple_of(jax.lax.rem(j * STRIP - QHALO + h_total, h_total), 8)
        bot = pl.multiple_of(jax.lax.rem((j + 1) * STRIP, h_total), 8)
        c0 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(main, STRIP), :],
            scratch.at[:, pl.ds(QHALO, STRIP), :], sem.at[0])
        c1 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(top, QHALO), :],
            scratch.at[:, pl.ds(0, QHALO), :], sem.at[1])
        c2 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(bot, QHALO), :],
            scratch.at[:, pl.ds(QHALO + STRIP, QHALO), :], sem.at[2])
        c0.start(); c1.start(); c2.start()
        c0.wait(); c1.wait(); c2.wait()

        filters = _consts_masks(wp, step, margin)[4]
        kq = STRIP + 2 * QHALO
        xstack = scratch[:].reshape(4 * kq, scratch.shape[-1])
        lohi = _row_dot_q(qrow_ref, xstack, fast)  # [4*2*MROWS, wp]

        # 12 column convs (3 hp bands x 4 combos), 17 rows each
        hp = {}
        for ci, (rt, ct) in enumerate(_TREES):
            lo = lohi[ci * 2 * MROWS : ci * 2 * MROWS + MROWS]
            hi = lohi[ci * 2 * MROWS + MROWS : (ci + 1) * 2 * MROWS]
            h0c, h1c = filters[ct]
            rc = RollCache()
            hp[("lh", ci)] = _col_conv(lo, h1c, rc)
            hp[("hl", ci)] = _col_conv(hi, h0c, rc)
            hp[("hh", ci)] = _col_conv(hi, h1c, rc)

        # 6 subband magnitudes (band order [LH+, LH-, HL+, HL-, HH+, HH-]),
        # still on UNDECIMATED conv lanes: the decimation folds into the
        # final selection matmul, so the mean2x2 column neighbour (one
        # decimated col left) is an undecimated roll by 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (MROWS, lohi.shape[-1]), 1)
        left_edge = lane == margin
        mags = []
        for band in ("lh", "hl", "hh"):
            aa, ab, ba, bb = (hp[(band, ci)] for ci in range(4))
            for mag in (0.5 * jnp.sqrt((aa - bb) ** 2 + (ab + ba) ** 2),
                        0.5 * jnp.sqrt((aa + bb) ** 2 + (ab - ba) ** 2)):
                # column pair-sum: magc[j] = mag[j-1] + mag[j] in decimated
                # cols; the true left edge reflects (col -1 == col 1),
                # everything else is the circular neighbour the padding
                # already provides
                prev = jnp.where(left_edge,
                                 pltpu.roll(mag, mag.shape[-1] - 2, axis=1),
                                 pltpu.roll(mag, 2, axis=1))
                mags.append(prev + mag)
        magc = jnp.concatenate(mags, axis=0)  # [6*MROWS, wp]

        # the grid row holding the valid window's top edge (valid hp row 0 =
        # padded hp row margin/2, i.e. local row 8 of cell margin//32 —
        # margin % 32 == 16 keeps mrow0's local structure valid)
        mrow = jnp.where(j == margin // 32, mrow0_ref[:], mrow_ref[:])
        rows = dot_exact(mrow, magc, exact_side="left", fast=fast)  # [48, wp]
        dec = dot_exact(rows, scol_ref[:], exact_side="right", fast=fast)
        m = jnp.ceil(dec / step)  # [48, wout]
        nr = STRIP // 4
        for s in range(6):
            o_ref[0, s] = m[s * nr : (s + 1) * nr]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((4, STRIP + 2 * QHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@partial(jax.jit, static_argnames=("step", "interpret", "fast"))
def dtcwt_qshift_masks(ll4: jnp.ndarray, step: float = 5.0,
                       interpret: bool = False, fast: bool = False):
    """f32 [B, 4, h, w] tree lowpasses -> [B, 6, h3, w3] quantized masks
    ceil(rebin(mean2x2(|level-2 subbands|)) / step), h3 = h/4, w3 = w/4
    (reference: dtcwt_key_encoder.py:29-33 via ops/filters.py semantics)."""
    b, t, h0_, w0 = ll4.shape
    if t != 4 or not masks_eligible(h0_, w0):
        raise ValueError(f"needs 4 trees and a masks-eligible shape; got {ll4.shape}")
    h3v, w3v = h0_ // 4, w0 // 4
    ll4 = _wrap_pad(ll4, h0_, w0)
    _, _, h, w = ll4.shape
    qrow, mrow6, mrow6_0, scol, _, _ = _consts_masks(w, float(step))
    wout = scol.shape[1]
    out = pl.pallas_call(
        partial(_kernel_masks, (h, w, float(step), fast, MARGIN)),
        out_shape=jax.ShapeDtypeStruct((b, 6, h // 4, wout), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(qrow.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mrow6.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mrow6_0.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(scol.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 6, STRIP // 4, wout),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4, jnp.asarray(qrow), jnp.asarray(mrow6), jnp.asarray(mrow6_0),
      jnp.asarray(scol))
    # valid window: mask rows start at MARGIN/4 (= 4), cols at 0 of the
    # selection output (the crop was folded into scol)
    m4 = MARGIN // 4
    return out[..., m4 : m4 + h3v, :w3v]


@partial(jax.jit, static_argnames=("out_valid", "step", "interpret", "fast"))
def dtcwt_qshift_masks_chain(ll4_raw: jnp.ndarray, out_valid: tuple,
                             step: float = 5.0, interpret: bool = False,
                             fast: bool = False):
    """Chained-layout mask kernel: RAW [B, 4, h', w'] level-1 tree lowpasses
    straight off dtcwt_level1_ll_*_chain (margin CHAIN_MARGIN//2 = 48, no
    intermediate crop/pad copy) -> VALID [B, 6, h3, w3] quantized masks.
    Identical math to dtcwt_qshift_masks; only the pad geometry constants
    differ (see dtcwt_level1.py "Chained analysis")."""
    from .dtcwt_level1 import CHAIN_MARGIN

    margin = CHAIN_MARGIN // 2
    b, t, h, w = ll4_raw.shape
    qrow, mrow6, mrow6_0, scol, _, _ = _consts_masks(w, float(step), margin)
    wout = scol.shape[1]
    out = pl.pallas_call(
        partial(_kernel_masks, (h, w, float(step), fast, margin)),
        out_shape=jax.ShapeDtypeStruct((b, 6, h // 4, wout), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(qrow.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mrow6.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mrow6_0.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(scol.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 6, STRIP // 4, wout),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4_raw, jnp.asarray(qrow), jnp.asarray(mrow6), jnp.asarray(mrow6_0),
      jnp.asarray(scol))
    m4 = margin // 4
    return out[..., m4 : m4 + out_valid[0], : out_valid[1]]

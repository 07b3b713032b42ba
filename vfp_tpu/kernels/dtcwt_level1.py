"""Fused DT-CWT level-1 analysis kernel: one launch for all 4 trees.

The XLA formulation runs ~24 sequential conv ops for level 1 (4 tree
combinations x (2 row + 4 col) filter passes); this kernel does the whole
level per (batch, 32-row strip) grid cell:

  circular-halo DMA (8 rows top/bottom) -> row conv + row decimation, all
  four (filter x phase) passes stacked into one [64, 48] selection matmul
  -> column convs as lane ROLLS (circular for free) -> the 8 unique conv
  results sublane-stacked to [128, W] so the 2-periodic column-decimation
  matmuls run at full MXU row utilization -> 16 output planes
  (ll/lh/hl/hh x 4 tree combos).  Matmuls whose constant operand is
  bf16-exact (possibly after factoring sqrt(2)) run as exact 3-pass bf16
  splits instead of 6-pass HIGHEST (dot_exact).

The q2c combination stays outside (one elementwise XLA op).
Requires H % 32 == 0 and an even lane-chunk divisor of W (callers fall
back otherwise).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import dtcwt_coeffs as C

STRIP = 32  # rows per grid cell.  64 was measured perf-neutral and pushes
# the full q-shift analysis kernel's scoped VMEM marginally over the 16 MB
# limit in some fusion contexts (observed at [8,4,576,1024]) — keep 32
HALO = 8
MARGIN = 16  # circular top/left margin; covers L-1 = 13 for the q-shift pair


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _wrap_pad(x, h, w):
    """Circularly pad the trailing two axes so H % STRIP == 0 and
    W % 128 == 0 (Mosaic's HBM lane-slice alignment), with a MARGIN-row/col
    circular prefix.  Both filter stages only read indices 2m+phase-k
    (k < L <= 14), i.e. strictly to the 'left', so a left/top margin >= L-1
    of wrapped content makes every output in the valid window exact; the
    right/bottom fill is never read by valid outputs.  Returns padded x.
    No-op (beyond the margin) when already aligned."""
    hp = _round_up(h + MARGIN, STRIP)
    wp = _round_up(w + MARGIN, 128)
    pads = [(0, 0)] * (x.ndim - 2) + [(MARGIN, hp - h - MARGIN), (MARGIN, wp - w - MARGIN)]
    return jnp.pad(x, pads, mode="wrap")


def _valid(planes, h, w):
    """Slice the valid window out of padded kernel output planes."""
    m = MARGIN // 2
    return planes[..., m : m + h // 2, m : m + w // 2]


def kernel_eligible(h: int, w: int) -> bool:
    """Shapes the fused kernels accept.  Bounds come from jnp.pad(mode='wrap')
    needing each pad side <= the dim: height pads are (16, <=31) so h >= 32;
    width pads are (16, <=127 but <= 128 - w - 16 + 128...) — w >= 64 keeps
    the right fill (<= 48 at w=64) within bounds."""
    return (h % 2 == 0 and w % 2 == 0 and h >= 32 and w >= 64
            and _round_up(w + MARGIN, 128) - w - MARGIN <= w
            and _round_up(h + MARGIN, STRIP) - h - MARGIN <= h
            and pick_chunk2(_round_up(w + MARGIN, 128)) is not None)


def pick_chunk2(w: int, cap: int = 512) -> int | None:
    """Largest even divisor of w that is <= cap (2-periodic matrices)."""
    for g in range(1, w + 1):
        if w % g == 0 and (w // g) <= cap and (w // g) % 2 == 0:
            return w // g
    return None


@lru_cache(maxsize=None)
def _consts_l1(chunk: int):
    h0, h1 = np.asarray(C.LEGALL_H0), np.asarray(C.LEGALL_H1)
    # row conv+decimate: R[f][rt][m, HALO + 2m + rt - k] = f[k].  The four
    # (fi, rt) matrices are stacked along M so one [64, 48] matmul computes
    # all row passes at once (M-padding on the MXU is per-matmul).
    rsel = np.zeros((2, 2, STRIP // 2, STRIP + 2 * HALO), np.float32)
    for fi, f in enumerate((h0, h1)):
        for rt in range(2):
            for m in range(STRIP // 2):
                for k, coef in enumerate(f):
                    rsel[fi, rt, m, HALO + 2 * m + rt - k] += coef
    rsel_stacked, rsel_scale = exact_or_scaled(
        rsel.reshape(4 * (STRIP // 2), STRIP + 2 * HALO))
    assert rsel_scale is not None  # LeGall / sqrt(2) is dyadic
    # column decimation: S2[ct][j, n] = 1 iff j == 2n + ct (2-periodic)
    s2 = np.zeros((2, chunk, chunk // 2), np.float32)
    for ct in range(2):
        for n in range(chunk // 2):
            s2[ct, 2 * n + ct, n] = 1.0
    return rsel_stacked, s2, h0, h1, rsel_scale


class RollCache:
    """Share pltpu.roll results across the filters that consume the same
    source array (e.g. h0c and h1c both roll `lo` by the same shifts)."""

    def __init__(self):
        self._cache = {}
        self._convs = {}

    def get(self, x, k):
        if k == 0:
            return x
        key = (id(x), k)
        if key not in self._cache:
            self._cache[key] = pltpu.roll(x, k, axis=1)
        return self._cache[key]

    def conv(self, x, f):
        key = (id(x), id(f))
        if key not in self._convs:
            acc = None
            for k, coef in enumerate(f):
                term = self.get(x, k) * float(coef)
                acc = term if acc is None else acc + term
            self._convs[key] = acc
        return self._convs[key]


def _col_conv(x, f, rc: RollCache | None = None):
    """Circular column convolution via lane rolls: y[n] = sum f[k] x[n-k].
    With a RollCache, both the rolls and whole conv results are shared."""
    if rc is not None:
        return rc.conv(x, f)
    acc = None
    for k, coef in enumerate(f):
        term = (pltpu.roll(x, k, axis=1) if k else x) * float(coef)
        acc = term if acc is None else acc + term
    return acc


def _mat_bf16_exact(mat) -> bool:
    """True when every entry of a constant matrix is bf16-representable
    (0/1 selection matrices, dyadic-rational filter tables...)."""
    import ml_dtypes

    m = np.asarray(mat, np.float32)
    return bool(np.array_equal(m.astype(ml_dtypes.bfloat16).astype(np.float32), m))


_SQRT2 = np.float32(np.sqrt(2.0))


def exact_or_scaled(mat):
    """(scaled_matrix, post_scale) such that scaled_matrix is bf16-exact and
    scaled_matrix * post_scale reproduces ``mat`` bit-for-bit in f32 — the
    sqrt(2)-normalized LeGall tables are dyadic once the sqrt(2) is factored
    out.  Returns (mat, None) when no exact factoring exists (q-shift)."""
    m = np.asarray(mat, np.float32)
    if _mat_bf16_exact(m):
        return m, np.float32(1.0)
    cand = (m / _SQRT2).astype(np.float32)
    if _mat_bf16_exact(cand) and np.array_equal(
        (cand * _SQRT2).astype(np.float32), m
    ):
        return cand, _SQRT2
    return m, None


def _split3(x):
    """f32 -> three bf16 terms summing (in f32) to x to full f32 precision."""
    x0 = x.astype(jnp.bfloat16)
    r1 = x - x0.astype(jnp.float32)
    x1 = r1.astype(jnp.bfloat16)
    x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2


def dot_exact(a, b, *, exact_side: str, fast: bool = False):
    """MXU matmul, full f32 accuracy in 3 passes instead of HIGHEST's 6.

    Mosaic cannot lower precision=HIGH inside kernels, and DEFAULT rounds
    f32 operands to one bf16 pass.  When ONE operand is bf16-exact (a
    constant selection/filter matrix), splitting only the OTHER operand
    into three bf16 terms makes sum(term_i @ B) exact to f32 working
    precision: B carries no rounding, and the three splits of A cover 24+
    mantissa bits.  ``exact_side`` names the bf16-exact operand.

    ``fast=True`` drops to ONE bf16 pass (data rounded to 8 mantissa bits,
    ~0.2% relative on pixel-range values) — 3x fewer MXU passes and no
    split subtract/cast chain.  Correct only for consumers that tolerate
    bf16 noise (the DT-CWT codecs decode by thresholded correlation)."""
    if fast:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    if exact_side == "left":
        c = a.astype(jnp.bfloat16)
        parts = _split3(b)
        return sum(jnp.dot(c, p, preferred_element_type=jnp.float32) for p in parts)
    c = b.astype(jnp.bfloat16)
    parts = _split3(a)
    return sum(jnp.dot(p, c, preferred_element_type=jnp.float32) for p in parts)


def _decimate(x, s2_ref, ct, chunk, fast: bool = False):
    """Lane decimation via 2-periodic selection matmul.  x may be a sublane
    STACK of many 16-row planes — feeding the MXU 128 rows at a time is 8x
    fewer passes than per-plane [16, chunk] matmuls."""
    w = x.shape[-1]
    n = w // chunk
    segs = [
        dot_exact(x[:, l * chunk : (l + 1) * chunk], s2_ref[ct],
                  exact_side="right", fast=fast)
        for l in range(n)
    ]
    return segs[0] if n == 1 else jnp.concatenate(segs, axis=1)


def _kernel(static, x_hbm, rsel_ref, s2_ref, o_ref):
    h_total, chunk, fast = static
    j = pl.program_id(1)
    b = pl.program_id(0)

    def body(scratch, sem):
        main = pl.multiple_of(j * STRIP, 8)
        top = pl.multiple_of(jax.lax.rem(j * STRIP - HALO + h_total, h_total), 8)
        bot = pl.multiple_of(jax.lax.rem((j + 1) * STRIP, h_total), 8)
        c0 = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(main, STRIP), :], scratch.at[pl.ds(HALO, STRIP), :], sem.at[0])
        c1 = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(top, HALO), :], scratch.at[pl.ds(0, HALO), :], sem.at[1])
        c2 = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(bot, HALO), :], scratch.at[pl.ds(HALO + STRIP, HALO), :],
            sem.at[2])
        c0.start(); c1.start(); c2.start()
        c0.wait(); c1.wait(); c2.wait()

        x = scratch[:]  # [STRIP + 2*HALO, W]
        # row stage: one [64, 48] @ [48, W] matmul covers all four
        # (filter lo/hi) x (phase rt) passes; the ref holds the matrix with
        # its sqrt(2) factored out (dyadic -> bf16-exact), restored after
        rows_all = dot_exact(rsel_ref[:], x, exact_side="left", fast=fast)
        rows_all = rows_all * _consts_l1(chunk)[4]
        m = STRIP // 2
        rows = {(fi, rt): rows_all[(2 * fi + rt) * m : (2 * fi + rt + 1) * m]
                for fi in range(2) for rt in range(2)}
        # col stage: the 8 unique (band, rt) convolutions (shared across the
        # two ct phases), stacked on the sublane axis into one [128, W] array
        # so both decimation matmuls run with full MXU row utilization.
        # Output plane order: [ll x 4 combos, lh x 4, hl x 4, hh x 4],
        # combos (rt, ct) row-major -> plane = band * 4 + rt * 2 + ct.
        h0, h1 = _consts_l1(chunk)[2], _consts_l1(chunk)[3]
        rc = RollCache()
        convs = []  # block i = 2 * band + rt
        for band, (row_f, col_f) in enumerate(
            [(0, h0), (0, h1), (1, h0), (1, h1)]  # ll, lh, hl, hh
        ):
            for rt in range(2):
                convs.append(_col_conv(rows[(row_f, rt)], col_f, rc))
        stacked = jnp.concatenate(convs, axis=0)  # [8m, W]
        for ct in range(2):
            dec = _decimate(stacked, s2_ref, ct, chunk, fast)
            for band in range(4):
                for rt in range(2):
                    i = 2 * band + rt
                    o_ref[0, band * 4 + rt * 2 + ct] = dec[i * m : (i + 1) * m]

    pl.run_scoped(body, scratch=pltpu.VMEM((STRIP + 2 * HALO, x_hbm.shape[-1]), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((3,)))


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_level1_analysis(x: jnp.ndarray, interpret: bool = False,
                          fast: bool = False):
    """f32 [B, H, W] (H, W even, see kernel_eligible) -> [B, 16, H/2, W/2]:
    planes [ll*4, lh*4, hl*4, hh*4], tree combos (rt, ct) row-major within
    each band."""
    b, h0_, w0 = x.shape
    if not kernel_eligible(h0_, w0):
        raise ValueError(f"shape {x.shape} not kernel-eligible")
    x = _wrap_pad(x, h0_, w0)
    _, h, w = x.shape
    chunk = pick_chunk2(w)
    rsel, s2, _, _, _ = _consts_l1(chunk)
    out = pl.pallas_call(
        partial(_kernel, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 16, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2 * STRIP, STRIP + 2 * HALO), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(rsel), jnp.asarray(s2))
    return _valid(out, h0_, w0)


def _kernel_ll(static, x_hbm, rsel_ref, s2_ref, o_ref):
    """Lowpass-only level 1: the mask channel (Y) only ever consumes its
    lowpass chain, so skipping the 12 subband planes cuts the kernel's
    HBM write traffic 4x and drops 6 of the 8 column convolutions."""
    h_total, chunk, fast = static
    j = pl.program_id(1)
    b = pl.program_id(0)

    def body(scratch, sem):
        main = pl.multiple_of(j * STRIP, 8)
        top = pl.multiple_of(jax.lax.rem(j * STRIP - HALO + h_total, h_total), 8)
        bot = pl.multiple_of(jax.lax.rem((j + 1) * STRIP, h_total), 8)
        c0 = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(main, STRIP), :], scratch.at[pl.ds(HALO, STRIP), :], sem.at[0])
        c1 = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(top, HALO), :], scratch.at[pl.ds(0, HALO), :], sem.at[1])
        c2 = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(bot, HALO), :], scratch.at[pl.ds(HALO + STRIP, HALO), :],
            sem.at[2])
        c0.start(); c1.start(); c2.start()
        c0.wait(); c1.wait(); c2.wait()

        x = scratch[:]
        rows_all = dot_exact(rsel_ref[:], x, exact_side="left", fast=fast)
        rows_all = rows_all * _consts_l1(chunk)[4]
        m = STRIP // 2
        h0 = _consts_l1(chunk)[2]
        rc = RollCache()
        convs = [_col_conv(rows_all[rt * m : (rt + 1) * m], h0, rc)
                 for rt in range(2)]  # (fi=0, rt) blocks of rows_all
        stacked = jnp.concatenate(convs, axis=0)  # [2m, W]
        for ct in range(2):
            dec = _decimate(stacked, s2_ref, ct, chunk, fast)
            for rt in range(2):
                o_ref[0, rt * 2 + ct] = dec[rt * m : (rt + 1) * m]

    pl.run_scoped(body, scratch=pltpu.VMEM((STRIP + 2 * HALO, x_hbm.shape[-1]), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((3,)))


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_level1_analysis_ll(x: jnp.ndarray, interpret: bool = False,
                             fast: bool = False):
    """f32 [B, H, W] -> [B, 4, H/2, W/2]: just the 4 tree lowpasses
    (combos (rt, ct) row-major)."""
    b, h0_, w0 = x.shape
    if not kernel_eligible(h0_, w0):
        raise ValueError(f"shape {x.shape} not kernel-eligible")
    x = _wrap_pad(x, h0_, w0)
    _, h, w = x.shape
    chunk = pick_chunk2(w)
    rsel, s2, _, _, _ = _consts_l1(chunk)
    out = pl.pallas_call(
        partial(_kernel_ll, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 4, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2 * STRIP, STRIP + 2 * HALO), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(rsel), jnp.asarray(s2))
    return _valid(out, h0_, w0)


def _kernel_ll_color(static, x_hbm, rsel_ref, s2_ref, o_ref):
    """Color-fused lowpass-only level 1: u8 BGR planes in, Y and U tree
    lowpasses out.  Fusing the channel lincombs into the analysis kernel
    skips materializing two full-resolution f32 planes between the XLA
    color pass and the transform (the decode path's only use of them)."""
    h_total, chunk, fast = static
    j = pl.program_id(1)
    b = pl.program_id(0)

    from ..ops.color import M_FWD, OFF_FWD

    def body(scratch, sem):
        main = pl.multiple_of(j * STRIP, 8)
        top = pl.multiple_of(jax.lax.rem(j * STRIP - HALO + h_total, h_total), 8)
        bot = pl.multiple_of(jax.lax.rem((j + 1) * STRIP, h_total), 8)
        c0 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(main, STRIP), :], scratch.at[:, pl.ds(HALO, STRIP), :],
            sem.at[0])
        c1 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(top, HALO), :], scratch.at[:, pl.ds(0, HALO), :],
            sem.at[1])
        c2 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(bot, HALO), :], scratch.at[:, pl.ds(HALO + STRIP, HALO), :],
            sem.at[2])
        c0.start(); c1.start(); c2.start()
        c0.wait(); c1.wait(); c2.wait()

        x = scratch[:].astype(jnp.int32).astype(jnp.float32)  # [3, S+2H, W]
        m = STRIP // 2
        h0 = _consts_l1(chunk)[2]
        for ch in range(2):  # 0 = Y, 1 = U
            plane = (M_FWD[ch, 0] * x[0] + M_FWD[ch, 1] * x[1]
                     + M_FWD[ch, 2] * x[2] + OFF_FWD[ch])
            rows_all = dot_exact(rsel_ref[:], plane, exact_side="left", fast=fast)
            rows_all = rows_all * _consts_l1(chunk)[4]
            rc = RollCache()
            convs = [_col_conv(rows_all[rt * m : (rt + 1) * m], h0, rc)
                     for rt in range(2)]
            stacked = jnp.concatenate(convs, axis=0)
            for ct in range(2):
                dec = _decimate(stacked, s2_ref, ct, chunk, fast)
                for rt in range(2):
                    o_ref[0, ch, rt * 2 + ct] = dec[rt * m : (rt + 1) * m]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((3, STRIP + 2 * HALO, x_hbm.shape[-1]), jnp.uint8),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_level1_analysis_ll_color(frames: jnp.ndarray, interpret: bool = False,
                                   fast: bool = False):
    """u8 frames [B, H, W, 3] -> [B, 2, 4, H/2, W/2]: the 4 tree lowpasses
    of the Y (ch 0) and U (ch 1) channels, color lincomb fused in-kernel."""
    b, h0_, w0, _ = frames.shape
    if not kernel_eligible(h0_, w0):
        raise ValueError(f"shape {frames.shape} not kernel-eligible")
    planes = jnp.moveaxis(frames, -1, 1)  # [B, 3, H, W] u8
    planes = _wrap_pad(planes, h0_, w0)
    h, w = planes.shape[-2:]
    chunk = pick_chunk2(w)
    rsel, s2, _, _, _ = _consts_l1(chunk)
    out = pl.pallas_call(
        partial(_kernel_ll_color, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 2, 4, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2 * STRIP, STRIP + 2 * HALO), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 4, STRIP // 2, w // 2), lambda i, j: (i, 0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, jnp.asarray(rsel), jnp.asarray(s2))
    return _valid(out, h0_, w0)


def _kernel_ll_color_y(static, x_hbm, rsel_ref, s2_ref, o_ref):
    """Y-only color-fused lowpass-only level 1 (see _kernel_ll_color): the
    EMBED path analyzes only the Y channel (masks); the U delta is added
    back in pixel space by linearity, so U is never transformed at all."""
    h_total, chunk, fast = static
    j = pl.program_id(1)
    b = pl.program_id(0)

    from ..ops.color import M_FWD, OFF_FWD

    def body(scratch, sem):
        main = pl.multiple_of(j * STRIP, 8)
        top = pl.multiple_of(jax.lax.rem(j * STRIP - HALO + h_total, h_total), 8)
        bot = pl.multiple_of(jax.lax.rem((j + 1) * STRIP, h_total), 8)
        c0 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(main, STRIP), :], scratch.at[:, pl.ds(HALO, STRIP), :],
            sem.at[0])
        c1 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(top, HALO), :], scratch.at[:, pl.ds(0, HALO), :],
            sem.at[1])
        c2 = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(bot, HALO), :], scratch.at[:, pl.ds(HALO + STRIP, HALO), :],
            sem.at[2])
        c0.start(); c1.start(); c2.start()
        c0.wait(); c1.wait(); c2.wait()

        x = scratch[:].astype(jnp.int32).astype(jnp.float32)  # [3, S+2H, W]
        m = STRIP // 2
        h0 = _consts_l1(chunk)[2]
        plane = (M_FWD[0, 0] * x[0] + M_FWD[0, 1] * x[1]
                 + M_FWD[0, 2] * x[2] + OFF_FWD[0])
        rows_all = dot_exact(rsel_ref[:], plane, exact_side="left", fast=fast)
        rows_all = rows_all * _consts_l1(chunk)[4]
        rc = RollCache()
        convs = [_col_conv(rows_all[rt * m : (rt + 1) * m], h0, rc)
                 for rt in range(2)]
        stacked = jnp.concatenate(convs, axis=0)
        for ct in range(2):
            dec = _decimate(stacked, s2_ref, ct, chunk, fast)
            for rt in range(2):
                o_ref[0, rt * 2 + ct] = dec[rt * m : (rt + 1) * m]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((3, STRIP + 2 * HALO, x_hbm.shape[-1]), jnp.uint8),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_level1_analysis_ll_y(frames: jnp.ndarray, interpret: bool = False,
                               fast: bool = False):
    """u8 frames [B, H, W, 3] -> [B, 4, H/2, W/2]: the 4 tree lowpasses of
    the Y channel only, color lincomb fused in-kernel (embed mask path)."""
    b, h0_, w0, _ = frames.shape
    if not kernel_eligible(h0_, w0):
        raise ValueError(f"shape {frames.shape} not kernel-eligible")
    planes = jnp.moveaxis(frames, -1, 1)  # [B, 3, H, W] u8
    planes = _wrap_pad(planes, h0_, w0)
    h, w = planes.shape[-2:]
    chunk = pick_chunk2(w)
    rsel, s2, _, _, _ = _consts_l1(chunk)
    out = pl.pallas_call(
        partial(_kernel_ll_color_y, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 4, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2 * STRIP, STRIP + 2 * HALO), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, jnp.asarray(rsel), jnp.asarray(s2))
    return _valid(out, h0_, w0)


# ---------------------------------------------------------------------------
# Levels >= 2: same machinery with per-tree q-shift filters.  Input is the
# 4 tree lowpasses [B, 4, h, w]; each tree's row filters fold into its own
# [16, 48] selection matrices, column filters run as rolls per tree.
# ---------------------------------------------------------------------------

QHALO = 16  # covers the 14-tap q-shift filters (8-aligned)


@lru_cache(maxsize=None)
def _consts_q(chunk: int):
    filters = {
        0: (np.asarray(C.QSHIFT_H0A), np.asarray(C.QSHIFT_H1A)),  # tree a
        1: (np.asarray(C.QSHIFT_H0B), np.asarray(C.QSHIFT_H1B)),  # tree b
    }
    # rsel[tree][fi][m, QHALO + 2m - k] = f[k]  (phase 0)
    rsel = np.zeros((2, 2, STRIP // 2, STRIP + 2 * QHALO), np.float32)
    for t in range(2):
        for fi in range(2):
            f = filters[t][fi]
            for m in range(STRIP // 2):
                for k, coef in enumerate(f):
                    rsel[t, fi, m, QHALO + 2 * m - k] += coef
    # Block-diagonal row matrix: one [128, 256] matmul against the four tree
    # combos' scratch stacked [256, W] runs every row pass of the level at
    # full MXU utilization.  Block ci covers combo (rt, ct) = _TREES[ci]
    # with its row tree rt: rows [32ci, 32ci+16) = lowpass, +16.. = highpass.
    kq = STRIP + 2 * QHALO
    qrow = np.zeros((4 * STRIP, 4 * kq), np.float32)
    for ci, (rt, _ct) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        qrow[ci * STRIP : ci * STRIP + STRIP // 2, ci * kq : (ci + 1) * kq] = rsel[rt, 0]
        qrow[ci * STRIP + STRIP // 2 : (ci + 1) * STRIP, ci * kq : (ci + 1) * kq] = rsel[rt, 1]
    s2 = np.zeros((2, chunk, chunk // 2), np.float32)
    for ct in range(2):
        for n in range(chunk // 2):
            s2[ct, 2 * n + ct, n] = 1.0
    return qrow, s2, filters


def _row_dot_q(rsel_ref, xstack, fast: bool):
    """Q-shift row matmul: coefficients are NOT bf16-exact, so the exact
    path needs HIGHEST (6 passes); fast mode is one bf16 pass (filter
    rounding ~2^-9 relative — below the codecs' quantized-mask noise)."""
    if fast:
        return jnp.dot(rsel_ref[:].astype(jnp.bfloat16),
                       xstack.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(rsel_ref[:], xstack, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _kernel_q(static, x_hbm, rsel_ref, s2_ref, o_ref):
    h_total, chunk, fast = static
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

        filters = _consts_q(chunk)[2]
        kq = STRIP + 2 * QHALO
        m = STRIP // 2
        # one block-diagonal [128, 256] row matmul for all 4 tree combos
        # (q-shift coefficients are not bf16-exact: HIGHEST, or 1 fast pass)
        xstack = scratch[:].reshape(4 * kq, scratch.shape[-1])
        lohi = _row_dot_q(rsel_ref, xstack, fast)
        # combos in _TREES order; plane layout matches level 1:
        # [ll x 4 combos, lh x 4, hl x 4, hh x 4].  All 16 column convs are
        # stacked on sublanes so the single phase-0 decimation runs as
        # [256, chunk] @ [chunk, chunk/2] matmuls (2 full M-tiles).
        convs = [None] * 16
        for ci, (rt, ct) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            lo = lohi[ci * STRIP : ci * STRIP + m]
            hi = lohi[ci * STRIP + m : (ci + 1) * STRIP]
            h0c, h1c = filters[ct]
            rc = RollCache()
            for band, (rows_, col_f) in enumerate(
                [(lo, h0c), (lo, h1c), (hi, h0c), (hi, h1c)]
            ):
                convs[band * 4 + ci] = _col_conv(rows_, col_f, rc)
        dec = _decimate(jnp.concatenate(convs, axis=0), s2_ref, 0, chunk, fast)
        for p in range(16):
            o_ref[0, p] = dec[p * m : (p + 1) * m]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((4, STRIP + 2 * QHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


def _kernel_q_ll(static, x_hbm, rsel_ref, s2_ref, o_ref):
    """Lowpass-only q-shift level (see _kernel_ll): 4 output planes."""
    h_total, chunk, fast = static
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

        filters = _consts_q(chunk)[2]
        kq = STRIP + 2 * QHALO
        m = STRIP // 2
        xstack = scratch[:].reshape(4 * kq, scratch.shape[-1])
        lohi = _row_dot_q(rsel_ref, xstack, fast)
        convs = []
        for ci, (rt, ct) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            lo = lohi[ci * STRIP : ci * STRIP + m]
            convs.append(_col_conv(lo, filters[ct][0]))
        dec = _decimate(jnp.concatenate(convs, axis=0), s2_ref, 0, chunk, fast)
        for ci in range(4):
            o_ref[0, ci] = dec[ci * m : (ci + 1) * m]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((4, STRIP + 2 * QHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_qshift_analysis_ll(ll4: jnp.ndarray, interpret: bool = False,
                             fast: bool = False):
    """f32 [B, 4, h, w] tree lowpasses -> [B, 4, h/2, w/2] next-level
    lowpasses only."""
    b, t, h0_, w0 = ll4.shape
    if t != 4 or not kernel_eligible(h0_, w0):
        raise ValueError(f"needs 4 trees and a kernel-eligible shape; got {ll4.shape}")
    ll4 = _wrap_pad(ll4, h0_, w0)
    _, _, h, w = ll4.shape
    chunk = pick_chunk2(w)
    rsel, s2, _ = _consts_q(chunk)
    out = pl.pallas_call(
        partial(_kernel_q_ll, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 4, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4 * STRIP, 4 * (STRIP + 2 * QHALO)), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4, jnp.asarray(rsel), jnp.asarray(s2))
    return _valid(out, h0_, w0)


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_qshift_analysis(ll4: jnp.ndarray, interpret: bool = False,
                          fast: bool = False):
    """f32 [B, 4, h, w] tree lowpasses (combo order (rt,ct) row-major) ->
    [B, 16, h/2, w/2] planes [ll*4, lh*4, hl*4, hh*4] (q-shift level)."""
    b, t, h0_, w0 = ll4.shape
    if t != 4 or not kernel_eligible(h0_, w0):
        raise ValueError(f"needs 4 trees and a kernel-eligible shape; got {ll4.shape}")
    ll4 = _wrap_pad(ll4, h0_, w0)
    _, _, h, w = ll4.shape
    chunk = pick_chunk2(w)
    rsel, s2, _ = _consts_q(chunk)
    out = pl.pallas_call(
        partial(_kernel_q, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 16, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4 * STRIP, 4 * (STRIP + 2 * QHALO)), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4, jnp.asarray(rsel), jnp.asarray(s2))
    return _valid(out, h0_, w0)


def _kernel_q_hp(static, x_hbm, rsel_ref, s2_ref, o_ref):
    """Highpass-only q-shift level: 12 output planes [lh*4, hl*4, hh*4].
    The codecs' MASK path (q2c magnitudes of the Y level-2 subbands) never
    reads the ll band — skipping it drops 4 of 16 column convs, a quarter
    of the decimation matmul rows, and a quarter of the HBM writes."""
    h_total, chunk, fast = static
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

        filters = _consts_q(chunk)[2]
        kq = STRIP + 2 * QHALO
        m = STRIP // 2
        xstack = scratch[:].reshape(4 * kq, scratch.shape[-1])
        lohi = _row_dot_q(rsel_ref, xstack, fast)
        # bands [lh, hl, hh] only: (lo, h1c), (hi, h0c), (hi, h1c)
        convs = [None] * 12
        for ci, (rt, ct) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            lo = lohi[ci * STRIP : ci * STRIP + m]
            hi = lohi[ci * STRIP + m : (ci + 1) * STRIP]
            h0c, h1c = filters[ct]
            rc = RollCache()
            for band, (rows_, col_f) in enumerate(
                [(lo, h1c), (hi, h0c), (hi, h1c)]
            ):
                convs[band * 4 + ci] = _col_conv(rows_, col_f, rc)
        dec = _decimate(jnp.concatenate(convs, axis=0), s2_ref, 0, chunk, fast)
        for p in range(12):
            o_ref[0, p] = dec[p * m : (p + 1) * m]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((4, STRIP + 2 * QHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_qshift_analysis_hp(ll4: jnp.ndarray, interpret: bool = False,
                             fast: bool = False):
    """f32 [B, 4, h, w] tree lowpasses -> [B, 12, h/2, w/2] highpass planes
    [lh*4, hl*4, hh*4] (no ll band — the codec mask/coefficient paths)."""
    b, t, h0_, w0 = ll4.shape
    if t != 4 or not kernel_eligible(h0_, w0):
        raise ValueError(f"needs 4 trees and a kernel-eligible shape; got {ll4.shape}")
    ll4 = _wrap_pad(ll4, h0_, w0)
    _, _, h, w = ll4.shape
    chunk = pick_chunk2(w)
    rsel, s2, _ = _consts_q(chunk)
    out = pl.pallas_call(
        partial(_kernel_q_hp, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 12, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4 * STRIP, 4 * (STRIP + 2 * QHALO)), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 12, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4, jnp.asarray(rsel), jnp.asarray(s2))
    return _valid(out, h0_, w0)


# ---------------------------------------------------------------------------
# Chained analysis: pad ONCE at level 1 with a wide circular margin, then let
# each level consume the previous kernel's RAW (uncropped) output directly.
#
# Why this is exact: jnp.pad(mode='wrap') is fully circular — padded index x
# holds valid index (x - M) mod n on BOTH sides.  Every filter stage reads
# strictly to the left/top (2m + phase - k, k < L), so a kernel fed a fully
# circular padded input produces, at EVERY raw output position u >= g, the
# true circular result at valid position (u - M/2) mod (n/2).  Only a small
# fringe u < g is garbage (reads that fell off the physical buffer and
# wrapped to non-adjacent content): g = ceil((g_in + L - 1) / 2) per level,
# starting from g = 2 after LeGall (L=5) and g = 8 after one q-shift (L=14).
# A consumer with input margin m keeps all VALID outputs exact iff its valid
# reads stay inside the correct region: m - (L-1) >= g_in.  With one pad of
# CHAIN_MARGIN = 96 at level 1:
#
#   ll1 raw:  margin 48, garbage < 2   (qshift needs 48-13 >= 2   OK)
#   ll2 raw:  margin 24, garbage < 8   (qshift needs 24-13 >= 8   OK)
#   hp3 raw:  margin 12, garbage < 11  (valid window starts at 12 OK)
#
# so the level-2 and level-3 analyses and the fused mask kernel all run with
# ZERO intermediate crop/pad copies — the r5 stage profile measured those
# copies at ~40% of the extract chain's wall (docs/DESIGN.md "DT-CWT extract
# stage budget").  Valid outputs are BITWISE identical to the unchained
# path: the row/col matmuls see identical operand values and identical
# contraction sizes, and the decimation matrices are one-hot.
#
# Height rounds to 128 so every downstream grid divides (hp1/2 and hp1/4
# both multiples of STRIP); width rounds to 512 so every downstream lane
# count is a multiple of 128 (Mosaic HBM lane alignment).
# ---------------------------------------------------------------------------

CHAIN_MARGIN = 96


def chain_eligible(h: int, w: int) -> bool:
    """Frame shapes the single-pad chained path accepts.  h, w % 8 == 0
    keeps every level's valid dims exactly halved (no _pad_even crops);
    the pad bounds mirror kernel_eligible's (each wrap side <= the dim)."""
    if h % 8 or w % 8:
        return False
    hp = _round_up(h + CHAIN_MARGIN, 128)
    wp = _round_up(w + CHAIN_MARGIN, 512)
    return (h >= CHAIN_MARGIN and w >= CHAIN_MARGIN
            and hp - h - CHAIN_MARGIN <= h and wp - w - CHAIN_MARGIN <= w
            and pick_chunk2(wp) is not None
            and pick_chunk2(wp // 2) is not None
            and pick_chunk2(wp // 4) is not None)


def _chain_pad(x, h, w):
    """Level-1 wrap pad with the chain margin (see module note above)."""
    hp = _round_up(h + CHAIN_MARGIN, 128)
    wp = _round_up(w + CHAIN_MARGIN, 512)
    pads = [(0, 0)] * (x.ndim - 2) + [
        (CHAIN_MARGIN, hp - h - CHAIN_MARGIN),
        (CHAIN_MARGIN, wp - w - CHAIN_MARGIN),
    ]
    return jnp.pad(x, pads, mode="wrap")


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_level1_ll_color_chain(frames: jnp.ndarray, interpret: bool = False,
                                fast: bool = False):
    """u8 frames [B, H, W, 3] -> RAW [B, 2, 4, H', W'] Y/U tree lowpasses in
    chained padded layout (valid at offset CHAIN_MARGIN//2, fully circular
    content at rows/lanes >= 2).  Callers must gate on chain_eligible."""
    b, h0_, w0, _ = frames.shape
    planes = jnp.moveaxis(frames, -1, 1)  # [B, 3, H, W] u8
    planes = _chain_pad(planes, h0_, w0)
    h, w = planes.shape[-2:]
    chunk = pick_chunk2(w)
    rsel, s2, _, _, _ = _consts_l1(chunk)
    return pl.pallas_call(
        partial(_kernel_ll_color, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 2, 4, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2 * STRIP, STRIP + 2 * HALO), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 4, STRIP // 2, w // 2),
                               lambda i, j: (i, 0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, jnp.asarray(rsel), jnp.asarray(s2))


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_level1_ll_y_chain(frames: jnp.ndarray, interpret: bool = False,
                            fast: bool = False):
    """u8 frames [B, H, W, 3] -> RAW [B, 4, H', W'] Y tree lowpasses in
    chained padded layout (embed mask path)."""
    b, h0_, w0, _ = frames.shape
    planes = jnp.moveaxis(frames, -1, 1)
    planes = _chain_pad(planes, h0_, w0)
    h, w = planes.shape[-2:]
    chunk = pick_chunk2(w)
    rsel, s2, _, _, _ = _consts_l1(chunk)
    return pl.pallas_call(
        partial(_kernel_ll_color_y, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 4, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2 * STRIP, STRIP + 2 * HALO), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, STRIP // 2, w // 2),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, jnp.asarray(rsel), jnp.asarray(s2))


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_qshift_ll_chain(ll4_raw: jnp.ndarray, interpret: bool = False,
                          fast: bool = False):
    """RAW chained [B, 4, h', w'] tree lowpasses (margin 48) -> RAW
    [B, 4, h'/2, w'/2] next-level lowpasses (margin 24).  No pad, no crop."""
    b, t, h, w = ll4_raw.shape
    chunk = pick_chunk2(w)
    rsel, s2, _ = _consts_q(chunk)
    return pl.pallas_call(
        partial(_kernel_q_ll, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 4, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4 * STRIP, 4 * (STRIP + 2 * QHALO)), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4_raw, jnp.asarray(rsel), jnp.asarray(s2))


@partial(jax.jit, static_argnames=("out_valid", "interpret", "fast"))
def dtcwt_qshift_hp_chain(ll4_raw: jnp.ndarray, out_valid: tuple,
                          interpret: bool = False, fast: bool = False):
    """RAW chained [B, 4, h', w'] level-2 lowpasses (margin 24) -> VALID
    [B, 12, h3, w3] level-3 highpass planes (the chain's terminal crop at
    offset 12 = CHAIN_MARGIN//8)."""
    b, t, h, w = ll4_raw.shape
    chunk = pick_chunk2(w)
    rsel, s2, _ = _consts_q(chunk)
    out = pl.pallas_call(
        partial(_kernel_q_hp, (h, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 12, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4 * STRIP, 4 * (STRIP + 2 * QHALO)), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 12, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4_raw, jnp.asarray(rsel), jnp.asarray(s2))
    m = CHAIN_MARGIN // 8
    return out[..., m : m + out_valid[0], m : m + out_valid[1]]

"""Fused DT-CWT level-1 analysis kernel: one launch for all 4 trees.

The XLA formulation runs ~24 sequential conv ops for level 1 (4 tree
combinations x (2 row + 4 col) filter passes); this kernel does the whole
level per (batch, 32-row strip) grid cell:

  circular-halo DMA (8 rows top/bottom) -> row conv + row decimation folded
  into tiny [16, 48] selection matmuls (both LeGall filters x both sampling
  phases) -> column convs as lane ROLLS (circular for free) -> column
  decimation via 2-periodic selection matmuls -> 16 output planes
  (ll/lh/hl/hh x 4 tree combos).

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

STRIP = 32
HALO = 8
def pick_chunk2(w: int, cap: int = 512) -> int | None:
    """Largest even divisor of w that is <= cap (2-periodic matrices)."""
    for g in range(1, w + 1):
        if w % g == 0 and (w // g) <= cap and (w // g) % 2 == 0:
            return w // g
    return None


@lru_cache(maxsize=None)
def _consts_l1(chunk: int):
    h0, h1 = np.asarray(C.LEGALL_H0), np.asarray(C.LEGALL_H1)
    # row conv+decimate: R[f][rt][m, HALO + 2m + rt - k] = f[k]
    rsel = np.zeros((2, 2, STRIP // 2, STRIP + 2 * HALO), np.float32)
    for fi, f in enumerate((h0, h1)):
        for rt in range(2):
            for m in range(STRIP // 2):
                for k, coef in enumerate(f):
                    rsel[fi, rt, m, HALO + 2 * m + rt - k] += coef
    # column decimation: S2[ct][j, n] = 1 iff j == 2n + ct (2-periodic)
    s2 = np.zeros((2, chunk, chunk // 2), np.float32)
    for ct in range(2):
        for n in range(chunk // 2):
            s2[ct, 2 * n + ct, n] = 1.0
    return rsel, s2, h0, h1


def _col_conv(x, f):
    """Circular column convolution via lane rolls: y[n] = sum f[k] x[n-k]."""
    acc = None
    for k, coef in enumerate(f):
        term = (pltpu.roll(x, k, axis=1) if k else x) * float(coef)
        acc = term if acc is None else acc + term
    return acc


def _decimate(x, s2_ref, ct, chunk):
    w = x.shape[-1]
    n = w // chunk
    segs = [
        jnp.dot(x[:, l * chunk : (l + 1) * chunk], s2_ref[ct],
                preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
        for l in range(n)
    ]
    return segs[0] if n == 1 else jnp.concatenate(segs, axis=1)


def _kernel(static, x_hbm, rsel_ref, s2_ref, o_ref):
    h_total, chunk = static
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
        # row stage: [16, 48] @ [48, W] for (filter lo/hi) x (phase rt)
        rows = {}
        for fi in range(2):
            for rt in range(2):
                rows[(fi, rt)] = jnp.dot(rsel_ref[fi, rt], x,
                                         preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
        # col stage per tree combo; output plane order:
        # [ll x 4 combos, lh x 4, hl x 4, hh x 4], combos (rt, ct) row-major
        h0, h1 = _consts_l1(chunk)[2], _consts_l1(chunk)[3]
        for band, (row_f, col_f) in enumerate(
            [(0, h0), (0, h1), (1, h0), (1, h1)]  # ll, lh, hl, hh
        ):
            for ci, (rt, ct) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                full = _col_conv(rows[(row_f, rt)], col_f)
                o_ref[0, band * 4 + ci] = _decimate(full, s2_ref, ct, chunk)

    pl.run_scoped(body, scratch=pltpu.VMEM((STRIP + 2 * HALO, x_hbm.shape[-1]), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((3,)))


@partial(jax.jit, static_argnames=("interpret",))
def dtcwt_level1_analysis(x: jnp.ndarray, interpret: bool = False):
    """f32 [B, H, W] -> [B, 16, H/2, W/2]: planes [ll*4, lh*4, hl*4, hh*4],
    tree combos (rt, ct) row-major within each band."""
    b, h, w = x.shape
    chunk = pick_chunk2(w)
    if h % STRIP or chunk is None:
        raise ValueError(f"needs H % {STRIP} == 0 and an even lane chunk, got {h}x{w}")
    rsel, s2, _, _ = _consts_l1(chunk)
    return pl.pallas_call(
        partial(_kernel, (h, chunk)),
        out_shape=jax.ShapeDtypeStruct((b, 16, h // 2, w // 2), jnp.float32),
        grid=(b, h // STRIP),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, 2, STRIP // 2, STRIP + 2 * HALO), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, chunk, chunk // 2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, STRIP // 2, w // 2), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(rsel), jnp.asarray(s2))

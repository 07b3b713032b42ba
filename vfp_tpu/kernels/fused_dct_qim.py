"""Single-launch fused DCT-QIM embed/extract kernels (perceptual masks).

Same launch-bound motivation and machinery as fused_embed.py, for the 8x8
perceptually-masked codec (wm/dct_qim.py): per (batch, STRIP-row strip) grid
cell —

  u8 -> f32 -> Y & U lincombs -> 8x8-block SoA (selection matmuls) ->
  64x64 Kronecker DCT of both channels -> luminance/texture masks
  (lane-parallel where-chains) -> QIM on coefficient [2][1] ->
  spatial delta = amplitude x fixed DCT basis pattern -> color roundtrip
  epilogue -> u8

Only DCT coefficient [2][1] changes, so the inverse DCT collapses to a
rank-1 spatial update: dU[8br+r, 8n+c] = amp[n] * P[r, c] with
P = idct2(e_2 e_1^T) — no inverse transform in the kernel.

The luminance mask needs the global block-DC mean of the Y channel
(reference: dct_encoder.py:52-55), which crosses strip boundaries; it is
computed in a tiny first pass outside and passed in as a scalar.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.color import M_BWD, M_FWD, OFF_BWD, OFF_FWD
from ..ops.dct import dct_matrix
from ..ops.soa import dct_kron

STRIP = 64  # rows per grid cell
NBR = STRIP // 8  # 8x8 QIM block-rows per cell; the channel-stacked
# selection operand is [2*STRIP, chunk] rows — NBR=8 fills the MXU's 128
MAX_CHUNK = 512
MAX_CHUNKS = 16  # in-kernel segment cap (scoped-VMEM growth; see fused_embed)


def pick_chunk8(w8: int) -> int | None:
    """Largest lane chunk <= MAX_CHUNK with chunk % 8 == 0, w8 % chunk == 0,
    and at most MAX_CHUNKS segments per strip."""
    nbw = w8 // 8
    for g in range(1, MAX_CHUNKS + 1):
        if nbw % g == 0 and (w8 // g) <= MAX_CHUNK:
            return w8 // g
    return None


def padded_width8(w8: int) -> int | None:
    """Smallest W' >= w8 (multiple of 8) with a valid lane chunk; padded
    block columns are confined to their own 8-lane group (selection matmuls
    are block-diagonal), and the kernels zero their QIM amplitude, so the
    output slice back to w8 is exact."""
    for wp in range(w8, MAX_CHUNK * MAX_CHUNKS + 1, 8):
        if pick_chunk8(wp) is not None:
            return wp
    return None


@lru_cache(maxsize=None)
def _consts8(chunk: int):
    nb = chunk // 8
    # one-hot selection: S8[c][j, n] = 1 iff j == 8n + c (in-block column c)
    s = np.zeros((8, chunk, nb), np.float32)
    for c in range(8):
        for n in range(nb):
            s[c, 8 * n + c, n] = 1.0
    st = np.ascontiguousarray(s.transpose(0, 2, 1))
    k = dct_kron(8)  # [64, 64], expects rows ordered r*8+c
    # _block_dct assembles rows c-major ([c*8+r]); fold the permutation into K
    perm = np.zeros((64, 64), np.float32)
    for r in range(8):
        for c in range(8):
            perm[r * 8 + c, c * 8 + r] = 1.0
    kp = np.ascontiguousarray((k @ perm).astype(np.float32))
    d8 = dct_matrix(8)
    basis = np.outer(d8[2], d8[1]).astype(np.float32)  # idct2 of e2 e1^T: [8, 8]

    # -- component-major constants (all permutations folded, zero runtime
    # row reordering; see fused_embed._consts for the same trick) --
    # k4: ALL NBR Y block-rows' DCTs in ONE [512, 512] block-diagonal
    # matmul with component-major output rows q * NBR + br, so every DCT
    # component used by the masks is an 8-sublane-ALIGNED [NBR, nbw] slice
    # and the whole luminance/texture where-chain runs ONCE on full vreg
    # tiles.  (The previous pairing ran the chain 4x on 2-sublane slices —
    # 25% VPU utilization on the chain, the kernel's densest op sequence.
    # The block-diagonal form is 4x the MACs of the four [128, 128] pairs,
    # but the matmul is MXU-cheap either way.)  Input layout: concat over
    # (m, c) of sel[c][16m : 16m + 16] -> row m*128 + c*16 + t*8 + r, block
    # row br = 2m + t.
    k4 = np.zeros((512, 512), np.float32)
    for m in range(NBR // 2):
        for t in range(2):
            br = 2 * m + t
            for q in range(64):
                for c in range(8):
                    for r in range(8):
                        k4[q * NBR + br, m * 128 + c * 16 + t * 8 + r] = \
                            kp[q, c * 8 + r]
    k4 = np.ascontiguousarray(k4)
    # w17: U-channel DCT coefficient [2][1] for ALL NBR block-rows in one
    # matmul — the QIM path never reads any other U component.  Input
    # layout: concat over c of sel[c][64:128] -> row c*64 + br*8 + r.
    w17 = np.zeros((NBR, 8 * STRIP), np.float32)
    for br in range(NBR):
        for c in range(8):
            for r in range(8):
                w17[br, c * 64 + br * 8 + r] = kp[17, c * 8 + r]
    # b2: rank-1 spatial update as ONE [STRIP, 64] matmul over the stacked
    # amp selections (rows c*NBR + br) -> du rows br*8 + r; replaces 64
    # single-row concatenations and 64 scalar-multiply VPU rounds.
    b2 = np.zeros((STRIP, 8 * NBR), np.float32)
    for br in range(NBR):
        for r in range(8):
            for c in range(8):
                b2[br * 8 + r, c * NBR + br] = basis[r, c]
    # per-block-row |coef| sums over all 64 components: sumsel[br, q*8+br]=1
    sumsel = np.zeros((NBR, 512), np.float32)
    for br in range(NBR):
        for q in range(64):
            sumsel[br, q * NBR + br] = 1.0
    return s, st, kp, basis, k4, w17, b2, sumsel


def _dot(a, b, fast: bool):
    """MXU matmul; ``fast`` rounds both operands to ONE bf16 pass (same
    contract as kernels/dtcwt_level1.dot_exact(fast=True)).  For the QIM
    codec this is decision-safe by construction: the masks are recomputed
    identically on both sides (Y is never modified), and the bf16 noise on
    the U coefficient (~0.5 units) is far under the decode margin step/2
    (>= 10 at the default alpha).  Borderline mask-class / QIM-bin flips are
    the same deviation class as DT-CWT fast_dots (tests pin decisions)."""
    if fast:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _select_blocks(yp, up, s_ref, n_chunks, chunk, fast: bool = False):
    """Both channels' [STRIP, W] -> 8 in-block-column selections
    [2*STRIP, nbw] (row chan*STRIP + br*8 + r), stacked so each selection
    matmul runs at full M=128 row fill."""
    yu = jnp.concatenate([yp, up], axis=0)  # [2*STRIP, W]; row chan*STRIP + br*8 + r
    sel = []
    for c in range(8):
        segs = [
            _dot(yu[:, l * chunk : (l + 1) * chunk], s_ref[c], fast)
            for l in range(n_chunks)
        ]
        sel.append(segs[0] if n_chunks == 1 else jnp.concatenate(segs, axis=1))
    return sel


def _y_masks8(sel, k4_ref, sumsel_ref, mean, fast: bool = False):
    """All NBR Y block-rows' QIM step masks [NBR, nbw] in ONE pass
    (reference: dct_encoder.py:41-102): one block-diagonal component-major
    DCT matmul (rows q*NBR + br — see _consts8), then the whole
    luminance/texture where-chain on full-tile [NBR, nbw] component slices.
    DEFAULT contract (HIGH isn't lowered in Mosaic): coefficient-sum error
    well under mask thresholds spread over O(1000); ``fast`` drops to one
    explicit bf16 pass."""
    ym = jnp.concatenate(
        [sel[ci][16 * m : 16 * m + 16] for m in range(NBR // 2)
         for ci in range(8)], axis=0)  # [512, nbw], row m*128 + c*16 + t*8 + r
    d = _dot(k4_ref[:], ym, fast)  # [512, nbw], rows q*NBR + br
    c = jnp.abs(d)

    def at(r, col):
        i = NBR * (r * 8 + col)
        return c[i : i + NBR, :]

    dcl = at(0, 0) + at(0, 1) + at(0, 2) + at(1, 0) + at(1, 1) + at(2, 0)
    eh = _dot(sumsel_ref[:], c, fast) - dcl
    e = (at(3, 0) + at(4, 0) + at(5, 0) + at(6, 0)
         + at(0, 3) + at(0, 4) + at(0, 5) + at(0, 6)
         + at(2, 1) + at(1, 2) + at(2, 2) + at(3, 3))
    h = eh - e
    l = dcl - at(0, 0)
    l_e = l / e
    le_h = (l + e) / h

    def edge(a, b):
        return ((l_e >= a) & (le_h >= b)) | ((l_e >= b) & (le_h >= a)) | (le_h > 4.0)

    edge_val = jnp.where(l + e <= 400.0, 1.125, 1.25)
    ramp = 1.0 + 1.25 * (eh - 290.0) / (1800.0 - 290.0)
    hi = jnp.where(edge(1.4, 1.1), edge_val, ramp)
    lo = jnp.where(edge(2.3, 1.6), edge_val, jnp.where(e + h > 290.0, ramp, 1.0))
    tex = jnp.where(eh > 125.0, jnp.where(eh > 900.0, hi, lo), 1.0)
    return tex * _lum_mask(d[:NBR, :], mean)  # rows 0..NBR = signed DC


def _u17(sel, w17_ref, fast: bool = False):
    """U-channel DCT coefficient [2][1] for all NBR block-rows: [NBR, nbw]."""
    u_cstack = jnp.concatenate([sel[ci][STRIP:] for ci in range(8)],
                               axis=0)  # [8*STRIP, nbw], row c*64 + br*8 + r
    return _dot(w17_ref[:], u_cstack, fast)


def _lum_mask(dc, mean):
    v = dc / 8.0
    l_min, l_max, f_max = 90.0, 255.0, 2.0
    mean = jnp.maximum(l_min, mean)
    f_ref = 1.0 + (mean - l_min) * (f_max - 1.0) / (l_max - l_min)
    ramp = 1.0 + (v - mean) / (l_max - mean) * (f_max - f_ref)
    return jnp.where(
        v > mean, ramp, jnp.where(v < 15.0, 1.25, jnp.where(v < 25.0, 1.125, 1.0))
    )


def _embed_kernel(static, x_ref, wm_ref, mean_ref, s_ref, st_ref, k2_ref,
                  w17_ref, b2_ref, sum_ref, o_ref):
    alpha, nbh, nbw_real, chunk, fast = static
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [3, STRIP, W]
    w = x.shape[-1]
    n_chunks = w // chunk
    nbw = w // 8
    mean = mean_ref[pl.program_id(0), 0]

    yp = M_FWD[0, 0] * x[0] + M_FWD[0, 1] * x[1] + M_FWD[0, 2] * x[2] + OFF_FWD[0]
    up = M_FWD[1, 0] * x[0] + M_FWD[1, 1] * x[1] + M_FWD[1, 2] * x[2] + OFF_FWD[1]

    wm = wm_ref[0]  # [NBR, nbw]
    # zero the QIM amplitude outside the true block grid: all-zero padded
    # block columns make the perceptual masks 0/0 = NaN, which would poison
    # every lane through the scatter matmuls below
    bcol = jax.lax.broadcasted_iota(jnp.int32, (NBR, nbw), 1)
    brow = jax.lax.broadcasted_iota(jnp.int32, (NBR, nbw), 0)
    sel = _select_blocks(yp, up, s_ref, n_chunks, chunk, fast)
    # component-major QIM: masks, U coefficient, and the QIM rule all run
    # ONCE on [NBR, nbw] tiles (previously NBR separate 1-sublane passes)
    step = alpha * _y_masks8(sel, k2_ref, sum_ref, mean, fast)
    v = _u17(sel, w17_ref, fast)
    step2 = step + step
    base = jnp.sign(v) * jnp.floor(jnp.abs(v) / step2) * step2
    v_new = jnp.where(wm == 0.0, base, base + jnp.sign(v) * step)
    amps = jnp.where((bcol < nbw_real) & (j * NBR + brow < nbh), v_new - v, 0.0)
    # scatter-back: the selection matmuls run at M=NBR, then ONE [STRIP, 64]
    # matmul against the stacked selections applies the rank-1 IDCT basis
    # and emits du directly in row order br*8 + r (the previous formulation
    # ran 64 scalar-multiply VPU rounds + 64 single-row concatenations)
    amp_sc = []
    for c in range(8):
        outs = [
            _dot(amps[:, l * (chunk // 8) : (l + 1) * (chunk // 8)], st_ref[c],
                 fast)
            for l in range(n_chunks)
        ]
        amp_sc.append(outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1))
    amp_stack = jnp.concatenate(amp_sc, axis=0)  # [8*NBR, W], row c*NBR + br
    du = _dot(b2_ref[:], amp_stack, fast)  # [STRIP, W], row br*8+r

    # Delta-identity epilogue (see kernels/fused_embed.py): the color
    # roundtrip is affine and rounds back to x exactly for integer pixels,
    # so marked = x + du * M_BWD[:, 1].  The V-channel forward lincomb and
    # all three backward lincombs vanish; R (M_BWD[2, 1] == 0) is a pure u8
    # passthrough.  +-1 deviations vs the multi-op path only where the
    # pre-round value sits within the roundtrip epsilon of a .5 boundary.
    for k in range(3):
        mk = float(M_BWD[k, 1])
        if mk == 0.0:
            o_ref[0, k] = x_ref[0, k]
        else:
            o_ref[0, k] = (
                jnp.round(jnp.clip(x[k] + mk * du, 0.0, 255.0))
                .astype(jnp.int32).astype(jnp.uint8)
            )


def _decode_kernel(static, x_ref, mean_ref, s_ref, k2_ref, w17_ref, sum_ref, o_ref):
    alpha, chunk, fast = static
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)
    w = x.shape[-1]
    n_chunks = w // chunk
    mean = mean_ref[pl.program_id(0), 0]
    yp = M_FWD[0, 0] * x[0] + M_FWD[0, 1] * x[1] + M_FWD[0, 2] * x[2] + OFF_FWD[0]
    up = M_FWD[1, 0] * x[0] + M_FWD[1, 1] * x[1] + M_FWD[1, 2] * x[2] + OFF_FWD[1]
    sel = _select_blocks(yp, up, s_ref, n_chunks, chunk, fast)
    step = alpha * _y_masks8(sel, k2_ref, sum_ref, mean, fast)
    v = _u17(sel, w17_ref, fast)
    o_ref[0, 0] = (jnp.mod(jnp.round(v / step), 2.0) == 1.0).astype(jnp.float32)


def _dc_mean_kernel(x_ref, o_ref):
    """Global Y-channel block-DC mean: per strip, sum of Y / 64 per block ==
    DC of the orthonormal 8x8 DCT; accumulate sums for the host-side mean."""
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)
    yp = M_FWD[0, 0] * x[0] + M_FWD[0, 1] * x[1] + M_FWD[0, 2] * x[2] + OFF_FWD[0]
    o_ref[0, 0] = jnp.sum(yp)


def _y_dc_mean(planes, h8, w8):
    """mean over blocks of (DCT DC / 8) = mean(Y) / 8 * 8 = sum(Y)/(64*nb)/8*8.

    DC of the orthonormal 8x8 DCT = sum(block)/8, and the reference divides
    by 8 (dct_encoder.py:52-55) giving exactly the block pixel mean; the mean
    over blocks of block means == global pixel mean over the 8-aligned crop.
    """
    b = planes.shape[0]
    x = planes[:, :, :h8, :w8].astype(jnp.float32)
    yp = M_FWD[0, 0] * x[:, 0] + M_FWD[0, 1] * x[:, 1] + M_FWD[0, 2] * x[:, 2] + OFF_FWD[0]
    return jnp.mean(yp, axis=(1, 2))  # [B]


@partial(jax.jit, static_argnames=("alpha", "interpret", "fast"))
def fused_dct_qim_mark(planes: jnp.ndarray, wm2d: jnp.ndarray, alpha: float = 20.0,
                       interpret: bool = False, fast: bool = False):
    """u8 planes [B, 3, H, W] + wm grid [nbh, nbw] -> marked planes (DctQim).

    ``fast``: single-bf16-pass kernel matmuls (see _dot) — fewer MXU passes
    when the backend's DEFAULT contract is multi-pass; decision-equivalent
    (tests/test_dct_qim.py::TestFastDctQim)."""
    b, _, h, w = planes.shape
    nbh, nbw_real = h // 8, w // 8
    h8, w8 = nbh * 8, nbw_real * 8
    if w8 != w or h8 != h:
        raise ValueError("fused_dct_qim_mark requires H, W % 8 == 0")
    wp = padded_width8(w8)
    if wp is None:
        raise ValueError(f"no valid lane chunk for W={w}")
    chunk = pick_chunk8(wp)
    nbw = wp // 8
    strips = pl.cdiv(h, STRIP)
    means = _y_dc_mean(planes, h8, w8)[:, None]  # [B,1] (pixel mean == mean of DC/8)
    if wp != w:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    wm3d = jnp.pad(wm2d.astype(jnp.float32),
                   ((0, strips * NBR - nbh), (0, nbw - nbw_real)))
    wm3d = wm3d.reshape(strips, NBR, nbw)
    s, st, _, _, k2, w17, b2, sumsel = _consts8(chunk)
    out = pl.pallas_call(
        partial(_embed_kernel, (float(alpha), nbh, nbw_real, chunk, fast)),
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint8),
        grid=(b, strips),
        in_specs=[
            pl.BlockSpec((1, 3, STRIP, wp), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBR, nbw), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, chunk, chunk // 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk // 8, chunk), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 512), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NBR, 8 * STRIP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIP, 8 * NBR), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NBR, 512), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, STRIP, wp), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        # planes -> out alias: grid cells read/write disjoint windows, so
        # in-place is exact; XLA copy-inserts for live callers.  ~30% of a
        # mark kernel's wall clock is the separate output buffer
        # (tools/probe_strip.py; see fused_embed.fused_mark_planar).
        input_output_aliases={0: 0},
        interpret=interpret,
    )(planes, wm3d, means, jnp.asarray(s), jnp.asarray(st), jnp.asarray(k2),
      jnp.asarray(w17), jnp.asarray(b2), jnp.asarray(sumsel))
    return out if wp == w else out[:, :, :, :w]


@partial(jax.jit, static_argnames=("alpha", "interpret", "fast"))
def fused_dct_qim_extract(planes: jnp.ndarray, alpha: float = 20.0,
                          interpret: bool = False, fast: bool = False):
    """u8 planes [B, 3, H, W] -> decoded bits [B, nbh, nbw] (DctQim)."""
    b, _, h, w = planes.shape
    nbh, nbw_real = h // 8, w // 8
    h8, w8 = nbh * 8, nbw_real * 8
    if w8 != w or h8 != h:
        raise ValueError("fused_dct_qim_extract requires H, W % 8 == 0")
    wp = padded_width8(w8)
    if wp is None:
        raise ValueError(f"no valid lane chunk for W={w}")
    chunk = pick_chunk8(wp)
    nbw = wp // 8
    strips = pl.cdiv(h, STRIP)
    means = _y_dc_mean(planes, h8, w8)[:, None]
    if wp != w:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    s, st, _, _, k2, w17, _, sumsel = _consts8(chunk)
    out = pl.pallas_call(
        partial(_decode_kernel, (float(alpha), chunk, fast)),
        out_shape=jax.ShapeDtypeStruct((b, strips, NBR, nbw), jnp.float32),
        grid=(b, strips),
        in_specs=[
            pl.BlockSpec((1, 3, STRIP, wp), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, chunk, chunk // 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 512), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NBR, 8 * STRIP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NBR, 512), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, NBR, nbw), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, means, jnp.asarray(s), jnp.asarray(k2), jnp.asarray(w17),
      jnp.asarray(sumsel))
    return out.reshape(b, strips * NBR, nbw)[:, :nbh, :nbw_real]

"""Single-launch fused embed kernel: u8 planes in -> marked u8 planes out.

On the axon-relayed chip every kernel launch costs ~2.7 ms regardless of
size, so the multi-op embed pipeline (color, Haar, layout, QIM, inverse,
epilogue = 7+ launches) is launch-bound.  This kernel does the ENTIRE
flagship embed per (batch, STRIP-row strip) grid cell in one launch:

  u8 -> f32 -> channel lincomb -> Haar LL -> 4x4-block SoA ->
  dominant triplet -> QIM -> rank-1 -> LL delta -> spatial delta ->
  delta-identity epilogue (x + du * M_BWD[:, chan]) -> u8

The reference's per-block DCT/IDCT pair is OMITTED: it is an orthogonal
similarity, so the dominant triplet — and the rank-1 QIM update mapped back
to the spatial block — is identical computed on the raw LL block (proof:
wm/dwt_dct_svd.py module docstring).  That deletes what used to be the
kernel's two largest matmuls (the [16*NBR, 16*NBR] permuted-Kronecker DCTs)
AND their layout role: the component-major regrouping those matmuls carried
in their permutation factors is now done for free by (a) ordering the
pair-sum constant R1's rows r-major (LL row br*4+r emitted at position
r*NBR+br) and (b) 8-sublane-aligned static slices of the selection outputs.

Mosaic has no strided lane slicing (it lowers as an unsupported gather), so
the Haar lane-pair sum and the stride-4 block-column selection are folded
into four small selection matmuls with two-hot columns:
S_c[j, n] = 1 iff j in {8n+2c, 8n+2c+1}.  The pattern is 8-periodic, so one
[CHUNK, CHUNK/8] matrix serves every static lane chunk of the strip; the
transposes scatter the LL delta back onto the 2x2 quads.  Row-side pairing
is the [STRIP/2, STRIP] analogue R1.  Everything else is elementwise on
[NBR, nbw] tiles (VPU).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.color import M_BWD, M_FWD, OFF_BWD, OFF_FWD
from .qim import _triplet_core

STRIP = 64  # rows per grid cell (u8 sublane tile)
NBR = STRIP // 8  # QIM block-rows per cell: component tiles are [NBR, nbw],
# a full 8-sublane f32 tile, so the triplet math runs at full VPU utilization
MAX_CHUNK = 512  # lane-chunk cap (HIGHEST-precision matmuls need VMEM headroom)
MAX_CHUNKS = 16  # in-kernel segment cap: Mosaic's scoped VMEM grows with the
# number of per-chunk selection matmuls (W=856 -> 107 segments compiled to a
# 26 MB scope vs the 16 MB limit); 16 covers 8K-wide frames at chunk 512


def pick_chunk(w4: int) -> int | None:
    """Largest lane chunk <= MAX_CHUNK with chunk % 8 == 0, w4 % chunk == 0,
    and at most MAX_CHUNKS segments per strip."""
    nbw = w4 // 8
    for g in range(1, MAX_CHUNKS + 1):
        if nbw % g == 0 and (w4 // g) <= MAX_CHUNK:
            return w4 // g
    return None


def padded_width(w: int) -> int | None:
    """Smallest W' >= w (multiple of 8) with a valid lane chunk.

    Widths whose block count has no small-ish divisor (e.g. 856: 107 blocks,
    prime) are padded with zero columns; deltas from padded block columns
    stay inside their own 8-lane group (the selection matmuls are block-
    diagonal per 8 lanes), so slicing the output back to w is exact.
    """
    w8 = (w + 7) // 8 * 8
    for wp in range(w8, MAX_CHUNK * MAX_CHUNKS + 1, 8):
        if pick_chunk(wp) is not None:
            return wp
    return None


@lru_cache(maxsize=None)
def _consts(chunk: int):
    nb = chunk // 8
    # the Haar LL 0.5 factors are folded into the constants (s forward,
    # r1.T backward) so the kernel never runs a full-res scalar multiply:
    # 0.5 entries are exact in f32 and the selected values are integer
    # pair-sums, so the fold is bit-neutral up to f32 association
    s = np.zeros((4, chunk, nb), np.float32)
    for c in range(4):
        for n in range(nb):
            s[c, 8 * n + 2 * c, n] = 0.5
            s[c, 8 * n + 2 * c + 1, n] = 0.5
    st = np.zeros((4, nb, chunk), np.float32)
    for c in range(4):
        for n in range(nb):
            st[c, n, 8 * n + 2 * c] = 1.0
            st[c, n, 8 * n + 2 * c + 1] = 1.0
    # R1 rows are ordered r-major — LL row br*4+r lands at r*NBR+br — so the
    # 16 component tiles of the SoA blocks are 8-sublane-aligned STATIC
    # SLICES of the selection outputs (component (r, c) = rows
    # [r*NBR, (r+1)*NBR) of mc[c]); no permutation matmul, no concats.
    # r1t's columns follow the same order, so the delta path needs none
    # either.  (The DCT that used to sit between these layouts is omitted —
    # see module docstring.)
    r1 = np.zeros((STRIP // 2, STRIP), np.float32)
    for br in range(NBR):
        for r in range(4):
            i = br * 4 + r  # LL row within the strip
            r1[r * NBR + br, 2 * i] = 1.0
            r1[r * NBR + br, 2 * i + 1] = 1.0
    return s, st, r1, np.ascontiguousarray(0.5 * r1.T)


_MAC_SH = 14  # fixed-point shift for the integer color MAC: |sum| < 2^24,
# so the single i32->f32 cast of cp is EXACT; constant rounding error is
# <= 255 * 1.5 / 2^14 = 0.023 pixel-units -> s0 shift <= ~0.2, 5% of the
# QIM margin (scale/4 = 3.75) — decode decisions unchanged
_EPI_SH = 10  # epilogue fixed point: du and M_BWD each at 2^10, combined
# 2^20; |x<<20 + duq*mki| < 2^31; quantization <= ~0.015 pixel vs the f32
# path, inside the documented borderline-.5 deviation class


def _int_mac(xi, chan):
    """[3, STRIP, W] i32 -> EXACT-castable i32 color lincomb at 2^_MAC_SH."""
    mi = [int(round(float(M_FWD[chan, i]) * (1 << _MAC_SH))) for i in range(3)]
    return mi[0] * xi[0] + mi[1] * xi[1] + mi[2] * xi[2]


def _kernel(static, x_ref, wm_ref, s_ref, st_ref, r1_ref, r1t_ref, o_ref):
    chan, scale, nbh, nbw_real, chunk, int_path = static
    j = pl.program_id(1)
    if int_path:
        # integer-domain input: the only full-res f32 tensors in the whole
        # kernel become cp and du (vs 3 input planes + 2 epilogue
        # intermediates on the f32 path) — attacks the u8<->i32<->f32 cast
        # chain the per-op profile put at 47% of the kernel
        xi = x_ref[0].astype(jnp.int32)  # [3, STRIP, W]
        cp = _int_mac(xi, chan).astype(jnp.float32)
        w = cp.shape[-1]
    else:
        x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [3, STRIP, W]
        w = x.shape[-1]
        # the +0.5 chroma offset rides past the pair-sum matmul: r1 sums two
        # rows, so cp + 0.5 -> llr + 1.0 (exact), saving a full-res [STRIP, W]
        # add; the Haar 0.5 lives in the s constants (see _consts)
        cp = M_FWD[chan, 0] * x[0] + M_FWD[chan, 1] * x[1] + M_FWD[chan, 2] * x[2]
    n_chunks = w // chunk
    nb = chunk // 8
    nbw = w // 8

    llr = jnp.dot(r1_ref[:], cp, preferred_element_type=jnp.float32)  # [32, W], row r*NBR+br
    if int_path:
        llr = llr * (1.0 / (1 << _MAC_SH))  # [32, W]: 1/6 the full-res work
    off2 = 2.0 * float(OFF_FWD[chan])
    if off2:
        llr = llr + off2

    # lane compaction: for each c, Mc[32, nbw] (pair-sum + stride-4 select)
    mc = []
    for c in range(4):
        segs = [
            jnp.dot(llr[:, l * chunk : (l + 1) * chunk], s_ref[c],
                    preferred_element_type=jnp.float32)
            for l in range(n_chunks)
        ]
        mc.append(segs[0] if n_chunks == 1 else jnp.concatenate(segs, axis=1))

    # component-major QIM on the RAW spatial blocks (DCT omitted — module
    # docstring): r1's r-major row order makes component (r, c) an 8-sublane
    # -aligned slice of mc[c], so the triplet math runs ONCE on full
    # [NBR, nbw] tiles with no permutation matmul and no concatenations
    wm = wm_ref[0]  # [NBR, nbw]
    # zero the QIM delta outside the true block grid: padded block columns
    # (lane padding) and partial/padded block rows must pass through as pure
    # color roundtrip, exactly like the XLA path / the reference
    bcol = jax.lax.broadcasted_iota(jnp.int32, (NBR, nbw), 1)
    brow = jax.lax.broadcasted_iota(jnp.int32, (NBR, nbw), 0)
    s0, u, v, rows = _triplet_core(
        [mc[c][NBR * r : NBR * (r + 1), :] for r in range(4) for c in range(4)])
    s_new = (jnp.floor(s0 / scale) + 0.25 + 0.5 * wm) * scale
    ds = jnp.where((bcol < nbw_real) & (j * NBR + brow < nbh), s_new - s0, 0.0)
    # scatter-back per block column c; delta rows assembled r-major to match
    # r1t's (permuted) columns
    dllrows = None
    for c in range(4):
        dc = jnp.concatenate([ds * (u[r] * v[c]) for r in range(4)], axis=0)
        outs = [
            jnp.dot(dc[:, l * nb : (l + 1) * nb], st_ref[c],
                    preferred_element_type=jnp.float32)
            for l in range(n_chunks)
        ]
        contrib = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)
        dllrows = contrib if dllrows is None else dllrows + contrib  # [STRIP/2, W]
    # int path: fold the epilogue's 2^_EPI_SH into the TINY r1t operand
    # ([STRIP, STRIP/2]) so du arrives pre-scaled — no full-res multiply
    r1t = r1t_ref[:] * float(1 << _EPI_SH) if int_path else r1t_ref[:]
    du = jnp.dot(r1t, dllrows, preferred_element_type=jnp.float32)

    # Delta-identity epilogue: the BGR->YUV->BGR roundtrip is affine, so
    # marked = roundtrip(x) + du * M_BWD[:, chan]; for integer pixels
    # roundtrip(x) rounds back to x exactly (cv2's backward constants miss
    # exact inversion by <= 2.6e-4 relative = < 0.07 at 255 scale, well
    # under the 0.5 rounding radius), so emit x + du * M_BWD[:, chan]
    # directly.  Kills 5 of 6 full-res color lincombs, and channels with
    # M_BWD[k, chan] == 0 (R for the U channel) are a pure u8 passthrough
    # with no clip/round/cast at all.  Deviation vs the multi-op XLA path:
    # marked pixels whose pre-round value sits within the roundtrip epsilon
    # of a .5 boundary may differ by +-1 (decode-identical — same class as
    # the borderline-QIM-bin note below); du == 0 regions are BIT-EXACT
    # passthrough, stronger than the roundtrip.
    if int_path:
        # integer epilogue: one f32->i32 cast of du, then pure-i32 per
        # channel: (x << 2S + duq * mki + half) >> 2S, clip, narrow.
        # Round-half-up on exact 2^-2S ties vs the f32 path's half-even —
        # same borderline-.5 class; du == 0 stays BIT-EXACT (duq == 0 and
        # the +half cannot carry out of the shift)
        duq = jnp.round(du).astype(jnp.int32)  # du pre-scaled by 2^_EPI_SH
        half = jnp.int32(1 << (2 * _EPI_SH - 1))
        for k in range(3):
            mk = float(M_BWD[k, chan])
            if mk == 0.0:
                o_ref[0, k] = x_ref[0, k]
            else:
                mki = jnp.int32(int(round(mk * (1 << _EPI_SH))))
                v = (xi[k] << (2 * _EPI_SH)) + duq * mki + half
                o_ref[0, k] = jnp.clip(
                    v >> (2 * _EPI_SH), 0, 255).astype(jnp.uint8)
    else:
        for k in range(3):
            mk = float(M_BWD[k, chan])
            if mk == 0.0:
                o_ref[0, k] = x_ref[0, k]
            else:
                o_ref[0, k] = (
                    jnp.round(jnp.clip(x[k] + mk * du, 0.0, 255.0))
                    .astype(jnp.int32).astype(jnp.uint8)
                )


@partial(jax.jit, static_argnames=("chan", "scale", "interpret", "int_path"))
def fused_mark_planar(planes: jnp.ndarray, wm2d: jnp.ndarray, scale: float = 15.0,
                      chan: int = 1, interpret: bool = False,
                      int_path: bool = False):
    """u8 planes [B, 3, H, W] + watermark grid [nbh, nbw] -> marked planes.

    wm2d is the first nbh*nbw entries of the flat watermark plane reshaped
    row-major (block scan order parity).  Requires W % 4 == 0 (callers fall
    back to the multi-op path otherwise); widths whose block count lacks a
    small divisor are zero-padded to the next chunkable width and sliced
    back (exact — see padded_width).  Note: embeds may pick a different
    (parity-equivalent) QIM bin than the multi-op path on borderline s0 —
    decoded bits are identical.

    The planes operand is aliased to the output (input_output_aliases):
    grid cells read and write disjoint [1, 3, STRIP, W] windows, so
    in-place is exact, and XLA copy-inserts when the caller's buffer is
    still live (eager callers keep value semantics).  Measured on chip
    (tools/probe_strip.py): a separate output buffer costs ~30% of the
    kernel's wall clock — the u8 passthrough runs 2.41 ms/iter two-buffer
    vs 1.70 ms aliased at B=32/1080p, matching XLA's elementwise stream
    rate.  In the hot paths (mark_frames' planar intermediate, on-device
    bench carries) the operand is always dead, so the alias is free.
    """
    b, _, h, w = planes.shape
    h4, w4 = h // 4 * 4, w // 4 * 4
    if w4 != w:
        raise ValueError("fused_mark_planar requires W % 4 == 0")
    wp = padded_width(w4)
    if wp is None:
        raise ValueError(f"no valid lane chunk for W={w}")
    chunk = pick_chunk(wp)
    nbh, nbw_real = (h4 // 2) // 4, w4 // 8
    nbw = wp // 8
    if wp != w:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    strips = pl.cdiv(h, STRIP)
    wm3d = jnp.pad(wm2d.astype(jnp.float32),
                   ((0, strips * NBR - nbh), (0, nbw - nbw_real)))
    wm3d = wm3d.reshape(strips, NBR, nbw)
    s, st, r1, r1t = _consts(chunk)
    grid = (b, strips)
    out = pl.pallas_call(
        partial(_kernel, (chan, float(scale), nbh, nbw_real, chunk, int_path)),
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, STRIP, wp), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBR, nbw), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, chunk, chunk // 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, chunk // 8, chunk), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIP // 2, STRIP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIP, STRIP // 2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, STRIP, wp), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(planes, wm3d, jnp.asarray(s), jnp.asarray(st), jnp.asarray(r1),
      jnp.asarray(r1t))
    return out if wp == w else out[:, :, :, :w]


def _decode_kernel(static, x_ref, s_ref, r1_ref, o_ref):
    chan, scale, chunk, int_path = static
    if int_path:
        cp = _int_mac(x_ref[0].astype(jnp.int32), chan).astype(jnp.float32)
    else:
        x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [3, STRIP, W]
        # same constant folds as the mark kernel: Haar 0.5 in s, +0.5 chroma
        # offset applied as +1.0 after the pair-sum matmul
        cp = M_FWD[chan, 0] * x[0] + M_FWD[chan, 1] * x[1] + M_FWD[chan, 2] * x[2]
    w = cp.shape[-1]
    n_chunks = w // chunk

    llr = jnp.dot(r1_ref[:], cp, preferred_element_type=jnp.float32)  # row r*NBR+br
    if int_path:
        llr = llr * (1.0 / (1 << _MAC_SH))
    off2 = 2.0 * float(OFF_FWD[chan])
    if off2:
        llr = llr + off2
    mc = []
    for c in range(4):
        segs = [
            jnp.dot(llr[:, l * chunk : (l + 1) * chunk], s_ref[c],
                    preferred_element_type=jnp.float32)
            for l in range(n_chunks)
        ]
        mc.append(segs[0] if n_chunks == 1 else jnp.concatenate(segs, axis=1))
    # raw spatial blocks straight into the triplet (DCT omitted; component
    # (r, c) is an aligned slice of mc[c] — see the mark kernel)
    s0, u, v, rows = _triplet_core(
        [mc[c][NBR * r : NBR * (r + 1), :] for r in range(4) for c in range(4)])
    o_ref[0, 0] = (jnp.mod(s0, scale) > scale * 0.5).astype(jnp.float32)  # [NBR, nbw]


@partial(jax.jit, static_argnames=("chan", "scale", "interpret", "int_path"))
def fused_extract_planar(planes: jnp.ndarray, scale: float = 15.0, chan: int = 1,
                         interpret: bool = False, int_path: bool = False):
    """u8 planes [B, 3, H, W] -> decoded bits [B, nbh, nbw] in one launch."""
    b, _, h, w = planes.shape
    h4, w4 = h // 4 * 4, w // 4 * 4
    if w4 != w:
        raise ValueError("fused_extract_planar requires W % 4 == 0")
    wp = padded_width(w4)
    if wp is None:
        raise ValueError(f"no valid lane chunk for W={w}")
    chunk = pick_chunk(wp)
    nbh, nbw_real = (h4 // 2) // 4, w4 // 8
    nbw = wp // 8
    if wp != w:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    strips = pl.cdiv(h, STRIP)
    s, st, r1, r1t = _consts(chunk)
    out = pl.pallas_call(
        partial(_decode_kernel, (chan, float(scale), chunk, int_path)),
        out_shape=jax.ShapeDtypeStruct((b, strips, NBR, nbw), jnp.float32),
        grid=(b, strips),
        in_specs=[
            pl.BlockSpec((1, 3, STRIP, wp), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, chunk, chunk // 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIP // 2, STRIP), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, NBR, nbw), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, jnp.asarray(s), jnp.asarray(r1))
    return out.reshape(b, strips * NBR, nbw)[:, :nbh, :nbw_real]


# NOTE: an interleaved-input variant (reading [B, H, W, 3] u8 directly as
# [B, H, 3W] with one-hot stride-3 channel-selection matmuls in-kernel) was
# implemented and measured SLOWER than this planar kernel + two XLA moveaxis
# passes (664 vs 1300 fps at B=8): ~90 small selection matmuls per strip cost
# more than the transposes.  See git history if revisiting.

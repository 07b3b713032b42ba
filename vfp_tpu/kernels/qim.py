"""Fused Pallas kernel for the DWT+DCT+SVD QIM block stage.

Replaces the XLA op chain Gram -> powered squarings -> dominant triplet ->
QIM -> rank-1 update with ONE kernel: a [16, T] tile of SoA blocks (block
index on lanes, flattened 4x4 block on sublanes) stays in VMEM/registers for
the whole computation, so HBM sees exactly one read and one write of the
block data instead of ~15 intermediate passes.

The reference's per-block DCT is omitted — it is an orthogonal similarity,
so the dominant triplet (and therefore s0, the QIM bit, and the rank-1
update mapped back to the spatial block) is identical computed on the raw
LL block (proof: wm/dwt_dct_svd.py module docstring; reference:
src/offmark/embed/dwt_dct_svd_encoder.py:42-45).  That removes the kernel's
only MXU matmuls: everything is an elementwise op on [1, T] lane vectors
(pure VPU).

Numerics match ops/soa.py's method='power' path (same squaring count, same
start vector, same eps guards); parity — including against a WITH-DCT
reference implementation — is asserted in tests/test_kernels.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.soa import _V0

LANES = 512
_EPS = 1e-20


def _triplet_rows(m):
    """Shared dominant-triplet math on a [16, T] tile; returns (s0, u, v)
    with s0 [1, T], u/v lists of 4 [1, T] rows."""
    return _triplet_core([m[i : i + 1, :] for i in range(16)])


def _triplet_core(rows):
    """Dominant-triplet math on 16 tiles rows[r*4+c] of any common [S, T]
    shape; every op is elementwise, so callers can batch independent blocks
    on the sublane axis (S>1) for full VPU-lane utilization instead of
    running S separate 1-sublane passes (see kernels/fused_embed.py)."""

    # G = B^T B, rows a*4+b.
    g = [None] * 16
    for a in range(4):
        for b in range(4):
            acc = rows[0 * 4 + a] * rows[0 * 4 + b]
            for r in range(1, 4):
                acc = acc + rows[r * 4 + a] * rows[r * 4 + b]
            g[a * 4 + b] = acc

    # One Frobenius normalization, then 4 unnormalized squarings
    # (PSD rank<=4: lambda1 >= ||G||_F / 2, so G^16 can't underflow f32).
    fro = g[0] * g[0]
    for i in range(1, 16):
        fro = fro + g[i] * g[i]
    inv = jax.lax.rsqrt(jnp.maximum(fro, _EPS))
    g = [gi * inv for gi in g]
    for _ in range(4):
        g2 = [None] * 16
        for i in range(4):
            for j in range(4):
                acc = g[i * 4 + 0] * g[0 * 4 + j]
                for k in range(1, 4):
                    acc = acc + g[i * 4 + k] * g[k * 4 + j]
                g2[i * 4 + j] = acc
        # cheap renorm by trace to stay in range across squarings
        tr = g2[0] + g2[5] + g2[10] + g2[15]
        inv = pl.reciprocal(jnp.maximum(tr, _EPS), approx=False)
        g = [gi * inv for gi in g2]

    # v = normalize(G @ v0)
    v0 = _V0
    v = [None] * 4
    for i in range(4):
        acc = g[i * 4 + 0] * v0[0]
        for j in range(1, 4):
            acc = acc + g[i * 4 + j] * v0[j]
        v[i] = acc
    vn = v[0] * v[0] + v[1] * v[1] + v[2] * v[2] + v[3] * v[3]
    bad = vn <= _EPS
    inv = jax.lax.rsqrt(jnp.maximum(vn, _EPS))
    v = [jnp.where(bad, v0[i], vi * inv) for i, vi in enumerate(v)]

    # bv = M v ; s0 = ||bv|| ; u = bv / s0
    bv = [None] * 4
    for r in range(4):
        acc = rows[r * 4 + 0] * v[0]
        for c in range(1, 4):
            acc = acc + rows[r * 4 + c] * v[c]
        bv[r] = acc
    s0sq = bv[0] * bv[0] + bv[1] * bv[1] + bv[2] * bv[2] + bv[3] * bv[3]
    s0 = jnp.sqrt(s0sq)
    zero = s0 <= _EPS
    inv = jax.lax.rsqrt(jnp.maximum(s0sq, _EPS))
    u = [jnp.where(zero, 1.0 if r == 0 else 0.0, bv[r] * inv) for r in range(4)]
    return s0, u, v, rows


def _embed_kernel(x_ref, wm_ref, scale_ref, o_ref):
    scale = scale_ref[0]
    s0, u, v, rows = _triplet_rows(x_ref[0])  # raw spatial blocks: DCT omitted
    wm = wm_ref[:]  # [1, T]
    s_new = (jnp.floor(s0 / scale) + 0.25 + 0.5 * wm) * scale
    ds = s_new - s0
    out_rows = [rows[r * 4 + c] + ds * (u[r] * v[c]) for r in range(4) for c in range(4)]
    o_ref[0] = jnp.concatenate(out_rows, axis=0)  # [16, T]


def _decode_kernel(x_ref, scale_ref, o_ref):
    scale = scale_ref[0]
    s0, u, v, rows = _triplet_rows(x_ref[0])
    o_ref[0] = (jnp.mod(s0, scale) > scale * 0.5).astype(jnp.float32)


def _triplet_kernel(x_ref, o_ref):
    s0, u, v, rows = _triplet_rows(x_ref[0])
    o_ref[0] = jnp.concatenate([s0] + u + v, axis=0)  # [9, T]


def _pad_lanes(x, axis):
    n = x.shape[axis]
    pad = (-n) % LANES
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


@partial(jax.jit, static_argnames=("interpret",))
def qim_embed_soa(m: jnp.ndarray, wm: jnp.ndarray, scale: float | jnp.ndarray, interpret: bool = False):
    """[B, 16, N] spatial SoA blocks + [N] bits -> marked spatial SoA blocks.

    Fused equivalent of top_triplet_soa -> QIM -> rank1 (the reference's
    DCT/IDCT pair cancels — see module docstring).
    """
    b, sq, n0 = m.shape
    m, n = _pad_lanes(m, 2)
    wm = jnp.pad(wm.reshape(1, -1).astype(jnp.float32), ((0, 0), (0, m.shape[2] - n)))
    scale_arr = jnp.asarray([scale], jnp.float32)
    grid = (b, m.shape[2] // LANES)
    out = pl.pallas_call(
        _embed_kernel,
        out_shape=jax.ShapeDtypeStruct(m.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16, LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m, wm, scale_arr)
    return out[:, :, :n0]


@partial(jax.jit, static_argnames=("interpret",))
def qim_decode_soa(m: jnp.ndarray, scale: float | jnp.ndarray, interpret: bool = False):
    """[B, 16, N] spatial SoA blocks -> [B, N] decoded bits (f32 0/1)."""
    b, sq, n0 = m.shape
    m, n = _pad_lanes(m, 2)
    scale_arr = jnp.asarray([scale], jnp.float32)
    grid = (b, m.shape[2] // LANES)
    out = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, m.shape[2]), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16, LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m, scale_arr)
    return out[:, 0, :n0]


@partial(jax.jit, static_argnames=("interpret",))
def qim_triplet_soa(m: jnp.ndarray, interpret: bool = False):
    """[B, 16, N] spatial SoA blocks -> (s0 [B, N], u [B, 4, N], v [B, 4, N])
    in one fused launch.

    Lets callers that need several QIM deltas from the SAME blocks (e.g. the
    low-link transport's two bit-conditional planes) solve the dominant
    triplet once and assemble each rank-1 delta as cheap XLA elementwise ops.
    """
    b, sq, n0 = m.shape
    m, n = _pad_lanes(m, 2)
    grid = (b, m.shape[2] // LANES)
    out = pl.pallas_call(
        _triplet_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 9, m.shape[2]), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16, LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9, LANES), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m)
    return out[:, 0, :n0], out[:, 1:5, :n0], out[:, 5:9, :n0]

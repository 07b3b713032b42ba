"""Fused Pallas kernels for the whole-frame stages of the flagship codec.

The XLA plane-op chain materializes every lincomb (~200MB of HBM traffic per
1080p frame); these kernels collapse the embed pipeline to three HBM-minimal
passes over planar data:

  ll_from_planes:   u8 planes strip -> U (or any channel) Haar-LL strip
  qim (kernels/qim): LL SoA blocks  -> marked LL SoA blocks
  embed_epilogue:   u8 planes strip + dLL strip -> marked u8 planes strip
                    (color roundtrip + upsampled delta + clip/round in VMEM)

Planar layout [B, 3, H, W] keeps W on the vector lanes.  Grids run over
(batch, 32-row strips); Pallas masks the ragged last strip automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.color import M_BWD, M_FWD, OFF_BWD, OFF_FWD

STRIP = 32  # u8 sublane tile


def _ll_kernel(chan_consts, x_ref, o_ref):
    c0, c1, c2, off = chan_consts
    # Mosaic has no direct u8<->f32 casts; hop through int32.
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [3, STRIP, W]
    cp = c0 * x[0] + c1 * x[1] + c2 * x[2] + off
    ll = (cp[0::2, 0::2] + cp[0::2, 1::2] + cp[1::2, 0::2] + cp[1::2, 1::2]) * 0.5
    o_ref[0] = ll


@partial(jax.jit, static_argnames=("chan", "interpret"))
def ll_from_planes(planes: jnp.ndarray, chan: int = 1, interpret: bool = False):
    """u8 [B, 3, H, W] -> f32 LL band [B, H4/2, W4/2] of one YUV channel."""
    b, _, h, w = planes.shape
    h4, w4 = h // 4 * 4, w // 4 * 4
    x = planes[:, :, :h4, :w4]
    grid = (b, pl.cdiv(h4, STRIP))
    consts = (float(M_FWD[chan, 0]), float(M_FWD[chan, 1]),
              float(M_FWD[chan, 2]), float(OFF_FWD[chan]))
    return pl.pallas_call(
        partial(_ll_kernel, consts),
        out_shape=jax.ShapeDtypeStruct((b, h4 // 2, w4 // 2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, STRIP, w4), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, STRIP // 2, w4 // 2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _epilogue_kernel(consts, x_ref, d_ref, o_ref):
    chan, w4 = consts
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [3, STRIP, W]
    w = x.shape[-1]
    yuv = [
        M_FWD[k, 0] * x[0] + M_FWD[k, 1] * x[1] + M_FWD[k, 2] * x[2] + OFF_FWD[k]
        for k in range(3)
    ]
    du = d_ref[0]  # [STRIP, w4] (pre-upsampled delta, already halved)
    if w4 < w:
        du = jnp.pad(du, ((0, 0), (0, w - w4)))
    yuv[chan] = yuv[chan] + du
    out = [
        M_BWD[k, 0] * (yuv[0] - OFF_BWD[0])
        + M_BWD[k, 1] * (yuv[1] - OFF_BWD[1])
        + M_BWD[k, 2] * (yuv[2] - OFF_BWD[2])
        for k in range(3)
    ]
    o_ref[0] = jnp.round(jnp.clip(jnp.stack(out), 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("chan", "interpret"))
def embed_epilogue_planar(planes: jnp.ndarray, dll: jnp.ndarray, chan: int = 1,
                          interpret: bool = False):
    """u8 planes [B, 3, H, W] + dLL [B, H4/2, W4/2] -> marked u8 planes.

    Computes the cv2-parity color roundtrip with the channel delta
    (idwt of the LL delta = upsample2x2 / 2) folded in, entirely in VMEM.
    Rows beyond H4 (crop remainder) still get the color roundtrip, matching
    the reference's whole-frame cvtColor path.
    """
    b, _, h, w = planes.shape
    h4, w4 = h // 4 * 4, w // 4 * 4
    # upsample the LL delta once in XLA (Mosaic lane-repeat lowers as an
    # unsupported gather); each LL delta spreads as delta/2 over its 2x2 quad
    du = jnp.repeat(jnp.repeat(dll, 2, axis=1), 2, axis=2) * 0.5  # [B, h4, w4]
    pad_rows = pl.cdiv(h, STRIP) * STRIP - du.shape[1]
    if pad_rows > 0:
        du = jnp.pad(du, ((0, 0), (0, pad_rows), (0, 0)))
    grid = (b, pl.cdiv(h, STRIP))
    return pl.pallas_call(
        partial(_epilogue_kernel, (chan, w4)),
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, STRIP, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STRIP, w4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, STRIP, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, du)

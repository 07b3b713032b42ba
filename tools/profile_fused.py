"""Mosaic-level stage profile of the fused flagship embed kernel.

The fused kernel (kernels/fused_embed.py) measures several x over its pure
MXU+HBM floor; XLA-level traces can't attribute time INSIDE one pallas
call.  This peels the kernel: each variant runs the real kernel body up to
stage N, then emits a uint8 output of the correct shape (with a
data-dependent-but-zero i32 term so Mosaic can't dead-code the peeled
stages — u8 vector adds are unsupported, so the dep-add happens in the i32
domain before the final cast).  Successive deltas attribute time per stage
on the real chip.  The kernel body mirrors the no-DCT component-major
layout of kernels/fused_embed.py (r-major R1 rows; component tiles are
slices of the selection outputs; the reference's DCT pair is omitted —
wm/dwt_dct_svd.py docstring).

Run: python tools/profile_fused.py [--iters 64] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfp_tpu.kernels.fused_embed import (
    NBR, STRIP, _consts, padded_width, pick_chunk,
)
from vfp_tpu.kernels.qim import _triplet_core
from vfp_tpu.ops.color import M_BWD, M_FWD, OFF_BWD, OFF_FWD

# "full" runs first as calibration (it is the production kernel verbatim);
# the peeled stages then attribute the cumulative time
STAGES = ["full", "cast", "color", "llr_select", "triplet", "qim", "scatter"]
# side probes (not part of the cumulative chain):
#   unpack — u8->i32 load + i32->u8 emit, NO f32 anywhere: isolates the
#            pack/unpack share of the "cast" stage (cast - unpack = the
#            i32<->f32 converts + round/clip)
#   intmac — unpack + fixed-point i32 color MAC (round(M_FWD * 2^14)):
#            vs "color" tells whether an integer-domain lincomb could beat
#            3x i32->f32 convert + f32 MAC (the integer-epilogue candidate)
SIDE_PROBES = ["unpack", "intmac"]


def _dep_i32(val):
    """Rank-0 i32 term that is always 0 but depends on ``val`` (defeats
    DCE).  Must be a SCALAR: Mosaic cannot broadcast a [1, 1] vector in
    both sublanes and lanes, but vector-scalar adds lower fine."""
    return (jnp.sum(val[:1, :1]) > 1e30).astype(jnp.int32)


def _to_u8(planes_f32, dep=None):
    out = jnp.round(jnp.clip(planes_f32, 0.0, 255.0)).astype(jnp.int32)
    if dep is not None:
        out = out + dep
    return out.astype(jnp.uint8)


def _kernel(static, x_ref, wm_ref, s_ref, st_ref, r1_ref, r1t_ref, o_ref):
    stage, chan, scale, nbh, nbw_real, chunk = static
    j = pl.program_id(1)
    if stage in ("unpack", "intmac"):
        xi = x_ref[0].astype(jnp.int32)  # [3, STRIP, W], values <= 255
        dep = (jnp.sum(xi[0, :1, :1]) > jnp.int32(2**31 - 2)).astype(jnp.int32)
        if stage == "intmac":
            mi = [int(round(float(M_FWD[chan, i]) * (1 << 14))) for i in range(3)]
            cpi = mi[0] * xi[0] + mi[1] * xi[1] + mi[2] * xi[2]
            dep = dep + (jnp.sum(cpi[:1, :1]) > jnp.int32(2**31 - 2)).astype(jnp.int32)
        o_ref[0] = (xi + dep).astype(jnp.uint8)
        return
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)
    w = x.shape[-1]
    n_chunks = w // chunk
    nb = chunk // 8
    nbw = w // 8
    if stage == "cast":
        o_ref[0] = _to_u8(x)
        return

    # production kernel computes ONE forward lincomb (the embed channel);
    # every peeled stage emits _to_u8(x) (+ dep) so the fixed emit cost is
    # identical across stages and deltas attribute the peeled work alone
    cp = M_FWD[chan, 0] * x[0] + M_FWD[chan, 1] * x[1] + M_FWD[chan, 2] * x[2]
    if stage == "color":
        o_ref[0] = _to_u8(x, _dep_i32(cp))
        return

    llr = jnp.dot(r1_ref[:], cp, preferred_element_type=jnp.float32)
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
    if stage == "llr_select":
        o_ref[0] = _to_u8(x, _dep_i32(mc[0]))
        return

    s0, u, v, rows = _triplet_core(
        [mc[c][NBR * r : NBR * (r + 1), :] for r in range(4) for c in range(4)])
    if stage == "triplet":
        o_ref[0] = _to_u8(x, _dep_i32(s0))
        return

    wm = wm_ref[0]
    bcol = jax.lax.broadcasted_iota(jnp.int32, (NBR, nbw), 1)
    brow = jax.lax.broadcasted_iota(jnp.int32, (NBR, nbw), 0)
    s_new = (jnp.floor(s0 / scale) + 0.25 + 0.5 * wm) * scale
    ds = jnp.where((bcol < nbw_real) & (j * NBR + brow < nbh), s_new - s0, 0.0)
    if stage == "qim":
        o_ref[0] = _to_u8(x, _dep_i32(ds))
        return

    dllrows = None
    for c in range(4):
        dc = jnp.concatenate([ds * (u[r] * v[c]) for r in range(4)], axis=0)
        outs = [
            jnp.dot(dc[:, l * nb : (l + 1) * nb], st_ref[c],
                    preferred_element_type=jnp.float32)
            for l in range(n_chunks)
        ]
        contrib = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1)
        dllrows = contrib if dllrows is None else dllrows + contrib
    du = jnp.dot(r1t_ref[:], dllrows, preferred_element_type=jnp.float32)
    if stage == "scatter":
        o_ref[0] = _to_u8(x, _dep_i32(du))
        return

    # delta-identity epilogue, mirroring kernels/fused_embed.py
    for k in range(3):
        mk = float(M_BWD[k, chan])
        if mk == 0.0:
            o_ref[0, k] = x_ref[0, k]
        else:
            o_ref[0, k] = (
                jnp.round(jnp.clip(x[k] + mk * du, 0.0, 255.0))
                .astype(jnp.int32).astype(jnp.uint8)
            )


@partial(jax.jit, static_argnames=("stage", "chan", "scale"))
def peeled_mark(planes, wm2d, stage, scale=15.0, chan=1):
    b, _, h, w = planes.shape
    wp = padded_width(w)
    chunk = pick_chunk(wp)
    nbh, nbw_real = (h // 4 * 4 // 2) // 4, w // 8
    nbw = wp // 8
    if wp != w:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    strips = pl.cdiv(h, STRIP)
    wm3d = jnp.pad(wm2d.astype(jnp.float32),
                   ((0, strips * NBR - nbh), (0, nbw - nbw_real)))
    wm3d = wm3d.reshape(strips, NBR, nbw)
    s, st, r1, r1t = _consts(chunk)
    out = pl.pallas_call(
        partial(_kernel, (stage, chan, float(scale), nbh, nbw_real, chunk)),
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint8),
        grid=(b, strips),
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
    )(planes, wm3d, jnp.asarray(s), jnp.asarray(st), jnp.asarray(r1),
      jnp.asarray(r1t))
    return out if wp == w else out[:, :, :, :w]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8, 8), jnp.float32)))
    print(f"link warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.RandomState(0)
    b, h, w = args.batch, args.height, args.width
    planes = jnp.asarray(rng.randint(0, 256, (b, 3, h, w)), jnp.uint8)
    nbh, nbw = (h // 4 * 4 // 2) // 4, w // 8
    wm2d = jnp.asarray(rng.randint(0, 2, (nbh, nbw)), jnp.float32)

    @partial(jax.jit, static_argnames=("stage", "n"))
    def loop(x, wm, stage, n):
        def body(i, x):
            return peeled_mark(x, wm, stage)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    # Two-point slope: trial(n) wall = call_overhead + n * t_iter, and the
    # relay's per-call overhead is large and VARIABLE (0.02 s to multi-
    # second stalls) — the (n2 - n1) slope of min-of-3 trials cancels it.
    n1, n2 = args.iters // 4, args.iters // 4 + args.iters
    results = {}
    for stage in STAGES + SIDE_PROBES:
        int(loop(planes, wm2d, stage, 2))  # compile + warm
        times = {}
        for n in (n1, n2):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(loop(planes, wm2d, stage, n))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        per_frame_us = (times[n2] - times[n1]) / (args.iters * b) * 1e6
        results[stage] = round(per_frame_us, 1)
        print(f"{stage:>10}: {per_frame_us:8.1f} us/frame "
              f"({b * args.iters / (times[n2] - times[n1]):8.1f} fps)", flush=True)

    print("\ncumulative-stage deltas (us/frame):")
    prev = 0.0
    for stage in STAGES[1:]:
        print(f"{stage:>10}: +{results[stage] - prev:7.1f}")
        prev = results[stage]
    print(f"{'epilogue':>10}: +{results['full'] - prev:7.1f}  (color-back + cast)")
    print("\nside probes (us/frame):")
    print(f"{'unpack':>10}: {results['unpack']:8.1f}  "
          f"(cast - unpack = {results['cast'] - results['unpack']:.1f} of f32 converts)")
    print(f"{'intmac':>10}: {results['intmac']:8.1f}  "
          f"(vs color {results['color']:.1f}: integer MAC replaces converts + f32 MAC)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

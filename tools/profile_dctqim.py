"""Mosaic-level stage profile of the fused DCT-QIM embed kernel.

Same peeled-stage method as tools/profile_fused.py (two-point slope timing,
data-dependent-but-zero emit term to defeat DCE), for
kernels/fused_dct_qim.py.  Each stage runs the REAL kernel helpers
(_select_blocks / _y_masks8 / _u17 / the production constants) up to stage N
and emits a u8 output of the production shape.  Deltas attribute time to:

  cast       u8 -> i32 -> f32 of the 3 input planes
  color      + Y and U channel lincombs
  select     + 8 in-block-column selection matmuls (the MAC-dominant op)
  maskdct    + the block-diagonal component-major Y DCT matmul (k4) alone
  maskchain  + the full-tile luminance/texture where-chain
  qim        + U coefficient w17 matmul + QIM rule
  scatter    + amp selections + the [STRIP, 64] IDCT-basis matmul
  (epilogue = full - scatter: delta-identity color-back + round/clip/cast)

Decision table this feeds (after tools/probe_precision.py):
  select/maskdct dominate & DEFAULT is 3-pass -> flip fast_dots default
  cast dominates -> int-MAC path like the flagship's
  (the mask chain already runs once on full 8-sublane component tiles via
  the k4 block-diagonal restructure)

Run: python tools/profile_dctqim.py [--iters 64] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from vfp_tpu.kernels.fused_dct_qim import (  # noqa: E402
    NBR, STRIP, _consts8, _select_blocks, _u17, _y_dc_mean, _y_masks8,
    fused_dct_qim_mark, padded_width8, pick_chunk8,
)
from vfp_tpu.ops.color import M_FWD, OFF_FWD  # noqa: E402

STAGES = ["cast", "color", "select", "maskdct", "maskchain", "qim", "scatter"]


def _dep_i32(val):
    """Rank-0 i32, always 0, data-dependent (defeats DCE); scalar because
    Mosaic cannot broadcast a [1, 1] vector in both sublanes and lanes."""
    return (jnp.sum(val[:1, :1]) > 1e30).astype(jnp.int32)


def _emit(x_i32, o_ref, dep=None):
    out = x_i32 if dep is None else x_i32 + dep
    o_ref[0] = out.astype(jnp.uint8)


def _kernel(static, x_ref, wm_ref, mean_ref, s_ref, st_ref, k4_ref, w17_ref,
            b2_ref, sum_ref, o_ref):
    stage, alpha, nbh, nbw_real, chunk = static
    j = pl.program_id(1)
    xi = x_ref[0].astype(jnp.int32)
    x = xi.astype(jnp.float32)
    w = x.shape[-1]
    n_chunks = w // chunk
    nbw = w // 8
    if stage == "cast":
        _emit(xi, o_ref, (jnp.sum(x[0, :1, :1]) > 1e30).astype(jnp.int32))
        return
    mean = mean_ref[pl.program_id(0), 0]
    yp = M_FWD[0, 0] * x[0] + M_FWD[0, 1] * x[1] + M_FWD[0, 2] * x[2] + OFF_FWD[0]
    up = M_FWD[1, 0] * x[0] + M_FWD[1, 1] * x[1] + M_FWD[1, 2] * x[2] + OFF_FWD[1]
    if stage == "color":
        _emit(xi, o_ref, _dep_i32(yp) + _dep_i32(up))
        return
    sel = _select_blocks(yp, up, s_ref, n_chunks, chunk)
    if stage == "select":
        _emit(xi, o_ref, _dep_i32(sel[0]) + _dep_i32(sel[7]))
        return
    if stage == "maskdct":
        # the block-diagonal component-major Y DCT matmul alone (mirrors
        # _y_masks8's d, chain skipped)
        ym = jnp.concatenate(
            [sel[ci][16 * m : 16 * m + 16] for m in range(NBR // 2)
             for ci in range(8)], axis=0)
        d = jnp.dot(k4_ref[:], ym, preferred_element_type=jnp.float32)
        _emit(xi, o_ref, _dep_i32(d))
        return
    step = alpha * _y_masks8(sel, k4_ref, sum_ref, mean)
    if stage == "maskchain":
        _emit(xi, o_ref, _dep_i32(step))
        return
    v = _u17(sel, w17_ref)
    wm = wm_ref[0]
    bcol = jax.lax.broadcasted_iota(jnp.int32, (NBR, nbw), 1)
    brow = jax.lax.broadcasted_iota(jnp.int32, (NBR, nbw), 0)
    step2 = step + step
    base = jnp.sign(v) * jnp.floor(jnp.abs(v) / step2) * step2
    v_new = jnp.where(wm == 0.0, base, base + jnp.sign(v) * step)
    amps = jnp.where((bcol < nbw_real) & (j * NBR + brow < nbh), v_new - v, 0.0)
    if stage == "qim":
        _emit(xi, o_ref, _dep_i32(amps))
        return
    amp_sc = []
    for c in range(8):
        outs = [
            jnp.dot(amps[:, l * (chunk // 8) : (l + 1) * (chunk // 8)], st_ref[c],
                    preferred_element_type=jnp.float32)
            for l in range(n_chunks)
        ]
        amp_sc.append(outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=1))
    amp_stack = jnp.concatenate(amp_sc, axis=0)
    du = jnp.dot(b2_ref[:], amp_stack, preferred_element_type=jnp.float32)
    _emit(xi, o_ref, _dep_i32(du))  # stage == "scatter"


@partial(jax.jit, static_argnames=("stage", "alpha", "interpret"))
def peeled_mark(planes, wm2d, stage, alpha=20.0, interpret=False):
    b, _, h, w = planes.shape
    nbh, nbw_real = h // 8, w // 8
    wp = padded_width8(w)
    chunk = pick_chunk8(wp)
    nbw = wp // 8
    strips = pl.cdiv(h, STRIP)
    means = _y_dc_mean(planes, nbh * 8, nbw_real * 8)[:, None]
    if wp != w:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    wm3d = jnp.pad(wm2d.astype(jnp.float32),
                   ((0, strips * NBR - nbh), (0, nbw - nbw_real)))
    wm3d = wm3d.reshape(strips, NBR, nbw)
    s, st, _, _, k2, w17, b2, sumsel = _consts8(chunk)
    out = pl.pallas_call(
        partial(_kernel, (stage, float(alpha), nbh, nbw_real, chunk)),
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint8),
        grid=(b, strips),
        in_specs=[
            pl.BlockSpec((1, 3, STRIP, wp), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBR, nbw), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, chunk, chunk // 8), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, chunk // 8, chunk), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 512), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NBR, 8 * STRIP), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIP, 8 * NBR), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NBR, 512), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, STRIP, wp), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, wm3d, means, jnp.asarray(s), jnp.asarray(st), jnp.asarray(k2),
      jnp.asarray(w17), jnp.asarray(b2), jnp.asarray(sumsel))
    return out if wp == w else out[:, :, :, :w]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8, 8), jnp.float32)))
    print(f"link warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.RandomState(0)
    b, h, w = args.batch, args.height // 8 * 8, args.width // 8 * 8
    planes = jnp.asarray(rng.randint(0, 256, (b, 3, h, w)), jnp.uint8)
    nbh, nbw = h // 8, w // 8
    wm2d = jnp.asarray(rng.randint(0, 2, (nbh, nbw)), jnp.float32)

    @partial(jax.jit, static_argnames=("stage", "n"))
    def loop(x, wm, stage, n):
        def body(i, x):
            if stage == "full":
                return fused_dct_qim_mark(x, wm)
            return peeled_mark(x, wm, stage)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    n1, n2 = args.iters // 4, args.iters // 4 + args.iters
    results = {}
    for stage in ["full"] + STAGES:
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
              f"({b * args.iters / (times[n2] - times[n1]):8.1f} fps)",
              flush=True)

    print("\ncumulative-stage deltas (us/frame):")
    prev = 0.0
    for stage in STAGES:
        print(f"{stage:>10}: +{results[stage] - prev:7.1f}")
        prev = results[stage]
    print(f"{'epilogue':>10}: +{results['full'] - prev:7.1f}"
          "  (delta-identity color-back + cast)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

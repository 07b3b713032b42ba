"""Component floors for the flagship fused embed kernel (VERDICT r5 budget).

Three kernels with the SAME grid/BlockSpecs as fused_mark_planar, each a
prefix of its work:
  1. passthrough: u8 in -> u8 out (pure HBM floor at this block shape)
  2. cast+color:  u8 -> i32 -> f32 lincomb -> round/clip -> u8 (adds the
     full-res VPU cast/lincomb work the r2 per-op profile put at 47%)
  3. the real fused_mark_planar
plus the measured MXU tile-op budget (tools/probe_mxu.py: ~2.8 ns/tile-op,
~158 tile-ops per cell at W=1920 -> ~0.5 us/cell), attributing the measured
frame time to HBM / cast+VPU / MXU / QIM-math.

Run: python tools/probe_flagship_floor.py [batch]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfp_tpu.ops.color import M_BWD, M_FWD
from vfp_tpu.kernels.fused_embed import STRIP


def _passthrough_kernel(x_ref, o_ref):
    for k in range(3):
        o_ref[0, k] = x_ref[0, k]


def _castcolor_kernel(x_ref, o_ref):
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)
    cp = M_FWD[1, 0] * x[0] + M_FWD[1, 1] * x[1] + M_FWD[1, 2] * x[2]
    for k in range(3):
        mk = float(M_BWD[k, 1])
        if mk == 0.0:
            o_ref[0, k] = x_ref[0, k]
        else:
            o_ref[0, k] = (jnp.round(jnp.clip(x[k] + mk * (cp * 1e-9), 0.0, 255.0))
                           .astype(jnp.int32).astype(jnp.uint8))


def run(kern, planes, iters=24):
    b, _, h, w = planes.shape
    strips = pl.cdiv(h, STRIP)
    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(planes.shape, jnp.uint8),
        grid=(b, strips),
        in_specs=[pl.BlockSpec((1, 3, STRIP, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, STRIP, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
    )

    @partial(jax.jit, static_argnums=1)
    def loop(x, n):
        return jnp.sum(jax.lax.fori_loop(
            0, n, lambda i, x: fn(x), x).astype(jnp.int32))

    int(loop(planes, iters))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(planes, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def time_loop(mark, x, iters=24):
    @partial(jax.jit, static_argnums=1)
    def loop(x, n):
        return jnp.sum(jax.lax.fori_loop(
            0, n, lambda i, x: mark(x), x).astype(jnp.int32))

    int(loop(x, iters))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(x, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randint(0, 255, (b, 3, H, W), dtype=np.uint8))
    hwc = jnp.asarray(np.moveaxis(np.asarray(planes), 1, -1).copy())

    # pure-XLA elementwise u8 pass: what the chip streams without Pallas
    t_xla = time_loop(lambda x: x ^ jnp.uint8(1), planes)
    print(f"XLA u8 elementwise (ref):  {t_xla*1e3:7.2f} ms/iter "
          f"({b / t_xla:8.0f} fps, {b*H*W*3*2/t_xla/1e9:5.0f} GB/s)")

    t_pass = run(_passthrough_kernel, planes)
    print(f"passthrough (HBM floor):   {t_pass*1e3:7.2f} ms/iter "
          f"({b / t_pass:8.0f} fps, {b*H*W*3*2/t_pass/1e9:5.0f} GB/s)")
    t_cast = run(_castcolor_kernel, planes)
    print(f"cast+color (+VPU floor):   {t_cast*1e3:7.2f} ms/iter "
          f"({b / t_cast:8.0f} fps)")

    from vfp_tpu.kernels.fused_embed import fused_mark_planar

    wm2d = jnp.asarray(rng.randint(0, 2, (135, 240)), jnp.float32)
    t_mark = time_loop(lambda x: fused_mark_planar(x, wm2d, scale=15.0, chan=1),
                       planes)
    print(f"fused_mark_planar:         {t_mark*1e3:7.2f} ms/iter "
          f"({b / t_mark:8.0f} fps)")

    # the bench suite's exact program: HWC u8 carry through the public API
    # (moveaxis in/out materializes around the Pallas call)
    from vfp_tpu.fingerprint import payload_for_segment
    from vfp_tpu.wm import DwtDctSvd, Shuffler

    codec = DwtDctSvd()
    wm = Shuffler(key=0).generate_wm(
        payload_for_segment(1, 2), codec.wm_capacity((H, W, 3)))
    wmf = jnp.asarray(np.asarray(wm).reshape(-1), jnp.float32)
    t_api = time_loop(lambda x: codec.mark_frames(x, wmf), hwc)
    print(f"mark_frames HWC (suite):   {t_api*1e3:7.2f} ms/iter "
          f"({b / t_api:8.0f} fps)")

    cells = b * pl.cdiv(H, STRIP)
    print(f"attribution per {b}-frame iter: HBM+launch {t_pass*1e3:.2f} ms, "
          f"casts/color/epilogue +{(t_cast-t_pass)*1e3:.2f} ms, "
          f"QIM math (MXU budget {cells * 158 * 2.8e-9 * 1e3:.2f} ms of it) "
          f"+{(t_mark-t_cast)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

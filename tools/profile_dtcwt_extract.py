"""Cumulative-prefix stage attribution for DtcwtKey.extract_frames on chip.

Run: python tools/profile_dtcwt_extract.py [batch] [iters]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def clock(fn, x, iters, label=""):
    @partial(jax.jit, static_argnums=1)
    def loop(x0, n):
        return jnp.sum(
            jax.lax.fori_loop(0, n, lambda i, v: fn(v), x0).astype(jnp.float32))

    float(loop(x, iters))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x, iters))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    print(f"{label:44s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (b, H, W, 3), dtype=np.uint8))

    from vfp_tpu.kernels.dtcwt_level1 import dtcwt_level1_analysis_ll_color
    from vfp_tpu.wm.dtcwt_codecs import DtcwtKey

    codec = DtcwtKey()
    t = codec._t()
    fast = codec.fast_dots
    fr32 = frames.astype(jnp.float32)

    def u8(x):
        return jnp.clip(x, 0, 255).astype(jnp.uint8)

    def carry(x, arr):
        return x + jnp.sum(arr).astype(jnp.float32) * 1e-30

    def p0(x):
        return x + 1.0

    def p1(x):
        ll = dtcwt_level1_analysis_ll_color(u8(x), interpret=False, fast=fast)
        return carry(x, ll)

    def p2(x):
        ll = dtcwt_level1_analysis_ll_color(u8(x), interpret=False, fast=fast)
        m = codec._masks3_kernel(ll[:, 0], zero_guard=True)
        return carry(x, m)

    def p3(x):
        ll = dtcwt_level1_analysis_ll_color(u8(x), interpret=False, fast=fast)
        m = codec._masks3_kernel(ll[:, 0], zero_guard=True)
        u_ll2, _ = t.analysis_qshift(ll[:, 1], lowpass_only=True)
        return carry(x, m) + carry(x, u_ll2) - x

    def p4(x):
        ll = dtcwt_level1_analysis_ll_color(u8(x), interpret=False, fast=fast)
        m = codec._masks3_kernel(ll[:, 0], zero_guard=True)
        u_ll2, _ = t.analysis_qshift(ll[:, 1], lowpass_only=True)
        u_hp3, _ = t.analysis_qshift_hp(u_ll2)
        return carry(x, m) + carry(x, u_hp3) - x

    def p5(x):
        rec = codec.extract_frames(u8(x))
        return carry(x, rec)

    print(f"batch={b} iters={iters} fast={fast}")
    stages = [(p0, "P0 floor"), (p1, "P1 +L1 color (Y+U)"),
              (p2, "P2 +masks kernel"), (p3, "P3 +u qshift_ll"),
              (p4, "P4 +u qshift_hp"), (p5, "P5 full extract (tail)")]
    times = [clock(fn, fr32, iters, lab) for fn, lab in stages]
    print("\nper-stage deltas:")
    for i in range(1, len(times)):
        print(f"  {stages[i][1]:42s} {(times[i]-times[i-1])*1e3:+7.2f} ms")
    print(f"\nfull extract: {b / times[-1]:.1f} fps")


if __name__ == "__main__":
    main()

"""Component timing for the DT-CWT codec path on the real chip.

Times each stage of DtcwtKey.mark_frames @1080p with the on-device
fori_loop + scalar-fetch method (the only honest clock through the axon
relay), to attribute the ~45 ms/batch (B=8) to launches vs compute.

Run: python tools/profile_dtcwt.py [batch]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def clock(fn, x, iters=24, label=""):
    """fn: x -> array of same shape/dtype (so fori_loop can carry it)."""

    @partial(jax.jit, static_argnums=1)
    def loop(x0, n):
        return jnp.sum(
            jax.lax.fori_loop(0, n, lambda i, v: fn(v), x0).astype(jnp.float32)
        )

    float(loop(x, iters))  # compile + warm
    t0 = time.perf_counter()
    float(loop(x, iters))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:42s} {dt * 1e3:8.2f} ms/iter")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (b, H, W, 3), dtype=np.uint8))

    from vfp_tpu.ops.dtcwt import Transform2d
    from vfp_tpu.wm.dtcwt_codecs import DtcwtKey
    from vfp_tpu.kernels.dtcwt_level1 import (
        dtcwt_level1_analysis, dtcwt_qshift_analysis)
    from vfp_tpu.kernels.dtcwt_synthesis import (
        dtcwt_qshift_synthesis, dtcwt_legall_synthesis)

    codec = DtcwtKey()
    wm = jnp.asarray(rng.randint(0, 2, codec.wm_capacity((H, W, 3))), jnp.float32)
    print(f"batch={b}  frame={H}x{W}")

    # full mark (carry float32 frames, cast inside like bench_suite does)
    def mark_step(x):
        m = codec.mark_frames(jnp.clip(x, 0, 255).astype(jnp.uint8), wm)
        return m.astype(jnp.float32)

    dt_full = clock(mark_step, frames.astype(jnp.float32), label="mark_frames (full)")
    print(f"{'':42s} -> {b / dt_full:8.1f} fps")

    def extract_step(x):
        rec = codec.extract_frames(jnp.clip(x, 0, 255).astype(jnp.uint8))
        out = jnp.zeros(x.shape, jnp.float32)
        return out.at[:, : rec.shape[1], : rec.shape[2], 0].set(rec)

    dt_ex = clock(extract_step, frames.astype(jnp.float32), label="extract_frames (full)")
    print(f"{'':42s} -> {b / dt_ex:8.1f} fps")

    # color conversion alone
    from vfp_tpu.ops.color import bgr_to_yuv, yuv_to_bgr

    clock(lambda x: yuv_to_bgr(bgr_to_yuv(x)), frames.astype(jnp.float32),
          label="bgr<->yuv roundtrip")

    # Level-1 analysis kernel (2 channels jointly = 2b planes)
    planes = frames[..., 0].astype(jnp.float32)
    x2b = jnp.concatenate([planes, planes], axis=0)

    def l1(x):
        p = dtcwt_level1_analysis(x)
        # carry: embed the 16 half-res planes back into a same-shape array
        out = jnp.zeros(x.shape, jnp.float32)
        return out.at[:, : H // 2, : W // 2].set(p[:, 0])

    clock(l1, x2b, label=f"L1 analysis kernel ({2 * b} planes)")

    # q-shift level 2 (2b x 4 trees @ 540x960) and level 3 (270x480)
    for lev, (h, w) in ((2, (540, 960)), (3, (270, 480))):
        ll4 = jnp.asarray(rng.rand(2 * b, 4, h, w), jnp.float32)

        def qa(x, _h=h, _w=w):
            p = dtcwt_qshift_analysis(x)
            out = jnp.zeros(x.shape, jnp.float32)
            return out.at[:, :, : _h // 2, : _w // 2].set(p[:, :4])

        clock(qa, ll4, label=f"q-shift analysis L{lev} ({2 * b}x4 @{h}x{w})")

    # synthesis kernels
    for lev, (h, w) in ((3, (272, 480)), (2, (540, 960))):
        pl16 = jnp.asarray(rng.rand(b, 16, h, w), jnp.float32)

        def qs(x, _h=h, _w=w):
            o = dtcwt_qshift_synthesis(x)  # [b, 4, 2h, 2w]
            out = jnp.zeros(x.shape, jnp.float32)
            return out.at[:, :4].set(o[:, :, : _h, : _w])

        clock(qs, pl16, label=f"q-shift synthesis L{lev} ({b}x16 @{h}x{w})")

    pl16 = jnp.asarray(rng.rand(b, 16, 540, 960), jnp.float32)

    def l1s(x):
        o = dtcwt_legall_synthesis(x)  # [b, 1080, 1920]
        out = jnp.zeros(x.shape, jnp.float32)
        return out.at[:, 0].set(o[:, ::2, ::2])

    clock(l1s, pl16, label=f"LeGall synthesis L1 ({b}x16 @540x960)")

    # full forward / inverse via Transform2d
    t = Transform2d()

    def fwd(x):
        pyr = t.forward(x, nlevels=3)
        out = jnp.zeros(x.shape, jnp.float32)
        out = out.at[:, : pyr.lowpass.shape[-2], : pyr.lowpass.shape[-1]].set(pyr.lowpass)
        h3 = pyr.highpasses[2]
        return out.at[:, : h3.shape[1], : h3.shape[2]].add(jnp.abs(h3).sum(-1))

    clock(fwd, x2b, label=f"forward nlevels=3 ({2 * b} planes)")

    def roundtrip(x):
        pyr = t.forward(x, nlevels=3)
        return t.inverse(pyr)

    clock(roundtrip, x2b, label=f"forward+inverse ({2 * b} planes)")

    # empty-loop relay floor
    clock(lambda x: x + 1.0, jnp.zeros((8, 128), jnp.float32),
          label="fori_loop floor (x+1)")


if __name__ == "__main__":
    main()

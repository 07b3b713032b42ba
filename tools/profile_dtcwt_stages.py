"""Cumulative-prefix stage attribution for DtcwtKey.mark_frames on chip.

Times successively longer prefixes of the embed path under the same
on-device fori_loop harness; successive differences attribute device time
per stage with the constant relay-call overhead cancelled (VERDICT r4
item 1: commit the per-launch/per-pass breakdown).

Run: python tools/profile_dtcwt_stages.py [batch] [iters]
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

    float(loop(x, iters))  # compile + warm
    best = min(
        (lambda t0=time.perf_counter(): (float(loop(x, iters)),
                                         time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    dt = best / iters
    print(f"{label:44s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (b, H, W, 3), dtype=np.uint8))

    from vfp_tpu.ops.color import M_BWD
    from vfp_tpu.ops.dtcwt import Transform2d, q2c_magnitudes, c2q_subs
    from vfp_tpu.wm.dtcwt_codecs import DtcwtKey, _corner_replicate
    from vfp_tpu.kernels.dtcwt_level1 import dtcwt_level1_analysis_ll_y

    codec = DtcwtKey()
    wm = jnp.asarray(
        rng.randint(0, 2, codec.wm_capacity((H, W, 3))), jnp.float32)
    ri = codec.wm_hp_device((H, W), np.asarray(wm))
    t = codec._t()
    fast = codec.fast_dots

    def carry(x, arr):
        """Fold a stage result into the f32 carry so no stage is dead-code,
        without perturbing the pixel values (sum * 1e-30 underflows the
        u8 quantization) or adding HBM traffic."""
        return x + jnp.sum(arr).astype(jnp.float32) * 1e-30

    fr32 = frames.astype(jnp.float32)

    def u8(x):
        return jnp.clip(x, 0, 255).astype(jnp.uint8)

    # NOTE: lax.complex must stay inside traced functions — the axon
    # backend cannot materialize complex64 eagerly (poisons the process)

    def p0(x):
        return x + 1.0

    def p1(x):
        ll1 = dtcwt_level1_analysis_ll_y(u8(x), interpret=False, fast=fast)
        return carry(x, ll1)

    def p2(x):
        ll1 = dtcwt_level1_analysis_ll_y(u8(x), interpret=False, fast=fast)
        hp2, _ = t.analysis_qshift_hp(ll1)
        return carry(x, hp2)

    def mask_of(hp2):
        h2, w2 = hp2.shape[-2], hp2.shape[-1]
        shape3 = ((h2 + 1) // 2, (w2 + 1) // 2)
        return codec._masks3_from_mags(q2c_magnitudes(hp2), shape3)

    def p3(x):
        ll1 = dtcwt_level1_analysis_ll_y(u8(x), interpret=False, fast=fast)
        hp2, _ = t.analysis_qshift_hp(ll1)
        return carry(x, mask_of(hp2))

    def delta_subs(hp2):
        masks = mask_of(hp2)
        wm_hp = jax.lax.complex(ri[0], ri[1])
        h3, w3 = masks.shape[1], masks.shape[2]
        wm_plane = _corner_replicate(jnp.moveaxis(wm_hp, -1, 0), (h3, w3))
        wm_plane = jnp.moveaxis(wm_plane, 0, -1)[None]
        delta6 = codec.alpha * masks.astype(wm_plane.dtype) * wm_plane
        return c2q_subs(delta6)

    def p4(x):
        ll1 = dtcwt_level1_analysis_ll_y(u8(x), interpret=False, fast=fast)
        hp2, _ = t.analysis_qshift_hp(ll1)
        return carry(x, delta_subs(hp2))

    def chain(x, upto):
        ll1 = dtcwt_level1_analysis_ll_y(u8(x), interpret=False, fast=fast)
        hp2, s1 = t.analysis_qshift_hp(ll1)
        h2, w2 = hp2.shape[-2], hp2.shape[-1]
        dsubs = delta_subs(hp2)
        d3 = jnp.concatenate(
            [jnp.zeros(dsubs.shape[:-3] + (4,) + dsubs.shape[-2:], dsubs.dtype),
             dsubs], axis=-3)
        dll2 = t.synthesis_qshift(d3)[..., :h2, :w2]
        if upto == 5:
            return dll2
        dll1 = t.synthesis_qshift_ll(dll2)[..., : s1[0], : s1[1]]
        if upto == 6:
            return dll1
        du = t.synthesis_legall_ll(dll1)[..., :H, :W]
        return du

    def p5(x):
        return carry(x, chain(x, 5))

    def p6(x):
        return carry(x, chain(x, 6))

    def p7(x):
        return carry(x, chain(x, 7))

    def p8(x):
        m = codec.mark_frames_hp(u8(x), ri)
        return m.astype(jnp.float32)

    print(f"batch={b} iters={iters} frame={H}x{W} fast_dots={fast}")
    stages = [
        (p0, "P0 carry floor (x+1)"),
        (p1, "P1 +L1 ll_y kernel"),
        (p2, "P2 +qshift_hp L2"),
        (p3, "P3 +mask chain (XLA)"),
        (p4, "P4 +delta subs (XLA)"),
        (p5, "P5 +syn_q L3->L2"),
        (p6, "P6 +syn_q_ll L2->L1"),
        (p7, "P7 +syn_legall_ll L1->px"),
        (p8, "P8 full mark (epilogue)"),
    ]
    times = []
    for fn, label in stages:
        times.append(clock(fn, fr32, iters, label))
    print("\nper-stage deltas (ms/iter, fps-weighted):")
    for i in range(1, len(times)):
        d = (times[i] - times[i - 1]) * 1e3
        print(f"  {stages[i][1]:42s} {d:+7.2f} ms")
    print(f"\nfull mark: {b / times[-1]:.1f} fps (incl. relay floor)")
    print(f"device-only estimate: {b / (times[-1] - times[0]):.1f} fps")


if __name__ == "__main__":
    main()

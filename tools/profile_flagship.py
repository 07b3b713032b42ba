"""Roofline profile for the flagship fused embed/extract kernels on chip.

Times the raw planar kernels (no pipeline, no transport) plus the public
mark_frames path at several batch sizes, and prints a static MXU-pass
budget per strip cell so measured time can be attributed (VERDICT r1
item 6).  Run: python tools/profile_flagship.py [batch]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def clock(fn, x, iters=4, label=""):
    @partial(jax.jit, static_argnums=1)
    def loop(x0, n):
        return jnp.sum(jax.lax.fori_loop(0, n, lambda i, v: fn(v), x0).astype(jnp.float32))

    float(loop(x, iters))
    t0 = time.perf_counter()
    float(loop(x, iters))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def pass_budget(w4: int):
    """Static per-strip MXU pass-group estimate for the embed kernel."""
    from vfp_tpu.kernels.fused_embed import MAX_CHUNK, pick_chunk

    chunk = pick_chunk(w4)
    n_chunks = w4 // chunk
    nb = chunk // 8
    tiles = lambda n: -(-n // 128)
    n_lanes = tiles(w4)
    llr = 1 * 1 * n_lanes                       # r1 [16,32] @ [32,W]
    mc = 4 * n_chunks * tiles(chunk) * tiles(nb)
    dct = 2 * (1 * 1 * tiles(4 * (w4 // 8))) * 6  # BD [64,64] fwd+inv, HIGHEST
    scatter = 4 * n_chunks * tiles(nb) * tiles(chunk)
    du = 1 * 1 * n_lanes
    return dict(chunk=chunk, llr=llr, mc=mc, dct=dct, scatter=scatter, du=du,
                total=llr + mc + dct + scatter + du)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H, W = 1080, 1920
    rng = np.random.RandomState(0)

    from vfp_tpu.kernels.fused_embed import fused_extract_planar, fused_mark_planar
    from vfp_tpu.wm import DwtDctSvd, Shuffler

    print("pass budget per strip cell @1920:", pass_budget(1920))

    planes = jnp.asarray(
        rng.randint(0, 255, (b, 3, H, W), dtype=np.uint8))
    codec = DwtDctSvd()
    nbh, nbw = (H // 8), (W // 8)
    wm2d = jnp.asarray(rng.randint(0, 2, (135, 240)), jnp.float32)

    def mark_step(x):
        out = fused_mark_planar(x, wm2d, scale=15.0, chan=1)
        return out

    dt = clock(mark_step, planes, label=f"fused_mark_planar B={b} @1080p")
    print(f"{'':46s} -> {b / dt:8.1f} fps")

    def ex_step(x):
        bits = fused_extract_planar(x, scale=15.0, chan=1)
        return jnp.where(
            jnp.zeros(x.shape, jnp.uint8) + bits.astype(jnp.uint8)[:, None, : x.shape[2], : x.shape[3]].sum() > 0,
            x, x)

    dt = clock(ex_step, planes, label=f"fused_extract_planar B={b} @1080p")
    print(f"{'':46s} -> {b / dt:8.1f} fps")

    # public API path (frames uint8 HWC)
    frames = jnp.asarray(rng.randint(0, 255, (b, H, W, 3), dtype=np.uint8))
    wm = jnp.asarray(
        Shuffler(key=0).generate_wm(np.array([0, 1, 1, 0, 0, 1, 0, 1]),
                                    codec.wm_capacity((H, W, 3))), jnp.float32)

    def api_step(x):
        return codec.mark_frames(x, wm)

    dt = clock(api_step, frames, label=f"mark_frames API B={b} @1080p")
    print(f"{'':46s} -> {b / dt:8.1f} fps")

    clock(lambda x: x + 1, jnp.zeros((8, 128), jnp.uint8), label="fori_loop floor")


if __name__ == "__main__":
    main()

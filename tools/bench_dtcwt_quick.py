"""Quick chip A/B for DtcwtKey mark/extract @1080p.

Usage: python tools/bench_dtcwt_quick.py [batch] [iters]
Prints mark/extract fps with the same on-device-loop method as
bench_suite.bench_dtcwt_1080p, plus a correctness correlation.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench_suite import u8_carry  # noqa: E402


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    base = rng.randint(0, 200, (b, H // 8, W // 8, 3), dtype=np.uint8)
    frames = jnp.asarray(
        np.repeat(np.repeat(base, 8, 1), 8, 2)
        + rng.randint(0, 40, (b, H, W, 3)).astype(np.uint8))

    from vfp_tpu.wm.dtcwt_codecs import DtcwtKey

    codec = DtcwtKey()
    wm = jnp.asarray(
        rng.randint(0, 2, codec.wm_capacity((H, W, 3))), jnp.float32)

    marked = codec.mark_frames(frames, wm)
    rec = np.asarray(codec.extract_frames(marked))
    corr = float(np.corrcoef(
        rec.reshape(b, -1).mean(0), np.asarray(wm).reshape(-1) * 2 - 1)[0, 1])

    ri = codec.wm_hp_device((H, W), np.asarray(wm))

    @partial(jax.jit, static_argnums=2)
    def loop(x, ri, n):
        return jnp.sum(jax.lax.fori_loop(
            0, n, lambda i, x: codec.mark_frames_hp(x, ri), x).astype(jnp.int32))

    @partial(jax.jit, static_argnums=1)
    def xloop(x, n):
        def body(i, x):
            r = codec.extract_frames(x)
            return u8_carry(x, r)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    int(loop(frames, ri, iters))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(frames, ri, iters))
        best = min(best, time.perf_counter() - t0)
    mark_fps = b * iters / best
    int(xloop(frames, iters))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(xloop(frames, iters))
        best = min(best, time.perf_counter() - t0)
    ext_fps = b * iters / best
    print(f"batch={b} iters={iters} corr={corr:.4f} "
          f"mark={mark_fps:.1f} fps extract={ext_fps:.1f} fps")


if __name__ == "__main__":
    main()

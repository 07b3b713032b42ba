"""8K embed batch sweep on chip (VERDICT r4 item 4: explain/close the 8K
vs 4K pixel-rate droop — 8K never got the batch sweep that bought 4K +150%).

Run: python tools/bench_8k_sweep.py [--extract] [batches...]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench_suite import u8_carry  # noqa: E402


def main():
    argv = sys.argv[1:]
    extract = "--extract" in argv
    res = {"--1080p": (1080, 1920), "--4k": (2160, 3840),
           "--8k": (4320, 7680)}
    H, W = 4320, 7680
    for flag, hw in res.items():
        if flag in argv:
            H, W = hw
    batches = [int(a) for a in argv
               if a != "--extract" and a not in res] or [2, 3, 4]
    from vfp_tpu.fingerprint import payload_for_segment
    from vfp_tpu.wm import DwtDctSvd, Shuffler

    codec = DwtDctSvd()
    rng = np.random.RandomState(0)
    wm = Shuffler(key=0).generate_wm(
        payload_for_segment(1, 2), codec.wm_capacity((H, W, 3)))
    wmf = jnp.asarray(np.asarray(wm).reshape(-1), jnp.float32)

    for b in batches:
        small = rng.rand(b, H // 8, W // 8, 3)
        f = np.repeat(np.repeat(small, 8, 1), 8, 2) * 220 + rng.rand(b, H, W, 3) * 20
        frames = jnp.asarray(np.clip(f, 0, 255).astype(np.uint8))

        if extract:
            @partial(jax.jit, static_argnums=1)
            def loop2(x, n):
                def body(i, x):
                    bits = codec.extract_frames(x)
                    return u8_carry(x, bits)

                return jnp.sum(jax.lax.fori_loop(0, n, body, x)
                               .astype(jnp.int32))

            run = lambda: int(loop2(frames, 32))  # noqa: E731
            passes = 1
        else:
            @partial(jax.jit, static_argnums=2)
            def loop(x, wm, n):
                return jnp.sum(jax.lax.fori_loop(
                    0, n, lambda i, x: codec.mark_frames(x, wm), x)
                    .astype(jnp.int32))

            run = lambda: int(loop(frames, wmf, 32))  # noqa: E731
            passes = 2

        iters = 32
        try:
            run()
        except Exception as e:
            print(f"B={b}: FAILED ({type(e).__name__}: {str(e)[:200]})")
            continue
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        fps = b * iters / best
        print(f"B={b}: {fps:8.1f} fps = {fps * H * W / 1e9:6.2f} Gpix/s "
              f"({fps * H * W * 3 * passes / 1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()

"""A/B chip bench: flagship fused kernels, f32 path vs int_path.

int_path = integer color MAC + integer epilogue (kernels/fused_embed.py):
the only full-res f32 tensors left are cp and du.  If the per-op profile's
47% cast-chain attribution is convert-heavy (see profile_fused.py side
probes), this should show it end-to-end; if unpack-heavy, the two paths
will measure the same and the flag stays off.

Same methodology as bench.py: on-device fori_loop, scalar fetch.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench_suite import u8_carry  # noqa: E402

from vfp_tpu.kernels.fused_embed import (fused_extract_planar,  # noqa: E402
                                         fused_mark_planar)


def main():
    rng = np.random.RandomState(0)
    b, h, w = 32, 1080, 1920
    iters = 96
    planes = jnp.asarray(rng.randint(0, 256, (b, 3, h, w)), jnp.uint8)
    nbh, nbw = (h // 4 * 4 // 2) // 4, w // 8
    wm2d = jnp.asarray(rng.randint(0, 2, (nbh, nbw)), jnp.float32)

    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8, 8), jnp.float32)))
    print(f"link warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    @partial(jax.jit, static_argnames=("ip", "n"))
    def mloop(x, wm, ip, n):
        def body(i, x):
            return fused_mark_planar(x, wm, 15.0, 1, int_path=ip)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    @partial(jax.jit, static_argnames=("ip", "n"))
    def xloop(x, ip, n):
        def body(i, x):
            bits = fused_extract_planar(x, 15.0, 1, int_path=ip)
            return u8_carry(x, bits)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    results = {}
    for ip in (False, True):
        tag = "int" if ip else "f32"
        int(mloop(planes, wm2d, ip, iters))
        t0 = time.perf_counter()
        int(mloop(planes, wm2d, ip, iters))
        mark = b * iters / (time.perf_counter() - t0)
        int(xloop(planes, ip, iters))
        t0 = time.perf_counter()
        int(xloop(planes, ip, iters))
        ext = b * iters / (time.perf_counter() - t0)
        results[tag] = {"mark_fps": round(mark, 1), "extract_fps": round(ext, 1)}
        print(json.dumps({"path": tag, **results[tag]}), flush=True)


if __name__ == "__main__":
    main()

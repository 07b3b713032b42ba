"""A/B chip bench: DT-CWT codecs exact vs fast_dots (single-bf16-pass matmuls).

Same methodology as bench_suite.bench_dtcwt_1080p: on-device fori_loop
(iters >= 32 amortizes the ~25 ms/call relay latency), scalar fetch, u8
clip inside the body.  Prints one JSON line per (codec, mode) with mark and
extract fps plus the decode-quality check (keyed correlation for DtcwtKey).
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

from vfp_tpu.wm.dtcwt_codecs import DtcwtImg, DtcwtKey  # noqa: E402


def natural_frames(rng, b, h, w):
    small = rng.rand(b, h // 8, w // 8, 3)
    f = (np.repeat(np.repeat(small, 8, axis=1), 8, axis=2) * 220
         + rng.rand(b, h, w, 3) * 20)
    return np.clip(f, 0, 255).astype(np.uint8)


def bench(codec, name, b=8, iters=32):
    rng = np.random.RandomState(0)
    frames = jnp.asarray(natural_frames(rng, b, 1080, 1920))
    wm = jnp.asarray(
        rng.randint(0, 2, codec.wm_capacity((1080, 1920, 3))), jnp.float32)

    marked = codec.mark_frames(frames, wm)
    rec = np.asarray(codec.extract_frames(marked))
    corr = float(np.corrcoef(
        rec.reshape(b, -1).mean(0), np.asarray(wm).reshape(-1) * 2 - 1)[0, 1])

    @partial(jax.jit, static_argnums=2)
    def loop(x, wm, n):
        def body(i, x):
            m = codec.mark_frames(jnp.clip(x, 0, 255).astype(jnp.uint8), wm)
            return m.astype(jnp.float32)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    @partial(jax.jit, static_argnums=1)
    def xloop(x, n):
        def body(i, x):
            r = codec.extract_frames(jnp.clip(x, 0, 255).astype(jnp.uint8))
            return x + 0 * jnp.mean(r).astype(jnp.float32)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    x0 = frames.astype(jnp.float32)
    int(loop(x0, wm, iters))
    t0 = time.perf_counter()
    int(loop(x0, wm, iters))
    mark_fps = b * iters / (time.perf_counter() - t0)
    int(xloop(x0, iters))
    t0 = time.perf_counter()
    int(xloop(x0, iters))
    ext_fps = b * iters / (time.perf_counter() - t0)
    print(json.dumps({"codec": name, "mark_fps": round(mark_fps, 1),
                      "extract_fps": round(ext_fps, 1),
                      "corr": round(corr, 4)}), flush=True)
    return mark_fps, ext_fps


def main():
    from vfp_tpu.wm import DctQim

    for fast in (False, True):
        tag = "fast" if fast else "exact"
        bench(DtcwtKey(fast_dots=fast), f"DtcwtKey/{tag}")
        bench(DtcwtImg(fast_dots=fast), f"DtcwtImg/{tag}")
        bench(DctQim(fast_dots=fast), f"DctQim/{tag}", b=16, iters=64)


if __name__ == "__main__":
    main()

"""A/B chip bench: DctQim exact (DEFAULT contract) vs fast_dots (explicit
single-bf16-pass matmuls) on the current component-major fused kernel.

Context (VERDICT r4 item 3): the r4 judge read DESIGN.md's stale
"DCT/IDCT 96 (HIGHEST = 6 passes each)" budget and proposed a 3-pass-exact
split; in fact kernels/fused_dct_qim._dot already runs the backend DEFAULT
contract, which tools/probe_precision.py measured as ONE bf16 pass on this
chip — there is no 6-pass term to cut.  This A/B pins whether the explicit
bf16 rounding (fast=True skips Mosaic's f32->bf16 operand handling) buys
anything on top.

Run: python tools/bench_dctqim_fastdots.py [batch] [iters]
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

from vfp_tpu.wm.dct_qim import DctQim  # noqa: E402


def natural_frames(rng, b, h, w):
    small = rng.rand(b, h // 8, w // 8, 3)
    f = (np.repeat(np.repeat(small, 8, axis=1), 8, axis=2) * 220
         + rng.rand(b, h, w, 3) * 20)
    return np.clip(f, 0, 255).astype(np.uint8)


def bench(fast, b=32, iters=48):
    codec = DctQim(fast_dots=fast)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(natural_frames(rng, b, 1080, 1920))
    wm = jnp.asarray(
        rng.randint(0, 2, codec.wm_capacity((1080, 1920, 3))), jnp.float32)

    marked = codec.mark_frames(frames, wm)
    rec = np.asarray(codec.extract_frames(marked))
    acc = float((rec.reshape(b, -1).round() == np.asarray(wm).reshape(-1))
                .mean())

    @partial(jax.jit, static_argnums=2)
    def loop(x, wm, n):
        def body(i, x):
            return codec.mark_frames(x, wm)  # u8 in -> u8 out carry

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    @partial(jax.jit, static_argnums=1)
    def xloop(x, n):
        def body(i, x):
            r = codec.extract_frames(x)
            return u8_carry(x, r)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))

    int(loop(frames, wm, iters))
    tm = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(frames, wm, iters))
        tm = min(tm, time.perf_counter() - t0)

    int(xloop(marked, iters))
    tx = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(xloop(marked, iters))
        tx = min(tx, time.perf_counter() - t0)

    print(json.dumps({
        "fast_dots": fast,
        "mark_fps": round(b * iters / tm, 1),
        "extract_fps": round(b * iters / tx, 1),
        "roundtrip_bit_accuracy": round(acc, 7),
    }), flush=True)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    for fast in (False, True):
        bench(fast, b=b, iters=iters)


if __name__ == "__main__":
    main()

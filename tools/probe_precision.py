"""Chip probe: what does Mosaic's DEFAULT matmul precision actually do?

docs/DESIGN.md calls DEFAULT "bf16x3-class" in one place while
kernels/dtcwt_level1.dot_exact says "DEFAULT rounds f32 operands to one
bf16 pass" — only one can be right, and the answer decides whether a
single-bf16-pass fast mode for the DctQim kernel has any headroom.

Method: one in-kernel dot of f32 data at DEFAULT / HIGHEST / explicit-bf16,
compared against a float64 host reference.  If DEFAULT error ~ explicit-bf16
error (~2^-8 relative), DEFAULT is one pass; if ~2^-21, it is 3-pass-exact.
Also times a [128,512]x[512,512] loop per mode for the pass-count signal.

Run on chip: python tools/probe_precision.py
"""

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

M, K, N = 128, 512, 512


def _kernel(mode, a_ref, b_ref, o_ref):
    a, b = a_ref[...], b_ref[...]
    if mode == "default":
        o_ref[...] = jnp.dot(a, b, preferred_element_type=jnp.float32)
    elif mode == "highest":
        o_ref[...] = jnp.dot(a, b, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    else:  # explicit single bf16 pass
        o_ref[...] = jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)


def run(mode, a, b):
    fn = pl.pallas_call(
        partial(_kernel, mode),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return np.asarray(jax.jit(fn)(a, b))


def timed(mode, a, b, iters=256):
    @partial(jax.jit, static_argnums=2)
    def loop(a, b, n):
        def body(i, acc):
            fn = pl.pallas_call(
                partial(_kernel, mode),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            return acc + jnp.sum(fn(a + acc * 1e-30, b))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(a, b, iters))  # compile + warm
    t0 = time.perf_counter()
    float(loop(a, b, iters))
    return (time.perf_counter() - t0) / iters * 1e6  # us/dot


def main():
    rng = np.random.RandomState(0)
    a64 = rng.rand(M, K) * 255.0
    b64 = rng.randn(K, N)
    want = a64 @ b64
    a, b = jnp.asarray(a64, jnp.float32), jnp.asarray(b64, jnp.float32)
    scale = np.abs(want).max()
    for mode in ("default", "highest", "bf16"):
        got = run(mode, a, b)
        rel = np.abs(got - want).max() / scale
        us = timed(mode, a, b)
        print(f"{mode:8s}: max rel err {rel:.3e}  ({us:.2f} us/dot)", flush=True)
    print("interpretation: err ~4e-3 -> ONE bf16 pass; ~1e-6 -> 3-pass-exact;"
          " ~1e-7 -> f32/6-pass", flush=True)


if __name__ == "__main__":
    main()

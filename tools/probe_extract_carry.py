"""A/B the extract bench's constant-fold barrier on chip.

The suite's extract loops carry ``x + (0.0 * sum(bits)).astype(u8)`` —
a FULL-FRAME u8 read+write per iteration (two extra HBM passes), so the
"extract fps" ceiling is the carry add, not the decode kernel.  Candidate
replacement: a one-pixel ``dynamic_update_slice`` carry — keeps the data
dependency (x changes every iteration, so XLA cannot hoist the extract out
of the fori_loop) at ~0 traffic, and XLA performs loop-carry DUS in place.

Measures, at B=32 / 1080p, iters=96:
  add    : the current full-frame add barrier
  dus    : one-pixel DUS barrier
  addonly: the barrier alone (no extract) — attributes the add's own cost
Run: python tools/probe_extract_carry.py
"""
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

from bench_suite import natural_frames  # noqa: E402
from vfp_tpu.wm import DwtDctSvd  # noqa: E402

B, H, W, ITERS = 32, 1080, 1920, 96
codec = DwtDctSvd()
rng = np.random.RandomState(0)
frames = jnp.asarray(natural_frames(rng, B, H, W))


@partial(jax.jit, static_argnums=1)
def loop_add(x, n):
    def body(i, x):
        bits = codec.extract_frames(x)
        return x + (0.0 * jnp.sum(bits)).astype(jnp.uint8)

    return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))


@partial(jax.jit, static_argnums=1)
def loop_dus(x, n):
    def body(i, x):
        bits = codec.extract_frames(x)
        pix = (x[:1, :1, :1, :1] + jnp.sum(bits).astype(jnp.uint8)) % 251
        return jax.lax.dynamic_update_slice(x, pix, (0, 0, 0, 0))

    return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))


@partial(jax.jit, static_argnums=1)
def loop_addonly(x, n):
    def body(i, x):
        return x + (0.0 * jnp.sum(x[0, 0, 0].astype(jnp.float32))).astype(jnp.uint8)

    return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.int32))


def run(name, fn):
    int(fn(frames, ITERS))  # compile + warm
    t0 = time.perf_counter()
    int(fn(frames, ITERS))
    dt = time.perf_counter() - t0
    fps = B * ITERS / dt
    print(f"{name:8s} {dt*1e3/ITERS:7.2f} ms/iter  {fps:9.1f} fps  "
          f"read-GB/s {fps*H*W*3/1e9:6.1f}")


for name, fn in [("add", loop_add), ("dus", loop_dus), ("addonly", loop_addonly)]:
    run(name, fn)

"""Pallas DMA-floor experiments for the flagship kernel's block geometry.

tools/probe_flagship_floor.py showed the fused embed kernel is ~82%
launch+DMA-bound: a pure u8 passthrough with the kernel's own BlockSpecs
runs at ~168 GB/s while a plain XLA elementwise u8 pass streams ~241 GB/s
in the same window.  This probe sweeps the levers that only touch the DMA
shape, not the math:

  - STRIP (rows per grid cell): 64 (current) / 128 / 256
  - grid dimension_semantics: default (arbitrary) vs parallel
  - input_output_aliases: in-place update (halves the HBM footprint;
    cannot be used for mark since the source frame is consumed, but
    measures whether separate in+out buffers are what hurts)

Run: python tools/probe_strip.py [batch]
"""

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _passthrough(x_ref, o_ref):
    for k in range(3):
        o_ref[0, k] = x_ref[0, k]


def build(strip, w, shape, parallel=False, alias=False):
    kwargs = {}
    if parallel:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                                 pltpu.GridDimensionSemantics.PARALLEL))
    if alias:
        kwargs["input_output_aliases"] = {0: 0}
    return pl.pallas_call(
        _passthrough,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint8),
        grid=(shape[0], pl.cdiv(shape[2], strip)),
        in_specs=[pl.BlockSpec((1, 3, strip, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, strip, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        **kwargs,
    )


def clock(fn, x, iters=24):
    @partial(jax.jit, static_argnums=1)
    def loop(x, n):
        return jnp.sum(jax.lax.fori_loop(
            0, n, lambda i, x: fn(x), x).astype(jnp.int32))

    int(loop(x, iters))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(x, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    # pre-pay the relay's first device->host fetch before timing anything
    np.asarray(jax.jit(lambda v: v + 1)(jnp.zeros((8, 128), jnp.float32)))
    print("prepaid first fetch", flush=True)
    x = jnp.asarray(rng.randint(0, 255, (b, 3, H, W), dtype=np.uint8))
    gbps = b * H * W * 3 * 2 / 1e9

    for strip in (64, 128, 256):
        for parallel in (False, True):
            dt = clock(build(strip, W, x.shape, parallel=parallel), x)
            print(f"strip={strip:3d} parallel={int(parallel)} alias=0: "
                  f"{dt*1e3:6.2f} ms/iter ({gbps/dt:6.0f} GB/s)", flush=True)
    dt = clock(build(64, W, x.shape, alias=True), x)
    print(f"strip= 64 parallel=0 alias=1: {dt*1e3:6.2f} ms/iter "
          f"({gbps/dt:6.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()

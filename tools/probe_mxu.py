"""Measure MXU tile-op latency + per-grid-cell overhead on the real chip.

Feeds the static pass budgets (DESIGN.md): a Pallas kernel whose cells run
N independent DEFAULT-precision [128,128]@[128,512] dots (= 4 MXU tile-ops
each); sweeping N and the grid size separates per-tile-op time from
per-cell dispatch/DMA overhead by linear fit.

Run: python tools/probe_mxu.py
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_dots: int):
    def kern(a_ref, b_ref, o_ref):
        accs = []
        for i in range(n_dots):
            # independent dots (different constant row slices) so the MXU
            # pipeline stays full; accumulate at the end
            accs.append(jnp.dot(a_ref[i % 4], b_ref[:],
                                preferred_element_type=jnp.float32))
        acc = accs[0]
        for t in accs[1:]:
            acc = acc + t
        o_ref[0] = acc

    return kern


def run(cells: int, n_dots: int, iters: int = 16):
    a = jnp.asarray(np.random.RandomState(0).randn(4, 128, 128), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).randn(128, 512), jnp.float32)

    fn = pl.pallas_call(
        make_kernel(n_dots),
        out_shape=jax.ShapeDtypeStruct((cells, 128, 512), jnp.float32),
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((4, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 512), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, 512), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @partial(jax.jit, static_argnums=2)
    def loop(a, b, n):
        def body(i, c):
            return c + fn(a, b)[0, 0, 0]

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(a, b, iters))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(a, b, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    # grid of (cells, dots): fit t = cells * (ovh + dots*4*t_tile) + launch
    meas = {}
    for cells in (64, 256):
        for nd in (2, 16, 64):
            dt = run(cells, nd)
            meas[(cells, nd)] = dt
            print(f"cells={cells:4d} dots/cell={nd:3d}  {dt*1e3:8.3f} ms "
                  f"({dt/cells/nd*1e9:7.1f} ns/dot)")
    # per-tile-op from the large-N slope at fixed cells
    for cells in (64, 256):
        slope = (meas[(cells, 64)] - meas[(cells, 16)]) / (48 * cells)
        print(f"cells={cells}: {slope*1e9:.1f} ns per [128,128]@[128,512] dot "
              f"= {slope/4*1e9:.1f} ns per 128^3 tile-op")
    # per-cell overhead from the cells slope at small N
    ovh = (meas[(256, 2)] - meas[(64, 2)]) / (256 - 64)
    print(f"per-cell overhead (incl. out-block write): {ovh*1e6:.2f} us")


if __name__ == "__main__":
    main()

"""WORKING prototype: circular-halo strip processing in a Pallas TPU kernel.

This is the pattern a fused multi-stage DT-CWT kernel needs (each strip's
row convolution requires L-1 rows of circular context that BlockSpecs cannot
express): keep the input in ANY/HBM, DMA the strip plus top/bottom circular
halos into VMEM scratch, compute, write the strip block.

Verified EXACT on the v5e chip (5-tap circular vertical conv vs numpy.roll).
Key gotchas discovered:
  * dynamic DMA offsets must be wrapped in pl.multiple_of(..., 8) — Mosaic
    otherwise fails with "cannot prove tile index divisible by tiling (8)";
  * keep one make_async_copy object per transfer and call .start()/.wait()
    on the same object.

Run on the chip: python tools/proto_halo_dma.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, HALO, STRIP = 256, 512, 8, 64


def kernel(x_hbm, o_ref):
    j = pl.program_id(0)

    def body(scratch, sem):
        main = pl.multiple_of(j * STRIP, 8)
        top = pl.multiple_of(jax.lax.rem(j * STRIP - HALO + H, H), 8)
        bot = pl.multiple_of(jax.lax.rem((j + 1) * STRIP, H), 8)
        c0 = pltpu.make_async_copy(
            x_hbm.at[pl.ds(main, STRIP), :], scratch.at[pl.ds(HALO, STRIP), :], sem.at[0])
        c1 = pltpu.make_async_copy(
            x_hbm.at[pl.ds(top, HALO), :], scratch.at[pl.ds(0, HALO), :], sem.at[1])
        c2 = pltpu.make_async_copy(
            x_hbm.at[pl.ds(bot, HALO), :], scratch.at[pl.ds(HALO + STRIP, HALO), :], sem.at[2])
        c0.start(); c1.start(); c2.start()
        c0.wait(); c1.wait(); c2.wait()
        acc = scratch[pl.ds(HALO - 2, STRIP), :] * 0.1
        acc += scratch[pl.ds(HALO - 1, STRIP), :] * 0.2
        acc += scratch[pl.ds(HALO, STRIP), :] * 0.4
        acc += scratch[pl.ds(HALO + 1, STRIP), :] * 0.2
        acc += scratch[pl.ds(HALO + 2, STRIP), :] * 0.1
        o_ref[:] = acc

    pl.run_scoped(body, scratch=pltpu.VMEM((STRIP + 2 * HALO, W), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA((3,)))


@jax.jit
def circ_blur(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        grid=(H // STRIP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((STRIP, W), lambda j: (j, 0), memory_space=pltpu.VMEM),
    )(x)


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    x = rng.rand(H, W).astype(np.float32)
    got = np.asarray(circ_blur(jnp.asarray(x)))
    want = (0.1 * np.roll(x, 2, 0) + 0.2 * np.roll(x, 1, 0) + 0.4 * x
            + 0.2 * np.roll(x, -1, 0) + 0.1 * np.roll(x, -2, 0))
    err = np.abs(got - want).max()
    print("circular-halo DMA kernel max err:", err)
    assert err < 1e-5

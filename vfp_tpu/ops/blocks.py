"""Image <-> non-overlapping block-batch layout transforms.

The reference iterates blocks with a Python double loop (reference:
src/offmark/embed/dwt_dct_svd_encoder.py:32-40); here the whole image is
reshaped once into a [..., Nblocks, blk, blk] batch so per-block math runs as
one vectorized program.  Block scan order matches the reference (row-major
over block grid), which payload indexing depends on.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_blocks(img: jnp.ndarray, blk: int) -> jnp.ndarray:
    """[..., H, W] (H, W multiples of blk) -> [..., (H/blk)*(W/blk), blk, blk]."""
    *lead, h, w = img.shape
    nbh, nbw = h // blk, w // blk
    x = img.reshape(*lead, nbh, blk, nbw, blk)
    x = jnp.swapaxes(x, -3, -2)  # [..., nbh, nbw, blk, blk]
    return x.reshape(*lead, nbh * nbw, blk, blk)


def from_blocks(blocks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`to_blocks`; returns [..., h, w]."""
    *lead, n, blk, _ = blocks.shape
    nbh, nbw = h // blk, w // blk
    x = blocks.reshape(*lead, nbh, nbw, blk, blk)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, h, w)

"""Small filtering helpers matching cv2 semantics used by the DT-CWT codecs."""

from __future__ import annotations

import jax.numpy as jnp


def filter2d_mean2x2(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.filter2D(x, -1, [[1/4,1/4],[1/4,1/4]]) equivalent, batched [..., H, W].

    cv2 anchors an even kernel at (1, 1) with BORDER_REFLECT_101, so
    out[i, j] = mean of x[i-1:i+1, j-1:j+1] with reflect-101 on the top/left
    edge (x[-1] -> x[1]).  (reference: dtcwt_key_encoder.py:32)
    """
    top = x[..., 1:2, :]  # reflect101: row -1 is row 1
    xp = jnp.concatenate([top, x], axis=-2)
    left = xp[..., :, 1:2]
    xp = jnp.concatenate([left, xp], axis=-1)
    return 0.25 * (
        xp[..., :-1, :-1] + xp[..., :-1, 1:] + xp[..., 1:, :-1] + xp[..., 1:, 1:]
    )


def rebin_mean(a: jnp.ndarray, shape) -> jnp.ndarray:
    """Mean-pool [..., H, W] onto `shape`, zero-padding an odd H first
    (reference: dtcwt_key_encoder.py:55-59)."""
    h, w = a.shape[-2], a.shape[-1]
    if h % 2 == 1:
        a = jnp.concatenate([a, jnp.zeros((*a.shape[:-2], 1, w), a.dtype)], axis=-2)
        h += 1
    th, tw = shape
    fh, fw = h // th, w // tw
    a = a.reshape(*a.shape[:-2], th, fh, tw, fw)
    return a.mean(axis=(-3, -1))

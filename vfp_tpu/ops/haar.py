"""Single-level 2-D orthonormal Haar DWT as reshapes + butterflies.

Replaces the reference's ``pywt.dwt2(x, 'haar')`` / ``idwt2`` calls
(reference: src/offmark/embed/dwt_dct_svd_encoder.py:24-26).  pywt's 'haar'
is orthonormal (dec_lo = [1/sqrt(2)] * 2), so for a 2x2 tile [[a, b], [c, d]]:

    LL = (a + b + c + d) / 2        LH = (a - b + c - d) / 2
    HL = (a + b - c - d) / 2        HH = (a - b - c + d) / 2

and the inverse is the same butterfly scaled by 1/2.  Only the LL band is
ever modified by the codecs, so the exact detail-band sign convention is an
internal choice — forward+inverse here is an exact identity (up to f32
rounding), which is what parity requires.

All functions are batched over leading axes and jit/vmap/shard_map friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def haar_dwt2(x: jnp.ndarray):
    """[..., H, W] (H, W even) -> (LL, LH, HL, HH), each [..., H/2, W/2]."""
    a = x[..., 0::2, 0::2]
    b = x[..., 0::2, 1::2]
    c = x[..., 1::2, 0::2]
    d = x[..., 1::2, 1::2]
    ll = (a + b + c + d) * 0.5
    lh = (a - b + c - d) * 0.5
    hl = (a + b - c - d) * 0.5
    hh = (a - b - c + d) * 0.5
    return ll, lh, hl, hh


def haar_idwt2(ll, lh, hl, hh) -> jnp.ndarray:
    """Inverse of :func:`haar_dwt2`; returns [..., H, W]."""
    a = (ll + lh + hl + hh) * 0.5
    b = (ll - lh + hl - hh) * 0.5
    c = (ll + lh - hl - hh) * 0.5
    d = (ll - lh - hl + hh) * 0.5
    *lead, h2, w2 = ll.shape
    out = jnp.stack([jnp.stack([a, b], axis=-1), jnp.stack([c, d], axis=-1)], axis=-2)
    # out: [..., h2, w2, 2(row), 2(col)] -> interleave
    out = out.transpose(*range(len(lead)), -4, -2, -3, -1)
    return out.reshape(*lead, h2 * 2, w2 * 2)

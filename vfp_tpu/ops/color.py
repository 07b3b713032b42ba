"""Exact cv2-compatible float BGR<->YUV conversion as batched matmuls.

The reference pipeline converts uint8 frames to float32 and calls
``cv2.cvtColor(..., COLOR_BGR2YUV)`` / ``COLOR_YUV2BGR`` (reference:
src/offmark/video/embedder.py:34-36, extractor.py:31).  For float inputs cv2
uses the classic BT.601-derived constants with a fixed ``+0.5`` chroma offset
(even for 0..255-ranged floats — a quirk we must reproduce bit-for-bit for
QIM-bin parity):

    Y = 0.299 R + 0.587 G + 0.114 B
    U = 0.492 (B - Y) + 0.5
    V = 0.877 (R - Y) + 0.5

and the (non-exactly-inverse) backward map

    B = Y + 2.032 (U - 0.5)
    G = Y - 0.395 (U - 0.5) - 0.581 (V - 0.5)
    R = Y + 1.140 (V - 0.5)

Both directions are expressed as a single 3x3 matmul + offset over the channel
axis, which XLA fuses with neighbouring elementwise work.  Channel order of
the input array is BGR (index 0 = B) to match cv2's convention; note the
reference feeds ffmpeg *RGB* bytes through the BGR conversion — that swap is
handled at the pipeline layer, not here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

# Forward: yuv = M_FWD @ [B, G, R] + [0, 0.5, 0.5]
_B2Y, _G2Y, _R2Y = 0.114, 0.587, 0.299
_U_SC, _V_SC = 0.492, 0.877

M_FWD = np.array(
    [
        [_B2Y, _G2Y, _R2Y],
        [_U_SC * (1.0 - _B2Y), -_U_SC * _G2Y, -_U_SC * _R2Y],
        [-_V_SC * _B2Y, -_V_SC * _G2Y, _V_SC * (1.0 - _R2Y)],
    ],
    dtype=np.float64,
).astype(np.float32)
OFF_FWD = np.array([0.0, 0.5, 0.5], dtype=np.float32)

# Backward: bgr = M_BWD @ [Y, U - 0.5, V - 0.5]
M_BWD = np.array(
    [
        [1.0, 2.032, 0.0],
        [1.0, -0.395, -0.581],
        [1.0, 0.0, 1.140],
    ],
    dtype=np.float64,
).astype(np.float32)
OFF_BWD = np.array([0.0, 0.5, 0.5], dtype=np.float32)


def bgr_to_yuv(bgr: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] float BGR -> float YUV, exactly as cv2.COLOR_BGR2YUV (float path)."""
    return jnp.einsum("...c,kc->...k", bgr, jnp.asarray(M_FWD), precision=_HI) + jnp.asarray(OFF_FWD)


def yuv_to_bgr(yuv: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] float YUV -> float BGR, exactly as cv2.COLOR_YUV2BGR (float path)."""
    return jnp.einsum("...c,kc->...k", yuv - jnp.asarray(OFF_BWD), jnp.asarray(M_BWD), precision=_HI)

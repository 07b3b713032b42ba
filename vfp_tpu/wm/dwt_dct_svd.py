"""DWT+DCT+SVD QIM watermark codec, batched over frames.

The reference's primary algorithm (used by every HLS/leak workflow):
per channel with a positive scale (default only U), 1-level Haar DWT of the
frame cropped to a multiple of 4, then for every 4x4 block of the LL band
``s0' = (s0 // scale + 0.25 + 0.5 * bit) * scale`` on the dominant singular
value of the block's DCT, reconstruct, inverse DWT (reference:
src/offmark/embed/dwt_dct_svd_encoder.py:19-45).  Extraction reads
``bit = (s0 % scale) > scale / 2`` (reference:
src/offmark/extract/dwt_dct_svd_decoder.py:12-37).

TPU-first redesign: the frame loop and the ~32k-per-frame block loop become a
single jitted program over ``[B, H, W, C]`` — Haar as strided butterflies,
blocked DCT as einsums, the per-block SVD as a batched dominant-triplet power
iteration, and the s0 rewrite as a rank-1 update.  No Python control flow
depends on data; everything vmaps/shards over the batch axis.

Parity quirks reproduced on purpose:
  * capacity is ``H*W // 64`` (reference: dwt_dct_svd_encoder.py:14-17) even
    though only ``(H//4*4 /2 //4) * (W//4*4 /2 //4)`` blocks exist; extra
    watermark entries are ignored on embed and decoded as 0 (the reference
    decoder returns a zero-initialized array of capacity length,
    dwt_dct_svd_decoder.py:14-21).
  * the DWT runs on the ``[:H//4*4, :W//4*4]`` crop; remaining rows/cols pass
    through untouched.
  * LL blocks beyond the 4-aligned region of the (H//4*4)/2-sized band are
    transformed by the DWT round-trip but not modified (exact identity here).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp

from ..ops.color import bgr_to_yuv, yuv_to_bgr
from ..ops.haar import haar_dwt2, haar_idwt2
from ..ops.soa import (
    dct_soa,
    idct_soa,
    image_to_soa,
    rank1_update_soa,
    soa_to_image,
    top_triplet_soa,
)


def block_grid(frame_shape, blk: int = 4):
    """((nbh, nbw), capacity): actual LL block grid and declared capacity."""
    h, w = frame_shape[0], frame_shape[1]
    h4, w4 = h // 4 * 4, w // 4 * 4
    nbh, nbw = (h4 // 2) // blk, (w4 // 2) // blk
    return (nbh, nbw), h * w // 64


@dataclass(frozen=True)
class DwtDctSvd:
    """Functional codec; instances are static (hashable) so methods jit cleanly.

    backend: 'pallas' = fused TPU kernel for the block stage (one HBM
    round-trip), 'xla' = pure jnp ops, 'auto' = pallas on TPU else xla.
    """

    scales: Sequence[float] = (0.0, 15.0, 0.0)
    blk: int = 4
    backend: str = "auto"

    def _use_pallas(self) -> bool:
        import jax

        if self.backend == "auto":
            return jax.default_backend() == "tpu"
        return self.backend == "pallas"

    # -- reference-compatible capacity -------------------------------------
    def wm_capacity(self, frame_shape):
        return (1, frame_shape[0] * frame_shape[1] // 64)

    # -- core per-channel ops (batched [B, H, W], SoA hot path) -------------
    def _embed_channel(self, chan: jnp.ndarray, wm_bits: jnp.ndarray, scale: float):
        b, h, w = chan.shape
        h4, w4 = h // 4 * 4, w // 4 * 4
        (nbh, nbw), _ = block_grid((h, w), self.blk)
        ll, lh, hl, hh = haar_dwt2(chan[:, :h4, :w4])
        region = ll[:, : nbh * self.blk, : nbw * self.blk]
        m = image_to_soa(region, self.blk)  # [B, 16, N] spatial
        bits = wm_bits[: nbh * nbw].astype(jnp.float32)
        if self._use_pallas():
            from ..kernels import qim_embed_soa

            m = qim_embed_soa(m, bits, scale)
        else:
            m = dct_soa(m)
            s0, u, v = top_triplet_soa(m)
            s_new = (jnp.floor(s0 / scale) + 0.25 + 0.5 * bits[None, :]) * scale
            m = idct_soa(rank1_update_soa(m, s_new - s0, u, v))
        region_new = soa_to_image(m, nbh * self.blk, nbw * self.blk, self.blk)
        if (nbh * self.blk, nbw * self.blk) == ll.shape[1:]:
            ll = region_new
        else:
            ll = ll.at[:, : nbh * self.blk, : nbw * self.blk].set(region_new)
        out = haar_idwt2(ll, lh, hl, hh)
        if (h4, w4) == (h, w):
            return out
        return chan.at[:, :h4, :w4].set(out)

    def _decode_channel(self, chan: jnp.ndarray, scale: float) -> jnp.ndarray:
        b, h, w = chan.shape
        h4, w4 = h // 4 * 4, w // 4 * 4
        (nbh, nbw), _ = block_grid((h, w), self.blk)
        ll, *_ = haar_dwt2(chan[:, :h4, :w4])
        m = image_to_soa(ll[:, : nbh * self.blk, : nbw * self.blk], self.blk)
        if self._use_pallas():
            from ..kernels import qim_decode_soa

            return qim_decode_soa(m, scale)
        s0, _, _ = top_triplet_soa(dct_soa(m))
        return (jnp.mod(s0, scale) > scale * 0.5).astype(jnp.float32)  # [B, N]

    # -- YUV-level API -------------------------------------------------------
    def encode_yuv(self, yuv: jnp.ndarray, wm: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] float YUV + [capacity] watermark bits -> marked YUV."""
        wm_flat = wm.reshape(-1)
        out = yuv
        for c, scale in enumerate(self.scales):
            if scale <= 0:
                continue
            out = out.at[..., c].set(self._embed_channel(out[..., c], wm_flat, float(scale)))
        return out

    def decode_yuv(self, yuv: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] float YUV -> [B, capacity] decoded bit plane (f32 0/1).

        Matches the reference's channel-1 output with zero padding up to
        capacity (reference: dwt_dct_svd_decoder.py:14-21).
        """
        b, h, w, _ = yuv.shape
        (nbh, nbw), capacity = block_grid((h, w), self.blk)
        bits = self._decode_channel(yuv[..., 1], float(self.scales[1]))
        pad = capacity - nbh * nbw
        return jnp.pad(bits, ((0, 0), (0, pad)))

    # -- uint8 frame-level API (the jittable hot path) -----------------------
    def mark_frames(self, frames: jnp.ndarray, wm: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] uint8 (reference channel convention) -> marked uint8.

        Reproduces the reference frame path: float32 -> BGR2YUV -> encode ->
        YUV2BGR -> clip(0,255) -> round-half-even -> uint8 (reference:
        video/embedder.py:33-39).

        Fast path for the default U-only embedding: since YUV2BGR is affine,
        updating one channel never needs the modified [B,H,W,3] tensor —
        BGR' = YUV2BGR(yuv) + (u' - u) * M_BWD[:, chan], a rank-1 channel
        correction fused into the elementwise epilogue (bit-identical math:
        f32 add of the same delta).
        """
        from ..ops.color import M_BWD

        active = [c for c, s in enumerate(self.scales) if s > 0]
        yuv = bgr_to_yuv(frames.astype(jnp.float32))
        if len(active) == 1:
            c = active[0]
            chan = yuv[..., c]
            chan_new = self._embed_channel(chan, wm.reshape(-1), float(self.scales[c]))
            base = yuv_to_bgr(yuv)
            marked = base + (chan_new - chan)[..., None] * jnp.asarray(M_BWD[:, c])
        else:
            marked = yuv_to_bgr(self.encode_yuv(yuv, wm))
        return jnp.round(jnp.clip(marked, 0.0, 255.0)).astype(jnp.uint8)

    def extract_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] uint8 -> [B, capacity] decoded watermark plane."""
        return self.decode_yuv(bgr_to_yuv(frames.astype(jnp.float32)))

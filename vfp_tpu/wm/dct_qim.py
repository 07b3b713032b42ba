"""Perceptually-masked DCT-QIM watermark codec, batched over frames.

Reference algorithm (reference: src/offmark/embed/dct_encoder.py:18-102,
extract/dct_decoder.py:12-89): one bit per 8x8 block of the U channel, QIM
on DCT coefficient [2][1] with step = alpha * luminance_mask * texture_mask,
both masks computed per block from the Y channel (DC-based piecewise
luminance model; energy-classification texture model with edge detection).

TPU redesign: blocks in SoA layout [B, 64, N] (block index on lanes), the
8x8 DCT as one 64x64 Kronecker matmul, both perceptual masks as lane-parallel
where-chains — the reference's per-block Python double loop (and its
duplicated mask code in the decoder) becomes one jitted program.

Division quirks preserved: the reference computes l/e and (l+e)/h without
guarding e == 0 / h == 0 (inf/nan comparisons decide the branch); IEEE
semantics in jnp reproduce that.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..ops.color import bgr_to_yuv, yuv_to_bgr, M_BWD
from ..ops.soa import dct_soa, idct_soa, image_to_soa, soa_to_image


def _block_grid8(h: int, w: int):
    return h // 8, w // 8


def luminance_mask(y_soa_dc: jnp.ndarray) -> jnp.ndarray:
    """[B, N] block DC values (orthonormal DCT [0,0]) -> luminance mask.

    (reference: dct_encoder.py:41-67)
    """
    v = y_soa_dc / 8.0
    l_min, l_max, f_max = 90.0, 255.0, 2.0
    mean = jnp.maximum(l_min, jnp.mean(v, axis=1, keepdims=True))
    f_ref = 1.0 + (mean - l_min) * (f_max - 1.0) / (l_max - l_min)
    ramp = 1.0 + (v - mean) / (l_max - mean) * (f_max - f_ref)
    return jnp.where(
        v > mean,
        ramp,
        jnp.where(v < 15.0, 1.25, jnp.where(v < 25.0, 1.125, 1.0)),
    )


def texture_mask(y_dct_soa: jnp.ndarray) -> jnp.ndarray:
    """[B, 64, N] Y-channel DCT blocks (SoA) -> texture mask [B, N].

    (reference: dct_encoder.py:70-102)
    """
    c = jnp.abs(y_dct_soa)

    def at(r, col):
        return c[:, r * 8 + col, :]

    dcl = at(0, 0) + at(0, 1) + at(0, 2) + at(1, 0) + at(1, 1) + at(2, 0)
    eh = jnp.sum(c, axis=1) - dcl
    e = (
        at(3, 0) + at(4, 0) + at(5, 0) + at(6, 0)
        + at(0, 3) + at(0, 4) + at(0, 5) + at(0, 6)
        + at(2, 1) + at(1, 2) + at(2, 2) + at(3, 3)
    )
    h = eh - e
    l = dcl - at(0, 0)
    l_e = l / e
    le_h = (l + e) / h
    a1, b1 = 2.3, 1.6
    a2, b2 = 1.4, 1.1

    def edge(a, b):
        return ((l_e >= a) & (le_h >= b)) | ((l_e >= b) & (le_h >= a)) | (le_h > 4.0)

    edge_val = jnp.where(l + e <= 400.0, 1.125, 1.25)
    ramp = 1.0 + 1.25 * (eh - 290.0) / (1800.0 - 290.0)
    hi = jnp.where(edge(a2, b2), edge_val, ramp)
    lo = jnp.where(edge(a1, b1), edge_val, jnp.where(e + h > 290.0, ramp, 1.0))
    return jnp.where(eh > 125.0, jnp.where(eh > 900.0, hi, lo), 1.0)


@dataclass(frozen=True)
class DctQim:
    """Functional perceptual DCT-QIM codec (reference pairing: Shuffler /
    GrayScale generators, reference tests/test.py:59).

    backend: 'pallas' = single-launch fused kernels, 'xla' = jnp ops,
    'auto' = pallas on TPU for supported shapes.
    """

    alpha: float = 20.0
    blk: int = 8
    # DCT coefficient carrying the bit (reference: dct_encoder.py:33-37)
    coeff_row: int = 2
    coeff_col: int = 1
    backend: str = "auto"
    # single-bf16-pass kernel matmuls (kernels/fused_dct_qim._dot) — fewer
    # MXU passes; decision-equivalent (masks recomputed identically on both
    # sides, coefficient noise << step/2 margin; TestFastDctQim pins it).
    # Chip A/B (tools/bench_fastdots.py, v5e @1080p): 3686->3715 mark /
    # 3307->3312 extract fps — within run noise, so the exact (HIGHEST
    # precision) default stays; the codec is launch/VPU-bound, not MXU-bound.
    fast_dots: bool = False

    def wm_capacity(self, frame_shape):
        return (1, frame_shape[0] * frame_shape[1] // 64)

    def _use_fused(self, frame_shape) -> bool:
        import jax

        from ..kernels.fused_dct_qim import padded_width8

        if self.backend == "xla":
            return False
        if self.backend == "auto" and jax.default_backend() != "tpu":
            return False
        h, w = frame_shape[1], frame_shape[2]
        return (
            (self.coeff_row, self.coeff_col) == (2, 1)
            and h % 8 == 0 and w % 8 == 0
            and padded_width8(w) is not None
        )

    def _masks(self, y: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W] Y channel -> combined step mask [B, N]."""
        y_dct = dct_soa(image_to_soa(y, self.blk))
        return texture_mask(y_dct) * luminance_mask(y_dct[:, 0, :])

    # -- YUV-level API ------------------------------------------------------
    def encode_yuv(self, yuv: jnp.ndarray, wm: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = yuv.shape
        nbh, nbw = _block_grid8(h, w)
        u_new = self._embed_channel(yuv[..., 0], yuv[..., 1], wm)
        return yuv.at[:, : nbh * 8, : nbw * 8, 1].set(u_new)

    def _embed_channel(self, y: jnp.ndarray, u: jnp.ndarray, wm: jnp.ndarray) -> jnp.ndarray:
        """Returns the marked (cropped to 8-aligned) U channel region."""
        b, h, w = u.shape
        nbh, nbw = _block_grid8(h, w)
        h8, w8 = nbh * 8, nbw * 8
        mask = self._masks(y[:, :h8, :w8])  # [B, N]
        m = dct_soa(image_to_soa(u[:, :h8, :w8], self.blk))  # [B, 64, N]
        idx = self.coeff_row * 8 + self.coeff_col
        v = m[:, idx, :]
        bits = wm.reshape(-1)[: nbh * nbw].astype(jnp.float32)[None, :]
        step = self.alpha * mask
        step2 = step + step
        base = jnp.sign(v) * jnp.floor(jnp.abs(v) / step2) * step2
        v_new = jnp.where(bits == 0, base, base + jnp.sign(v) * step)
        m = m.at[:, idx, :].set(v_new)
        return soa_to_image(idct_soa(m), h8, w8, self.blk)

    def decode_yuv(self, yuv: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] -> [B, capacity] decoded bits (f32 0/1, zero-padded
        like the reference's output array, dct_decoder.py:17-27)."""
        b, h, w, _ = yuv.shape
        nbh, nbw = _block_grid8(h, w)
        h8, w8 = nbh * 8, nbw * 8
        mask = self._masks(yuv[:, :h8, :w8, 0])
        m = dct_soa(image_to_soa(yuv[:, :h8, :w8, 1], self.blk))
        idx = self.coeff_row * 8 + self.coeff_col
        step = self.alpha * mask
        bits = (jnp.mod(jnp.round(m[:, idx, :] / step), 2.0) == 1.0).astype(jnp.float32)
        capacity = h * w // 64
        return jnp.pad(bits, ((0, 0), (0, capacity - nbh * nbw)))

    # -- uint8 frame-level API -----------------------------------------------
    def mark_frames(self, frames: jnp.ndarray, wm: jnp.ndarray) -> jnp.ndarray:
        """Same frame path as the flagship codec, with the rank-1 U-channel
        epilogue (YUV2BGR is affine in the U delta)."""
        b, h, w, _ = frames.shape
        nbh, nbw = _block_grid8(h, w)
        h8, w8 = nbh * 8, nbw * 8
        if self._use_fused(frames.shape):
            from ..kernels.fused_dct_qim import fused_dct_qim_mark

            wm2d = wm.reshape(-1)[: nbh * nbw].reshape(nbh, nbw)
            out = fused_dct_qim_mark(jnp.moveaxis(frames, -1, 1), wm2d, self.alpha,
                                     fast=self.fast_dots)
            return jnp.moveaxis(out, 1, -1)
        yuv = bgr_to_yuv(frames.astype(jnp.float32))
        u = yuv[..., 1]
        u_new = self._embed_channel(yuv[..., 0], u, wm)
        delta = jnp.zeros_like(u).at[:, :h8, :w8].set(u_new - u[:, :h8, :w8])
        marked = yuv_to_bgr(yuv) + delta[..., None] * jnp.asarray(M_BWD[:, 1])
        return jnp.round(jnp.clip(marked, 0.0, 255.0)).astype(jnp.uint8)

    def extract_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        if self._use_fused(frames.shape):
            from ..kernels.fused_dct_qim import fused_dct_qim_extract

            b, h, w, _ = frames.shape
            nbh, nbw = _block_grid8(h, w)
            bits = fused_dct_qim_extract(jnp.moveaxis(frames, -1, 1), self.alpha,
                                         fast=self.fast_dots)
            bits = bits.reshape(b, nbh * nbw)
            return jnp.pad(bits, ((0, 0), (0, h * w // 64 - nbh * nbw)))
        return self.decode_yuv(bgr_to_yuv(frames.astype(jnp.float32)))

"""DT-CWT watermark codecs (key/spread-spectrum and image variants).

Reference algorithms (reference: src/offmark/embed/dtcwt_key_encoder.py,
dtcwt_img_encoder.py, extract/dtcwt_key_decoder.py, dtcwt_img_decoder.py):
3-level DT-CWT of the U and Y channels; 6 per-subband perceptual masks from
the 2x2-mean-filtered |level-2 Y highpasses|, rebinned to the level-3 grid
and quantized by ``step``; the watermark's level-1 DT-CWT highpasses are
replicated into the 4 corners of each level-3 subband and added scaled by
``alpha * mask``.  Decoding divides the marked level-3 U highpasses by
``mask * alpha``, folds the 4 corner replicas, and inverts a 1-level pyramid
with a zero lowpass.

The DT-CWT itself is this framework's own (ops/dtcwt.py — see its module
docstring for documented deviations from the ``dtcwt`` package); all codec
math on top mirrors the reference formulas, batched over frames.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.color import bgr_to_yuv, yuv_to_bgr, M_BWD
from ..ops.dtcwt import (Pyramid, Transform2d, c2q_subs, q2c_magnitudes,
                         q2c_planes)
from ..ops.filters import filter2d_mean2x2, rebin_mean


def infer_wm_shape(img_shape):
    """Watermark plane dims for a frame (reference: dtcwt_key_encoder.py:46-53)."""
    h = (((img_shape[0] + 1) // 2 + 1) // 2 + 1) // 2
    w = (((img_shape[1] + 1) // 2 + 1) // 2 + 1) // 2
    return (h + h % 2, w + w % 2)


def _corner_replicate(coeff: jnp.ndarray, shape) -> jnp.ndarray:
    """Place [..., h, w] coeffs into the 4 corners of a [..., H, W] zero plane
    (reference: dtcwt_key_encoder.py:36-42); overlaps add like the
    sequential corner writes? No — the reference *assigns*, so later corners
    overwrite earlier ones where they overlap.  Replicated here with
    assignment order [:h,:w], [-h:,:w], [:h,-w:], [-h:,-w:]."""
    h, w = coeff.shape[-2], coeff.shape[-1]
    out = jnp.zeros((*coeff.shape[:-2], *shape), coeff.dtype)
    out = out.at[..., :h, :w].set(coeff)
    out = out.at[..., -h:, :w].set(coeff)
    out = out.at[..., :h, -w:].set(coeff)
    out = out.at[..., -h:, -w:].set(coeff)
    return out


def _fold_corners(coeff: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Sum the 4 corner [h, w] windows (reference: dtcwt_key_decoder.py:31-33)."""
    return (
        coeff[..., :h, :w]
        + coeff[..., :h, -w:]
        + coeff[..., -h:, :w]
        + coeff[..., -h:, -w:]
    )


# watermark-spectrum device constants, keyed by plane bytes (wm_hp_device)
_WM_HP_CACHE: dict = {}
# object-identity front cache: (fast_dots, hw, id(wm)) -> (wm ref, spectrum).
# Holding the wm reference keeps the id() valid; the hit avoids materializing
# np.asarray(wm) — for a device-resident wm that is a full-plane device->host
# transfer per call (~seconds over the ~1 MB/s relay; ADVICE r4).
_WM_ID_CACHE: dict = {}


@dataclass(frozen=True)
class _DtcwtBase:
    alpha: float = 10.0
    step: float = 5.0
    nlevels: int = 3
    normalize_masks: bool = False  # True for the img variant
    # single-bf16-pass kernel matmuls (3-6x fewer MXU passes; ~2^-9 relative
    # rounding on the tree coefficients — far below the quantized-mask and
    # correlation-threshold noise these codecs decode through).  The codec is
    # a static jit arg, so both modes compile and cache independently.
    # Default ON after the chip A/B (tools/bench_fastdots.py, v5e @1080p):
    # mark 1079->1178 / extract 1114->1270 fps (DtcwtKey), 1081->1186 /
    # 1113->1275 (DtcwtImg), detection correlations identical to 3 decimals.
    fast_dots: bool = True

    def wm_capacity(self, frame_shape):
        return infer_wm_shape(frame_shape)

    def _t(self) -> Transform2d:
        return Transform2d(fast=self.fast_dots)

    # -- watermark spectrum -------------------------------------------------
    def wm_highpass(self, wm: jnp.ndarray) -> jnp.ndarray:
        """Level-1 DT-CWT highpasses of the watermark plane [h, w] -> [h/2, w/2, 6]
        (reference: dtcwt_key_encoder.py:12-15)."""
        t = self._t()
        return t.forward(jnp.asarray(wm, jnp.float32), nlevels=1).highpasses[0]

    def _joint_forward(self, y: jnp.ndarray, u: jnp.ndarray):
        """One batched DT-CWT over [Y; U] (halves transform launches), split
        back into (y_hp2, u_pyramid)."""
        b = y.shape[0]
        t = self._t()
        both = t.forward(jnp.concatenate([y, u], axis=0), nlevels=self.nlevels)
        uc = Pyramid(lowpass=both.lowpass[b:],
                     highpasses=tuple(h[b:] for h in both.highpasses))
        uc._sizes = both._sizes
        return both.highpasses[1][:b], uc

    def _joint_forward_raw(self, y: jnp.ndarray, u: jnp.ndarray):
        """One batched raw-domain DT-CWT over [Y; U]: the codecs only do
        complex math on the (tiny) level-3 grid, so everything stays in the
        kernels' native packed-plane layout — no q2c/c2q or lowpass
        interleave glue on the frame-scale levels (measured ~half the
        codec's device time)."""
        t = self._t()
        planes, sizes = t.forward_raw(
            jnp.concatenate([y, u], axis=0), nlevels=self.nlevels)
        return t, planes, sizes

    def _masks3(self, y: jnp.ndarray, shape3) -> jnp.ndarray:
        """[B, H, W] Y channel -> [B, h3, w3, 6] per-subband masks
        (reference: dtcwt_key_encoder.py:29-33, dtcwt_img_encoder.py:31-35)."""
        t = self._t()
        yc = t.forward(y, nlevels=self.nlevels)
        return self._masks3_from_hp2(yc.highpasses[1], shape3)

    def _masks3_from_hp2(self, hp2c: jnp.ndarray, shape3, zero_guard: bool = False) -> jnp.ndarray:
        hp2 = jnp.abs(hp2c)  # [B, h2, w2, 6]
        hp2 = jnp.moveaxis(hp2, -1, 1)  # [B, 6, h2, w2]
        return self._masks3_from_mags(hp2, shape3, zero_guard)

    def _masks3_kernel(self, y_ll1: jnp.ndarray, zero_guard: bool = False):
        """Fused-kernel mask path: y tree lowpasses [B, 4, h1, w1] ->
        [B, h3, w3, 6] masks in ONE launch (kernels/dtcwt_masks.py), or
        None off the kernel path.  Bit-identical to the XLA chain on every
        tested shape (ceil'd quantization); the ==0 guard and the img
        variant's normalization stay here to preserve the reference's
        operation order (dtcwt_img_decoder.py:25-26)."""
        from ..kernels.dtcwt_masks import dtcwt_qshift_masks, masks_eligible

        h1, w1 = y_ll1.shape[-2], y_ll1.shape[-1]
        if not masks_eligible(h1, w1):
            return None
        mode = self._t()._kernel_mode(h1, w1)
        if mode is None:
            return None
        m = dtcwt_qshift_masks(y_ll1, step=self.step, interpret=mode,
                               fast=self.fast_dots)
        if zero_guard:
            m = jnp.where(m == 0, 0.01, m)
        if self.normalize_masks:
            mx = jnp.max(m, axis=(-2, -1), keepdims=True)
            m = m / jnp.maximum(12.0, mx)
        return jnp.moveaxis(m, 1, -1)  # [B, h3, w3, 6]

    def _chain_mode(self, h: int, w: int):
        """None, or the ``interpret`` flag for the single-pad CHAINED kernel
        path (kernels/dtcwt_level1.py "Chained analysis"): level 1 pads once
        with CHAIN_MARGIN and every later analysis kernel consumes the
        previous kernel's raw output — no intermediate crop/pad copies (the
        r5 stage profile measured those at ~40% of the extract chain)."""
        from ..kernels.dtcwt_level1 import chain_eligible

        if os.environ.get("VFP_DTCWT_NO_CHAIN"):  # A/B escape hatch
            return None
        if self.nlevels != 3 or not chain_eligible(h, w):
            return None
        t = self._t()
        if t.backend == "xla":
            return None
        if t.backend == "pallas":
            return jax.default_backend() != "tpu"
        return False if jax.default_backend() == "tpu" else None

    def _masks3_chain(self, ll1_raw: jnp.ndarray, shape3, mode,
                      zero_guard: bool = False) -> jnp.ndarray:
        """_masks3_kernel on a chained RAW level-1 lowpass layout."""
        from ..kernels.dtcwt_masks import dtcwt_qshift_masks_chain

        m = dtcwt_qshift_masks_chain(ll1_raw, shape3, step=self.step,
                                     interpret=mode, fast=self.fast_dots)
        if zero_guard:
            m = jnp.where(m == 0, 0.01, m)
        if self.normalize_masks:
            mx = jnp.max(m, axis=(-2, -1), keepdims=True)
            m = m / jnp.maximum(12.0, mx)
        return jnp.moveaxis(m, 1, -1)  # [B, h3, w3, 6]

    def _embed_delta_chain(self, y_ll1_raw: jnp.ndarray, wm_hp: jnp.ndarray,
                           hw, mode) -> jnp.ndarray:
        """_embed_delta_from_ll1 on the chained layout: masks come straight
        off the raw level-1 lowpasses; the delta synthesis is unchanged (it
        runs in the valid level-3 domain)."""
        from ..kernels.dtcwt_delta import dtcwt_delta_synthesis

        h, w = hw
        shape3 = (h // 8, w // 8)
        masks = self._masks3_chain(y_ll1_raw, shape3, mode)
        wm_plane = _corner_replicate(jnp.moveaxis(wm_hp, -1, 0), shape3)
        wm_plane = jnp.moveaxis(wm_plane, 0, -1)[None]  # [1, h3, w3, 6]
        delta6 = self.alpha * masks.astype(wm_plane.dtype) * wm_plane
        du = dtcwt_delta_synthesis(c2q_subs(delta6), interpret=mode,
                                   fast=self.fast_dots)
        return du[..., :h, :w]

    def _decode_from_ll1_chain(self, y_ll1_raw: jnp.ndarray,
                               u_ll1_raw: jnp.ndarray, hw, mode) -> jnp.ndarray:
        """_decode_from_ll1 on the chained layout: the U level-2/3 analyses
        consume raw outputs directly (zero intermediate crop/pad copies)."""
        from ..kernels.dtcwt_level1 import (dtcwt_qshift_hp_chain,
                                            dtcwt_qshift_ll_chain)

        t = self._t()
        h, w = hw
        shape3 = (h // 8, w // 8)
        u_ll2 = dtcwt_qshift_ll_chain(u_ll1_raw, interpret=mode,
                                      fast=self.fast_dots)
        u_hp3 = dtcwt_qshift_hp_chain(u_ll2, shape3, interpret=mode,
                                      fast=self.fast_dots)
        masks = self._masks3_chain(y_ll1_raw, shape3, mode, zero_guard=True)
        coeff = q2c_planes(u_hp3) / masks.astype(jnp.complex64) / self.alpha
        hh, ww = (shape3[0] + 1) // 2, (shape3[1] + 1) // 2
        folded = _fold_corners(jnp.moveaxis(coeff, -1, 1), hh, ww)
        folded = jnp.moveaxis(folded, 1, -1)  # [B, hh, ww, 6]
        return t.synthesis_legall_hp(c2q_subs(folded))

    def _masks3_from_mags(self, hp2, shape3, zero_guard: bool = False) -> jnp.ndarray:
        """[B, 6, h2, w2] subband magnitudes -> [B, h3, w3, 6] masks."""
        m = filter2d_mean2x2(hp2)
        m = rebin_mean(m, shape3)
        m = jnp.ceil(m / self.step)
        if zero_guard:
            # decoder-side ==0 -> 0.01 replacement; must run BEFORE the
            # max(12, amax) normalization so flat-luminance coefficients keep
            # the reference's weighting (reference: dtcwt_img_decoder.py:25-26)
            m = jnp.where(m == 0, 0.01, m)
        if self.normalize_masks:
            mx = jnp.max(m, axis=(-2, -1), keepdims=True)
            m = m / jnp.maximum(12.0, mx)
        return jnp.moveaxis(m, 1, -1)  # [B, h3, w3, 6]

    # -- raw-domain embed/decode (the TPU hot path) ---------------------------
    def _embed_channel_raw(self, y: jnp.ndarray, u: jnp.ndarray,
                           wm_hp: jnp.ndarray) -> jnp.ndarray:
        """Same math as _embed_channel in the raw tree domain, via DELTA
        synthesis: the embed delta alpha*mask*wm is independent of the U
        coefficients, and the transform is linear, so

          marked = inverse(forward(u) + delta_pyr) = u + inverse(delta_pyr)

        (exactly, minus the forward/inverse PR error ~2e-7 the full path
        carried).  U is never analyzed at all; the delta pyramid is zero
        everywhere except the level-3 highpasses, so levels 2/1 synthesize
        lowpass-only (4 of 16 planes).  Y runs lowpass-only at level 1 and
        a full level 2 for the masks; level 3 exists only as grid geometry."""
        if self.nlevels != 3:
            return self._embed_channel_raw_generic(y, u, wm_hp)
        t = self._t()
        y_ll1, s0 = t.analysis_level1(y, lowpass_only=True)
        return u + self._embed_delta_from_ll1(y_ll1, wm_hp, s0)

    def _embed_delta_from_ll1(self, y_ll1: jnp.ndarray, wm_hp: jnp.ndarray,
                              s0) -> jnp.ndarray:
        """Y tree lowpasses [B, 4, h1, w1] -> pixel-space U delta [B, H, W]
        (cropped to ``s0``).  The Y level-2 analysis runs highpass-only:
        the mask path never reads its ll band."""
        t = self._t()
        masks = self._masks3_kernel(y_ll1)
        if masks is not None:
            h2, w2 = y_ll1.shape[-2] // 2, y_ll1.shape[-1] // 2
            s1 = (y_ll1.shape[-2], y_ll1.shape[-1])
            shape3 = (masks.shape[1], masks.shape[2])
        else:
            y_hp2, s1 = t.analysis_qshift_hp(y_ll1)
            h2, w2 = y_hp2.shape[-2], y_hp2.shape[-1]
            # level-3 grid geometry (_pad_even rules), without running level 3
            shape3 = ((h2 + 1) // 2, (w2 + 1) // 2)
            masks = self._masks3_from_mags(q2c_magnitudes(y_hp2), shape3)
        wm_plane = _corner_replicate(jnp.moveaxis(wm_hp, -1, 0), shape3)
        wm_plane = jnp.moveaxis(wm_plane, 0, -1)[None]  # [1, h3, w3, 6]
        delta6 = self.alpha * masks.astype(wm_plane.dtype) * wm_plane
        dsubs = c2q_subs(delta6)  # [B, 12, h3, w3]
        # single-launch fused synthesis (kernels/dtcwt_delta.py) when the
        # level geometry is exact (no inter-level crops: every dim even at
        # every level) — one kernel instead of three + the interleave/pad
        # glue between them
        mode = self._delta_mode(shape3)
        if (mode is not None
                and 2 * shape3[0] == h2 and 2 * shape3[1] == w2
                and (2 * h2, 2 * w2) == tuple(s1)):
            from ..kernels.dtcwt_delta import dtcwt_delta_synthesis

            du = dtcwt_delta_synthesis(dsubs, interpret=mode,
                                       fast=self.fast_dots)
            return du[..., : s0[0], : s0[1]]
        d3 = jnp.concatenate(
            [jnp.zeros(dsubs.shape[:-3] + (4,) + dsubs.shape[-2:], dsubs.dtype),
             dsubs], axis=-3)
        dll2 = t.synthesis_qshift(d3)[..., :h2, :w2]
        dll1 = t.synthesis_qshift_ll(dll2)[..., : s1[0], : s1[1]]
        return t.synthesis_legall_ll(dll1)[..., : s0[0], : s0[1]]

    def _delta_mode(self, shape3):
        """None (3-kernel path) or the fused delta-synthesis kernel's
        ``interpret`` flag — mirrors Transform2d._kernel_mode gating."""
        from ..kernels.dtcwt_delta import delta_eligible

        if not delta_eligible(*shape3):
            return None
        t = self._t()
        if t.backend == "xla":
            return None
        if t.backend == "pallas":
            return jax.default_backend() != "tpu"
        return False if jax.default_backend() == "tpu" else None

    def _decode_channel_raw(self, y: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """Decode needs only: Y level-2 subbands (masks) and U level-3
        subbands (coefficients) — every other analysis level runs
        lowpass-only."""
        if self.nlevels != 3:
            return self._decode_channel_raw_generic(y, u)
        b = y.shape[0]
        t = self._t()
        ll1, _ = t.analysis_level1(jnp.concatenate([y, u], axis=0),
                                   lowpass_only=True)
        return self._decode_from_ll1(ll1[:b], ll1[b:])

    def _decode_from_ll1(self, y_ll1: jnp.ndarray, u_ll1: jnp.ndarray) -> jnp.ndarray:
        t = self._t()
        u_ll2, _ = t.analysis_qshift(u_ll1, lowpass_only=True)
        u_hp3, _ = t.analysis_qshift_hp(u_ll2)  # only the subband coeffs used
        shape3 = (u_hp3.shape[-2], u_hp3.shape[-1])
        masks = self._masks3_kernel(y_ll1, zero_guard=True)
        if masks is None or masks.shape[1:3] != shape3:
            y_hp2, _ = t.analysis_qshift_hp(y_ll1)  # masks never read the ll band
            masks = self._masks3_from_mags(q2c_magnitudes(y_hp2), shape3,
                                           zero_guard=True)
        coeff = q2c_planes(u_hp3) / masks.astype(jnp.complex64) / self.alpha
        hh, ww = (shape3[0] + 1) // 2, (shape3[1] + 1) // 2
        folded = _fold_corners(jnp.moveaxis(coeff, -1, 1), hh, ww)
        folded = jnp.moveaxis(folded, 1, -1)  # [B, hh, ww, 6]
        return t.synthesis_legall_hp(c2q_subs(folded))

    def _embed_channel_raw_generic(self, y, u, wm_hp):
        """nlevels != 3 fallback: full joint raw pyramid, no level skipping."""
        b = y.shape[0]
        t, planes, sizes = self._joint_forward_raw(y, u)
        h3 = planes[self.nlevels - 1]
        shape3 = (h3.shape[-2], h3.shape[-1])
        masks = self._masks3_from_mags(q2c_magnitudes(planes[1][:b]), shape3)
        wm_plane = _corner_replicate(jnp.moveaxis(wm_hp, -1, 0), shape3)
        wm_plane = jnp.moveaxis(wm_plane, 0, -1)[None]
        delta6 = self.alpha * masks.astype(wm_plane.dtype) * wm_plane
        dsubs = c2q_subs(delta6)
        u_planes = [p[b:] for p in planes]
        u_planes[self.nlevels - 1] = jnp.concatenate(
            [h3[b:, :4], h3[b:, 4:] + dsubs], axis=-3)
        return t.inverse_raw(u_planes, sizes)

    def _decode_channel_raw_generic(self, y, u):
        b = y.shape[0]
        t, planes, sizes = self._joint_forward_raw(y, u)
        h3 = planes[self.nlevels - 1]
        shape3 = (h3.shape[-2], h3.shape[-1])
        masks = self._masks3_from_mags(q2c_magnitudes(planes[1][:b]), shape3,
                                       zero_guard=True)
        coeff = q2c_planes(h3[b:]) / masks.astype(jnp.complex64) / self.alpha
        hh, ww = (shape3[0] + 1) // 2, (shape3[1] + 1) // 2
        folded = _fold_corners(jnp.moveaxis(coeff, -1, 1), hh, ww)
        folded = jnp.moveaxis(folded, 1, -1)
        return t.synthesis_legall_hp(c2q_subs(folded))

    # -- channel-level embed/decode ------------------------------------------
    def _embed_channel(self, y: jnp.ndarray, u: jnp.ndarray, wm_hp: jnp.ndarray) -> jnp.ndarray:
        t = self._t()
        y_hp2, uc = self._joint_forward(y, u)
        h3 = uc.highpasses[self.nlevels - 1]
        masks = self._masks3_from_hp2(y_hp2, (h3.shape[-3], h3.shape[-2]))
        wm_plane = _corner_replicate(
            jnp.moveaxis(wm_hp, -1, 0), (h3.shape[-3], h3.shape[-2])
        )  # [6, h3, w3]
        wm_plane = jnp.moveaxis(wm_plane, 0, -1)[None]  # [1, h3, w3, 6]
        new_h3 = h3 + self.alpha * masks.astype(h3.dtype) * wm_plane
        highs = tuple(
            new_h3 if lev == self.nlevels - 1 else uc.highpasses[lev]
            for lev in range(self.nlevels)
        )
        pyr = Pyramid(lowpass=uc.lowpass, highpasses=highs)
        pyr._sizes = uc._sizes
        return t.inverse(pyr)

    def _decode_channel(self, y: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        t = self._t()
        y_hp2, uc = self._joint_forward(y, u)
        h3 = uc.highpasses[self.nlevels - 1]
        masks = self._masks3_from_hp2(y_hp2, (h3.shape[-3], h3.shape[-2]),
                                      zero_guard=True)
        coeff = h3 / masks.astype(h3.dtype) / self.alpha
        hh, ww = (h3.shape[-3] + 1) // 2, (h3.shape[-2] + 1) // 2
        folded = _fold_corners(jnp.moveaxis(coeff, -1, 1), hh, ww)  # [B, 6, hh, ww]
        folded = jnp.moveaxis(folded, 1, -1)  # [B, hh, ww, 6]
        low = jnp.zeros((u.shape[0], hh * 2, ww * 2), jnp.float32)
        return t.inverse(Pyramid(lowpass=low, highpasses=(folded,)))

    # -- uint8 frame API -------------------------------------------------------
    # NOTE: whole-function jit is load-bearing on TPU, not just a speedup:
    # the backend cannot materialize complex64 as a program *output*, so the
    # _q2c/_c2q complex intermediates must stay inside one compiled graph.
    def mark_frames(self, frames: jnp.ndarray, wm: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] uint8 + watermark plane [h, w] -> marked uint8.

        Accepts the plane flattened too (pipeline drivers pass 1-D): the
        plane dims are a pure function of the frame shape.

        Eager calls hoist the watermark's level-1 spectrum to a cached
        device constant (wm is fixed across a segment; recomputing it per
        batch was 16% of the 1080p mark wall — r4 stage profile) and run
        the jitted ``mark_frames_hp``.  Under an outer trace (jit/vmap/
        shard_map pass tracers) everything stays in-graph as before.
        """
        if isinstance(frames, jax.core.Tracer) or isinstance(wm, jax.core.Tracer):
            return self._mark_frames_traced(frames, wm)
        return self.mark_frames_hp(frames, self.wm_hp_device(frames.shape[1:3], wm))

    def wm_hp_device(self, hw, wm) -> jnp.ndarray:
        """Cached device-resident (real, imag) f32 stack [2, h1, w1, 6] of
        the watermark plane's level-1 spectrum.  Computed under jit (complex
        stays internal) once per distinct plane; passing the cached device
        array as an argument costs no transfer."""
        import numpy as np

        idk = (self.fast_dots, hw, id(wm))
        id_hit = _WM_ID_CACHE.get(idk)
        if id_hit is not None and id_hit[0] is wm:
            return id_hit[1]
        arr = np.asarray(wm, np.float32)
        ck = (self.fast_dots, hw, arr.shape, hash(arr.tobytes()))
        hit = _WM_HP_CACHE.get(ck)
        if hit is None:
            cap = self.wm_capacity((hw[0], hw[1], 3))

            @jax.jit
            def _ri(w):
                hp = self.wm_highpass(w.reshape(cap))
                return jnp.stack([hp.real, hp.imag])

            hit = _ri(arr)
            if len(_WM_HP_CACHE) > 8:
                _WM_HP_CACHE.clear()
            _WM_HP_CACHE[ck] = hit
        if len(_WM_ID_CACHE) > 8:
            _WM_ID_CACHE.clear()
        _WM_ID_CACHE[idk] = (wm, hit)
        return hit

    @partial(jax.jit, static_argnums=0)
    def mark_frames_hp(self, frames: jnp.ndarray,
                       wm_hp_ri: jnp.ndarray) -> jnp.ndarray:
        """mark_frames with the watermark spectrum precomputed
        (``wm_hp_ri`` = stacked real/imag planes from wm_hp_device)."""
        return self._mark_impl(
            jnp.asarray(frames), jax.lax.complex(wm_hp_ri[0], wm_hp_ri[1]))

    def _mark_frames_traced(self, frames, wm):
        frames = jnp.asarray(frames)
        wm_hp = self.wm_highpass(
            jnp.asarray(wm).reshape(self.wm_capacity(frames.shape[1:]))
        )
        return self._mark_impl(frames, wm_hp)

    def _mark_impl(self, frames: jnp.ndarray, wm_hp: jnp.ndarray) -> jnp.ndarray:
        """Shared mark body.  The output adds only the U-channel delta back
        onto the ORIGINAL pixels (marked = x + du * M_BWD[:, 1]): for
        integer inputs the reference's float color roundtrip is the
        identity after rounding, so reconstructing via
        yuv_to_bgr(bgr_to_yuv(x)) is pure glue."""
        if self.nlevels == 3 and frames.dtype == jnp.uint8:
            # color-fused fast path: the embed delta depends only on the Y
            # lowpass tree (masks) and the watermark, and is added back in
            # pixel space by linearity — so neither a full-resolution
            # bgr_to_yuv pass nor the U channel itself is ever materialized
            h, w = frames.shape[1], frames.shape[2]
            cm = self._chain_mode(h, w)
            if cm is not None and self._delta_mode((h // 8, w // 8)) is not None:
                # single-pad chained layout: level 1 -> masks with zero
                # intermediate crop/pad copies (dtcwt_level1.py chain note)
                from ..kernels.dtcwt_level1 import dtcwt_level1_ll_y_chain

                y_raw = dtcwt_level1_ll_y_chain(frames, interpret=cm,
                                                fast=self.fast_dots)
                du = self._embed_delta_chain(y_raw, wm_hp, (h, w), cm)
                marked = frames.astype(jnp.float32) + du[..., None] * jnp.asarray(
                    M_BWD[:, 1])
                return jnp.round(jnp.clip(marked, 0.0, 255.0)).astype(jnp.uint8)
            mode = Transform2d()._kernel_mode(h, w)
            if mode is not None:
                from ..kernels.dtcwt_level1 import dtcwt_level1_analysis_ll_y

                y_ll1 = dtcwt_level1_analysis_ll_y(frames, interpret=mode,
                                                   fast=self.fast_dots)
                du = self._embed_delta_from_ll1(y_ll1, wm_hp, (h, w))
                marked = frames.astype(jnp.float32) + du[..., None] * jnp.asarray(
                    M_BWD[:, 1])
                return jnp.round(jnp.clip(marked, 0.0, 255.0)).astype(jnp.uint8)
        f32 = frames.astype(jnp.float32)
        yuv = bgr_to_yuv(f32)
        u = yuv[..., 1]
        u_new = self._embed_channel_raw(yuv[..., 0], u, wm_hp)
        marked = f32 + (u_new - u)[..., None] * jnp.asarray(M_BWD[:, 1])
        return jnp.round(jnp.clip(marked, 0.0, 255.0)).astype(jnp.uint8)

    @partial(jax.jit, static_argnums=0)
    def extract_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] uint8 -> recovered watermark planes [B, h, w]."""
        frames = jnp.asarray(frames)
        if self.nlevels == 3 and frames.dtype == jnp.uint8:
            # color-fused level-1 kernel: the channel lincombs never
            # materialize full-resolution f32 planes (decode reads nothing
            # else of them)
            h, w = frames.shape[1], frames.shape[2]
            cm = self._chain_mode(h, w)
            if cm is not None:
                from ..kernels.dtcwt_level1 import dtcwt_level1_ll_color_chain

                ll1 = dtcwt_level1_ll_color_chain(frames, interpret=cm,
                                                  fast=self.fast_dots)
                return self._decode_from_ll1_chain(ll1[:, 0], ll1[:, 1],
                                                   (h, w), cm)
            mode = Transform2d()._kernel_mode(h, w)
            if mode is not None:
                from ..kernels.dtcwt_level1 import dtcwt_level1_analysis_ll_color

                ll1 = dtcwt_level1_analysis_ll_color(frames, interpret=mode,
                                                     fast=self.fast_dots)
                return self._decode_from_ll1(ll1[:, 0], ll1[:, 1])
        yuv = bgr_to_yuv(frames.astype(jnp.float32))
        return self._decode_channel_raw(yuv[..., 0], yuv[..., 1])


@dataclass(frozen=True)
class DtcwtKey(_DtcwtBase):
    """Keyed spread-spectrum variant (reference default_scale=10,
    dtcwt_key_encoder.py:7-10); pairs with CorrShuffler/DeCorrShuffler."""

    alpha: float = 10.0


@dataclass(frozen=True)
class DtcwtImg(_DtcwtBase):
    """Visible-image variant (reference default_scale=1.5 + mask
    normalization, dtcwt_img_encoder.py:9,34); pairs with BlockShuffler."""

    alpha: float = 1.5
    normalize_masks: bool = True

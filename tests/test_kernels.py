"""Pallas kernel parity tests (interpreter mode on CPU; the same kernels
compile to Mosaic on real TPU — exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfp_tpu.kernels import qim_embed_soa, qim_decode_soa
from vfp_tpu.ops.soa import dct_soa, idct_soa, rank1_update_soa, top_triplet_soa

SCALE = 15.0


def _ref_embed(m, wm, scale):
    d = dct_soa(m)
    s0, u, v = top_triplet_soa(d, method="power", iters=4)
    s_new = (jnp.floor(s0 / scale) + 0.25 + 0.5 * wm[None, :]) * scale
    return idct_soa(rank1_update_soa(d, s_new - s0, u, v))


class TestQimKernels:
    def test_embed_matches_xla(self, rng):
        m = jnp.asarray(rng.rand(2, 16, 700).astype(np.float32) * 300)
        wm = jnp.asarray(rng.randint(0, 2, 700).astype(np.float32))
        want = np.asarray(_ref_embed(m, wm, SCALE))
        got = np.asarray(qim_embed_soa(m, wm, SCALE, interpret=True))
        assert got.shape == (2, 16, 700)
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_decode_roundtrip(self, rng):
        m = jnp.asarray(rng.rand(2, 16, 1024).astype(np.float32) * 300)
        wm = jnp.asarray(rng.randint(0, 2, 1024).astype(np.float32))
        marked = qim_embed_soa(m, wm, SCALE, interpret=True)
        bits = np.asarray(qim_decode_soa(marked, SCALE, interpret=True))
        assert (bits == np.asarray(wm)).mean() > 0.999

    def test_zero_blocks(self):
        m = jnp.zeros((1, 16, 512))
        wm = jnp.ones(512)
        out = np.asarray(qim_embed_soa(m, wm, SCALE, interpret=True))
        assert np.all(np.isfinite(out))
        bits = np.asarray(qim_decode_soa(jnp.asarray(out), SCALE, interpret=True))
        assert (bits == 1.0).mean() > 0.999

    def test_triplet_kernel_matches_xla(self, rng):
        """qim_triplet_soa == top_triplet_soa (same squaring count/seed)."""
        from vfp_tpu.kernels import qim_triplet_soa

        m = jnp.asarray(rng.rand(2, 16, 700).astype(np.float32) * 300)
        s0, u, v = qim_triplet_soa(m, interpret=True)
        ws0, wu, wv = top_triplet_soa(m, method="power", iters=4)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(ws0), rtol=2e-5)
        # u/v sign conventions match (same power construction); compare the
        # rank-1 action, which is what the codec consumes
        got = np.asarray(u)[:, :, None, :] * np.asarray(v)[:, None, :, :]
        want = np.asarray(wu)[:, :, None, :] * np.asarray(wv)[:, None, :, :]
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_nonaligned_lanes(self, rng):
        """N not a multiple of the 512-lane tile: padding must not leak."""
        for n in (1, 511, 513, 1000):
            m = jnp.asarray(rng.rand(1, 16, n).astype(np.float32) * 100)
            wm = jnp.asarray(rng.randint(0, 2, n).astype(np.float32))
            out = qim_embed_soa(m, wm, SCALE, interpret=True)
            assert out.shape == (1, 16, n)
            bits = np.asarray(qim_decode_soa(out, SCALE, interpret=True))
            assert (bits == np.asarray(wm)).all(), n


class TestFusedMegaKernels:
    """Single-launch fused embed/extract (interpreter mode; compiled on TPU)."""

    def _setup(self, rng, h=72, w=128):
        from vfp_tpu.wm.dwt_dct_svd import DwtDctSvd, block_grid
        from vfp_tpu.wm import Shuffler
        from vfp_tpu.fingerprint import payload_for_segment

        frames = rng.randint(0, 256, (2, h, w, 3)).astype(np.uint8)
        codec = DwtDctSvd(backend="xla")
        (nbh, nbw), cap = block_grid((h, w), 4)
        payload = payload_for_segment(1, 2)
        wm = np.asarray(
            Shuffler(key=0).generate_wm(payload, codec.wm_capacity((h, w, 3)))
        ).reshape(-1)
        return frames, codec, (nbh, nbw), cap, payload, wm

    def test_mark_matches_xla_and_roundtrips(self, rng):
        from vfp_tpu.kernels.fused_embed import fused_mark_planar
        from vfp_tpu.wm import DeShuffler

        frames, codec, (nbh, nbw), cap, payload, wm = self._setup(rng)
        planes = jnp.asarray(frames.transpose(0, 3, 1, 2))
        wm2d = jnp.asarray(wm[: nbh * nbw].reshape(nbh, nbw), jnp.float32)
        got = np.asarray(fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True))
        got = got.transpose(0, 2, 3, 1)
        want = np.asarray(codec.mark_frames(jnp.asarray(frames), jnp.asarray(wm, jnp.float32)))
        diff = np.abs(got.astype(int) - want.astype(int))
        # borderline s0 may land in a different (parity-equivalent) QIM bin
        assert (diff == 0).mean() > 0.98
        bits = codec.extract_frames(jnp.asarray(got))
        deg = DeShuffler(key=0, threshold="fixed").set_shape(payload.shape)
        rec = np.asarray(deg.degenerate_batch(bits))
        for p in rec:
            np.testing.assert_array_equal(p, payload)

    def test_aliased_mark_keeps_value_semantics(self, rng):
        """input_output_aliases={0:0} must not break eager callers: the
        planes argument survives the call and repeated calls on the same
        array are deterministic (XLA copy-inserts for live operands;
        verified compiled on chip, pinned here in interpret mode)."""
        from vfp_tpu.kernels.fused_embed import fused_mark_planar

        frames, codec, (nbh, nbw), cap, payload, wm = self._setup(rng)
        planes_np = frames.transpose(0, 3, 1, 2).copy()
        planes = jnp.asarray(planes_np)
        wm2d = jnp.asarray(wm[: nbh * nbw].reshape(nbh, nbw), jnp.float32)
        a = np.asarray(fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True))
        assert np.array_equal(np.asarray(planes), planes_np)
        b = np.asarray(fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True))
        assert np.array_equal(a, b)
        assert not np.array_equal(a, planes_np)  # it did mark something

    def test_extract_matches_xla(self, rng):
        from vfp_tpu.kernels.fused_embed import fused_extract_planar, fused_mark_planar

        frames, codec, (nbh, nbw), cap, payload, wm = self._setup(rng)
        planes = jnp.asarray(frames.transpose(0, 3, 1, 2))
        wm2d = jnp.asarray(wm[: nbh * nbw].reshape(nbh, nbw), jnp.float32)
        marked = fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True)
        bits = np.asarray(fused_extract_planar(marked, 15.0, 1, interpret=True))
        assert bits.shape == (2, nbh, nbw)
        want = np.asarray(
            codec.extract_frames(jnp.asarray(np.asarray(marked).transpose(0, 2, 3, 1)))
        )[:, : nbh * nbw].reshape(2, nbh, nbw)
        assert (bits == want).mean() > 0.98

    def test_pick_chunk(self):
        from vfp_tpu.kernels.fused_embed import pick_chunk

        assert pick_chunk(1920) == 480
        assert pick_chunk(128) == 128
        assert 1920 % pick_chunk(1920) == 0

    def test_eligibility_implies_compilable_chunking(self):
        """Regression for the W=856 VMEM compile OOM: every width the codec
        green-lights for the fused kernel must resolve to bounded chunking
        (chunk <= MAX_CHUNK, segments <= MAX_CHUNKS); 107 in-kernel segments
        at chunk=8 blew the 16 MB scoped-VMEM limit on real hardware."""
        from vfp_tpu.kernels.fused_embed import (
            MAX_CHUNK, MAX_CHUNKS, padded_width, pick_chunk)
        from vfp_tpu.wm.dwt_dct_svd import DwtDctSvd

        codec = DwtDctSvd(backend="pallas")
        for w in range(640, 7681, 4):  # every codec-eligible width through 8K
            assert codec._fused_ok((1, 480, w, 3))
            wp = padded_width(w)
            chunk = pick_chunk(wp)
            assert wp >= w and wp % 8 == 0 and wp - w < 520, w
            assert chunk is not None and chunk % 8 == 0, w
            assert chunk <= MAX_CHUNK and wp // chunk <= MAX_CHUNKS, w
        # the exact round-1 failure: 856 has a prime block count (107)
        assert padded_width(856) == 864 and pick_chunk(864) == 432
        # prime-block-count widths in the 5K-8K class (the same failure mode
        # at the top of the supported range): 641*8, 857*8, 953*8
        for w in (5128, 6856, 7624):
            wp = padded_width(w)
            assert wp is not None and wp // pick_chunk(wp) <= MAX_CHUNKS, w

    def test_mark_padded_width_matches_xla(self, rng):
        """W=856 (prime block count) exercises the zero-pad + slice path."""
        from vfp_tpu.kernels.fused_embed import fused_mark_planar, fused_extract_planar
        from vfp_tpu.wm import DeShuffler

        frames, codec, (nbh, nbw), cap, payload, wm = self._setup(rng, h=40, w=856)
        planes = jnp.asarray(frames.transpose(0, 3, 1, 2))
        wm2d = jnp.asarray(wm[: nbh * nbw].reshape(nbh, nbw), jnp.float32)
        got = fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True)
        assert got.shape == planes.shape
        out = np.asarray(got).transpose(0, 2, 3, 1)
        assert np.all(np.isfinite(out.astype(np.float64)))
        want = np.asarray(codec.mark_frames(jnp.asarray(frames), jnp.asarray(wm, jnp.float32)))
        assert (np.abs(out.astype(int) - want.astype(int)) == 0).mean() > 0.98
        bits = np.asarray(fused_extract_planar(got, 15.0, 1, interpret=True))
        assert bits.shape == (2, nbh, nbw)
        deg = DeShuffler(key=0, threshold="fixed").set_shape(payload.shape)
        rec = codec.extract_frames(jnp.asarray(out))
        for p in np.asarray(deg.degenerate_batch(rec)):
            np.testing.assert_array_equal(p, payload)

    @pytest.mark.parametrize("w", [5128, 7680])
    def test_8k_class_widths_mark_and_roundtrip(self, rng, w):
        """The top of the supported width range (8K = 7680, plus a 5K-class
        prime-block-count width that exercises the pad path) must run the
        fused kernel's math, not just pass eligibility — the round-1 W=856
        failure compiled its *chunking* fine and OOM'd in the kernel.
        Interpret mode for math here; the real-TPU compile smoke is the
        embed_8k_chip suite entry."""
        from vfp_tpu.kernels.fused_embed import fused_extract_planar, fused_mark_planar
        from vfp_tpu.wm import DeShuffler

        frames, codec, (nbh, nbw), cap, payload, wm = self._setup(rng, h=16, w=w)
        planes = jnp.asarray(frames.transpose(0, 3, 1, 2))
        wm2d = jnp.asarray(wm[: nbh * nbw].reshape(nbh, nbw), jnp.float32)
        got = fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True)
        assert got.shape == planes.shape
        bits = np.asarray(fused_extract_planar(got, 15.0, 1, interpret=True))
        assert bits.shape == (2, nbh, nbw)
        out = np.asarray(got).transpose(0, 2, 3, 1)
        deg = DeShuffler(key=0, threshold="fixed").set_shape(payload.shape)
        rec = codec.extract_frames(jnp.asarray(out))
        for p in np.asarray(deg.degenerate_batch(rec)):
            np.testing.assert_array_equal(p, payload)

    def test_h_tail_rows_pass_through_unmarked(self, rng):
        """h4 % 8 != 0 (e.g. 270p-class heights): the partial LL block-row
        beyond the grid must be pure color roundtrip, matching the XLA path
        pixel-exactly (the QIM delta there is exactly zero, so no borderline
        -bin tolerance applies)."""
        from vfp_tpu.kernels.fused_embed import fused_mark_planar

        frames, codec, (nbh, nbw), cap, payload, wm = self._setup(rng, h=78, w=128)
        assert 8 * nbh < 78 // 4 * 4  # tail rows exist inside the DWT crop
        planes = jnp.asarray(frames.transpose(0, 3, 1, 2))
        wm2d = jnp.asarray(wm[: nbh * nbw].reshape(nbh, nbw), jnp.float32)
        got = np.asarray(
            fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True)
        ).transpose(0, 2, 3, 1)
        want = np.asarray(codec.mark_frames(jnp.asarray(frames), jnp.asarray(wm, jnp.float32)))
        np.testing.assert_array_equal(got[:, 8 * nbh :], want[:, 8 * nbh :])


class TestDtcwtKernels:
    """Fused DT-CWT analysis kernels (interpret mode) vs the XLA transform."""

    def test_level1_matches_ops(self):
        import numpy as np
        import jax.numpy as jnp
        from vfp_tpu.kernels.dtcwt_level1 import dtcwt_level1_analysis
        from vfp_tpu.ops.dtcwt import _analysis2d
        from vfp_tpu.ops import dtcwt_coeffs as C

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(2, 72, 136).astype(np.float32) * 255)
        out = np.asarray(dtcwt_level1_analysis(x, interpret=True))
        for ci, (rt, ct) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            ll, lh, hl, hh = _analysis2d(x, C.LEGALL_H0, C.LEGALL_H1, rt, ct)
            for band, want in enumerate((ll, lh, hl, hh)):
                np.testing.assert_allclose(
                    out[:, band * 4 + ci], np.asarray(want), atol=2e-3)

    def test_qshift_matches_ops(self):
        import numpy as np
        import jax.numpy as jnp
        from vfp_tpu.kernels.dtcwt_level1 import dtcwt_qshift_analysis
        from vfp_tpu.ops.dtcwt import down2, _along_rows
        from vfp_tpu.ops import dtcwt_coeffs as C

        rng = np.random.RandomState(4)
        ll4 = jnp.asarray(rng.rand(2, 4, 72, 136).astype(np.float32) * 255)
        out = np.asarray(dtcwt_qshift_analysis(ll4, interpret=True))
        A = (C.QSHIFT_H0A, C.QSHIFT_H1A)
        B = (C.QSHIFT_H0B, C.QSHIFT_H1B)
        for ci, (rt, ct) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            xi = ll4[:, ci]
            h0r, h1r = A if rt == 0 else B
            h0c, h1c = A if ct == 0 else B
            lo = _along_rows(down2, xi, h0r, 0)
            hi = _along_rows(down2, xi, h1r, 0)
            wants = (down2(lo, h0c, 0), down2(lo, h1c, 0),
                     down2(hi, h0c, 0), down2(hi, h1c, 0))
            for band, want in enumerate(wants):
                np.testing.assert_allclose(
                    out[:, band * 4 + ci], np.asarray(want), atol=2e-3)

    def test_qshift_hp_matches_full(self):
        """Highpass-only q-shift kernel == planes 4: of the full kernel."""
        import numpy as np
        import jax.numpy as jnp
        from vfp_tpu.kernels.dtcwt_level1 import (dtcwt_qshift_analysis,
                                                  dtcwt_qshift_analysis_hp)

        rng = np.random.RandomState(6)
        ll4 = jnp.asarray(rng.rand(2, 4, 72, 136).astype(np.float32) * 255)
        full = np.asarray(dtcwt_qshift_analysis(ll4, interpret=True))
        hp = np.asarray(dtcwt_qshift_analysis_hp(ll4, interpret=True))
        assert hp.shape == (2, 12, 36, 68)
        np.testing.assert_allclose(hp, full[:, 4:], atol=1e-5)

    def test_level1_ll_y_matches_color(self):
        """Y-only color-fused L1 kernel == channel 0 of the 2-channel one."""
        import numpy as np
        import jax.numpy as jnp
        from vfp_tpu.kernels.dtcwt_level1 import (
            dtcwt_level1_analysis_ll_color, dtcwt_level1_analysis_ll_y)

        rng = np.random.RandomState(7)
        frames = jnp.asarray(rng.randint(0, 256, (2, 72, 136, 3)), jnp.uint8)
        both = np.asarray(dtcwt_level1_analysis_ll_color(frames, interpret=True))
        y = np.asarray(dtcwt_level1_analysis_ll_y(frames, interpret=True))
        assert y.shape == (2, 4, 36, 68)
        np.testing.assert_allclose(y, both[:, 0], atol=1e-5)

    def test_legall_synthesis_hp_matches_zero_ll(self):
        """hp LeGall synthesis == full synthesis with explicit zero ll."""
        import numpy as np
        import jax.numpy as jnp
        from vfp_tpu.kernels.dtcwt_synthesis import (
            dtcwt_legall_synthesis, dtcwt_legall_synthesis_hp)

        rng = np.random.RandomState(8)
        subs = jnp.asarray(rng.randn(2, 12, 72, 136).astype(np.float32))
        full_in = jnp.concatenate(
            [jnp.zeros((2, 4, 72, 136), jnp.float32), subs], axis=1)
        want = np.asarray(dtcwt_legall_synthesis(full_in, interpret=True))
        got = np.asarray(dtcwt_legall_synthesis_hp(subs, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_transform2d_pallas_backend_matches_xla(self):
        import numpy as np
        import jax.numpy as jnp
        from vfp_tpu.ops.dtcwt import Transform2d

        rng = np.random.RandomState(5)
        # odd dims exercise _pad_even + the wrap-pad alignment path; the
        # final level (w=60 < 128) falls back to XLA mid-pyramid.
        x = jnp.asarray(rng.rand(135, 240).astype(np.float32) * 255)
        p_x = Transform2d(backend="xla").forward(x, nlevels=3)
        p_k = Transform2d(backend="pallas").forward(x, nlevels=3)
        np.testing.assert_allclose(np.asarray(p_x.lowpass),
                                   np.asarray(p_k.lowpass), atol=5e-3)
        for a, b in zip(p_x.highpasses, p_k.highpasses):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
        # and PR still holds through the kernel forward
        rec = Transform2d(backend="xla").inverse(p_k)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-2)

    def test_synthesis_kernels_match_ops(self):
        import numpy as np
        import jax.numpy as jnp
        from vfp_tpu.kernels.dtcwt_synthesis import (
            dtcwt_legall_synthesis, dtcwt_qshift_synthesis)
        from vfp_tpu.ops.dtcwt import up2, _along_rows, _synthesis2d
        from vfp_tpu.ops import dtcwt_coeffs as C

        rng = np.random.RandomState(6)
        planes = jnp.asarray(rng.randn(2, 16, 68, 136).astype(np.float32))
        trees = ((0, 0), (0, 1), (1, 0), (1, 1))
        out = np.asarray(dtcwt_qshift_synthesis(planes, interpret=True))
        for ci, (rt, ct) in enumerate(trees):
            ll, lh, hl, hh = (planes[:, b * 4 + ci] for b in range(4))
            g0c, g1c = ((C.QSHIFT_G0A, C.QSHIFT_G1A) if ct == 0
                        else (C.QSHIFT_G0B, C.QSHIFT_G1B))
            g0r, g1r = ((C.QSHIFT_G0A, C.QSHIFT_G1A) if rt == 0
                        else (C.QSHIFT_G0B, C.QSHIFT_G1B))
            lo = up2(ll, g0c, 0) + up2(lh, g1c, 0)
            hi = up2(hl, g0c, 0) + up2(hh, g1c, 0)
            lo = jnp.roll(lo, C.QSHIFT_ROLL_A, axis=-1)
            hi = jnp.roll(hi, C.QSHIFT_ROLL_A, axis=-1)
            x = _along_rows(up2, lo, g0r, 0) + _along_rows(up2, hi, g1r, 0)
            want = np.asarray(jnp.roll(x, C.QSHIFT_ROLL_A, axis=-2))
            np.testing.assert_allclose(out[:, ci], want, atol=1e-4)
        out1 = np.asarray(dtcwt_legall_synthesis(planes, interpret=True))
        acc = 0.0
        for ci, (rt, ct) in enumerate(trees):
            ll, lh, hl, hh = (planes[:, b * 4 + ci] for b in range(4))
            acc = acc + _synthesis2d(ll, lh, hl, hh, C.LEGALL_G0, C.LEGALL_G1,
                                     rt, ct, C.LEGALL_ROLL, C.LEGALL_ROLL)
        np.testing.assert_allclose(out1, np.asarray(acc * 0.25), atol=1e-4)

    def test_transform2d_pallas_perfect_reconstruction(self):
        import numpy as np
        import jax.numpy as jnp
        from vfp_tpu.ops.dtcwt import Transform2d

        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.rand(270, 480).astype(np.float32) * 255)
        t = Transform2d(backend="pallas")
        rec = t.inverse(t.forward(x, nlevels=3))
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-2)


class TestIntPath:
    """int_path=True: integer color MAC (2^14 fixed point, exact f32 cast)
    + integer epilogue (2^20 combined fixed point).  The only full-res f32
    tensors left are cp and du — the cast-chain reduction candidate from the
    per-op profile.  Decode decisions must be identical; marked pixels may
    differ from the f32 path only in the documented borderline classes
    (.5-rounding ties, parity-equivalent QIM bins)."""

    def test_mark_extract_match_f32_path(self, rng):
        from vfp_tpu.kernels.fused_embed import (fused_extract_planar,
                                                 fused_mark_planar)
        from vfp_tpu.fingerprint import payload_for_segment
        from vfp_tpu.wm import DeShuffler, DwtDctSvd, Shuffler
        from test_dwt_dct_svd import natural_frames

        codec = DwtDctSvd()
        h, w = 78, 128  # h tail rows exercise the bit-exact passthrough
        frames = natural_frames(rng, 2, h, w)
        cap = codec.wm_capacity((h, w, 3))
        payload = payload_for_segment(1, 2)
        wm = np.asarray(Shuffler(key=0).generate_wm(payload, cap)).reshape(-1)
        nbh, nbw = (h // 4 * 4 // 2) // 4, (w // 4 * 4) // 8
        planes = jnp.asarray(frames.transpose(0, 3, 1, 2))
        wm2d = jnp.asarray(wm[: nbh * nbw].reshape(nbh, nbw), jnp.float32)
        f32 = np.asarray(fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True))
        ip = np.asarray(fused_mark_planar(planes, wm2d, 15.0, 1, interpret=True,
                                          int_path=True))
        assert (f32 == ip).mean() > 0.98
        # du == 0 tail rows: bit-exact vs the XLA path
        want = np.asarray(
            codec.mark_frames(jnp.asarray(frames), jnp.asarray(wm, jnp.float32)))
        got = ip.transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(got[:, 8 * nbh :], want[:, 8 * nbh :])
        # all three extract paths agree bit-for-bit on int-marked frames
        bits = np.asarray(
            fused_extract_planar(jnp.asarray(ip), 15.0, 1, interpret=True,
                                 int_path=True))
        bits_f = np.asarray(
            fused_extract_planar(jnp.asarray(ip), 15.0, 1, interpret=True))
        np.testing.assert_array_equal(bits, bits_f)
        xla = np.asarray(codec.extract_frames(jnp.asarray(got)))[:, : nbh * nbw]
        np.testing.assert_array_equal(xla.reshape(2, nbh, nbw), bits)
        deg = DeShuffler(key=0, threshold="fixed").set_shape(payload.shape)
        flat = np.zeros((2, int(np.prod(cap))), np.float32)
        flat[:, : nbh * nbw] = bits.reshape(2, -1)
        for p in np.asarray(deg.degenerate_batch(jnp.asarray(flat))):
            np.testing.assert_array_equal(p, payload)

    def test_codec_int_path_field_reaches_kernels(self, rng, monkeypatch):
        """DwtDctSvd(int_path=True) threads the flag into both fused kernels
        (the one-line default flip after the on-chip A/B must be enough)."""
        import vfp_tpu.kernels.fused_embed as fe
        from test_dwt_dct_svd import natural_frames

        from vfp_tpu.wm import DwtDctSvd

        seen = {}
        real_mark, real_extract = fe.fused_mark_planar, fe.fused_extract_planar

        def spy_mark(planes, wm2d, scale, chan, **kw):
            seen["mark_int"] = kw.get("int_path", False)
            return real_mark(planes, wm2d, scale, chan, interpret=True, **kw)

        def spy_extract(planes, scale, chan, **kw):
            seen["extract_int"] = kw.get("int_path", False)
            return real_extract(planes, scale, chan, interpret=True, **kw)

        monkeypatch.setattr(fe, "fused_mark_planar", spy_mark)
        monkeypatch.setattr(fe, "fused_extract_planar", spy_extract)
        codec = DwtDctSvd(backend="pallas", int_path=True)
        frames = natural_frames(rng, 1, 64, 128)
        cap = codec.wm_capacity((64, 128, 3))
        wm = jnp.asarray(rng.randint(0, 2, int(np.prod(cap))), jnp.float32)
        marked = codec.mark_frames(jnp.asarray(frames), wm)
        codec.extract_frames(marked)
        assert seen == {"mark_int": True, "extract_int": True}

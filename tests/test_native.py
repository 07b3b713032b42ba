"""Native C++ I/O engine tests (built on the fly with g++)."""

import numpy as np
import pytest

from vfp_tpu.native.build import have_native

pytestmark = pytest.mark.skipif(not have_native(), reason="no g++ / prebuilt lib")


class TestNativeRawVideo:
    def test_roundtrip_exact(self, tmp_path, rng):
        from vfp_tpu.native import NativeRawVideoReader, NativeRawVideoWriter

        frames = rng.randint(0, 256, (37, 24, 32, 3)).astype(np.uint8)
        p = tmp_path / "v.rawv"
        with NativeRawVideoWriter(p, 32, 24, fps=25) as w:
            w.write_batch(frames[:20])
            w.write_batch(frames[20:])
        with NativeRawVideoReader(p) as r:
            assert (r.width, r.height, r.fps) == (32, 24, 25.0)
            got = []
            while True:
                b = r.read_batch(7)
                if b is None:
                    break
                got.append(b)
        np.testing.assert_array_equal(np.concatenate(got), frames)

    def test_interop_with_python_impl(self, tmp_path, rng):
        """Native writer <-> Python reader and vice versa."""
        from vfp_tpu.io.readers import RawVideoReader
        from vfp_tpu.io.writers import RawVideoWriter
        from vfp_tpu.native import NativeRawVideoReader, NativeRawVideoWriter

        frames = rng.randint(0, 256, (5, 16, 16, 3)).astype(np.uint8)
        p1 = tmp_path / "a.rawv"
        with NativeRawVideoWriter(p1, 16, 16) as w:
            w.write_batch(frames)
        with RawVideoReader(p1) as r:
            np.testing.assert_array_equal(r.read_batch(10), frames)
        p2 = tmp_path / "b.rawv"
        with RawVideoWriter(p2, 16, 16) as w:
            w.write_batch(frames)
        with NativeRawVideoReader(p2) as r:
            np.testing.assert_array_equal(r.read_batch(10), frames)

    def test_pipe_reader(self, tmp_path, rng):
        """Command-pipe reader: stream raw frames through `cat`."""
        from vfp_tpu.native import NativePipeReader

        frames = rng.randint(0, 256, (9, 8, 8, 3)).astype(np.uint8)
        raw = tmp_path / "frames.bin"
        raw.write_bytes(frames.tobytes())
        r = NativePipeReader(f"cat {raw}", 8, 8)
        got = r.read_batch(100)
        r.close()
        np.testing.assert_array_equal(got, frames)

    def test_pipe_writer(self, tmp_path, rng):
        from vfp_tpu.native import NativePipeWriter

        frames = rng.randint(0, 256, (4, 8, 8, 3)).astype(np.uint8)
        out = tmp_path / "sink.bin"
        w = NativePipeWriter(f"cat > {out}", 8, 8)
        w.write_batch(frames)
        w.close()
        np.testing.assert_array_equal(
            np.frombuffer(out.read_bytes(), np.uint8).reshape(frames.shape), frames
        )

    def test_open_reader_prefers_native(self, tmp_path, rng):
        from vfp_tpu.io import open_reader, open_writer
        from vfp_tpu.native import NativeRawVideoReader

        frames = rng.randint(0, 256, (3, 16, 16, 3)).astype(np.uint8)
        p = tmp_path / "v.rawv"
        with open_writer(p, 16, 16) as w:
            w.write_batch(frames)
        r = open_reader(p)
        assert isinstance(r, NativeRawVideoReader)
        np.testing.assert_array_equal(r.read_batch(5), frames)
        r.close()


class TestNativeHostLL:
    @pytest.mark.skipif(not have_native(), reason="no g++ / prebuilt lib")
    def test_matches_numpy_to_one_ulp(self, rng):
        """vfpio_host_ll vs the cv2/NumPy fallback: equal except where a
        different (but valid) f32 association lands exactly on an f16
        rounding boundary — then off by at most 1 f16 ulp."""
        from vfp_tpu.pipeline import lowlink

        frames = rng.randint(0, 256, (3, 79, 101, 3), np.uint8)
        assert lowlink._native_reconstruct() is not None
        got = lowlink.host_ll(frames, 1)
        orig = lowlink._native_reconstruct
        lowlink._native_reconstruct = lambda: None
        try:
            want = lowlink.host_ll(frames, 1)
        finally:
            lowlink._native_reconstruct = orig
        assert got.shape == want.shape == (3, 38, 50)
        a, b = got.astype(np.float32), want.astype(np.float32)
        ulp = np.spacing(np.abs(want)).astype(np.float32)
        assert np.all(np.abs(a - b) <= ulp * 1.01)
        assert (a == b).mean() > 0.99


class TestNativeReconstruct:
    @pytest.mark.skipif(not have_native(), reason="no g++ / prebuilt lib")
    def test_matches_numpy_bitexact(self, rng):
        """vfpio_reconstruct vs the NumPy fallback: identical bytes,
        including odd frame dims (copied tail rows/cols), the zero-coef R
        channel, and saturating boundaries."""
        from vfp_tpu.pipeline import lowlink

        frames = rng.randint(0, 256, (3, 79, 101, 3), np.uint8)
        frames[0, :4] = 255  # clamp-high region
        frames[1, :4] = 0    # clamp-low region
        hc, wc = 79 // 4 * 2, 101 // 4 * 2
        dll = rng.randint(-127, 128, (2, 3, hc, wc)).astype(np.int8)
        want_lib = lowlink._native_reconstruct()
        assert want_lib is not None
        got = lowlink.reconstruct_all(frames, dll, chan=1)
        # force the NumPy fallback
        orig = lowlink._native_reconstruct
        lowlink._native_reconstruct = lambda: None
        try:
            want = lowlink.reconstruct_all(frames, dll, chan=1)
        finally:
            lowlink._native_reconstruct = orig
        np.testing.assert_array_equal(got, want)


class TestNativeRecentre:
    @pytest.mark.skipif(not have_native(), reason="no g++ / prebuilt lib")
    def test_recentre_matches_numpy(self, rng):
        """vfpio_recentre2 vs the einsum fallback: same f32 formulas per
        block (sequential vs pairwise accumulation over 16 terms), so at
        most a 1-step int8 rint difference on a half-way tie — on random
        input the outputs are byte-identical, asserted to <=1 with an
        exactness floor.  Covers: big-block rescale, small blocks routed
        through _repair_small_blocks in BOTH modes, odd frame dims (tail
        rows/cols pass through as the input bytes).

        One structural exception: repaired blocks go through triplet4 in
        native mode but _host_triplet in the forced-numpy mode, and (as
        TestNativeQim documents) those twins can move a borderline s0
        across a QIM cell edge — a whole-block s0-sized difference onto a
        different, equally valid centre for the SAME bit.  Any block with
        a >1-step difference must therefore satisfy that decision-parity
        invariant rather than fail the byte bound."""
        from vfp_tpu.pipeline import lowlink

        P, k, hc, wc, blk = 3, 4, 117, 163, 4
        scale = 45.0
        dll = rng.randint(-100, 100, (P, k, hc, wc)).astype(np.int8)
        dll[:, :, :16, :16] = rng.randint(-2, 2, (P, k, 16, 16)).astype(
            np.int8)  # below the WIRE_DU_MIN floor -> exact repair path
        E = rng.randn(k, hc, wc).astype(np.float32) * 0.1
        ll16 = (rng.rand(k, hc, wc) * 255).astype(np.float16)
        bits = rng.randint(0, 2, (P, (hc // blk) * (wc // blk))).astype(
            np.float32)
        assert lowlink._native_reconstruct() is not None
        got = lowlink.recentre_dll(dll, E, ll16, blk, scale, bits)
        orig = lowlink._native_reconstruct
        lowlink._native_reconstruct = lambda: None
        try:
            want = lowlink.recentre_dll(dll, E, ll16, blk, scale, bits)
        finally:
            lowlink._native_reconstruct = orig
        d = np.abs(got.astype(np.int16) - want.astype(np.int16))
        if d.max() > 1:  # borderline-s0 cell-edge block: same-bit centres
            nbh, nbw = hc // blk, wc // blk
            X32 = ll16.astype(np.float32)
            for p, f, a, c in zip(*np.nonzero(
                    d[:, :, : nbh * blk, : nbw * blk]
                    .reshape(P, k, nbh, blk, nbw, blk).max((3, 5)) > 1)):
                blk_x = X32[f, a * blk:(a + 1) * blk, c * blk:(c + 1) * blk]
                want_bit = bits[p, a * nbw + c]
                for o in (got, want):
                    m = blk_x + o[p, f, a * blk:(a + 1) * blk,
                                  c * blk:(c + 1) * blk] / lowlink.DLL_Q
                    s0 = np.linalg.svd(m, compute_uv=False)[0]
                    assert (np.fmod(s0, scale) > scale * 0.5) == bool(
                        want_bit), (p, f, a, c, s0)
            assert (d <= 1).mean() > 0.999  # cell-edge blocks stay rare
        assert (d == 0).mean() > 0.9999
        # tail rows/cols beyond the block grid are the input, bit-exact
        np.testing.assert_array_equal(got[:, :, hc - hc % blk:],
                                      dll[:, :, hc - hc % blk:])
        np.testing.assert_array_equal(got[:, :, :, wc - wc % blk:],
                                      dll[:, :, :, wc - wc % blk:])


class TestNativeQim:
    @pytest.mark.skipif(not have_native(), reason="no g++ / prebuilt lib")
    def test_qim_dll_matches_numpy(self, rng):
        """vfpio_qim_dll vs the NumPy twin: same power-by-squaring count and
        float formulas, so deltas agree except where scalar-vs-vectorized
        float noise rounds an int8 step differently or moves a borderline
        s0 across a QIM cell edge (different, equally valid centre — a
        whole-block s0-sized delta difference).  Assert: >=99% of blocks
        bit-identical, and every differing block still centres its s0 on a
        centre encoding the SAME bit (the decision-parity invariant)."""
        from vfp_tpu.pipeline import lowlink
        from vfp_tpu.wm import DwtDctSvd

        codec = DwtDctSvd()
        scale = float(codec.scales[1])
        ll = (rng.rand(3, 60, 80).astype(np.float32) * 400).astype(np.float16)
        bits = rng.randint(0, 2, (2, 15 * 20)).astype(np.float32)
        got = lowlink.host_dll(ll, codec, 1, bits)
        orig = lowlink._native_reconstruct
        lowlink._native_reconstruct = lambda: None
        try:
            want = lowlink.host_dll(ll, codec, 1, bits)
        finally:
            lowlink._native_reconstruct = orig
        gb = got.reshape(2, 3, 15, 4, 20, 4).transpose(0, 1, 2, 4, 3, 5)
        wb = want.reshape(2, 3, 15, 4, 20, 4).transpose(0, 1, 2, 4, 3, 5)
        same = (gb == wb).all((-2, -1))
        assert same.mean() > 0.99, same.mean()
        # differing blocks: marked s0 must still encode the same bit
        X = (ll.astype(np.float32).reshape(3, 15, 4, 20, 4)
             .transpose(0, 1, 3, 2, 4))
        for p, f, i, j in np.argwhere(~same):
            for d in (gb, wb):
                m = X[f, i, j] + d[p, f, i, j].astype(np.float32) / 8.0
                s0, _, _ = lowlink._host_triplet(m[None])
                bit = float(np.mod(s0[0], scale) > scale * 0.5)
                assert bit == bits[p, i * 20 + j], (p, f, i, j, s0)

    @pytest.mark.skipif(not have_native(), reason="no g++ / prebuilt lib")
    def test_qim_bits_matches_numpy_on_marked(self, rng):
        """Extract decisions: native vs NumPy on CENTRED content (marked
        frames keep s0 far from the decision threshold, so float noise
        cannot flip) — must be identical."""
        from vfp_tpu.pipeline import lowlink
        from vfp_tpu.wm import DwtDctSvd, Shuffler

        codec = DwtDctSvd()
        frames = (rng.rand(2, 96, 128, 3) * 255).astype(np.uint8)
        cap = codec.wm_capacity(frames.shape[1:])
        wm = Shuffler(key=0).generate_wm(np.arange(8) % 2, cap)
        marked = lowlink.LowLinkMarker(
            codec, [wm], batch_size=2, wire="host").mark_all(frames)[0]
        ll = lowlink.host_ll(marked, 1)
        total = int(np.prod(cap))
        got = lowlink.host_extract_bits(ll, codec, 1, total)
        orig = lowlink._native_reconstruct
        lowlink._native_reconstruct = lambda: None
        try:
            want = lowlink.host_extract_bits(ll, codec, 1, total)
        finally:
            lowlink._native_reconstruct = orig
        np.testing.assert_array_equal(got, want)

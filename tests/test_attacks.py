"""Attack battery for the flagship codec beyond re-encode robustness.

The reference only tests survival through HLS re-encode (its durability
harness); this documents the codec's behavior under other common channel
distortions.  Geometric attacks (scaling/cropping) break block alignment by
design — QIM block watermarks are not geometry-invariant — and are asserted
as expected failures so the boundary is explicit.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from vfp_tpu.wm import DwtDctSvd, Shuffler, DeShuffler

from test_dwt_dct_svd import natural_frames

PAYLOAD = np.array([0, 1, 1, 0, 0, 1, 0, 1])


@pytest.fixture(scope="module")
def marked(tmp_path_factory):
    rng = np.random.RandomState(77)
    frames = natural_frames(rng, b=4, h=96, w=128)
    codec = DwtDctSvd()
    wm = jnp.asarray(
        Shuffler(key=0).generate_wm(PAYLOAD, codec.wm_capacity(frames.shape[1:])),
        jnp.float32,
    )
    return codec, np.asarray(codec.mark_frames(jnp.asarray(frames), wm))


def _recovered(codec, frames_u8):
    deg = DeShuffler(key=0, threshold="fixed").set_shape(PAYLOAD.shape)
    ok = 0
    for f in frames_u8:
        bits = np.asarray(codec.extract_frames(jnp.asarray(f[None])))[0]
        if np.array_equal(np.asarray(deg.degenerate(bits)), PAYLOAD):
            ok += 1
    return ok, len(frames_u8)


class TestSurvives:
    def test_gaussian_noise(self, marked, rng):
        codec, frames = marked
        noisy = np.clip(
            frames.astype(np.int16) + rng.normal(0, 2, frames.shape), 0, 255
        ).astype(np.uint8)
        ok, n = _recovered(codec, noisy)
        assert ok == n, (ok, n)

    def test_brightness_shift(self, marked):
        """A luma shift leaves the chroma-borne payload intact."""
        codec, frames = marked
        shifted = np.clip(frames.astype(np.int16) + 12, 0, 255).astype(np.uint8)
        ok, n = _recovered(codec, shifted)
        assert ok == n, (ok, n)

    def test_mild_contrast(self, marked):
        """5% contrast change keeps s0 within the same QIM half-bins often
        enough for per-frame majority recovery on most frames."""
        codec, frames = marked
        adj = np.clip(frames.astype(np.float32) * 1.02, 0, 255).astype(np.uint8)
        ok, n = _recovered(codec, adj)
        assert ok >= n - 1, (ok, n)

    def test_rescale_downup_2x(self, marked):
        """Down-to-half-res and back survives: the payload lives in the LL
        band, which a bilinear down/up acts on only mildly."""
        codec, frames = marked
        rescaled = np.stack(
            [cv2.resize(cv2.resize(f, (64, 48)), (128, 96)) for f in frames]
        )
        ok, n = _recovered(codec, rescaled)
        assert ok == n, (ok, n)

    def test_double_jpeg(self, marked):
        codec, frames = marked
        out = []
        for f in frames:
            for q in (95, 92):
                _, enc = cv2.imencode(".jpg", f, [cv2.IMWRITE_JPEG_QUALITY, q])
                f = cv2.imdecode(enc, cv2.IMREAD_COLOR)
            out.append(f)
        ok, n = _recovered(codec, np.stack(out))
        assert ok >= int(0.75 * n), (ok, n)


class TestKnownLimits:
    def test_translation_breaks_alignment(self, marked):
        """Pixel shifts misalign the block grid — the classic block-QIM
        limitation (the reference shares it)."""
        codec, frames = marked
        shifted = np.roll(frames, 2, axis=2)
        ok, n = _recovered(codec, shifted)
        assert ok < n  # documented limitation, not a regression

    def test_strong_contrast_breaks_qim(self, marked):
        """Large multiplicative changes rescale s0 across QIM bins."""
        codec, frames = marked
        adj = np.clip(frames.astype(np.float32) * 1.3, 0, 255).astype(np.uint8)
        ok, n = _recovered(codec, adj)
        assert ok < n


class TestDtcwtRobustness:
    """DT-CWT spread-spectrum presence detection under lossy re-encode
    (reference use-case: detect/de_corr_shuffler.py correlation > 0.1)."""

    def test_jpeg_survives(self):
        from vfp_tpu.wm.dtcwt_codecs import DtcwtKey

        rng = np.random.RandomState(11)
        codec = DtcwtKey()
        base = rng.randint(60, 200, (270, 480, 3)).astype(np.uint8)
        frames = np.stack([
            np.clip(base.astype(np.int16) + rng.randint(-5, 6, base.shape),
                    0, 255).astype(np.uint8)
            for _ in range(3)
        ])
        wm = jnp.asarray(
            rng.randint(0, 2, codec.wm_capacity((270, 480, 3))), jnp.float32)
        marked = np.asarray(codec.mark_frames(jnp.asarray(frames), wm))
        jpg = np.stack([
            cv2.imdecode(cv2.imencode(".jpg", m,
                                      [cv2.IMWRITE_JPEG_QUALITY, 80])[1],
                         cv2.IMREAD_COLOR)
            for m in marked
        ])
        rec = np.asarray(codec.extract_frames(jnp.asarray(jpg)))
        ref = np.asarray(wm).reshape(-1) * 2 - 1
        corr = float(np.corrcoef(rec.reshape(3, -1).mean(0), ref)[0, 1])
        assert corr > 0.3, corr
        # and an unmarked clip stays below threshold
        rec0 = np.asarray(codec.extract_frames(jnp.asarray(frames)))
        corr0 = float(np.corrcoef(rec0.reshape(3, -1).mean(0), ref)[0, 1])
        assert abs(corr0) < 0.1, corr0


class TestDctQimRobustness:
    def test_payload_survives_jpeg95_via_redundancy(self, rng):
        """DCT-QIM embeds in a U-channel AC coefficient, so 4:2:0 chroma
        subsampling costs ~25% of raw bits at JPEG-95 (algorithm-family
        property, same for the reference's dct_encoder).  Errors burst in
        flat regions, so single frames can still flip; the pipeline's
        decision rule — Shuffler tiling (~150x) within a frame, then
        majority across frames (Extractor.majority) — recovers the
        payload."""
        import cv2
        import jax.numpy as jnp

        from vfp_tpu.wm import DctQim, DeShuffler, Shuffler

        codec = DctQim()
        frames = natural_frames(rng, b=2, h=240, w=320)
        payload = np.array([0, 1, 1, 0, 0, 1, 0, 1])
        cap = codec.wm_capacity((240, 320, 3))
        wm = Shuffler(key=0).generate_wm(payload, cap)
        marked = np.asarray(codec.mark_frames(jnp.asarray(frames), jnp.asarray(wm, jnp.float32)))
        deg = DeShuffler(key=0, threshold="fixed").set_shape(payload.shape)
        recovered = []
        for f in marked:
            _, enc = cv2.imencode(".jpg", f, [cv2.IMWRITE_JPEG_QUALITY, 95])
            bits = np.asarray(codec.extract_frames(
                jnp.asarray(cv2.imdecode(enc, 1)[None])))[0]
            recovered.append(deg.degenerate(bits))
        # across-frame majority (the Extractor's decision rule)
        vote = (np.mean(recovered, axis=0) >= 0.5).astype(payload.dtype)
        assert np.array_equal(vote, payload), (recovered, payload)
        # and at least one frame recovers outright
        assert any(np.array_equal(r, payload) for r in recovered)


class TestMp4vInterFrameChannel:
    """Durability through cv2's mp4v encoder — inter-frame DCT coding with
    4:2:0 chroma, the closest available stand-in for the reference's libx264
    yuv420p attack (reference: src/offmark/video/frame_writer.py:31-39,
    tests/segment_mark_detect_hls.py:500).  mp4v quantizes chroma much harder
    than x264's defaults, so the QIM codecs need stronger steps here than
    their reference defaults (15 -> 45, 20 -> 30); the measured strength
    table is in docs/DESIGN.md.  DT-CWT needs no tuning."""

    @pytest.fixture(scope="class")
    def mp4v_source(self, tmp_path_factory):
        from vfp_tpu.io import RawVideoWriter

        rng = np.random.RandomState(7)
        d = tmp_path_factory.mktemp("mp4vsrc")
        src = d / "src.rawv"
        with RawVideoWriter(src, 320, 240, fps=6) as w:
            for _ in range(3):
                w.write_batch(natural_frames(rng, b=6, h=240, w=320))
        return src

    def test_flagship_survives_mp4v_at_scale45(self, mp4v_source, tmp_path):
        from vfp_tpu.workflows.durability import run_durability

        report = run_durability(
            mp4v_source, tmp_path / "dur", segment_duration=1.0,
            codec=DwtDctSvd(scales=(0.0, 45.0, 0.0)), container="mp4", batch_size=8,
        )
        assert report["is_successful"], report["segment_preservation_rate"]
        assert report["original_success_rate"] == 1.0
        assert report["reencoded_success_rate"] == 1.0
        # the channel actually ran through mp4 files
        assert (tmp_path / "dur" / "full.mp4").exists()

    def test_dctqim_survives_mp4v_at_alpha30(self, mp4v_source, tmp_path):
        from vfp_tpu.wm import DctQim
        from vfp_tpu.workflows.durability import run_durability

        report = run_durability(
            mp4v_source, tmp_path / "dur", segment_duration=1.0,
            codec=DctQim(alpha=30.0), container="mp4", batch_size=8,
        )
        assert report["is_successful"], report["segment_preservation_rate"]
        assert report["reencoded_success_rate"] == 1.0

    def test_dtcwtkey_survives_mp4v_at_default_alpha(self, mp4v_source, tmp_path):
        from vfp_tpu.workflows.durability import run_durability_corr

        report = run_durability_corr(
            mp4v_source, tmp_path / "dur", segment_duration=1.0,
            container="mp4", batch_size=8,
        )
        assert report["is_successful"], report["segment_preservation_rate"]
        assert report["reencoded_avg_frequency"] >= 0.75

    def test_dtcwtkey_fast_dots_survives_mp4v(self, mp4v_source, tmp_path):
        """fast_dots (single-bf16-pass matmuls) must clear the same 75%
        durability bar through the inter-frame channel — the criterion for
        making it the DT-CWT default on chip."""
        from vfp_tpu.wm.dtcwt_codecs import DtcwtKey
        from vfp_tpu.workflows.durability import run_durability_corr

        report = run_durability_corr(
            mp4v_source, tmp_path / "dur", segment_duration=1.0,
            container="mp4", batch_size=8, codec=DtcwtKey(fast_dots=True),
        )
        assert report["is_successful"], report["segment_preservation_rate"]
        assert report["reencoded_avg_frequency"] >= 0.75

    def test_dtcwtimg_image_recovery_after_mp4v(self, tmp_path):
        """BlockShuffler image watermark recovered from the mp4v channel with
        frame-averaged planes; agreement holds the clean-roundtrip ceiling
        (~0.79 — the zero-lowpass decode bound, see test_dtcwt.py)."""
        import jax.numpy as jnp

        from vfp_tpu.io import Cv2Writer, open_reader
        from vfp_tpu.wm import BlockShuffler, DeBlockShuffler
        from vfp_tpu.wm.dtcwt_codecs import DtcwtImg

        rng = np.random.RandomState(0)
        frames = natural_frames(rng, b=6, h=480, w=640)
        codec = DtcwtImg()
        cap = codec.wm_capacity((480, 640, 3))
        img = (rng.rand(27, 48) > 0.5).astype(np.float32) * 255
        wm = BlockShuffler(key=5).generate_wm(img, cap)
        marked = np.asarray(codec.mark_frames(jnp.asarray(frames), jnp.asarray(wm, jnp.float32)))

        out = tmp_path / "img_channel.mp4"
        with Cv2Writer(out, 640, 480, fps=6) as w:
            w.write_batch(marked)
        with open_reader(out) as r:
            chunks = []
            while True:
                b = r.read_batch(32)
                if b is None:
                    break
                chunks.append(b)
        back = np.concatenate(chunks)

        planes = np.asarray(codec.extract_frames(jnp.asarray(back)))
        deg = DeBlockShuffler(key=5).set_shape(img.shape)
        rec = deg.degenerate(planes.mean(0))
        got = (rec > rec.mean()).astype(np.uint8)
        want = (img > 127).astype(np.uint8)
        assert (got == want).mean() > 0.75, (got == want).mean()


class TestDtcwtImgCombinedAttackMargins:
    """Pins the DtcwtImg agreement floor under COMBINED attacks (VERDICT r3
    item 8).  Margin characterization (measured at 480x640, b=6, alpha=1.5):

      clean roundtrip     0.785   <- ceiling set by the zero-lowpass decode
      jpeg80 + rescale2x  0.769       (NOT by embed strength: an alpha sweep
      mp4v + brightness15 0.789        1.5/2.5/4.0 all measure ~0.785 clean;
      mp4v + jpeg70       0.752        alpha only trades PSNR 30->21.6 dB for
      unmarked (chance)   ~0.5         attacked-margin, jpeg70 .758->.787)

    So attacks cost <= 0.035 agreement vs clean, and the decision statistic
    stays >= 0.75 (the reference durability bar) with ~0.25 margin over
    chance 0.5.  Default alpha stays 1.5: the visible-image codec's clean
    ceiling is decode-bound, and 30 dB PSNR matters more than widening an
    already-held attacked margin.  This is also why bench_suite's
    `extract_correlation` 0.30 is not alarming: raw plane correlation is
    bounded by the same zero-lowpass decode; `image_agreement` (0.92 at
    1080p) is the decision statistic."""

    @pytest.fixture(scope="class")
    def img_marked(self):
        from vfp_tpu.wm import BlockShuffler
        from vfp_tpu.wm.dtcwt_codecs import DtcwtImg

        rng = np.random.RandomState(0)
        frames = natural_frames(rng, b=6, h=480, w=640)
        codec = DtcwtImg()
        cap = codec.wm_capacity((480, 640, 3))
        img = (rng.rand(27, 48) > 0.5).astype(np.float32) * 255
        wm = BlockShuffler(key=5).generate_wm(img, cap)
        marked = np.asarray(
            codec.mark_frames(jnp.asarray(frames), jnp.asarray(wm, jnp.float32)))
        return codec, img, frames, marked

    @staticmethod
    def _agreement(codec, img, back):
        from vfp_tpu.wm import DeBlockShuffler

        planes = np.asarray(codec.extract_frames(jnp.asarray(back)))
        rec = DeBlockShuffler(key=5).set_shape(img.shape).degenerate(planes.mean(0))
        got = (rec > rec.mean()).astype(np.uint8)
        return float((got == (img > 127)).mean())

    def test_jpeg80_plus_rescale(self, img_marked):
        codec, img, _, marked = img_marked
        attacked = []
        for m in marked:
            j = cv2.imdecode(
                cv2.imencode(".jpg", m, [cv2.IMWRITE_JPEG_QUALITY, 80])[1], 1)
            small = cv2.resize(j, (320, 240), interpolation=cv2.INTER_AREA)
            attacked.append(cv2.resize(small, (640, 480),
                                       interpolation=cv2.INTER_LINEAR))
        a = self._agreement(codec, img, np.stack(attacked))
        assert a > 0.75, a  # measured floor 0.769

    def test_mp4v_plus_brightness(self, img_marked, tmp_path):
        from vfp_tpu.io import Cv2Writer, open_reader

        codec, img, _, marked = img_marked
        out = tmp_path / "combined.mp4"
        with Cv2Writer(out, 640, 480, fps=6) as w:
            w.write_batch(marked)
        with open_reader(out) as r:
            chunks = []
            while True:
                b = r.read_batch(32)
                if b is None:
                    break
                chunks.append(b)
        back = np.concatenate(chunks)
        bright = np.clip(back.astype(np.int16) + 15, 0, 255).astype(np.uint8)
        a = self._agreement(codec, img, bright)
        assert a > 0.75, a  # measured floor 0.789
        # and a second lossy generation on top still clears 0.74
        j2 = np.stack([
            cv2.imdecode(cv2.imencode(".jpg", f,
                                      [cv2.IMWRITE_JPEG_QUALITY, 70])[1], 1)
            for f in back
        ])
        a2 = self._agreement(codec, img, j2)
        assert a2 > 0.74, a2  # measured floor 0.752

    def test_unmarked_stays_at_chance(self, img_marked):
        codec, img, frames, _ = img_marked
        a = self._agreement(codec, img, frames)
        assert a < 0.65, a  # chance level ~0.5 — the margin above is real

"""I/O backends + pipeline driver tests (ffmpeg-less)."""

import numpy as np
import pytest

from vfp_tpu.io import (
    ArrayReader,
    ArrayWriter,
    Cv2Reader,
    Cv2Writer,
    MjpegAviWriter,
    RawVideoReader,
    RawVideoWriter,
    open_reader,
    open_writer,
    probe,
)
from vfp_tpu.pipeline import Embedder, Extractor, FrameMarker, FrameExtractor
from vfp_tpu.wm import DwtDctSvd, Shuffler, DeShuffler

from test_dwt_dct_svd import natural_frames

PAYLOAD = np.array([0, 1, 1, 0, 0, 1, 0, 1])


class TestRawVideo:
    def test_roundtrip_exact(self, tmp_path, rng):
        frames = rng.randint(0, 256, (7, 24, 32, 3)).astype(np.uint8)
        p = tmp_path / "v.rawv"
        with RawVideoWriter(p, 32, 24, fps=25) as w:
            w.write_batch(frames[:4])
            w.write_batch(frames[4:])
        with RawVideoReader(p) as r:
            assert (r.width, r.height, r.fps) == (32, 24, 25.0)
            got = [r.read_batch(3)]
            while True:
                b = r.read_batch(3)
                if b is None:
                    break
                got.append(b)
        np.testing.assert_array_equal(np.concatenate(got), frames)

    def test_open_by_extension(self, tmp_path, rng):
        frames = rng.randint(0, 256, (2, 16, 16, 3)).astype(np.uint8)
        p = tmp_path / "v.rawv"
        with open_writer(p, 16, 16) as w:
            w.write_batch(frames)
        with open_reader(p) as r:
            np.testing.assert_array_equal(r.read_batch(10), frames)


class TestMjpegAvi:
    def test_cv2_reads_back(self, tmp_path, rng):
        frames = natural_frames(rng, b=5, h=48, w=64)
        p = tmp_path / "v.avi"
        with MjpegAviWriter(p, 64, 48, fps=24, quality=95) as w:
            w.write_batch(frames)
        r = Cv2Reader(p)
        assert (r.width, r.height) == (64, 48)
        got = r.read_batch(10)
        r.close()
        assert got.shape == (5, 48, 64, 3)
        # lossy but close
        err = np.abs(got.astype(int) - frames.astype(int)).mean()
        assert err < 6.0, err

    def test_probe(self, tmp_path, rng):
        frames = natural_frames(rng, b=3, h=32, w=48)
        p = tmp_path / "v.avi"
        with MjpegAviWriter(p, 48, 32, fps=24) as w:
            w.write_batch(frames)
        info = probe(p)
        assert info["width"] == 48 and info["height"] == 32
        assert abs(info["fps"] - 24) < 0.1
        assert info["frames"] == 3

    def test_riff_4gib_cap_raises(self, tmp_path):
        """RIFF sizes are 32-bit: a write that would push the file past
        4 GiB must raise loudly, not wrap the header fields into a silently
        unreadable file.  Simulated by seeking near the cap (sparse file —
        nothing big lands on disk)."""
        import pytest

        w = MjpegAviWriter(tmp_path / "big.avi", 8, 8, fps=1)
        w.write_encoded(b"\xff\xd8tiny\xff\xd9")
        w.f.seek(0xFFFF_F000 - 50)
        with pytest.raises(IOError, match="4 GiB"):
            w.write_encoded(b"x" * 100)
        w.f.close()


class TestCv2Mp4:
    def test_mp4v_roundtrip(self, tmp_path, rng):
        frames = natural_frames(rng, b=4, h=48, w=64)
        p = tmp_path / "v.mp4"
        with Cv2Writer(p, 64, 48, fps=24) as w:
            w.write_batch(frames)
        r = Cv2Reader(p)
        got = r.read_batch(10)
        r.close()
        assert got.shape == (4, 48, 64, 3)


class TestPipeline:
    def test_embed_extract_in_memory(self, rng):
        frames = natural_frames(rng, b=10, h=64, w=96)
        codec = DwtDctSvd()
        cap = codec.wm_capacity(frames.shape[1:])
        wm = Shuffler(key=0).generate_wm(PAYLOAD, cap)
        writer = ArrayWriter()
        stats = Embedder(
            ArrayReader(frames), FrameMarker(codec, wm, batch_size=4), writer
        ).start()
        assert stats.frames == 10
        marked = writer.frames
        assert marked.shape == frames.shape

        deg = DeShuffler(key=0).set_shape(PAYLOAD.shape)
        res = Extractor(ArrayReader(marked), FrameExtractor(codec, deg, batch_size=4)).start()
        assert res.frames == 10
        pattern, freq = res.majority()
        np.testing.assert_array_equal(pattern, PAYLOAD)
        assert freq == 1.0

    def test_end_to_end_through_lossy_file(self, tmp_path, rng):
        """Full acceptance: mark -> MJPEG-AVI file -> read -> recover payload."""
        frames = natural_frames(rng, b=6, h=64, w=96)
        codec = DwtDctSvd()
        wm = Shuffler(key=0).generate_wm(PAYLOAD, codec.wm_capacity(frames.shape[1:]))
        p = tmp_path / "marked.avi"
        Embedder(
            ArrayReader(frames),
            FrameMarker(codec, wm, batch_size=4),
            MjpegAviWriter(p, 96, 64, quality=95),
        ).start()

        deg = DeShuffler(key=0).set_shape(PAYLOAD.shape)
        res = Extractor(Cv2Reader(p), FrameExtractor(codec, deg, batch_size=4)).start()
        pattern, freq = res.majority()
        np.testing.assert_array_equal(pattern, PAYLOAD)
        assert freq >= 0.75

    def test_partial_batch_padding(self, rng):
        frames = natural_frames(rng, b=5, h=32, w=32)  # 5 % 4 != 0
        codec = DwtDctSvd()
        wm = Shuffler(key=0).generate_wm(PAYLOAD, codec.wm_capacity(frames.shape[1:]))
        writer = ArrayWriter()
        stats = Embedder(ArrayReader(frames), FrameMarker(codec, wm, batch_size=4), writer).start()
        assert stats.frames == 5
        assert writer.frames.shape[0] == 5

    def test_writer_error_raises_instead_of_hanging(self, rng):
        """A failing writer (disk full, encode error) must surface its
        exception; with the bounded out_q it used to deadlock the main loop
        once the queue filled after the consumer thread died."""
        import pytest

        class FailingWriter(ArrayWriter):
            def write_batch(self, batch):
                raise OSError("disk full")

        frames = natural_frames(rng, b=24, h=32, w=32)
        codec = DwtDctSvd()
        wm = Shuffler(key=0).generate_wm(PAYLOAD, codec.wm_capacity(frames.shape[1:]))
        emb = Embedder(ArrayReader(frames), FrameMarker(codec, wm, batch_size=4),
                       FailingWriter(), prefetch=1)
        with pytest.raises(OSError, match="disk full"):
            emb.start()


class TestY4M:
    def test_roundtrip(self, tmp_path, rng):
        from vfp_tpu.io import Y4MReader, Y4MWriter

        frames = natural_frames(rng, b=4, h=48, w=64)
        p = tmp_path / "v.y4m"
        with Y4MWriter(p, 64, 48, fps=24) as w:
            w.write_batch(frames)
        with Y4MReader(p) as r:
            assert (r.width, r.height, r.fps) == (64, 48, 24.0)
            got = r.read_batch(10)
        assert got.shape == (4, 48, 64, 3)
        # 4:2:0 conversion is lossy but close on smooth content
        err = np.abs(got.astype(int) - frames.astype(int)).mean()
        assert err < 8.0, err

    def test_open_by_extension(self, tmp_path, rng):
        frames = natural_frames(rng, b=2, h=32, w=32)
        p = tmp_path / "v.y4m"
        with open_writer(p, 32, 32) as w:
            w.write_batch(frames)
        r = open_reader(p)
        assert r.read_batch(5).shape == (2, 32, 32, 3)
        r.close()

    def test_watermark_survives_chroma_subsampling(self, tmp_path, rng):
        """.y4m write/read is a 4:2:0 chroma attack; the flagship payload
        must survive it (the reference's output path is yuv420p,
        frame_writer.py:36)."""
        from vfp_tpu.io import Y4MReader, Y4MWriter
        from vfp_tpu.wm import DwtDctSvd, Shuffler, DeShuffler
        import jax.numpy as jnp

        frames = natural_frames(rng, b=4, h=64, w=96)
        codec = DwtDctSvd()
        wm = jnp.asarray(
            Shuffler(key=0).generate_wm(PAYLOAD, codec.wm_capacity(frames.shape[1:])),
            jnp.float32,
        )
        marked = np.asarray(codec.mark_frames(jnp.asarray(frames), wm))
        p = tmp_path / "marked.y4m"
        with Y4MWriter(p, 96, 64) as w:
            w.write_batch(marked)
        with Y4MReader(p) as r:
            got = r.read_batch(10)
        deg = DeShuffler(key=0, threshold="fixed").set_shape(PAYLOAD.shape)
        ok = 0
        for f in got:
            bits = np.asarray(codec.extract_frames(jnp.asarray(f[None])))[0]
            if np.array_equal(np.asarray(deg.degenerate(bits)), PAYLOAD):
                ok += 1
        assert ok >= 3, ok


class TestFfmpegGating:
    def test_gated_errors_without_binary(self):
        """All ffmpeg-backed paths raise cleanly when the binary is absent."""
        from vfp_tpu.io.ffmpeg import (
            FFmpegPipeReader,
            FFmpegPipeWriter,
            have_ffmpeg,
            segment_video_ffmpeg,
        )

        if have_ffmpeg():
            pytest.skip("ffmpeg present on this host")
        with pytest.raises(RuntimeError):
            FFmpegPipeReader("nope.mp4")
        with pytest.raises(RuntimeError):
            FFmpegPipeWriter("out.mp4", 64, 64)
        with pytest.raises(RuntimeError):
            segment_video_ffmpeg("in.mp4", "seg_%03d.mp4")

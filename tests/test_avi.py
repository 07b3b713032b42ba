"""Chunk-level MJPEG-AVI demux/splice (io/avi.py): the no-ffmpeg stand-in
for the reference's stream-copy leak concat (tests/generate_leak.py:126-136
``-c copy``)."""

import numpy as np
import pytest

from vfp_tpu.io import MjpegAviWriter, open_reader
from vfp_tpu.io.avi import avi_meta, iter_video_chunks, splice_mjpeg_avis


def _write_avi(path, frames, fps=6.0, quality=95):
    w = MjpegAviWriter(path, frames.shape[2], frames.shape[1], fps=fps,
                       quality=quality)
    w.write_batch(frames)
    w.close()


class TestAviChunks:
    def test_meta_and_chunk_count(self, tmp_path, rng):
        frames = rng.randint(0, 256, (7, 48, 64, 3), np.uint8)
        _write_avi(tmp_path / "a.avi", frames, fps=12.0)
        m = avi_meta(tmp_path / "a.avi")
        assert (m["width"], m["height"], m["frames"]) == (64, 48, 7)
        assert m["mjpeg"] and abs(m["fps"] - 12.0) < 1e-6
        chunks = list(iter_video_chunks(tmp_path / "a.avi"))
        assert len(chunks) == 7
        # every chunk is a standalone JPEG
        for c in chunks:
            assert c[:2] == b"\xff\xd8" and c[-2:] == b"\xff\xd9"

    def test_reads_cv2_written_avi(self, tmp_path, rng):
        import cv2

        frames = rng.randint(0, 256, (5, 48, 64, 3), np.uint8)
        p = str(tmp_path / "cv2.avi")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 6.0, (64, 48))
        assert vw.isOpened()
        for f in frames:
            vw.write(f)
        vw.release()
        m = avi_meta(p)
        assert m["mjpeg"] and (m["width"], m["height"]) == (64, 48)
        assert len(list(iter_video_chunks(p))) == 5

    def test_splice_is_bitwise_stream_copy(self, tmp_path, rng):
        """The spliced file's frames decode IDENTICALLY to the segments'
        frames — zero generation loss (a frame-level splice cannot do
        this: decode + re-encode moves pixels)."""
        import cv2

        segs = []
        all_decoded = []
        for i in range(3):
            frames = rng.randint(0, 256, (4, 48, 64, 3), np.uint8)
            p = tmp_path / f"seg{i}.avi"
            _write_avi(p, frames)
            segs.append(p)
            with open_reader(p) as r:
                all_decoded.append(r.read_batch(16))
        out = tmp_path / "leak.avi"
        assert splice_mjpeg_avis(segs, out)
        # chunk-identical to the concatenation of the inputs
        want = [c for s in segs for c in iter_video_chunks(s)]
        got = list(iter_video_chunks(out))
        assert len(got) == 12
        assert all(g == w for g, w in zip(got, want))
        # and decodes to the same pixels as the segments did
        with open_reader(out) as r:
            dec = r.read_batch(64)
        np.testing.assert_array_equal(dec, np.concatenate(all_decoded))

    def test_splice_refuses_mixed_geometry(self, tmp_path, rng):
        a, b = tmp_path / "a.avi", tmp_path / "b.avi"
        _write_avi(a, rng.randint(0, 256, (2, 48, 64, 3), np.uint8))
        _write_avi(b, rng.randint(0, 256, (2, 32, 64, 3), np.uint8))
        assert splice_mjpeg_avis([a, b], tmp_path / "o.avi") is False
        assert not (tmp_path / "o.avi").exists()

    def test_splice_refuses_non_avi(self, tmp_path):
        p = tmp_path / "x.avi"
        p.write_bytes(b"definitely not RIFF")
        assert splice_mjpeg_avis([p], tmp_path / "o.avi") is False


class TestLeakStreamCopy:
    def test_leak_concat_uses_stream_copy(self, tmp_path, rng):
        """concatenate_segments on .avi inputs/output produces the exact
        compressed chunks of the chosen segments (reference parity:
        generate_leak's -c copy concat)."""
        from vfp_tpu.fingerprint.leak import concatenate_segments

        segs = []
        for i in range(2):
            p = tmp_path / f"s{i}.avi"
            _write_avi(p, rng.randint(0, 256, (3, 48, 64, 3), np.uint8))
            segs.append(p)
        out = concatenate_segments(segs, tmp_path / "leak.avi")
        want = [c for s in segs for c in iter_video_chunks(s)]
        assert list(iter_video_chunks(out)) == want

    def test_splice_falls_back_on_truncated_movi(self, tmp_path, rng):
        """avi_meta cannot pre-validate movi (it skips it wholesale), so a
        mid-splice truncation must return False (frame-level fallback) and
        leave no partial output."""
        frames = rng.randint(0, 256, (4, 48, 64, 3), np.uint8)
        p = tmp_path / "t.avi"
        _write_avi(p, frames)
        data = p.read_bytes()
        p.write_bytes(data[: len(data) // 2])  # cut inside movi
        out = tmp_path / "o.avi"
        assert splice_mjpeg_avis([p], out) is False
        assert not out.exists()


class TestAviFuzz:
    """Corrupt/hostile AVI robustness: parse or IOError, promptly — never
    struct.error or an unbounded loop (io/mp4.py::TestFuzz is the MP4
    counterpart of this trust boundary)."""

    @staticmethod
    def _try_parse(path):
        import time

        from vfp_tpu.io.mp4 import track_from_mjpeg_avi

        t0 = time.monotonic()
        for fn in (avi_meta, lambda p: list(iter_video_chunks(p)),
                   track_from_mjpeg_avi):
            try:
                fn(path)
            except IOError:
                pass
        assert time.monotonic() - t0 < 5.0

    def test_truncations(self, tmp_path, rng):
        frames = rng.randint(0, 256, (4, 32, 48, 3), np.uint8)
        _write_avi(tmp_path / "a.avi", frames)
        raw = (tmp_path / "a.avi").read_bytes()
        p = tmp_path / "t.avi"
        for cut in list(range(0, len(raw), 197)) + [len(raw) - 1]:
            p.write_bytes(raw[:cut])
            self._try_parse(p)

    def test_byte_flips(self, tmp_path, rng):
        frames = rng.randint(0, 256, (4, 32, 48, 3), np.uint8)
        _write_avi(tmp_path / "a.avi", frames)
        raw = bytearray((tmp_path / "a.avi").read_bytes())
        frng = np.random.RandomState(7)
        p = tmp_path / "f.avi"
        for _ in range(200):
            mut = bytearray(raw)
            for _ in range(frng.randint(1, 9)):
                mut[frng.randint(len(mut))] = frng.randint(256)
            p.write_bytes(bytes(mut))
            self._try_parse(p)

    def test_short_header_boxes(self, tmp_path):
        """Tiny avih/strh payloads must raise IOError, not struct.error."""
        import struct as _s

        for boxes in (
            _s.pack("<4sI", b"avih", 8) + b"\x00" * 8,
            b"LIST" + _s.pack("<I", 24) + b"strl"
            + _s.pack("<4sI", b"strh", 8) + b"vids" + b"\x00" * 4,
        ):
            body = b"AVI " + boxes
            p = tmp_path / "s.avi"
            p.write_bytes(b"RIFF" + _s.pack("<I", len(body)) + body)
            with pytest.raises(IOError):
                avi_meta(p)

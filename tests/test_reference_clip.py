"""Acceptance tests on the reference's real H.264 fixture clip (read-only).

Gated on the reference tree being mounted; exercises real H.264 decode
through cv2 + the reference's canonical mark/detect behavior
(reference: tests/mark.py payload [0,1,1,0,0,1,0,1], readme.md:16-21).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

CLIP = "/root/reference/tests/media/in.mp4"

pytestmark = pytest.mark.skipif(not os.path.exists(CLIP), reason="reference clip absent")

PAYLOAD = np.array([0, 1, 1, 0, 0, 1, 0, 1])


class TestReferenceClip:
    def test_mark_detect_roundtrip(self, tmp_path):
        """The reference's mark.py/detect.py flow on its own clip."""
        from vfp_tpu.io import Cv2Reader, MjpegAviWriter, open_reader
        from vfp_tpu.pipeline import Embedder, Extractor, FrameExtractor, FrameMarker
        from vfp_tpu.wm import DeShuffler, DwtDctSvd, Shuffler

        reader = Cv2Reader(CLIP)
        assert (reader.width, reader.height) == (320, 240)
        codec = DwtDctSvd()
        wm = Shuffler(key=0).generate_wm(PAYLOAD, codec.wm_capacity((240, 320, 3)))
        out = tmp_path / "marked.avi"
        stats = Embedder(
            reader, FrameMarker(codec, wm, batch_size=16),
            MjpegAviWriter(out, 320, 240, fps=30, quality=95),
        ).start()
        assert stats.frames == 209

        deg = DeShuffler(key=0, threshold="fixed").set_shape(PAYLOAD.shape)
        res = Extractor(open_reader(out), FrameExtractor(codec, deg, 16)).start()
        pattern, freq = res.majority()
        np.testing.assert_array_equal(pattern, PAYLOAD)
        assert freq >= 0.95, freq

    def test_single_frame_oracle_interop(self, tmp_path):
        """A real H.264 frame marked by the reference math decodes here."""
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        import oracle
        from vfp_tpu.wm import DeShuffler, DwtDctSvd, Shuffler

        r = __import__("vfp_tpu.io", fromlist=["Cv2Reader"]).Cv2Reader(CLIP)
        frame = r.read_batch(1)[0]
        r.close()
        codec = DwtDctSvd()
        wm = Shuffler(key=0).generate_wm(PAYLOAD, codec.wm_capacity(frame.shape))
        marked = oracle.mark_frame_u8(frame, np.asarray(wm).flatten().astype(np.float64))
        bits = np.asarray(codec.extract_frames(jnp.asarray(marked[None])))[0]
        rec = DeShuffler(key=0).set_shape(PAYLOAD.shape).degenerate(bits)
        np.testing.assert_array_equal(rec, PAYLOAD)

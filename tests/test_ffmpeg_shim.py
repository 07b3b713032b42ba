"""Exercise the ffmpeg-backed container paths through a PATH shim.

This container has no ffmpeg binary, so every other test runs the cv2/raw
fallbacks; these tests install tests/ffmpeg_shim/ (fake ffmpeg + ffprobe over
the VFPRAWV1 container) on PATH and drive the real subprocess plumbing:
pipe reader/writer batching, probe, keyframed segmenting, stream-copy
concat, fMP4 HLS muxing, m4s remux, and the full hls-mark workflow.  The
shim rejects any argument pattern the real invocations don't use
(reference invocations: tests/mark_video_to_hls.py:45-71,143-211,
generate_leak.py:110-141, api/main.py:113-124).
"""

import os
import stat
from pathlib import Path

import numpy as np
import pytest

SHIM_DIR = Path(__file__).parent / "ffmpeg_shim"


@pytest.fixture
def with_ffmpeg_shim(monkeypatch):
    from vfp_tpu.io.ffmpeg import have_ffmpeg

    for name in ("ffmpeg", "ffprobe"):
        p = SHIM_DIR / name
        p.chmod(p.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    monkeypatch.setenv("PATH", f"{SHIM_DIR}{os.pathsep}{os.environ['PATH']}")
    have_ffmpeg.cache_clear()
    yield
    have_ffmpeg.cache_clear()


def write_clip(path, frames, fps=6.0):
    from vfp_tpu.io import RawVideoWriter

    with RawVideoWriter(path, frames.shape[2], frames.shape[1], fps=fps) as w:
        w.write_batch(frames)


def natural_frames(rng, b, h, w):
    small = rng.rand(b, h // 8, w // 8, 3)
    f = np.repeat(np.repeat(small, 8, axis=1), 8, axis=2) * 220 + rng.rand(b, h, w, 3) * 20
    return np.clip(f, 0, 255).astype(np.uint8)


class TestShimPlumbing:
    def test_probe_uses_ffprobe(self, with_ffmpeg_shim, tmp_path, rng):
        from vfp_tpu.io.probe import probe

        clip = tmp_path / "in.rawv"
        write_clip(clip, natural_frames(rng, 5, 48, 64), fps=6.0)
        info = probe(clip)
        assert (info["width"], info["height"]) == (64, 48)
        assert info["fps"] == 6.0 and info["frames"] == 5

    def test_pipe_reader_batches(self, with_ffmpeg_shim, tmp_path, rng):
        from vfp_tpu.io.ffmpeg import FFmpegPipeReader, have_ffmpeg

        assert have_ffmpeg()
        frames = natural_frames(rng, 7, 48, 64)
        clip = tmp_path / "in.rawv"
        write_clip(clip, frames)
        r = FFmpegPipeReader(clip)
        got = [r.read_batch(3), r.read_batch(3), r.read_batch(3)]
        assert r.read_batch(3) is None
        r.close()
        np.testing.assert_array_equal(np.concatenate([g for g in got if g is not None]), frames)

    def test_pipe_writer_roundtrip(self, with_ffmpeg_shim, tmp_path, rng):
        from vfp_tpu.io.ffmpeg import FFmpegPipeReader, FFmpegPipeWriter

        frames = natural_frames(rng, 4, 48, 64)
        out = tmp_path / "out.mp4"
        w = FFmpegPipeWriter(out, 64, 48, fps=6.0)
        w.write_batch(frames[:2])
        w.write_batch(frames[2:])
        w.close()
        r = FFmpegPipeReader(out)
        got = r.read_batch(10)
        r.close()
        np.testing.assert_array_equal(got, frames)

    def test_segmenting(self, with_ffmpeg_shim, tmp_path, rng):
        from vfp_tpu.io.ffmpeg import segment_video_ffmpeg
        from vfp_tpu.io.probe import probe

        frames = natural_frames(rng, 13, 48, 64)
        clip = tmp_path / "in.rawv"
        write_clip(clip, frames, fps=6.0)
        segment_video_ffmpeg(clip, tmp_path / "seg_%03d.mp4", segment_duration=1.0)
        segs = sorted(tmp_path.glob("seg_*.mp4"))
        assert len(segs) == 3  # 6 + 6 + 1 frames
        assert probe(segs[0])["frames"] == 6 and probe(segs[2])["frames"] == 1

    def test_concat_stream_copy(self, with_ffmpeg_shim, tmp_path, rng):
        from vfp_tpu.io.ffmpeg import concat_mp4_ffmpeg, FFmpegPipeReader

        a, b = natural_frames(rng, 3, 48, 64), natural_frames(rng, 2, 48, 64)
        write_clip(tmp_path / "a.rawv", a)
        write_clip(tmp_path / "b.rawv", b)
        concat_mp4_ffmpeg([tmp_path / "a.rawv", tmp_path / "b.rawv"], tmp_path / "out.mp4")
        r = FFmpegPipeReader(tmp_path / "out.mp4")
        got = r.read_batch(10)
        r.close()
        np.testing.assert_array_equal(got, np.concatenate([a, b]))

    def test_hls_muxing(self, with_ffmpeg_shim, tmp_path, rng):
        from vfp_tpu.io.ffmpeg import segments_to_hls_ffmpeg

        write_clip(tmp_path / "a.rawv", natural_frames(rng, 6, 48, 64), fps=6.0)
        write_clip(tmp_path / "b.rawv", natural_frames(rng, 6, 48, 64), fps=6.0)
        hls = tmp_path / "hls"
        hls.mkdir()
        master, playlist = segments_to_hls_ffmpeg(
            [tmp_path / "a.rawv", tmp_path / "b.rawv"], hls, segment_duration=1.0)
        m4s = sorted(hls.glob("segment_*.m4s"))
        assert len(m4s) == 2
        text = Path(playlist).read_text()
        assert "#EXTM3U" in text and m4s[0].name in text and "#EXT-X-ENDLIST" in text
        assert "playlist.m3u8" in Path(master).read_text()

    def test_m4s_remux(self, with_ffmpeg_shim, tmp_path, rng):
        from vfp_tpu.fingerprint.hls import mux_variant_to_m4s
        from vfp_tpu.io.ffmpeg import FFmpegPipeReader

        frames = natural_frames(rng, 3, 48, 64)
        write_clip(tmp_path / "marked.rawv", frames)
        mux_variant_to_m4s(tmp_path / "marked.rawv", tmp_path / "out.m4s")
        r = FFmpegPipeReader(tmp_path / "out.m4s")
        np.testing.assert_array_equal(r.read_batch(5), frames)
        r.close()


class TestShimWorkflows:
    def test_hls_mark_workflow_uses_ffmpeg_paths(self, with_ffmpeg_shim, tmp_path, rng):
        """Full hls-mark over the ffmpeg branch: .mp4 variants via the pipe
        writer, .m4s muxing, manifests — then verify payload recovery."""
        from vfp_tpu.fingerprint import (
            mark_segments, segment_video, verify_segment, write_hls_playlists)

        frames = natural_frames(rng, 12, 48, 64)
        src = tmp_path / "src.rawv"
        write_clip(src, frames, fps=6.0)
        segs = segment_video(src, tmp_path / "segments", 1.0)
        assert len(segs) == 2 and segs[0].suffix == ".mp4"
        marked, payloads, copies = mark_segments(segs, tmp_path / "marked", copies=2,
                                                 batch_size=4)
        assert all(m.file.endswith(".mp4") for m in marked)
        ok = sum(verify_segment(m.file, m.payload)[2] for m in marked)
        assert ok == len(marked) == 4
        master, playlist, seg_map, variant_files = write_hls_playlists(
            marked, tmp_path / "hls", copies=2, segment_duration=1.0)
        m4s = sorted((tmp_path / "hls").glob("*.m4s"))
        assert len(m4s) == 4  # every variant remuxed to a standalone fragment
        assert all(name.endswith(".m4s") for row in variant_files for name in row)

    def test_leak_and_trace_over_ffmpeg(self, with_ffmpeg_shim, tmp_path, rng):
        from vfp_tpu.fingerprint import (
            generate_leak, mark_segments, segment_video, trace_leak)
        from vfp_tpu.fingerprint.marker import write_manifests

        frames = natural_frames(rng, 12, 48, 64)
        src = tmp_path / "src.rawv"
        write_clip(src, frames, fps=6.0)
        segs = segment_video(src, tmp_path / "segments", 1.0)
        marked, payloads, copies = mark_segments(segs, tmp_path / "marked_segments",
                                                 copies=2, batch_size=4)
        write_manifests(tmp_path, payloads, copies)
        leaked, info = generate_leak(tmp_path / "segment_copies.json", pattern="10")
        assert str(leaked).endswith(".mp4")
        result = trace_leak(leaked, tmp_path / "detection",
                            payload_file=tmp_path / "segment_payloads.json",
                            segment_duration=1.0)
        assert result.fingerprint == info["pattern_string"] == "10"

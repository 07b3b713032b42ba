"""ffmpeg subprocess backend: batched rawvideo pipes + container workflows.

The preferred backend when an ffmpeg binary exists (this container has none,
so everything here is runtime-gated and exercised only where available).
Unlike the reference's per-frame pipe reads (reference:
src/offmark/video/frame_reader.py:53-64), reads and writes move whole batches
per syscall.

Also hosts the container-level workflow helpers the HLS fingerprinting
pipeline needs (segmenting, HLS muxing, concat), mirroring the reference's
ffmpeg invocations (reference: tests/mark_video_to_hls.py:45-71,143-211,
tests/generate_leak.py:110-141) with a cv2 fallback where possible.
"""

from __future__ import annotations

import shutil
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

from .probe import probe
from .readers import FrameReader
from .writers import FrameWriter


@lru_cache(maxsize=1)
def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def _require():
    if not have_ffmpeg():
        raise RuntimeError("ffmpeg binary not available")


class FFmpegPipeReader(FrameReader):
    """ffmpeg -i file -f rawvideo -pix_fmt rgb24 pipe: with batched reads."""

    def __init__(self, file):
        _require()
        info = probe(file)
        self.width, self.height = info["width"], info["height"]
        self.fps = info.get("fps", 30.0)
        self._frame_bytes = self.width * self.height * 3
        self.proc = subprocess.Popen(
            [
                "ffmpeg", "-loglevel", "quiet", "-i", str(file),
                "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:",
            ],
            stdout=subprocess.PIPE,
        )

    def read_batch(self, n: int) -> Optional[np.ndarray]:
        want = self._frame_bytes * n
        buf = bytearray()
        while len(buf) < want:
            chunk = self.proc.stdout.read(want - len(buf))
            if not chunk:
                break
            buf.extend(chunk)
        if not buf:
            return None
        k = len(buf) // self._frame_bytes
        if k * self._frame_bytes != len(buf):
            raise IOError("truncated rawvideo stream")
        return np.frombuffer(bytes(buf), np.uint8).reshape(k, self.height, self.width, 3)

    def close(self):
        self.proc.stdout.close()
        self.proc.wait()


class FFmpegPipeWriter(FrameWriter):
    """rawvideo rgb24 pipe -> H.264 yuv420p container (reference default)."""

    def __init__(self, file, width: int, height: int, fps: float = 30.0, crf: int | None = None):
        _require()
        args = [
            "ffmpeg", "-loglevel", "quiet", "-y",
            "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{width}x{height}",
            "-r", f"{fps}", "-i", "pipe:",
            "-pix_fmt", "yuv420p",
        ]
        if crf is not None:
            args += ["-crf", str(crf)]
        args.append(str(file))
        self.proc = subprocess.Popen(args, stdin=subprocess.PIPE)

    def write_batch(self, frames: np.ndarray):
        self.proc.stdin.write(np.ascontiguousarray(frames, dtype=np.uint8).tobytes())

    def close(self):
        self.proc.stdin.close()
        self.proc.wait()


# ---------------------------------------------------------------------------
# Container workflows (segment / HLS / concat)
# ---------------------------------------------------------------------------

def segment_video_ffmpeg(input_file, output_pattern, segment_duration: float = 2.0):
    """Re-encode-segment with forced keyframes at boundaries (reference:
    tests/mark_video_to_hls.py:45-71)."""
    _require()
    subprocess.run(
        [
            "ffmpeg", "-loglevel", "quiet", "-y", "-i", str(input_file),
            "-f", "segment", "-segment_time", str(segment_duration),
            "-reset_timestamps", "1",
            "-force_key_frames", f"expr:gte(t,n_forced*{segment_duration})",
            "-c:v", "libx264", "-preset", "fast", "-c:a", "aac", "-map", "0",
            str(output_pattern),
        ],
        check=True,
    )


def concat_mp4_ffmpeg(segment_files, output_file):
    """Stream-copy concat (reference: tests/generate_leak.py:110-141)."""
    import tempfile, os

    _require()
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for seg in segment_files:
            f.write(f"file '{os.path.abspath(seg)}'\n")
        lst = f.name
    try:
        subprocess.run(
            ["ffmpeg", "-loglevel", "quiet", "-y", "-f", "concat", "-safe", "0",
             "-i", lst, "-c", "copy", str(output_file)],
            check=True,
        )
    finally:
        os.unlink(lst)


def segments_to_hls_ffmpeg(segment_files, hls_dir, segment_duration: float = 2.0):
    """Concat-demux marked segments into one fMP4 HLS rendition (reference:
    tests/mark_video_to_hls.py:143-211). Returns (master, playlist)."""
    import tempfile, os

    _require()
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for seg in segment_files:
            f.write(f"file '{os.path.abspath(seg)}'\n")
        lst = f.name
    playlist = os.path.join(str(hls_dir), "playlist.m3u8")
    try:
        subprocess.run(
            [
                "ffmpeg", "-loglevel", "quiet", "-y", "-f", "concat", "-safe", "0",
                "-i", lst,
                "-force_key_frames", f"expr:gte(t,n_forced*{segment_duration})",
                "-c:v", "libx264", "-x264-params", "keyint=48:min-keyint=48",
                "-f", "hls", "-hls_time", str(segment_duration),
                "-hls_segment_type", "fmp4", "-hls_flags", "independent_segments",
                "-hls_segment_filename", os.path.join(str(hls_dir), "segment_%03d.m4s"),
                "-hls_list_size", "0", "-master_pl_name", "master.m3u8",
                playlist,
            ],
            check=True,
        )
    finally:
        os.unlink(lst)
    return os.path.join(str(hls_dir), "master.m3u8"), playlist

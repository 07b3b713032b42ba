"""Video segmentation on a fixed-duration grid.

With an ffmpeg binary: re-encode with forced keyframes at boundaries
(reference: tests/mark_video_to_hls.py:45-71).  Without one: frame-exact
chunking through the reader/writer stack — every segment gets exactly
round(duration * fps) frames, which is *more* precise than keyframe-dependent
cutting and makes leak re-segmentation align perfectly.
"""

from __future__ import annotations

import os
from pathlib import Path

from ..io import open_reader, open_writer
from ..io.ffmpeg import have_ffmpeg, segment_video_ffmpeg


def frames_per_segment(fps: float, segment_duration: float) -> int:
    return max(1, int(round(fps * segment_duration)))


def segment_video(
    input_file,
    segments_dir,
    segment_duration: float = 2.0,
    use_ffmpeg: bool | None = None,
    quality: int = 95,
):
    """Split into segment_000.<ext>, ... ; returns sorted list of paths."""
    segments_dir = Path(segments_dir)
    segments_dir.mkdir(parents=True, exist_ok=True)
    if use_ffmpeg is None:
        use_ffmpeg = have_ffmpeg()
    if use_ffmpeg:
        segment_video_ffmpeg(
            input_file, str(segments_dir / "segment_%03d.mp4"), segment_duration
        )
        return sorted(segments_dir.glob("segment_*.mp4"))

    reader = open_reader(input_file)
    n_per = frames_per_segment(reader.fps, segment_duration)
    paths = []
    idx = 0
    try:
        while True:
            got = 0
            writer = None
            while got < n_per:
                batch = reader.read_batch(min(16, n_per - got))
                if batch is None:
                    break
                if writer is None:
                    p = segments_dir / f"segment_{idx:03d}.avi"
                    writer = open_writer(p, reader.width, reader.height, reader.fps, quality)
                    paths.append(p)
                writer.write_batch(batch)
                got += len(batch)
            if writer is not None:
                writer.close()
            if got < n_per:
                break
            idx += 1
    finally:
        reader.close()
    return sorted(paths)

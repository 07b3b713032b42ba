"""Leak simulation: pick one variant per segment, splice into one video.

(reference: tests/generate_leak.py:59-141,426-461)
"""

from __future__ import annotations

import json
import random
from pathlib import Path

from ..io import open_reader, open_writer
from ..io.ffmpeg import concat_mp4_ffmpeg, have_ffmpeg


def select_copies(segment_copies_info: dict, marked_dir, pattern: str | None = None, random_seed=None):
    """One variant per segment by explicit digit pattern or seeded random
    (reference: tests/generate_leak.py:59-108). Returns (files, copy_pattern)."""
    if random_seed is not None:
        random.seed(random_seed)
    segments = segment_copies_info["segments"]
    order = sorted(int(s) for s in segments)
    files, copy_pattern = [], []
    if pattern is not None:
        if len(pattern) < len(order):
            raise ValueError(f"pattern '{pattern}' too short for {len(order)} segments")
        for i, seg in enumerate(order):
            variants = segments[str(seg)]
            c = int(pattern[i]) % len(variants)
            copy_pattern.append(c)
            files.append(Path(marked_dir) / variants[c]["file"])
    else:
        for seg in order:
            variants = segments[str(seg)]
            c = random.randint(0, len(variants) - 1)
            copy_pattern.append(c)
            files.append(Path(marked_dir) / variants[c]["file"])
    return files, copy_pattern


def concatenate_segments(segment_files, output_file):
    """Splice segments into one file. ffmpeg: stream-copy concat (no
    re-encode, reference behaviour); else frame-level splice through the
    reader/writer stack (one lossy generation, like a screen-recorder leak)."""
    if have_ffmpeg() and str(output_file).endswith(".mp4"):
        concat_mp4_ffmpeg(segment_files, output_file)
        return output_file
    first = open_reader(segment_files[0])
    w, h, fps = first.width, first.height, first.fps
    first.close()
    with open_writer(output_file, w, h, fps) as writer:
        for seg in segment_files:
            with open_reader(seg) as r:
                while True:
                    b = r.read_batch(32)
                    if b is None:
                        break
                    writer.write_batch(b)
    return output_file


def generate_leak(
    copies_file,
    output_file=None,
    pattern: str | None = None,
    random_seed=None,
    marked_dir=None,
):
    """End-to-end leak generation; writes leak_info.json next to the output
    (reference: tests/generate_leak.py:426-461). Returns (output_file, info)."""
    copies_file = Path(copies_file)
    info = json.loads(copies_file.read_text())
    base = copies_file.parent
    marked_dir = Path(marked_dir) if marked_dir else base / "marked_segments"
    files, copy_pattern = select_copies(info, marked_dir, pattern, random_seed)
    if output_file is None:
        ext = ".mp4" if have_ffmpeg() else Path(files[0]).suffix
        output_file = base / f"leaked_video{ext}"
    concatenate_segments(files, output_file)
    leak_info = {
        "copy_pattern": copy_pattern,
        "pattern_string": "".join(map(str, copy_pattern)),
        "selected_segments": [Path(f).name for f in files],
    }
    (Path(output_file).parent / "leak_info.json").write_text(json.dumps(leak_info, indent=2))
    return Path(output_file), leak_info

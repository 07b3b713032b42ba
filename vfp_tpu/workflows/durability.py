"""Durability experiment: mark -> splice -> re-encode -> re-segment -> detect.

Mirrors the reference harness (reference: tests/segment_mark_detect_hls.py):
segment the input, watermark each segment with an 8-bit binary encoding of
its segment number (reference: :42-55), verify detection on the marked
segments, run the full splice + re-encode + re-segment cycle, detect again,
and compare — pass bar is >= 75% segment-level preservation (reference: :500).

Without ffmpeg the "HLS conversion" leg is a frame-level splice into one
lossy MJPEG file and a frame-exact re-segmentation — one extra lossy
generation, the same durability question.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import numpy as np

from ..fingerprint.marker import mark_segments as _mark_generic  # noqa: F401  (API symmetry)
from ..fingerprint.marker import _read_all, verify_segment
from ..fingerprint.segmenter import segment_video
from ..fingerprint.leak import concatenate_segments
from ..io import open_writer
from ..pipeline import FrameMarker
from ..wm import DwtDctSvd, Shuffler

logger = logging.getLogger(__name__)


def payload_for_segment_8bit(segment_number: int) -> np.ndarray:
    """8-bit binary of segment# mod 256 (reference: segment_mark_detect_hls.py:42-55)."""
    return np.array([int(b) for b in format(segment_number % 256, "08b")])


def _detect_all(segment_files, key: int):
    results = []
    for i, seg in enumerate(segment_files):
        expected = payload_for_segment_8bit(i)
        pattern, freq, ok = verify_segment(seg, expected, key=key)
        results.append(
            {
                "segment": str(seg),
                "segment_number": i,
                "expected_payload": expected.tolist(),
                "pattern": pattern.tolist() if pattern is not None else None,
                "frequency": freq,
                "success": ok,
            }
        )
    return results


def run_durability(
    input_file,
    output_dir,
    segment_duration: float = 2.0,
    quality: int = 90,
    key: int = 0,
    batch_size: int = 16,
    codec=None,
):
    """Returns the analysis report dict (keys mirror the reference's
    analyze_results, segment_mark_detect_hls.py:320-386, plus wall_seconds)."""
    t0 = time.time()
    codec = codec or DwtDctSvd()
    base = Path(output_dir)
    marked_dir = base / "marked_segments"
    marked_dir.mkdir(parents=True, exist_ok=True)

    segments = segment_video(input_file, base / "segments", segment_duration)
    logger.info("created %d segments", len(segments))

    marked_files = []
    for i, seg in enumerate(segments):
        frames, fps = _read_all(seg)
        h, w = frames.shape[1:3]
        wm = Shuffler(key=key).generate_wm(
            payload_for_segment_8bit(i), codec.wm_capacity((h, w, 3))
        )
        fm = FrameMarker(codec, wm, batch_size=batch_size)
        out = marked_dir / f"marked_{Path(seg).name}"
        with open_writer(out, w, h, fps, quality) as writer:
            for s in range(0, len(frames), batch_size):
                writer.write_batch(fm.mark(frames[s : s + batch_size]))
        marked_files.append(out)

    original_results = _detect_all(marked_files, key)

    # splice -> one re-encoded video -> re-segment on the same grid
    spliced = base / ("full.mp4" if str(marked_files[0]).endswith(".mp4") else "full.avi")
    concatenate_segments(marked_files, spliced)
    resegmented = segment_video(spliced, base / "resegmented", segment_duration)
    reencoded_results = _detect_all(resegmented, key)

    orig_ok = sum(r["success"] for r in original_results)
    re_ok = sum(r["success"] for r in reencoded_results)
    pairs = min(len(original_results), len(reencoded_results))
    matches = sum(
        1
        for i in range(pairs)
        if original_results[i]["success"] and reencoded_results[i]["success"]
    )
    seg_rate = matches / pairs if pairs else 0.0
    segment_preservation = {
        str(i): {
            "original_pattern": original_results[i]["pattern"],
            "original_success": original_results[i]["success"],
            "reencoded_pattern": reencoded_results[i]["pattern"],
            "reencoded_success": reencoded_results[i]["success"],
            "preserved": original_results[i]["success"] and reencoded_results[i]["success"],
        }
        for i in range(pairs)
    }
    report = {
        "original_success": orig_ok,
        "original_total": len(original_results),
        "original_success_rate": orig_ok / len(original_results) if original_results else 0,
        "original_avg_frequency": float(np.mean([r["frequency"] for r in original_results])) if original_results else 0,
        "reencoded_success": re_ok,
        "reencoded_total": len(reencoded_results),
        "reencoded_success_rate": re_ok / len(reencoded_results) if reencoded_results else 0,
        "reencoded_avg_frequency": float(np.mean([r["frequency"] for r in reencoded_results])) if reencoded_results else 0,
        "preservation_rate": re_ok / orig_ok if orig_ok else 0.0,
        "segment_matches": matches,
        "segment_pairs": pairs,
        "segment_preservation_rate": seg_rate,
        "segment_preservation": segment_preservation,
        "is_successful": seg_rate >= 0.75,
        "wall_seconds": time.time() - t0,
        "original_results": original_results,
        "reencoded_results": reencoded_results,
    }
    return report

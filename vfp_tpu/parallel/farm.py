"""Segment farm: scale HLS marking across processes / hosts.

Segments are embarrassingly parallel (every frame carries the full payload;
outputs are per-segment files + mergeable JSON manifests), so the scaling
model is a work queue, not collectives (SURVEY.md §2.5):

* single host, many cores/chips: ``mark_segments_parallel`` forks worker
  processes, each taking a contiguous slice of segments (each worker keeps
  the one-decode-for-all-copies property and its own jit cache).
* many hosts: run one ``vfp_tpu.cli hls-mark --resume`` per host against a
  shared filesystem — the per-segment outputs are idempotent and the resume
  check makes overlapping work harmless; or initialize
  ``jax.distributed.initialize()`` and shard the segment list by
  ``jax.process_index()`` exactly like ``_slice`` below.

Workers run on CPU by default (JAX_PLATFORMS=cpu) so a farm can saturate
host decode/encode while the main process owns the TPU; pass
``worker_platform`` to change that.
"""

from __future__ import annotations

import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path


def _slice(n_items: int, n_workers: int, rank: int):
    per = -(-n_items // n_workers)
    return rank * per, min((rank + 1) * per, n_items)


def _worker(args):
    (segments, marked_dir, copies, key, batch_size, quality, out_ext,
     first_number, platform) = args
    os.environ.setdefault("JAX_PLATFORMS", platform)
    import jax

    try:
        jax.config.update("jax_platforms", platform)
    except Exception:
        pass
    from ..fingerprint.marker import mark_segments

    marked, payloads, copies_info = mark_segments(
        segments, marked_dir, copies=copies, key=key, batch_size=batch_size,
        quality=quality, out_ext=out_ext, resume=True,
        first_segment_number=first_number,
    )
    return (
        [(m.file, m.segment_number, m.copy_index, m.payload) for m in marked],
        payloads,
        copies_info["segments"],
    )


def mark_segments_parallel(
    segments,
    marked_dir,
    copies: int = 1,
    key: int = 0,
    workers: int = 2,
    batch_size: int = 16,
    quality: int = 95,
    out_ext: str = ".avi",
    worker_platform: str = "cpu",
):
    """Fan the segment x copies work queue over worker processes.

    Returns (marked, segment_payloads, segment_copies) with the same shapes
    as fingerprint.marker.mark_segments.
    """
    from ..fingerprint.marker import MarkedSegment

    segments = [str(s) for s in segments]
    marked_dir = Path(marked_dir)
    marked_dir.mkdir(parents=True, exist_ok=True)
    tasks = []
    for rank in range(workers):
        lo, hi = _slice(len(segments), workers, rank)
        if lo >= hi:
            continue
        tasks.append((segments[lo:hi], str(marked_dir), copies, key, batch_size,
                      quality, out_ext, lo, worker_platform))
    marked: list = []
    payloads: dict = {}
    seg_entries: dict = {}
    # spawn: forking a JAX-initialized parent deadlocks
    ctx = multiprocessing.get_context("spawn")
    with ProcessPoolExecutor(max_workers=len(tasks), mp_context=ctx) as pool:
        for m_list, p, entries in pool.map(_worker, tasks):
            marked.extend(MarkedSegment(*m) for m in m_list)
            payloads.update(p)
            seg_entries.update(entries)
    marked.sort(key=lambda m: (m.segment_number, m.copy_index))
    segment_copies = {
        "segments": seg_entries,
        "total_segments": len(segments),
        "copies_per_segment": copies,
        "total_marked_segments": len(marked),
    }
    return marked, payloads, segment_copies

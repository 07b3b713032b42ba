"""Segment farm: scale HLS marking across processes / hosts.

Segments are embarrassingly parallel (every frame carries the full payload;
outputs are per-segment files + mergeable JSON manifests), so the scaling
model is a work queue, not collectives (SURVEY.md §2.5):

* single host, many cores/chips: ``mark_segments_parallel`` forks worker
  processes, each taking a contiguous slice of segments (each worker keeps
  the one-decode-for-all-copies property and its own jit cache).
* many hosts: ``mark_segments_distributed`` — ``jax.distributed`` rank
  sharding over a shared filesystem.  Each process marks its contiguous
  slice, writes a per-rank manifest shard, and rank 0 merges after a
  cross-host barrier.  (Running one ``vfp_tpu.cli hls-mark --resume`` per
  host works too: per-segment outputs are idempotent.)

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


def merge_manifest_shards(shard_dir, world: int | None = None) -> tuple[list, dict, dict]:
    """Merge per-rank manifest shards (``manifest_rank*.json``) into the
    (marked, segment_payloads, segment_copies) triple of mark_segments.

    ``world`` bounds the ranks considered: a resume with a smaller world size
    leaves stale higher-rank shards from the previous run on disk, and merging
    those would double-count segments."""
    import json

    from ..fingerprint.marker import MarkedSegment

    marked: list = []
    payloads: dict = {}
    seg_entries: dict = {}
    total_segments = 0
    copies = 1
    for f in sorted(Path(shard_dir).glob("manifest_rank*.json")):
        try:
            rank = int(f.stem.removeprefix("manifest_rank"))
        except ValueError:
            continue
        if world is not None and rank >= world:
            continue
        shard = json.loads(f.read_text())
        marked.extend(MarkedSegment(*m) for m in shard["marked"])
        payloads.update(shard["payloads"])
        seg_entries.update(shard["segments"])
        total_segments += shard["n_segments"]
        copies = shard["copies"]
    marked.sort(key=lambda m: (m.segment_number, m.copy_index))
    segment_copies = {
        "segments": seg_entries,
        "total_segments": total_segments,
        "copies_per_segment": copies,
        "total_marked_segments": len(marked),
    }
    return marked, payloads, segment_copies


def mark_segments_distributed(
    segments,
    marked_dir,
    copies: int = 1,
    key: int = 0,
    batch_size: int = 16,
    quality: int = 95,
    out_ext: str = ".avi",
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Multi-host segment farm over ``jax.distributed`` + a shared filesystem.

    Every participating process calls this with the same arguments
    (``marked_dir`` on a filesystem all hosts see).  Process ``i`` of ``N``
    marks segments [ceil(S/N)*i, ceil(S/N)*(i+1)) — the same contiguous
    ``_slice`` as the process farm — writes ``manifest_rank{i}.json``, and
    after a global barrier rank 0 merges the shards and returns the full
    (marked, payloads, segment_copies) triple; other ranks return their own
    shard's triple.  Initialization follows jax.distributed semantics: with
    no explicit arguments, cluster-autodetect / env vars apply; single
    process (num_processes=1) needs no coordinator and is how the unit test
    runs this path.
    """
    import json

    import jax

    # init only when not already initialized (re-init raises RuntimeError).
    # Probe via is_initialized(), NOT jax.process_count(): the latter
    # initializes the local backend, after which distributed.initialize can
    # no longer take effect
    if not jax.distributed.is_initialized() and (
        coordinator_address or (num_processes or 1) > 1
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    rank, world = jax.process_index(), jax.process_count()
    segments = [str(s) for s in segments]
    marked_dir = Path(marked_dir)
    marked_dir.mkdir(parents=True, exist_ok=True)
    lo, hi = _slice(len(segments), world, rank)

    from ..fingerprint.marker import mark_segments

    marked, payloads, copies_info = mark_segments(
        segments[lo:hi], marked_dir, copies=copies, key=key,
        batch_size=batch_size, quality=quality, out_ext=out_ext, resume=True,
        first_segment_number=lo,
    )
    shard = {
        "marked": [[m.file, m.segment_number, m.copy_index, m.payload] for m in marked],
        "payloads": payloads,
        "segments": copies_info["segments"],
        "n_segments": hi - lo,
        "copies": copies,
    }
    (marked_dir / f"manifest_rank{rank}.json").write_text(json.dumps(shard))

    if world > 1:  # cross-host barrier before the merge reads all shards
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("vfp_farm_shards")
    if rank == 0:
        return merge_manifest_shards(marked_dir, world=world)
    return marked, payloads, copies_info

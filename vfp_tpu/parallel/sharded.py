"""Sharded mark/detect steps over a ('data', 'variant') mesh.

Design (SURVEY.md §2.5): the frame batch shards over 'data' (DP), the
watermark-variant axis shards over 'variant' (the copies axis of the HLS
workflow — each device embeds a different payload plane into its replica of
the frames, the expert-parallel analogue for this workload).  Detection
aggregates per-frame payload votes with a psum over 'data' — the collective
rides ICI; nothing else needs to communicate because every frame carries the
full payload independently.

Built with shard_map so the per-device program is exactly the single-chip
codec — no resharding surprises from the compiler.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_mark_step(mesh: Mesh, codec):
    """jitted (frames [B,H,W,3] u8, wms [V,capacity] f32) -> [V,B,H,W,3] u8.

    B shards over 'data', V (variants) over 'variant'; each device marks its
    frame shard with its variant shard.  Zero collectives — map-parallel.
    """

    def per_device(frames, wms):
        # frames: [b, H, W, 3], wms: [v, cap]
        def one_variant(wm):
            return codec.mark_frames(frames, wm)

        return jax.vmap(one_variant)(wms)  # [v, b, H, W, 3]

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("data"), P("variant")),
        out_specs=P("variant", "data"),
    )
    return jax.jit(fn)


def sharded_detect_step(mesh: Mesh, codec, degenerator, candidates: int):
    """jitted (frames [B,H,W,3] u8, payloads [C,P] f32) -> vote counts [C].

    Decodes the frame shard, despreads to per-frame payloads, compares each
    against all candidate payloads at once, and psums the per-candidate vote
    counts over 'data' (replicated result).  One decode for all candidates —
    the redesign of the reference's O(candidates x frames) loop
    (reference: tests/detect_watermarks.py:325-344).
    """

    def per_device(frames, cand):
        bits = codec.extract_frames(frames)  # [b, capacity]
        payloads = degenerator.degenerate_batch(bits).astype(jnp.int32)  # [b, P]
        match = jnp.all(payloads[:, None, :] == cand[None, :, :].astype(jnp.int32), axis=-1)
        votes = jnp.sum(match, axis=0)  # [C]
        return jax.lax.psum(votes, "data")

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_mark_spatial(mesh: Mesh, codec, width: int):
    """jitted (frames [B,H,W,3] u8 W-sharded over 'data', wm2d [nbh, nbw]) ->
    marked frames, W-sharded — the tensor-parallel analogue for frames too
    large for one chip's HBM (SURVEY §2.5: shard H x W of very large frames).

    The codec's 8x8-pixel block structure is lane-local, so slicing W at
    8-aligned boundaries needs no halo exchange: each device embeds its
    width slice with its slice of the watermark block columns.  Requires
    W % (8 * n_devices) == 0.
    """
    n = mesh.shape["data"]
    if width % (8 * n):
        raise ValueError(f"W={width} must be a multiple of {8 * n} for spatial sharding")

    def per_device(frames, wm2d):
        # frames: [B, H, W/n, 3]; wm2d: [nbh, nbw/n] (matching block columns)
        return codec.mark_frames(frames, wm2d.reshape(-1))

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None, None, "data", None), P(None, "data")),
        out_specs=P(None, None, "data", None),
    )
    return jax.jit(fn)


def shard_batch(mesh: Mesh, frames):
    """Place a host batch with B sharded over 'data'."""
    return jax.device_put(frames, NamedSharding(mesh, P("data")))

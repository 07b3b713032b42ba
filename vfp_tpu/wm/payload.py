"""Keyed payload spreading (generator) and recovery (degenerator) codecs.

Mirrors the behaviour of the reference's generator/degenerator pairs
(reference: src/offmark/generator/shuffler.py:15-25,
src/offmark/degenerator/de_shuffler.py:8-22, generator/grayscale.py:16-31,
degenerator/de_grayscale.py:8-23) with the same keyed
``np.random.RandomState(key)`` permutations, so payloads spread by either
implementation are recoverable by the other.

Spreading (host-side, once per payload) stays in NumPy; recovery runs per
frame in the hot path, so it is a pure jittable JAX function batched over
frames.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def keyed_shuffle_indices(key, n: int) -> np.ndarray:
    """The permutation np.random.RandomState(key).shuffle applies to arange(n)."""
    idx = np.arange(n)
    np.random.RandomState(key).shuffle(idx)
    return idx


def _tile_to(payload_flat: np.ndarray, total: int) -> np.ndarray:
    reps = int(math.ceil(total / payload_flat.size))
    return np.tile(payload_flat, reps)[:total]


def despread_mean(wm_flat: jnp.ndarray, payload_len: int, total_len: int) -> jnp.ndarray:
    """Per-position mean over the tiled repeats: out[i] = mean(wm[i::P]).

    ``wm_flat`` is [..., total_len]; returns [..., payload_len].  Handles
    total_len not divisible by payload_len exactly like the reference's
    strided ``.mean()`` (reference: de_shuffler.py:17-18).
    """
    reps = -(-total_len // payload_len)
    pad = reps * payload_len - total_len
    x = jnp.pad(wm_flat, [(0, 0)] * (wm_flat.ndim - 1) + [(0, pad)])
    x = x.reshape(*wm_flat.shape[:-1], reps, payload_len)
    # counts[i] = number of valid entries at stride positions i, i+P, ...
    counts = np.array(
        [(total_len - i + payload_len - 1) // payload_len for i in range(payload_len)],
        dtype=np.float32,
    )
    return jnp.sum(x, axis=-2) / jnp.asarray(counts)


def _unshuffle(vals: jnp.ndarray, key) -> jnp.ndarray:
    """Invert the keyed shuffle: out[idx] = vals (reference: de_shuffler.py:19)."""
    p = vals.shape[-1]
    idx = jnp.asarray(keyed_shuffle_indices(key, p))
    out = jnp.zeros_like(vals)
    return out.at[..., idx].set(vals)


def _threshold_mid(vals: jnp.ndarray) -> jnp.ndarray:
    """Binarize at the midpoint of (min, max) (reference: de_shuffler.py:20-21).

    Parity quirk: a constant payload (e.g. all zeros — segment 0 copy 0 of
    the HLS workflow) is unrecoverable under this rule the moment any mean
    wobbles, because the midpoint splits the noise.  The reference inherits
    this; ``threshold='fixed'`` avoids it when the watermark plane is known
    to be 0/1 bits.
    """
    thr = 0.5 * (jnp.max(vals, axis=-1, keepdims=True) + jnp.min(vals, axis=-1, keepdims=True))
    return (vals > thr).astype(jnp.uint8)


def _threshold_fixed(vals: jnp.ndarray) -> jnp.ndarray:
    """Binarize at absolute 0.5 — exact for 0/1 bit planes, robust for
    constant payloads."""
    return (vals > 0.5).astype(jnp.uint8)


class Shuffler:
    """Bit-payload spreader: keyed shuffle + tile to capacity."""

    wm_kind = "bits"

    def __init__(self, key=None):
        self.key = key

    @staticmethod
    def wm_type() -> str:
        return "bits"

    def generate_wm(self, payload: np.ndarray, capacity) -> np.ndarray:
        total = int(np.prod(np.asarray(capacity)))
        p = np.array(payload).flatten().copy()
        np.random.RandomState(self.key).shuffle(p)
        return _tile_to(p, total).reshape(capacity)


class DeShuffler:
    """Inverse of :class:`Shuffler`: strided mean, unshuffle, threshold.

    ``threshold='midpoint'`` reproduces the reference exactly;
    ``'fixed'`` binarizes at absolute 0.5 (see :func:`_threshold_mid`).
    """

    def __init__(self, key=None, threshold: str = "midpoint"):
        self.key = key
        self.payload_len = None
        self._thr = _threshold_fixed if threshold == "fixed" else _threshold_mid

    def set_shape(self, payload_shape):
        self.payload_shape = tuple(np.atleast_1d(payload_shape))
        self.payload_len = int(np.prod(np.asarray(payload_shape)))
        return self

    def degenerate_batch(self, wm: jnp.ndarray) -> jnp.ndarray:
        """[..., total] float watermark plane(s) -> [..., payload_len] uint8 bits."""
        total = wm.shape[-1]
        means = despread_mean(wm, self.payload_len, total)
        return self._thr(_unshuffle(means, self.key))

    def degenerate(self, wm) -> np.ndarray:
        """Single-plane NumPy-compatible entry point (reference API shape)."""
        flat = jnp.asarray(np.asarray(wm), jnp.float32).reshape(-1)
        return np.asarray(self.degenerate_batch(flat[None])[0])

    def degenerate_batch_np(self, wm: np.ndarray) -> np.ndarray:
        """Pure-NumPy twin of :meth:`degenerate_batch` for the host-only
        transport (pipeline/lowlink.py wire='host'), which must not touch
        the JAX backend at all: [..., total] f32 -> [..., payload_len] u8."""
        wm = np.asarray(wm, np.float32)
        total, p = wm.shape[-1], self.payload_len
        reps = -(-total // p)
        x = np.pad(wm, [(0, 0)] * (wm.ndim - 1) + [(0, reps * p - total)])
        x = x.reshape(*wm.shape[:-1], reps, p)
        counts = np.array([(total - i + p - 1) // p for i in range(p)], np.float32)
        means = x.sum(axis=-2) / counts
        out = np.zeros_like(means)
        out[..., keyed_shuffle_indices(self.key, p)] = means
        if self._thr is _threshold_fixed:
            return (out > 0.5).astype(np.uint8)
        thr = 0.5 * (out.max(-1, keepdims=True) + out.min(-1, keepdims=True))
        return (out > thr).astype(np.uint8)


class GrayScale:
    """Image-payload spreader: binarize at 127, keyed shuffle, tile.

    (reference: src/offmark/generator/grayscale.py:16-31)
    """

    wm_kind = "grayscale"

    def __init__(self, key=None):
        self.key = key

    @staticmethod
    def wm_type() -> str:
        return "grayscale"

    def generate_wm(self, payload: np.ndarray, capacity) -> np.ndarray:
        total = int(np.prod(np.asarray(capacity)))
        bits = (np.asarray(payload) > 127).astype(np.uint8).flatten()
        np.random.RandomState(self.key).shuffle(bits)
        return _tile_to(bits, total).reshape(capacity)


class DeGrayScale:
    """Inverse of :class:`GrayScale`: returns a 0/255 image of payload shape.

    (reference: src/offmark/degenerator/de_grayscale.py:8-23)
    """

    def __init__(self, key=None):
        self.key = key

    def set_shape(self, payload_shape):
        self.payload_shape = tuple(payload_shape)
        self.payload_len = int(np.prod(np.asarray(payload_shape)))
        return self

    def degenerate_batch(self, wm: jnp.ndarray) -> jnp.ndarray:
        total = wm.shape[-1]
        means = despread_mean(wm, self.payload_len, total)
        bits = _threshold_mid(_unshuffle(means, self.key))
        return (bits * 255).reshape(*wm.shape[:-1], *self.payload_shape)

    def degenerate(self, wm) -> np.ndarray:
        flat = jnp.asarray(np.asarray(wm), jnp.float32).reshape(-1)
        return np.asarray(self.degenerate_batch(flat[None])[0])

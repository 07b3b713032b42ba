"""Parity tests for the payload spread/recovery codecs vs the reference math."""

import numpy as np
import jax.numpy as jnp

from vfp_tpu.wm import Shuffler, DeShuffler, GrayScale, DeGrayScale, despread_mean


def _ref_generate(payload, capacity, key):
    """Reference Shuffler.generate_wm (generator/shuffler.py:15-25) formula."""
    import math

    length = int(np.prod(np.asarray(capacity)))
    p = np.copy(payload)
    c = int(math.ceil(length / p.size))
    np.random.RandomState(key).shuffle(p)
    return np.stack([p for _ in range(c)]).flatten()[:length].reshape(capacity)


def _ref_degenerate(wm, payload_len, key):
    """Reference DeShuffler.degenerate (de_shuffler.py:14-22) formula."""
    bits = wm.flatten()
    payload = np.zeros(payload_len)
    for i in range(payload_len):
        payload[i] = bits[i::payload_len].mean()
    idx = np.arange(payload_len)
    np.random.RandomState(key).shuffle(idx)
    payload[idx] = payload.copy()
    thr = 0.5 * (payload.max() + payload.min())
    return (payload > thr).astype(np.uint8)


class TestShuffler:
    def test_generate_matches_reference(self):
        payload = np.array([0, 1, 1, 0, 0, 1, 0, 1])
        for key in (0, 7, 42):
            got = Shuffler(key=key).generate_wm(payload, (1, 100))
            want = _ref_generate(payload, (1, 100), key)
            np.testing.assert_array_equal(got, want)

    def test_degenerate_matches_reference(self, rng):
        payload = np.array([0, 1, 1, 0, 0, 1, 0, 1])
        for key in (0, 5):
            wm = _ref_generate(payload, (1, 103), key).astype(np.float64)
            noisy = wm + rng.randn(*wm.shape) * 0.2
            got = DeShuffler(key=key).set_shape(payload.shape).degenerate(noisy)
            want = _ref_degenerate(noisy, 8, key)
            np.testing.assert_array_equal(got, want)
            np.testing.assert_array_equal(got, payload)

    def test_roundtrip_non_divisible(self):
        payload = np.array([1, 0, 1, 1, 0, 0, 1, 0])
        wm = Shuffler(key=3).generate_wm(payload, (1, 101))
        got = DeShuffler(key=3).set_shape(payload.shape).degenerate(wm.astype(np.float32))
        np.testing.assert_array_equal(got, payload)

    def test_despread_mean_strided(self, rng):
        x = rng.rand(2, 23).astype(np.float32)
        got = np.asarray(despread_mean(jnp.asarray(x), 5, 23))
        for b in range(2):
            for i in range(5):
                np.testing.assert_allclose(got[b, i], x[b, i::5].mean(), rtol=1e-5)

    def test_batched_degenerate(self, rng):
        payload = np.array([0, 1, 1, 0, 0, 1, 0, 1])
        wm = Shuffler(key=0).generate_wm(payload, (1, 64)).astype(np.float32)
        batch = jnp.asarray(np.stack([wm.flatten()] * 3))
        out = DeShuffler(key=0).set_shape(payload.shape).degenerate_batch(batch)
        for i in range(3):
            np.testing.assert_array_equal(np.asarray(out[i]), payload)


class TestGrayScale:
    def test_roundtrip_image(self, rng):
        img = (rng.rand(6, 8) * 255).astype(np.uint8)
        wm = GrayScale(key=1).generate_wm(img, (1, 300))
        out = DeGrayScale(key=1).set_shape(img.shape).degenerate(wm.astype(np.float32))
        np.testing.assert_array_equal(out, (img > 127).astype(np.uint8) * 255)

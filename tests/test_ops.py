"""Golden-vector tests for core ops against cv2 / NumPy."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from vfp_tpu.ops import (
    bgr_to_yuv,
    yuv_to_bgr,
    haar_dwt2,
    haar_idwt2,
    dct2,
    idct2,
    to_blocks,
    from_blocks,
    top_singular_triplet,
    top_singular_value,
)


class TestColor:
    def test_bgr_to_yuv_matches_cv2(self, rng):
        img = rng.randint(0, 256, (32, 48, 3)).astype(np.float32)
        want = cv2.cvtColor(img, cv2.COLOR_BGR2YUV)
        got = np.asarray(bgr_to_yuv(jnp.asarray(img)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_yuv_to_bgr_matches_cv2(self, rng):
        img = rng.rand(32, 48, 3).astype(np.float32) * 255
        want = cv2.cvtColor(img, cv2.COLOR_YUV2BGR)
        got = np.asarray(yuv_to_bgr(jnp.asarray(img)))
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_batched(self, rng):
        imgs = rng.rand(4, 16, 16, 3).astype(np.float32) * 255
        got = np.asarray(bgr_to_yuv(jnp.asarray(imgs)))
        for i in range(4):
            want = cv2.cvtColor(imgs[i], cv2.COLOR_BGR2YUV)
            np.testing.assert_allclose(got[i], want, atol=2e-4)


class TestHaar:
    def test_ll_is_pywt_haar_ll(self, rng):
        # pywt 'haar' LL = (a+b+c+d)/2 (orthonormal)
        x = rng.rand(8, 8).astype(np.float32)
        ll, *_ = haar_dwt2(jnp.asarray(x))
        want = (x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]) * 0.5
        np.testing.assert_allclose(np.asarray(ll), want, rtol=1e-6)

    def test_roundtrip_identity(self, rng):
        x = rng.rand(3, 64, 96).astype(np.float32) * 255
        out = haar_idwt2(*haar_dwt2(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)

    def test_energy_preserved(self, rng):
        x = rng.rand(16, 16).astype(np.float32)
        bands = haar_dwt2(jnp.asarray(x))
        e = sum(float(jnp.sum(b * b)) for b in bands)
        np.testing.assert_allclose(e, float(np.sum(x * x)), rtol=1e-5)


class TestDct:
    @pytest.mark.parametrize("n", [4, 8])
    def test_matches_cv2(self, rng, n):
        blocks = rng.rand(10, n, n).astype(np.float32) * 255
        got = np.asarray(dct2(jnp.asarray(blocks)))
        for i in range(10):
            np.testing.assert_allclose(got[i], cv2.dct(blocks[i]), atol=1e-3)

    @pytest.mark.parametrize("n", [4, 8])
    def test_idct_matches_cv2(self, rng, n):
        blocks = rng.rand(10, n, n).astype(np.float32) * 255
        got = np.asarray(idct2(jnp.asarray(blocks)))
        for i in range(10):
            np.testing.assert_allclose(got[i], cv2.idct(blocks[i]), atol=1e-3)

    def test_roundtrip(self, rng):
        x = rng.rand(5, 4, 4).astype(np.float32) * 100
        np.testing.assert_allclose(np.asarray(idct2(dct2(jnp.asarray(x)))), x, atol=1e-4)


class TestBlocks:
    def test_roundtrip_and_order(self, rng):
        img = np.arange(8 * 12, dtype=np.float32).reshape(8, 12)
        blocks = np.asarray(to_blocks(jnp.asarray(img), 4))
        assert blocks.shape == (6, 4, 4)
        # row-major block scan order (parity with reference loop)
        np.testing.assert_array_equal(blocks[0], img[0:4, 0:4])
        np.testing.assert_array_equal(blocks[1], img[0:4, 4:8])
        np.testing.assert_array_equal(blocks[3], img[4:8, 0:4])
        back = np.asarray(from_blocks(jnp.asarray(blocks), 8, 12))
        np.testing.assert_array_equal(back, img)


class TestSvd4:
    def test_s0_matches_lapack(self, rng):
        b = rng.randn(2000, 4, 4).astype(np.float32) * 50
        want = np.linalg.svd(b, compute_uv=False)[:, 0]
        got = np.asarray(top_singular_value(jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)

    def test_triplet_consistency(self, rng):
        b = rng.randn(500, 4, 4).astype(np.float32) * 20
        s0, u, v = top_singular_triplet(jnp.asarray(b))
        s0, u, v = map(np.asarray, (s0, u, v))
        # B v = s0 u
        bv = np.einsum("nij,nj->ni", b, v)
        np.testing.assert_allclose(bv, s0[:, None] * u, atol=5e-2)
        np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)

    def test_rank1_update_changes_s0_exactly(self, rng):
        """B + (t - s0) u v^T must have top singular value t (the QIM rewrite)."""
        b = rng.randn(300, 4, 4).astype(np.float32) * 30
        s0, u, v = map(np.asarray, top_singular_triplet(jnp.asarray(b)))
        t = s0 + 7.5
        b2 = b + (t - s0)[:, None, None] * np.einsum("ni,nj->nij", u, v)
        got = np.linalg.svd(b2, compute_uv=False)[:, 0]
        np.testing.assert_allclose(got, t, rtol=5e-4, atol=2e-2)

    def test_zero_block(self):
        b = jnp.zeros((3, 4, 4))
        s0, u, v = top_singular_triplet(b)
        assert np.all(np.isfinite(np.asarray(u)))
        np.testing.assert_allclose(np.asarray(s0), 0.0)

    def test_dc_block(self):
        # constant blocks: DCT is a single corner coefficient -> rank 1
        b = dct2(jnp.full((2, 4, 4), 100.0))
        s0 = np.asarray(top_singular_value(b))
        np.testing.assert_allclose(s0, 400.0, rtol=1e-4)

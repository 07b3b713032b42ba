"""Pallas kernel parity tests (interpreter mode on CPU; the same kernels
compile to Mosaic on real TPU — exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp

from vfp_tpu.kernels import qim_embed_soa, qim_decode_soa
from vfp_tpu.ops.soa import dct_soa, idct_soa, rank1_update_soa, top_triplet_soa

SCALE = 15.0


def _ref_embed(m, wm, scale):
    d = dct_soa(m)
    s0, u, v = top_triplet_soa(d, method="power", iters=4)
    s_new = (jnp.floor(s0 / scale) + 0.25 + 0.5 * wm[None, :]) * scale
    return idct_soa(rank1_update_soa(d, s_new - s0, u, v))


class TestQimKernels:
    def test_embed_matches_xla(self, rng):
        m = jnp.asarray(rng.rand(2, 16, 700).astype(np.float32) * 300)
        wm = jnp.asarray(rng.randint(0, 2, 700).astype(np.float32))
        want = np.asarray(_ref_embed(m, wm, SCALE))
        got = np.asarray(qim_embed_soa(m, wm, SCALE, interpret=True))
        assert got.shape == (2, 16, 700)
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_decode_roundtrip(self, rng):
        m = jnp.asarray(rng.rand(2, 16, 1024).astype(np.float32) * 300)
        wm = jnp.asarray(rng.randint(0, 2, 1024).astype(np.float32))
        marked = qim_embed_soa(m, wm, SCALE, interpret=True)
        bits = np.asarray(qim_decode_soa(marked, SCALE, interpret=True))
        assert (bits == np.asarray(wm)).mean() > 0.999

    def test_zero_blocks(self):
        m = jnp.zeros((1, 16, 512))
        wm = jnp.ones(512)
        out = np.asarray(qim_embed_soa(m, wm, SCALE, interpret=True))
        assert np.all(np.isfinite(out))
        bits = np.asarray(qim_decode_soa(jnp.asarray(out), SCALE, interpret=True))
        assert (bits == 1.0).mean() > 0.999

    def test_nonaligned_lanes(self, rng):
        """N not a multiple of the 512-lane tile: padding must not leak."""
        for n in (1, 511, 513, 1000):
            m = jnp.asarray(rng.rand(1, 16, n).astype(np.float32) * 100)
            wm = jnp.asarray(rng.randint(0, 2, n).astype(np.float32))
            out = qim_embed_soa(m, wm, SCALE, interpret=True)
            assert out.shape == (1, 16, n)
            bits = np.asarray(qim_decode_soa(out, SCALE, interpret=True))
            assert (bits == np.asarray(wm)).all(), n

"""Fused DT-CWT delta synthesis: level-3 subband deltas -> pixel plane in
ONE Pallas launch (the embed path's entire synthesis chain).

The embed delta lives only in the deepest level's highpasses, so its
inverse runs: a full q-shift synthesis at level 3, then lowpass-only
q-shift (level 2) and LeGall (level 1) syntheses (wm/dtcwt_codecs.py
`_embed_delta_from_ll1`).  As three kernels this cost two inter-stage HBM
round trips, two wrap-pads, three `_finish` interleave passes and three
launch/dispatch sweeps — the r5 stage profile (tools/profile_dtcwt_stages.py)
attributed ~1.1 ms of the 6.7 ms 8-frame mark wall to it.  Here one grid
cell produces 64 output rows from a 32-row level-3 window, chaining all
three stages in VMEM:

* rows: per-stage [out, in] matrices (upsample x filter x circular roll
  folded in), block-diagonal per row tree over sublane-stacked planes.
  Window offsets are grid-invariant, so the matrices are compile-time
  constants.  Windows: l3 [8g-8, 8g+24) -> ll2 [16g-8, 16g+32) ->
  ll1 [32g-8, 32g+40) -> du [64g, 64g+64): every row the next stage's
  taps touch is accurate (filters with NEGATIVE rolls read downward, so
  halos trail below; verified exactly against the 3-kernel chain).
* columns: polyphase all the way down — level-l data lives on the LEVEL-3
  lane grid as 2^l phase planes.  For z[n] = sum_k f[k] y2[n - rc - k]
  with y2[2j+cp] = y[j] and y phase-major over Pin planes, output phase
  po at t reads input phase (e % Pin) at t + e//Pin with e =
  (po - rc - k - cp)/2 — e >= 0 for these filter/roll pairs, so ALL
  column reads go right and a 16-lane wrapped RIGHT margin makes circular
  boundaries exact (max cumulative reach 7+4+1 = 12).
* interleave: du's 8 column phases spread into pixel columns via
  0/0.25 selection matmuls over 128-lane segments (the same matrix for
  every segment), folding the 4-tree average — no XLA `_finish` pass and
  no phase-major HBM traffic at all.

Reference behavior: dtcwt package Transform2d.inverse per
src/offmark/embed/dtcwt_key_encoder.py:36 (re-derived, not copied).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import dtcwt_coeffs as C
from .dtcwt_level1 import _round_up, dot_exact, exact_or_scaled, _row_dot_q

_TREES = ((0, 0), (0, 1), (1, 0), (1, 1))
W3R, W2R, W1R, OUTR = 32, 40, 48, 64  # rows per stage window / output strip
RMARGIN = 16  # right wrapped column margin (max cumulative read 12)


def _stage_col_taps(f, cp: int, rc: int, pin: int):
    """dict[po] -> [(pi, s, coef)]: output phase po at lane t reads input
    phase pi at lane t + s (see module docstring)."""
    out = {}
    for po in range(2 * pin):
        taps = []
        for k in range(len(f)):
            e2 = po - rc - k - cp
            if e2 % 2:
                continue
            e = e2 // 2
            assert e >= 0, "column reads must go right (negative rolls)"
            taps.append((e % pin, e // pin, float(f[k])))
        out[po] = taps
    return out


def _stage_row_matrix(f, rc: int, rp: int, delta: int, n_out: int, n_in: int):
    """out[r] = sum_j M[r, j] in[j] with k = r - rc - rp - 2j + delta."""
    m = np.zeros((n_out, n_in), np.float32)
    for r in range(n_out):
        for j in range(n_in):
            k = r - rc - rp - 2 * j + delta
            if 0 <= k < len(f):
                m[r, j] = f[k]
    return m


def _kron(n: int, m: np.ndarray) -> np.ndarray:
    return np.kron(np.eye(n, dtype=np.float32), m)


@lru_cache(maxsize=None)
def _consts_delta(wcol: int):
    g0 = {0: np.asarray(C.QSHIFT_G0A), 1: np.asarray(C.QSHIFT_G0B)}
    g1 = {0: np.asarray(C.QSHIFT_G1A), 1: np.asarray(C.QSHIFT_G1B)}
    rcq, rcl = C.QSHIFT_ROLL_A, C.LEGALL_ROLL
    taps_a = {ct: {0: _stage_col_taps(g0[ct], 0, rcq, 1),
                   1: _stage_col_taps(g1[ct], 0, rcq, 1)} for ct in range(2)}
    taps_b = {ct: _stage_col_taps(g0[ct], 0, rcq, 2) for ct in range(2)}
    taps_c = {ct: _stage_col_taps(np.asarray(C.LEGALL_G0), ct, rcl, 4)
              for ct in range(2)}
    # row matrices; window offset deltas: A/B = 8, C = 16 (see docstring)
    ra0 = np.stack([_kron(2, _stage_row_matrix(g0[rt], rcq, 0, 8, W2R, W3R))
                    for rt in range(2)])          # lh rows   [2, 80, 64]
    ra1 = np.stack([_kron(4, _stage_row_matrix(g1[rt], rcq, 0, 8, W2R, W3R))
                    for rt in range(2)])          # hl+hh     [2, 160, 128]
    rb = np.stack([_kron(4, _stage_row_matrix(g0[rt], rcq, 0, 8, W1R, W2R))
                   for rt in range(2)])           # ll2 rows  [2, 192, 160]
    rc_ = np.stack([_kron(8, _stage_row_matrix(
        np.asarray(C.LEGALL_G0), rcl, rt, 16, OUTR, W1R)) for rt in range(2)])
    rc_, rc_scale = exact_or_scaled(rc_)          # LeGall is dyadic/sqrt2
    assert rc_scale is not None
    # interleave: one [8*128, 1024] selection for every 128-lane t segment,
    # 4-tree average folded in (0.25 is bf16-exact)
    sint = np.zeros((8 * 128, 8 * 128), np.float32)
    for q0 in range(8):
        for u in range(128):
            sint[q0 * 128 + u, 8 * u + q0] = 0.25
    return (taps_a, taps_b, taps_c, ra0, ra1, rb, rc_,
            np.float32(rc_scale), sint)


def _poly_right_sum(pairs, width: int):
    """sum_i sum_taps coef * read(x_i, t + s) with ONE roll per distinct
    right-shift (read t+s == pltpu.roll by width - s)."""
    z = {}
    for x, taps_coefs in pairs:
        for s, coef in taps_coefs:
            term = x * coef
            z[s] = term if s not in z else z[s] + term
    acc = None
    for s in sorted(z):
        t = pltpu.roll(z[s], width - s, axis=1) if s else z[s]
        acc = t if acc is None else acc + t
    return acc


def _kernel_delta(static, x_hbm, ra0_ref, ra1_ref, rb_ref, rc_ref, sint_ref,
                  o_ref):
    wcol, fast = static
    b = pl.program_id(0)
    g = pl.program_id(1)
    taps_a, taps_b, taps_c, _, _, _, _, rc_scale, _ = _consts_delta(wcol)

    def body(scratch, sem):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(pl.multiple_of(8 * g, 8), W3R), :],
            scratch, sem)
        cp.start()
        cp.wait()

        # --- stage A rows: block-diagonal per (rt, filter) ----------------
        # plane layout of dsubs: [lh*4, hl*4, hh*4], combos (rt, ct) major
        rows = {}  # (band, ci) -> [W2R, wcol]
        for rt in range(2):
            cis = (2 * rt, 2 * rt + 1)
            stack = jnp.concatenate([scratch[0 * 4 + ci] for ci in cis], axis=0)
            res = _row_dot_q(ra0_ref[rt], stack, fast)
            for k, ci in enumerate(cis):
                rows[("lh", ci)] = res[W2R * k : W2R * (k + 1)]
            planes = [(band, ci) for band in (1, 2) for ci in cis]
            stack = jnp.concatenate([scratch[band * 4 + ci]
                                     for band, ci in planes], axis=0)
            res = _row_dot_q(ra1_ref[rt], stack, fast)
            for k, (band, ci) in enumerate(planes):
                rows[(("hl", "hh")[band - 1], ci)] = res[W2R * k : W2R * (k + 1)]
        # --- stage A columns: 2 output phases per combo -------------------
        z2 = {}
        for ci, (rt, ct) in enumerate(_TREES):
            for q2 in range(2):
                pairs = []
                for band, fi in (("lh", 1), ("hl", 0), ("hh", 1)):
                    taps = taps_a[ct][fi][q2]  # pin=1: all pi == 0
                    pairs.append((rows[(band, ci)],
                                  [(s, cf) for _pi, s, cf in taps]))
                z2[(ci, q2)] = _poly_right_sum(pairs, wcol)

        # --- stage B rows + columns ---------------------------------------
        z1 = {}
        for rt in range(2):
            cis = (2 * rt, 2 * rt + 1)
            planes = [(ci, q2) for ci in cis for q2 in range(2)]
            stack = jnp.concatenate([z2[p] for p in planes], axis=0)
            res = _row_dot_q(rb_ref[rt], stack, fast)
            rrows = {p: res[W1R * k : W1R * (k + 1)]
                     for k, p in enumerate(planes)}
            for ci in cis:
                ct = _TREES[ci][1]
                for q1 in range(4):
                    pairs = {}
                    for pi, s, cf in taps_b[ct][q1]:
                        pairs.setdefault(pi, []).append((s, cf))
                    z1[(ci, q1)] = _poly_right_sum(
                        [(rrows[(ci, pi)], tc) for pi, tc in pairs.items()],
                        wcol)

        # --- stage C rows + columns (accumulated across combos) -----------
        duq_pairs = {q0: [] for q0 in range(8)}
        for rt in range(2):
            cis = (2 * rt, 2 * rt + 1)
            planes = [(ci, q1) for ci in cis for q1 in range(4)]
            stack = jnp.concatenate([z1[p] for p in planes], axis=0)
            res = dot_exact(rc_ref[rt], stack, exact_side="left", fast=fast)
            res = res * rc_scale
            rrows = {p: res[OUTR * k : OUTR * (k + 1)]
                     for k, p in enumerate(planes)}
            for ci in cis:
                ct = _TREES[ci][1]
                for q0 in range(8):
                    pairs = {}
                    for pi, s, cf in taps_c[ct][q0]:
                        pairs.setdefault(pi, []).append((s, cf))
                    for pi, tc in pairs.items():
                        duq_pairs[q0].append((rrows[(ci, pi)], tc))
        duq = [_poly_right_sum(duq_pairs[q0], wcol) for q0 in range(8)]

        # --- interleave: 128-lane t segments -> 1024 output columns -------
        nseg = wcol // 128
        for s in range(nseg):
            seg = jnp.concatenate(
                [q[:, s * 128 : (s + 1) * 128] for q in duq], axis=1)
            o_ref[0, :, s * 1024 : (s + 1) * 1024] = dot_exact(
                seg, sint_ref[:], exact_side="right", fast=fast)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((12, W3R, wcol), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
    )


def delta_eligible(h3: int, w3: int) -> bool:
    """Level-3 plane shapes the fused delta synthesis accepts."""
    return h3 >= 8 and w3 >= RMARGIN


def _pad_rows_wrap(x, top: int, bottom: int):
    """jnp.pad(mode='wrap') with pad sizes possibly exceeding the dim."""
    h = x.shape[-2]
    while top or bottom:
        t = min(top, h)
        bo = min(bottom, h)
        pads = [(0, 0)] * (x.ndim - 2) + [(t, bo), (0, 0)]
        x = jnp.pad(x, pads, mode="wrap")
        top -= t
        bottom -= bo
        h = x.shape[-2]
    return x


def _pad_cols_wrap(x, right: int):
    w = x.shape[-1]
    while right:
        r = min(right, w)
        pads = [(0, 0)] * (x.ndim - 1) + [(0, r)]
        x = jnp.pad(x, pads, mode="wrap")
        right -= r
        w = x.shape[-1]
    return x


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_delta_synthesis(dsubs: jnp.ndarray, interpret: bool = False,
                          fast: bool = False):
    """[B, 12, h3, w3] level-3 highpass delta planes [lh*4, hl*4, hh*4]
    (combos (rt,ct) row-major; implicit zero lowpass at every level) ->
    [B, 8*h3, 8*w3] pixel-domain delta — the full 3-level inverse."""
    b, t, h3, w3 = dsubs.shape
    if t != 12 or not delta_eligible(h3, w3):
        raise ValueError(f"needs 12 planes and an eligible shape; got {dsubs.shape}")
    grid_rows = -(-h3 // 8)  # ceil: output strips of 64 = 8 l3 rows each
    wcol = _round_up(w3 + RMARGIN, 128)
    x = _pad_cols_wrap(dsubs, wcol - w3)
    x = _pad_rows_wrap(x, 8, 8 * grid_rows + 16 - h3)
    consts = _consts_delta(wcol)
    ra0, ra1, rb, rc_, _, sint = consts[3], consts[4], consts[5], consts[6], consts[7], consts[8]
    wout = 8 * wcol
    out = pl.pallas_call(
        partial(_kernel_delta, (wcol, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 64 * grid_rows, wout), jnp.float32),
        grid=(b, grid_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(ra0.shape, lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ra1.shape, lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rb.shape, lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rc_.shape, lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sint.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUTR, wout), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(ra0), jnp.asarray(ra1), jnp.asarray(rb), jnp.asarray(rc_),
      jnp.asarray(sint))
    return out[..., : 8 * h3, : 8 * w3]

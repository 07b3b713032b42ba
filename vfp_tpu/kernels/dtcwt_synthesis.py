"""Fused DT-CWT synthesis kernels: one launch per level (all 4 trees).

Inverse counterpart of dtcwt_level1.py.  The XLA inverse runs ~6 sequential
up2 convolutions per tree per level (~24 launches/level); these kernels do a
whole level per (batch, 32-output-row strip) grid cell:

  circular-halo DMA of the 16 coefficient planes -> row up-sampling,
  row filter, and the constant output roll folded into static [32, 32]
  scatter matrices, applied as block-diagonal [128, 128] matmuls over 4
  sublane-stacked planes per shared matrix (full MXU row utilization; the
  dyadic LeGall matrices additionally run as exact 3-pass bf16 splits, see
  dtcwt_level1.dot_exact) -> column up-sampling as a 2-phase polyphase
  convolution, accumulated across planes BEFORE rolling so each distinct
  lane shift costs one roll (_poly_col_sum) -> per-phase outputs
  [..., 2h, 2, w].

The cheap epilogue (interleave the two column phases, circular column roll,
crop to the pre-pad size) is one fused XLA op in the wrapper.

Index algebra (matches ops/dtcwt.py up2/_synthesis2d exactly):
  out[r] = x[(r - roll) mod 2h],  x[n] = sum_k f[k] y2[n - k],
  y2[2j + rp] = y[j]  =>  out[r] = sum f[k] y[j], 2j = r - roll - rp - k.
Rows: for output strip g the DMA window is input rows
[SROWS*g - 8, SROWS*g + SROWS + 8) (3 circular copies).  Columns: j = t - d with
d = (cp - p + k)/2 >= 0 for every tap, i.e. the polyphase conv only reads to
the LEFT -- a 8-column wrapped left margin makes any 128-unaligned width
exact, same trick as the analysis kernels.

Reference behavior: dtcwt package Transform2d.inverse as used by
src/offmark/embed/dtcwt_key_encoder.py:36 and
src/offmark/extract/dtcwt_key_decoder.py:36 (re-derived, not copied).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import dtcwt_coeffs as C
from .dtcwt_level1 import RollCache, dot_exact, exact_or_scaled

SHALO = 8  # input-row halo (top and bottom) around the strip's input rows
SROWS = 32  # input rows per grid cell (out rows = 2*SROWS); larger cells
# amortize per-cell DMA/dispatch overhead
SMARGIN_W = 8  # wrapped left margin (columns); covers max roll d = 6
_TREES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _row_matrix(f, roll: int, rp: int) -> np.ndarray:
    """[2*SROWS, SROWS + 2*SHALO] scatter: out_strip_row r <- sum_k f[k]
    y[j_loc], k = r - roll - rp - 2*(j_loc - SHALO) (strip-invariant)."""
    r_mat = np.zeros((2 * SROWS, SROWS + 2 * SHALO), np.float32)
    for r in range(2 * SROWS):
        for j_loc in range(SROWS + 2 * SHALO):
            k = r - roll - rp - 2 * (j_loc - SHALO)
            if 0 <= k < len(f) and (r - roll - rp - k) % 2 == 0:
                r_mat[r, j_loc] = f[k]
    return r_mat


def _col_taps(f, cp: int, p: int):
    """[(d, coef)] with y read at t - d: k = p - cp + 2d, d >= 0."""
    taps = []
    for d in range(len(f)):
        k = p - cp + 2 * d
        if 0 <= k < len(f):
            taps.append((d, float(f[k])))
    return taps


def _poly_col(x, taps, rc: RollCache | None = None):
    acc = None
    for d, coef in taps:
        rolled = rc.get(x, d) if rc is not None else (
            pltpu.roll(x, d, axis=1) if d else x)
        term = rolled * coef
        acc = term if acc is None else acc + term
    return acc


def _poly_col_sum(pairs):
    """sum_i poly_col(x_i, taps_i) with ONE roll per distinct shift:
    sum_i sum_d tap_i[d] roll(x_i, d) == sum_d roll(sum_i tap_i[d] x_i, d).
    Lane rolls are the VPU-expensive op here — accumulating all planes that
    share a shift before rolling turns O(planes x taps) rolls into
    O(distinct shifts)."""
    z = {}
    for x, taps in pairs:
        for d, coef in taps:
            term = x * coef
            z[d] = term if d not in z else z[d] + term
    acc = None
    for d in sorted(z):
        t = pltpu.roll(z[d], d, axis=1) if d else z[d]
        acc = t if acc is None else acc + t
    return acc


def _row_dot(rmat, stackx, scale, fast: bool):
    """Synthesis row matmul: 3-pass exact split when the matrix factors to a
    bf16-exact form (dyadic LeGall), HIGHEST otherwise — or ONE bf16 pass in
    fast mode (see dtcwt_level1.dot_exact for the precision rationale)."""
    if fast:
        res = jnp.dot(rmat.astype(jnp.bfloat16), stackx.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return res if scale is None else res * scale
    if scale is not None:
        return dot_exact(rmat, stackx, exact_side="left") * scale
    return jnp.dot(rmat, stackx, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _dma_window(x_hbm, scratch, sem, b, g, hp, planes_idx):
    """Copy input rows [SROWS*g - 8, SROWS*g + SROWS + 8) (circular)."""
    main = pl.multiple_of(SROWS * g, 8)
    top = pl.multiple_of(jax.lax.rem(SROWS * g - SHALO + hp, hp), 8)
    bot = pl.multiple_of(jax.lax.rem(SROWS * g + SROWS, hp), 8)
    src = x_hbm.at[b] if planes_idx else x_hbm
    c0 = pltpu.make_async_copy(
        src.at[:, pl.ds(main, SROWS), :], scratch.at[:, pl.ds(SHALO, SROWS), :], sem.at[0])
    c1 = pltpu.make_async_copy(
        src.at[:, pl.ds(top, SHALO), :], scratch.at[:, pl.ds(0, SHALO), :], sem.at[1])
    c2 = pltpu.make_async_copy(
        src.at[:, pl.ds(bot, SHALO), :], scratch.at[:, pl.ds(SHALO + SROWS, SHALO), :],
        sem.at[2])
    c0.start(); c1.start(); c2.start()
    c0.wait(); c1.wait(); c2.wait()


def _bd4(a: np.ndarray) -> np.ndarray:
    """kron(I4, a): the same row matrix applied to four planes stacked on
    sublanes becomes ONE full-M-tile block-diagonal matmul instead of four
    low-utilization small ones."""
    return np.kron(np.eye(4, dtype=np.float32), np.asarray(a, np.float32))


@lru_cache(maxsize=None)
def _consts_syn_q():
    g = {0: (np.asarray(C.QSHIFT_G0A), np.asarray(C.QSHIFT_G1A)),
         1: (np.asarray(C.QSHIFT_G0B), np.asarray(C.QSHIFT_G1B))}
    roll = C.QSHIFT_ROLL_A  # == ROLL_B
    # group (rt, fi) -> block-diag of its [32, 32] row matrix; the group's 4
    # planes are (band, ci): band in {0,1} (fi=0: g0r) or {2,3} (fi=1: g1r),
    # ci in {2rt, 2rt+1}
    rmat = np.stack([_bd4(_row_matrix(g[rt][fi], roll, 0))
                     for rt in range(2) for fi in range(2)])  # [4, 128, 128]
    taps = {(t, fi, p): _col_taps(g[t][fi], 0, p)
            for t in range(2) for fi in range(2) for p in range(2)}
    rmat, scale = exact_or_scaled(rmat)
    return rmat, taps, scale


def _kernel_syn_q(static, x_hbm, rmat_ref, o_ref):
    hp, fast = static
    b = pl.program_id(0)
    g = pl.program_id(1)

    def body(scratch, sem):
        _dma_window(x_hbm, scratch, sem, b, g, hp, planes_idx=True)
        _, taps, scale = _consts_syn_q()
        # row stage: 4 block-diagonal [128, 128] matmuls (one per (rt, fi)
        # matrix) over 4 planes stacked on sublanes, instead of 16 [32, 32]s
        rrows = {}
        for gi, (rt, fi) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            bands = (0, 1) if fi == 0 else (2, 3)
            cis = (2 * rt, 2 * rt + 1)
            planes = [(band, ci) for band in bands for ci in cis]
            stackx = jnp.concatenate([scratch[band * 4 + ci]
                                      for band, ci in planes], axis=0)
            res = _row_dot(rmat_ref[gi], stackx, scale, fast)
            for k, (band, ci) in enumerate(planes):
                rrows[(band, ci)] = res[2 * SROWS * k : 2 * SROWS * (k + 1)]
        for ci, (rt, ct) in enumerate(_TREES):
            for p in range(2):
                # the 4 band terms accumulate into one output: sum-then-roll
                o_ref[0, ci, p] = _poly_col_sum(
                    [(rrows[(band, ci)], taps[(ct, (0, 1, 0, 1)[band], p)])
                     for band in range(4)]
                )

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((16, SROWS + 2 * SHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@lru_cache(maxsize=None)
def _consts_syn_l1():
    g0, g1 = np.asarray(C.LEGALL_G0), np.asarray(C.LEGALL_G1)
    roll = C.LEGALL_ROLL
    rmat = np.stack([_bd4(_row_matrix((g0, g1)[fi], roll, rt))
                     for rt in range(2) for fi in range(2)])  # [4, 128, 128]
    taps = {(ct, fi, p): _col_taps((g0, g1)[fi], ct, p)
            for ct in range(2) for fi in range(2) for p in range(2)}
    rmat, scale = exact_or_scaled(rmat)
    return rmat, taps, scale


def _kernel_syn_l1(static, x_hbm, rmat_ref, o_ref):
    hp, fast = static
    b = pl.program_id(0)
    g = pl.program_id(1)

    def body(scratch, sem):
        _dma_window(x_hbm, scratch, sem, b, g, hp, planes_idx=True)
        _, taps, scale = _consts_syn_l1()
        # row stage: 4 block-diagonal [128, 128] matmuls, one per (rt, fi)
        # matrix over its 4 planes stacked on sublanes (LeGall synthesis
        # filters are dyadic, so the exact 3-pass split matmul applies)
        rrows = {}
        for gi, (rt, fi) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            bands = (0, 1) if fi == 0 else (2, 3)
            cis = (2 * rt, 2 * rt + 1)
            planes = [(band, ci) for band in bands for ci in cis]
            stackx = jnp.concatenate([scratch[band * 4 + ci]
                                      for band, ci in planes], axis=0)
            res = _row_dot(rmat_ref[gi], stackx, scale, fast)
            for k, (band, ci) in enumerate(planes):
                rrows[(band, ci)] = res[2 * SROWS * k : 2 * SROWS * (k + 1)]
        for p in range(2):
            # every (band, ci) term feeds ONE accumulated output, so the
            # sum-then-roll identity collapses 64 lane rolls to <= ~5
            pairs = [
                (rrows[(band, ci)], taps[(ct, (0, 1, 0, 1)[band], p)])
                for ci, (rt, ct) in enumerate(_TREES)
                for band in range(4)
            ]
            o_ref[0, p] = _poly_col_sum(pairs) * 0.25

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((16, SROWS + 2 * SHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


def synthesis_eligible(h: int, w: int) -> bool:
    """Coefficient-plane shapes the synthesis kernels accept (wrap-pad needs
    each pad side <= the dim; see kernel_eligible in dtcwt_level1.py)."""
    return (h >= 32 and w >= 64
            and _round_up(w + SMARGIN_W, 128) - w - SMARGIN_W <= w
            and _round_up(h + 2 * SHALO, SROWS) - h - SHALO <= h)


def _prep(planes, h, w):
    """Wrap-pad planes [..., h, w] for strip/lane alignment."""
    hp = _round_up(h + 2 * SHALO, SROWS)
    wp = _round_up(w + SMARGIN_W, 128)
    pads = [(0, 0)] * (planes.ndim - 2) + [(SHALO, hp - h - SHALO),
                                           (SMARGIN_W, wp - w - SMARGIN_W)]
    return jnp.pad(planes, pads, mode="wrap"), hp, wp


def _finish(phases, h, w, roll):
    """[..., 2, 2hp, wp] (phase-major) -> interleave, circular col roll, crop."""
    valid = phases[..., :, 2 * SHALO : 2 * SHALO + 2 * h,
                   SMARGIN_W : SMARGIN_W + w]
    x = jnp.moveaxis(valid, -3, -1).reshape(*valid.shape[:-3], 2 * h, 2 * w)
    return jnp.roll(x, roll, axis=-1)


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_qshift_synthesis(planes: jnp.ndarray, interpret: bool = False,
                           fast: bool = False):
    """[B, 16, h, w] planes [ll*4, lh*4, hl*4, hh*4] (combos (rt,ct)
    row-major) -> [B, 4, 2h, 2w] tree lowpasses, BEFORE per-level cropping."""
    b, t, h, w = planes.shape
    if t != 16 or not synthesis_eligible(h, w):
        raise ValueError(f"needs 16 planes and an eligible shape; got {planes.shape}")
    planes, hp, wp = _prep(planes, h, w)
    rmat, _, _ = _consts_syn_q()
    out = pl.pallas_call(
        partial(_kernel_syn_q, (hp, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 4, 2, 2 * hp, wp), jnp.float32),
        grid=(b, hp // SROWS),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 8 * SROWS, 4 * (SROWS + 2 * SHALO)),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 2, 2 * SROWS, wp), lambda i, j: (i, 0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, jnp.asarray(rmat))
    return _finish(out, h, w, C.QSHIFT_ROLL_A)


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_legall_synthesis(planes: jnp.ndarray, interpret: bool = False,
                           fast: bool = False):
    """[B, 16, h, w] level-1 planes -> [B, 2h, 2w] reconstruction (the 4-tree
    average), BEFORE final cropping."""
    b, t, h, w = planes.shape
    if t != 16 or not synthesis_eligible(h, w):
        raise ValueError(f"needs 16 planes and an eligible shape; got {planes.shape}")
    planes, hp, wp = _prep(planes, h, w)
    rmat, _, _ = _consts_syn_l1()
    out = pl.pallas_call(
        partial(_kernel_syn_l1, (hp, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 2, 2 * hp, wp), jnp.float32),
        grid=(b, hp // SROWS),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 8 * SROWS, 4 * (SROWS + 2 * SHALO)),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2 * SROWS, wp), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, jnp.asarray(rmat))
    return _finish(out, h, w, C.LEGALL_ROLL)


# -- lowpass-only synthesis (delta-pyramid embed path) -----------------------
# The codecs' embed delta lives entirely in the deepest level's highpasses,
# so by linearity the inverse of the delta pyramid runs every shallower
# level with ZERO highpasses: only the 4 tree lowpasses carry signal and the
# g1 filter banks drop out — 1/4 the input, 1/2 the row matmuls, 1/4 the
# column taps of the full kernels.


@lru_cache(maxsize=None)
def _consts_syn_q_ll():
    g = {0: np.asarray(C.QSHIFT_G0A), 1: np.asarray(C.QSHIFT_G0B)}
    roll = C.QSHIFT_ROLL_A
    # group rt -> kron(I2, row_matrix): its 2 planes are ci in {2rt, 2rt+1}
    rmat = np.stack([
        np.kron(np.eye(2, dtype=np.float32),
                _row_matrix(g[rt], roll, 0)) for rt in range(2)])
    taps = {(t, p): _col_taps(g[t], 0, p) for t in range(2) for p in range(2)}
    rmat, scale = exact_or_scaled(rmat)
    return rmat, taps, scale


def _kernel_syn_q_ll(static, x_hbm, rmat_ref, o_ref):
    hp, fast = static
    b = pl.program_id(0)
    g = pl.program_id(1)

    def body(scratch, sem):
        _dma_window(x_hbm, scratch, sem, b, g, hp, planes_idx=True)
        _, taps, scale = _consts_syn_q_ll()
        for rt in range(2):
            stackx = jnp.concatenate([scratch[2 * rt], scratch[2 * rt + 1]], axis=0)
            res = _row_dot(rmat_ref[rt], stackx, scale, fast)
            for k in range(2):
                ci = 2 * rt + k
                ct = _TREES[ci][1]
                rows = res[2 * SROWS * k : 2 * SROWS * (k + 1)]
                for p in range(2):
                    o_ref[0, ci, p] = _poly_col(rows, taps[(ct, p)])

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((4, SROWS + 2 * SHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@lru_cache(maxsize=None)
def _consts_syn_l1_ll():
    g0 = np.asarray(C.LEGALL_G0)
    roll = C.LEGALL_ROLL
    rmat = np.stack([
        np.kron(np.eye(2, dtype=np.float32),
                _row_matrix(g0, roll, rt)) for rt in range(2)])
    taps = {(ct, p): _col_taps(g0, ct, p) for ct in range(2) for p in range(2)}
    rmat, scale = exact_or_scaled(rmat)
    return rmat, taps, scale


def _kernel_syn_l1_ll(static, x_hbm, rmat_ref, o_ref):
    hp, fast = static
    b = pl.program_id(0)
    g = pl.program_id(1)

    def body(scratch, sem):
        _dma_window(x_hbm, scratch, sem, b, g, hp, planes_idx=True)
        _, taps, scale = _consts_syn_l1_ll()
        rrows = {}
        for rt in range(2):
            stackx = jnp.concatenate([scratch[2 * rt], scratch[2 * rt + 1]], axis=0)
            res = _row_dot(rmat_ref[rt], stackx, scale, fast)
            for k in range(2):
                rrows[2 * rt + k] = res[2 * SROWS * k : 2 * SROWS * (k + 1)]
        for p in range(2):
            pairs = [(rrows[ci], taps[(ct, p)]) for ci, (rt, ct) in enumerate(_TREES)]
            o_ref[0, p] = _poly_col_sum(pairs) * 0.25

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((4, SROWS + 2 * SHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@lru_cache(maxsize=None)
def _consts_syn_l1_hp():
    """Highpass-only LeGall level-1 synthesis consts (ll band absent: the
    decode path inverts a 1-level pyramid with a ZERO lowpass).  fi=0 row
    groups carry only the lh band (2 planes per rt), fi=1 the hl+hh bands
    (4 planes per rt)."""
    g0, g1 = np.asarray(C.LEGALL_G0), np.asarray(C.LEGALL_G1)
    roll = C.LEGALL_ROLL
    rmat2 = np.stack([
        np.kron(np.eye(2, dtype=np.float32), _row_matrix(g0, roll, rt))
        for rt in range(2)])
    rmat4 = np.stack([_bd4(_row_matrix(g1, roll, rt)) for rt in range(2)])
    taps = {(ct, fi, p): _col_taps((g0, g1)[fi], ct, p)
            for ct in range(2) for fi in range(2) for p in range(2)}
    rmat2, s2 = exact_or_scaled(rmat2)
    rmat4, s4 = exact_or_scaled(rmat4)
    return rmat2, rmat4, taps, s2, s4


def _kernel_syn_l1_hp(static, x_hbm, rmat2_ref, rmat4_ref, o_ref):
    """Input planes [lh*4, hl*4, hh*4] (combo ci fastest); ll = 0."""
    hp, fast = static
    b = pl.program_id(0)
    g = pl.program_id(1)

    def body(scratch, sem):
        _dma_window(x_hbm, scratch, sem, b, g, hp, planes_idx=True)
        _, _, taps, s2, s4 = _consts_syn_l1_hp()
        rrows = {}  # keyed (band, ci), band in {1: lh, 2: hl, 3: hh}
        for rt in range(2):
            # fi=0 (g0 rows): lh planes only — input planes ci = 2rt, 2rt+1
            stackx = jnp.concatenate([scratch[2 * rt], scratch[2 * rt + 1]],
                                     axis=0)
            res = _row_dot(rmat2_ref[rt], stackx, s2, fast)
            for k in range(2):
                rrows[(1, 2 * rt + k)] = res[2 * SROWS * k : 2 * SROWS * (k + 1)]
            # fi=1 (g1 rows): hl + hh planes — input planes (band-1)*4 + ci
            planes = [(band, ci) for band in (2, 3) for ci in (2 * rt, 2 * rt + 1)]
            stackx = jnp.concatenate(
                [scratch[(band - 1) * 4 + ci] for band, ci in planes], axis=0)
            res = _row_dot(rmat4_ref[rt], stackx, s4, fast)
            for k, (band, ci) in enumerate(planes):
                rrows[(band, ci)] = res[2 * SROWS * k : 2 * SROWS * (k + 1)]
        for p in range(2):
            # column filters per band: lh -> g1, hl -> g0, hh -> g1
            pairs = [
                (rrows[(band, ci)], taps[(ct, (1, 0, 1)[band - 1], p)])
                for ci, (rt, ct) in enumerate(_TREES)
                for band in (1, 2, 3)
            ]
            o_ref[0, p] = _poly_col_sum(pairs) * 0.25

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((12, SROWS + 2 * SHALO, x_hbm.shape[-1]), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_legall_synthesis_hp(subs12: jnp.ndarray, interpret: bool = False,
                              fast: bool = False):
    """[B, 12, h, w] level-1 highpass planes [lh*4, hl*4, hh*4] (zero
    lowpass) -> [B, 2h, 2w] reconstruction, BEFORE final cropping.  The
    codec decode inverts exactly this pyramid — skipping the ll band drops
    a quarter of the DMA, row matmuls, and column taps."""
    b, t, h, w = subs12.shape
    if t != 12 or not synthesis_eligible(h, w):
        raise ValueError(f"needs 12 planes and an eligible shape; got {subs12.shape}")
    subs12, hp, wp = _prep(subs12, h, w)
    rmat2, rmat4, _, _, _ = _consts_syn_l1_hp()
    out = pl.pallas_call(
        partial(_kernel_syn_l1_hp, (hp, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 2, 2 * hp, wp), jnp.float32),
        grid=(b, hp // SROWS),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, 4 * SROWS, 2 * (SROWS + 2 * SHALO)),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8 * SROWS, 4 * (SROWS + 2 * SHALO)),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2 * SROWS, wp), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(subs12, jnp.asarray(rmat2), jnp.asarray(rmat4))
    return _finish(out, h, w, C.LEGALL_ROLL)


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_qshift_synthesis_ll(ll4: jnp.ndarray, interpret: bool = False,
                              fast: bool = False):
    """[B, 4, h, w] tree lowpasses (highpasses all zero) -> [B, 4, 2h, 2w]
    tree lowpasses of the level below, BEFORE per-level cropping."""
    b, t, h, w = ll4.shape
    if t != 4 or not synthesis_eligible(h, w):
        raise ValueError(f"needs 4 planes and an eligible shape; got {ll4.shape}")
    ll4, hp, wp = _prep(ll4, h, w)
    rmat, _, _ = _consts_syn_q_ll()
    out = pl.pallas_call(
        partial(_kernel_syn_q_ll, (hp, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 4, 2, 2 * hp, wp), jnp.float32),
        grid=(b, hp // SROWS),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, 4 * SROWS, 2 * (SROWS + 2 * SHALO)),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 2, 2 * SROWS, wp), lambda i, j: (i, 0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4, jnp.asarray(rmat))
    return _finish(out, h, w, C.QSHIFT_ROLL_A)


@partial(jax.jit, static_argnames=("interpret", "fast"))
def dtcwt_legall_synthesis_ll(ll4: jnp.ndarray, interpret: bool = False,
                              fast: bool = False):
    """[B, 4, h, w] level-1 tree lowpasses (highpasses all zero) ->
    [B, 2h, 2w] reconstruction (4-tree average), BEFORE final cropping."""
    b, t, h, w = ll4.shape
    if t != 4 or not synthesis_eligible(h, w):
        raise ValueError(f"needs 4 planes and an eligible shape; got {ll4.shape}")
    ll4, hp, wp = _prep(ll4, h, w)
    rmat, _, _ = _consts_syn_l1_ll()
    out = pl.pallas_call(
        partial(_kernel_syn_l1_ll, (hp, fast)),
        out_shape=jax.ShapeDtypeStruct((b, 2, 2 * hp, wp), jnp.float32),
        grid=(b, hp // SROWS),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, 4 * SROWS, 2 * (SROWS + 2 * SHALO)),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2 * SROWS, wp), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ll4, jnp.asarray(rmat))
    return _finish(out, h, w, C.LEGALL_ROLL)

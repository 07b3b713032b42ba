"""Design + calibrate the DT-CWT filter bank; regenerates dtcwt_coeffs.py.

1. Designs an even-length orthonormal q-shift lowpass (group delay ~ L/2 -
   3/4 relative to center, i.e. quarter-sample offset) by constrained
   optimization (scipy).  Tree B is the time reverse (3/4-sample delay), so
   the two trees differ by the half sample the dual tree requires.
2. Determines, by direct numerical search against the actual JAX transform
   primitives (CPU), the highpass parity and synthesis rolls that give exact
   perfect reconstruction for every tree, for both the LeGall level-1 bank
   and the q-shift bank.
3. Rewrites vfp_tpu/ops/dtcwt_coeffs.py with the results and verifies 2-D
   multi-level PR end-to-end.

Run: python tools/design_dtcwt.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from scipy.optimize import minimize

L = 14
TAU = (L - 1) / 2 - 0.25  # target group delay of tree A


def _lattice_filters(thetas):
    """Paraunitary lattice -> (h0, h1) of length 2K, orthonormal EXACTLY.

    Polyphase E(z) = [prod_{k=K-1..1} R(theta_k) diag(1, z^-1)] R(theta_0);
    H0(z) = E00(z^2) + z^-1 E01(z^2), H1(z) = E10(z^2) + z^-1 E11(z^2).
    """
    K = len(thetas)

    def rot(t):
        c, s = np.cos(t), np.sin(t)
        return np.array([[c, s], [-s, c]])

    # E as 2x2 matrix of coefficient lists (ascending powers of z^-1)
    E = [[np.array([v]) for v in row] for row in rot(thetas[0])]
    for t in thetas[1:]:
        # multiply by diag(1, z^-1): delay second row
        E = [E[0], [np.concatenate([[0.0], E[1][0]]), np.concatenate([[0.0], E[1][1]])]]
        # left-multiply by R(t)
        R = rot(t)

        def add(a, b):
            n = max(len(a), len(b))
            out = np.zeros(n)
            out[: len(a)] += a
            out[: len(b)] += b
            return out

        E = [
            [add(R[0, 0] * E[0][0], R[0, 1] * E[1][0]), add(R[0, 0] * E[0][1], R[0, 1] * E[1][1])],
            [add(R[1, 0] * E[0][0], R[1, 1] * E[1][0]), add(R[1, 0] * E[0][1], R[1, 1] * E[1][1])],
        ]
    deg = max(len(E[i][j]) for i in range(2) for j in range(2))
    h0 = np.zeros(2 * deg)
    h1 = np.zeros(2 * deg)
    for p, c in enumerate(E[0][0]):
        h0[2 * p] += c
    for p, c in enumerate(E[0][1]):
        h0[2 * p + 1] += c
    for p, c in enumerate(E[1][0]):
        h1[2 * p] += c
    for p, c in enumerate(E[1][1]):
        h1[2 * p + 1] += c
    return h0[: 2 * K], h1[: 2 * K]


def design_qshift():
    n = np.arange(L)
    K = L // 2
    w_pass = np.linspace(0, np.pi / 2, 64)
    w_stop = np.linspace(0.65 * np.pi, np.pi, 64)
    e_pass = np.exp(-1j * np.outer(w_pass, n))
    e_stop = np.exp(-1j * np.outer(w_stop, n))

    def full_thetas(free):
        # At w=0 the lattice rotations compose additively, so H0(0) =
        # sqrt(2) cos(sum(theta) - pi/4): pinning sum(theta) = pi/4 makes
        # H0(0) = sqrt(2) and H1(0) = 0 EXACTLY (zero-DC highpass).
        return np.concatenate([free, [np.pi / 4 - free.sum()]])

    def objective(free):
        h0, _ = _lattice_filters(full_thetas(free))
        H = e_pass @ h0
        delay = np.mean(np.imag(H * np.exp(1j * w_pass * TAU)) ** 2)
        stop = np.mean(np.abs(e_stop @ h0) ** 2)
        return 50 * delay + stop

    best = None
    for seed in range(24):
        t0 = np.random.RandomState(seed).randn(K - 1) * 0.6
        res = minimize(objective, t0, method="Nelder-Mead",
                       options={"maxiter": 40000, "xatol": 1e-13, "fatol": 1e-15})
        res2 = minimize(objective, res.x, method="Powell",
                        options={"maxiter": 20000, "xtol": 1e-13, "ftol": 1e-15})
        cand = res2 if res2.fun < res.fun else res
        if best is None or cand.fun < best.fun:
            best = cand
    h0, h1 = _lattice_filters(full_thetas(best.x))
    orth_err = max(
        abs(np.dot(h0, h0) - 1.0),
        max(abs(np.dot(h0[: L - 2 * k], h0[2 * k :])) for k in range(1, L // 2)),
    )
    # group delay at DC
    Hd = np.sum(h0 * n) / np.sum(h0)
    print(f"qshift lattice: obj={best.fun:.3e} orth_err={orth_err:.2e} "
          f"sum={h0.sum():.6f} delay(DC)={Hd:.3f} (target {TAU})")
    assert orth_err < 1e-12, orth_err
    return h0, h1




def calibrate_bank(h0, h1, g0, g1, phases, label):
    """Find (h1 pre-shift parity p, roll r) s.t. down2/up2 roundtrip is exact
    for each phase in `phases`.  Returns dict phase -> (p, r) or None."""
    import jax.numpy as jnp
    from vfp_tpu.ops.dtcwt import down2, up2

    rngv = np.random.RandomState(0).randn(2, 32)
    out = {}
    for phase in phases:
        found = None
        for p in (0, 1):
            h1p = np.concatenate([np.zeros(p), h1])
            g1p = np.concatenate([np.zeros(p), g1]) if label == "qshift" else g1
            lo = down2(jnp.asarray(rngv), h0, phase)
            hi = down2(jnp.asarray(rngv), h1p, phase)
            rec = np.asarray(up2(lo, g0, phase) + up2(hi, (g1p if label == "qshift" else g1), phase))
            for r in range(-16, 17):
                err = np.abs(np.roll(rec, r, axis=-1) - rngv).max()
                if err < 1e-9:
                    found = (p, r, None)
                    break
            if found:
                break
        # also allow shifting g1 instead of h1
        if not found:
            for pg in (0, 1):
                g1p = np.concatenate([np.zeros(pg), g1])
                lo = down2(jnp.asarray(rngv), h0, phase)
                hi = down2(jnp.asarray(rngv), h1, phase)
                rec = np.asarray(up2(lo, g0, phase) + up2(hi, g1p, phase))
                for r in range(-16, 17):
                    err = np.abs(np.roll(rec, r, axis=-1) - rngv).max()
                    if err < 1e-9:
                        found = (0, r, pg)
                        break
                if found:
                    break
        print(f"{label} phase={phase}: {found}")
        out[phase] = found
    return out


def main():
    h0a, h1a = design_qshift()

    # LeGall filters
    lh0 = np.array([-0.125, 0.25, 0.75, 0.25, -0.125])
    lh1 = np.array([-0.5, 1.0, -0.5])
    lg0 = np.array([0.5, 1.0, 0.5])
    lg1 = np.array([-0.125, -0.25, 0.75, -0.25, -0.125])

    # scale for ~unit DC gain per level like orthonormal banks
    s = np.sqrt(2)
    lh0s, lh1s, lg0s, lg1s = lh0 * s, lh1 * s, lg0 / s, lg1 / s

    print("calibrating LeGall bank (phases 0, 1)...")
    leg = calibrate_bank(lh0s, lh1s, lg0s, lg1s, (0, 1), "legall")

    print("calibrating q-shift tree A / B ...")
    g0a, g1a = h0a[::-1].copy(), h1a[::-1].copy()
    qa = calibrate_bank(h0a, h1a, g0a, g1a, (0,), "qshift")
    h0b, h1b = h0a[::-1].copy(), h1a[::-1].copy()
    g0b, g1b = h0b[::-1].copy(), h1b[::-1].copy()
    qb = calibrate_bank(h0b, h1b, g0b, g1b, (0,), "qshift")

    results = dict(leg=leg, qa=qa, qb=qb, h0a=h0a, h1a=h1a)
    for k, v in results.items():
        if isinstance(v, dict):
            assert all(x is not None for x in v.values()), (k, v)

    def adj(h1, g1, found):
        p, r, pg = found
        h1o = np.concatenate([np.zeros(p), h1]) if p else h1
        g1o = np.concatenate([np.zeros(pg), g1]) if pg else g1
        return h1o, g1o, r

    lh1o, lg1o, leg_roll0 = adj(lh1s, lg1s, leg[0])
    _, _, leg_roll1 = adj(lh1s, lg1s, leg[1])
    qh1a, qg1a, qra = adj(h1a, g1a, qa[0])
    qh1b, qg1b, qrb = adj(h1b, g1b, qb[0])

    def fmt(a):
        return "np.array([" + ", ".join(f"{x:.16e}" for x in np.asarray(a, np.float64)) + "], np.float32)"

    src = f'''"""DT-CWT filter coefficients + alignment constants.

GENERATED by tools/design_dtcwt.py — do not edit by hand.

Level 1: LeGall 5/3 biorthogonal pair scaled by sqrt(2) (analysis) /
1/sqrt(2) (synthesis).  Levels >= 2: numerically designed even-length
orthonormal q-shift filter (group delay {TAU}), tree B = time reverse.
Rolls compensate the banks' net circular delays for exact PR.
"""

import numpy as np

LEGALL_H0 = {fmt(lh0s)}
LEGALL_H1 = {fmt(lh1o)}
LEGALL_G0 = {fmt(lg0s)}
LEGALL_G1 = {fmt(lg1o)}
LEGALL_ROLL = {leg_roll0}
LEGALL_ROLL_B = {leg_roll1}

QSHIFT_H0A = {fmt(h0a)}
QSHIFT_H1A = {fmt(qh1a)}
QSHIFT_G0A = {fmt(g0a)}
QSHIFT_G1A = {fmt(qg1a)}
QSHIFT_ROLL_A = {qra}

QSHIFT_H0B = {fmt(h0b)}
QSHIFT_H1B = {fmt(qh1b)}
QSHIFT_G0B = {fmt(g0b)}
QSHIFT_G1B = {fmt(qg1b)}
QSHIFT_ROLL_B = {qrb}
'''
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "vfp_tpu", "ops", "dtcwt_coeffs.py")
    with open(path, "w") as f:
        f.write(src)
    print(f"wrote {path}")

    # end-to-end 2-D PR check
    import importlib
    import vfp_tpu.ops.dtcwt_coeffs as CC
    importlib.reload(CC)
    import vfp_tpu.ops.dtcwt as D
    importlib.reload(D)
    import jax.numpy as jnp

    x = np.random.RandomState(1).rand(24, 40)
    t = D.Transform2d()
    for nl in (1, 2, 3):
        pyr = t.forward(jnp.asarray(x), nlevels=nl)
        rec = np.asarray(t.inverse(pyr))
        print(f"2-D PR nlevels={nl}: max err {np.abs(rec - x).max():.2e}")


if __name__ == "__main__":
    main()

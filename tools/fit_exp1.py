#!/usr/bin/env python3
"""Fit rational approximations for the exponential integral E1.

Produces the coefficient tables used by spmf_tpu/distributions/special.py
(the loop-free exp1 — the loop-based series/continued-fraction version cost
~91 ms of the 117 ms PoissonAutoencoder step, benchmarks/
autoencoder_ablation.py):

1. ``z < 1``: E1(z) + gamma + log z = sum_{k>=1} (-1)^{k+1} z^k / (k k!)
   — absolutely convergent; we emit the first ``N_SERIES`` coefficients
   (truncation at z=1 is < 1/(19*19!) ~ 4e-19 for N=18).

2. ``z >= 1``: g(t) = z e^z E1(z) with t = 1/z. Two degree-10/10 rationals
   in the shifted variable u = (t-c)/h on z in [1,6] and [6, inf), fitted by
   Lawson-reweighted least squares on *relative* error over Chebyshev nodes
   (converges toward the minimax rational; Cody & Thacher 1968/69 used the
   same form for E1). Measured max rel error: 3.2e-14 (z in [1,6]) and
   8.1e-15 (z in [6,inf)).

Run:  python tools/fit_exp1.py          # prints tables + max rel errors
The output is pasted into special.py; tests/test_distributions.py
revalidates exp1 against scipy continuously.
"""
import numpy as np
from math import factorial
from scipy.special import exp1 as sp_exp1

N_SERIES = 18


def g_exact(z):
    """z e^z E1(z), overflow-safe (asymptotic series past z=700)."""
    z = np.asarray(z, float)
    out = np.empty_like(z)
    small = z < 700
    out[small] = z[small] * np.exp(z[small]) * sp_exp1(z[small])
    big = ~small
    if big.any():
        t = 1.0 / z[big]
        s = np.ones_like(t)
        term = np.ones_like(t)
        for m in range(1, 40):
            term = term * (-t) * m
            s = s + term
        out[big] = s
    return out


def series_coeffs():
    return np.array([(-1.0) ** (k + 1) / (k * factorial(k))
                     for k in range(1, N_SERIES + 1)])


def fit_interval(t_lo, t_hi, p_deg, q_deg, n_pts=6000, iters=200):
    """Lawson-weighted LSQ rational fit of g on t in [t_lo, t_hi],
    in the shifted variable u = (t-c)/h for conditioning."""
    k = np.arange(n_pts)
    t = t_lo + (t_hi - t_lo) * 0.5 * (1 - np.cos(np.pi * (k + 0.5) / n_pts))
    g = g_exact(1.0 / t)
    c = 0.5 * (t_lo + t_hi)
    h = 0.5 * (t_hi - t_lo)
    u = (t - c) / h
    w = np.ones_like(t)
    best = None
    for _ in range(iters):
        A_p = np.vander(u, p_deg + 1, increasing=True)
        A_q = -(g[:, None]) * np.vander(u, q_deg + 1, increasing=True)[:, 1:]
        A = np.concatenate([A_p, A_q], axis=1)
        sw = np.sqrt(w) / np.abs(g)
        coef, *_ = np.linalg.lstsq(A * sw[:, None], g * sw, rcond=None)
        p = coef[: p_deg + 1]
        q = np.concatenate([[1.0], coef[p_deg + 1:]])
        approx = np.polyval(p[::-1], u) / np.polyval(q[::-1], u)
        rel = np.abs(approx / g - 1.0)
        if best is None or rel.max() < best[0]:
            best = (rel.max(), p.copy(), q.copy())
        w = w * (1.0 + 3.0 * rel / (rel.max() + 1e-300))
        w /= w.mean()
    return best, c, h


def validate(p, q, c, h, z_lo, z_hi):
    z = np.geomspace(z_lo, z_hi, 200001)
    u = (1.0 / z - c) / h
    approx = np.polyval(p[::-1], u) / np.polyval(q[::-1], u)
    rel = np.abs(approx / g_exact(z) - 1.0)
    return rel.max(), z[np.argmax(rel)]


def emit(name, arr):
    """Print as a tuple of PLAIN Python floats — special.py's _horner
    requires weak-typed scalar coefficients (an np.array or np.float64
    table would promote f32 inputs to f64 under x64 and break the
    'result dtype follows u' contract)."""
    body = ",\n    ".join(f"{float(v)!r}" for v in arr)
    print(f"{name} = (\n    {body},\n)")


def main():
    np.set_printoptions(precision=17)
    print("# series coefficients (z<1), k=1..%d:" % N_SERIES)
    emit("_SERIES_C", series_coeffs())
    for (z_lo, z_hi, t_lo, t_hi, tag) in [
        (1.0, 6.0, 1 / 6.0, 1.0, "MID"),       # z in [1, 6]
        (6.0, 1e7, 1e-12, 1 / 6.0, "FAR"),     # z in [6, inf)
    ]:
        (fit_err, p, q), c, h = fit_interval(t_lo, t_hi, 10, 10)
        val_err, at = validate(p, q, c, h, z_lo, z_hi)
        print(f"\n# z in [{z_lo}, {z_hi}): fit max rel {fit_err:.3e}, "
              f"validated max rel {val_err:.3e} at z={at:.4f}")
        print(f"_{tag}_C, _{tag}_H = {float(c)!r}, {float(h)!r}")
        emit(f"_{tag}_P", p)
        emit(f"_{tag}_Q", q)


if __name__ == "__main__":
    main()

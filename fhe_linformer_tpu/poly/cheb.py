"""Host-side Chebyshev series tools (replaces the reference's GSL dep,
CMakeLists.txt:37, and OpenFHE's EvalChebyshevFunction fitting).

All plain float64 numpy; the homomorphic evaluation lives in eval.py.
"""

from __future__ import annotations

import numpy as np


def chebyshev_fit(f, a: float, b: float, degree: int) -> np.ndarray:
    """Chebyshev interpolation coefficients of f on [a, b] (degree+1 terms,
    basis T_0..T_degree in the variable mapped to [-1, 1])."""
    cheb = np.polynomial.chebyshev.Chebyshev.interpolate(
        f, degree, domain=[a, b])
    return cheb.coef


def cheb_eval(coeffs: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Evaluate series in T-basis at y in [-1, 1] (test oracle)."""
    return np.polynomial.chebyshev.chebval(y, coeffs)


def cheb_divmod(c: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Divide a T-basis series by T_m: c = q * T_m + r with deg(r) < m.

    Uses T_i = 2*T_(i-m)*T_m - T_|i-2m| for i > m and T_m = 1 * T_m.
    """
    c = np.array(c, np.float64)
    n = len(c) - 1
    assert m <= n
    q = np.zeros(n - m + 1)
    for i in range(n, m, -1):
        ci = c[i]
        if ci == 0.0:
            continue
        q[i - m] += 2.0 * ci
        c[abs(i - 2 * m)] -= ci
        c[i] = 0.0
    q[0] += c[m]
    c[m] = 0.0
    return q, c[:m]

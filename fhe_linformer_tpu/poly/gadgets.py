"""Nonlinearity gadgets for the encrypted Linformer circuit.

Parity targets (same math, same approximation structure):
  eval_exp     — deg-6 Taylor of e^x then 8th power by squaring + empty-slot
                 mask correction   (FHEController.cpp:1289-1311)
  eval_inverse — Chebyshev 1/x     (:1313-1328; the "naive" deg-119 variant
                 is what the mains use)
  eval_gelu    — Chebyshev of 0.5*x'*(1+erf(x'/sqrt 2)), x' = x/mult (:1330)
  eval_tanh    — Chebyshev of tanh(x/mult)               (:1334)
  relu         — Chebyshev of scaled ReLU with the degree->depth table
                 (:471-495, Utils.h:127-153)
"""

from __future__ import annotations

import math

import numpy as np

from ..ckks.ciphertext import Ciphertext
from ..ckks.evaluator import Evaluator
from .eval import PolyEvaluator

EXP_TAYLOR_DEG6 = [1.0, 1.0, 1 / 2, 1 / 6, 1 / 24, 1 / 120, 1 / 720]

# degree -> multiplicative depth of the Chebyshev evaluation
# (reference table Utils.h:127-153 mirrors OpenFHE's)
RELU_DEPTH = {7: 6, 13: 7, 27: 8, 59: 9, 119: 10, 247: 11, 495: 12}


def relu_degree_depth(degree: int) -> int:
    for d, depth in RELU_DEPTH.items():
        if degree <= d:
            return depth
    return 13


class Gadgets:
    def __init__(self, ev: Evaluator):
        self.ev = ev
        self.poly = PolyEvaluator(ev)

    def eval_exp(self, ct: Ciphertext, mask_empty: np.ndarray | None = None,
                 pow8: bool = True, boot=None,
                 boot_below: int = 0) -> Ciphertext:
        """pow8=True: deg-6 Taylor of e^x then x^8 by three squarings —
        approximates e^(8x) (circuit mode, cpp:1289-1311).  pow8=False:
        the bare deg-6 Taylor (what the golden model computes).  Optional
        additive mask turns the spurious exp(0)=1 in empty slots back to 0.

        boot/boot_below: the reference's conditional mid-exp bootstrap
        (cpp:1293-1295 — refresh between the Taylor and the power-raise
        when the remaining levels can't cover the downstream chain)."""
        ev = self.ev
        if boot is not None and ct.nl < 6:
            # defensive pre-Taylor refresh: the deg-6 PS needs ~4 levels
            # plus the rescale floor; the reference instead encrypts with
            # enough input level (read_*_input level args)
            ct = boot.bootstrap(ct)
        t = self.poly.eval_poly(ct, EXP_TAYLOR_DEG6)
        if boot is not None and t.nl - 1 < boot_below:
            t = boot.bootstrap(t)
        if pow8:
            for _ in range(3):
                t = ev.mul(t, t)
        if mask_empty is not None:
            pt = ev.encode(-1.0 * mask_empty, nl=t.nl, scale=t.scale)
            t = ev.add_plain(t, pt)
        return t

    def eval_inverse(self, ct: Ciphertext, a: float, b: float,
                     degree: int = 119) -> Ciphertext:
        return self.poly.eval_chebyshev_function(
            lambda x: 1.0 / x, ct, a, b, degree)

    def eval_gelu(self, ct: Ciphertext, a: float, b: float, mult: float,
                  degree: int = 119) -> Ciphertext:
        """GELU of the *unscaled* input: the ciphertext arrives pre-scaled
        by `mult` (weights encoded with the clip factor) and the gadget
        evaluates gelu(x/mult) — reference convention, cpp:1330-1332."""
        def gelu(x):
            xp = x / mult
            return 0.5 * xp * (1.0 + _erf(xp / math.sqrt(2.0)))
        return self.poly.eval_chebyshev_function(gelu, ct, a, b, degree)

    def eval_tanh(self, ct: Ciphertext, a: float, b: float, mult: float,
                  degree: int = 300) -> Ciphertext:
        """tanh(x/mult) on a mult-pre-scaled input (cpp:1334-1336)."""
        return self.poly.eval_chebyshev_function(
            lambda x: np.tanh(x / mult), ct, a, b, degree)

    def relu(self, ct: Ciphertext, scale: float = 1.0,
             degree: int = 119) -> Ciphertext:
        return self.poly.eval_chebyshev_function(
            lambda x: np.maximum(x * scale, 0.0) / scale, ct, -1.0, 1.0, degree)


def _erf(x):
    try:
        from scipy.special import erf as _e
        return _e(x)
    except Exception:
        return np.vectorize(math.erf)(x)

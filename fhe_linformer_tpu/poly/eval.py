"""Homomorphic polynomial evaluation: Paterson-Stockmeyer in monomial and
Chebyshev bases.

Replaces the OpenFHE EvalPoly / EvalChebyshevFunction surface the reference
leans on (/root/reference/src/FHEController.cpp:1291, :486, :1313-1336).

Scale discipline: every linear combination routes each term through a
constant multiply whose plaintext scale is solved so that all terms land on
one exact (level, scale) target — the automated equivalent of FLEXIBLEAUTO
adjustments, with the running scale tracked in host floats.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..ckks.ciphertext import Ciphertext
from ..ckks.evaluator import Evaluator
from ..ops import modarith as ma
from .cheb import chebyshev_fit, cheb_divmod


@jax.jit
def _combine_core(c0s, c1s, w, ws, q):
    """Fused linear combination: per-term Shoup constant multiplies +
    an exact modular tree-reduction over the leading term axis."""
    t0 = ma.shoup_mulmod(c0s, w, ws, q)
    t1 = ma.shoup_mulmod(c1s, w, ws, q)

    def red(x):
        while x.shape[0] > 1:
            h = x.shape[0] // 2
            head = ma.addmod(x[:h], x[h: 2 * h], q)
            x = head if x.shape[0] == 2 * h else \
                jnp.concatenate([head, x[2 * h:]], 0)
        return x[0]
    return red(t0), red(t1)


class PolyEvaluator:
    """wide=True runs ct x ct chains at the PAIRED working scale
    (~delta^2 = 2^52): every product drops TWO limbs and every scale
    normalization targets delta^2.  The per-op crypto noise (~300 coeff
    units: fresh/keyswitch noise, scale-independent) then sits at 2^-43
    relative instead of 2^-17 — the structural fix for the bootstrap
    EvalMod chain, whose slope amplification of 2^26-scale noise set the
    0.8-bit production precision ceiling (ROADMAP round-3 decomposition;
    OpenFHE gets the same effect from 52-bit ScalingModSize,
    FHEController.cpp:20-21).  Costs 2 limbs per multiplicative level."""

    def __init__(self, ev: Evaluator, wide: bool = False):
        self.ev = ev
        self.wide = wide

    @property
    def anchor(self) -> float:
        d = self.ev.ctx.delta
        return d * d if self.wide else d

    def _mul(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        ev = self.ev
        if not self.wide:
            return ev.mul(a, b)
        out = ev.mul(a, b, rescale=False)
        out = ev.rescale(ev.rescale(out))
        # drift clamp: each paired product multiplies the scale by
        # s/(qd*qd2), and the T_{2m} doubling chain SQUARES the running
        # drift — at the production ring's 25..27-bit prime spread the
        # scale blows past the 2^62 encode window within three giant
        # doublings (round-2's scale-drift lesson, now at delta^2).  One
        # conditional level per offending product bounds it at +-1.5 bits.
        if out.nl > 1 and abs(math.log2(out.scale / self.anchor)) > 1.5:
            out = ev.adjust(out, out.nl - 1, self.anchor)
        return out

    def _match(self, a: Ciphertext, b: Ciphertext):
        """ev.match, but the equal-level reconciliation lands on the
        anchor scale (ev.match hard-codes delta there)."""
        ev = self.ev
        if a.nl == b.nl and abs(a.scale / b.scale - 1.0) >= 1e-9:
            nl = a.nl - 1
            s = self.anchor
            return ev.adjust(a, nl, s), ev.adjust(b, nl, s)
        return ev.match(a, b)

    def _mul2sub(self, a: Ciphertext, b: Ciphertext,
                 c: Ciphertext) -> Ciphertext:
        """2ab - c (the T_{a+b} node) in one fused dispatch, with the
        wide drift clamp; falls back to the mul/match/sub chain when c
        sits too deep for the inlined scale match."""
        ev = self.ev
        nl_out = min(a.nl, b.nl) - (2 if self.wide else 1)
        if c.nl >= nl_out + 1:
            out = ev.mul_double_sub(a, b, c, wide=self.wide)
            if self.wide and out.nl > 1 and \
                    abs(math.log2(out.scale / self.anchor)) > 1.5:
                out = ev.adjust(out, out.nl - 1, self.anchor)
            return out
        prod = self._mul(a, b)
        prod = ev.mul_scalar_int(prod, 2)
        prod, tm = self._match(prod, c)
        return ev.sub(prod, tm)

    def _sq2m1(self, y: Ciphertext) -> Ciphertext:
        """2*y^2 - 1 (the T_{2m} node) in one fused dispatch, with the
        wide-mode drift clamp applied after."""
        ev = self.ev
        out = ev.square_double_minus_one(y, wide=self.wide)
        if self.wide and out.nl > 1 and \
                abs(math.log2(out.scale / self.anchor)) > 1.5:
            out = ev.adjust(out, out.nl - 1, self.anchor)
        return out

    # ------------------------------------------------------------------
    # linear combination with exact (nl, scale) targeting
    # ------------------------------------------------------------------

    def combine(self, terms: list[tuple[Ciphertext, float]], const: float,
                out_nl: int | None = None,
                out_scale: float | None = None) -> Ciphertext:
        """sum_i coeff_i * ct_i + const, all terms landed on one exact
        (nl, scale).  Spends one level (constant multiplies).

        Runs as ONE fused kernel over a stacked term axis: the per-term
        loop (drop + const encode + mul + add = ~4 dispatches each) made
        a deg-247 Chebyshev evaluation ~1000 small dispatches — tens of
        seconds of pure launch latency on the tunneled dev chip."""
        import jax.numpy as jnp
        ev = self.ev
        assert terms, "empty combination"
        nl_c = min(ct.nl for ct, _ in terms) if out_nl is None else out_nl + 1
        out_nl = nl_c - 1
        out_scale = out_scale or self.anchor
        qd = float(ev.ctx.qs[out_nl])
        ctx = ev.ctx
        limbs = ctx.limb_idx(nl_c)
        qs_np = np.asarray([ctx.basis[i] for i in limbs], np.int64)
        c0s, c1s, vals = [], [], []
        nb = max(ct.c0.ndim - 2 for ct, _ in terms)
        for ct, c in terms:
            ct = ev.drop_to(ct, nl_c)
            v = int(round(c * (out_scale * qd / ct.scale)))
            assert abs(v) < 1 << 62
            b0, b1 = ct.c0, ct.c1
            while b0.ndim - 2 < nb:       # align batch ranks for stacking
                b0, b1 = b0[None], b1[None]
            c0s.append(jnp.broadcast_to(b0, c0s[0].shape) if c0s and
                       b0.shape != c0s[0].shape else b0)
            c1s.append(jnp.broadcast_to(b1, c1s[0].shape) if c1s and
                       b1.shape != c1s[0].shape else b1)
            vals.append(v)
        from ..ops import modarith as ma
        res = (np.asarray(vals, np.int64)[:, None] % qs_np[None]
               )[:, :, None]                      # (T, nl, 1)
        w = jnp.asarray(res.astype(np.uint32))
        ws = jnp.asarray(ma.shoup_precompute(
            res, np.broadcast_to(qs_np[None, :, None], res.shape)))
        sh = (len(terms),) + (1,) * nb + (len(limbs), 1)
        q = ctx.mod_consts(limbs)[0]
        o0, o1 = _combine_core(jnp.stack(c0s), jnp.stack(c1s),
                               w.reshape(sh), ws.reshape(sh), q)
        acc = Ciphertext(o0, o1, nl_c, out_scale * qd)
        acc = ev.rescale(acc)
        acc.scale = out_scale
        if const != 0.0:
            acc = ev.add_plain(acc, ev.encode_const(const, acc.nl, acc.scale))
        return acc

    # ------------------------------------------------------------------
    # monomial Paterson-Stockmeyer (low degree, e.g. the exp Taylor)
    # ------------------------------------------------------------------

    def power_basis(self, x: Ciphertext, k: int) -> dict[int, Ciphertext]:
        """x^1..x^k via binary products (depth ceil(log2 k))."""
        pows = {1: x}
        for i in range(2, k + 1):
            a = i // 2
            b = i - a
            pows[i] = self._mul(pows[a], pows[b])
        return pows

    def eval_poly(self, x: Ciphertext, coeffs) -> Ciphertext:
        """p(x) = sum_i coeffs[i] x^i, monomial basis (EvalPoly parity).
        Suitable for small degree; depth = ceil(log2 deg) + 1."""
        coeffs = list(coeffs)
        deg = len(coeffs) - 1
        assert deg >= 1
        ev = self.ev
        if abs(math.log2(x.scale / self.anchor)) > 0.02:
            x = ev.adjust(x, x.nl - 1, self.anchor)
        pows = self.power_basis(x, deg)
        terms = [(pows[i], coeffs[i]) for i in range(1, deg + 1)]
        return self.combine(terms, coeffs[0])

    # ------------------------------------------------------------------
    # Chebyshev-basis Paterson-Stockmeyer (high degree)
    # ------------------------------------------------------------------

    def eval_chebyshev_series(self, y: Ciphertext, coeffs) -> Ciphertext:
        """sum_i c_i T_i(y), y expected in [-1, 1].

        Entry scale is normalized to exactly Delta: the T_{2i} = 2T_i^2-1
        recursion *squares* any scale excess (T_16 inherits 16x the input's
        drift in log-scale), so a fraction of a bit at entry becomes tens
        of bits at high degree and overflows the tracked-scale arithmetic."""
        ev = self.ev
        if abs(math.log2(y.scale / self.anchor)) > 0.02:
            y = ev.adjust(y, y.nl - 1, self.anchor)
        coeffs = np.asarray(coeffs, np.float64)
        deg = len(coeffs) - 1
        k = max(2, 1 << int(math.ceil(math.log2(max(deg, 2)) / 2)))
        babies = {1: y}
        # T_{2i} = 2 T_i^2 - 1 ; T_{i+j} = 2 T_i T_j - T_{i-j}
        for i in range(2, k + 1):
            a, b = i // 2, i - i // 2
            if a == b:
                t = self._sq2m1(babies[a])
            else:
                t = self._mul2sub(babies[a], babies[b], babies[b - a])
            babies[i] = t
        giants = {k: babies[k]}
        m = k
        while m < deg:
            giants[2 * m] = self._sq2m1(giants[m])
            m *= 2

        def rec(c: np.ndarray) -> Ciphertext:
            d = len(c) - 1
            while d > 0 and c[d] == 0.0:
                d -= 1
            c = c[: d + 1]
            if d < k:
                if d == 0:
                    return self.combine([(babies[1], 0.0)], c[0])
                terms = [(babies[i], c[i]) for i in range(1, d + 1)]
                return self.combine(terms, c[0])
            m = k
            while 2 * m <= d:
                m *= 2
            q, r = cheb_divmod(c, m)
            left = self._mul(rec_or_const(q), giants[m])
            if np.any(r != 0.0):
                right = rec(np.asarray(r))
                left, right = self._match(left, right)
                return ev.add(left, right)
            return left

        def rec_or_const(c: np.ndarray) -> Ciphertext:
            # quotient may be a bare constant: fold via combine on T_1
            d = len(c) - 1
            if d == 0 or not np.any(c[1:] != 0.0):
                return self.combine([(babies[1], 0.0)], c[0])
            return rec(np.asarray(c))

        out = rec(coeffs)
        # Exit-scale normalization: the giant/PS products leave the scale
        # drifted by several bits at production prime spreads (2^15 ring:
        # scaling primes span 25..27 bits), and callers that SQUARE the
        # result (bootstrapping's double-angle loop) would square that
        # drift doubly-exponentially — measured blowing past 2^62 within
        # 3 double angles.  One conditional level here bounds it.
        if out.nl > 1 and abs(math.log2(out.scale / self.anchor)) > 0.25:
            out = ev.adjust(out, out.nl - 1, self.anchor)
        return out

    def eval_chebyshev_function(self, f, ct: Ciphertext, a: float, b: float,
                                degree: int) -> Ciphertext:
        """Chebyshev-approximate f on [a, b] and evaluate homomorphically
        (EvalChebyshevFunction parity)."""
        coeffs = chebyshev_fit(f, a, b, degree)
        # affine map y = (2x - a - b)/(b - a)
        ev = self.ev
        sc = 2.0 / (b - a)
        sh = -(a + b) / (b - a)
        y = ev.mul_scalar(ct, sc)
        if sh != 0.0:
            y = ev.add_plain(y, ev.encode_const(sh, y.nl, y.scale))
        return self.eval_chebyshev_series(y, coeffs)

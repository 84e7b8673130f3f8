"""CKKS bootstrapping: ModRaise -> CoeffsToSlots -> EvalMod -> SlotsToCoeffs.

The reference consumes this as OpenFHE's EvalBootstrap (call sites
/root/reference/src/FHEController.cpp:438-469; setup :238-239 with level
budget {3,3}, 2^14 slots, sparse keys) — rebuilt from scratch:

  * ModRaise: lift the last-limb residues (centered) onto the full chain —
    the integer plaintext becomes s*m + q0*I with |I| <= K (sparse secret),
    s the incoming tracked scale.
  * CtS: homomorphic multiply by V^-1 (special-FFT factor groups from
    boot/transform.py as BSGS diagonal matmuls, one level per group).  The
    factor s/q0 multiplies the last group at encode time (s rides the
    FLEXIBLEAUTO-tracked scale, so it is a runtime value), landing slot
    values on y = (s/q0)*m_c + I_c — fractional message around exact
    integers, the form sin needs.
  * EvalMod: sin(2*pi*y) via Chebyshev of cos(2*pi*(y-1/4)/2^r) on [-K, K]
    plus r double-angle steps (cos 2t = 2 cos^2 t - 1), applied to the
    real/imag coefficient packings from a conjugation split.
  * StC: homomorphic multiply by V, with q0/(2*pi*s) folded into its first
    group, recombining real + i*imag.

`simulate()` mirrors every folding decision in numpy — the development
oracle and precision report (the reference's compute_approx_error
workflow, Utils.h:105-125, automated).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ckks.ciphertext import Ciphertext
from ..ckks.evaluator import Evaluator, _ntt_fwd, _ntt_inv
from ..linalg.packed import PackedOps
from ..poly.cheb import chebyshev_fit
from ..poly.eval import PolyEvaluator
from .transform import (special_fft_stages, special_ifft_stages,
                        group_stages, diagonals_of)


@dataclass
class BootConfig:
    level_budget: tuple = (3, 3)     # CtS / StC groups (reference {3,3})
    K: int = 16                      # bound on |I| (sparse ternary secret)
    sin_degree: int = 119
    double_angles: int = 3
    bs: int = 0                      # BSGS baby size; 0 = auto
    # -- round-4 precision levers (ROADMAP: the 0.8-bit ceiling is the
    # 2^26-scale crypto noise amplified through EvalMod, NOT the math) --
    # wide: run the internal pipeline (CtS exit -> EvalMod -> StC) at the
    # PAIRED working scale ~delta^2 = 2^52: noise drops to 2^-43 relative
    # per op.  Costs ~2x the multiplicative limbs between CtS and StC —
    # pair it with a longer chain (config 'linformer-boot-w').
    wide: bool = False
    # scale_boost: exact power-of-two pre-multiplier on the INPUT scale
    # (message * f reinterpreted as scale * f — free): raises s_in toward
    # q0 so noise injected before the q0/(2*pi*s_in) StC fold is amplified
    # by ~q0/s_in less.  Requires |message| * boost * scale < q0/2 at
    # mod-raise: at delta 2^26 / q0 2^30 that is |m| < 8/boost — use 2 for
    # circuit refresh sites (exp outputs reach ~4), 4 for |m| <= 2 probes.
    scale_boost: int = 1
    # wide_early: enter the paired working scale at CtS group 0 instead
    # of the last group.  SAME chain cost (raise(1) + double(2)*2 = 5
    # limbs either way at budget 3) but the key-switch noise of the inner
    # CtS groups lands relative to ~2^52 instead of 2^26 — chasing the
    # input-correlated residual of ROADMAP round-5 queue #4.
    wide_early: bool = False
    # out_boost: land the StC output at out_boost*delta by folding
    # out_boost into beta and reinterpreting the tracked scale (free).
    # Noise injected in/after the LAST (narrow) StC group — the only
    # narrow-scale stage left in the wide pipeline — shrinks by
    # out_boost in message units.  Downstream ops track scale, so the
    # circuit is unchanged; the next rescale eats the extra factor.
    out_boost: int = 1
    # msg_bound: TWICE the |message| bound the mod-raise guard assumes
    # (advisor r4: the guard is boost * scale * msg_bound < q0 while
    # mod-raise safety needs |m| * s_in < q0/2, so msg_bound=M certifies
    # |m| <= M/2).  Default 2 certifies |m| <= 1; circuit refresh sites
    # whose exp outputs reach ~4 rely on the measured 2x mod-raise margin
    # (|I| <= 7 at hw=32, K=16 — ROADMAP r4).  Circuits that normalize
    # refresh inputs to |m| <= 1/2 can claim one more boost doubling
    # (= ~1 more output bit) with msg_bound=1.
    msg_bound: float = 2.0

    @classmethod
    def wide_production(cls, scale_boost: int = 2) -> "BootConfig":
        """The round-4 production config: paired-scale internal pipeline +
        input scale boost (pair with the 'linformer-boot-w' preset).

        Env knobs (round-5 precision campaign, VERDICT r4 #4) so TPU
        steps can A/B without code edits: FHE_SCALE_BOOST, FHE_WIDE_EARLY,
        FHE_OUT_BOOST, FHE_MSG_BOUND."""
        return cls(
            wide=True,
            scale_boost=int(os.environ.get("FHE_SCALE_BOOST", scale_boost)),
            wide_early=os.environ.get("FHE_WIDE_EARLY", "0") == "1",
            out_boost=int(os.environ.get("FHE_OUT_BOOST", "1")),
            msg_bound=float(os.environ.get("FHE_MSG_BOUND", "2.0")))


class Bootstrapper:
    def __init__(self, ev: Evaluator, cfg: BootConfig | None = None):
        self.ev = ev
        self.cfg = cfg or BootConfig()
        ctx = ev.ctx
        n = ctx.cfg.n
        self.M = ctx.cfg.slots
        self.ops = PackedOps(ev, d=1)
        self.cts_diags, self.stc_diags, self.bs = self._transform_plan(
            n, self.cfg)
        self.q0 = float(ctx.qs[0])

        # --- EvalMod Chebyshev ----------------------------------------
        r = self.cfg.double_angles
        self.sin_coeffs = chebyshev_fit(
            lambda y: np.cos(2 * np.pi * (y - 0.25) / (1 << r)),
            -self.cfg.K, self.cfg.K, self.cfg.sin_degree)
        self.poly = PolyEvaluator(ev, wide=self.cfg.wide)

    # -- key requirements --------------------------------------------------

    @staticmethod
    def _transform_plan(n: int, cfg: BootConfig):
        """(cts_diags, stc_diags, bs) for ring dim n — host-only, no keys.

        The bit-reversal permutation P is dropped from BOTH transforms:
        CtS runs the inverse butterflies only (slot output lands in
        bit-reversed order), EvalMod is slot-elementwise (order-blind),
        and StC's forward butterflies consume exactly that bit-reversed
        order — P^-1 . f . P = f, so the permutations cancel.  This is
        what makes the production ring feasible: at M = 16384 / budget
        {3,3} the grouped butterfly matrices have [32, 63, 31] / [63, 63,
        16] generalized diagonals, while a group containing P has 11472
        (measured; a P-group is BSGS-intractable).  Same reason OpenFHE's
        EvalBootstrap keeps its FFT stages permutation-free."""
        P, fwd_stages = special_fft_stages(n)
        cts_groups = group_stages(special_ifft_stages(n)[:-1],
                                  cfg.level_budget[0])
        stc_groups = group_stages(fwd_stages, cfg.level_budget[1])
        cts_diags = [diagonals_of(g) for g in cts_groups]
        stc_diags = [diagonals_of(g) for g in stc_groups]
        maxd = max(len(d) for d in cts_diags + stc_diags)
        bs = cfg.bs or (1 << max(1, int(math.ceil(
            math.log2(max(2, maxd)) / 2))))
        return cts_diags, stc_diags, bs

    @classmethod
    def rotations_for(cls, n: int, cfg: BootConfig | None = None):
        """Rotation-key shifts bootstrapping needs at ring dim n — callable
        BEFORE keygen (the reference's generate_bootstrapping_and_rotation_
        keys ordering, FHEController.cpp:265-273)."""
        cfg = cfg or BootConfig()
        cts, stc, bs = cls._transform_plan(n, cfg)
        need = set()
        for dg in cts + stc:
            need |= PackedOps.bsgs_required_rotations(dg.keys(), bs, n // 2)
        return tuple(sorted(need))

    def required_rotations(self):
        need = set()
        for dg in self.cts_diags + self.stc_diags:
            need |= PackedOps.bsgs_required_rotations(dg.keys(), self.bs,
                                                      self.M)
        return tuple(sorted(need))

    # -- stages ------------------------------------------------------------

    def mod_raise(self, ct: Ciphertext) -> Ciphertext:
        """last-level ciphertext -> full-chain ciphertext of the same
        integer plaintext (+ q0*I)."""
        ev, ctx = self.ev, self.ev.ctx
        from ..ops import modarith as ma
        ct = ev.drop_to(ct, 1)
        full = ctx.num_q
        limbs = ctx.limb_idx(full)
        t1 = ctx.ntt.tables((0,))
        tf = ctx.ntt.tables(limbs)
        q0i = int(ctx.qs[0])
        half = np.uint32(q0i // 2)
        qs_np = np.asarray([ctx.basis[i] for i in limbs], np.int64
                           ).reshape(-1, 1)
        qrem = jnp.asarray(qs_np.astype(np.uint32))
        # v mod q_i for v < 2**32 via Shoup with w=1 (q0 >> q_i, so a naive
        # subtract underflows — unlike rescale, where dropped primes are
        # within 2x of every remaining prime)
        ones = jnp.asarray(np.ones_like(qs_np).astype(np.uint32))
        one_s = jnp.asarray(ma.shoup_precompute(np.ones_like(qs_np), qs_np))
        q0mod = jnp.asarray((q0i % qs_np).astype(np.uint32))
        outs = []
        for c in (ct.c0, ct.c1):
            v = _ntt_inv(c, t1)
            vm = ma.shoup_mulmod(v, ones, one_s, qrem)
            lift = jnp.where(v <= half, vm, ma.submod(vm, q0mod, qrem))
            outs.append(_ntt_fwd(lift, tf))
        return Ciphertext(outs[0], outs[1], full, ct.scale)

    def _apply_groups(self, ct: Ciphertext, diag_groups,
                      mults: dict[int, complex] | None = None) -> Ciphertext:
        for gi, dg in enumerate(diag_groups):
            m = (mults or {}).get(gi, 1.0)
            if m != 1.0:
                dg = {k: d * m for k, d in dg.items()}
            ct = self.ops.bsgs_diag_transform(ct, dg, self.bs,
                                              double_rescale=True)
        return ct

    def _folded(self, which: str, gi: int, mult: complex):
        """Folded diagonal dicts cached by (which, gi, mult) so the BSGS
        plaintext-encode cache (keyed by dict identity) stays hot across
        bootstrap calls."""
        if not hasattr(self, "_fold_cache"):
            self._fold_cache = {}
        key = (which, gi, mult)
        if key not in self._fold_cache:
            src = self.cts_diags if which == "cts" else self.stc_diags
            dg = src[gi]
            self._fold_cache[key] = dg if mult == 1.0 else \
                {k: d * mult for k, d in dg.items()}
        return self._fold_cache[key]

    def coeffs_to_slots(self, ct: Ciphertext) -> Ciphertext:
        alpha = ct.scale / self.q0
        last = len(self.cts_diags) - 1
        raise_at = 0 if (self.cfg.wide and self.cfg.wide_early) else last
        for gi in range(len(self.cts_diags)):
            dg = self._folded("cts", gi, alpha if gi == last else 1.0)
            # wide mode: ONE group RAISES the working scale by one prime
            # (~2^26 -> ~2^52) so EvalMod's whole chain runs with crypto
            # noise at 2^-43 relative.  wide_early raises at group 0 —
            # same limb cost, and the inner groups' key-switch noise then
            # also sits relative to the paired scale.
            mode = "raise" if (self.cfg.wide and gi == raise_at) \
                else "double"
            ct = self.ops.bsgs_diag_transform(ct, dg, self.bs,
                                              rescale_mode=mode)
        return ct

    def slots_to_coeffs(self, ct_r: Ciphertext, ct_i: Ciphertext,
                        s_in: float, out_div: float = 1.0) -> Ciphertext:
        """Recombine yr + i*yi inside the first StC group: both operands go
        through *identical* op chains (same plaintext scale, same dropped
        prime), so their tracked scales agree exactly — no scale forcing,
        which would bake the FLEXIBLEAUTO Delta/q drift (~1e-3) into the
        message."""
        ev = self.ev
        # out_div != 1 divides the OUTPUT MESSAGE by folding 1/out_div into
        # the StC constant — free, and it keeps the tracked (nl, scale)
        # identical to an out_div=1 bootstrap (bootstrap2 relies on this)
        beta = self.q0 / (2 * math.pi * s_in * out_div)
        last = len(self.stc_diags) - 1

        def mode(gi):
            # wide mode: the last StC group LOWERS the paired working
            # scale back by one prime, landing the output near s_in
            return "lower" if (self.cfg.wide and gi == last) else "double"
        g0 = self._folded("stc", 0, beta)
        g0i = self._folded("stc", 0, beta * 1j)
        a = self.ops.bsgs_diag_transform(ct_r, g0, self.bs,
                                         rescale_mode=mode(0))
        b = self.ops.bsgs_diag_transform(ct_i, g0i, self.bs,
                                         rescale_mode=mode(0))
        ct = ev.add(a, b)
        for gi in range(1, len(self.stc_diags)):
            ct = self.ops.bsgs_diag_transform(ct, self._folded("stc", gi, 1.0),
                                              self.bs,
                                              rescale_mode=mode(gi))
        return ct

    def eval_mod(self, ct: Ciphertext, pre_factor: complex) -> Ciphertext:
        """sin(2 pi y) via cos Chebyshev + double angle.  pre_factor folds
        the conjugation-split constant and the [-K,K]->[-1,1] normalization
        into one exact complex multiply."""
        ev = self.ev
        pt = ev.encode(np.full(self.M, pre_factor / self.cfg.K), nl=ct.nl,
                       scale=self._pre_scale(ct.nl))
        y = self._wide_pt_rescale(ev.mul_plain(ct, pt, rescale=False),
                                  ct.scale)
        return self._eval_mod_tail(y)

    def _pre_scale(self, nl: int) -> float | None:
        """Plaintext scale for the EvalMod pre-factor multiply: in wide
        mode the exact product of the two primes the double rescale drops
        (keeps the paired working scale; quantization 2^-52)."""
        if not self.cfg.wide:
            return None
        qs = self.ev.ctx.qs
        return float(qs[nl - 1]) * float(qs[nl - 2])

    def _wide_pt_rescale(self, y: Ciphertext, s_in: float) -> Ciphertext:
        """After a pre-factor multiply: one rescale normally, two in wide
        mode (exact: pt scale == product of the dropped primes)."""
        ev = self.ev
        y = ev.rescale(y)
        if self.cfg.wide:
            y = ev.rescale(y)
            y.scale = s_in          # exact by construction
        return y

    def eval_mod_pair(self, pair: Ciphertext) -> Ciphertext:
        """eval_mod on the stacked (2, ...) re/im pair with per-element
        pre-factors (0.5, -0.5j) — ONE batched Chebyshev chain instead of
        two sequential ones (EvalMod is ~40 sequential ct ops; at batch 1
        each is dispatch-bound on the tunneled chip)."""
        ev = self.ev
        rows = np.stack([np.full(self.M, 0.5 / self.cfg.K),
                         np.full(self.M, -0.5j / self.cfg.K)])
        pt = ev.encode(rows, nl=pair.nl, batch=True,
                       scale=self._pre_scale(pair.nl))
        nb = pair.c0.ndim - 3          # batch dims between the pair axis
        if nb:                         # and (nl, N)
            import jax.numpy as jnp
            d2 = pt.data.reshape((2,) + (1,) * nb + pt.data.shape[-2:])
            pt = type(pt)(d2, None, pt.nl, pt.scale)
        y = self._wide_pt_rescale(ev.mul_plain(pair, pt, rescale=False),
                                  pair.scale)
        return self._eval_mod_tail(y)

    def _eval_mod_tail(self, y: Ciphertext) -> Ciphertext:
        import math as _math
        ev = self.ev
        g = self.poly.eval_chebyshev_series(y, self.sin_coeffs)
        anchor = self.poly.anchor
        for _ in range(self.cfg.double_angles):
            # backstop: each squaring doubles the log-scale drift; keep it
            # inside the float/encode windows (normally dormant — the
            # Chebyshev exit normalization already lands near the anchor)
            if abs(_math.log2(g.scale / anchor)) > 8.0 and g.nl > 1:
                g = ev.adjust(g, g.nl - 1, anchor)
            g = self.poly._sq2m1(g)       # fused 2g^2-1, one dispatch
        return g

    def bootstrap(self, ct: Ciphertext, out_div: float = 1.0) -> Ciphertext:
        """Refresh a depleted ciphertext to the full chain minus the boot
        depth (EvalBootstrap parity).

        FHE_BOOT_CHUNK=k caps the batch processed at once: the raised
        working set is batch x full-basis wide, and at S=700 a 6-chunk
        scores batch OOM'd the shared chip; k=2 gives uniform shapes
        (one compile serves every boot site in the layer) at ~1.3x the
        amortized cost of one big batch."""
        from ..utils.timing import GLOBAL_TIMERS
        import os
        # count the REAL batch once, before any chunk padding: padded
        # zero-cts would otherwise inflate layer_bootstraps / ct/s metrics
        b = 1
        for x in ct.c0.shape[:-2]:
            b *= int(x)
        GLOBAL_TIMERS.count("bootstrap", b)
        bc = int(os.environ.get("FHE_BOOT_CHUNK", "0"))
        lead = ct.c0.shape[:-2]
        if bc and len(lead) == 1 and lead[0] > bc:
            import jax.numpy as jnp
            outs = []
            for s in range(0, lead[0], bc):
                part = ct.with_data(ct.c0[s: s + bc], ct.c1[s: s + bc])
                if part.c0.shape[0] < bc:      # pad: keep shapes uniform
                    pad = bc - part.c0.shape[0]
                    z = jnp.zeros((pad,) + part.c0.shape[1:], part.c0.dtype)
                    part = part.with_data(jnp.concatenate([part.c0, z]),
                                          jnp.concatenate([part.c1, z]))
                outs.append(self._bootstrap_impl(part, out_div))
            full = outs[0].with_data(
                jnp.concatenate([o.c0 for o in outs]),
                jnp.concatenate([o.c1 for o in outs]))
            return full.with_data(full.c0[: lead[0]], full.c1[: lead[0]])
        return self._bootstrap_impl(ct, out_div)

    def _bootstrap_impl(self, ct: Ciphertext,
                        out_div: float = 1.0) -> Ciphertext:
        """One uncounted, unchunked bootstrap (bootstrap() is the entry)."""
        f = int(self.cfg.scale_boost)
        if f > 1:
            # raise s_in toward q0 (message * f at the same scale, then
            # reinterpret — exact and free).  All downstream folds use the
            # tracked scale, so the output message is unchanged; noise
            # injected before the StC beta fold is amplified by q0/s_in
            # less.  mod_raise needs |m| * s_in < q0/2.
            assert f * ct.scale * self.cfg.msg_bound < self.q0, \
                (f, ct.scale, self.cfg.msg_bound, self.q0)
            ct = self.ev.mul_scalar_int(ct, f)
            ct.scale = ct.scale * f
        s_in = ct.scale
        raised = self.mod_raise(ct)
        enc = self.coeffs_to_slots(raised)
        cj = self.ev.conjugate(enc)
        rsum = self.ev.add(enc, cj)            # 2 * Re
        dif = self.ev.sub(enc, cj)             # 2i * Im
        pair = rsum.with_data(jnp.stack([rsum.c0, dif.c0]),
                              jnp.stack([rsum.c1, dif.c1]))
        g = self.eval_mod_pair(pair)           # identical chains, batch 2
        yr = g.with_data(g.c0[0], g.c1[0])
        yi = g.with_data(g.c0[1], g.c1[1])
        ob = float(self.cfg.out_boost)
        out = self.slots_to_coeffs(yr, yi, s_in, out_div / ob)
        if ob != 1.0:
            # message carries the extra out_boost factor; reinterpret the
            # tracked scale so the decoded value is unchanged while noise
            # injected from the last (narrow) StC group on shrinks by ob
            out.scale = out.scale * ob
        return out

    def refresh(self, ct: Ciphertext) -> Ciphertext:
        """Layer-facing refresh.  Non-wide configs default to the
        2-iteration precision bootstrap (the 26-bit-scale single pass
        measured ~0.8-2.4 bits; the second iteration refines ~5 bits —
        tools/prec_probe.py); WIDE configs default to the single pass,
        whose paired-scale EvalMod already clears 10 bits.  FHE_BOOT2=1/0
        overrides either default per run."""
        default = "0" if self.cfg.wide else "1"
        if os.environ.get("FHE_BOOT2", default) == "0":
            return self.bootstrap(ct)
        return self.bootstrap2(ct)

    def bootstrap2(self, ct: Ciphertext, prec_bits: int = 5) -> Ciphertext:
        """Two-iteration bootstrap (the reference's precision variant,
        FHEController.cpp:459-469 / OpenFHE EvalBootstrap(ct, 2, p)):
        boot once, re-encrypt the residual error scaled up by 2^p, boot it,
        and subtract — roughly doubling output precision."""
        ev = self.ev
        y1 = self.bootstrap(ct)
        # residual at the bottom level: e = y1 - m  (same scale as ct)
        y1_low = ev.adjust(y1, 1, ct.scale) if y1.nl > 1 else y1
        ct_low = ev.drop_to(ct, 1)
        e = ev.sub(y1_low, ct_low)
        e = ev.mul_scalar_int(e, 1 << prec_bits)   # message *= 2^p (SNR)
        # the second boot folds /2^p into its StC beta (out_div), so eb
        # returns at the SAME (nl, scale) as y1: the final sub costs no
        # reconciliation level and bootstrap2's output (nl, scale) equals
        # bootstrap's — circuit level gates hold under either refresh
        eb = self.bootstrap(e, out_div=float(1 << prec_bits))
        return ev.sub(y1, eb)

    # -- numpy simulator (development oracle / precision report) ----------

    def simulate(self, slots_raised: np.ndarray, s_in: float) -> np.ndarray:
        """Given the decoded slots of the raised ciphertext (at scale s_in),
        produce the slot values the bootstrap should output."""
        y = np.asarray(slots_raised, np.complex128)
        for gi, dg in enumerate(self.cts_diags):
            m = (s_in / self.q0) if gi == len(self.cts_diags) - 1 else 1.0
            y2 = np.zeros_like(y)
            for k, d in dg.items():
                y2 += d * m * np.roll(y, -k)
            y = y2
        r = self.cfg.double_angles

        def evalmod(x):
            g = np.polynomial.chebyshev.chebval(x / self.cfg.K,
                                                self.sin_coeffs)
            for _ in range(r):
                g = 2 * g * g - 1
            return g

        z = evalmod(np.real(y)) + 1j * evalmod(np.imag(y))
        for gi, dg in enumerate(self.stc_diags):
            m = self.q0 / (2 * math.pi * s_in) if gi == 0 else 1.0
            z2 = np.zeros_like(z)
            for k, d in dg.items():
                z2 += d * m * np.roll(z, -k)
            z = z2
        return z

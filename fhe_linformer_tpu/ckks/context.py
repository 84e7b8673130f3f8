"""CKKS context: parameter presets, modulus chains, and derived tables.

TPU-native redesign of the role OpenFHE's CryptoContext plays for the
reference (/root/reference/src/FHEController.cpp:3-90 sets ring 2^15,
16384 slots, hybrid key switching with 4 digits, FLEXIBLEAUTO rescaling).
Differences are deliberate hardware choices, not omissions:

  * RNS limbs are u32 with primes < 2**30 (TPU VPU/MXU have no 64-bit int
    path; see ops/modarith.py).  Depth is bought with more, smaller limbs.
  * The ciphertext scale (2**scale_bits) rides FLEXIBLEAUTO-style: rescale
    divides by the dropped prime and the exact running scale is tracked on
    the host, never on device.
  * Every level-dependent key-switch constant is precomputed here once, so
    the jitted device code is pure elementwise/matmul work.

Hybrid key switching uses a level-robust factorization: the key for digit j
encrypts P * F_j * s' with F_j = (full chain)/(full group j), and the
decomposition at ring level l multiplies limb t by
  [F_j^{-1}]_{q_t} * [(Qhat_{j,l}/q_t)^{-1}]_{q_t}
before fast-base-converting group j's limbs to the full active basis. Then
sum_j D_j(c) * F_j === c (mod Q_l) for every l, with a single fixed key.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

import jax

from ..primes import ntt_primes, scaling_primes
from ..ops import modarith as ma
from ..ops.ntt import NttContext, LimbTables


@dataclass(frozen=True)
class CKKSConfig:
    """Scheme hyper-parameters (compare FHEController::generate_context,
    /root/reference/src/FHEController.cpp:92-182 for the reference's knobs)."""
    n: int = 1 << 15                  # ring dimension (2**15 in reference)
    scale_bits: int = 26              # target scale Delta
    num_scaling: int = 20             # scaling primes = usable mult depth
    first_mod_bits: int = 30          # q0 headroom modulus (<= 30)
    dnum: int = 4                     # hybrid KS digits (NumLargeDigits=4 ref)
    secret_hw: int | None = None      # sparse ternary HW; None = uniform
    sigma: float = 3.19               # error stddev
    seed: int = 20260817              # deterministic keygen/test vectors

    @property
    def slots(self) -> int:
        return self.n // 2


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


@functools.partial(
    jax.tree_util.register_dataclass,
    meta_fields=("group",),
    data_fields=("fold", "fold_s", "conv", "conv_s", "gq"))
@dataclass(frozen=True)
class DigitTables:
    """Per (nlimbs, digit) decomposition tables."""
    group: tuple[int, ...]            # active q-limb indices in this digit
    fold: jnp.ndarray                 # (g, 1) u32 per-limb fold constant
    fold_s: jnp.ndarray               # shoup of fold
    conv: jnp.ndarray                 # (g, tgt, 1) u32 (Qhat/q_t) mod p
    conv_s: jnp.ndarray               # shoup vs target primes
    gq: jnp.ndarray                   # (g, 1) u32 group primes


@functools.partial(
    jax.tree_util.register_dataclass,
    meta_fields=("nd",),
    data_fields=("fold", "fold_s", "gq", "conv", "conv_s", "q",
                 "convp", "bias", "sh1", "p16", "p16_s", "q_row"))
@dataclass(frozen=True)
class BCTables:
    """Padded whole-decomposition tables for the fused base-conversion
    Pallas kernel (ops/basecvt.py): rows cover nd digit groups of alpha
    source limbs each, zero rows contribute nothing.

    convp..q_row drive the MXU digit-plane variant: output rows are
    (digit j, target prime p) pairs, R = nd*tgt; the conversion matrix is
    block-diagonal over digits, expanded 4x along the contraction axis
    with entries conv*2**(8*e2) mod p, and split into XDIG8 balanced s8
    planes (same scheme as ops/ntt.py:_expand_w_i8)."""
    nd: int
    fold: jnp.ndarray                 # (G, 1) u32, G = nd * alpha
    fold_s: jnp.ndarray
    gq: jnp.ndarray                   # (G, 1) source primes (1 on pad rows)
    conv: jnp.ndarray                 # (G, tgt) u32
    conv_s: jnp.ndarray
    q: jnp.ndarray                    # (tgt,) target primes
    convp: jnp.ndarray                # (XDIG8, R, XDIG8*G) s8 planes
    bias: jnp.ndarray                 # (R, 1) u32: multiple of q_row >= 2**29
    sh1: jnp.ndarray                  # (R, 1) u32: floor(2**32 / q_row)
    p16: jnp.ndarray                  # (R, 1) u32: 2**16 mod q_row
    p16_s: jnp.ndarray                # shoup of p16
    q_row: jnp.ndarray                # (R, 1) u32: target prime per out row


@functools.partial(
    jax.tree_util.register_dataclass,
    meta_fields=("nl", "tgt_idx"),
    data_fields=("digits", "pfold", "pfold_s", "pconv", "pconv_s",
                 "pinv", "pinv_s", "mdq40", "pmod", "pmod_s",
                 "q_act", "mu_act", "sh_act",
                 "q_tgt", "mu_tgt", "sh_tgt", "q_sp",
                 "t_act", "t_tgt", "t_sp", "bc", "md",
                 "own", "own_s", "t_comp"))
@dataclass(frozen=True)
class LevelKS:
    """Key-switch tables for one active q-limb count (a jit-able pytree:
    every array the keyswitch kernel needs rides in as an argument, so the
    compiled executables stay free of embedded table constants)."""
    nl: int
    tgt_idx: tuple[int, ...]          # basis indices: active q then specials
    digits: tuple[DigitTables, ...]
    # mod-down (P -> Q):
    pfold: jnp.ndarray                # (k, 1) u32
    pfold_s: jnp.ndarray
    pconv: jnp.ndarray                # (k, nl, 1) u32 (P/p_t) mod q_i
    pconv_s: jnp.ndarray
    pinv: jnp.ndarray                 # (nl, 1) u32  P^-1 mod q_i
    pinv_s: jnp.ndarray
    mdq40: jnp.ndarray                # (k, 1) u32 round(2^40 / p_t):
    # fixed-point reciprocals for the mod-down overflow estimate
    # (evaluator._md_overflow) — centers the division by P
    pmod: jnp.ndarray                 # (nl, 1) u32  P mod q_i
    pmod_s: jnp.ndarray
    q_act: jnp.ndarray                # (nl, 1) u32 active primes
    mu_act: jnp.ndarray
    sh_act: jnp.ndarray
    q_tgt: jnp.ndarray                # (nl + k, 1)
    mu_tgt: jnp.ndarray
    sh_tgt: jnp.ndarray
    q_sp: jnp.ndarray                 # (k, 1)
    t_act: LimbTables                 # NTT tables: active q limbs
    t_tgt: LimbTables                 # active q + specials
    t_sp: LimbTables                  # specials only
    bc: BCTables                      # fused decompose (Q_l -> tgt basis)
    md: BCTables                      # fused mod-down convert (P -> Q_l)
    # own-group NTT skip: fast base conversion is EXACT at the source
    # primes (cross conv terms vanish mod q_t), so digit j's eval-domain
    # rows at its own group limbs equal F_j^{-1} * x_eval — available for
    # free when the caller has the eval-domain input (it always does: the
    # coeff input is its own iNTT).  Skips nl of the nd*(nl+k) digit NTTs.
    own: jnp.ndarray                  # (nl, 1) u32: F_j(t)^{-1} mod q_t
    own_s: jnp.ndarray                # shoup of own vs q_act
    t_comp: tuple                     # per digit: LimbTables minus own group


@functools.partial(
    jax.tree_util.register_dataclass, meta_fields=(),
    data_fields=("gamma", "bits", "rowmap"))
@dataclass(frozen=True)
class GaloisPerm:
    """Factored eval-domain automorphism permutation.

    The automorphism's eval-index map is AFFINE: s(k) = (t*k + (t-1)/2)
    mod n (any odd t; see galois_perm).  Viewing the flat eval axis as
    (n2 rows, n1=128 lanes), k = n1*r + l:

        s(r, l) = n1 * ((t*r + beta(l)) mod n2) + gamma(l)
        with u(l) = (t*l + (t-1)/2) mod n, beta = u // n1, gamma = u % n1

    so the arbitrary n-entry gather factors into (1) a shared 128-lane
    gather by gamma, (2) log2(n2) conditional per-lane row rolls encoding
    beta, (3) a shared stride row gather r -> t*r mod n2.  Measured 3.5x
    faster than the flat jnp.take on v5e (tools/ab_permute.py)."""
    gamma: jnp.ndarray    # (n1,) int32 lane gather map
    bits: jnp.ndarray     # (log2(n2), n1) bool roll-stage selectors (beta bits)
    rowmap: jnp.ndarray   # (n2,) int32 shared row gather map


@functools.partial(
    jax.tree_util.register_dataclass, meta_fields=(),
    data_fields=("qd", "half", "inv", "inv_s", "qrem", "t_last", "t_rem",
                 "ones", "ones_s", "qdm"))
@dataclass(frozen=True)
class RescalePlan:
    qd: jnp.ndarray          # (1,1) u32 dropped prime
    half: jnp.ndarray        # (1,1) u32 qd//2
    inv: jnp.ndarray         # (nl-1,1) qd^-1 mod q_i
    inv_s: jnp.ndarray
    qrem: jnp.ndarray        # (nl-1,1) remaining primes
    t_last: LimbTables
    t_rem: LimbTables
    # general centering (no qd < 2*q_i bound): v mod q_i via Shoup w=1,
    # qd mod q_i for the negative branch — the mod_raise pattern.  Needed
    # at ring 2^16, where only 39 scaling primes exist inside a ratio-2
    # window around 2^26 but the preset chain needs 44 (r128c campaign).
    ones: jnp.ndarray        # (nl-1,1) u32 literal 1
    ones_s: jnp.ndarray      # shoup of 1 vs qrem
    qdm: jnp.ndarray         # (nl-1,1) qd mod q_i


def modulus_chain(cfg: CKKSConfig):
    """(qs, ps, alpha): the RNS prime chain a config resolves to — cheap
    (no NTT tables); used by Context and by security.assess_config."""
    two_n = 2 * cfg.n
    alpha = (cfg.num_scaling + 1 + cfg.dnum - 1) // cfg.dnum
    big = ntt_primes(two_n, 1 + alpha, max_bits=cfg.first_mod_bits)
    qs = (big[0],) + scaling_primes(two_n, cfg.num_scaling, cfg.scale_bits)
    return qs, tuple(big[1:]), alpha


class Context:
    def __init__(self, cfg: CKKSConfig):
        self.cfg = cfg
        n = cfg.n
        # --- modulus chain -------------------------------------------------
        self.qs, self.ps, self.alpha = modulus_chain(cfg)
        self.q0 = self.qs[0]
        self.scaling = self.qs[1:]
        self.num_q = len(self.qs)
        self.k_sp = len(self.ps)
        self.basis = self.qs + self.ps                 # full limb order
        assert len(set(self.basis)) == len(self.basis)
        self.delta = float(1 << cfg.scale_bits)

        # --- engines -------------------------------------------------------
        self.ntt = NttContext(n, self.basis)
        b = np.asarray(self.basis, np.int64)
        mus, shifts = [], []
        for q in self.basis:
            _, mu, sh = ma.barrett_params(q)
            mus.append(mu)
            shifts.append(sh)
        # (L, 1) broadcast constants for (..., L, N) flat arrays
        self.q_flat = jnp.asarray(b.reshape(-1, 1).astype(np.uint32))
        self.mu_flat = jnp.asarray(np.asarray(mus, np.int64).reshape(-1, 1).astype(np.uint32))
        self.shift_flat = jnp.asarray(np.asarray(shifts, np.int64).reshape(-1, 1).astype(np.uint32))

        self._ks: dict[int, LevelKS] = {}
        self._rescale: dict[int, tuple] = {}
        self._galois_perm: dict[int, jnp.ndarray] = {}
        self._galois_pf: dict[int, GaloisPerm] = {}
        self._rot_group = self._build_rot_group()

    # -- broadcast constant slices -----------------------------------------

    def limb_idx(self, nl: int, specials: bool = False) -> tuple[int, ...]:
        idx = list(range(nl))
        if specials:
            idx += list(range(self.num_q, self.num_q + self.k_sp))
        return tuple(idx)

    def mod_consts(self, idx: tuple[int, ...]):
        ia = np.asarray(idx)
        return (self.q_flat[ia], self.mu_flat[ia], self.shift_flat[ia])

    # -- rotations ----------------------------------------------------------

    def _build_rot_group(self) -> np.ndarray:
        n = self.cfg.n
        g = np.empty(self.cfg.slots, np.int64)
        cur = 1
        for t in range(self.cfg.slots):
            g[t] = cur
            cur = cur * 5 % (2 * n)
        return g

    def galois_t(self, rot: int) -> int:
        """Automorphism exponent for a rotation by `rot` slots (conj = -0)."""
        return int(pow(5, rot % self.cfg.slots, 2 * self.cfg.n))

    def conj_t(self) -> int:
        return 2 * self.cfg.n - 1

    def galois_perm(self, t: int) -> jnp.ndarray:
        """Eval-domain gather indices: new_eval[k] = old_eval[perm[k]]."""
        if t not in self._galois_perm:
            n = self.cfg.n
            k = np.arange(n, dtype=np.int64)
            e_new = (t * (2 * k + 1)) % (2 * n)
            self._galois_perm[t] = jnp.asarray(((e_new - 1) // 2).astype(np.int32))
        return self._galois_perm[t]

    def galois_perm_factored(self, t: int) -> GaloisPerm:
        """galois_perm(t) factored for fast application (see GaloisPerm)."""
        if t not in self._galois_pf:
            n = self.cfg.n
            n1 = min(128, n)
            n2 = n // n1
            assert t % 2 == 1 and n2 * n1 == n and n2 & (n2 - 1) == 0
            s0 = (t - 1) // 2
            l = np.arange(n1, dtype=np.int64)
            u = (t * l + s0) % n
            beta, gamma = u // n1, u % n1
            nbits = max(n2.bit_length() - 1, 1)
            bits = ((beta[None, :] >> np.arange(nbits)[:, None]) & 1) != 0
            rowmap = (t * np.arange(n2, dtype=np.int64)) % n2
            self._galois_pf[t] = GaloisPerm(
                jnp.asarray(gamma.astype(np.int32)),
                jnp.asarray(bits),
                jnp.asarray(rowmap.astype(np.int32)))
        return self._galois_pf[t]

    def auto_coeff(self, x: np.ndarray, t: int) -> np.ndarray:
        """Coefficient-domain automorphism X -> X^t on int coeff vector."""
        n = self.cfg.n
        j = np.arange(n, dtype=np.int64)
        jt = j * t % (2 * n)
        out = np.zeros_like(np.asarray(x))
        tgt = jt % n
        sign = np.where(jt >= n, -1, 1)
        out[tgt] = np.asarray(x) * sign
        return out

    # -- rescale tables ------------------------------------------------------

    def rescale_tables(self, nl: int) -> "RescalePlan":
        """Constants for dropping limb nl-1, mapping onto limbs [0, nl-1)."""
        if nl not in self._rescale:
            qd = self.qs[nl - 1]
            rem = np.asarray(self.qs[: nl - 1], np.int64)
            inv = np.asarray([pow(qd, int(q) - 2, int(q)) for q in rem], np.int64)
            col = rem.reshape(-1, 1)
            one = lambda v: jnp.asarray(np.full((1, 1), v, np.uint32))
            ones = np.ones_like(col)
            self._rescale[nl] = RescalePlan(
                qd=one(qd), half=one(qd // 2),
                inv=jnp.asarray(inv.reshape(-1, 1).astype(np.uint32)),
                inv_s=jnp.asarray(ma.shoup_precompute(inv.reshape(-1, 1), col)),
                qrem=jnp.asarray(col.astype(np.uint32)),
                t_last=self.ntt.tables((nl - 1,)),
                t_rem=self.ntt.tables(self.limb_idx(nl - 1)),
                ones=jnp.asarray(ones.astype(np.uint32)),
                ones_s=jnp.asarray(ma.shoup_precompute(ones, col)),
                qdm=jnp.asarray((int(qd) % col).astype(np.uint32)),
            )
        return self._rescale[nl]

    # -- hybrid key-switch tables -------------------------------------------

    @functools.lru_cache(maxsize=None)
    def _digit_groups_full(self) -> tuple[tuple[int, ...], ...]:
        out = []
        for j in range(self.cfg.dnum):
            g = tuple(range(j * self.alpha, min((j + 1) * self.alpha, self.num_q)))
            if g:
                out.append(g)
        return tuple(out)

    def ks_tables(self, nl: int) -> LevelKS:
        if nl in self._ks:
            return self._ks[nl]
        tgt_idx = self.limb_idx(nl, specials=True)
        tgt_primes = [self.basis[i] for i in tgt_idx]
        ntgt = len(tgt_primes)
        P = _prod(self.ps)
        digits = []
        bc_fold = []                    # padded per-row tables for the fused
        bc_gq = []                      # base-conversion kernel (row index ==
        bc_conv = []                    # active limb index; pads are inert)
        for g_full in self._digit_groups_full():
            g = tuple(i for i in g_full if i < nl)
            if not g:
                continue
            # F_j excludes the *full* group's primes, includes all other q primes
            F_j = _prod(q for i, q in enumerate(self.qs) if i not in g_full)
            qhat = _prod(self.qs[i] for i in g)
            folds, convs = [], []
            for t in g:
                qt = self.qs[t]
                qhat_t = qhat // qt
                fold = pow(F_j % qt, qt - 2, qt) * pow(qhat_t % qt, qt - 2, qt) % qt
                folds.append(fold)
                convs.append([qhat_t % p for p in tgt_primes])
            folds = np.asarray(folds, np.int64).reshape(-1, 1)
            gq = np.asarray([self.qs[t] for t in g], np.int64).reshape(-1, 1)
            convs = np.asarray(convs, np.int64)                   # (g, tgt)
            pad = self.alpha - len(g)
            bc_fold.append(np.concatenate([folds, np.zeros((pad, 1), np.int64)]))
            bc_gq.append(np.concatenate([gq, np.ones((pad, 1), np.int64)]))
            bc_conv.append(np.concatenate([convs, np.zeros((pad, ntgt),
                                                           np.int64)]))
            convs = convs[:, :, None]                             # (g, tgt, 1)
            tgt_col = np.asarray(tgt_primes, np.int64)[None, :, None]
            digits.append(DigitTables(
                group=g,
                fold=jnp.asarray(folds.astype(np.uint32)),
                fold_s=jnp.asarray(ma.shoup_precompute(folds, gq)),
                conv=jnp.asarray(convs.astype(np.uint32)),
                conv_s=jnp.asarray(ma.shoup_precompute(convs, tgt_col)),
                gq=jnp.asarray(gq.astype(np.uint32)),
            ))
        # mod-down tables: P -> active q basis
        qs_act = np.asarray(self.qs[:nl], np.int64)
        pfold, pconv = [], []
        for t, pt in enumerate(self.ps):
            p_hat_t = P // pt
            pfold.append(pow(p_hat_t % pt, pt - 2, pt))
            pconv.append([p_hat_t % int(q) for q in qs_act])
        pfold = np.asarray(pfold, np.int64).reshape(-1, 1)
        pcol = np.asarray(self.ps, np.int64).reshape(-1, 1)
        pconv2d = np.asarray(pconv, np.int64)                     # (k, nl)
        pconv = pconv2d[:, :, None]                               # (k, nl, 1)
        pinv = np.asarray([pow(P % int(q), int(q) - 2, int(q)) for q in qs_act],
                          np.int64).reshape(-1, 1)
        pmodq = np.asarray([P % int(q) for q in qs_act],
                           np.int64).reshape(-1, 1)
        mdq40 = np.asarray([(((1 << 41) // pt) + 1) >> 1 for pt in self.ps],
                           np.uint32).reshape(-1, 1)
        assert int(mdq40.max()) < (1 << 16), \
            "special prime too small for the 2^40 mod-down fixed point"
        # rounding-accuracy margin: round(2^40/p_t) truncation gives a
        # per-sum estimate error up to ~k_sp*p_max/2^41, so coefficients
        # whose true fractional overflow lies within that band of 0.5 can
        # mis-round v by +-1 (a bounded, deterministic coefficient error).
        # Guard the margin so larger-k_sp / larger-p configs can't
        # silently degrade past the correction's design point.
        assert self.k_sp * max(self.ps) / float(1 << 41) < 0.25, \
            "mod-down overflow fixed point too coarse for this chain"
        qcol = qs_act.reshape(-1, 1)
        act_idx = self.limb_idx(nl)
        sp_idx = tuple(range(self.num_q, self.num_q + self.k_sp))
        qa, mua, sha = self.mod_consts(act_idx)
        qtg, mutg, shtg = self.mod_consts(tgt_idx)

        def _bct(nd, fold, gq, conv, q_out):
            from ..ops.ntt import XDIG8
            tgt_row = q_out.reshape(1, -1)
            G = conv.shape[0]
            tgt = conv.shape[1]
            alpha = G // nd
            R = nd * tgt
            # block-diagonal expanded conversion matrix C[(j,p), (e2,t)]:
            # conv[t,p] * 2**(8*e2) mod p for t in digit j, else 0
            C = np.zeros((R, XDIG8 * G), np.int64)
            q_row = np.empty(R, np.int64)
            for j in range(nd):
                for pi in range(tgt):
                    row = j * tgt + pi
                    p = int(q_out[pi])
                    q_row[row] = p
                    for ti in range(alpha):
                        t = j * alpha + ti
                        for e2 in range(XDIG8):
                            C[row, e2 * G + t] = (
                                int(conv[t, pi]) << (8 * e2)) % p
            planes = []
            v = C.copy()
            for _ in range(XDIG8):
                u = v & 255
                d = np.where(u >= 128, u - 256, u)
                planes.append(d.astype(np.int8))
                v = (v - d) >> 8
            assert (v == 0).all()
            qr = q_row.reshape(-1, 1)
            # |P01| = |P0 + 256*P1| <= 257 * 128*128*(4G) = 16.8M*G < 2**30
            # for G <= 63; bias is the smallest multiple of q >= 2**30, so
            # x = bias + P01 in (0, 3*2**30) fits u32.  Configs past the
            # bound (large dnum test shapes) fall back to the XLA loop:
            # MXU-variant tables stay unbuilt (convp=None) and
            # evaluator._ks_decompose / _mod_down route accordingly.
            if G > 63:
                return BCTables(
                    nd=nd,
                    fold=jnp.asarray(fold.astype(np.uint32)),
                    fold_s=jnp.asarray(ma.shoup_precompute(fold, gq)),
                    gq=jnp.asarray(gq.astype(np.uint32)),
                    conv=jnp.asarray(conv.astype(np.uint32)),
                    conv_s=jnp.asarray(ma.shoup_precompute(conv, tgt_row)),
                    q=jnp.asarray(q_out.astype(np.uint32)),
                    convp=None, bias=None, sh1=None, p16=None, p16_s=None,
                    q_row=None,
                )
            bias = ((1 << 30) // qr + 1) * qr
            assert bias.max() + (1 << 30) < (1 << 32)
            p16 = np.full((R, 1), 1 << 16, np.int64) % qr
            return BCTables(
                nd=nd,
                fold=jnp.asarray(fold.astype(np.uint32)),
                fold_s=jnp.asarray(ma.shoup_precompute(fold, gq)),
                gq=jnp.asarray(gq.astype(np.uint32)),
                conv=jnp.asarray(conv.astype(np.uint32)),
                conv_s=jnp.asarray(ma.shoup_precompute(conv, tgt_row)),
                q=jnp.asarray(q_out.astype(np.uint32)),
                convp=jnp.asarray(np.stack(planes)),
                bias=jnp.asarray(bias.astype(np.uint32)),
                sh1=jnp.asarray(((1 << 32) // qr).astype(np.uint32)),
                p16=jnp.asarray(p16.astype(np.uint32)),
                p16_s=jnp.asarray(ma.shoup_precompute(p16, qr)),
                q_row=jnp.asarray(qr.astype(np.uint32)),
            )

        tgt_np = np.asarray(tgt_primes, np.int64)
        bc = _bct(len(digits), np.concatenate(bc_fold),
                  np.concatenate(bc_gq), np.concatenate(bc_conv), tgt_np)
        md = _bct(1, pfold, pcol, pconv2d, qs_act)
        # own-group skip constants (see LevelKS docstring)
        own = np.empty((nl, 1), np.int64)
        t_comp = []
        for g_full, dg in zip(self._digit_groups_full(), digits):
            g = dg.group
            F_j = _prod(q for i, q in enumerate(self.qs) if i not in g_full)
            for t in g:
                qt = self.qs[t]
                own[t, 0] = pow(F_j % qt, qt - 2, qt)
            comp = tuple(i for i in tgt_idx if i not in g)
            t_comp.append(self.ntt.tables(comp))
        lk = LevelKS(
            nl=nl, tgt_idx=tgt_idx, digits=tuple(digits),
            pfold=jnp.asarray(pfold.astype(np.uint32)),
            pfold_s=jnp.asarray(ma.shoup_precompute(pfold, pcol)),
            pconv=jnp.asarray(pconv.astype(np.uint32)),
            pconv_s=jnp.asarray(ma.shoup_precompute(pconv, qcol[None, :, :])),
            pinv=jnp.asarray(pinv.astype(np.uint32)),
            pinv_s=jnp.asarray(ma.shoup_precompute(pinv, qcol)),
            mdq40=jnp.asarray(mdq40),
            pmod=jnp.asarray(pmodq.astype(np.uint32)),
            pmod_s=jnp.asarray(ma.shoup_precompute(pmodq, qcol)),
            q_act=qa, mu_act=mua, sh_act=sha,
            q_tgt=qtg, mu_tgt=mutg, sh_tgt=shtg,
            q_sp=jnp.asarray(pcol.astype(np.uint32)),
            t_act=self.ntt.tables(act_idx),
            t_tgt=self.ntt.tables(tgt_idx),
            t_sp=self.ntt.tables(sp_idx),
            bc=bc, md=md,
            own=jnp.asarray(own.astype(np.uint32)),
            own_s=jnp.asarray(ma.shoup_precompute(own, qcol)),
            t_comp=tuple(t_comp),
        )
        self._ks[nl] = lk
        return lk

"""Key material and key generation.

Covers the roles of FHEController::generate_context key paths
(/root/reference/src/FHEController.cpp:47-57: KeyGen + EvalMultKeyGen) and
generate_rotation_keys / generate_bootstrapping_and_rotation_keys
(:242-273).  Hybrid key-switch keys follow the level-robust factorization
documented in context.py: digit j encrypts P * F_j * s' over the full
extended basis Q*P; one key serves every level.

All sampling is host numpy (seeded, deterministic — the test-vector
contract in SURVEY.md §4 depends on it); the polynomial arithmetic runs on
device through the NTT engine.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modarith as ma
from .context import Context


@dataclass
class SecretKey:
    coeffs: np.ndarray           # (n,) int8 ternary, host
    eval_full: jnp.ndarray       # (num_q + k_sp, N) u32 eval domain


@dataclass
class PublicKey:
    p0: jnp.ndarray              # (num_q, N) u32 eval
    p1: jnp.ndarray


@dataclass
class KSKey:
    """One hybrid key-switch key (relin, one rotation, or conjugation).

    The `a` halves are uniform ring elements derived from a NAMED seed
    (independent of generation order), so serialization can store the seed
    instead of the arrays — halving key files, the dominant key-store cost
    (SURVEY.md §3.1: reference keys are multi-GB).  Standard seeded-RLWE
    trick; `b` still carries the secret-dependent half.

    `max_nl` keys are REDUCED-BASIS: rows cover q-limbs [0, max_nl) plus
    the specials only, usable at ct levels <= max_nl.  Circuit-only
    rotation keys (rotsum/interleave/BSGS babies) never see levels above
    ~20 in the bootstrapped chain, so storing them at 60-limb width wastes
    ~40% of the multi-GB key HBM budget (VERDICT r2 weak #3)."""
    b: jnp.ndarray               # (ndig, rows, N) u32 eval
    a: jnp.ndarray
    a_seed: tuple | None = None  # PRNG seed sequence that regenerates `a`
    max_nl: int | None = None    # None = full basis; else reduced rows


def seeded_uniform_eval(seed, qs, ndig: int, n: int) -> np.ndarray:
    """(ndig, len(qs), n) u32 uniform residues from a named seed — the
    exact sampling order KSKey generation and regeneration share."""
    rng = np.random.default_rng(seed)
    out = np.empty((ndig, len(qs), n), np.uint32)
    for j in range(ndig):
        for i, q in enumerate(qs):
            out[j, i] = rng.integers(0, int(q), n, dtype=np.uint32)
    return out


def rns_residues(coeffs: np.ndarray, primes) -> np.ndarray:
    """Centered int coeffs (..., n) -> (..., L, n) u32 residues."""
    c = np.asarray(coeffs, np.int64)[..., None, :]
    qs = np.asarray(primes, np.int64)[:, None]
    return (c % qs).astype(np.uint32)


class KeyGenerator:
    def __init__(self, ctx: Context):
        self.ctx = ctx
        self.rng = np.random.default_rng(ctx.cfg.seed)

    # -- samplers ----------------------------------------------------------

    def ternary(self) -> np.ndarray:
        cfg = self.ctx.cfg
        if cfg.secret_hw is None:
            return self.rng.integers(-1, 2, cfg.n).astype(np.int64)
        s = np.zeros(cfg.n, np.int64)
        idx = self.rng.choice(cfg.n, cfg.secret_hw, replace=False)
        s[idx] = self.rng.choice([-1, 1], cfg.secret_hw)
        return s

    def gauss(self, shape=None) -> np.ndarray:
        n = self.ctx.cfg.n
        return np.rint(self.rng.normal(0.0, self.ctx.cfg.sigma,
                                       shape if shape is not None else (n,))
                       ).astype(np.int64)

    def uniform_eval(self, limbs: tuple[int, ...], extra_shape=()) -> jnp.ndarray:
        """Uniform ring element directly in the eval domain (CRT-uniform)."""
        qs = [self.ctx.basis[i] for i in limbs]
        out = np.empty((*extra_shape, len(qs), self.ctx.cfg.n), np.uint32)
        for i, q in enumerate(qs):
            out[..., i, :] = self.rng.integers(0, q, (*extra_shape, self.ctx.cfg.n),
                                               dtype=np.uint32)
        return jnp.asarray(out)

    def to_eval(self, coeffs: np.ndarray, limbs: tuple[int, ...]) -> jnp.ndarray:
        qs = [self.ctx.basis[i] for i in limbs]
        res = rns_residues(coeffs, qs)
        return self.ctx.ntt.fwd(jnp.asarray(res), limbs)

    # -- key generation ----------------------------------------------------

    def secret_key(self) -> SecretKey:
        s = self.ternary()
        full = self.ctx.limb_idx(self.ctx.num_q, specials=True)
        return SecretKey(s.astype(np.int8), self.to_eval(s, full))

    def public_key(self, sk: SecretKey) -> PublicKey:
        ctx = self.ctx
        limbs = ctx.limb_idx(ctx.num_q)
        q, mu, sh = ctx.mod_consts(limbs)
        a = self.uniform_eval(limbs)
        e = self.to_eval(self.gauss(), limbs)
        s = sk.eval_full[: ctx.num_q]
        p0 = ma.submod(e, ma.barrett_mulmod(a, s, q, mu, sh), q)
        return PublicKey(p0, a)

    def _ks_key(self, sk: SecretKey, s_prime_eval: jnp.ndarray,
                tag: tuple = (), max_nl: int | None = None) -> KSKey:
        """KSK digits encrypting P*F_j*s' under s, over the full basis
        (or the [0, max_nl) + specials reduced basis — see KSKey.max_nl).
        `tag` names the key so its `a` halves regenerate from the seed
        alone (see KSKey); the seed stream covers the basis rows actually
        stored, so reduced keys regenerate identically."""
        ctx = self.ctx
        if max_nl is not None and max_nl >= ctx.num_q:
            max_nl = None
        nl_rows = ctx.num_q if max_nl is None else max_nl
        full = ctx.limb_idx(nl_rows, specials=True)
        q, mu, sh = ctx.mod_consts(full)
        P = 1
        for p in ctx.ps:
            P *= p
        groups = ctx._digit_groups_full()
        seed = (ctx.cfg.seed & 0x7FFFFFFF, 0xA5) + tuple(tag) + \
            (() if max_nl is None else (0x4E, max_nl))
        a_all = seeded_uniform_eval(seed, [ctx.basis[i] for i in full],
                                    len(groups), ctx.cfg.n)
        a_all = jnp.asarray(a_all)
        bs = []
        ridx = np.asarray(full)
        s = sk.eval_full if max_nl is None else sk.eval_full[ridx]
        s_prime_eval = s_prime_eval if max_nl is None else \
            s_prime_eval[ridx]
        for dj, g_full in enumerate(groups):
            F_j = 1
            for i, qq in enumerate(ctx.qs):
                if i not in g_full:
                    F_j *= qq
            factor = np.asarray([(P * F_j) % ctx.basis[i] for i in full],
                                np.int64).reshape(-1, 1)
            a_j = a_all[dj]
            e_j = self.to_eval(self.gauss(), full)
            fac = jnp.asarray(factor.astype(np.uint32))
            fac_s = jnp.asarray(ma.shoup_precompute(
                factor, np.asarray([ctx.basis[i] for i in full],
                                   np.int64).reshape(-1, 1)))
            b_j = _ksk_digit(a_j, e_j, s, s_prime_eval, fac, fac_s, q, mu, sh)
            bs.append(b_j)
        return KSKey(jnp.stack(bs), a_all, seed, max_nl=max_nl)

    def relin_key(self, sk: SecretKey) -> KSKey:
        ctx = self.ctx
        full = ctx.limb_idx(ctx.num_q, specials=True)
        q, mu, sh = ctx.mod_consts(full)
        s2 = ma.barrett_mulmod(sk.eval_full, sk.eval_full, q, mu, sh)
        return self._ks_key(sk, s2, tag=(0, 0))

    def rotation_key(self, sk: SecretKey, rot: int,
                     max_nl: int | None = None) -> KSKey:
        """Key switching tau_t(s) -> s for rotation by `rot` slots."""
        t = self.ctx.galois_t(rot)
        return self._galois_key(sk, t, max_nl=max_nl)

    def conjugation_key(self, sk: SecretKey) -> KSKey:
        return self._galois_key(sk, self.ctx.conj_t())

    def _galois_key(self, sk: SecretKey, t: int,
                    max_nl: int | None = None) -> KSKey:
        perm = self.ctx.galois_perm(t)
        s_rot = jnp.take(sk.eval_full, perm, axis=-1)
        return self._ks_key(sk, s_rot, tag=(1, t), max_nl=max_nl)


@jax.jit
def _ksk_digit(a_j, e_j, s, s_prime, fac, fac_s, q, mu, sh):
    """b_j = e_j - a_j*s + (P*F_j)*s' over the full extended basis."""
    return ma.addmod(
        ma.submod(e_j, ma.barrett_mulmod(a_j, s, q, mu, sh), q),
        ma.shoup_mulmod(s_prime, fac, fac_s, q), q)


@dataclass
class KeySet:
    """Everything the evaluator needs; rotation keys keyed by slot shift."""
    sk: SecretKey | None         # retained for debug decrypt probes, like the
    pk: PublicKey                # reference server does (FHEController.cpp:203-210)
    relin: KSKey
    rot: dict[int, KSKey]
    conj: KSKey | None = None


def generate_keys(ctx: Context, rotations: tuple[int, ...] = (),
                  conj: bool = False, keep_secret: bool = True,
                  rotations_reduced: tuple[int, ...] = (),
                  reduced_max_nl: int | None = None) -> KeySet:
    """rotations_reduced generate at the [0, reduced_max_nl) + specials
    basis — for circuit-only shifts that never key-switch above that
    level (the bootstrapped chain's circuit segments run at nl <= ~20
    while the full basis is 60 limbs wide; see KSKey.max_nl)."""
    kg = KeyGenerator(ctx)
    sk = kg.secret_key()
    pk = kg.public_key(sk)
    relin = kg.relin_key(sk)
    rot = {r: kg.rotation_key(sk, r) for r in rotations}
    for r in rotations_reduced:
        if r not in rot:
            rot[r] = kg.rotation_key(sk, r, max_nl=reduced_max_nl)
    ck = kg.conjugation_key(sk) if conj else None
    return KeySet(sk if keep_secret else None, pk, relin, rot, ck)

"""Homomorphic evaluation: the TPU-native core of the scheme.

Covers what the reference calls through OpenFHE at
/root/reference/src/FHEController.cpp:348-469 (encode/encrypt/decrypt,
add/mult/rotate, rescale) — but with level/scale bookkeeping automated
(the reference threads GetLevel() by hand, see SURVEY.md §2.1 notes) and
with every op batched over arbitrary leading ciphertext dims.

Device work is organized as a handful of jitted composites keyed on array
shapes only; running scale lives on the host wrapper and never triggers a
retrace.  Eval-domain representation throughout; NTT boundaries appear
only inside rescale and key switching, exactly where the math needs them.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# Skip the digit-NTT rows covered by own-group exactness (see
# _ks_decompose).  Opt-out knob for A/B timing.
_OWNSKIP = os.environ.get("FHE_KS_OWNSKIP", "1") == "1"

from ..ops import modarith as ma
from ..utils.timing import GLOBAL_TIMERS as _COUNTS
from .context import Context, GaloisPerm
from .ciphertext import Ciphertext, Plaintext
from .encoding import Encoder
from .keys import KeySet, KSKey, rns_residues


from dataclasses import dataclass


import functools


@functools.partial(
    jax.tree_util.register_dataclass, meta_fields=("idx",),
    data_fields=("arr",))
@dataclass(frozen=True)
class LazyRows:
    """A key half as the FULL stored array + a static row subset;
    kernels slice at trace time (_mat_rows).  Eagerly materialized
    per-level key slices were another silent multi-GB resident set
    (~45 MB x levels x 46 keys at the production basis)."""
    arr: jnp.ndarray           # (ndig, rows_full, N)
    idx: tuple                 # static row subset


def _mat_rows(x):
    if isinstance(x, LazyRows):
        from ..ops.ntt import _runs
        parts = [jax.lax.slice_in_dim(x.arr, lo, hi, axis=1)
                 for lo, hi in _runs(tuple(x.idx))]
        return parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=1)
    return x


@dataclass
class CoeffPlaintext:
    """Compressed plaintext: scaled integer coefficients as two 32-bit
    planes, v = hi * 2^32 + lo (hi signed, lo unsigned) — covers the full
    int64 encode range incl. the bootstrap's double-rescale scale ~2^52.
    Expanded to eval-domain rows on device inside the rotation-combo
    kernel (see Evaluator.encode_coeff_cached): 256 KB per diagonal at
    n=2^15 vs ~(nl+k) x N x 4 B of per-level eval rows."""
    lo: jnp.ndarray      # (N,) uint32
    hi: jnp.ndarray      # (N,) int32
    scale: float


def _nct(ct: Ciphertext) -> int:
    """Ciphertext count of a batched ct — the unit the reference's per-ct
    loops (and its timing prints) count in."""
    b = ct.c0.shape[:-2]
    out = 1
    for x in b:
        out *= int(x)
    return out


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


class Evaluator:
    def __init__(self, ctx: Context, keys: KeySet):
        self.ctx = ctx
        self.keys = keys
        self.encoder = Encoder(ctx.cfg.n)
        self._enc_rng = np.random.default_rng(ctx.cfg.seed ^ 0x5EED)
        self._enc_cache: dict = {}
        self._sk_host: np.ndarray | None = None

    def prefetch_host_sk(self) -> None:
        """Cache the secret key's eval-domain residues host-side.  Call
        EARLY (right after keygen, while HBM is near-empty): on the shared
        dev chip, d2h transfers fail with ResourceExhausted once the
        arena hits its high-water, and decrypt_host needs the sk."""
        if self._sk_host is None and self.keys is not None \
                and self.keys.sk is not None:
            self._sk_host = np.asarray(self.keys.sk.eval_full)

    def release_device_keys(self) -> None:
        """Drop every device-side key buffer (relin + rotation + public:
        multi-GB at production parameters) so a final decrypt_host
        verification has d2h headroom.  The evaluator afterwards supports
        ONLY decrypt_host (the host sk is cached first); any key-consuming
        op raises a descriptive error via _require_keys."""
        self.prefetch_host_sk()
        self.keys = None
        # the fused-op key STACKS are device copies of key material too
        # (~250 MB each at production: baby/tree/deinterleave LRUs) —
        # round 4's S=700 decrypt kept OOMing until these were dropped
        self._baby_stack = None
        if hasattr(self, "_tree_stacks"):
            self._tree_stacks.clear()
        self._keys_released = True

    def _require_keys(self, what: str):
        """Descriptive failure when device keys were released (ADVICE r2:
        a bare AttributeError on NoneType was opaque)."""
        if self.keys is None:
            raise RuntimeError(
                f"{what} needs device keys, but release_device_keys() was "
                "called — only decrypt_host() works on this evaluator now")
        return self.keys

    def encode_cached(self, key, values, nl: int | None = None,
                      scale: float | None = None,
                      specials: bool = False) -> Plaintext:
        """encode() memoized by a caller-supplied stable key — plaintext
        masks/weights/diagonals are hot-path constants; re-encoding them
        per call costs a host FFT + device NTT each time."""
        k = (key, nl, scale, specials)
        if k not in self._enc_cache:
            self._enc_cache[k] = self.encode(values, nl=nl, scale=scale,
                                             specials=specials)
        return self._enc_cache[k]

    def encode_coeff_cached(self, key, values, scale: float | None = None):
        """Level-independent COMPRESSED plaintext: the scaled integer
        coefficient vector as int32, (N,) — 128 KB at n=2^15 instead of
        the ~`(nl+k) x N` eval-domain rows (~3-5 MB *per level*).  The
        rotation-combo kernel RNS-spreads + NTTs it on device per use
        (~30 limb NTTs, ~0.07 ms at measured NTT rates).  This is what
        makes caching ~2d diagonals per weight matrix affordable: the
        block-major circuit caches ~3k diagonals across its 12 matrices
        (~800 MB as coeff planes; ~10 GB as per-level eval rows — an
        instant OOM), and the bootstrap's ~270 transform diagonals shrink
        from ~1.7 GB of extended rows to ~70 MB."""
        k = (key, float(scale) if scale is not None else None, "coeff")
        if k not in self._enc_cache:
            sc = self.ctx.delta if scale is None else scale
            coeffs = self.encoder.encode(np.asarray(values), sc)
            lo = (coeffs & 0xFFFFFFFF).astype(np.uint32)
            hi = (coeffs >> 32).astype(np.int32)
            self._enc_cache[k] = CoeffPlaintext(
                jnp.asarray(lo), jnp.asarray(hi), sc)
        return self._enc_cache[k]

    # ------------------------------------------------------------------
    # encode / encrypt / decrypt / decode
    # ------------------------------------------------------------------

    def encode(self, values, nl: int | None = None, scale: float | None = None,
               batch: bool = False, specials: bool = False) -> Plaintext:
        """Slot values -> eval-domain plaintext at (nl, scale).

        specials=True encodes over the EXTENDED basis (nl actives + the
        special primes) — consumed only by the double-hoisted rotation
        combo (rotate_combo), whose lazy mod-down multiplies plaintexts
        into inner products that still live on Q*P.  Such plaintexts are
        not valid operands for the ordinary Q-basis ops."""
        ctx = self.ctx
        nl = ctx.num_q if nl is None else nl
        scale = ctx.delta if scale is None else scale
        vals = np.atleast_2d(np.asarray(values)) if batch else \
            np.asarray(values)[None]
        coeffs = np.stack([self.encoder.encode(v, scale) for v in vals])
        limbs = ctx.limb_idx(nl, specials=specials)
        qs = [ctx.basis[i] for i in limbs]
        if np.abs(coeffs).max() < (1 << 31):
            # device-side RNS spread: ship int32 coeffs (1/L of the residue
            # volume — host->device bandwidth is the encrypt bottleneck on
            # tunneled devices) and reduce mod each prime on device.
            res = _rns_spread_i32(jnp.asarray(coeffs.astype(np.int32)),
                                  *ctx.mod_consts(limbs))
        else:
            res = jnp.asarray(rns_residues(coeffs, qs))
        data = ctx.ntt.fwd(res, limbs)
        if not batch:
            data = data[0]
        # ct x pt multiplies use Barrett (no Shoup precompute): computing
        # w' = floor(w*2^32/q) exactly requires a host round-trip of the
        # full eval-domain plaintext — 2x ciphertext-sized transfers that
        # dominated encode on tunneled devices.
        return Plaintext(data, None, nl, scale)

    def encode_const(self, c: float, nl: int | None = None,
                     scale: float | None = None) -> Plaintext:
        """Constant-in-all-slots plaintext as a (nl, 1) broadcast — a
        constant polynomial is constant in the eval domain, no NTT needed."""
        ctx = self.ctx
        nl = ctx.num_q if nl is None else nl
        scale = ctx.delta if scale is None else scale
        v = int(round(c * scale))
        assert abs(v) < 1 << 62
        qs = np.asarray([ctx.basis[i] for i in ctx.limb_idx(nl)], np.int64)
        res = (np.int64(v) % qs).reshape(-1, 1)
        data = jnp.asarray(res.astype(np.uint32))
        shoup = jnp.asarray(ma.shoup_precompute(res, qs.reshape(-1, 1)))
        return Plaintext(data, shoup, nl, scale)

    def adjust(self, ct: Ciphertext, nl: int, scale: float) -> Ciphertext:
        """Bring ct to exactly (nl, scale) — spends one level on a
        unit-constant multiply unless already matching (FLEXIBLEAUTO's
        level/scale adjustment, automated)."""
        if ct.nl == nl and abs(ct.scale / scale - 1.0) < 1e-9:
            return ct
        assert ct.nl > nl, f"cannot raise level {ct.nl} -> {nl}"
        ct = self.drop_to(ct, nl + 1)
        if abs(ct.scale / scale - 1.0) < 1e-9:
            return self.drop_to(ct, nl)
        qd = float(self.ctx.qs[nl])
        pt = self.encode_const(1.0, nl + 1, scale * qd / ct.scale)
        out = self.mul_plain(ct, pt, rescale=True)
        out.scale = scale  # exact by construction; avoid float drift
        return out

    # -- batch canonicalization / chunking -----------------------------
    # Key-switch composites materialize ~12x the ciphertext volume in
    # intermediates (digit stacks, NTT digit planes); at N=2^15 a few
    # hundred batched cts would blow past HBM (and the TPU compiler).
    # Heavy ops therefore flatten leading batch dims to one axis (fewer
    # distinct compile shapes) and process fixed-size chunks.

    def _heavy_chunk(self, nl: int) -> int:
        # key-switch throughput on v5e peaks at SMALL batches (measured
        # 2026-08: 979 ks/s at 4 cts/call vs 636 at 32 — the ~12x
        # intermediate volume of a key switch thrashes HBM at large B),
        # so the cap is a perf knob, not just an HBM guard.
        import os
        cap = int(os.environ.get("FHE_HEAVY_CHUNK", "8"))
        per_ct = nl * self.ctx.cfg.n * 4 * 16   # bytes with overhead factor
        return max(1, min(cap, (1 << 31) // per_ct))

    def _chunked(self, ct: Ciphertext, f) -> Ciphertext:
        bshape = ct.c0.shape[:-2]
        tail = ct.c0.shape[-2:]
        if not bshape:
            return f(ct)
        flat0 = ct.c0.reshape((-1,) + tail)
        flat1 = ct.c1.reshape((-1,) + tail)
        B = flat0.shape[0]
        chunk = self._heavy_chunk(ct.nl)
        if B <= chunk and len(bshape) == 1:
            return f(ct)
        outs = []
        for s in range(0, B, chunk):
            part = ct.with_data(flat0[s: s + chunk], flat1[s: s + chunk])
            outs.append(f(part))
        o0 = jnp.concatenate([o.c0 for o in outs])
        o1 = jnp.concatenate([o.c1 for o in outs])
        last = outs[-1]
        o0 = o0.reshape(bshape + o0.shape[-2:])
        o1 = o1.reshape(bshape + o1.shape[-2:])
        return Ciphertext(o0, o1, last.nl, last.scale)

    def match(self, a: Ciphertext, b: Ciphertext):
        """Bring two ciphertexts to a common exact (nl, scale) pair,
        spending at most one level on whichever branches need it."""
        if a.nl == b.nl:
            if abs(a.scale / b.scale - 1.0) < 1e-9:
                return a, b
            nl = a.nl - 1
            s = self.ctx.delta
            return self.adjust(a, nl, s), self.adjust(b, nl, s)
        if a.nl > b.nl:
            return self.adjust(a, b.nl, b.scale), b
        return a, self.adjust(b, a.nl, a.scale)

    def encrypt(self, values=None, pt: Plaintext | None = None,
                nl: int | None = None, scale: float | None = None,
                batch: bool = False) -> Ciphertext:
        """Public-key encryption (FHEController::encrypt, cpp:374-391)."""
        ctx = self.ctx
        if pt is None:
            pt = self.encode(values, nl, scale, batch)
        nl = pt.nl
        limbs = ctx.limb_idx(nl)
        consts = ctx.mod_consts(limbs)
        n = ctx.cfg.n
        bshape = pt.data.shape[:-2]
        # encryption randomness sampled ON DEVICE (jax threefry, seeded
        # deterministically) — host sampling + residue upload was the
        # encrypt bottleneck for large token batches on tunneled devices
        import jax
        seed = int(self._enc_rng.integers(0, 2 ** 31))
        kv, k0, k1 = jax.random.split(jax.random.PRNGKey(seed), 3)
        sigma = float(ctx.cfg.sigma)
        v = jax.random.randint(kv, (*bshape, n), 0, 3, dtype=jnp.int32) - 1
        e0 = jnp.rint(sigma * jax.random.normal(k0, (*bshape, n))
                      ).astype(jnp.int32)
        e1 = jnp.rint(sigma * jax.random.normal(k1, (*bshape, n))
                      ).astype(jnp.int32)
        v_e = ctx.ntt.fwd(_rns_spread_i32(v, *consts), limbs)
        e0_e = ctx.ntt.fwd(_rns_spread_i32(e0, *consts), limbs)
        e1_e = ctx.ntt.fwd(_rns_spread_i32(e1, *consts), limbs)
        p0 = self._require_keys("encrypt").pk.p0[:nl]
        p1 = self.keys.pk.p1[:nl]
        c0, c1 = _encrypt_core(p0, p1, v_e, e0_e, e1_e, pt.data, *consts)
        return Ciphertext(c0, c1, nl, pt.scale)

    def decrypt(self, ct: Ciphertext, crt_limbs: int = 3) -> np.ndarray:
        """Decrypt + decode to complex slot values (batched).

        Mod-switches down to `crt_limbs` limbs first: the CRT lift only
        reads that many anyway, and decrypting a full-chain batch was an
        HBM/transfer hot spot (the iNTT of 19+ limbs x batch at 2^15
        OOM'd the shared dev chip)."""
        ctx = self.ctx
        sk = self._require_keys("decrypt").sk
        assert sk is not None, "secret key not retained"
        ct = self.drop_to(ct, min(ct.nl, max(crt_limbs, 1)))
        limbs = ctx.limb_idx(ct.nl)
        consts = ctx.mod_consts(limbs)
        s = sk.eval_full[: ct.nl]
        m_eval = _decrypt_core(ct.c0, ct.c1, s, *consts)
        coeffs = np.asarray(ctx.ntt.inv(m_eval, limbs))
        ints = self._crt_lift(coeffs, ct.nl, min(crt_limbs, ct.nl))
        flat = ints.reshape(-1, ctx.cfg.n)
        out = np.stack([self.encoder.decode(c, ct.scale) for c in flat])
        return out.reshape(*ct.batch_shape, ctx.cfg.slots)

    def decrypt_host(self, ct: Ciphertext, crt_limbs: int = 3) -> np.ndarray:
        """Decrypt entirely on the HOST: downloads the raw eval-domain
        residues (a pure transfer, no device program) and runs modular
        arithmetic + iNTT (reference NttPlan) + CRT + decode in numpy.

        Same result as decrypt() at the same crt_limbs.  Exists because
        on the tunneled dev TPU a *fresh-shaped* decrypt graph costs
        minutes of remote compilation — far more than the 10 MB download
        this does — so verification probes (bootstrap precision, bench
        decrypt checks) use this path."""
        ctx = self.ctx
        if self._sk_host is None:
            sk = self.keys.sk
            assert sk is not None, "secret key not retained"
            self._sk_host = np.asarray(sk.eval_full)
        m = min(crt_limbs, ct.nl)

        # slice ON DEVICE before the download: the full-limb transfer's
        # d2h staging failed with ResourceExhausted at the post-layer
        # arena high-water (S=700 round-4 campaign) — only the m CRT rows
        # are needed, an 8-20x smaller transfer.  Per-limb fallback: even
        # the sliced staging can fail right at the high-water; one
        # (..., N) row at a time needs only ~128 KB of headroom.
        def _d2h(arr):
            try:
                return np.asarray(arr[..., :m, :])
            except Exception:
                return np.stack(
                    [np.asarray(arr[..., i, :]) for i in range(m)],
                    axis=-2)

        c0 = _d2h(ct.c0).astype(np.uint64)
        c1 = _d2h(ct.c1).astype(np.uint64)
        s = self._sk_host[:m, :].astype(np.uint64)
        qs = np.asarray(ctx.qs[:m], np.uint64).reshape(-1, 1)
        m_eval = (c0 + c1 * s % qs) % qs          # products < 2^60 exact
        from ..reference import NttPlan
        flat = m_eval.reshape(-1, m, ctx.cfg.n)
        coeffs = np.empty_like(flat)
        for i in range(m):
            plan = NttPlan(ctx.cfg.n, int(ctx.qs[i]))
            for b in range(flat.shape[0]):
                coeffs[b, i] = plan.inv(flat[b, i].astype(np.int64))
        ints = self._crt_lift(coeffs.astype(np.uint32), m, m)
        out = np.stack([self.encoder.decode(c, ct.scale)
                        for c in ints.reshape(-1, ctx.cfg.n)])
        return out.reshape(*ct.batch_shape, ctx.cfg.slots)

    def decrypt_slots_device(self, ct: Ciphertext, slot_idx,
                             crt_limbs: int = 3) -> np.ndarray:
        """Decrypt + decode ONLY the requested slots, entirely ON DEVICE:
        the lone d2h is len(slot_idx) f32 values per ct (~bytes).

        Exists for post-layer verification at the HBM arena high-water,
        where even the KB-scale d2h staging of `decrypt_host`'s sliced
        download ResourceExhausts on the tunneled chip (S=700, rounds
        3-4).  Mirrors the reference's final decrypt -> logits step
        (main_2.cpp:120-142) without ever materializing slot vectors.

        Method (exact integers until the final float combine):
          1. m_eval = c0 + c1*s per limb (Barrett, device)
          2. iNTT to coefficient residues r_i (four-step MXU NTT)
          3. centered CRT without bignums: t_i = r_i*(Q/q_i)^-1 mod q_i;
             the overflow count k = round(sum_i t_i/q_i) is EXACT here
             because the true coefficient magnitude (~2^31) is tiny vs
             Q (~2^80): the fractional sum sits within ~2^-50 of an
             integer while the f32 evaluation noise is ~2^-22.  Then
             x mod 2^32 = sum_i t_i*U_i - k*(Q mod 2^32) in wraparound
             u32 (U_i = (Q/q_i) mod 2^32), and the high word comes from
             limb 0: c = (r_0 - x)*2^-32 mod q_0, centered — exact for
             |x| < 2^31*q_0 ~ 2^61.
          4. decode = f32 matmuls against the requested rows of the
             inverse canonical embedding (row_s[j] = cos(pi*j*5^s/n)),
             with x split into lo16/hi16/carry planes so f32
             accumulation error stays ~1e-5.

        Parity vs decrypt_host: tests/test_ckks.py (decrypt_slots_device
        tests)."""
        ctx = self.ctx
        m = min(crt_limbs, ct.nl)
        ct = self.drop_to(ct, m)
        keys = self._require_keys("decrypt_slots_device")
        limbs = ctx.limb_idx(m)
        q, mu, sh = ctx.mod_consts(limbs)
        s = keys.sk.eval_full[:m]
        me = _decrypt_core(ct.c0, ct.c1, s, q, mu, sh)
        r = ctx.ntt.inv(me, limbs)
        key = (m, tuple(int(i) for i in slot_idx))
        cache = getattr(self, "_slotdec_cache", None)
        if cache is None:
            cache = self._slotdec_cache = {}
        if key not in cache:
            qs = [int(x) for x in ctx.qs[:m]]
            big_q = 1
            for x in qs:
                big_q *= x
            inv_t = np.asarray([pow(big_q // qi, -1, qi) for qi in qs],
                               np.uint32).reshape(-1, 1)
            u_i = np.asarray([(big_q // qi) % (1 << 32) for qi in qs],
                             np.uint32).reshape(-1, 1)
            uq = np.uint32(big_q % (1 << 32))
            inv32 = np.uint32(pow((1 << 32) % qs[0], -1, qs[0]))
            n = ctx.cfg.n
            kf = self.encoder.k_fwd[np.asarray(key[1])]
            j = np.arange(n, dtype=np.float64)
            # slot_s = sum_j m_j * cos(pi*j*(2*k_fwd[s]+1)/n) / scale
            # (2*k_fwd+1 = 5^s, the canonical-embedding rot group)
            rows = np.cos(
                np.pi * np.outer(2 * kf + 1, j) / n).astype(np.float32)
            cache[key] = (jnp.asarray(inv_t), jnp.asarray(u_i), uq,
                          inv32, jnp.asarray(rows))
        inv_t, u_i, uq, inv32, rows = cache[key]
        out = _slots_from_residues(r, q, mu, sh, inv_t, u_i, uq, inv32,
                                   rows, np.float32(1.0 / ct.scale))
        return np.asarray(out)

    def _crt_lift(self, res: np.ndarray, nl: int, m: int) -> np.ndarray:
        """Centered CRT reconstruction from the first m limbs (exact while
        the true magnitude < prod(first m primes)/2).  Uses the native
        __int128 lifter when built (io/native.py), Python ints otherwise."""
        qs = [int(q) for q in self.ctx.qs[:m]]
        from ..io.native import crt_lift_center
        sub = res[..., :m, :]
        flat = np.moveaxis(sub, -2, 0).reshape(m, -1)
        out = crt_lift_center(flat, qs)
        return out.reshape(sub.shape[:-2] + sub.shape[-1:])

    # ------------------------------------------------------------------
    # arithmetic
    # ------------------------------------------------------------------

    def _align(self, a: Ciphertext, b: Ciphertext):
        nl = min(a.nl, b.nl)
        a = self.drop_to(a, nl)
        b = self.drop_to(b, nl)
        assert abs(a.scale / b.scale - 1.0) < 1e-9, \
            f"scale mismatch {a.scale} vs {b.scale}: adjust first"
        return a, b

    def drop_to(self, ct: Ciphertext, nl: int) -> Ciphertext:
        """Modulus reduction by dropping limbs (free: slicing)."""
        if ct.nl == nl:
            return ct
        assert nl < ct.nl
        return ct.with_data(ct.c0[..., :nl, :], ct.c1[..., :nl, :], nl=nl)

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._align(a, b)
        consts = self.ctx.mod_consts(self.ctx.limb_idx(a.nl))
        c0, c1 = _add_core(a.c0, a.c1, b.c0, b.c1, consts[0])
        return a.with_data(c0, c1)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._align(a, b)
        consts = self.ctx.mod_consts(self.ctx.limb_idx(a.nl))
        c0, c1 = _sub_core(a.c0, a.c1, b.c0, b.c1, consts[0])
        return a.with_data(c0, c1)

    def add_many(self, cts: list[Ciphertext]) -> Ciphertext:
        out = cts[0]
        for ct in cts[1:]:
            out = self.add(out, ct)
        return out

    def neg(self, ct: Ciphertext) -> Ciphertext:
        q = self.ctx.mod_consts(self.ctx.limb_idx(ct.nl))[0]
        c0, c1 = _neg_core(ct.c0, ct.c1, q)
        return ct.with_data(c0, c1)

    def add_plain(self, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        pt = self._pt_to(pt, ct.nl)
        assert abs(ct.scale / pt.scale - 1.0) < 1e-9
        q = self.ctx.mod_consts(self.ctx.limb_idx(ct.nl))[0]
        return ct.with_data(_addmod_j(ct.c0, pt.data, q), ct.c1)

    def sub_plain(self, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        pt = self._pt_to(pt, ct.nl)
        assert abs(ct.scale / pt.scale - 1.0) < 1e-9
        q = self.ctx.mod_consts(self.ctx.limb_idx(ct.nl))[0]
        return ct.with_data(_submod_j(ct.c0, pt.data, q), ct.c1)

    def _pt_to(self, pt: Plaintext, nl: int) -> Plaintext:
        if pt.nl == nl:
            return pt
        assert nl < pt.nl
        sh = None if pt.shoup is None else pt.shoup[..., :nl, :]
        return Plaintext(pt.data[..., :nl, :], sh, nl, pt.scale)

    def mul_plain(self, ct: Ciphertext, pt: Plaintext,
                  rescale: bool = True) -> Ciphertext:
        _COUNTS.count("ctpt_mult", _nct(ct))
        pt = self._pt_to(pt, ct.nl)
        q, mu, sh = self.ctx.mod_consts(self.ctx.limb_idx(ct.nl))
        if pt.shoup is not None:
            c0, c1 = _mul_plain_core(ct.c0, ct.c1, pt.data, pt.shoup, q)
        else:
            c0, c1 = _mul_plain_barrett(ct.c0, ct.c1, pt.data, q, mu, sh)
        out = ct.with_data(c0, c1, scale=ct.scale * pt.scale)
        return self.rescale(out) if rescale else out

    def mul_scalar_int(self, ct: Ciphertext, k: int) -> Ciphertext:
        """Multiply by a small integer (no scale change in message terms:
        scale unchanged, message *= k)."""
        limbs = self.ctx.limb_idx(ct.nl)
        q, mu, sh = self.ctx.mod_consts(limbs)
        kv = np.asarray([k % self.ctx.basis[i] for i in limbs],
                        np.int64).reshape(-1, 1)
        kj = jnp.asarray(kv.astype(np.uint32))
        ks = jnp.asarray(ma.shoup_precompute(
            kv, np.asarray([self.ctx.basis[i] for i in limbs],
                           np.int64).reshape(-1, 1)))
        c0, c1 = _mul_plain_core(ct.c0, ct.c1, kj, ks, q)
        return ct.with_data(c0, c1)

    def mul_scalar(self, ct: Ciphertext, x: float,
                   rescale: bool = True) -> Ciphertext:
        """Multiply by a real scalar via an integer at the working scale."""
        nl = ct.nl
        qd = self.ctx.qs[nl - 1]
        k = int(round(x * qd))
        out = self.mul_scalar_int(ct, k)
        out.scale = ct.scale * qd
        return self.rescale(out) if rescale else out

    def rescale(self, ct: Ciphertext) -> Ciphertext:
        """Drop the top limb; scale /= q_dropped (FLEXIBLEAUTO tracking)."""
        ctx = self.ctx
        nl = ct.nl
        assert nl >= 2, "no scaling limb left to drop"
        _COUNTS.count("rescale", _nct(ct))
        plan = ctx.rescale_tables(nl)

        def f(part):
            c0, c1 = _rescale_core(part.c0, part.c1, plan)
            return part.with_data(c0, c1, nl=nl - 1,
                                  scale=ct.scale / float(ctx.qs[nl - 1]))
        return self._chunked(ct, f)

    def _sliced_key(self, key: KSKey, nl: int):
        """(kb, ka) rows for level nl, LRU-cached per key (2 levels max):
        an unbounded per-level cache held ~40 MB x levels x keys of
        resident slices — with the EvalMod chain touching ~15 levels,
        another silent multi-GB consumer (round-3 HBM audit)."""
        cache = getattr(key, "_slices", None)
        if cache is None:
            cache = {}
            object.__setattr__(key, "_slices", cache)
        if nl not in cache:
            if key.max_nl is None:
                idx = self.ctx.limb_idx(nl, specials=True)
            else:
                # reduced-basis key: rows are [0, max_nl) + specials
                assert nl <= key.max_nl, \
                    f"level {nl} exceeds reduced key basis {key.max_nl}"
                idx = tuple(list(range(nl)) + list(
                    range(key.max_nl, key.max_nl + self.ctx.k_sp)))
            cache[nl] = (LazyRows(key.b, tuple(idx)),
                         LazyRows(key.a, tuple(idx)))
        return cache[nl]

    def mul(self, a: Ciphertext, b: Ciphertext, rescale: bool = True) -> Ciphertext:
        """ct*ct with relinearization (EvalMult + EvalMultKeyGen path)."""
        a, b = self._align_mult(a, b)
        _COUNTS.count("ctct_mult", _nct(a))
        _COUNTS.count("keyswitch", _nct(a))
        nl = a.nl
        ks = self.ctx.ks_tables(nl)
        kb, ka = self._sliced_key(self._require_keys("mul/relin").relin, nl)
        bshape = a.c0.shape[:-2]
        tail = a.c0.shape[-2:]
        chunk = self._heavy_chunk(nl)
        same = a.c0.shape == b.c0.shape
        B = int(np.prod(bshape)) if bshape else 1
        if bshape and (B > chunk or len(bshape) > 1):
            a0 = a.c0.reshape((-1,) + tail)
            a1 = a.c1.reshape((-1,) + tail)
            b0 = b.c0.reshape((-1,) + tail) if same else b.c0
            b1 = b.c1.reshape((-1,) + tail) if same else b.c1
            o0s, o1s = [], []
            for s in range(0, B, chunk):
                pb0 = b0[s: s + chunk] if same else b0
                pb1 = b1[s: s + chunk] if same else b1
                c0, c1 = _mul_relin_core(a0[s: s + chunk], a1[s: s + chunk],
                                         pb0, pb1, kb, ka, ks)
                o0s.append(c0)
                o1s.append(c1)
            c0 = jnp.concatenate(o0s).reshape(bshape + tail)
            c1 = jnp.concatenate(o1s).reshape(bshape + tail)
        else:
            c0, c1 = _mul_relin_core(a.c0, a.c1, b.c0, b.c1, kb, ka, ks)
        out = Ciphertext(c0, c1, nl, a.scale * b.scale)
        return self.rescale(out) if rescale else out

    def square(self, a: Ciphertext, rescale: bool = True) -> Ciphertext:
        return self.mul(a, a, rescale)

    def mul_double_sub(self, a: Ciphertext, b: Ciphertext, c: Ciphertext,
                       wide: bool = False) -> Ciphertext:
        """2*a*b - c fused into ONE dispatch (the Chebyshev T_{a+b} node:
        relinearized product, doubling, rescale(s), and c's scale-matched
        subtraction — previously mul + x2 + match-adjust + sub, 5-6
        launches).  c must sit at least one level above the output."""
        ctx = self.ctx
        a, b = self._align_mult(a, b)
        nl = a.nl
        _COUNTS.count("ctct_mult", _nct(a))
        _COUNTS.count("keyswitch", _nct(a))
        s_prod = a.scale * b.scale
        if wide:
            nl_out = nl - 2
            s_out = s_prod / float(ctx.qs[nl - 1]) / float(ctx.qs[nl - 2])
        else:
            nl_out = nl - 1
            s_out = s_prod / float(ctx.qs[nl - 1])
        _COUNTS.count("rescale", (3 if wide else 2) * _nct(a))
        assert c.nl >= nl_out + 1, (c.nl, nl_out)
        c = self.drop_to(c, nl_out + 1)
        # c's scale-matching constant (the inlined `adjust`): c * v_c then
        # one rescale lands exactly near s_out (same quantization as the
        # unfused match path)
        qd_c = float(ctx.qs[nl_out])
        v_c = int(round(s_out * qd_c / c.scale))
        assert 0 < v_c < 1 << 62
        limbs_c = ctx.limb_idx(nl_out + 1)
        qs_c = np.asarray([ctx.basis[i] for i in limbs_c],
                          np.int64).reshape(-1, 1)
        res_c = (v_c % qs_c)
        vc = jnp.asarray(res_c.astype(np.uint32))
        vc_s = jnp.asarray(ma.shoup_precompute(res_c, qs_c))
        ks = ctx.ks_tables(nl)
        kb, ka = self._sliced_key(self._require_keys("mul/relin").relin, nl)
        plan1 = ctx.rescale_tables(nl)
        plan2 = ctx.rescale_tables(nl - 1) if wide else None
        plan_c = ctx.rescale_tables(nl_out + 1)
        qc = jnp.asarray(qs_c.astype(np.uint32))
        if wide:
            def core(a0, a1, b0, b1, cc0, cc1):
                return _cheb_mulsub2_core(a0, a1, b0, b1, cc0, cc1,
                                          kb, ka, ks, plan1, plan2, plan_c,
                                          vc, vc_s, qc)
        else:
            def core(a0, a1, b0, b1, cc0, cc1):
                return _cheb_mulsub_core(a0, a1, b0, b1, cc0, cc1,
                                         kb, ka, ks, plan1, plan_c, vc,
                                         vc_s, qc)
        c0, c1 = self._batched_fused(
            core, nl, (a.c0, a.c1, b.c0, b.c1, c.c0, c.c1))
        return Ciphertext(c0, c1, nl_out, s_out)

    def _batched_fused(self, core, nl, arrays):
        """Batch-chunked dispatch of a fused Chebyshev core: deep-chain
        token batches (config-5's 33 cts x 70+ limbs) OOM the shared chip
        when squared in one graph (campaign_r4 cfg5 postmortem).

        Deliberately NOT the FHE_HEAVY_CHUNK key-switch perf cap: the
        chunk-and-concat materializes an extra output copy, and applying
        the cap=4 to S=700's batch-6 ffn squares RAISED the high-water at
        the exact ladder peak round 4 survived unchunked (campaign_r5
        s700 postmortem).  Chunks only on the byte-derived HBM guard
        (override: FHE_FUSED_CHUNK)."""
        import os
        bshape = arrays[0].shape[:-2]
        per_ct = nl * self.ctx.cfg.n * 4 * 16
        chunk = int(os.environ.get("FHE_FUSED_CHUNK", "0")) or \
            max(1, (1 << 31) // per_ct)
        B = int(np.prod(bshape)) if bshape else 1
        if not bshape or (B <= chunk and len(bshape) <= 1):
            return core(*arrays)
        flat = [x.reshape((-1,) + x.shape[len(bshape):]) for x in arrays]
        outs = None
        for s in range(0, B, chunk):
            res = core(*(x[s: s + chunk] for x in flat))
            if outs is None:
                outs = [[] for _ in res]
            for o, r in zip(outs, res):
                o.append(r)
        return tuple(jnp.concatenate(o).reshape(bshape + o[0].shape[1:])
                     for o in outs)

    def square_double_minus_one(self, a: Ciphertext,
                                wide: bool = False) -> Ciphertext:
        """2*a^2 - 1 with relinearization, rescale(s) and the affine tail
        fused into ONE dispatch — the Chebyshev T_{2m} doubling node,
        previously mul + x2 + const-add (+ extra rescale in wide mode) =
        4-5 separate launches each costing the tunnel's per-dispatch
        latency.  Appears ~13x per deg-119 chain: every gadget (exp /
        inverse / GELU / tanh) and the bootstrap EvalMod ride it."""
        ctx = self.ctx
        nl = a.nl
        _COUNTS.count("ctct_mult", _nct(a))
        _COUNTS.count("keyswitch", _nct(a))
        _COUNTS.count("rescale", (2 if wide else 1) * _nct(a))
        ks = ctx.ks_tables(nl)
        kb, ka = self._sliced_key(self._require_keys("mul/relin").relin, nl)
        plan1 = ctx.rescale_tables(nl)
        s_prod = a.scale * a.scale
        if wide:
            assert nl >= 3
            plan2 = ctx.rescale_tables(nl - 1)
            s_out = s_prod / float(ctx.qs[nl - 1]) / float(ctx.qs[nl - 2])
            nl_out = nl - 2
        else:
            assert nl >= 2
            s_out = s_prod / float(ctx.qs[nl - 1])
            nl_out = nl - 1
        limbs = ctx.limb_idx(nl_out)
        qs = np.asarray([ctx.basis[i] for i in limbs], np.int64)
        v = int(round(s_out))
        assert 0 < v < 1 << 62
        m1 = jnp.asarray((((-v) % qs).reshape(-1, 1)).astype(np.uint32))
        if wide:
            def core(a0, a1):
                return _cheb_sq2_core(a0, a1, kb, ka, ks, plan1, plan2, m1)
        else:
            def core(a0, a1):
                return _cheb_sq_core(a0, a1, kb, ka, ks, plan1, m1)
        c0, c1 = self._batched_fused(core, nl, (a.c0, a.c1))
        out = Ciphertext(c0, c1, nl_out, s_out)
        out.scale = s_out
        return out

    def _align_mult(self, a: Ciphertext, b: Ciphertext):
        nl = min(a.nl, b.nl)
        return self.drop_to(a, nl), self.drop_to(b, nl)

    # ------------------------------------------------------------------
    # rotations / conjugation
    # ------------------------------------------------------------------

    def rotate(self, ct: Ciphertext, r: int) -> Ciphertext:
        """Cyclic slot rotation: out slot j = in slot (j + r) mod slots.
        Matches EvalRotate sign (FHEController::rotate, cpp:434-436)."""
        if r % self.ctx.cfg.slots == 0:
            return ct
        rkeys = self._require_keys("rotate")
        key = rkeys.rot.get(r % self.ctx.cfg.slots) or \
            rkeys.rot.get(r % self.ctx.cfg.slots - self.ctx.cfg.slots)
        assert key is not None, f"no rotation key for shift {r}"
        t = self.ctx.galois_t(r)
        return self._galois(ct, t, key)

    def conjugate(self, ct: Ciphertext) -> Ciphertext:
        ck = self._require_keys("conjugate").conj
        assert ck is not None
        return self._galois(ct, self.ctx.conj_t(), ck)

    def _tree_key_stack(self, shifts, nl: int):
        """Stacked (kb, ka) rotation keys for a rotate-accumulate tree,
        small-LRU cached (a layer uses a handful of distinct trees:
        rotsum/repeat at strides 1 and d; re-stacking per call would
        queue multi-hundred-MB transients — the round-3 OOM lesson)."""
        cache = getattr(self, "_tree_stacks", None)
        if cache is None:
            cache = self._tree_stacks = {}
        key = (tuple(shifts), nl)
        if key not in cache:
            slots = self.ctx.cfg.slots
            hk = self._require_keys("rotate_tree")
            kbs, kas, gps = [], [], []
            for r in shifts:
                rr = r % slots
                k = hk.rot.get(rr) or hk.rot.get(rr - slots)
                assert k is not None, f"no rotation key for shift {r}"
                kb, ka = self._sliced_key(k, nl)
                kbs.append(_mat_rows(kb))
                kas.append(_mat_rows(ka))
                gps.append(self.ctx.galois_perm_factored(
                    self.ctx.galois_t(rr)))
            val = (jnp.stack(kbs), jnp.stack(kas),
                   jnp.stack([g.gamma for g in gps]),
                   jnp.stack([g.bits for g in gps]),
                   jnp.stack([g.rowmap for g in gps]))
            if len(cache) >= 3:          # small LRU: drop the oldest
                cache.pop(next(iter(cache)))
            cache[key] = val
        else:                            # refresh LRU order
            cache[key] = cache.pop(key)
        return cache[key]

    def multi_rotate_stack(self, ct: Ciphertext, shifts) -> Ciphertext:
        """[rotate(ct, r) for r in shifts] stacked on a NEW leading axis:
        ONE hoisted decomposition shared by every rotation and ONE scanned
        dispatch (the deinterleave trees re-decomposed their whole
        accumulated batch at every doubling step).  Needs a dedicated key
        per shift."""
        ctx = self.ctx
        _COUNTS.count("keyswitch", len(shifts) * _nct(ct))
        _COUNTS.count("rotation_hoisted", len(shifts) * _nct(ct))
        kbs, kas, gammas, bitss, rowmaps = self._tree_key_stack(
            [s % ctx.cfg.slots for s in shifts], ct.nl)
        ks = ctx.ks_tables(ct.nl)
        o0, o1 = _multi_galois_stack_core(ct.c0, ct.c1, gammas, bitss,
                                          rowmaps, kbs, kas, ks)
        return ct.with_data(o0, o1)

    def rotate_accumulate_tree(self, ct: Ciphertext, shifts) -> Ciphertext:
        """ct := ct + rotate(ct, s) sequentially over `shifts`, as ONE
        scanned dispatch (the rotsum/repeat log-trees: previously
        log2(count) separate rotate + add dispatches, each costing the
        tunneled chip's 20-35 ms launch latency x the batch chunking).
        Needs a dedicated key per shift; falls back unfused otherwise."""
        ctx = self.ctx
        nl = ct.nl
        live = [s for s in shifts if s % ctx.cfg.slots != 0]
        if not live:
            return ct
        _COUNTS.count("keyswitch", len(live) * _nct(ct))
        _COUNTS.count("rotation", len(live) * _nct(ct))
        kbs, kas, gammas, bitss, rowmaps = self._tree_key_stack(live, nl)
        ks = ctx.ks_tables(nl)

        def f(part):
            c0, c1 = _galois_tree_core(part.c0, part.c1, gammas, bitss,
                                       rowmaps, kbs, kas, ks)
            return part.with_data(c0, c1)
        return self._chunked(ct, f)

    def rotate_hoisted(self, ct: Ciphertext, rots) -> dict:
        """{r: rotate(ct, r)} with the key-switch decomposition computed
        ONCE (hoisting): ~40% of each additional rotation's NTT work is
        shared.  Requires a rotation key per shift, like rotate()."""
        ctx = self.ctx
        nl = ct.nl
        ks = ctx.ks_tables(nl)
        y_e = _hoist_decompose_core(ct.c1, ks)
        out = {}
        for r in rots:
            rr = r % ctx.cfg.slots
            if rr == 0:
                out[r] = ct
                continue
            hk = self._require_keys("rotate_hoisted")
            key = hk.rot.get(rr) or hk.rot.get(rr - ctx.cfg.slots)
            assert key is not None, f"no rotation key for shift {r}"
            _COUNTS.count("rotation_hoisted", _nct(ct))
            _COUNTS.count("keyswitch", _nct(ct))
            kb, ka = self._sliced_key(key, nl)
            gp = ctx.galois_perm_factored(ctx.galois_t(r))
            c0, c1 = _hoist_rotate_core(ct.c0, y_e, gp, kb, ka, ks)
            out[r] = ct.with_data(c0, c1)
        return out

    def has_rotation_keys(self, shifts) -> bool:
        """True when every shift has a DEDICATED rotation key (fused
        multi-rotate eligibility; composed shifts fall back)."""
        if self.keys is None:
            return False
        slots = self.ctx.cfg.slots
        for r in shifts:
            rr = r % slots
            if rr and rr not in self.keys.rot and \
                    (rr - slots) not in self.keys.rot:
                return False
        return True

    def rotate_any(self, ct: Ciphertext, r: int) -> Ciphertext:
        """Rotate by r, composing from available keys when no dedicated
        key exists (signed-binary over the +/- power-of-two set).  Lets
        BSGS giant steps use arbitrary shifts without growing the multi-GB
        rotation-key store — an extra key switch per composed step instead
        of ~47 MB of HBM per dedicated key."""
        slots = self.ctx.cfg.slots
        rr = r % slots
        if rr == 0:
            return ct
        keys = self._require_keys("rotate")
        if rr in keys.rot or (rr - slots) in keys.rot:
            return self.rotate(ct, rr)
        for step in self._compose_shifts(rr):
            ct = self.rotate(ct, step)
        return ct

    def _compose_shifts(self, rr: int) -> list[int]:
        """Decompose a shift into available key shifts: the shorter of the
        binary expansions of rr and rr - slots."""
        slots = self.ctx.cfg.slots
        keys = self.keys.rot
        best = None
        for v in (rr, rr - slots):
            steps, x, b = [], abs(v), 0
            sgn = 1 if v > 0 else -1
            while x:
                if x & 1:
                    steps.append(sgn * (1 << b))
                x >>= 1
                b += 1
            ok = all((st % slots) in keys or (st % slots - slots) in keys
                     for st in steps)
            if ok and (best is None or len(steps) < len(best)):
                best = steps
        assert best is not None, f"cannot compose rotation {rr}"
        return best

    def rotate_combo(self, ct: Ciphertext, items) -> Ciphertext:
        """sum_j pt_j * rotate(ct, r_j) as ONE fused op: the key-switch
        decomposition is computed once (hoisting) and the P mod-down runs
        once on the ACCUMULATED inner products (lazy mod-down / double
        hoisting) — each additional rotation costs only a permutation and
        an inner product, no NTTs.  This is the engine under every BSGS
        matmul and bootstrap transform stage.

        items: [(shift, Plaintext)] where each Plaintext was encoded with
        specials=True at a COMMON scale.  Returns the un-rescaled sum at
        scale ct.scale * pt.scale.

        With enable_sharded_ks(mesh) active and a tiling level, the whole
        combo runs limb-sharded under shard_map (parallel/ksprod.py
        make_sharded_combo — bit-exact vs this path)."""
        if getattr(self, "_shard_mesh", None) is not None:
            out = self._combo_sharded(ct, items)
            if out is not None:
                return out
        ks = self.ctx.ks_tables(ct.nl)
        y_e = _hoist_decompose_core(ct.c1, ks)
        return self.combo_from_decomp(ct, y_e, items, ks)

    def _combo_sharded(self, ct: Ciphertext, items):
        """SPMD rotate_combo over the limb mesh, or None when this shape /
        item set can't ride it (batched ct, reduced-basis keys, identity
        terms, non-coeff plaintexts, non-tiling level)."""
        mesh = getattr(self, "_shard_mesh", None)
        ctx = self.ctx
        nl = ct.nl
        nshard = mesh.shape["limb"]
        slots = ctx.cfg.slots
        if ct.c0.ndim != 2 or (nl + ctx.k_sp) % nshard != 0:
            return None
        if not all(isinstance(p, CoeffPlaintext) and r % slots != 0
                   for r, p in items):
            return None
        keys = self.keys
        if keys is None:
            return None
        shifts = []
        for r, _ in items:
            rr = r % slots
            key = keys.rot.get(rr) or keys.rot.get(rr - slots)
            if key is None or key.max_nl is not None:
                return None
            shifts.append(rr)
        from ..parallel.ksprod import build_sharded_ks, make_sharded_combo
        from jax.sharding import NamedSharding, PartitionSpec as P
        import jax
        if not hasattr(self, "_shard_combo_fns"):
            self._shard_combo_fns = {}
        if nl not in self._shard_plans:
            self._shard_plans[nl] = build_sharded_ks(ctx, nl, nshard)
        plan = self._shard_plans[nl]
        fkey = ("combo", nl, tuple(shifts))
        if fkey not in self._shard_combo_fns:
            gps = [ctx.galois_perm_factored(ctx.galois_t(r))
                   for r in shifts]
            self._shard_combo_fns[fkey] = make_sharded_combo(
                mesh, plan, gps, n1=min(128, ctx.cfg.n))
        scale = items[0][1].scale
        for _, p in items:
            assert abs(p.scale / scale - 1.0) < 1e-12
        _COUNTS.count("combo_rot", len(items) * _nct(ct))
        _COUNTS.count("keyswitch", _nct(ct))
        idx = np.asarray(ctx.limb_idx(nl, specials=True))
        pad = jnp.zeros((ctx.k_sp, ctx.cfg.n), jnp.uint32)
        sh = NamedSharding(mesh, P("limb", None))
        ksh = NamedSharding(mesh, P(None, None, "limb", None))
        kbs = jnp.stack([(keys.rot.get(r) or
                          keys.rot.get(r - slots)).b[:, idx, :]
                         for r in shifts])
        kas = jnp.stack([(keys.rot.get(r) or
                          keys.rot.get(r - slots)).a[:, idx, :]
                         for r in shifts])
        o0, o1 = self._shard_combo_fns[fkey](
            jax.device_put(jnp.concatenate([ct.c0, pad]), sh),
            jax.device_put(jnp.concatenate([ct.c1, pad]), sh),
            jax.device_put(kbs, ksh), jax.device_put(kas, ksh),
            jnp.stack([p.lo for _, p in items]),
            jnp.stack([p.hi for _, p in items]))
        return Ciphertext(o0[:nl], o1[:nl], nl, ct.scale * scale)

    def baby_key_stack(self, shifts, nl: int):
        """Stacked (kb, ka) baby-rotation keys for `shifts` at level nl,
        cached with size-1 eviction: one BSGS transform's ~8 giant groups
        reuse one stack, and the next transform evicts it — re-stacking
        per giant-group call queued multi-hundred-MB transients faster
        than the device freed them (round-3 OOM lesson)."""
        key = (tuple(shifts), nl)
        cache = getattr(self, "_baby_stack", None)
        if cache is not None and cache[0] == key:
            return cache[1]
        slots = self.ctx.cfg.slots
        hk = self._require_keys("rotate_combo")
        kbs, kas = [], []
        for r in shifts:
            rr = r % slots
            k = hk.rot.get(rr) or hk.rot.get(rr - slots)
            assert k is not None, f"no rotation key for shift {r}"
            kb, ka = self._sliced_key(k, nl)
            kbs.append(_mat_rows(kb))
            kas.append(_mat_rows(ka))
        val = (jnp.stack(kbs), jnp.stack(kas))
        self._baby_stack = (key, val)
        return val

    def combo_stage1(self, ct: Ciphertext, y_e, shifts, ks):
        """Per-BABY hoisted work shared by every giant group of a BSGS
        transform: for each baby shift, the Galois permutation of (c0,
        y_e) and the extended-basis key inner products — O(babies), not
        O(babies x giants) (the per-pair version recomputed these 270x
        per bootstrap: the round-3 10x slowdown).  Returns stacked
        (c0p, t0, t1) with a row per shift."""
        ctx = self.ctx
        slots = ctx.cfg.slots
        nl = ct.nl
        kstack = self.baby_key_stack(shifts, nl)
        gps = [ctx.galois_perm_factored(ctx.galois_t(r % slots))
               for r in shifts]
        return _combo_stage1_core(
            ct.c0, y_e,
            jnp.stack([g.gamma for g in gps]),
            jnp.stack([g.bits for g in gps]),
            jnp.stack([g.rowmap for g in gps]),
            kstack[0], kstack[1], ks)

    def combo_stage2(self, ct: Ciphertext, stage1, items, shifts,
                     ks) -> Ciphertext:
        """One giant group's accumulation over stage-1 rows: pt-weighted
        sums + a single lazy mod-down.  items: (shift, CoeffPlaintext)."""
        nl = ct.nl
        slots = self.ctx.cfg.slots
        pos = {r: i for i, r in enumerate(shifts)}
        rot_items = [(r, p) for r, p in items if r % slots != 0]
        id_items = [(r, p) for r, p in items if r % slots == 0]
        scale = items[0][1].scale
        out = None
        if rot_items:
            _COUNTS.count("combo_rot", len(rot_items) * _nct(ct))
            _COUNTS.count("keyswitch", _nct(ct))
            idxs = [pos[r] for r, _ in rot_items]
            for r, p in rot_items:
                assert abs(p.scale / scale - 1.0) < 1e-12
            c0, c1 = _combo_stage2_core(
                stage1[0], stage1[1], stage1[2],
                jnp.asarray(idxs, jnp.int32),
                jnp.stack([p.lo for _, p in rot_items]),
                jnp.stack([p.hi for _, p in rot_items]), ks)
            out = Ciphertext(c0, c1, nl, ct.scale * scale)
        for r, p in id_items:
            data = _pt_expand_q(p.lo, p.hi, ks)
            t = self.mul_plain(ct, Plaintext(data, None, nl, p.scale),
                               rescale=False)
            out = t if out is None else self.add(out, t)
        return out

    def combo_stage2_all(self, ct: Ciphertext, stage1, groups, shifts,
                         ks):
        """EVERY giant group's accumulation in one kernel: scan over all
        (group, baby, pt) pairs carrying per-group accumulators, one
        batched mod-down — then the caller multi-rotates the (G, ...)
        output.  groups: list of (giant_shift, [(baby_shift, CoeffPt)]).
        Identity-baby terms (shift 0) fold in via a virtual stage-1 row.
        Returns (giant_shifts, Ciphertext with leading G axis)."""
        nl = ct.nl
        slots = self.ctx.cfg.slots
        pos = {r: i for i, r in enumerate(shifts)}
        c0ps, t0s, t1s = stage1
        G = len(groups)
        gidx, bidx, los, his = [], [], [], []
        scale = None
        n_rot = 0
        id_extra = []          # (g, CoeffPt) identity terms
        for g, (gshift, items) in enumerate(groups):
            for r, p in items:
                if scale is None:
                    scale = p.scale
                assert abs(p.scale / scale - 1.0) < 1e-12
                if r % slots == 0:
                    id_extra.append((g, p))
                    continue
                gidx.append(g)
                bidx.append(pos[r])
                los.append(p.lo)
                his.append(p.hi)
                n_rot += 1
        _COUNTS.count("combo_rot", n_rot * _nct(ct))
        _COUNTS.count("keyswitch", G * _nct(ct))   # G mod-downs
        c0g, c1g = _combo_stage2_all_core(
            c0ps, t0s, t1s,
            jnp.asarray(gidx, jnp.int32), jnp.asarray(bidx, jnp.int32),
            jnp.stack(los), jnp.stack(his), G, ks)
        out = Ciphertext(c0g, c1g, nl, ct.scale * scale)
        for g, p in id_extra:
            data = _pt_expand_q(p.lo, p.hi, ks)
            t = self.mul_plain(ct, Plaintext(data, None, nl, p.scale),
                               rescale=False)
            z0 = out.c0.at[g].set(ma.addmod(out.c0[g], t.c0,
                                            ks.q_act))
            z1 = out.c1.at[g].set(ma.addmod(out.c1[g], t.c1,
                                            ks.q_act))
            out = out.with_data(z0, z1)
        return [gs for gs, _ in groups], out

    def multi_rotate_sum(self, cts: Ciphertext, shifts) -> Ciphertext:
        """sum_g rotate(cts[g], shifts[g]) as ONE scanned kernel — the
        giant rotations of a whole BSGS transform in a single dispatch
        (they were ~25-40 separate 1-ct key switches per matmul).
        Shift 0 entries skip the switch (added directly)."""
        ctx = self.ctx
        nl = cts.nl
        slots = ctx.cfg.slots
        ks = ctx.ks_tables(nl)
        rot_idx = [i for i, r in enumerate(shifts) if r % slots != 0]
        id_idx = [i for i, r in enumerate(shifts) if r % slots == 0]
        out = None
        if rot_idx:
            _COUNTS.count("keyswitch", len(rot_idx) * _nct(
                cts.with_data(cts.c0[0], cts.c1[0])))
            gps, kbs, kas = [], [], []
            hk = self._require_keys("multi_rotate")
            for i in rot_idx:
                rr = shifts[i] % slots
                key = hk.rot.get(rr) or hk.rot.get(rr - slots)
                assert key is not None, f"no rotation key for {shifts[i]}"
                kb, ka = self._sliced_key(key, nl)
                gps.append(ctx.galois_perm_factored(ctx.galois_t(rr)))
                kbs.append(_mat_rows(kb))
                kas.append(_mat_rows(ka))
            c0, c1 = _multi_galois_sum_core(
                cts.c0[jnp.asarray(rot_idx)], cts.c1[jnp.asarray(rot_idx)],
                jnp.stack([g.gamma for g in gps]),
                jnp.stack([g.bits for g in gps]),
                jnp.stack([g.rowmap for g in gps]),
                jnp.stack(kbs), jnp.stack(kas), ks)
            out = cts.with_data(c0, c1)
        for i in id_idx:
            t = cts.with_data(cts.c0[i], cts.c1[i])
            out = t if out is None else self.add(out, t)
        return out

    def combo_from_decomp(self, ct: Ciphertext, y_e, items,
                          ks) -> Ciphertext:
        """rotate_combo with a caller-held decomposition (shared across
        the giant groups of one BSGS transform)."""
        ctx = self.ctx
        nl = ct.nl
        slots = ctx.cfg.slots
        rot_items = [(r, p) for r, p in items if r % slots != 0]
        id_items = [(r, p) for r, p in items if r % slots == 0]
        scale = items[0][1].scale
        coeff_mode = isinstance(items[0][1], CoeffPlaintext)
        out = None
        if rot_items:
            _COUNTS.count("combo_rot", len(rot_items) * _nct(ct))
            _COUNTS.count("keyswitch", _nct(ct))    # the one mod-down
            gps, kbs, kas, pts = [], [], [], []
            for r, p in rot_items:
                rr = r % slots
                hk = self._require_keys("rotate_combo")
                key = hk.rot.get(rr) or hk.rot.get(rr - slots)
                assert key is not None, f"no rotation key for shift {r}"
                kb, ka = self._sliced_key(key, nl)
                gps.append(ctx.galois_perm_factored(ctx.galois_t(rr)))
                kbs.append(_mat_rows(kb))
                kas.append(_mat_rows(ka))
                assert abs(p.scale / scale - 1.0) < 1e-12
                pts.append(p)
            gammas = jnp.stack([g.gamma for g in gps])
            bitss = jnp.stack([g.bits for g in gps])
            rowmaps = jnp.stack([g.rowmap for g in gps])
            if coeff_mode:
                c0, c1 = _hoisted_combo_coeff_core(
                    ct.c0, y_e, gammas, bitss, rowmaps,
                    jnp.stack(kbs), jnp.stack(kas),
                    jnp.stack([p.lo for p in pts]),
                    jnp.stack([p.hi for p in pts]), ks)
            else:
                c0, c1 = _hoisted_combo_core(
                    ct.c0, y_e, gammas, bitss, rowmaps,
                    jnp.stack(kbs), jnp.stack(kas),
                    jnp.stack([p.data for p in pts]), ks)
            out = Ciphertext(c0, c1, nl, ct.scale * scale)
        for r, p in id_items:
            if coeff_mode:
                data = _pt_expand_q(p.lo, p.hi, ks)
                pq = Plaintext(data, None, nl, p.scale)
            else:
                pq = _pt_q_slice(p, nl)
            t = self.mul_plain(ct, pq, rescale=False)
            out = t if out is None else self.add(out, t)
        return out

    def enable_sharded_ks(self, mesh) -> None:
        """Route Galois key switches through the limb-sharded SPMD
        pipeline (parallel/ksprod.py: psum-based digit reduction over the
        mesh's `limb` axis) whenever the extended basis divides the limb
        axis.  The single-chip path remains the fallback for levels whose
        basis doesn't tile the mesh.  BASELINE north-star: key-switch
        partial sums as psum collectives."""
        self._shard_mesh = mesh
        self._shard_plans: dict = {}
        self._shard_fns: dict = {}

    def _galois_sharded(self, ct: Ciphertext, t: int, key: KSKey):
        """SPMD execution of one unbatched Galois key switch, or None
        when this (nl, batch) shape can't ride the mesh."""
        mesh = getattr(self, "_shard_mesh", None)
        if mesh is None or ct.c0.ndim != 2 or key.max_nl is not None:
            return None
        from ..parallel.ksprod import build_sharded_ks, make_sharded_galois
        from jax.sharding import NamedSharding, PartitionSpec as P
        ctx = self.ctx
        nl = ct.nl
        nshard = mesh.shape["limb"]
        if (nl + ctx.k_sp) % nshard != 0:
            return None
        if nl not in self._shard_plans:
            self._shard_plans[nl] = build_sharded_ks(ctx, nl, nshard)
        plan = self._shard_plans[nl]
        fkey = (t, nl)
        if fkey not in self._shard_fns:
            gp = ctx.galois_perm_factored(t)
            self._shard_fns[fkey] = make_sharded_galois(mesh, plan, gp)
        import jax
        pad = jnp.zeros((ctx.k_sp, ctx.cfg.n), jnp.uint32)
        sh = NamedSharding(mesh, P("limb", None))
        ksh = NamedSharding(mesh, P(None, "limb", None))
        idx = np.asarray(ctx.limb_idx(nl, specials=True))
        c0e = jax.device_put(jnp.concatenate([ct.c0, pad]), sh)
        c1e = jax.device_put(jnp.concatenate([ct.c1, pad]), sh)
        kb = jax.device_put(key.b[:, idx, :], ksh)
        ka = jax.device_put(key.a[:, idx, :], ksh)
        o0, o1 = self._shard_fns[fkey](c0e, c1e, kb, ka)
        return ct.with_data(o0[:nl], o1[:nl])

    def _galois(self, ct: Ciphertext, t: int, key: KSKey) -> Ciphertext:
        ctx = self.ctx
        nl = ct.nl
        _COUNTS.count("rotation", _nct(ct))
        _COUNTS.count("keyswitch", _nct(ct))
        if getattr(self, "_shard_mesh", None) is not None:
            out = self._galois_sharded(ct, t, key)
            if out is not None:
                return out
        gp = ctx.galois_perm_factored(t)
        ks = ctx.ks_tables(nl)
        kb, ka = self._sliced_key(key, nl)

        def f(part):
            c0, c1 = _galois_core(part.c0, part.c1, gp, kb, ka, ks)
            return part.with_data(c0, c1)
        return self._chunked(ct, f)

    # ------------------------------------------------------------------
    # debug probes (reference: FHEController print/print_min_max,
    # cpp:700-826 — decrypting diagnostics, server holds sk)
    # ------------------------------------------------------------------

    def probe(self, ct: Ciphertext, count: int = 8) -> np.ndarray:
        return np.real(self.decrypt(ct))[..., :count]

    def probe_expanded(self, ct: Ciphertext, stride: int,
                       count: int = 8) -> np.ndarray:
        """Slot j*stride for j < count — reads 'expanded' layout values
        (print_expanded parity, FHEController.cpp:738-780).  Host decrypt:
        zero fresh device compiles."""
        return np.real(self.decrypt_host(ct))[..., : count * stride: stride]

    def probe_padded(self, ct: Ciphertext, padding: int,
                     count: int = 8) -> np.ndarray:
        """Every `padding`-th slot (print_padded parity, cpp:782-818)."""
        return np.real(self.decrypt_host(ct))[..., : count * padding: padding]

    def probe_min_max(self, ct: Ciphertext) -> tuple[float, float]:
        """(min, max) over real slots — the reference's range probe that
        feeds Chebyshev interval choices (print_min_max, cpp:820-826)."""
        vals = np.real(self.decrypt_host(ct))
        return float(vals.min()), float(vals.max())


# ----------------------------------------------------------------------
# jitted device composites — all tables arrive as pytree args, so the
# compiled executables contain no embedded table constants.
# ----------------------------------------------------------------------

from ..ops.ntt import _fwd as _ntt_fwd, _inv as _ntt_inv  # noqa: E402


def _djit(fn):
    """jax.jit + a GLOBAL_TIMERS 'dispatch' count per top-level call.

    On the tunneled dev chip every dispatch costs 20-35 ms of launch
    latency regardless of size; this counter makes per-stage dispatch
    mass a MEASURED number (bench_layer records the per-stage delta) so
    fusion work (scan trees, whole-stage jits) has a before/after metric.
    Calls from inside another trace only happen while tracing (once per
    shape), so the count is the executed-dispatch count to within the
    compile count."""
    jf = jax.jit(fn)

    @functools.wraps(fn)
    def wrapped(*a, **k):
        _COUNTS.count("dispatch", 1)
        return jf(*a, **k)
    wrapped._jit = jf
    return wrapped


@_djit
def _rns_spread_i32(c, q, mu, sh):
    """(..., n) int32 centered coeffs -> (..., L, n) u32 residues, on
    device.  q: (L, 1) u32 (mu/sh unused, kept for mod_consts signature)."""
    qi = q.astype(jnp.int32)
    r = c[..., None, :] % qi                 # sign-correct: jnp.remainder
    return r.astype(jnp.uint32)


@_djit
def _encrypt_core(p0, p1, v, e0, e1, m, q, mu, sh):
    c0 = ma.addmod(ma.addmod(ma.barrett_mulmod(p0, v, q, mu, sh), e0, q), m, q)
    c1 = ma.addmod(ma.barrett_mulmod(p1, v, q, mu, sh), e1, q)
    return c0, c1


@_djit
def _decrypt_core(c0, c1, s, q, mu, sh):
    return ma.addmod(c0, ma.barrett_mulmod(c1, s, q, mu, sh), q)


@_djit
def _slots_from_residues(r, q, mu, sh, inv_t, u_i, uq, inv32, rows,
                         scale_inv):
    """Centered-CRT + targeted canonical-embedding decode on device
    (see Evaluator.decrypt_slots_device for the derivation).  r is the
    coefficient-residue tensor (..., m, N); output (..., k) f32."""
    t = ma.barrett_mulmod(r, inv_t, q, mu, sh)
    frac = jnp.sum(t.astype(jnp.float32) / q.astype(jnp.float32), axis=-2)
    k = jnp.round(frac).astype(jnp.uint32)
    y = jnp.sum(ma.mullo32(t, u_i), axis=-2, dtype=jnp.uint32)
    y = y - ma.mullo32(k, uq)                     # wraps: x mod 2^32
    q0, mu0, sh0 = q[0], mu[0], sh[0]
    d = ma.submod(r[..., 0, :], y % q0, q0)
    c = ma.barrett_mulmod(d, inv32, q0, mu0, sh0)
    # center the carry in INTEGER arithmetic: c is up to ~2^30 where f32
    # ulp is 64, so a float centering maps q0-1 -> 0 instead of -1 (a
    # 2^32-scale coefficient error); post-centering carries are tiny and
    # exact in f32
    ci = c.astype(jnp.int32)
    q0i = q0.astype(jnp.int32)
    cf = jnp.where(ci > q0i // 2, ci - q0i, ci).astype(jnp.float32)
    lo = (y & jnp.uint32(0xFFFF)).astype(jnp.float32)
    hi = (y >> jnp.uint32(16)).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST                # bf16 passes would
    dot = lambda p: jnp.einsum("kn,...n->...k", rows, p, precision=hp)
    v = dot(lo) + 65536.0 * dot(hi) + 4294967296.0 * dot(cf)
    return v * scale_inv


@_djit
def _add_core(a0, a1, b0, b1, q):
    return ma.addmod(a0, b0, q), ma.addmod(a1, b1, q)


@_djit
def _mul_plain_core(c0, c1, w, ws, q):
    return (ma.shoup_mulmod(c0, w, ws, q), ma.shoup_mulmod(c1, w, ws, q))


@_djit
def _mul_plain_barrett(c0, c1, w, q, mu, sh):
    return (ma.barrett_mulmod(c0, w, q, mu, sh),
            ma.barrett_mulmod(c1, w, q, mu, sh))


@_djit
def _neg_core(c0, c1, q):
    return ma.negmod(c0, q), ma.negmod(c1, q)


_addmod_j = _djit(ma.addmod)
_submod_j = _djit(ma.submod)


@_djit
def _sub_core(a0, a1, b0, b1, q):
    return ma.submod(a0, b0, q), ma.submod(a1, b1, q)


def _rescale_body(c0, c1, plan):
    outs = []
    nl = c0.shape[-2]
    for c in (c0, c1):
        body = c[..., : nl - 1, :]
        last = c[..., nl - 1:, :]
        v = _ntt_inv(last, plan.t_last)             # coeffs of dropped limb
        # general centering: (v centered at +/- qd/2) mod q_i, computed as
        # v mod q_i (Shoup w=1) minus qd mod q_i on the negative branch —
        # exact for ANY prime spread (the old `qrem - (qd - v)` shortcut
        # needed qd < 2*q_i, which ring 2^16's 44-prime chain cannot
        # satisfy; r128c campaign postmortem)
        vm = ma.shoup_mulmod(v, plan.ones, plan.ones_s, plan.qrem)
        lift = jnp.where(v <= plan.half, vm,
                         ma.submod(vm, plan.qdm, plan.qrem))
        lift_e = _ntt_fwd(lift, plan.t_rem)
        diff = ma.submod(body, lift_e, plan.qrem)
        outs.append(ma.shoup_mulmod(diff, plan.inv, plan.inv_s, plan.qrem))
    return tuple(outs)


@_djit
def _rescale_core(c0, c1, plan):
    return _rescale_body(c0, c1, plan)


def _ks_decompose(cx_coeff, ks, cx_eval=None):
    """Digit-decompose + base-convert + NTT: the input-dependent, key-
    independent 60% of a key switch.  Returns eval-domain digit stack
    (ndig_active, ..., tgt, N) — reusable across many rotations of the
    same ciphertext (hoisting: the Galois automorphism commutes with RNS
    decomposition and with the NTT as an eval-index permutation).

    When the caller supplies the eval-domain input too (cx_eval; it always
    has it — cx_coeff is its own iNTT), digit j's rows at its OWN group
    limbs skip the coeff->eval NTT: fast base conversion is exact at the
    source primes, so those rows are just F_j^{-1} * cx_eval (LevelKS.own),
    cutting nl of the nd*(nl+k) digit NTTs."""
    from ..ops import basecvt
    if basecvt.use_pallas() and ks.bc.convp is not None:
        G = ks.bc.fold.shape[0]
        nl = cx_coeff.shape[-2]
        pad = G - nl
        xp = cx_coeff if not pad else jnp.concatenate(
            [cx_coeff, jnp.zeros(cx_coeff.shape[:-2] + (pad,) +
                                 cx_coeff.shape[-1:], jnp.uint32)], axis=-2)
        y_all = basecvt.base_convert(xp, ks.bc)
    else:
        ys = []
        for dg in ks.digits:
            g = dg.group
            lo = g[0]
            w = ma.shoup_mulmod(cx_coeff[..., lo: lo + len(g), :],
                                dg.fold, dg.fold_s, dg.gq)
            # fast base conversion: y[p] = sum_t w[t] * (Qhat/q_t mod p)
            y = None
            for ti in range(len(g)):
                term = ma.shoup_mulmod(w[..., ti: ti + 1, :],
                                       dg.conv[ti], dg.conv_s[ti], ks.q_tgt)
                y = term if y is None else ma.addmod(y, term, ks.q_tgt)
            ys.append(y)
        y_all = jnp.stack(ys)                  # (ndig_active, ..., tgt, N)
    if cx_eval is None or not _OWNSKIP:
        return _ntt_fwd(y_all, ks.t_tgt)
    own_e = ma.shoup_mulmod(cx_eval, ks.own, ks.own_s, ks.q_act)
    outs = []
    for j, dg in enumerate(ks.digits):
        lo, hi = dg.group[0], dg.group[-1] + 1
        rows = y_all[j]
        keep = [rows[..., :lo, :], rows[..., hi:, :]] if lo else \
            [rows[..., hi:, :]]
        z = _ntt_fwd(jnp.concatenate(keep, axis=-2) if len(keep) > 1
                     else keep[0], ks.t_comp[j])
        outs.append(jnp.concatenate(
            [z[..., :lo, :], own_e[..., lo:hi, :], z[..., lo:, :]], axis=-2))
    return jnp.stack(outs)


def _ks_inner_ext(y_e, ksk_b, ksk_a, ks):
    """Inner products with the key digits over the EXTENDED (Q*P) basis
    — the mod-down is the caller's (deferred in the double-hoisted combo,
    immediate in _ks_apply)."""
    ksk_b = _mat_rows(ksk_b)
    ksk_a = _mat_rows(ksk_a)
    nbatch = y_e.ndim - 3
    nd = y_e.shape[0]                          # active digits <= key digits
    kb = ksk_b[:nd].reshape((nd,) + (1,) * nbatch + ksk_b.shape[1:])
    ka = ksk_a[:nd].reshape((nd,) + (1,) * nbatch + ksk_a.shape[1:])
    t0 = ma.barrett_mulmod(y_e, kb, ks.q_tgt, ks.mu_tgt, ks.sh_tgt)
    t1 = ma.barrett_mulmod(y_e, ka, ks.q_tgt, ks.mu_tgt, ks.sh_tgt)
    acc0 = t0[0]
    acc1 = t1[0]
    for j in range(1, t0.shape[0]):
        acc0 = ma.addmod(acc0, t0[j], ks.q_tgt)
        acc1 = ma.addmod(acc1, t1[j], ks.q_tgt)
    return acc0, acc1


def _ks_apply(y_e, ksk_b, ksk_a, ks):
    """Inner products with the key digits + mod-down."""
    acc0, acc1 = _ks_inner_ext(y_e, ksk_b, ksk_a, ks)
    return _mod_down(acc0, ks), _mod_down(acc1, ks)


def _pt_q_slice(pt: Plaintext, nl: int) -> Plaintext:
    """First-nl-rows view of an extended-basis plaintext (its active-Q
    encoding — basis order is actives then specials)."""
    sh = None if pt.shoup is None else pt.shoup[..., :nl, :]
    return Plaintext(pt.data[..., :nl, :], sh, nl, pt.scale)


def _spread2(lo, hi, q, mu, sh):
    """Two-plane int64 coeffs (v = hi*2^32 + lo) -> (..., L, N) u32
    residues: r = ((hi mod q) * (2^32 mod q) + lo mod q) mod q, with
    2^32 mod q = (2^16 mod q)^2 mod q computed via Barrett on the fly."""
    qi = q.astype(jnp.int32)
    hi_r = (hi[..., None, :] % qi).astype(jnp.uint32)
    lo_r = (lo[..., None, :] % q).astype(jnp.uint32)
    p16 = (jnp.uint32(1) << 16) % q
    p32 = ma.barrett_mulmod(p16, p16, q, mu, sh)
    return ma.addmod(ma.barrett_mulmod(hi_r, p32, q, mu, sh), lo_r, q)


def _spread_ext(lo, hi, ks):
    """Coeff planes -> residues over the extended basis."""
    return _spread2(lo, hi, ks.q_tgt, ks.mu_tgt, ks.sh_tgt)


@_djit
def _pt_expand_q(lo, hi, ks):
    """Coeff plaintext -> eval rows over the ACTIVE Q basis only."""
    res = _spread2(lo, hi, ks.q_act, ks.mu_act, ks.sh_act)
    return _ntt_fwd(res, ks.t_act)


@_djit
def _hoisted_combo_coeff_core(c0, y_e, gammas, bitss, rowmaps, kbs, kas,
                              los, his, ks):
    """_hoisted_combo_core with COMPRESSED plaintexts: each scan step
    RNS-spreads + NTTs its (N,) int32 coefficient vector into extended-
    basis rows on the fly (~tgt limb NTTs, trivial vs the inner products)
    — the memory shape that lets thousands of matmul diagonals stay
    cached on device (see Evaluator.encode_coeff_cached)."""
    nl = ks.nl
    n = c0.shape[-1]
    zq = jnp.zeros(c0.shape[:-2] + (nl, n), jnp.uint32)
    ze = jnp.zeros(c0.shape[:-2] + (y_e.shape[-2], n), jnp.uint32)

    def body(carry, xs):
        a0q, a0e, a1e = carry
        gamma, bits, rowmap, kb, ka, lo, hi = xs
        pt = _ntt_fwd(_spread_ext(lo, hi, ks), ks.t_tgt)
        gp = GaloisPerm(gamma, bits, rowmap)
        c0p = _apply_gperm(c0, gp)
        yp = _apply_gperm(y_e, gp)
        t0, t1 = _ks_inner_ext(yp, kb, ka, ks)
        ptq = pt[..., :nl, :]
        a0q = ma.addmod(a0q, ma.barrett_mulmod(
            c0p, ptq, ks.q_act, ks.mu_act, ks.sh_act), ks.q_act)
        a0e = ma.addmod(a0e, ma.barrett_mulmod(
            t0, pt, ks.q_tgt, ks.mu_tgt, ks.sh_tgt), ks.q_tgt)
        a1e = ma.addmod(a1e, ma.barrett_mulmod(
            t1, pt, ks.q_tgt, ks.mu_tgt, ks.sh_tgt), ks.q_tgt)
        return (a0q, a0e, a1e), None

    (a0q, a0e, a1e), _ = jax.lax.scan(
        body, (zq, ze, ze), (gammas, bitss, rowmaps, kbs, kas, los, his))
    k0 = _mod_down(a0e, ks)
    k1 = _mod_down(a1e, ks)
    return ma.addmod(a0q, k0, ks.q_act), k1


@_djit
def _combo_stage1_core(c0, y_e, gammas, bitss, rowmaps, kstack_b,
                       kstack_a, ks):
    """Scan over baby shifts: permute (c0, y_e), inner-product with the
    key digits over the extended basis.  Returns (c0p, t0, t1) stacked
    with a leading baby axis."""
    def body(_, xs):
        gamma, bits, rowmap, kb, ka = xs
        gp = GaloisPerm(gamma, bits, rowmap)
        c0p = _apply_gperm(c0, gp)
        yp = _apply_gperm(y_e, gp)
        t0, t1 = _ks_inner_ext(yp, kb, ka, ks)
        return None, (c0p, t0, t1)

    _, (c0ps, t0s, t1s) = jax.lax.scan(
        body, None, (gammas, bitss, rowmaps, kstack_b, kstack_a))
    return c0ps, t0s, t1s


@_djit
def _combo_stage2_core(c0ps, t0s, t1s, idxs, los, his, ks):
    """pt-weighted accumulation of stage-1 rows + ONE lazy mod-down."""
    nl = ks.nl
    n = c0ps.shape[-1]
    zq = jnp.zeros(c0ps.shape[1:-2] + (nl, n), jnp.uint32)
    ze = jnp.zeros(t0s.shape[1:-2] + (t0s.shape[-2], n), jnp.uint32)

    def body(carry, xs):
        a0q, a0e, a1e = carry
        idx, lo, hi = xs
        pt = _ntt_fwd(_spread_ext(lo, hi, ks), ks.t_tgt)
        c0p = jax.lax.dynamic_index_in_dim(c0ps, idx, 0, False)
        t0 = jax.lax.dynamic_index_in_dim(t0s, idx, 0, False)
        t1 = jax.lax.dynamic_index_in_dim(t1s, idx, 0, False)
        ptq = pt[..., :nl, :]
        a0q = ma.addmod(a0q, ma.barrett_mulmod(
            c0p, ptq, ks.q_act, ks.mu_act, ks.sh_act), ks.q_act)
        a0e = ma.addmod(a0e, ma.barrett_mulmod(
            t0, pt, ks.q_tgt, ks.mu_tgt, ks.sh_tgt), ks.q_tgt)
        a1e = ma.addmod(a1e, ma.barrett_mulmod(
            t1, pt, ks.q_tgt, ks.mu_tgt, ks.sh_tgt), ks.q_tgt)
        return (a0q, a0e, a1e), None

    (a0q, a0e, a1e), _ = jax.lax.scan(body, (zq, ze, ze), (idxs, los, his))
    k0 = _mod_down(a0e, ks)
    k1 = _mod_down(a1e, ks)
    return ma.addmod(a0q, k0, ks.q_act), k1


def _djit_static(**jit_kw):
    def deco(fn):
        jf = jax.jit(fn, **jit_kw)

        @functools.wraps(fn)
        def wrapped(*a, **k):
            _COUNTS.count("dispatch", 1)
            return jf(*a, **k)
        wrapped._jit = jf
        return wrapped
    return deco


@_djit_static(static_argnames=("G",))
def _combo_stage2_all_core(c0ps, t0s, t1s, gidx, bidx, los, his, G, ks):
    """Scan over every (group, baby, pt) pair, carrying per-group
    accumulators; ONE batched mod-down at the end."""
    nl = ks.nl
    n = c0ps.shape[-1]
    zq = jnp.zeros((G,) + c0ps.shape[1:-2] + (nl, n), jnp.uint32)
    ze = jnp.zeros((G,) + t0s.shape[1:-2] + (t0s.shape[-2], n), jnp.uint32)

    def body(carry, xs):
        a0q, a0e, a1e = carry
        g, b, lo, hi = xs
        pt = _ntt_fwd(_spread_ext(lo, hi, ks), ks.t_tgt)
        c0p = jax.lax.dynamic_index_in_dim(c0ps, b, 0, False)
        t0 = jax.lax.dynamic_index_in_dim(t0s, b, 0, False)
        t1 = jax.lax.dynamic_index_in_dim(t1s, b, 0, False)
        ptq = pt[..., :nl, :]
        u0 = ma.addmod(jax.lax.dynamic_index_in_dim(a0q, g, 0, False),
                       ma.barrett_mulmod(c0p, ptq, ks.q_act, ks.mu_act,
                                         ks.sh_act), ks.q_act)
        u0e = ma.addmod(jax.lax.dynamic_index_in_dim(a0e, g, 0, False),
                        ma.barrett_mulmod(t0, pt, ks.q_tgt, ks.mu_tgt,
                                          ks.sh_tgt), ks.q_tgt)
        u1e = ma.addmod(jax.lax.dynamic_index_in_dim(a1e, g, 0, False),
                        ma.barrett_mulmod(t1, pt, ks.q_tgt, ks.mu_tgt,
                                          ks.sh_tgt), ks.q_tgt)
        a0q = jax.lax.dynamic_update_index_in_dim(a0q, u0, g, 0)
        a0e = jax.lax.dynamic_update_index_in_dim(a0e, u0e, g, 0)
        a1e = jax.lax.dynamic_update_index_in_dim(a1e, u1e, g, 0)
        return (a0q, a0e, a1e), None

    (a0q, a0e, a1e), _ = jax.lax.scan(body, (zq, ze, ze),
                                      (gidx, bidx, los, his))
    k0 = _mod_down(a0e, ks)
    k1 = _mod_down(a1e, ks)
    return ma.addmod(a0q, k0, ks.q_act), k1


@_djit
def _multi_galois_stack_core(c0, c1, gammas, bitss, rowmaps, kbs, kas, ks):
    """Hoisted multi-rotate with STACKED outputs: one decomposition, then
    per shift only a factored permutation + key inner products + mod-down
    (no per-rotation decompose NTTs), scanned into a new leading axis."""
    y_e = _ks_decompose(_ntt_inv(c1, ks.t_act), ks, cx_eval=c1)

    def body(_, xs):
        gamma, bits, rowmap, kb, ka = xs
        gp = GaloisPerm(gamma, bits, rowmap)
        c0p = _apply_gperm(c0, gp)
        yp = _apply_gperm(y_e, gp)
        k0, k1 = _ks_apply(yp, kb, ka, ks)
        return None, (ma.addmod(c0p, k0, ks.q_act), k1)

    _, (o0s, o1s) = jax.lax.scan(
        body, None, (gammas, bitss, rowmaps, kbs, kas))
    return o0s, o1s


@_djit
def _galois_tree_core(c0, c1, gammas, bitss, rowmaps, kbs, kas, ks):
    """Sequential rotate-accumulate: (c0, c1) += galois((c0, c1), t_i)
    scanned over the stacked shift tables — a whole rotsum/repeat log-tree
    in one compiled dispatch (carry shape is constant, so the scan body
    compiles once regardless of tree depth)."""
    def body(carry, xs):
        a0, a1 = carry
        gamma, bits, rowmap, kb, ka = xs
        gp = GaloisPerm(gamma, bits, rowmap)
        o0, o1 = _galois_core(a0, a1, gp, kb, ka, ks)
        return (ma.addmod(a0, o0, ks.q_act),
                ma.addmod(a1, o1, ks.q_act)), None

    (c0, c1), _ = jax.lax.scan(
        body, (c0, c1), (gammas, bitss, rowmaps, kbs, kas))
    return c0, c1


@_djit
def _multi_galois_sum_core(c0s, c1s, gammas, bitss, rowmaps, kbs, kas, ks):
    """sum_g galois(cts[g], t_g): a scan of full key switches with an
    exact modular accumulator — one dispatch for a transform's giants."""
    n = c0s.shape[-1]
    zq = jnp.zeros(c0s.shape[1:], jnp.uint32)

    def body(carry, xs):
        acc0, acc1 = carry
        c0, c1, gamma, bits, rowmap, kb, ka = xs
        gp = GaloisPerm(gamma, bits, rowmap)
        o0, o1 = _galois_core(c0, c1, gp, kb, ka, ks)
        return (ma.addmod(acc0, o0, ks.q_act),
                ma.addmod(acc1, o1, ks.q_act)), None

    (acc0, acc1), _ = jax.lax.scan(
        body, (zq, zq), (c0s, c1s, gammas, bitss, rowmaps, kbs, kas))
    return acc0, acc1


@_djit
def _hoisted_combo_core(c0, y_e, gammas, bitss, rowmaps, kbs, kas, pts, ks):
    """sum_j pt_j * rotate_j(ct) with a shared decomposition y_e and ONE
    deferred mod-down (double hoisting / lazy key switching): per rotation
    only a factored permutation + extended-basis inner products run — the
    expensive NTTs (decompose, mod-down) happen once per call, not once
    per rotation.  Scanned over the rotation axis so compiled size stays
    flat in the rotation count.

    pts: (R, nl + k_sp, N) eval-domain diagonals over the extended basis
    (encode(..., specials=True)); kbs/kas: (R, ndig, nl + k_sp, N)."""
    nl = ks.nl
    n = c0.shape[-1]
    zq = jnp.zeros(c0.shape[:-2] + (nl, n), jnp.uint32)
    ze = jnp.zeros(c0.shape[:-2] + (y_e.shape[-2], n), jnp.uint32)

    def body(carry, xs):
        a0q, a0e, a1e = carry
        gamma, bits, rowmap, kb, ka, pt = xs
        gp = GaloisPerm(gamma, bits, rowmap)
        c0p = _apply_gperm(c0, gp)
        yp = _apply_gperm(y_e, gp)
        t0, t1 = _ks_inner_ext(yp, kb, ka, ks)
        ptq = pt[..., :nl, :]
        a0q = ma.addmod(a0q, ma.barrett_mulmod(
            c0p, ptq, ks.q_act, ks.mu_act, ks.sh_act), ks.q_act)
        a0e = ma.addmod(a0e, ma.barrett_mulmod(
            t0, pt, ks.q_tgt, ks.mu_tgt, ks.sh_tgt), ks.q_tgt)
        a1e = ma.addmod(a1e, ma.barrett_mulmod(
            t1, pt, ks.q_tgt, ks.mu_tgt, ks.sh_tgt), ks.q_tgt)
        return (a0q, a0e, a1e), None

    (a0q, a0e, a1e), _ = jax.lax.scan(
        body, (zq, ze, ze), (gammas, bitss, rowmaps, kbs, kas, pts))
    k0 = _mod_down(a0e, ks)
    k1 = _mod_down(a1e, ks)
    return ma.addmod(a0q, k0, ks.q_act), k1


def _ks_inner(cx_coeff, ksk_b, ksk_a, ks, cx_eval=None):
    """Hybrid key-switch core on coefficient-domain input limbs (..., nl, N).
    ksk_b/ksk_a: (ndig, nl + k_sp, N) already sliced to the target basis.
    Returns (k0, k1) eval-domain over the active q basis (after P mod-down).

    All digits ride ONE batched NTT / one batched inner-product: the digit
    axis stacks as a leading batch dim, which keeps compiled graphs small
    (one NTT instance instead of dnum) and feeds the MXU bigger batches."""
    return _ks_apply(_ks_decompose(cx_coeff, ks, cx_eval), ksk_b, ksk_a, ks)


@_djit
def _hoist_decompose_core(c1, ks):
    return _ks_decompose(_ntt_inv(c1, ks.t_act), ks, cx_eval=c1)


@_djit
def _hoist_rotate_core(c0, y_e, gp, kb, ka, ks):
    r0 = _apply_gperm(c0, gp)
    y_perm = _apply_gperm(y_e, gp)
    k0, k1 = _ks_apply(y_perm, kb, ka, ks)
    return ma.addmod(r0, k0, ks.q_act), k1


def _md_overflow(w, mdq40):
    """Deterministic v = round(sum_t w_t / p_t), the CRT overflow of the
    fast base conversion P -> Q: the converted value is [x]_P + v*P with
    v in [0, k_sp), so the division by P under-shoots by v — an error of
    mean ~k_sp/2 PER COEFFICIENT PER SWITCH that previously accumulated
    coherently across the circuit's thousands of key switches and set
    the 0.76-bit bootstrap precision ceiling (a constant coefficient
    bias of b maps to slot errors up to ~b*N/pi at the near-unity
    embedding roots; round-3 decomposition: math 10.5 b vs crypto 0.8 b).
    Adding v back — and rounding rather than flooring — centers the
    mod-down error to (-1/2, 1/2] like _rescale_core's centered lift.

    Integer fixed-point planes (w * round(2^40/p_t) accumulated as exact
    u32 16-bit partial sums, combined in f32 only at the very end) make
    the estimate identical under ANY summation grouping, so the
    limb-sharded KS (parallel/ksprod.py psum of the same planes) stays
    bit-exact vs single device."""
    a = (w & 0xFFFF) * mdq40                    # < 2^16 * 2^11: u32-exact
    b = (w >> 16) * mdq40                       # < 2^14 * 2^11
    al = jnp.sum(a & 0xFFFF, axis=-2, keepdims=True)      # < k * 2^16
    ahbb = jnp.sum((a >> 16) + b, axis=-2, keepdims=True)  # < k * 2^26
    s = al.astype(jnp.float32) * (2.0 ** -40) \
        + ahbb.astype(jnp.float32) * (2.0 ** -24)
    return jnp.round(s).astype(jnp.uint32)


def _mod_down(x, ks):
    """(..., nl + k_sp, N) over Q*P -> (..., nl, N) over Q: divide by P,
    rounded (centered via the _md_overflow correction)."""
    from ..ops import basecvt
    nl = ks.nl
    xq = x[..., :nl, :]
    xp = x[..., nl:, :]
    vp = _ntt_inv(xp, ks.t_sp)
    w = ma.shoup_mulmod(vp, ks.pfold, ks.pfold_s, ks.q_sp)
    v = _md_overflow(w, ks.mdq40)
    if basecvt.use_pallas() and ks.md.convp is not None:
        # hand the kernel the ALREADY-FOLDED w (computed above for the
        # overflow estimate) so the fold runs once per mod-down
        y = basecvt.base_convert(w, ks.md, prefolded=True)[0]
    else:
        y = None
        for ti in range(w.shape[-2]):
            term = ma.shoup_mulmod(w[..., ti: ti + 1, :], ks.pconv[ti],
                                   ks.pconv_s[ti], ks.q_act)
            y = term if y is None else ma.addmod(y, term, ks.q_act)
    # apply the overflow correction in the COEFFICIENT domain (v is a
    # per-coefficient integer): y -= v*P makes (x - y)/P = floor + v,
    # i.e. round(x/P), and rides the existing NTT for free
    y = ma.submod(y, ma.shoup_mulmod(v, ks.pmod, ks.pmod_s, ks.q_act),
                  ks.q_act)
    y_e = _ntt_fwd(y, ks.t_act)
    diff = ma.submod(xq, y_e, ks.q_act)
    return ma.shoup_mulmod(diff, ks.pinv, ks.pinv_s, ks.q_act)


def _sq2m1_tail(a0, a1, kb, ka, ks):
    """Shared head of the fused Chebyshev doubling node: relinearized
    square, then x2 (exact modular doubling)."""
    q, mu, sh = ks.q_act, ks.mu_act, ks.sh_act
    d0 = ma.barrett_mulmod(a0, a0, q, mu, sh)
    ab = ma.barrett_mulmod(a0, a1, q, mu, sh)
    d1 = ma.addmod(ab, ab, q)
    d2 = ma.barrett_mulmod(a1, a1, q, mu, sh)
    d2_coeff = _ntt_inv(d2, ks.t_act)
    k0, k1 = _ks_inner(d2_coeff, kb, ka, ks, cx_eval=d2)
    c0 = ma.addmod(d0, k0, q)
    c0 = ma.addmod(c0, c0, q)
    c1 = ma.addmod(d1, k1, q)
    c1 = ma.addmod(c1, c1, q)
    return c0, c1


def _mul2_tail(a0, a1, b0, b1, kb, ka, ks):
    """Relinearized product, doubled (head of the T_{a+b} node)."""
    q, mu, sh = ks.q_act, ks.mu_act, ks.sh_act
    d0 = ma.barrett_mulmod(a0, b0, q, mu, sh)
    d1 = ma.addmod(ma.barrett_mulmod(a0, b1, q, mu, sh),
                   ma.barrett_mulmod(a1, b0, q, mu, sh), q)
    d2 = ma.barrett_mulmod(a1, b1, q, mu, sh)
    d2_coeff = _ntt_inv(d2, ks.t_act)
    k0, k1 = _ks_inner(d2_coeff, kb, ka, ks, cx_eval=d2)
    c0 = ma.addmod(d0, k0, q)
    c0 = ma.addmod(c0, c0, q)
    c1 = ma.addmod(d1, k1, q)
    c1 = ma.addmod(c1, c1, q)
    return c0, c1


def _sub_scaled_c(c0, c1, e0, e1, vc, vc_s, qc, plan_c):
    """(c0, c1) - rescale(c * vc): the inlined scale-match + subtract."""
    f0 = ma.shoup_mulmod(e0, vc, vc_s, qc)
    f1 = ma.shoup_mulmod(e1, vc, vc_s, qc)
    f0, f1 = _rescale_body(f0, f1, plan_c)
    return ma.submod(c0, f0, plan_c.qrem), ma.submod(c1, f1, plan_c.qrem)


@_djit
def _cheb_mulsub_core(a0, a1, b0, b1, e0, e1, kb, ka, ks, plan, plan_c,
                      vc, vc_s, qc):
    """T = 2ab - c fused: relin product, double, rescale, minus the
    scale-matched c (inlined adjust: c*vc then one rescale)."""
    c0, c1 = _mul2_tail(a0, a1, b0, b1, kb, ka, ks)
    c0, c1 = _rescale_body(c0, c1, plan)
    return _sub_scaled_c(c0, c1, e0, e1, vc, vc_s, qc, plan_c)


@_djit
def _cheb_mulsub2_core(a0, a1, b0, b1, e0, e1, kb, ka, ks, plan1, plan2,
                       plan_c, vc, vc_s, qc):
    """Wide variant: two product rescales."""
    c0, c1 = _mul2_tail(a0, a1, b0, b1, kb, ka, ks)
    c0, c1 = _rescale_body(c0, c1, plan1)
    c0, c1 = _rescale_body(c0, c1, plan2)
    return _sub_scaled_c(c0, c1, e0, e1, vc, vc_s, qc, plan_c)


@_djit
def _cheb_sq_core(a0, a1, kb, ka, ks, plan, m1):
    """T = 2*a^2 - 1 fused: relin square, double, one rescale, the -1
    (m1 arrives as (-round(s_out)) mod q residues, added to c0)."""
    c0, c1 = _sq2m1_tail(a0, a1, kb, ka, ks)
    c0, c1 = _rescale_body(c0, c1, plan)
    return ma.addmod(c0, m1, plan.qrem), c1


@_djit
def _cheb_sq2_core(a0, a1, kb, ka, ks, plan1, plan2, m1):
    """Wide variant: two rescales (paired working scale)."""
    c0, c1 = _sq2m1_tail(a0, a1, kb, ka, ks)
    c0, c1 = _rescale_body(c0, c1, plan1)
    c0, c1 = _rescale_body(c0, c1, plan2)
    return ma.addmod(c0, m1, plan2.qrem), c1


@_djit
def _mul_relin_core(a0, a1, b0, b1, kb, ka, ks):
    q, mu, sh = ks.q_act, ks.mu_act, ks.sh_act
    d0 = ma.barrett_mulmod(a0, b0, q, mu, sh)
    d1 = ma.addmod(ma.barrett_mulmod(a0, b1, q, mu, sh),
                   ma.barrett_mulmod(a1, b0, q, mu, sh), q)
    d2 = ma.barrett_mulmod(a1, b1, q, mu, sh)
    d2_coeff = _ntt_inv(d2, ks.t_act)
    k0, k1 = _ks_inner(d2_coeff, kb, ka, ks, cx_eval=d2)
    return ma.addmod(d0, k0, q), ma.addmod(d1, k1, q)


def _apply_gperm(v, gp):
    """Apply a factored eval-domain automorphism permutation (GaloisPerm)
    to the last axis: lane gather + log2(n2) conditional row rolls +
    shared row gather.  3.5x faster than flat jnp.take on v5e
    (tools/ab_permute.py: 0.27 vs 0.94 ms at (8, 24, 2^15))."""
    n2, n1 = gp.rowmap.shape[0], gp.gamma.shape[0]
    y = v.reshape(v.shape[:-1] + (n2, n1))
    y = jnp.take(y, gp.gamma, axis=-1)
    for b in range(gp.bits.shape[0]):
        y = jnp.where(gp.bits[b], jnp.roll(y, -(1 << b), axis=-2), y)
    y = jnp.take(y, gp.rowmap, axis=-2)
    return y.reshape(v.shape)


@_djit
def _galois_core(c0, c1, gp, kb, ka, ks):
    q = ks.q_act
    r0 = _apply_gperm(c0, gp)
    r1 = _apply_gperm(c1, gp)
    r1_coeff = _ntt_inv(r1, ks.t_act)
    k0, k1 = _ks_inner(r1_coeff, kb, ka, ks, cx_eval=r1)
    return ma.addmod(r0, k0, q), k1

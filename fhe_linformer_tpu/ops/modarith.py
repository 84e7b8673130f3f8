"""u32 modular arithmetic primitives for TPU lanes (pure jnp, Pallas-safe).

Every RNS limb prime q satisfies 2**28 < q < 2**30 (see primes.py), so:
  * residues fit u32 with 2 lazy bits of headroom (a+b < 2**31),
  * Barrett's quotient estimate error keeps partial remainders < 4q < 2**32.

The TPU VPU has no widening 32x32->64 multiply, so the 64-bit products that
modular reduction needs are synthesised from 16-bit halves (`mulhi32`).
These helpers are plain jnp so they work identically inside Pallas kernels
and in traced XLA code; XLA fuses the elementwise chains into single VPU
loops.

Replaces the limb arithmetic OpenFHE's DCRTPoly provides to the reference
(invoked via EvalAdd/EvalMult, /root/reference/src/FHEController.cpp:409-432).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
_LO16 = np.uint32(0xFFFF)


def mulhi32(a, b):
    """High 32 bits of the 64-bit product of two u32 arrays (exact)."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & _LO16
    a1 = a >> 16
    b0 = b & _LO16
    b1 = b >> 16
    # t = a1*b0 + hi16(a0*b0): a1*b0 < 2^32-ish? a1<2^16, b0<2^16 -> a1*b0 <= (2^16-1)^2
    # (2^16-1)^2 + (2^16-1) < 2^32, exact in u32.
    t = a1 * b0 + ((a0 * b0) >> 16)
    u = (t & _LO16) + a0 * b1          # <= (2^16-1) + (2^16-1)^2 < 2^32, exact
    return a1 * b1 + (t >> 16) + (u >> 16)


def mullo32(a, b):
    return a.astype(U32) * b.astype(U32)  # u32 multiply wraps mod 2^32 in XLA


# ---------------------------------------------------------------------------
# Barrett reduction: variable x variable mod q, q < 2**30
# ---------------------------------------------------------------------------
# For prime q with b = bitlen(q) (<=30), precompute mu = floor(2**(2b+1) / q)
# (mu < 2**(b+2) <= 2**32 because q > 2**(b-1)).  For a,b < q:
#   p  = a*b < 2**2b  held as a (hi,lo) u32 pair
#   x1 = floor(p / 2**(b-1)) < 2**(b+1) <= 2**32
#   t  = floor(x1 * mu / 2**(b+2))
# Error analysis: t <= floor(p/q) and t > p/q - 2.5, so r = p - t*q in [0, 3q)
# with 3q < 2**32; two conditional subtracts finish the reduction.
# The shifts are per-limb u32 scalars; XLA supports per-element shifts so the
# whole limb axis runs in one vectorized pass.

def barrett_params(q: int) -> tuple[int, int, int]:
    """(q, mu, post_shift) for barrett_mulmod; shift amounts baked per limb."""
    b = int(q).bit_length()
    mu = (1 << (2 * b + 1)) // q
    assert mu < 1 << 32
    return q, mu, b + 2


def _shift_right_64(hi, lo, s):
    """(hi:lo) >> s for 1 <= s <= 32, elementwise (s may be a u32 array)."""
    s = jnp.asarray(s, U32)
    lo_part = (lo >> (s - np.uint32(1))) >> 1          # two <=31-bit shifts
    hi_part = hi << ((np.uint32(32) - s) & np.uint32(31))
    return lo_part | hi_part  # s=32: lo_part==0, hi<<0==hi — exact for s in [1,32]


def barrett_mulmod(a, b, q, mu, shift):
    """a*b mod q elementwise. a,b < q < 2**30; q/mu/shift broadcastable u32."""
    q = jnp.asarray(q, U32)
    mu = jnp.asarray(mu, U32)
    shift = jnp.asarray(shift, U32)
    lo = mullo32(a, b)
    hi = mulhi32(a, b)
    bbits = shift - np.uint32(2)              # = bitlen(q)
    x1 = _shift_right_64(hi, lo, bbits - np.uint32(1))   # floor(p / 2^(b-1))
    t_hi = mulhi32(x1, mu)
    t_lo = mullo32(x1, mu)
    t = _shift_right_64(t_hi, t_lo, shift)     # ~ floor(p/q), err <= 2
    r = lo - mullo32(t, q)                     # mod 2^32; true value < 4q < 2^32
    r = jnp.where(r >= 2 * q, r - 2 * q, r)
    r = jnp.where(r >= q, r - q, r)
    return r


# ---------------------------------------------------------------------------
# Shoup multiplication: variable x precomputed-constant mod q
# ---------------------------------------------------------------------------

def shoup_precompute(w: np.ndarray, q) -> np.ndarray:
    """w' = floor(w * 2**32 / q) as u32 (numpy, host side)."""
    w = np.asarray(w, dtype=object)
    q = np.asarray(q, dtype=object)
    return ((w * (1 << 32)) // q).astype(np.uint32)


def shoup_mulmod(a, w, w_shoup, q):
    """a*w mod q with w constant and w' = floor(w*2**32/q) precomputed.

    Valid for a < 2**32 (lazy inputs ok); result in [0, q).
    """
    q = jnp.asarray(q, U32)
    hi = mulhi32(a, w_shoup)
    r = mullo32(a, w) - mullo32(hi, q)
    return jnp.where(r >= q, r - q, r)


# ---------------------------------------------------------------------------
# add / sub / negate
# ---------------------------------------------------------------------------

def addmod(a, b, q):
    q = jnp.asarray(q, U32)
    r = a + b
    return jnp.where(r >= q, r - q, r)


def submod(a, b, q):
    q = jnp.asarray(q, U32)
    r = a - b
    return jnp.where(r > a, r + q, r)  # detect wrap via unsigned compare


def negmod(a, q):
    q = jnp.asarray(q, U32)
    return jnp.where(a == 0, a, q - a)

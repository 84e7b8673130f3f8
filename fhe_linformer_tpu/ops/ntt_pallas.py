"""Fused Pallas TPU kernel for the four-step negacyclic NTT/iNTT (int8 MXU).

One grid program = one limb x one batch-tile of NB polynomials; the entire
transform runs out of VMEM: balanced base-256 digit decomposition, both
MXU matmul stages, the Shoup digit recombination and the twiddle multiply
— none of the intermediates ever round-trips to HBM.

Why int8: the MXU runs s8 x s8 -> s32 at 2x the bf16 rate (measured ~380
TOPS vs ~196 TFLOPs on v5e), and *balanced* signed digits in [-128, 127]
cover a 30-bit residue in XDIG8 = 4 planes versus the bf16 path's 6 planes
of 5-bit digits — 1.5x fewer MACs at 2x the rate, 3x less MXU time, and
the s32 accumulator is integer-exact (|digit products| <= 2**14 summed
over <= 1024 terms < 2**24 << 2**31).  Tables come pre-split by
ops/ntt.py:_expand_w_i8; bit-exactness vs the XLA path is asserted by
tests/test_ntt_pallas.py and inside bench.py on the real TPU.

Stage orientations are expressed with dot_general dimension numbers so
that *no* transpose is needed anywhere:

  fwd:  Y'[j2][j1] = x.reshape(n2, n1)                (j = j2*n1 + j1)
        B[j1][k2]  = dot(digits(Y'), W2f8, contract dim0 x dim0)
        C          = B * Tf (Shoup)
        Z[k1][k2]  = dot(W1f8, digits(C), contract dim1 x dim0)
        out        = Z.reshape(N)                     (k = k1*n2 + k2)

  inv:  M[k1][k2]  = X.reshape(n1, n2)
        D[j1][k2]  = dot(W1i8, digits(M), contract dim1 x dim0)
        E          = D * Ti (Shoup)
        F[j2][j1]  = dot(W2i8, digits(E), contract dim0 x dim1)
        out        = F.reshape(N)                     (j2-major = coeff order)

Replaces (with ops/ntt.py) the NTT inside OpenFHE's DCRTPoly that the
reference invokes through every EvalMult/EvalRotate
(/root/reference/src/FHEController.cpp:409-436).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modarith as ma
from .ntt import LimbTables, XDIG8

NB = 8   # polynomials per grid program (VMEM budget ~8.5 MB at n=2**15)


def _digits_i8(x, axis: int):
    """u32 (a, b) residue < 2**30 -> XDIG8 balanced base-256 s8 planes
    concatenated along `axis`.  Digit d in [-128, 127]; the carry ripple
    keeps the running value non-negative, and the top digit is < 2**7."""
    v = x
    parts = []
    for d in range(XDIG8):
        if d < XDIG8 - 1:
            u = v & np.uint32(255)
            borrow = u >> np.uint32(7)                      # 1 iff u >= 128
            dig = u.astype(jnp.int32) - (
                borrow << np.uint32(8)).astype(jnp.int32)
            v = (v >> np.uint32(8)) + borrow
        else:
            dig = v.astype(jnp.int32)
        parts.append(dig.astype(jnp.int8))
    return jnp.concatenate(parts, axis=axis)


def _combine(planes, comb_ref, combs_ref, l, q):
    """sum_e P_e * (2**(8e) mod q) mod q on the VPU.  P_e is s32 in
    (-2**24, 2**24); adding q (> 2**28) makes it a non-negative residue
    < 2**31, which the lazy Shoup multiply accepts directly."""
    acc = None
    for e, p in enumerate(planes):
        x = (p + q.astype(jnp.int32)).astype(jnp.uint32)
        term = ma.shoup_mulmod(x, comb_ref[l, e], combs_ref[l, e], q)
        acc = term if acc is None else ma.addmod(acc, term, q)
    return acc


def _fwd_kernel(n1, n2, nb, q_ref, comb_ref, combs_ref,
                x_ref, w2f_ref, w1f_ref, tf_ref, tfs_ref, out_ref):
    l = pl.program_id(0)
    q = q_ref[l]
    for b in range(nb):
        y = x_ref[b, 0]                                 # (n2, n1) [j2][j1]
        yd = _digits_i8(y, 0)                           # (XDIG8*n2, n1)
        planes = [
            jax.lax.dot_general(yd, w2f_ref[e, 0], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            for e in range(XDIG8)]                      # (n1, n2) [j1][k2]
        bb = _combine(planes, comb_ref, combs_ref, l, q)
        c = ma.shoup_mulmod(bb, tf_ref[0], tfs_ref[0], q)
        cd = _digits_i8(c, 0)                           # (XDIG8*n1, n2)
        planes = [
            jax.lax.dot_general(w1f_ref[e, 0], cd, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            for e in range(XDIG8)]                      # (n1, n2) [k1][k2]
        out_ref[b, 0] = _combine(planes, comb_ref, combs_ref, l, q)


def _inv_kernel(n1, n2, nb, q_ref, comb_ref, combs_ref,
                x_ref, w1i_ref, w2i_ref, ti_ref, tis_ref, out_ref):
    l = pl.program_id(0)
    q = q_ref[l]
    for b in range(nb):
        m = x_ref[b, 0]                                 # (n1, n2) [k1][k2]
        md = _digits_i8(m, 0)                           # (XDIG8*n1, n2)
        planes = [
            jax.lax.dot_general(w1i_ref[e, 0], md, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            for e in range(XDIG8)]                      # (n1, n2) [j1][k2]
        d = _combine(planes, comb_ref, combs_ref, l, q)
        e_ = ma.shoup_mulmod(d, ti_ref[0], tis_ref[0], q)
        ed = _digits_i8(e_, 1)                          # (n1, XDIG8*n2)
        planes = [
            jax.lax.dot_general(w2i_ref[e, 0], ed, (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
            for e in range(XDIG8)]                      # (n2, n1) [j2][j1]
        out_ref[b, 0] = _combine(planes, comb_ref, combs_ref, l, q)


def _call(x, t: LimbTables, kernel, w_a, w_b, tw, tw_s, interpret):
    """Shared pallas_call plumbing for fwd/inv. x: (..., L, N) u32."""
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    n1, n2 = t.n1, t.n2
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    # batch tile scales inversely with ring size: at n=2^16 the NB=8
    # (nb,1,n1,n2) u32 blocks are 16 MB each and overflow the 16 MB
    # scoped-vmem stack (measured r128c, round 4).  Proportional halving
    # (nb=4 at 2^16) still measured 16.19M — the double-buffered weight
    # digit planes don't shrink with nb — so rings past 2^15 take an
    # extra halving (nb=2 at 2^16; p216 campaign r5 postmortem).
    nb = min(B, NB, max(1, (NB * (1 << 15)) // n
                        // (1 if n <= (1 << 15) else 2)))
    pad = (-B) % nb
    # Mosaic requires the last two block dims (8,128)-aligned or full:
    # expose the four-step matrix view as explicit leading-(B,L) 4D arrays.
    in_rc = (t.n2, t.n1) if kernel is _fwd_kernel else (t.n1, t.n2)
    out_rc = (t.n1, t.n2) if kernel is _fwd_kernel else (t.n2, t.n1)
    xf = x.reshape(B, L, *in_rc)
    if pad:
        xf = jnp.concatenate(
            [xf, jnp.zeros((pad, L) + in_rc, jnp.uint32)], axis=0)
    Bp = B + pad
    q1d = t.q.reshape(L)
    comb2d = jnp.moveaxis(t.comb_c.reshape(-1, L), 0, 1)     # (L, WDIG)
    combs2d = jnp.moveaxis(t.comb_s.reshape(-1, L), 0, 1)

    # grid (L, Bp//nb): batch-tile fastest, so per-limb weight blocks stay
    # resident in VMEM across the whole batch.
    wd_a = w_a.shape[-2:]
    wd_b = w_b.shape[-2:]
    flops = 2 * Bp * L * XDIG8 * n1 * n2 * (wd_a[0] + wd_b[1]
                                            if kernel is _fwd_kernel
                                            else wd_a[1] + wd_b[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # q, comb, comb_shoup live whole in SMEM
        grid=(L, Bp // nb),
        in_specs=[
            pl.BlockSpec((nb, 1) + in_rc, lambda l, b, *_: (b, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XDIG8, 1) + wd_a, lambda l, b, *_: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XDIG8, 1) + wd_b, lambda l, b, *_: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda l, b, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda l, b, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, 1) + out_rc, lambda l, b, *_: (b, l, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(kernel, n1, n2, nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, L) + out_rc, jnp.uint32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(2 * Bp * L * n * 4 + XDIG8 * L * (
                np.prod(wd_a) + np.prod(wd_b))),
            transcendentals=0),
        interpret=interpret,
    )(q1d, comb2d, combs2d, xf, w_a, w_b, tw, tw_s)
    if pad:
        out = out[:B]
    return out.reshape(*lead, L, n)


def fwd(x, t: LimbTables, interpret: bool = False):
    return _call(x, t, _fwd_kernel, t.w2f8, t.w1f8, t.tf, t.tf_s, interpret)


def inv(x, t: LimbTables, interpret: bool = False):
    return _call(x, t, _inv_kernel, t.w1i8, t.w2i8, t.ti, t.ti_s, interpret)

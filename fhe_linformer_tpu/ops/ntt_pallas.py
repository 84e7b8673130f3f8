"""Fused Pallas TPU kernel for the four-step negacyclic NTT/iNTT.

One grid program = one (limb, batch-item) pair; the entire transform runs
out of VMEM: 5-bit digit decomposition, both MXU matmul stages, the Shoup
digit recombination and the twiddle multiply — none of the intermediates
ever round-trips to HBM.  The plain-XLA path in ops/ntt.py materializes the
digit planes (384 KB), four fp32 partials and the twiddle products in HBM
between fusions; fusing removes ~4 MB of HBM traffic per limb transform and
turns the op compute-bound on the MXU.

Math and tables are identical to ops/ntt.py (bit-exact, asserted by
tests/test_ntt_pallas.py); only the operand orientations differ — stages
are expressed with dot_general dimension numbers chosen so that *no*
transpose is needed anywhere:

  fwd:  Y'[j2][j1] = x.reshape(n2, n1)                (j = j2*n1 + j1)
        B[j1][k2]  = dot(Y'digits, W2f,  contract dim0 x dim0)
        C          = B * Tf (Shoup)
        Z[k1][k2]  = dot(W1f, Cdigits,   contract dim1 x dim0)
        out        = Z.reshape(N)                     (k = k1*n2 + k2)

  inv:  M[k1][k2]  = X.reshape(n1, n2)
        D[j1][k2]  = dot(W1i, Mdigits,   contract dim1 x dim0)
        E          = D * Ti (Shoup)
        F[j2][j1]  = dot(W2i, Edigits,   contract dim0 x dim1)
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
from .ntt import LimbTables, XDIG, XDIG_BITS, WDIG, _XMASK, _digit_dtype


def _digits2d(x, axis: int):
    """u32 (a, b) -> digit planes concatenated along `axis` (0 or 1).

    Mosaic has no u32->bf16 cast; hop u32 -> s32 -> f32 -> bf16 (exact for
    5-bit digit values)."""
    dt = _digit_dtype()
    parts = [((x >> np.uint32(XDIG_BITS * d)) & np.uint32(_XMASK))
             .astype(jnp.int32).astype(jnp.float32).astype(dt)
             for d in range(XDIG)]
    return jnp.concatenate(parts, axis=axis)


def _combine(planes, comb_ref, combs_ref, l, q):
    """sum_e P_e * (2**(8e) mod q) mod q, with the plane count halved on
    the VPU: adjacent pairs P_e + P_{e+1}*2**8 stay below 2**32 exactly
    (each partial < 2**24.6), so only two lazy Shoup mults — by 2**0 and
    2**16 mod q, the existing comb table entries — and one modular add
    remain.  f32 -> s32 -> u32 hops because Mosaic lacks f32<->u32 casts;
    partials are integers < 2**24 so they are exact."""
    assert len(planes) == 4
    p = [x.astype(jnp.int32).astype(jnp.uint32) for x in planes]
    q01 = p[0] + (p[1] << np.uint32(8))
    q23 = p[2] + (p[3] << np.uint32(8))
    a = ma.shoup_mulmod(q01, comb_ref[l, 0], combs_ref[l, 0], q)
    b = ma.shoup_mulmod(q23, comb_ref[l, 2], combs_ref[l, 2], q)
    return ma.addmod(a, b, q)


def _fwd_kernel(n1, n2, q_ref, comb_ref, combs_ref,
                x_ref, w2f_ref, w1f_ref, tf_ref, tfs_ref, out_ref):
    l = pl.program_id(0)
    q = q_ref[l]
    y = x_ref[0, 0]                                     # (n2, n1) [j2][j1]
    yd = _digits2d(y, 0)                                # (XDIG*n2, n1)
    planes = [
        jax.lax.dot_general(yd, w2f_ref[e, 0], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for e in range(WDIG)]                           # (n1, n2) [j1][k2]
    b = _combine(planes, comb_ref, combs_ref, l, q)
    c = ma.shoup_mulmod(b, tf_ref[0], tfs_ref[0], q)
    cd = _digits2d(c, 0)                                # (XDIG*n1, n2)
    planes = [
        jax.lax.dot_general(w1f_ref[e, 0], cd, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for e in range(WDIG)]                           # (n1, n2) [k1][k2]
    z = _combine(planes, comb_ref, combs_ref, l, q)
    out_ref[0, 0] = z                                   # (n1, n2) [k1][k2]


def _inv_kernel(n1, n2, q_ref, comb_ref, combs_ref,
                x_ref, w1i_ref, w2i_ref, ti_ref, tis_ref, out_ref):
    l = pl.program_id(0)
    q = q_ref[l]
    m = x_ref[0, 0]                                     # (n1, n2) [k1][k2]
    md = _digits2d(m, 0)                                # (XDIG*n1, n2)
    planes = [
        jax.lax.dot_general(w1i_ref[e, 0], md, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for e in range(WDIG)]                           # (n1, n2) [j1][k2]
    d = _combine(planes, comb_ref, combs_ref, l, q)
    e_ = ma.shoup_mulmod(d, ti_ref[0], tis_ref[0], q)
    ed = _digits2d(e_, 1)                               # (n1, XDIG*n2)
    planes = [
        jax.lax.dot_general(w2i_ref[e, 0], ed, (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for e in range(WDIG)]                           # (n2, n1) [j2][j1]
    f = _combine(planes, comb_ref, combs_ref, l, q)
    out_ref[0, 0] = f                                   # (n2, n1) j2-major


def _call(x, t: LimbTables, kernel, w_a, w_b, tw, tw_s, interpret):
    """Shared pallas_call plumbing for fwd/inv. x: (..., L, N) u32."""
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    n1, n2 = t.n1, t.n2
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    # Mosaic requires the last two block dims tiled (8,128)-aligned or full:
    # expose the four-step matrix view as explicit leading-(B,L) 4D arrays.
    in_rc = (t.n2, t.n1) if kernel is _fwd_kernel else (t.n1, t.n2)
    out_rc = (t.n1, t.n2) if kernel is _fwd_kernel else (t.n2, t.n1)
    xf = x.reshape(B, L, *in_rc)
    q1d = t.q.reshape(L)
    comb2d = jnp.moveaxis(t.comb_c.reshape(WDIG, L), 0, 1)   # (L, WDIG)
    combs2d = jnp.moveaxis(t.comb_s.reshape(WDIG, L), 0, 1)

    # grid (L, B): b fastest, so per-limb weight blocks stay resident in
    # VMEM across the whole batch (Pallas skips refetch on equal indices).
    wd_a = w_a.shape[-2:]
    wd_b = w_b.shape[-2:]
    flops = 2 * B * L * WDIG * n1 * n2 * (wd_a[0] + wd_b[1]
                                          if kernel is _fwd_kernel
                                          else wd_a[1] + wd_b[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # q, comb, comb_shoup live whole in SMEM
        grid=(L, B),
        in_specs=[
            pl.BlockSpec((1, 1) + in_rc, lambda l, b, *_: (b, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WDIG, 1) + wd_a, lambda l, b, *_: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WDIG, 1) + wd_b, lambda l, b, *_: (0, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda l, b, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, n2), lambda l, b, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1) + out_rc, lambda l, b, *_: (b, l, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(kernel, n1, n2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, L) + out_rc, jnp.uint32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(2 * B * L * n * 4 + WDIG * L * 2 * (
                np.prod(wd_a) + np.prod(wd_b))),
            transcendentals=0),
        interpret=interpret,
    )(q1d, comb2d, combs2d, xf, w_a, w_b, tw, tw_s)
    return out.reshape(*lead, L, n)


def fwd(x, t: LimbTables, interpret: bool = False):
    return _call(x, t, _fwd_kernel, t.w2f, t.w1f, t.tf, t.tf_s, interpret)


def inv(x, t: LimbTables, interpret: bool = False):
    return _call(x, t, _inv_kernel, t.w1i, t.w2i, t.ti, t.ti_s, interpret)

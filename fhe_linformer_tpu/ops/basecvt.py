"""Fused Pallas TPU kernel: RNS digit fold + fast base conversion (int8 MXU).

The input-dependent half of hybrid key switching — and its HBM/VPU
bottleneck.  For every hybrid-KS digit j (group of alpha source limbs) and
every target prime p:

    y[j, p, :] = sum_{t in group_j} (x[t] * fold[t] mod q_t) * conv[t, p]
                 mod p

Two fused designs were measured on v5e (2026-08):

  * VPU-direct (per-target-prime Shoup chains): 677 ks/s on the batched
    Galois chain — LOST to the XLA loop (817 ks/s): XLA already fuses the
    fold/convert/accumulate chain into near-optimal HBM passes, and the
    serial u32 mulhi chains are VPU-bound.
  * int8-MXU digit planes (this file): the contraction over source limbs
    runs on the systolic array exactly like ops/ntt_pallas.py — the folded
    operand splits into XDIG8 balanced base-256 s8 planes, the conversion
    matrix is pre-expanded (entries conv*2**(8*e2) mod p, block-diagonal
    over digits) and pre-split into s8 planes, and 4 s8xs8->s32 dots give
    planes P_e with Y = sum_e 2**(8e) P_e.  The combine pairs planes
    (P_0 + 256*P_1 fits s32 exactly) so only TWO lazy Shoup reductions per
    output element remain on the VPU.

Exactness: |digit| <= 128 on both sides, contraction length 4G <= 252 ->
|P_e| <= 128*128*4G < 2**24, s32-exact in the MXU accumulator; the paired
combine bound is documented at the bias table (ckks/context.py).

Covers the DCRTPoly ApproxSwitchCRTBasis work OpenFHE performs inside
every EvalMult/EvalRotate the reference issues
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
from .ntt import XDIG8
from .ntt_pallas import _digits_i8

_TILE = 1024      # lanes per grid program


def _kernel(nd, tgt, interpret, prefolded, x_ref, fold_ref, fold_s_ref,
            gq_ref, convp_ref, bias_ref, sh1_ref, p16_ref, p16_s_ref,
            qrow_ref, out_ref):
    """One program: (G, nt) input tile -> (nd, tgt, nt) output tile."""
    x = x_ref[0]                                         # (G, nt)
    # prefolded: the caller already computed w = x*fold mod q (e.g. the
    # mod-down, which needs w for its overflow estimate anyway) — don't
    # fold twice (ADVICE r3)
    w = x if prefolded else \
        ma.shoup_mulmod(x, fold_ref[...], fold_s_ref[...], gq_ref[...])
    wd = _digits_i8(w, 0)                                # (XDIG8*G, nt) s8
    if interpret:                                        # XLA:CPU: s32 dot
        wd = wd.astype(jnp.int32)
    planes = [
        jax.lax.dot_general(
            convp_ref[e].astype(jnp.int32) if interpret else convp_ref[e],
            wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        for e in range(XDIG8)]                           # (R, nt) s32 each
    p01 = planes[0] + (planes[1] << 8)
    p23 = planes[2] + (planes[3] << 8)
    x01 = p01.astype(jnp.uint32) + bias_ref[...]         # exact mod 2**32
    x23 = p23.astype(jnp.uint32) + bias_ref[...]
    q = qrow_ref[...]
    lo = ma.shoup_mulmod(x01, jnp.ones_like(q), sh1_ref[...], q)
    hi = ma.shoup_mulmod(x23, p16_ref[...], p16_s_ref[...], q)
    y = ma.addmod(lo, hi, q)                             # (R, nt)
    out_ref[0] = y.reshape(nd, tgt, y.shape[-1])


def base_convert(x, bc, interpret: bool = False, prefolded: bool = False):
    """x: (..., G, N) u32 with G = bc.nd * alpha (zero-padded rows allowed).
    bc: ckks.context.BCTables.  Returns (nd, ..., tgt, N) u32.
    prefolded=True: x is already the folded operand w = x*fold mod q."""
    lead = x.shape[:-2]
    G, n = x.shape[-2], x.shape[-1]
    nd = bc.nd
    R = bc.q_row.shape[0]
    tgt = R // nd
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    xf = x.reshape(B, G, n)
    nt = min(n, _TILE)
    assert n % nt == 0

    grid = (B, n // nt)
    full = lambda shape: pl.BlockSpec(shape, lambda b, c: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    row = full((G, 1))
    rrow = full((R, 1))
    out = pl.pallas_call(
        functools.partial(_kernel, nd, tgt, interpret, prefolded),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, nt), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            row, row, row,
            full((XDIG8, R, XDIG8 * G)),
            rrow, rrow, rrow, rrow, rrow,
        ],
        out_specs=pl.BlockSpec((1, nd, tgt, nt), lambda b, c: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nd, tgt, n), jnp.uint32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * B * n * XDIG8 * R * XDIG8 * G),
            bytes_accessed=int(4 * B * n * (G + nd * tgt)),
            transcendentals=0),
        interpret=interpret,
    )(xf, bc.fold, bc.fold_s, bc.gq, bc.convp, bc.bias, bc.sh1,
      bc.p16, bc.p16_s, bc.q_row)
    return jnp.moveaxis(out, 1, 0).reshape((nd,) + lead + (tgt, n))


def use_pallas() -> bool:
    """Real-TPU default; FHE_BASECVT_PALLAS=0 forces the XLA loop."""
    import os
    return (jax.default_backend() == "tpu"
            and os.environ.get("FHE_BASECVT_PALLAS", "1") != "0")

"""Fused Pallas TPU kernel: RNS digit fold + fast base conversion.

The input-dependent half of hybrid key switching — and its HBM bottleneck.
For every hybrid-KS digit j (group of alpha source limbs) and every target
prime p:

    y[j, p, :] = sum_{t in group_j} (x[t] * fold[t] mod q_t) * conv[t, p]
                 mod p

The XLA path (evaluator._ks_decompose / _mod_down loops) materializes a
full (tgt, N) intermediate in HBM per source limb — O(G * tgt * N) traffic
that dominates the key switch once the NTT itself is Pallas-fused.  This
kernel reads each input limb exactly once and writes each output limb
exactly once; the whole fold/convert/accumulate chain lives in VMEM.

All digit groups convert in one launch: rows are zero-padded to
nd * alpha, padded rows carry fold = conv = 0 so they contribute nothing
(shoup_mulmod(x, 0, 0, q) == 0).

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

_TILE = 2048      # lanes per grid program (VMEM: ~(G + nd*tgt) * TILE * 4B)


def _kernel(nd, alpha, tgt, q_ref, x_ref, fold_ref, fold_s_ref, gq_ref,
            conv_ref, conv_s_ref, out_ref):
    """One program: (G, nt) input tile -> (nd, tgt, nt) output tile."""
    x = x_ref[0]                                         # (G, nt)
    w = ma.shoup_mulmod(x, fold_ref[...], fold_s_ref[...], gq_ref[...])
    cols = []
    for p in range(tgt):
        qp = q_ref[p]
        t = ma.shoup_mulmod(w, conv_ref[:, p: p + 1],
                            conv_s_ref[:, p: p + 1], qp)  # (G, nt)
        accs = []
        for j in range(nd):                 # contiguous sublane slices only
            tj = t[j * alpha: (j + 1) * alpha]
            a = tj[0:1]
            for i in range(1, alpha):
                a = ma.addmod(a, tj[i: i + 1], qp)
            accs.append(a)                                # (1, nt)
        cols.append(jnp.concatenate(accs, 0))             # (nd, nt)
    out_ref[0] = jnp.stack(cols, axis=1)                  # (nd, tgt, nt)


def base_convert(x, fold, fold_s, gq, conv, conv_s, q_tgt, nd: int,
                 interpret: bool = False):
    """x: (..., G, N) u32 with G = nd * alpha (zero-padded rows allowed).

    fold/fold_s/gq: (G, 1) u32 — per-source-limb fold constant, its Shoup
    companion, and the source prime.  conv/conv_s: (G, tgt) u32 — per
    (source, target) conversion constants (0 on padded rows).  q_tgt:
    (tgt,) u32.  Returns (nd, ..., tgt, N) u32.
    """
    lead = x.shape[:-2]
    G, n = x.shape[-2], x.shape[-1]
    tgt = conv.shape[-1]
    assert G % nd == 0
    alpha = G // nd
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    xf = x.reshape(B, G, n)
    nt = min(n, _TILE)
    assert n % nt == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                  # q_tgt rides in SMEM
        grid=(B, n // nt),
        in_specs=[
            pl.BlockSpec((1, G, nt), lambda b, c, *_: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda b, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda b, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda b, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tgt), lambda b, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tgt), lambda b, c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nd, tgt, nt), lambda b, c, *_: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nd, alpha, tgt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nd, tgt, n), jnp.uint32),
        cost_estimate=pl.CostEstimate(
            flops=int(16 * B * G * tgt * n),
            bytes_accessed=int(4 * B * n * (G + nd * tgt)),
            transcendentals=0),
        interpret=interpret,
    )(q_tgt, xf, fold, fold_s, gq, conv, conv_s)
    return jnp.moveaxis(out, 1, 0).reshape((nd,) + lead + (tgt, n))


def use_pallas() -> bool:
    """Opt-in (FHE_BASECVT_PALLAS=1, real TPU only).  Measured 2026-08 on
    v5e: this VPU-direct kernel runs the batched Galois chain at 677 ks/s
    vs 817 ks/s for the XLA loop — XLA already fuses the per-limb
    fold/convert/accumulate into near-optimal HBM passes, and the kernel's
    serial per-target-prime shoup chain is VPU-bound.  Kept for A/B and as
    the substrate for an MXU digit-plane variant."""
    import os
    return (jax.default_backend() == "tpu"
            and os.environ.get("FHE_BASECVT_PALLAS", "0") == "1")

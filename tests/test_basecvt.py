"""Fused base-conversion Pallas kernel == the XLA decompose/mod-down loops,
bit-exact.  Interpret mode on CPU (TPU compile is exercised by bench.py).

The oracle is the evaluator's own XLA path (shoup fold + per-limb
fast-base-conversion accumulate), run on a small ring so both key-switch
directions (Q_l -> Q_l+P digits, P -> Q_l mod-down) are covered at several
levels, including a partially-filled last digit group.
"""

import numpy as np
import jax.numpy as jnp

from fhe_linformer_tpu.ckks import CKKSConfig, Context
from fhe_linformer_tpu.ops import modarith as ma
from fhe_linformer_tpu.ops import basecvt

CFG = CKKSConfig(n=1 << 11, scale_bits=26, num_scaling=7, dnum=3)


def _xla_decompose(cx, ks):
    ys = []
    for dg in ks.digits:
        g = dg.group
        lo = g[0]
        w = ma.shoup_mulmod(cx[..., lo: lo + len(g), :],
                            dg.fold, dg.fold_s, dg.gq)
        y = None
        for ti in range(len(g)):
            term = ma.shoup_mulmod(w[..., ti: ti + 1, :],
                                   dg.conv[ti], dg.conv_s[ti], ks.q_tgt)
            y = term if y is None else ma.addmod(y, term, ks.q_tgt)
        ys.append(y)
    return np.asarray(jnp.stack(ys))


def _pallas_decompose(cx, ks):
    G = ks.bc.fold.shape[0]
    nl = cx.shape[-2]
    pad = G - nl
    xp = cx if not pad else jnp.concatenate(
        [cx, jnp.zeros(cx.shape[:-2] + (pad,) + cx.shape[-1:],
                       jnp.uint32)], axis=-2)
    return np.asarray(basecvt.base_convert(xp, ks.bc, interpret=True))


def test_decompose_matches_xla_all_levels():
    ctx = Context(CFG)
    rng = np.random.default_rng(3)
    for nl in (ctx.num_q, ctx.num_q - 1, 4, 2, 1):
        ks = ctx.ks_tables(nl)
        qs = np.asarray([ctx.basis[i] for i in ctx.limb_idx(nl)])
        cx = jnp.asarray(np.stack(
            [[rng.integers(0, q, CFG.n, dtype=np.uint32) for q in qs]
             for _ in range(2)]))
        np.testing.assert_array_equal(_pallas_decompose(cx, ks),
                                      _xla_decompose(cx, ks))


def test_moddown_convert_matches_xla():
    ctx = Context(CFG)
    rng = np.random.default_rng(5)
    nl = ctx.num_q - 2
    ks = ctx.ks_tables(nl)
    ps = np.asarray(ctx.ps)
    vp = jnp.asarray(np.stack(
        [[rng.integers(0, p, CFG.n, dtype=np.uint32) for p in ps]
         for _ in range(2)]))
    w = ma.shoup_mulmod(vp, ks.pfold, ks.pfold_s, ks.q_sp)
    y = None
    for ti in range(w.shape[-2]):
        term = ma.shoup_mulmod(w[..., ti: ti + 1, :], ks.pconv[ti],
                               ks.pconv_s[ti], ks.q_act)
        y = term if y is None else ma.addmod(y, term, ks.q_act)
    got = basecvt.base_convert(vp, ks.md, interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(y))

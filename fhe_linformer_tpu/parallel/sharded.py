"""Sharded CKKS execution: limb/batch-parallel kernels over a device mesh.

Design (no reference counterpart — SURVEY.md §2.5):
  * eval-domain elementwise ops and the NTT shard trivially over (dp, limb):
    the four-step NTT contracts only within one limb's N coefficients, so
    limb sharding is communication-free;
  * fast base conversion (the only cross-limb op) reduces limb-partial
    sums with ONE lazy u32 psum per digit: each local term is Shoup-reduced
    to [0, q), so a sum over a digit group of g <= 4 limbs stays < 2**32
    and the final modular fold is local — collectives ride ICI only at
    digit boundaries (the BASELINE.json north-star layout).

`make_attention_step` builds the dry-run workload: a shard_mapped slice of
the encrypted data path (NTT -> ct x pt modmul -> cross-limb base-convert
psum -> iNTT) over a (dp x limb) mesh on tiny shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import modarith as ma
from ..ops.ntt import NttContext, LimbTables, _fwd as ntt_fwd, _inv as ntt_inv
from ..primes import ntt_primes


def _shard_tables(tables: LimbTables, nshard: int, axis_name: str) -> LimbTables:
    """Slice the limb rows of replicated NTT tables for this shard (inside
    shard_map, using the device's position on `axis_name`)."""
    idx = jax.lax.axis_index(axis_name)
    per = len(tables.qs_key) // nshard
    sl = lambda a, ax: jax.lax.dynamic_slice_in_dim(a, idx * per, per, ax)
    return LimbTables(
        n=tables.n, n1=tables.n1, n2=tables.n2, qs_key=tables.qs_key[:per],
        q=sl(tables.q, 0),
        w2f=sl(tables.w2f, 1), w1f=sl(tables.w1f, 1), tf=sl(tables.tf, 0),
        tf_s=sl(tables.tf_s, 0), w1i=sl(tables.w1i, 1), ti=sl(tables.ti, 0),
        ti_s=sl(tables.ti_s, 0), w2i=sl(tables.w2i, 1),
        comb_c=sl(tables.comb_c, 1), comb_s=sl(tables.comb_s, 1),
        w2f8=sl(tables.w2f8, 1), w1f8=sl(tables.w1f8, 1),
        w1i8=sl(tables.w1i8, 1), w2i8=sl(tables.w2i8, 1),
    )


def make_attention_step(mesh: Mesh, n: int = 512):
    """Jitted SPMD step for the multichip dry-run: activations (B, L, N)
    sharded (dp, limb, -); weights/constants limb-sharded; one psum."""
    n_limb = mesh.shape["limb"]
    assert n_limb <= 4, "lazy psum exactness bound: digit groups <= 4 limbs"
    qs = ntt_primes(2 * n, n_limb)
    ntt = NttContext(n, qs)
    tables = ntt.full
    qcol = np.asarray(qs, np.int64).reshape(-1, 1)
    mus, shs = [], []
    for q in qs:
        _, mu, sh = ma.barrett_params(q)
        mus.append(mu)
        shs.append(sh)
    consts = dict(
        q=jnp.asarray(qcol.astype(np.uint32)),
        mu=jnp.asarray(np.asarray(mus, np.int64).reshape(-1, 1).astype(np.uint32)),
        sh=jnp.asarray(np.asarray(shs, np.int64).reshape(-1, 1).astype(np.uint32)),
        # base-conversion constants: (Qhat/q_t) mod q0, Shoup vs target q0
        conv=jnp.asarray(((qcol // 3) % qs[0]).astype(np.uint32)),
        conv_s=jnp.asarray(ma.shoup_precompute((qcol // 3) % qs[0],
                                               np.full_like(qcol, qs[0]))),
        q0=jnp.asarray(np.full((1, 1), qs[0], np.uint32)),
    )

    def local(x_l, wt_l, q_l, mu_l, sh_l, conv_l, conv_s_l, q0):
        tbl = _shard_tables(tables, n_limb, "limb")
        y = ntt_fwd(x_l, tbl)                                 # limb-local
        y = ma.barrett_mulmod(y, wt_l, q_l, mu_l, sh_l)       # ct x pt
        z = ntt_inv(y, tbl)
        # cross-limb digit reduction: one lazy psum, exact for <= 4 limbs
        w = z[0]                                              # (L_loc, N)
        term = ma.shoup_mulmod(w, conv_l, conv_s_l, q0)       # < q0 each
        part = jnp.sum(term, axis=0, keepdims=True,
                       dtype=jnp.uint32)                      # local limbs
        total = jax.lax.psum(part, "limb")                    # < 4*q0 < 2**32
        for _ in range(3):
            total = jnp.where(total >= q0, total - q0, total)
        return z, total

    sm = shard_map(
        local, mesh=mesh,
        in_specs=(P("dp", "limb", None), P("limb", None), P("limb", None),
                  P("limb", None), P("limb", None), P("limb", None),
                  P("limb", None), P()),
        out_specs=(P("dp", "limb", None), P(None, None)),
        check_rep=False,
    )

    @jax.jit
    def step(x, wt):
        return sm(x, wt, consts["q"], consts["mu"], consts["sh"],
                  consts["conv"], consts["conv_s"], consts["q0"])

    return ntt, consts, step

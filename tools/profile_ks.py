"""Per-stage timing of the batched Galois key switch on the real TPU.

Chained-jit timing per stage (see bench.py note: single dispatches measure
the tunnel, not the chip).  Stages:

  permute   : 2x eval-domain gather (c0, c1)
  intt      : iNTT of c1 over nl active limbs
  decompose : fold + fast base conversion (Pallas or XLA by env)
  nttdig    : NTT of the digit stack (nd, B, tgt, N)
  apply     : inner products vs key digits + digit-sum
  moddown   : 2x (iNTT specials + convert + NTT + correct)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.ckks.evaluator import (_ks_decompose, _ks_apply,
                                              _mod_down, _ntt_fwd, _ntt_inv)
from fhe_linformer_tpu.ops import modarith as ma

RING = 1 << 15
LIMBS = 24
KSB = 8


def timed(name, fn, x, k=8, iters=6):
    @jax.jit
    def c1(a):
        return jax.lax.fori_loop(0, 1, lambda i, v: fn(v), a)

    @jax.jit
    def ck(a):
        return jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)

    for c in (c1, ck):
        jax.block_until_ready(c(x))
    ts = []
    for c in (c1, ck):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = c(x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    dt = max((ts[1] - ts[0]) / (k - 1), 1e-9)
    print(f"{name:10s} {dt*1e3:8.3f} ms/step  ({ts[0]*1e3:.1f} -> {ts[1]*1e3:.1f})",
          flush=True)
    return dt


def main():
    cfg = CKKSConfig(n=RING, scale_bits=26, num_scaling=LIMBS - 1, dnum=4)
    ctx = Context(cfg)
    keys = generate_keys(ctx, rotations=(1,))
    ev = Evaluator(ctx, keys)
    rng = np.random.default_rng(0)
    ct = ev.encrypt(rng.uniform(-1, 1, (KSB, cfg.slots)), batch=True)
    nl = ct.nl
    ks = ctx.ks_tables(nl)
    kb, ka = ev._sliced_key(keys.rot[1], nl)
    perm = jnp.asarray(ctx.galois_perm(ctx.galois_t(1)))

    c1 = ct.c1
    r1_coeff = _ntt_inv(c1, ks.t_act)
    y_e = _ks_decompose(r1_coeff, ks)
    nd = y_e.shape[0]
    kbn = kb[:nd].reshape((nd, 1) + kb.shape[1:])
    kan = ka[:nd].reshape((nd, 1) + ka.shape[1:])
    raw = ma.barrett_mulmod(y_e, kbn, ks.q_tgt, ks.mu_tgt, ks.sh_tgt)
    acc = raw[0]
    for j in range(1, nd):
        acc = ma.addmod(acc, raw[j], ks.q_tgt)

    def dec_fold(v):
        # loop-carried shape must equal input's: fold the (nd, B, tgt, N)
        # digit stack back to (B, nl, N) while keeping EVERY output element
        # live (plain u32 adds; wraparound irrelevant for timing).
        # cx_eval=v is shape-compatible (eval arg only feeds own-group rows)
        # so the own-skip path is exercised as in production.
        y = _ks_decompose(v, ks, cx_eval=v)
        s = y[0]
        for j in range(1, y.shape[0]):
            s = s + y[j]
        z = s[..., :v.shape[-2], :]
        rest = s[..., v.shape[-2]:, :]
        return z.at[..., : rest.shape[-2], :].add(rest)

    def md_fold(v):
        out = _mod_down(v, ks)                 # (B, nl, N)
        return jnp.concatenate([out, v[..., out.shape[-2]:, :]], axis=-2)

    from fhe_linformer_tpu.ckks.evaluator import _apply_gperm
    gp = ctx.galois_perm_factored(ctx.galois_t(1))

    total = 0.0
    timed("permute/flat", lambda v: jnp.take(v, perm, axis=-1), c1)
    total += 2 * timed("permute", lambda v: _apply_gperm(v, gp), c1)
    total += timed("intt", lambda v: _ntt_inv(v, ks.t_act), c1)
    total += timed("decompose", dec_fold, r1_coeff)   # includes digit NTT
    timed("nttdig", lambda v: _ntt_fwd(v, ks.t_tgt), y_e)  # info only
    # (not added: the decompose stage above already contains the digit NTT)
    total += timed("apply2", lambda v: _app2(v, kbn, kan, ks), y_e)
    total += 2 * timed("moddown", md_fold, acc)
    print(f"sum {total*1e3:8.3f} ms per batched-{KSB} galois "
          f"(-> {KSB/total:.0f} ks/s)", flush=True)


def _app2(y_e, kbn, kan, ks):
    """Both inner products + digit reduction (shapes preserved via sum)."""
    t0 = ma.barrett_mulmod(y_e, kbn, ks.q_tgt, ks.mu_tgt, ks.sh_tgt)
    t1 = ma.barrett_mulmod(y_e, kan, ks.q_tgt, ks.mu_tgt, ks.sh_tgt)
    a0, a1 = t0[0], t1[0]
    for j in range(1, t0.shape[0]):
        a0 = ma.addmod(a0, t0[j], ks.q_tgt)
        a1 = ma.addmod(a1, t1[j], ks.q_tgt)
    # keep loop-carried shape: fold the results back into y_e's dtype/shape
    return y_e.at[0].set(a0).at[1].set(a1)


if __name__ == "__main__":
    import os
    print("FHE_BASECVT_PALLAS =", os.environ.get("FHE_BASECVT_PALLAS", "1"))
    main()

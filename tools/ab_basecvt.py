"""A/B the fused base-conversion Pallas kernel vs the XLA loop, one process.

Times the full batched Galois key-switch chain both ways back-to-back so
tunnel/device drift between runs cancels."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.ckks import evaluator as ev_mod
from fhe_linformer_tpu.ops import basecvt

RING = 1 << 15
LIMBS = 24
KSB = 8


def time_chain(fn, args, k, iters=6):
    @jax.jit
    def chain(c0, c1):
        return jax.lax.fori_loop(0, k, lambda i, c: fn(c[0], c[1]), (c0, c1))
    out = chain(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chain(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = CKKSConfig(n=RING, scale_bits=26, num_scaling=LIMBS - 1, dnum=4)
    ctx = Context(cfg)
    keys = generate_keys(ctx, rotations=(1,))
    ev = Evaluator(ctx, keys)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, (KSB, cfg.slots))
    ct = ev.encrypt(z, batch=True)
    nl = ct.nl
    ks_t = ctx.ks_tables(nl)
    kb, ka = ev._sliced_key(keys.rot[1], nl)
    perm = ctx.galois_perm_factored(ctx.galois_t(1))

    import os
    for flag in ("1", "0"):
        os.environ["FHE_BASECVT_PALLAS"] = flag

        def rot(c0, c1, _f=flag):
            return ev_mod._galois_core.__wrapped__(c0, c1, perm, kb, ka, ks_t)

        rotj = jax.jit(rot)
        t1 = time_chain(rotj, (ct.c0, ct.c1), 1)
        t9 = time_chain(rotj, (ct.c0, ct.c1), 9)
        per_ct = max((t9 - t1) / 8, 1e-9) / KSB
        print(f"FHE_BASECVT_PALLAS={flag}: {per_ct*1e3:.3f} ms/ct "
              f"({1/per_ct:.0f} ks/s), t1={t1*1e3:.1f}ms t9={t9*1e3:.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()

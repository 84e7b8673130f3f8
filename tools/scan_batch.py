"""Key-switch throughput vs ciphertext batch size, honest wide-chain timing.

Wide chains (k=1 vs k=9) + median-of-iters: the tunneled device adds a
5-35 ms per-process-variable dispatch cost; only marginal steps count."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.ckks.evaluator import _galois_core
from fhe_linformer_tpu.ops.ntt import NttContext
from fhe_linformer_tpu.primes import ntt_primes

RING = 1 << 15
LIMBS = 24


def marginal(build, k_lo=1, k_hi=9, iters=5):
    lo, hi = build(k_lo), build(k_hi)
    ts = {}
    for name, fn in (("lo", lo), ("hi", hi)):
        jax.block_until_ready(fn())
        best = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best.append(time.perf_counter() - t0)
        ts[name] = sorted(best)[len(best) // 2]
    return max((ts["hi"] - ts["lo"]) / (k_hi - k_lo), 1e-9)


def main():
    cfg = CKKSConfig(n=RING, scale_bits=26, num_scaling=LIMBS - 1, dnum=4)
    ctx = Context(cfg)
    keys = generate_keys(ctx, rotations=(1,))
    ev = Evaluator(ctx, keys)
    rng = np.random.default_rng(0)
    for KSB in (4, 8, 16, 32):
        ct = ev.encrypt(rng.uniform(-1, 1, (KSB, cfg.slots)), batch=True)
        nl = ct.nl
        ks_t = ctx.ks_tables(nl)
        kb, ka = ev._sliced_key(keys.rot[1], nl)
        perm = ctx.galois_perm_factored(ctx.galois_t(1))

        def build(k, c0=ct.c0, c1=ct.c1):
            @jax.jit
            def f(a0, a1):
                return jax.lax.fori_loop(
                    0, k, lambda i, c: _galois_core(c[0], c[1], perm,
                                                    kb, ka, ks_t), (a0, a1))
            return lambda: f(c0, c1)

        dt = marginal(build)
        print(f"KSB={KSB:3d}: {dt/KSB*1e3:7.3f} ms/ct  "
              f"({KSB/dt:7.0f} ks/s)  step={dt*1e3:.2f} ms", flush=True)

    # honest NTT number: wide chain
    qs = ntt_primes(2 * RING, LIMBS)
    ntt = NttContext(RING, qs)
    for B in (8, 32):
        x = jnp.asarray(np.stack(
            [[rng.integers(0, q, RING, dtype=np.uint32) for q in qs]
             for _ in range(B)]))

        def buildn(k, xx=x):
            @jax.jit
            def f(a):
                return jax.lax.fori_loop(0, k, lambda i, v: ntt.fwd(v), a)
            return lambda: f(xx)

        dt = marginal(buildn, 1, 33)
        print(f"NTT B={B:3d}: {B*LIMBS/dt:9.0f} limb-NTT/s "
              f"({dt/(B*LIMBS)*1e6:6.2f} us/limb)", flush=True)


if __name__ == "__main__":
    main()

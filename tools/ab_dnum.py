"""A/B the hybrid key-switch digit count (dnum) at fixed nl=24 active limbs.

Work scales like nd*(nl+k_sp) digit-NTT rows + (nl+k_sp)-wide inner
products + k_sp-limb mod-down, with k_sp = alpha = ceil((num_scaling+1)/
dnum) special primes.  Smaller dnum => fewer digits but wider basis and
bigger keys; the reference fixes dnum=4 (NumLargeDigits,
FHEController.cpp:11) — here the knob is measured, not inherited.

Chained-marginal timing as in bench.py.  Run with
PYTHONPATH=/root/.axon_site:/root/repo.
"""

import time

import numpy as np
import jax

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.ckks.evaluator import _galois_core

RING = 1 << 15
LIMBS = 24
KSB = 4


def marginal(build, k_lo=1, k_hi=17, iters=7):
    ts = {}
    for k in (k_lo, k_hi):
        fn = build(k)
        jax.block_until_ready(fn())
        best = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best.append(time.perf_counter() - t0)
        ts[k] = min(best)
    return max((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), 1e-9)


def main():
    rng = np.random.default_rng(0)
    for dnum in (4, 2, 3, 6):
        cfg = CKKSConfig(n=RING, scale_bits=26, num_scaling=LIMBS - 1,
                         dnum=dnum)
        ctx = Context(cfg)
        keys = generate_keys(ctx, rotations=(1,))
        ev = Evaluator(ctx, keys)
        ct = ev.encrypt(rng.uniform(-1, 1, (KSB, cfg.slots)), batch=True)
        nl = ct.nl
        ks = ctx.ks_tables(nl)
        kb, ka = ev._sliced_key(keys.rot[1], nl)
        gp = ctx.galois_perm_factored(ctx.galois_t(1))

        def build(k):
            @jax.jit
            def f(c0, c1):
                return jax.lax.fori_loop(
                    0, k, lambda i, c: _galois_core(c[0], c[1], gp,
                                                    kb, ka, ks), (c0, c1))
            return lambda: f(ct.c0, ct.c1)

        # decrypt parity of the rotation at this dnum (noise grows ~2x
        # per dnum halving at this scale -- reported, not asserted)
        z0 = np.linspace(-1, 1, cfg.slots)
        err = np.max(np.abs(np.real(ev.decrypt(ev.rotate(ev.encrypt(z0), 1)))
                            - np.roll(z0, -1)))
        dt = marginal(build)
        key_mb = np.asarray(keys.rot[1].b).nbytes * 2 / 1e6
        print(f"dnum={dnum}  alpha={ctx.alpha}  k_sp={ctx.k_sp}  "
              f"rows={len(ks.digits)}x{nl + ctx.k_sp}  "
              f"{dt / KSB * 1e3:7.3f} ms/ct  ({KSB / dt:6.0f} ks/s)  "
              f"key {key_mb:.0f} MB  parity_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark entry: prints ONE JSON line for the driver.

Headline metric: **key-switches per second per chip** on the real TPU —
the named north-star metric (BASELINE.md): every homomorphic mult and
rotation bottoms out in one hybrid key switch, so it fixes the cost of the
whole encrypted Linformer layer.  Falls back to NTT throughput if the
key-switch path cannot be timed inside the budget.

vs_baseline: the reference publishes no numbers (BASELINE.md
"published": {}), so the comparator is a single-thread CPU NTT of the same
transform on this host — the hardware class the reference runs on.

Extra metrics (NTT/s, latencies) are written to bench_details.json.
"""

import json
import os
import sys
import time

import numpy as np

RING = 1 << 15
LIMBS = 24
BATCH = 8


def time_op(fn, *args, iters=10):
    out = fn(*args)
    _block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / iters


def _block(x):
    import jax
    if hasattr(x, "c0"):
        x = (x.c0, x.c1)
    for leaf in jax.tree_util.tree_leaves(x):
        leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp
    from fhe_linformer_tpu.primes import ntt_primes
    from fhe_linformer_tpu.ops.ntt import NttContext
    from fhe_linformer_tpu.reference import NttPlan

    details = {"device": str(jax.devices()[0])}

    # --- NTT throughput -------------------------------------------------
    qs = ntt_primes(2 * RING, LIMBS)
    ntt = NttContext(RING, qs)
    rng = np.random.default_rng(0)
    x = np.stack([[rng.integers(0, q, RING, dtype=np.uint32) for q in qs]
                  for _ in range(BATCH)])
    xj = jnp.asarray(x)
    out = ntt.fwd(xj)
    out.block_until_ready()
    plan = NttPlan(RING, qs[0])
    np.testing.assert_array_equal(np.asarray(out)[0, 0], plan.fwd(x[0, 0]))
    # chained timing: the dev-tunnel device costs ~1-5 ms per dispatch
    # (production TPU dispatch is ~50 us), so single-call timings measure
    # the tunnel, not the chip.  Chain k transforms inside ONE jit and use
    # (t_k - t_1)/(k - 1): pure on-device throughput.
    import jax

    def chained(f, k):
        # fori_loop: the body compiles ONCE regardless of k (unrolled
        # chains overwhelm the remote compiler), sequential dependency
        # still forces k real executions on device.
        @jax.jit
        def g(a):
            return jax.lax.fori_loop(0, k, lambda i, x: f(x), a)
        return g

    f1, f5 = chained(ntt.fwd, 1), chained(ntt.fwd, 5)
    t1 = time_op(f1, xj, iters=10)
    t5 = time_op(f5, xj, iters=10)
    dt = max((t5 - t1) / 4, 1e-9)
    ntts_per_s = BATCH * LIMBS / dt
    details["ntt_limb_transforms_per_s"] = round(ntts_per_s, 1)
    details["ntt_single_call_ms"] = round(t1 * 1e3, 3)

    t0 = time.perf_counter()
    plan.fwd(x[0, 0])
    cpu_ntts_per_s = 1.0 / (time.perf_counter() - t0)
    details["cpu_ntt_per_s"] = round(cpu_ntts_per_s, 2)

    # --- key switches per second ---------------------------------------
    metric = {
        "metric": "negacyclic_ntt_2^15_limb_transforms_per_s",
        "value": round(ntts_per_s, 1),
        "unit": "NTT/s",
        "vs_baseline": round(ntts_per_s / cpu_ntts_per_s, 1),
    }
    try:
        from fhe_linformer_tpu.ckks import (CKKSConfig, Context, Evaluator,
                                            generate_keys)
        cfg = CKKSConfig(n=RING, scale_bits=26, num_scaling=LIMBS - 1, dnum=4)
        ctx = Context(cfg)
        keys = generate_keys(ctx, rotations=(1,))
        ev = Evaluator(ctx, keys)
        KSB = 8                              # ciphertexts per batched call
        z = rng.uniform(-1, 1, (KSB, cfg.slots))
        ct = ev.encrypt(z, batch=True)
        # chained rotations inside one jit (see NTT note above): this is
        # the production shape — the circuit issues long sequences of
        # batched Galois/keyswitch ops from rotsum/interleave trees.
        from fhe_linformer_tpu.ckks.evaluator import _galois_core
        nl = ct.nl
        ks_t = ctx.ks_tables(nl)
        kb, ka = ev._sliced_key(keys.rot[1], nl)
        perm = jnp.asarray(ctx.galois_perm(ctx.galois_t(1)))

        def rot_chain(k):
            @jax.jit
            def f(c0, c1):
                return jax.lax.fori_loop(
                    0, k, lambda i, c: _galois_core(c[0], c[1], perm,
                                                    kb, ka, ks_t), (c0, c1))
            return f

        r1, r5 = rot_chain(1), rot_chain(5)
        tr1 = time_op(lambda: r1(ct.c0, ct.c1), iters=5)
        tr5 = time_op(lambda: r5(ct.c0, ct.c1), iters=5)
        dt_ks = max((tr5 - tr1) / 4, 1e-9) / KSB        # per ciphertext
        ks_per_s = 1.0 / dt_ks
        details["keyswitch_per_s_per_chip"] = round(ks_per_s, 1)
        details["keyswitch_batch"] = KSB
        details["keyswitch_single_call_ms_batched"] = round(tr1 * 1e3, 3)
        from fhe_linformer_tpu.ckks.evaluator import _mul_relin_core

        def mul_chain(k):
            @jax.jit
            def f(c0, c1):
                return jax.lax.fori_loop(
                    0, k, lambda i, c: _mul_relin_core(c[0], c[1], c[0], c[1],
                                                       rkb, rka, ks_t),
                    (c0, c1))
            return f

        rkb, rka = ev._sliced_key(keys.relin, nl)
        m1, m9 = mul_chain(1), mul_chain(9)
        tm1 = time_op(lambda: m1(ct.c0, ct.c1), iters=8)
        tm9 = time_op(lambda: m9(ct.c0, ct.c1), iters=8)
        details["ctct_mult_relin_ms_per_ct"] = round(
            max((tm9 - tm1) / 8, 1e-9) / KSB * 1e3, 4)
        # CPU baseline for a key switch ~ 2*(LIMBS+k) limb NTTs equivalent
        cpu_ks_per_s = cpu_ntts_per_s / (2.5 * (ctx.num_q + ctx.k_sp))
        metric = {
            "metric": "hybrid_keyswitches_per_s_per_chip_2^15",
            "value": round(ks_per_s, 1),
            "unit": "keyswitch/s",
            "vs_baseline": round(ks_per_s / cpu_ks_per_s, 1),
        }
    except Exception as e:  # pragma: no cover — keep the headline printable
        details["keyswitch_error"] = repr(e)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_details.json"), "w") as f:
        json.dump(details, f, indent=1)
    print(json.dumps(metric))


if __name__ == "__main__":
    main()

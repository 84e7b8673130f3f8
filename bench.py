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
    dt = time_op(ntt.fwd, xj, iters=20)
    ntts_per_s = BATCH * LIMBS / dt
    details["ntt_limb_transforms_per_s"] = round(ntts_per_s, 1)

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
        z = rng.uniform(-1, 1, (4, cfg.slots))
        ct = ev.encrypt(z, batch=True)
        rot = lambda: ev.rotate(ct, 1)
        r = rot()
        _block((r.c0, r.c1))
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            r = rot()
        _block((r.c0, r.c1))
        dt_ks = (time.perf_counter() - t0) / iters / 4   # per ciphertext
        ks_per_s = 1.0 / dt_ks
        details["keyswitch_per_s_per_chip"] = round(ks_per_s, 1)
        details["keyswitch_latency_ms_batched4"] = round(dt_ks * 4e3, 3)
        mul = ev.mul(ct, ct)
        _block((mul.c0, mul.c1))
        dt_mul = time_op(lambda: ev.mul(ct, ct), iters=5)
        details["ctct_mult_relin_latency_ms_batched4"] = round(dt_mul * 1e3, 3)
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

"""Benchmark entry: prints ONE JSON line for the driver.

Headline metric (round 1): full-basis negacyclic NTT throughput on the
real chip — the op every homomorphic mult/rotation/bootstrap bottoms out
in (SURVEY.md §6: NTT ops/s is a named north-star metric; key-switches/s
and full-layer latency get added as those paths land on-chip).

vs_baseline: the reference publishes no numbers (BASELINE.md) — we compare
against a single-thread CPU NTT of the same transform (this host), the
hardware class the reference runs on.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fhe_linformer_tpu.primes import ntt_primes
    from fhe_linformer_tpu.ops.ntt import NttContext
    from fhe_linformer_tpu.reference import NttPlan

    n = 1 << 15                      # the reference ring (2**15)
    L = 24                           # a working-depth limb count
    B = 8                            # ciphertext component batch
    qs = ntt_primes(2 * n, L)
    ntt = NttContext(n, qs)
    rng = np.random.default_rng(0)
    x = np.stack([[rng.integers(0, q, n, dtype=np.uint32) for q in qs]
                  for _ in range(B)])
    xj = jnp.asarray(x)

    out = ntt.fwd(xj)
    out.block_until_ready()          # compile
    # correctness spot check vs exact CPU reference
    plan = NttPlan(n, qs[0])
    np.testing.assert_array_equal(np.asarray(out)[0, 0], plan.fwd(x[0, 0]))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ntt.fwd(xj)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    ntts_per_s = B * L / dt          # single-limb NTT transforms / s

    # CPU baseline: one limb transform, single thread numpy
    t0 = time.perf_counter()
    plan.fwd(x[0, 0])
    cpu_dt = time.perf_counter() - t0
    cpu_ntts_per_s = 1.0 / cpu_dt

    print(json.dumps({
        "metric": "negacyclic_ntt_2^15_limb_transforms_per_s",
        "value": round(ntts_per_s, 1),
        "unit": "NTT/s",
        "vs_baseline": round(ntts_per_s / cpu_ntts_per_s, 1),
    }))


if __name__ == "__main__":
    main()

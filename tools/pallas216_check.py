"""Ring-2^16 Pallas NTT tile fix: compile + bit-exactness on the real TPU.

Round-4 r128c died in Mosaic with a 16.5M scoped-vmem stack allocation at
ring 2^16 (campaign_r4.json); ops/ntt_pallas.py now halves the batch tile
per ring doubling.  This is the cheap dedicated validation: a fwd/inv
roundtrip at n=2^16 vs the XLA four-step path (bit-exact or fail), so the
kernel-retile claim is TPU-measured, not interpret-mode-only.
Writes pallas216_check.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "pallas216_check.json")


def main(batch=6, limbs=2):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_tpu_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from fhe_linformer_tpu.primes import ntt_primes
    from fhe_linformer_tpu.ops.ntt import NttContext, _fwd, _inv
    from fhe_linformer_tpu.ops import ntt_pallas

    n = 1 << 16
    qs = ntt_primes(2 * n, limbs)
    ntt = NttContext(n, qs)
    rng = np.random.default_rng(11)
    x = jnp.asarray(np.stack(
        [[rng.integers(0, q, n, dtype=np.uint32) for q in qs]
         for _ in range(batch)]))
    results = {"n": n, "batch": batch, "limbs": limbs}

    t0 = time.time()
    got_f = ntt_pallas.fwd(x, ntt.full)
    got_f.block_until_ready()
    results["fwd_first_s"] = round(time.time() - t0, 1)
    want_f = _fwd(x, ntt.full)
    results["fwd_bit_exact"] = bool(
        np.array_equal(np.asarray(got_f), np.asarray(want_f)))

    t0 = time.time()
    back = ntt_pallas.inv(got_f, ntt.full)
    back.block_until_ready()
    results["inv_first_s"] = round(time.time() - t0, 1)
    results["roundtrip_bit_exact"] = bool(
        np.array_equal(np.asarray(back), np.asarray(x)))

    # warm rate (one chained call; tunnel dispatch noise caveat applies)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        y = ntt_pallas.fwd(x, ntt.full)
    y.block_until_ready()
    warm = (time.time() - t0) / reps
    results["fwd_warm_s"] = round(warm, 4)
    results["limb_transforms_per_s"] = round(batch * limbs / warm, 1)

    json.dump(results, open(OUT, "w"), indent=1)
    print(json.dumps(results))
    assert results["fwd_bit_exact"] and results["roundtrip_bit_exact"]


if __name__ == "__main__":
    main()

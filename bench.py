"""Benchmark entry: prints ONE JSON line for the driver.

Headline metric: **key-switches per second per chip** on the real TPU —
the named north-star metric (BASELINE.md): every homomorphic mult and
rotation bottoms out in one hybrid key switch, so it fixes the cost of the
whole encrypted Linformer layer.  Falls back to NTT throughput if the
key-switch path cannot be timed inside the budget.

Timing methodology (the tunneled dev TPU adds a 5-35 ms per-dispatch cost
that varies by process, and repeated identical calls can be served
anomalously fast): every number is a MARGINAL — k ops chained inside one
jit via fori_loop vs 1 op, median over iters, (t_k - t_1)/(k - 1).  Chains
are wide enough that the marginal compute dwarfs dispatch noise.

vs_baseline: the reference publishes no numbers (BASELINE.md
"published": {}), so the comparator is a single-thread CPU NTT of the same
transform on this host — the hardware class the reference runs on.

Extra metrics (NTT/s, latencies) are written to bench_details.json.
"""

import json
import os
import time

import numpy as np

RING = 1 << 15
LIMBS = 24
BATCH = 8
KSB = 4          # key-switch throughput peaks at small batches (tools/scan_batch.py)

# Wall-clock budget (s): the driver kills bench.py at its own timeout
# (round 2: rc=124, parsed null — the round had NO perf record).  The
# bench therefore budgets itself: NTT headline first, then the key-switch
# upgrade only while time remains, with adaptive repeats.
BUDGET_S = float(os.environ.get("FHE_BENCH_BUDGET_S", "450"))
_T_START = time.time()


def _left() -> float:
    return BUDGET_S - (time.time() - _T_START)


def _marginal(build, k_lo, k_hi, iters=7):
    """Min wall time of build(k)() per marginal chained step.  Min, not
    median: per-call cost is (true work) + (dispatch jitter >= 0), so the
    min is the tightest consistent estimate on a noisy tunnel."""
    import jax
    ts = {}
    for k in (k_lo, k_hi):
        fn = build(k)
        jax.block_until_ready(fn())          # compile + warm
        best = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best.append(time.perf_counter() - t0)
        ts[k] = min(best)
    return max((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), 1e-9), ts[k_lo]


def main():
    import jax
    # persistent compile cache: the remote (tunneled) compiler's latency is
    # process-variable by up to ~10x; caching keeps repeat bench runs fast
    jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_tpu_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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

    def ntt_chain(k):
        @jax.jit
        def g(a):
            return jax.lax.fori_loop(0, k, lambda i, v: ntt.fwd(v), a)
        return lambda: g(xj)

    dt, t1 = _marginal(ntt_chain, 1, 33)
    ntts_per_s = BATCH * LIMBS / dt
    details["ntt_limb_transforms_per_s"] = round(ntts_per_s, 1)
    details["ntt_single_call_ms"] = round(t1 * 1e3, 3)

    cpu_ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        plan.fwd(x[0, 0])
        cpu_ts.append(time.perf_counter() - t0)
    cpu_ntts_per_s = 1.0 / sorted(cpu_ts)[1]
    details["cpu_ntt_per_s"] = round(cpu_ntts_per_s, 2)

    # --- key switches per second ---------------------------------------
    metric = {
        "metric": "negacyclic_ntt_2^15_limb_transforms_per_s",
        "value": round(ntts_per_s, 1),
        "unit": "NTT/s",
        "vs_baseline": round(ntts_per_s / cpu_ntts_per_s, 1),
    }
    try:
        # the key-switch upgrade costs ~4 remote compiles + keygen; with
        # less than this on the clock the NTT headline ships instead of a
        # timeout shipping nothing (round-2 rc=124 lesson)
        if _left() < 120:
            raise TimeoutError(f"budget: {_left():.0f}s left of {BUDGET_S}")
        from fhe_linformer_tpu.ckks import (CKKSConfig, Context, Evaluator,
                                            generate_keys)
        from fhe_linformer_tpu.ckks.evaluator import (_galois_core,
                                                      _mul_relin_core)
        # dnum=3 measured fastest at nl=24 (tools/ab_dnum.py on v5e:
        # 1768 ks/s vs 1180 @dnum=4, 1559 @dnum=2): 3x32 digit-NTT rows
        # and an 8-special mod-down balance MXU work vs basis width.
        cfg = CKKSConfig(n=RING, scale_bits=26, num_scaling=LIMBS - 1, dnum=3)
        ctx = Context(cfg)
        keys = generate_keys(ctx, rotations=(1,))
        ev = Evaluator(ctx, keys)
        z = rng.uniform(-1, 1, (KSB, cfg.slots))
        ct = ev.encrypt(z, batch=True)
        nl = ct.nl
        ks_t = ctx.ks_tables(nl)
        kb, ka = ev._sliced_key(keys.rot[1], nl)
        perm = ctx.galois_perm_factored(ctx.galois_t(1))

        def rot_chain(k):
            @jax.jit
            def f(c0, c1):
                return jax.lax.fori_loop(
                    0, k, lambda i, c: _galois_core(c[0], c[1], perm,
                                                    kb, ka, ks_t), (c0, c1))
            return lambda: f(ct.c0, ct.c1)

        # repeat the whole marginal measurement REPEATS times and take the
        # median: single measurements on the tunneled device wobbled ~30%
        # between runs/docs in round 1; the median over >=5 independent
        # marginals pins the headline, and the spread is recorded so a
        # change outside it is a real regression/improvement.
        REPEATS = 5
        samples = []
        tr1 = None
        for _ in range(REPEATS):
            dt_step, tr1 = _marginal(rot_chain, 1, 17)
            samples.append(KSB / dt_step)
            # adaptive: warm repeats cost a few seconds each (the first
            # marginal ate the compiles), so only stop early when the
            # budget is nearly gone — round 3's 60 s threshold silently
            # degraded the headline to n=1 while claiming median-of-5
            if _left() < (5 if len(samples) < 3 else 15):
                break
        samples.sort()
        ks_per_s = samples[len(samples) // 2]
        details["keyswitch_per_s_per_chip"] = round(ks_per_s, 1)
        details["keyswitch_per_s_samples"] = [round(s, 1) for s in samples]
        details["keyswitch_per_s_spread_pct"] = round(
            100.0 * (samples[-1] - samples[0]) / ks_per_s, 1)
        details["keyswitch_config"] = {
            "dnum": 3, "batch": KSB, "limbs": LIMBS,
            "ownskip": os.environ.get("FHE_KS_OWNSKIP", "1") == "1",
            "pallas_ntt": os.environ.get("FHE_NTT_PALLAS", "1") != "0"}
        details["keyswitch_batch"] = KSB
        details["keyswitch_single_call_ms_batched"] = round(tr1 * 1e3, 3)

        if _left() > 90:     # optional extra: ct*ct mult marginal
            rkb, rka = ev._sliced_key(keys.relin, nl)

            def mul_chain(k):
                @jax.jit
                def f(c0, c1):
                    return jax.lax.fori_loop(
                        0, k, lambda i, c: _mul_relin_core(c[0], c[1],
                                                           c[0], c[1],
                                                           rkb, rka, ks_t),
                        (c0, c1))
                return lambda: f(ct.c0, ct.c1)

            dt_mul, _ = _marginal(mul_chain, 1, 17)
            details["ctct_mult_relin_ms_per_ct"] = round(dt_mul / KSB * 1e3, 4)
        # CPU baseline for a key switch ~ 2*(LIMBS+k) limb NTTs equivalent
        cpu_ks_per_s = cpu_ntts_per_s / (2.5 * (ctx.num_q + ctx.k_sp))
        metric = {
            "metric": "hybrid_keyswitches_per_s_per_chip_2^15",
            "value": round(ks_per_s, 1),
            "unit": "keyswitch/s",
            "vs_baseline": round(ks_per_s / cpu_ks_per_s, 1),
        }
        details.pop("keyswitch_error", None)   # stale error from a prior run
    except Exception as e:  # pragma: no cover — keep the headline printable
        details["keyswitch_error"] = repr(e)

    # merge-don't-overwrite: boot_full.py / bench_layer.py contribute
    # bootstrap_* and layer rows to the same file
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_details.json")
    merged = {}
    if os.path.exists(path):
        try:
            merged = json.load(open(path))
        except Exception:
            merged = {}
    if "keyswitch_error" not in details:
        merged.pop("keyswitch_error", None)    # don't resurrect a stale one
    merged.update(details)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(metric))


if __name__ == "__main__":
    main()

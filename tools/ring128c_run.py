"""linformer-128c first instantiation: keygen + one production bootstrap
at ring 2^16 (the >=128-bit classical-security preset, config.py).

VERDICT r2 missing #6: the 128-bit preset had never been instantiated —
no keygen, no bootstrap, no timing at 2^16.  This records context/keygen
seconds, one bootstrap (first + warm) and its precision, into
ring128c_run.json.  Uses a reduced batch and releases keys before the
decrypt (2^16 doubles every buffer vs the benched 2^15 — HBM headroom is
the risk, and a failure here should record cleanly, not wedge).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "ring128c_run.json")


def main(batch=2):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_tpu_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from fhe_linformer_tpu.config import get
    from fhe_linformer_tpu.ckks import Context, Evaluator, generate_keys
    from fhe_linformer_tpu.boot.bootstrap import Bootstrapper, BootConfig
    from fhe_linformer_tpu.security import assess
    from fhe_linformer_tpu.utils.timing import approx_error_log2

    preset = get("linformer-128c")
    results = {"ring": preset.ckks.n, "slots": preset.ckks.slots}

    def persist():
        json.dump(results, open(OUT, "w"), indent=1)

    sec = assess(preset.ckks).__dict__
    results["security_assessment"] = sec
    print(f"security: {sec}", flush=True)
    t0 = time.time()
    ctx = Context(preset.ckks)
    results["context_s"] = round(time.time() - t0, 1)
    print(f"context {results['context_s']}s  n={ctx.cfg.n} "
          f"num_q={ctx.num_q} k_sp={ctx.k_sp}", flush=True)
    persist()

    # the round-4 production boot mechanics (wide + boost) at the
    # UNIFORM-secret EvalMod domain: this preset's secret is uniform
    # ternary (the HE-standard table's assumption), so the mod-raise
    # overflow count|I| scales with sqrt(n) — K=512 (OpenFHE's
    # K_UNIFORM), deg-201 Chebyshev + 6 double angles (fit+DA max err
    # 2e-9, measured).  Round 5 postmortem: the first 2^16 run used the
    # sparse-secret K=16 and the deg-119 Chebyshev DIVERGED outside its
    # domain (output err ~2^63, masked by the old |log2| metric).
    # The preset chain stays num_scaling=44 for the >=128-bit budget;
    # this boot consumes ~40 limbs — the run is a security demonstrator.
    # level_budget stays (3,3): smaller budgets SHRANK limb use but
    # EXPLODED the full-basis rotation-key count ((2,2) -> 98, (3,2) ->
    # 122 keys vs 38) and OOM'd the 2^16 HBM under round-5 co-tenant
    # pressure.  The ~45-limb consumption of the uniform-secret wide
    # chain is paid with chain length instead: the preset grew to
    # num_scaling=46 inside its 138-bit security headroom (config.py).
    wide = os.environ.get("FHE_WIDE_BOOT", "1") == "1"
    cfg = BootConfig(wide=True, scale_boost=4, K=512,
                     sin_degree=201, double_angles=6) if wide else \
        BootConfig(K=512, sin_degree=201, double_angles=6)
    results["wide"] = cfg.wide
    rots = Bootstrapper.rotations_for(ctx.cfg.n, cfg)
    results["boot_rotation_keys"] = len(rots)
    t0 = time.time()
    keys = generate_keys(ctx, rotations=rots, conj=True)
    results["keygen_s"] = round(time.time() - t0, 1)
    print(f"keys {results['keygen_s']}s ({len(rots)} rotations)", flush=True)
    persist()
    ev = Evaluator(ctx, keys)
    ev.prefetch_host_sk()
    t0 = time.time()
    booter = Bootstrapper(ev, cfg)
    results["boot_setup_s"] = round(time.time() - t0, 1)
    persist()

    rng = np.random.default_rng(3)
    m = rng.uniform(-0.9, 0.9, (batch, ctx.cfg.slots))
    low = ev.drop_to(ev.encrypt(m, batch=True), 1)
    t0 = time.time()
    out = booter.bootstrap(low)
    out.c0.block_until_ready()
    results["bootstrap_first_s"] = round(time.time() - t0, 1)
    print(f"bootstrap first: {results['bootstrap_first_s']}s -> "
          f"nl={out.nl}", flush=True)
    t0 = time.time()
    out = booter.bootstrap(low)
    out.c0.block_until_ready()
    results["bootstrap_warm_s"] = round(time.time() - t0, 3)
    results["bootstrap_out_nl"] = out.nl
    results["bootstrap_batch"] = batch
    print(f"bootstrap warm: {results['bootstrap_warm_s']}s", flush=True)
    persist()

    try:
        import gc
        del low
        ev._enc_cache.clear()
        getattr(booter, "_fold_cache", {}).clear()
        ev.release_device_keys()
        del keys
        gc.collect()
        got = None
        for attempt in range(4):
            try:
                got = np.real(ev.decrypt_host(out))
                break
            except Exception as e:
                print(f"decrypt attempt {attempt}: {e!r}", flush=True)
                time.sleep(5)
        if got is None:
            raise RuntimeError("decrypt_host failed after retries")
        prec = min(approx_error_log2(m[i], got[i]) for i in range(batch))
        results["bootstrap_precision_bits"] = round(prec, 2)
        print(f"precision: {prec:.2f} bits", flush=True)
    except Exception as e:
        print(f"precision decrypt failed: {e!r}", flush=True)
        results["bootstrap_precision_error"] = repr(e)
    persist()
    print(json.dumps(results))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 2)

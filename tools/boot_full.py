"""Production-scale CKKS bootstrapping on the real TPU.

Builds the `linformer-boot` preset at ring 2^15 / 16384 slots / level
budget {3,3} (the reference's EvalBootstrap config — FHEController.cpp:16,
238-239), generates exactly the rotation keys `Bootstrapper.rotations_for`
reports, runs bootstrap on-device, and records:

  * bootstraps/s (single ct and batched), warm
  * precision (approx_error_log2 vs the input message — the reference's
    Utils.h:105-125 metric)
  * output level (usable levels after refresh)

Results merge into bench_details.json under "bootstrap_*" keys.

Usage: python tools/boot_full.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(batch: int = 4):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_tpu_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fhe_linformer_tpu.config import get
    from fhe_linformer_tpu.ckks import Context, Evaluator, generate_keys
    from fhe_linformer_tpu.boot.bootstrap import Bootstrapper, BootConfig
    from fhe_linformer_tpu.utils.timing import approx_error_log2

    # FHE_WIDE_BOOT=0 opts back into the round-3 narrow pipeline; the
    # default is the round-4 wide (paired-scale) bootstrap with the
    # longer chain it needs (preset linformer-boot-w)
    wide = os.environ.get("FHE_WIDE_BOOT", "1") == "1"
    preset = get("linformer-boot-w" if wide else "linformer-boot")
    t0 = time.time()
    ctx = Context(preset.ckks)
    print(f"context {time.time()-t0:.1f}s  n={ctx.cfg.n} num_q={ctx.num_q} "
          f"k_sp={ctx.k_sp} wide={wide}", flush=True)

    # wide_production reads the round-5 precision-lever env knobs
    # (FHE_SCALE_BOOST / FHE_WIDE_EARLY / FHE_OUT_BOOST / FHE_MSG_BOUND)
    cfg = BootConfig.wide_production(scale_boost=4) if wide \
        else BootConfig()
    rots = Bootstrapper.rotations_for(ctx.cfg.n, cfg)
    print(f"boot rotations needed: {len(rots)}", flush=True)
    t0 = time.time()
    keys = generate_keys(ctx, rotations=rots, conj=True)
    print(f"keys {time.time()-t0:.1f}s", flush=True)
    ev = Evaluator(ctx, keys)
    ev.prefetch_host_sk()     # d2h while HBM is near-empty (see evaluator)
    t0 = time.time()
    booter = Bootstrapper(ev, cfg)
    print(f"bootstrapper setup {time.time()-t0:.1f}s "
          f"(bs={booter.bs}, cts diags="
        f"{[len(d) for d in booter.cts_diags]}, "
        f"stc diags={[len(d) for d in booter.stc_diags]})", flush=True)

    rng = np.random.default_rng(3)
    m = rng.uniform(-0.9, 0.9, (batch, ctx.cfg.slots))
    ct = ev.encrypt(m, batch=True)
    low = ev.drop_to(ct, 1)

    results = {"bootstrap_ring": ctx.cfg.n, "bootstrap_slots": ctx.cfg.slots,
               "bootstrap_level_budget": list(cfg.level_budget),
               "bootstrap_num_q": ctx.num_q,
               "bootstrap_rotation_keys": len(rots),
               "bootstrap_wide": cfg.wide,
               "bootstrap_scale_boost": cfg.scale_boost}

    def hbm(tag):
        try:
            st = jax.local_devices()[0].memory_stats() or {}
            print(f"HBM[{tag}]: in_use={st.get('bytes_in_use', 0)/2**30:.2f}"
                  f" GiB, limit={st.get('bytes_limit', 0)/2**30:.2f} GiB",
                  flush=True)
        except Exception as e:
            print(f"HBM[{tag}]: unavailable ({e!r})", flush=True)

    hbm("pre-boot")
    t0 = time.time()
    out = booter.bootstrap(low)
    out.c0.block_until_ready()
    t_first = time.time() - t0
    print(f"bootstrap (batch={batch}) first: {t_first:.1f}s -> nl={out.nl}",
          flush=True)
    t0 = time.time()
    out = booter.bootstrap(low)
    out.c0.block_until_ready()
    t_warm = time.time() - t0
    print(f"bootstrap warm: {t_warm:.2f}s "
          f"({batch / t_warm:.2f} ct/s)", flush=True)
    hbm("post-boot")

    results.update({
        "bootstrap_batch": batch,
        "bootstrap_warm_s": round(t_warm, 3),
        "bootstrap_ct_per_s": round(batch / t_warm, 3),
        "bootstrap_out_nl": out.nl,
        "bootstrap_first_s": round(t_first, 1),
    })
    _persist(results)            # timing is safe even if the decrypt OOMs

    # 2-iteration precision variant (reference FHEController.cpp:459-469)
    # — opt-in: doubles the boot work and adds compiles
    if os.environ.get("FHE_BOOT2"):
        o2 = booter.bootstrap2(low)
        o2.c0.block_until_ready()
        t0 = time.time()
        o2 = booter.bootstrap2(low)
        o2.c0.block_until_ready()
        results["bootstrap2_warm_s"] = round(time.time() - t0, 3)
        try:
            got2 = np.real(ev.decrypt_host(o2))
            results["bootstrap2_precision_bits"] = round(
                min(approx_error_log2(m[i], got2[i])
                    for i in range(batch)), 2)
            print(f"bootstrap2: warm {results['bootstrap2_warm_s']}s, "
                  f"precision {results['bootstrap2_precision_bits']} bits",
                  flush=True)
        except Exception as e:
            results["bootstrap2_precision_error"] = repr(e)
        _persist(results)

    # single-ct latency (opt-in: batch-1 shapes recompile the whole
    # pipeline, which costs many minutes of remote compilation)
    if os.environ.get("FHE_BOOT_SINGLE"):
        one = ev.drop_to(ev.encrypt(m[0]), 1)
        o1 = booter.bootstrap(one)
        o1.c0.block_until_ready()
        t0 = time.time()
        o1 = booter.bootstrap(one)
        o1.c0.block_until_ready()
        results["bootstrap_single_ct_warm_s"] = round(time.time() - t0, 3)
        print(f"single-ct bootstrap warm: "
              f"{results['bootstrap_single_ct_warm_s']}s", flush=True)
        _persist(results)

    # free every device buffer the precision check doesn't need — incl.
    # ALL key material (the host sk was prefetched at startup): on the
    # shared dev chip the post-boot HBM high-water fails even the d2h
    # staging of a 10 MB download (observed 2026-08-20)
    import gc
    del low, ct
    ev._enc_cache.clear()
    getattr(booter, "_fold_cache", {}).clear()
    ev.release_device_keys()
    del keys
    gc.collect()
    try:
        got = None
        for attempt in range(4):
            try:
                got = np.real(ev.decrypt_host(out))
                break
            except Exception as e:   # async deallocs may lag the gc
                print(f"decrypt attempt {attempt}: {e!r}", flush=True)
                time.sleep(5)
        if got is None:
            raise RuntimeError("decrypt_host failed after retries")
        prec = min(approx_error_log2(m[i], got[i]) for i in range(batch))
        print(f"precision: {prec:.2f} bits (log2 inf-norm), "
              f"usable levels after boot: {out.nl - 1}", flush=True)
        # error anatomy (directs the next precision lever — see ROADMAP
        # round-3/4 precision decompositions): a flat median = additive
        # noise, linear-in-m = gain/scale bookkeeping, heavy tails =
        # domain edges
        err = (got - m).ravel()
        mf = m.ravel()
        fit = float(np.dot(err, mf) / np.dot(mf, mf))
        resid = err - fit * mf
        results["bootstrap_err_median"] = float(np.median(np.abs(err)))
        results["bootstrap_err_p99"] = float(np.percentile(np.abs(err), 99))
        results["bootstrap_err_linear_in_m"] = fit
        results["bootstrap_err_resid_max"] = float(np.abs(resid).max())
        print(f"err median {results['bootstrap_err_median']:.2e} p99 "
              f"{results['bootstrap_err_p99']:.2e} linear-in-m {fit:.2e} "
              f"resid max {results['bootstrap_err_resid_max']:.2e}",
              flush=True)
        results["bootstrap_precision_bits"] = round(prec, 2)
        _persist(results, drop=("bootstrap_precision_error",))
    except Exception as e:
        print(f"precision decrypt failed: {e!r}", flush=True)
        results["bootstrap_precision_error"] = repr(e)
        _persist(results)
    print(json.dumps(results))


def _persist(results, drop=()):
    path = os.path.join(REPO, "bench_details.json")
    det = {}
    if os.path.exists(path):
        det = json.load(open(path))
    for k in drop:            # a stale error key must not outlive a success
        det.pop(k, None)
    det.update(results)
    json.dump(det, open(path, "w"), indent=1)


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 4)

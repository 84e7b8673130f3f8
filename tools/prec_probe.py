"""CPU bootstrap-precision probe at a mid ring (default 2^12): the
fast proxy for the production 2^15 precision (ROADMAP round-3: the two
track each other; pre-fix 2.4-2.7 bits at 2^12 vs 0.76 at 2^15).

Usage: python tools/prec_probe.py [n_log2] [budget_a] [budget_b]
"""

import sys
import time

import numpy as np

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(nlog=12, ba=3, bb=3):
    from fhe_linformer_tpu.ckks import (CKKSConfig, Context, Evaluator,
                                        generate_keys)
    from fhe_linformer_tpu.boot.bootstrap import Bootstrapper, BootConfig
    from fhe_linformer_tpu.utils.timing import approx_error_log2

    # PROBE_WIDE=1: paired working scale inside EvalMod (BootConfig.wide);
    # PROBE_BOOST=f: input scale boost toward q0; PROBE_NS: chain length
    wide = os.environ.get("PROBE_WIDE") == "1"
    boost = int(os.environ.get("PROBE_BOOST", "1"))
    ns = int(os.environ.get("PROBE_NS", "44"))
    hw = os.environ.get("PROBE_HW", "32")   # "none" -> uniform ternary
    cfg = CKKSConfig(n=1 << nlog, scale_bits=26, num_scaling=ns, dnum=3,
                     seed=11,
                     secret_hw=None if hw.lower() == "none" else int(hw))
    ctx = Context(cfg)
    mb = float(os.environ.get("PROBE_MSG_BOUND", "2.0"))
    # round-5 precision levers (VERDICT r4 #4): PROBE_WIDE_EARLY raises
    # the working scale at CtS group 0; PROBE_OUT_BOOST lands StC at
    # out_boost*delta (see BootConfig)
    wearly = os.environ.get("PROBE_WIDE_EARLY") == "1"
    oboost = int(os.environ.get("PROBE_OUT_BOOST", "1"))
    # uniform-secret EvalMod domain (PROBE_K=512 etc.): the |I| bound of
    # a uniform ternary secret scales with sqrt(n) — OpenFHE's K_UNIFORM
    kk = int(os.environ.get("PROBE_K", "16"))
    deg = int(os.environ.get("PROBE_DEG", "119"))
    da = int(os.environ.get("PROBE_DA", "3"))
    bcfg = BootConfig(level_budget=(ba, bb), wide=wide, scale_boost=boost,
                      msg_bound=mb, wide_early=wearly, out_boost=oboost,
                      K=kk, sin_degree=deg, double_angles=da)
    print(f"wide={wide} boost={boost} num_scaling={ns} "
          f"wide_early={wearly} out_boost={oboost}", flush=True)
    rots = Bootstrapper.rotations_for(cfg.n, bcfg)
    t0 = time.time()
    keys = generate_keys(ctx, rotations=rots, conj=True)
    ev = Evaluator(ctx, keys)
    booter = Bootstrapper(ev, bcfg)
    print(f"setup {time.time()-t0:.1f}s n={cfg.n} rots={len(rots)}",
          flush=True)
    rng = np.random.default_rng(3)
    m = rng.uniform(-0.9, 0.9, cfg.slots)
    low = ev.drop_to(ev.encrypt(m), 1)
    t0 = time.time()
    out = booter.bootstrap(low)
    got = np.real(np.asarray(ev.decrypt(out)))
    prec = approx_error_log2(m, got)
    print(f"bootstrap {time.time()-t0:.1f}s out_nl={out.nl} "
          f"precision={prec:.2f} bits", flush=True)
    # error anatomy: scale drift shows as err ~ c*m (fit), K/EvalMod
    # domain failures as isolated heavy slots, additive noise as a flat
    # median — directs the next precision lever
    err = got - m
    fit = float(np.dot(err, m) / np.dot(m, m))
    resid = err - fit * m
    print(f"err median {np.median(np.abs(err)):.2e} "
          f"p99 {np.percentile(np.abs(err), 99):.2e} "
          f"max {np.abs(err).max():.2e} | linear-in-m coeff {fit:.2e} "
          f"resid max {np.abs(resid).max():.2e}", flush=True)
    if os.environ.get("PROBE_BOOT2"):
        out2 = booter.bootstrap2(low)
        got2 = np.real(np.asarray(ev.decrypt(out2)))
        print(f"bootstrap2 precision={approx_error_log2(m, got2):.2f} bits",
              flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))

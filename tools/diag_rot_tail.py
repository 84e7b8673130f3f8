"""Diagnose the rotation decrypt-parity error tail (~4e-2 max at dnum=3,
medians ~2e-4 — ROADMAP round-1 note; tools/ab_bsgs.py correctness gate).

Rotates an encrypted vector and reports the per-slot error distribution
(median / p99 / max, count above 1e-2) for several dnum values, plus the
same after a 7-rotation rotsum chain.  Runs on CPU (f32 digit planes) or
TPU (bf16) — comparing the two separates algorithmic noise from a
TPU-dtype precision edge.

Usage: python tools/diag_rot_tail.py [n_log2] [limbs]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(nlog=15, limbs=24):
    from fhe_linformer_tpu.ckks import (CKKSConfig, Context, Evaluator,
                                        generate_keys)

    rng = np.random.default_rng(0)
    for dnum in (3, 4):
        cfg = CKKSConfig(n=1 << nlog, scale_bits=26, num_scaling=limbs - 1,
                         dnum=dnum)
        ctx = Context(cfg)
        keys = generate_keys(ctx, rotations=(1, 2, 4, 8))
        ev = Evaluator(ctx, keys)
        z = rng.uniform(-1, 1, cfg.slots)
        ct = ev.encrypt(z)

        def report(tag, got, want):
            err = np.abs(got - want)
            print(f"dnum={dnum} {tag}: median {np.median(err):.2e} "
                  f"p99 {np.percentile(err, 99):.2e} max {err.max():.2e} "
                  f"n>1e-2 {(err > 1e-2).sum()}/{err.size}", flush=True)

        got = np.real(np.asarray(ev.decrypt(ev.rotate(ct, 1))))
        report("rotate(1)", got, np.roll(z, -1))

        # 4-rotation accumulation (rotsum-like): x + r1 + r2 + r4 + r8
        acc = ct
        for r in (1, 2, 4, 8):
            acc = ev.add(acc, ev.rotate(ct, r))
        want = z + np.roll(z, -1) + np.roll(z, -2) + np.roll(z, -4) \
            + np.roll(z, -8)
        got = np.real(np.asarray(ev.decrypt(acc)))
        report("x+rot1+2+4+8", got, want)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))

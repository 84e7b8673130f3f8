"""Round-2 TPU measurement campaign.

Each step runs in its OWN subprocess: a device-side OOM wedges the PJRT
client for the life of the process (observed 2026-08-20 — after a failed
d2h download even a 1 KB device_put raised ResourceExhausted), so
isolation beats in-process compile reuse ACROSS steps.  WITHIN a step all
measurements share one process (cross-process compile caching is
ineffective for the tunneled TPU — ROADMAP.md hazards); the s128 and s700
bench_layer runs are separate steps/subprocesses because an OOM at S=700
must not wedge the S=128 measurement.  Superseded by round3_tpu.py, which
also records per-step {rc, seconds, tail} manifests.

  1. tools/boot_full      — production bootstrap (ring 2^15, 16384 slots,
                            budget {3,3}) -> bootstrap_* rows in
                            bench_details.json
  2. bench_layer 128 700 boot — fully bootstrapped encoder layer at S=128
                            and at the reference's real workload shape
                            (seqMaxLen 700 + CLS, tokenizerFuncs.py:56-62)
                            -> bench_layer_S{128,700}_boot.json
  3. tools/ab_bsgs        — BSGS ct-matmul vs RE path A/B -> ab_bsgs.json

Usage: python tools/round2_tpu.py [step...]   (default: all)
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = {
    "boot": [sys.executable, "-u", "tools/boot_full.py", "4"],
    "s128": [sys.executable, "-u", "bench_layer.py", "128", "--boot"],
    "s700": [sys.executable, "-u", "bench_layer.py", "700", "--boot"],
    "bsgs": [sys.executable, "-u", "tools/ab_bsgs.py"],
}


def main(steps):
    for name in steps:
        cmd = STEPS[name]
        t0 = time.time()
        print(f"\n===== STEP {name} START: {' '.join(cmd)} =====", flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        status = "OK" if r.returncode == 0 else f"FAILED rc={r.returncode}"
        print(f"===== STEP {name} {status} ({time.time()-t0:.0f}s) =====",
              flush=True)
    print("CAMPAIGN DONE", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["boot", "s128", "s700", "bsgs"])

"""Round-3 TPU measurement campaign with a per-step outcome manifest.

Each step runs in its OWN subprocess (a device OOM wedges the PJRT client
for the life of the process — ROADMAP hazards), and EVERY step's outcome
is recorded in campaign_r3.json as {rc, seconds, tail} — round 2's silent
half-runs (s700/bsgs produced nothing, not even a failure record) cost a
round of rediscovery (VERDICT r2 weak #7).

Steps (run `python tools/round3_tpu.py [step...]`, default in this order):

  bsgs   — BSGS ct-matmul vs RE A/B                 -> ab_bsgs.json
  boot   — production bootstrap timing + PRECISION   -> bench_details.json
  s128   — bootstrapped encoder layer S=128, packed  -> bench_layer JSON
  s700   — the reference's real workload shape       -> bench_layer JSON
  s128legacy — the round-2 per-token path at S=128 (A/B vs packed)
  cfg5   — 2-layer bootstrapped forward (config-5)   -> config5_run.json
  r128c  — linformer-128c (ring 2^16) keygen + boot  -> ring128c_run.json

Every step gets a hard `timeout` so a hang cannot eat the campaign.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "campaign_r3.json")

PY = sys.executable

STEPS = {
    "bsgs": ([PY, "-u", "tools/ab_bsgs.py"], 2400),
    "boot": ([PY, "-u", "tools/boot_full.py", "4"], 5400),
    "s128": ([PY, "-u", "bench_layer.py", "128", "--boot", "--packed"], 7200),
    "s700": ([PY, "-u", "bench_layer.py", "700", "--boot", "--packed"], 9000),
    "s128legacy": ([PY, "-u", "bench_layer.py", "128", "--boot"], 7200),
    "cfg5": ([PY, "-u", "tools/config5_run.py"], 9000),
    "r128c": ([PY, "-u", "tools/ring128c_run.py"], 7200),
}


def _load():
    if os.path.exists(MANIFEST):
        try:
            return json.load(open(MANIFEST))
        except Exception:
            pass
    return {}


def run_step(name: str) -> int:
    cmd, tmo = STEPS[name]
    manifest = _load()
    t0 = time.time()
    print(f"\n===== STEP {name} START: {' '.join(cmd)} "
          f"(timeout {tmo}s) =====", flush=True)
    tail_lines: list[str] = []
    try:
        p = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
        deadline = t0 + tmo
        for line in p.stdout:
            print(line, end="", flush=True)
            tail_lines.append(line)
            if len(tail_lines) > 40:
                tail_lines.pop(0)
            if time.time() > deadline:
                p.kill()
                tail_lines.append(f"[campaign] KILLED at {tmo}s timeout\n")
                break
        rc = p.wait()
    except Exception as e:
        rc = -1
        tail_lines.append(f"[campaign] runner error: {e!r}\n")
    secs = round(time.time() - t0, 1)
    manifest[name] = {
        "cmd": " ".join(cmd), "rc": rc, "seconds": secs,
        "tail": "".join(tail_lines[-25:]),
    }
    json.dump(manifest, open(MANIFEST, "w"), indent=1)
    status = "OK" if rc == 0 else f"FAILED rc={rc}"
    print(f"===== STEP {name} {status} ({secs:.0f}s) =====", flush=True)
    return rc


def main(steps):
    for name in steps:
        run_step(name)
    print("CAMPAIGN DONE", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["bsgs", "boot", "s128", "s700", "cfg5", "r128c"])

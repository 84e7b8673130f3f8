"""Round-4 TPU measurement campaign with a per-step outcome manifest.

Same discipline as round 3 (tools/round3_tpu.py): each step in its OWN
subprocess (a device OOM wedges the PJRT client for the process life),
every outcome recorded in campaign_r4.json as {rc, seconds, tail}, hard
timeouts so a hang cannot eat the campaign.

Round-4 steps (ordering matters: `boot` decides whether the layer runs
need the 2-iteration refresh or whether the centered mod-down alone
restores precision):

  boot    — production 2^15 bootstrap timing + precision, single-pass AND
            2-iteration, post-centered-mod-down      -> bench_details.json
  s128    — bootstrapped packed layer S=128, single-pass refresh
  s700    — the reference's real workload shape, single-pass refresh
  s128b2 / s700b2 — same with the 2-iteration refresh (fallback)
  bsgs    — BSGS ct-matmul A/B rerun (round-3 shape fix)  -> ab_bsgs.json
  cfg5    — 2-layer bootstrapped forward (config-5)   -> config5_run.json
  r128c   — linformer-128c (ring 2^16) keygen + boot  -> ring128c_run.json
  bench   — the driver metric                          -> stdout JSON
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "campaign_r4.json")

PY = sys.executable

# (cmd, timeout_s, extra_env)
STEPS = {
    "boot": ([PY, "-u", "tools/boot_full.py", "4"], 5400,
             {"FHE_BOOT2": "1"}),
    "s128": ([PY, "-u", "bench_layer.py", "128", "--boot", "--packed"],
             7200, {"FHE_BOOT2": "0"}),
    # s700's HBM high-water is at the shared chip's edge: one warm rep
    # (the timing came from the first pass; this run is for the decrypt
    # check), chunked boots, smaller heavy-op chunks
    "s700": ([PY, "-u", "bench_layer.py", "700", "--boot", "--packed"],
             9000, {"FHE_BOOT2": "0", "FHE_BOOT_CHUNK": "2",
                    "FHE_STAGE_REPS": "1", "FHE_HEAVY_CHUNK": "4",
                    # cap the arena so the post-layer d2h keeps headroom
                    # (the decrypt wedge is the arena high-water, not our
                    # resident buffers — three runs eliminated those)
                    "XLA_PYTHON_CLIENT_MEM_FRACTION": "0.8"}),
    # S=700 re-chunked at 96 tokens/ct -> C=8 chunks (divides an 8/16-chip
    # dp mesh; ROADMAP round-5 queue #5) — measures the slot-waste vs
    # chunk-count trade single-chip before committing the scaling model
    "s700c8": ([PY, "-u", "bench_layer.py", "700", "--boot", "--packed"],
               9000, {"FHE_BOOT2": "0", "FHE_BOOT_CHUNK": "2",
                      "FHE_STAGE_REPS": "1", "FHE_HEAVY_CHUNK": "4",
                      "FHE_CHUNK_TOKENS": "96",
                      "XLA_PYTHON_CLIENT_MEM_FRACTION": "0.8"}),
    "s128b2": ([PY, "-u", "bench_layer.py", "128", "--boot", "--packed"],
               7200, {"FHE_BOOT2": "1"}),
    "s700b2": ([PY, "-u", "bench_layer.py", "700", "--boot", "--packed"],
               9000, {"FHE_BOOT2": "1"}),
    "bsgs": ([PY, "-u", "tools/ab_bsgs.py"], 2400, {}),
    "cfg5": ([PY, "-u", "tools/config5_run.py"], 9000,
             {"FHE_BOOT2": "0", "FHE_HEAVY_CHUNK": "4",
              "XLA_PYTHON_CLIENT_MEM_FRACTION": "0.8"}),
    # ring 2^16 artifact run stays on the XLA NTT path for reliability;
    # the Pallas batch-tile fix (ntt_pallas.py nb scaling) has its own
    # dedicated TPU validation step below
    "r128c": ([PY, "-u", "tools/ring128c_run.py"], 7200,
              {"FHE_BOOT2": "0", "FHE_NTT_PALLAS": "0"}),
    "p216": ([PY, "-u", "tools/pallas216_check.py"], 1800, {}),
    "bench": ([PY, "-u", "bench.py"], 5400, {}),
}


def _load():
    if os.path.exists(MANIFEST):
        try:
            return json.load(open(MANIFEST))
        except Exception:
            pass
    return {}


def run_step(name: str) -> int:
    cmd, tmo, env_extra = STEPS[name]
    manifest = _load()
    t0 = time.time()
    print(f"\n===== STEP {name} START: {' '.join(cmd)} "
          f"(timeout {tmo}s, env {env_extra}) =====", flush=True)
    tail_lines: list[str] = []
    env = dict(os.environ, **env_extra)
    try:
        p = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True, env=env)
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
        "env": env_extra,
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
    main(sys.argv[1:] or ["boot", "s128", "s700", "bsgs", "cfg5", "r128c"])

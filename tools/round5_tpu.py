"""Round-5 TPU measurement campaign with a per-step outcome manifest.

Same discipline as rounds 2-4 (tools/round4_tpu.py): each step in its
OWN subprocess (a device OOM wedges the PJRT client for the process
life), every outcome recorded in campaign_r5.json as {rc, seconds,
tail}, hard timeouts so a hang cannot eat the campaign.

Round-5 steps (VERDICT r4 "Next round" items #2/3/5/6):

  s700    — the flagship shape with the STAGED decrypt plan: device-slot
            decrypt first, output ct persisted to FHE_STAGE_DIR either
            way                        -> bench_layer_S700_packed_boot.json
  s700d   — fresh-process decrypt of the staged ct (zero TPU), patches
            the s700 artifact          -> argmax_matches_golden
  s700c8  — S=700 re-chunked at 96 tokens/ct -> C=8 (the dp-mesh
            mapping; prices the 25% slot waste single-chip)
  s700c8d — fresh-process decrypt for the c8 artifact
  cfg5    — 2-layer bootstrapped forward (config-5) with the batched
            fused-node chunking fix    -> config5_run.json
  r128c   — linformer-128c (ring 2^16, >=128-bit) on the XLA NTT path
                                       -> ring128c_run.json
  p216    — Pallas NTT batch-tile validation at ring 2^16
  boot    — production bootstrap precision (wide + boost variants)
                                       -> bench_details.json
  bench   — the driver metric          -> stdout JSON
  scaling — refresh bench_scaling.json from the new artifacts
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "campaign_r5.json")

PY = sys.executable

S700_ENV = {
    # STAGE_REPS=0: one pass per stage, no warm rerun.  REPS=3 and even
    # REPS=1 (which still runs first + one warm) OOM'd in ffn on a busy
    # shared chip (campaign_r5 s700 rc=1 twice — partly self-inflicted:
    # _batched_fused was honoring the HEAVY_CHUNK=4 cap and chunk-concat
    # raised the ladder-peak high-water; fixed with FHE_FUSED_CHUNK).
    # The decrypt artifact is the round-5 deliverable — dispatch
    # counters carry the perf story; HEAVY_CHUNK=4 matches the r4-proven
    # configuration.
    "FHE_BOOT2": "0", "FHE_BOOT_CHUNK": "2", "FHE_STAGE_REPS": "0",
    "FHE_HEAVY_CHUNK": "4", "XLA_PYTHON_CLIENT_MEM_FRACTION": "0.8",
    "FHE_STAGE_DIR": "/tmp/fhe_stage",
}

# (cmd, timeout_s, extra_env)
STEPS = {
    "s700": ([PY, "-u", "bench_layer.py", "700", "--boot", "--packed"],
             9000, S700_ENV),
    "s700d": ([PY, "-u", "tools/decrypt_check.py", "700",
               "bench_layer_S700_packed_boot.json"], 900,
              {"FHE_STAGE_DIR": "/tmp/fhe_stage"}),
    "s700c8": ([PY, "-u", "bench_layer.py", "700", "--boot", "--packed"],
               9000, dict(S700_ENV, FHE_CHUNK_TOKENS="96")),
    "s700c8d": ([PY, "-u", "tools/decrypt_check.py", "700",
                 "bench_layer_S700_packed_c8_boot.json", "--tag", "_c8"],
                900, {"FHE_STAGE_DIR": "/tmp/fhe_stage"}),
    # S=16: the S=32 run OOM'd mid-GELU twice (r4 compile-side, r5
    # runtime) — 33 deep-chain token cts leave no ladder headroom on the
    # busy shared chip; the capability under test (homomorphic ef_project
    # + second layer + decrypt parity) is S-independent
    "cfg5": ([PY, "-u", "tools/config5_run.py", "16"], 9000,
             {"FHE_BOOT2": "0", "FHE_HEAVY_CHUNK": "4",
              "FHE_FUSED_CHUNK": "6",
              "XLA_PYTHON_CLIENT_MEM_FRACTION": "0.8",
              "FHE_STAGE_DIR": "/tmp/fhe_stage"}),
    # batch=1: the 2^16 ring doubles every buffer; batch-2 boots OOM'd
    # under round-5 co-tenant pressure
    "r128c": ([PY, "-u", "tools/ring128c_run.py", "1"], 7200,
              {"FHE_BOOT2": "0", "FHE_NTT_PALLAS": "0",
               "FHE_HEAVY_CHUNK": "4",
               "XLA_PYTHON_CLIENT_MEM_FRACTION": "0.8"}),
    "p216": ([PY, "-u", "tools/pallas216_check.py"], 1800, {}),
    "boot": ([PY, "-u", "tools/boot_full.py", "4"], 5400,
             {"FHE_BOOT2": "1"}),
    "bench": ([PY, "-u", "bench.py"], 5400, {}),
    "scaling": ([PY, "-u", "bench_scaling.py"], 1800, {}),
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
    main(sys.argv[1:] or
         ["s700", "s700d", "s700c8", "s700c8d", "cfg5", "r128c", "p216",
          "scaling"])

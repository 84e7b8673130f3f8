"""Round-5 precision lever battery: run tools/prec_probe.py at ring 2^12
(the CPU proxy that tracks production 2^15; ROADMAP round-3/4) across the
queued levers and write prec_battery.json.

Levers (VERDICT r4 #4): scale_boost 2->4->8 (mod-raise headroom),
wide_early (paired scale from CtS group 0), out_boost (StC lands at
4*delta).
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = {
    "baseline_w2": {"PROBE_WIDE": "1", "PROBE_BOOST": "2"},
    "boost4": {"PROBE_WIDE": "1", "PROBE_BOOST": "4"},
    "boost8_mb1": {"PROBE_WIDE": "1", "PROBE_BOOST": "8",
                   "PROBE_MSG_BOUND": "1.0"},
    "early_w2": {"PROBE_WIDE": "1", "PROBE_BOOST": "2",
                 "PROBE_WIDE_EARLY": "1"},
    "oboost4_w2": {"PROBE_WIDE": "1", "PROBE_BOOST": "2",
                   "PROBE_OUT_BOOST": "4"},
    "all_b4": {"PROBE_WIDE": "1", "PROBE_BOOST": "4",
               "PROBE_WIDE_EARLY": "1", "PROBE_OUT_BOOST": "4"},
    "all_b8": {"PROBE_WIDE": "1", "PROBE_BOOST": "8",
               "PROBE_MSG_BOUND": "1.0", "PROBE_WIDE_EARLY": "1",
               "PROBE_OUT_BOOST": "4"},
}


def main(names=None):
    out_path = os.path.join(REPO, "prec_battery.json")
    results = {}
    if os.path.exists(out_path):
        try:
            results = json.load(open(out_path))
        except Exception:
            pass
    for name, env_extra in CASES.items():
        if names and name not in names:
            continue
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PALLAS_AXON_POOL_IPS="", PALLAS_AXON_REMOTE_COMPILE="0",
                   JAX_COMPILATION_CACHE_DIR="/tmp/fhe_prec_cache",
                   **env_extra)
        env.pop("PJRT_LIBRARY_PATH", None)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-u", "tools/prec_probe.py", "12"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=3600)
        m = re.search(r"precision=([\d.]+) bits", r.stdout)
        med = re.search(r"err median ([\de.+-]+)", r.stdout)
        results[name] = {
            "env": env_extra,
            "bits": float(m.group(1)) if m else None,
            "err_median": med.group(1) if med else None,
            "rc": r.returncode,
            "seconds": round(time.time() - t0, 1),
        }
        if r.returncode != 0:
            results[name]["tail"] = (r.stdout + r.stderr)[-600:]
        print(f"{name}: {results[name]['bits']} bits "
              f"({results[name]['seconds']}s rc={r.returncode})",
              flush=True)
        json.dump(results, open(out_path, "w"), indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:] or None)

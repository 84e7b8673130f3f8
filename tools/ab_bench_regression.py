"""A/B the driver keyswitch/s bench: HEAD vs the round-3 snapshot
(VERDICT r4 weak #3: BENCH_r03 1537.1 -> BENCH_r04 1437.0, a real 6.5%
drop outside the 2.4% sample spread; nothing identified which change —
code or environment — cost it).

Method: alternate bench.py subprocesses from the round-3 worktree and
HEAD, interleaved in time so tunnel/environment drift hits both arms.
If the old code also lands ~1440 now, the regression is environmental;
if it recovers ~1540, it is a code change between 47009ce and HEAD.

Writes ab_bench_regression.json.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_COMMIT = "47009ce"
R3_DIR = "/tmp/fhe_r3"
ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))


def ensure_worktree():
    if not os.path.exists(os.path.join(R3_DIR, "bench.py")):
        subprocess.run(["git", "worktree", "add", R3_DIR, R3_COMMIT],
                       cwd=REPO, check=True)


def run_bench(cwd: str, tag: str, timeout=900):
    t0 = time.time()
    r = subprocess.run([sys.executable, "-u", "bench.py"], cwd=cwd,
                       capture_output=True, text=True, timeout=timeout)
    m = None
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if "keyswitch" in d.get("metric", ""):
                    m = d["value"]
            except Exception:
                pass
    print(f"{tag}: {m} ks/s ({time.time()-t0:.0f}s, rc={r.returncode})",
          flush=True)
    if m is None:
        tail = (r.stdout + r.stderr)[-500:]
        print(f"  no metric; tail: {tail}", flush=True)
    return m


def main():
    ensure_worktree()
    out = {"r3_commit": R3_COMMIT, "head": [], "r3": []}
    for i in range(ROUNDS):
        v3 = run_bench(R3_DIR, f"r3[{i}]")
        vh = run_bench(REPO, f"head[{i}]")
        if v3:
            out["r3"].append(v3)
        if vh:
            out["head"].append(vh)
        json.dump(out, open(os.path.join(
            REPO, "ab_bench_regression.json"), "w"), indent=1)
    if out["r3"] and out["head"]:
        import numpy as np
        m3, mh = float(np.median(out["r3"])), float(np.median(out["head"]))
        out["median_r3"] = m3
        out["median_head"] = mh
        out["verdict"] = ("environment" if mh >= m3 * 0.97 else
                          "code_regression")
        print(f"median r3={m3:.0f} head={mh:.0f} -> {out['verdict']}",
              flush=True)
    json.dump(out, open(os.path.join(
        REPO, "ab_bench_regression.json"), "w"), indent=1)


if __name__ == "__main__":
    main()

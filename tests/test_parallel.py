"""Multi-chip sharding validation on a virtual 8-device CPU mesh.

Runs in a subprocess because xla_force_host_platform_device_count must be
set before jax initializes (and slows every other test's compiles)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8")
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    env.pop("PJRT_LIBRARY_PATH", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/fhe_tpu_jax_cache_mesh"
    # the driver's budgeted gate skips two of the parity checks; the test
    # suite keeps the full coverage (round-4 verdict #1)
    env["FHE_DRYRUN_FULL"] = "1"
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "sharded PRODUCTION keyswitch parity OK" in r.stdout
    assert "PRODUCTION ring 2^15 OK" in r.stdout      # via Evaluator.rotate
    assert "sharded rotation COMBO parity OK" in r.stdout
    assert "COMBO parity at PRODUCTION ring 2^15 OK" in r.stdout
    assert "full-circuit dp forward OK" in r.stdout
    assert "packed-circuit dp forward OK" in r.stdout
    assert "dryrun_multichip OK" in r.stdout

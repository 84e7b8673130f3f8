"""Test harness config.

This image boots every python process with an `axon` PJRT plugin
(sitecustomize via PYTHONPATH) that routes XLA compilation through a
remote TPU-tunnel service — turning ~0.5s local CPU compiles into flaky
multi-minute round-trips.  The plugin only registers when
PALLAS_AXON_POOL_IPS is set, and sitecustomize runs before any test code,
so the suite re-execs itself once with a scrubbed environment (from
pytest_configure, with capture suspended so the fresh process writes to
the real stdout).

Tests then run on single-device local CPU.  Kernel correctness transfers
to TPU bit-for-bit (dtype-exact u32 arithmetic; SURVEY.md §4); the
virtual 8-device mesh is exercised by tests/test_parallel.py in its own
subprocess (mirroring how the driver runs dryrun_multichip), because
xla_force_host_platform_device_count also slows unrelated compiles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and \
    not os.environ.get("_FHE_TEST_REEXEC")

if _NEEDS_REEXEC:
    def pytest_configure(config):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""   # sitecustomize: skip axon register
        env["JAX_PLATFORMS"] = "cpu"
        env["_FHE_TEST_REEXEC"] = "1"
        args = [sys.executable, "-m", "pytest",
                *config.invocation_params.args]
        os.execve(sys.executable, args, env)
else:
    os.environ["JAX_PLATFORMS"] = "cpu"

    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)  # kill -USR1 <pid>
                                                             # = non-fatal dump

    import jax  # after env setup, before any test imports

    # FHE_TEST_CACHE=0 disables the persistent compile cache: the XLA:CPU
    # executable (de)serializer segfaulted on specific entries on this
    # host (round 4: twice in the cache put during compile-heavy modules;
    # the same tests pass cache-less).  Keep the cache for everyday speed;
    # flip it off when chasing suite crashes.
    if os.environ.get("FHE_TEST_CACHE", "1") != "0":
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/fhe_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

"""Is the tunnel serving repeated identical executions from a cache?

Times the SAME chained-NTT executable two ways: every call same input vs
rotating among R distinct preuploaded inputs.  A big gap = same-input
results are cache-served and chained same-input timings are invalid."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fhe_linformer_tpu.primes import ntt_primes
from fhe_linformer_tpu.ops.ntt import NttContext

RING = 1 << 15
LIMBS = 24
BATCH = 8
R = 4


def main():
    qs = ntt_primes(2 * RING, LIMBS)
    ntt = NttContext(RING, qs)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(np.stack(
        [[rng.integers(0, q, RING, dtype=np.uint32) for q in qs]
         for _ in range(BATCH)])) for _ in range(R)]
    for x in xs:
        x.block_until_ready()

    def chained(k):
        @jax.jit
        def g(a):
            return jax.lax.fori_loop(0, k, lambda i, v: ntt.fwd(v), a)
        return g

    for k in (1, 5):
        g = chained(k)
        g(xs[0]).block_until_ready()          # compile
        for mode, pick in (("same ", lambda i: xs[0]),
                           ("fresh", lambda i: xs[i % R])):
            outs = []
            t0 = time.perf_counter()
            iters = 12
            for i in range(iters):
                outs.append(g(pick(i)))
            for o in outs:
                o.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            print(f"k={k} {mode}: {dt*1e3:8.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()

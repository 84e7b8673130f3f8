"""Fused Pallas NTT kernel == plain-XLA four-step path, bit-exact.

Runs the kernel in interpret mode on CPU (the TPU compile path is exercised
by bench.py / the driver); grid indexing over (limb, batch) is covered by
using distinct primes and batch rows.
"""

import numpy as np
import jax.numpy as jnp

from fhe_linformer_tpu.primes import ntt_primes
from fhe_linformer_tpu.ops.ntt import NttContext, _fwd, _inv
from fhe_linformer_tpu.ops import ntt_pallas

N = 1 << 15
L = 3
B = 2


def _inputs():
    qs = ntt_primes(2 * N, L)
    ntt = NttContext(N, qs)
    rng = np.random.default_rng(7)
    x = np.stack([[rng.integers(0, q, N, dtype=np.uint32) for q in qs]
                  for _ in range(B)])
    return ntt, jnp.asarray(x)


def test_pallas_fwd_matches_xla():
    ntt, x = _inputs()
    want = np.asarray(_fwd(x, ntt.full))
    got = np.asarray(ntt_pallas.fwd(x, ntt.full, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_inv_matches_xla():
    ntt, x = _inputs()
    want = np.asarray(_inv(x, ntt.full))
    got = np.asarray(ntt_pallas.inv(x, ntt.full, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_roundtrip_no_batch_dim():
    ntt, x = _inputs()
    x2 = x[0]                                   # (L, N), no leading batch
    X = ntt_pallas.fwd(x2, ntt.full, interpret=True)
    back = ntt_pallas.inv(X, ntt.full, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x2))


def test_pallas_ring_2_16_tile_fits():
    """Ring-2^16 batch tile: nb auto-halves to 4 so the (nb,1,n1,n2) u32
    blocks stay ~8 MB (NB=8 was 16 MB/block and overflowed the 16 MB
    scoped-vmem stack on TPU — round-4 r128c campaign).  B=5 also
    exercises the pad-to-multiple path at the reduced tile."""
    n = 1 << 16
    qs = ntt_primes(2 * n, 1)
    ntt = NttContext(n, qs)
    rng = np.random.default_rng(9)
    x = jnp.asarray(np.stack(
        [[rng.integers(0, qs[0], n, dtype=np.uint32)] for _ in range(5)]))
    want = np.asarray(_fwd(x, ntt.full))
    got = np.asarray(ntt_pallas.fwd(x, ntt.full, interpret=True))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(ntt_pallas.inv(jnp.asarray(got), ntt.full,
                                     interpret=True))
    np.testing.assert_array_equal(back, np.asarray(x))

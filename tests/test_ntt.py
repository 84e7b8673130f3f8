import numpy as np
import jax.numpy as jnp
import pytest

from fhe_linformer_tpu.primes import ntt_primes
from fhe_linformer_tpu.reference import NttPlan, negacyclic_mul_naive
from fhe_linformer_tpu.ops.ntt import NttContext, pow_range


def test_pow_range():
    q = ntt_primes(1 << 10, 1)[0]
    got = pow_range(7, 100, q)
    want = [pow(7, t, q) for t in range(100)]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [256, 2048])
def test_ntt_matches_reference_bitexact(n):
    qs = ntt_primes(2 * n, 3)
    ctx = NttContext(n, qs)
    rng = np.random.default_rng(7)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in qs])
    got = np.asarray(ctx.fwd(jnp.asarray(x)))
    want = np.stack([NttPlan(n, q).fwd(x[i]) for i, q in enumerate(qs)])
    np.testing.assert_array_equal(got, want.astype(np.uint32))
    back = np.asarray(ctx.inv(jnp.asarray(got)))
    np.testing.assert_array_equal(back, x)


def test_ntt_batched_and_sliced():
    n = 512
    qs = ntt_primes(2 * n, 4)
    ctx = NttContext(n, qs)
    rng = np.random.default_rng(8)
    x = np.stack([[rng.integers(0, q, n, dtype=np.uint32) for q in qs[:2]]
                  for _ in range(3)])  # (batch=3, L=2, n)
    got = np.asarray(ctx.fwd(jnp.asarray(x), limbs=(0, 1)))
    for b in range(3):
        for i, q in enumerate(qs[:2]):
            np.testing.assert_array_equal(got[b, i], NttPlan(n, q).fwd(x[b, i]))
    np.testing.assert_array_equal(
        np.asarray(ctx.inv(jnp.asarray(got), limbs=(0, 1))), x)


def test_eval_domain_mult_is_negacyclic_convolution():
    n = 256
    q = ntt_primes(2 * n, 1)[0]
    ctx = NttContext(n, (q,))
    rng = np.random.default_rng(9)
    a = rng.integers(0, q, (1, n), dtype=np.uint32)
    b = rng.integers(0, q, (1, n), dtype=np.uint32)
    A = ctx.fwd(jnp.asarray(a))
    B = ctx.fwd(jnp.asarray(b))
    prod = (np.asarray(A).astype(np.uint64) * np.asarray(B) % q).astype(np.uint32)
    got = np.asarray(ctx.inv(jnp.asarray(prod)))[0]
    want = negacyclic_mul_naive(a[0], b[0], q)
    np.testing.assert_array_equal(got, want.astype(np.uint32))

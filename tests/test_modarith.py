import numpy as np
import jax.numpy as jnp

from fhe_linformer_tpu.primes import ntt_primes, is_prime
from fhe_linformer_tpu.ops import modarith as ma


def _rand(rng, q, shape):
    return rng.integers(0, q, size=shape, dtype=np.uint32)


def test_primes_ntt_friendly():
    qs = ntt_primes(1 << 16, 8)
    assert len(set(qs)) == 8
    for q in qs:
        assert is_prime(q) and q % (1 << 16) == 1 and (1 << 28) < q < (1 << 30)


def test_mulhi32_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(ma.mulhi32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_barrett_mulmod_many_primes():
    rng = np.random.default_rng(1)
    # cover prime sizes from 26 to 30 bits, including worst cases near bounds
    for q in [*ntt_primes(1 << 14, 3, max_bits=30),
              *ntt_primes(1 << 14, 2, max_bits=27, min_bits=25)]:
        qq, mu, shift = ma.barrett_params(q)
        a = _rand(rng, q, 8192)
        b = _rand(rng, q, 8192)
        # include adversarial corners
        a[:4] = [0, 1, q - 1, q - 1]
        b[:4] = [0, q - 1, q - 1, 1]
        got = np.asarray(ma.barrett_mulmod(
            jnp.asarray(a), jnp.asarray(b),
            jnp.uint32(qq), jnp.uint32(mu), jnp.uint32(shift)))
        want = (a.astype(np.uint64) * b.astype(np.uint64) % np.uint64(q)).astype(np.uint32)
        np.testing.assert_array_equal(got, want)


def test_shoup_mulmod():
    rng = np.random.default_rng(2)
    q = ntt_primes(1 << 16, 1)[0]
    w = _rand(rng, q, 4096)
    ws = ma.shoup_precompute(w.astype(np.int64), q)
    # lazy inputs up to 2**32-1 are allowed for Shoup
    a = rng.integers(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(ma.shoup_mulmod(jnp.asarray(a), jnp.asarray(w),
                                     jnp.asarray(ws), jnp.uint32(q)))
    want = (a.astype(np.uint64) * w.astype(np.uint64) % np.uint64(q)).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_add_sub_neg():
    rng = np.random.default_rng(3)
    q = ntt_primes(1 << 16, 1)[0]
    a = _rand(rng, q, 4096)
    b = _rand(rng, q, 4096)
    qj = jnp.uint32(q)
    np.testing.assert_array_equal(
        np.asarray(ma.addmod(jnp.asarray(a), jnp.asarray(b), qj)),
        (a.astype(np.uint64) + b) % q)
    np.testing.assert_array_equal(
        np.asarray(ma.submod(jnp.asarray(a), jnp.asarray(b), qj)),
        (a.astype(np.int64) - b) % q)
    np.testing.assert_array_equal(
        np.asarray(ma.negmod(jnp.asarray(a), qj)),
        (-a.astype(np.int64)) % q)

"""Scheme-level tests: encode/encrypt/evaluate/decrypt roundtrips.

Mirrors the reference's manual golden-model verification discipline
(SURVEY.md §4) as an automated suite on a small ring.
"""

import numpy as np
import pytest

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys

CFG = CKKSConfig(n=256, scale_bits=26, num_scaling=6, dnum=2, seed=123)


@pytest.fixture(scope="module")
def ev():
    ctx = Context(CFG)
    keys = generate_keys(ctx, rotations=(1, 2, -1, 4), conj=True)
    return Evaluator(ctx, keys)


def _rand(slots, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, slots)


def test_encode_decode(ev):
    z = _rand(CFG.slots, 1)
    pt = ev.encode(z)
    # decode path: decrypt of an encryption of pt must round-trip
    back = np.real(np.asarray(ev.decrypt(ev.encrypt(pt=pt))))
    np.testing.assert_allclose(back, z, atol=2e-4)


def test_add_sub_neg(ev):
    a, b = _rand(CFG.slots, 2), _rand(CFG.slots, 3)
    ca, cb = ev.encrypt(a), ev.encrypt(b)
    np.testing.assert_allclose(np.real(ev.decrypt(ev.add(ca, cb))), a + b, atol=2e-4)
    np.testing.assert_allclose(np.real(ev.decrypt(ev.sub(ca, cb))), a - b, atol=2e-4)
    np.testing.assert_allclose(np.real(ev.decrypt(ev.neg(ca))), -a, atol=2e-4)
    np.testing.assert_allclose(
        np.real(ev.decrypt(ev.add_plain(ca, ev.encode(b)))), a + b, atol=2e-4)


def test_mul_plain_and_rescale(ev):
    a, b = _rand(CFG.slots, 4), _rand(CFG.slots, 5)
    ca = ev.encrypt(a)
    out = ev.mul_plain(ca, ev.encode(b))
    assert out.nl == ca.nl - 1
    np.testing.assert_allclose(np.real(ev.decrypt(out)), a * b, atol=3e-4)


def test_mul_ct_ct_relin(ev):
    a, b = _rand(CFG.slots, 6), _rand(CFG.slots, 7)
    ca, cb = ev.encrypt(a), ev.encrypt(b)
    out = ev.mul(ca, cb)
    np.testing.assert_allclose(np.real(ev.decrypt(out)), a * b, atol=1e-3)


def test_mul_depth_chain(ev):
    a = _rand(CFG.slots, 8, 0.5, 1.0)
    ct = ev.encrypt(a)
    expect = a.copy()
    for _ in range(3):
        ct = ev.mul(ct, ct)
        expect = expect * expect
    np.testing.assert_allclose(np.real(ev.decrypt(ct)), expect, atol=5e-3)


def test_rotate(ev):
    a = _rand(CFG.slots, 9)
    ca = ev.encrypt(a)
    for r in (1, 2, -1):
        got = np.real(ev.decrypt(ev.rotate(ca, r)))
        np.testing.assert_allclose(got, np.roll(a, -r), atol=1e-3,
                                   err_msg=f"rotation {r}")


def test_rotate_hoisted_matches_rotate(ev):
    """Hoisted rotation (shared decomposition) decrypts identically to the
    plain path.  (Not bit-identical: the signed coefficient permutation
    flips FBC lift rounding by multiples of Qhat, which lands in the
    key-switch noise budget — same ciphertext class, different noise.)"""
    a = _rand(CFG.slots, 14)
    ca = ev.encrypt(a)
    outs = ev.rotate_hoisted(ca, [1, 2, 0])
    for r in (1, 2):
        got = np.real(ev.decrypt(outs[r]))
        np.testing.assert_allclose(got, np.roll(a, -r), atol=1e-3,
                                   err_msg=f"hoisted rotation {r}")
    assert outs[0] is ca


def test_rotate_composes_with_mult(ev):
    a, b = _rand(CFG.slots, 10), _rand(CFG.slots, 11)
    ca = ev.encrypt(a)
    out = ev.rotate(ev.mul_plain(ca, ev.encode(b)), 4)
    np.testing.assert_allclose(np.real(ev.decrypt(out)),
                               np.roll(a * b, -4), atol=1e-3)


def test_conjugate(ev):
    rng = np.random.default_rng(12)
    z = rng.uniform(-1, 1, CFG.slots) + 1j * rng.uniform(-1, 1, CFG.slots)
    cz = ev.encrypt(z)
    got = np.asarray(ev.decrypt(ev.conjugate(cz)))
    np.testing.assert_allclose(got, np.conj(z), atol=1e-3)


def test_mul_scalar(ev):
    a = _rand(CFG.slots, 13)
    ca = ev.encrypt(a)
    out = ev.mul_scalar(ca, 0.37)
    np.testing.assert_allclose(np.real(ev.decrypt(out)), 0.37 * a, atol=3e-4)
    out2 = ev.mul_scalar_int(ca, 3)
    np.testing.assert_allclose(np.real(ev.decrypt(out2)), 3 * a, atol=3e-4)


def test_batched_ciphertexts(ev):
    vals = np.stack([_rand(CFG.slots, 20 + i) for i in range(4)])
    ct = ev.encrypt(vals, batch=True)
    assert ct.c0.shape[0] == 4
    w = _rand(CFG.slots, 30)
    out = ev.mul_plain(ct, ev.encode(w))
    got = np.real(ev.decrypt(out))
    np.testing.assert_allclose(got, vals * w, atol=3e-4)
    rot = ev.rotate(ct, 2)
    np.testing.assert_allclose(np.real(ev.decrypt(rot)),
                               np.roll(vals, -2, axis=-1), atol=1e-3)


def test_galois_perm_factored_matches_flat():
    """GaloisPerm (lane gather + row rolls + row gather) == flat gather
    for every rotation exponent family incl. conjugation (context.py)."""
    import jax.numpy as jnp
    from fhe_linformer_tpu.ckks.evaluator import _apply_gperm
    ctx = Context(CFG)
    n = CFG.n
    v = np.arange(3 * n, dtype=np.uint32).reshape(3, n)
    for t in [ctx.galois_t(1), ctx.galois_t(-7), ctx.galois_t(5),
              ctx.conj_t()]:
        perm = np.asarray(ctx.galois_perm(t))
        got = np.asarray(_apply_gperm(jnp.asarray(v),
                                      ctx.galois_perm_factored(t)))
        np.testing.assert_array_equal(got, v[..., perm])


def test_probe_family(ev):
    """Strided/padded/min-max decrypt probes (FHEController print_expanded/
    print_padded/print_min_max parity, cpp:700-826)."""
    z = _rand(CFG.slots, 31)
    ct = ev.encrypt(z)
    np.testing.assert_allclose(ev.probe(ct, 4), z[:4], atol=2e-4)
    np.testing.assert_allclose(ev.probe_expanded(ct, stride=8, count=4),
                               z[:32:8], atol=2e-4)
    np.testing.assert_allclose(ev.probe_padded(ct, padding=4, count=4),
                               z[:16:4], atol=2e-4)
    lo, hi = ev.probe_min_max(ct)
    assert abs(lo - z.min()) < 2e-4 and abs(hi - z.max()) < 2e-4


def test_decrypt_slots_device_matches_host(ev):
    """The on-device targeted slot decrypt (the S=700 verification path:
    d2h of len(idx) floats instead of whole-ct downloads) must agree
    with decrypt_host on fresh AND post-mul ciphertexts, including
    slots whose coefficients exercise the negative-carry centering
    (the round-4 f32-ulp bug)."""
    z = _rand(CFG.slots, 7)
    ct = ev.encrypt(z)
    idx = [0, 3, 17, 100, CFG.slots - 1]
    host = np.real(ev.decrypt_host(ct))
    dev = ev.decrypt_slots_device(ct, idx)
    assert dev.shape == (len(idx),)
    np.testing.assert_allclose(dev, host[idx], atol=5e-4)
    # a deeper ct: product changes scale and magnitudes
    ct2 = ev.mul(ct, ct)
    h2 = np.real(ev.decrypt_host(ct2))
    d2 = ev.decrypt_slots_device(ct2, idx)
    np.testing.assert_allclose(d2, h2[idx], atol=5e-4)


def test_decrypt_slots_device_batched(ev):
    """Batched ciphertexts decode per batch element (the packed bench
    reads chunk 0)."""
    zs = [_rand(CFG.slots, 11 + i) for i in range(3)]
    cts = [ev.encrypt(z) for z in zs]
    import jax.numpy as jnp
    c0 = jnp.stack([c.c0 for c in cts])
    c1 = jnp.stack([c.c1 for c in cts])
    ctb = cts[0].with_data(c0, c1)
    idx = [2, 5, 64]
    dev = ev.decrypt_slots_device(ctb, idx)
    assert dev.shape == (3, len(idx))
    for i, z in enumerate(zs):
        np.testing.assert_allclose(dev[i], z[idx], atol=5e-3)

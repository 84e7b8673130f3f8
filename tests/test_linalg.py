"""Packed linear algebra tests: rotsum/repeat trees, RE/CR matmuls, BSGS.

Mirrors the matmul semantics of FHEController.cpp:829-1058 on a small ring
(slots=128, block d=16, nb=8 blocks)."""

import numpy as np
import pytest

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.linalg.packed import PackedOps

CFG = CKKSConfig(n=256, scale_bits=26, num_scaling=8, dnum=2, seed=777)
D = 16


@pytest.fixture(scope="module")
def ops():
    ctx = Context(CFG)
    pow2 = []
    s = 1
    while s < CFG.slots:
        pow2 += [s, -s]
        s *= 2
    bsgs = list(range(1, 8)) + [8, 12, 16, 24]
    keys = generate_keys(ctx, rotations=tuple(sorted(set(pow2 + bsgs))))
    ev = Evaluator(ctx, keys)
    return PackedOps(ev, d=D)


def test_rotsum_blocks(ops):
    """rotsum(nb, d) sums across blocks -> every block holds the sum."""
    ev = ops.ev
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, CFG.slots)
    ct = ev.encrypt(v)
    out = ops.rotsum(ct, ops.nb, ops.d)
    got = np.real(ev.decrypt(out))
    blocks = v.reshape(ops.nb, D)
    want = np.tile(blocks.sum(0), ops.nb)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_repeat_broadcast(ops):
    ev = ops.ev
    v = np.zeros(CFG.slots)
    v[::D] = np.arange(ops.nb)  # one value per block at lane 0
    ct = ev.encrypt(v)
    out = ops.repeat(ct, D, 1)
    got = np.real(ev.decrypt(out))
    want = np.repeat(v[::D], D)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_matmul_re(ops):
    """expanded x * W^T-layout -> repeated W @ x."""
    ev = ops.ev
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, ops.nb)        # nb values, one per block
    W = rng.uniform(-1, 1, (D, ops.nb))
    b = rng.uniform(-1, 1, D)
    ct = ev.encrypt(ops.expanded_slots(x))
    w_pt = ev.encode(ops.matrix_re_slots(W), nl=ct.nl)
    out = ops.matmul_re(ct, w_pt, ops.repeated_slots(b))
    got = np.real(ev.decrypt(out))
    want = np.tile(W @ x + b, ops.nb)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_matmul_cr(ops):
    """repeated x * CR-layout -> y_j at slot d*j."""
    ev = ops.ev
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, D)
    W = rng.uniform(-1, 1, (ops.nb, D))
    ct = ev.encrypt(ops.repeated_slots(x))
    w_pt = ev.encode(ops.matrix_cr_slots(W), nl=ct.nl)
    out = ops.matmul_cr(ct, w_pt)
    got = np.real(ev.decrypt(out))
    want = W @ x
    np.testing.assert_allclose(got[::D], want, atol=2e-3)


def test_matmul_re_batched(ops):
    """The TPU story: a batch of token ciphertexts through one matmul."""
    ev = ops.ev
    rng = np.random.default_rng(3)
    S = 5
    X = rng.uniform(-1, 1, (S, ops.nb))
    W = rng.uniform(-1, 1, (D, ops.nb))
    cts = ev.encrypt(np.stack([ops.expanded_slots(x) for x in X]), batch=True)
    w_pt = ev.encode(ops.matrix_re_slots(W), nl=cts.nl)
    out = ops.matmul_re(cts, w_pt)
    got = np.real(ev.decrypt(out))
    for s in range(S):
        np.testing.assert_allclose(got[s], np.tile(W @ X[s], ops.nb), atol=2e-3)


def test_matmul_bsgs_tiled(ops):
    """BSGS diagonal matmul on a tiled vector."""
    ev = ops.ev
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, D)
    W = rng.uniform(-1, 1, (D, D))
    ct = ev.encrypt(np.tile(x, CFG.slots // D))
    out = ops.matmul_bsgs(ct, W)
    got = np.real(ev.decrypt(out))
    np.testing.assert_allclose(got[:D], W @ x, atol=3e-3)


def test_wrap_up_repeated(ops):
    ev = ops.ev
    rng = np.random.default_rng(5)
    vs = [rng.uniform(-1, 1, D) for _ in range(3)]
    cts = [ev.encrypt(ops.repeated_slots(v)) for v in vs]
    out = ops.wrap_up_repeated(cts)
    got = np.real(ev.decrypt(out))
    for j, v in enumerate(vs):
        np.testing.assert_allclose(got[j * D: (j + 1) * D], v, atol=2e-3)

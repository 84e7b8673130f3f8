"""Block-major (matrix-packed) circuit vs the plaintext golden model.

The packed path (models/circuit_packed.py) is the round-3 performance
circuit; this is its correctness oracle at a tiny parameterization
(d=8, k_lin=4, slots=128 -> nb=16 tokens per ct), covering:
  * block-matmul BSGS (wrap diagonals, composed giants, combo kernel)
  * the packed score/softmax/value-mix pipeline
  * the packed FFN (containers-as-layout) and pooler/classifier
  * a multi-chunk sequence (S > nb) exercising the chunk loop
"""

import os

import numpy as np
import pytest

# the two full-forward oracles are compile-heavy (~6 min warm-cache);
# they run subprocess-isolated via test_e2e_subproc.py like the other
# e2e modules (VERDICT r2 weak #4 XLA:CPU in-process fragility)
_SUB = os.environ.get("_FHE_SUBPROC") == "1"
forward_mark = pytest.mark.skipif(
    not _SUB, reason="runs subprocess-isolated via test_e2e_subproc.py")

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.linalg.blockmat import BlockOps
from fhe_linformer_tpu.models import golden
from fhe_linformer_tpu.models.circuit import CircuitParams
from fhe_linformer_tpu.models.circuit_packed import PackedLinformer

CFG = CKKSConfig(n=256, scale_bits=26, num_scaling=58, dnum=8, seed=99)
D, KLIN, FFN, NCLS = 8, 4, 32, 5
BS = 4


def _rotations():
    pow2 = []
    s = 1
    while s < CFG.slots:
        pow2 += [s, -s]
        s *= 2
    babies = [j for j in range(1, BS) if j & (j - 1)]
    return tuple(pow2 + babies)


@pytest.fixture(scope="module")
def setup():
    ctx = Context(CFG)
    keys = generate_keys(ctx, rotations=_rotations())
    ev = Evaluator(ctx, keys)
    w = golden.random_weights(d=D, k_lin=KLIN, d_ffn=FFN, n_classes=NCLS,
                              max_seq=40, seed=5, scale=0.35)
    return ev, w


def test_block_matmul(setup):
    ev, w = setup
    bops = BlockOps(ev, D, bs=BS)
    rng = np.random.default_rng(0)
    X = rng.normal(0, 0.5, (bops.nb, D))
    W = rng.normal(0, 0.4, (D, D))
    b = rng.normal(0, 0.2, D)
    ct = ev.encrypt(bops.pack(X))
    out = bops.matmul(ct, W, "t", bias=b)
    got = bops.unpack(np.real(ev.decrypt(out)), bops.nb)
    want = X @ W.T + b[None]
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_block_matmul_rect_and_scale(setup):
    ev, w = setup
    bops = BlockOps(ev, D, bs=BS)
    rng = np.random.default_rng(1)
    X = rng.normal(0, 0.5, (7, D))
    W = rng.normal(0, 0.4, (5, D))          # rectangular (k_lin-like)
    ct = ev.encrypt(bops.pack(X))
    out = bops.matmul(ct, W, "r", w_scale=0.5)
    got = bops.unpack(np.real(ev.decrypt(out)), 7)[:, :5]
    np.testing.assert_allclose(got, 0.5 * (X @ W.T), atol=2e-2)


def test_rows_to_repeated(setup):
    ev, w = setup
    bops = BlockOps(ev, D, bs=BS)
    rng = np.random.default_rng(2)
    X = rng.normal(0, 0.5, (KLIN, D))
    ct = ev.encrypt(bops.pack(X))
    rep = bops.rows_to_repeated(ct, KLIN)
    got = np.real(ev.decrypt(rep))
    for u in range(KLIN):
        np.testing.assert_allclose(
            got[u].reshape(bops.nb, D), np.tile(X[u], (bops.nb, 1)),
            atol=2e-2)


def _calibrated_params(w, emb):
    _, inter = golden.forward(w, emb, return_intermediates=True)
    rowsum = inter["exp"].sum(-1)
    x1 = inter["norm1"]
    h_in = x1 @ w.W1.T + w.B1[None]
    p_in = inter["norm2"][:1] @ w.Wp.T + w.bp[None]
    return CircuitParams(
        inv_range=(0.8 * rowsum.min(), 1.25 * rowsum.max()),
        inv_degree=27,
        gelu_clip=1.0 / (1.15 * np.abs(h_in).max()),
        gelu_degree=27,
        tanh_scale=1.0 / (1.15 * np.abs(p_in).max()),
        tanh_degree=27,
    )


@forward_mark
def test_packed_forward_matches_golden(setup):
    ev, w = setup
    rng = np.random.default_rng(11)
    emb = rng.normal(0, 0.3, (5, D))
    params = _calibrated_params(w, emb)
    circ = PackedLinformer(ev, w, params, bs=BS)
    out = circ.forward(emb)
    logits = circ.decrypt_logits(out)
    probs, inter = golden.forward(w, emb, return_intermediates=True)
    want = inter["logits"]
    assert np.argmax(logits) == np.argmax(want), (logits, want)
    np.testing.assert_allclose(logits, want, atol=0.05, rtol=0.05)


@forward_mark
def test_packed_forward_multichunk(setup):
    """S > nb tokens: the chunk loop in attention + block-major batching."""
    ev, w = setup
    rng = np.random.default_rng(13)
    S = 20                                   # nb = 16 at d=8/slots=128
    emb = rng.normal(0, 0.3, (S - 1, D))
    params = _calibrated_params(w, emb)
    circ = PackedLinformer(ev, w, params, bs=BS)
    out = circ.forward(emb)
    logits = circ.decrypt_logits(out)
    probs, inter = golden.forward(w, emb, return_intermediates=True)
    want = inter["logits"]
    assert np.argmax(logits) == np.argmax(want), (logits, want)
    np.testing.assert_allclose(logits, want, atol=0.06, rtol=0.06)


def test_pack_chunks_rechunked(setup):
    """chunk_tokens < nb (dp re-chunking, ROADMAP round-5 queue #5):
    host packing splits at chunk_tokens and round-trips."""
    ev, w = setup
    bops = BlockOps(ev, D, bs=BS, chunk_tokens=12)
    rng = np.random.default_rng(3)
    X = rng.normal(0, 0.5, (20, D))
    slots = bops.pack_chunks(X)
    assert slots.shape[0] == 2          # ceil(20/12), was ceil(20/16)=2..
    np.testing.assert_allclose(bops.unpack_chunks(slots, 20), X)
    Y = rng.normal(0, 0.5, (25, D))
    s2 = bops.pack_chunks(Y)
    assert s2.shape[0] == 3             # ceil(25/12)=3 vs ceil(25/16)=2
    np.testing.assert_allclose(bops.unpack_chunks(s2, 25), Y)


@forward_mark
def test_packed_forward_rechunked(setup):
    """Re-chunked forward (chunk_tokens=12 < nb=16): every chunk partially
    occupied, C=2 at S=20 — the execution shape dp meshes want at S=700
    (chunk_tokens=96 -> C=8)."""
    ev, w = setup
    rng = np.random.default_rng(13)
    S = 20
    emb = rng.normal(0, 0.3, (S - 1, D))
    params = _calibrated_params(w, emb)
    circ = PackedLinformer(ev, w, params, bs=BS, chunk_tokens=12)
    out = circ.forward(emb)
    logits = circ.decrypt_logits(out)
    probs, inter = golden.forward(w, emb, return_intermediates=True)
    want = inter["logits"]
    assert np.argmax(logits) == np.argmax(want), (logits, want)
    np.testing.assert_allclose(logits, want, atol=0.06, rtol=0.06)


@forward_mark
def test_packed_forward_bootstrapped(setup):
    """The packed circuit's bootstrap hooks (mid-exp / pre-GELU / pooler
    entry) at a tiny boot config — the placement that the production
    bench (bench_layer.py --packed --boot) runs at scale."""
    from fhe_linformer_tpu.boot.bootstrap import Bootstrapper, BootConfig
    cfg = CKKSConfig(n=256, scale_bits=26, num_scaling=34, dnum=4, seed=23,
                     secret_hw=8)
    bootc = BootConfig(level_budget=(2, 2), K=8, sin_degree=59,
                       double_angles=1)
    ctx = Context(cfg)
    rots = set(Bootstrapper.rotations_for(cfg.n, bootc))
    s = 1
    while s < cfg.slots:
        rots |= {s, -s}
        s *= 2
    rots |= {j for j in range(1, BS) if j & (j - 1)}
    keys = generate_keys(ctx, rotations=tuple(sorted(rots)), conj=True)
    ev = Evaluator(ctx, keys)
    booter = Bootstrapper(ev, bootc)
    w = golden.random_weights(d=D, k_lin=KLIN, d_ffn=FFN, n_classes=NCLS,
                              max_seq=12, seed=5, scale=0.35)
    rng = np.random.default_rng(17)
    emb = rng.normal(0, 0.3, (5, D))
    params = _calibrated_params(w, emb)
    params.inv_degree = params.gelu_degree = params.tanh_degree = 13
    circ = PackedLinformer(ev, w, params, bs=BS)
    out = circ.forward(emb, boot=booter, input_nl=12)
    logits = circ.decrypt_logits(out)
    probs, inter = golden.forward(w, emb, return_intermediates=True)
    want = inter["logits"]
    assert np.all(np.isfinite(logits)), logits
    assert np.argmax(logits) == np.argmax(want), (logits, want)
    np.testing.assert_allclose(logits, want, atol=0.2)

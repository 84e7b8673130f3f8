"""End-to-end encrypted Linformer vs the plaintext golden model.

The reference verifies by manually diffing decrypt-probes against
compute_simple.py output (SURVEY.md §4); here it's one automated test on a
tiny parameterization (d=16, k_lin=4, slots=128)."""

import os

import numpy as np
import pytest

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys

# ~40 multiplicative levels -> many one-time XLA compiles; runs in minutes
# with a warm cache but is gated out of the default quick suite.
# Enable with FHE_RUN_SLOW=1 (stage-level parity is covered by
# test_circuit_stages.py in the default run).
pytestmark = pytest.mark.skipif(
    not os.environ.get("FHE_RUN_SLOW"),
    reason="full-circuit e2e is compile-heavy; set FHE_RUN_SLOW=1")
from fhe_linformer_tpu.models import golden
from fhe_linformer_tpu.models.circuit import CircuitParams, EncryptedLinformer

CFG = CKKSConfig(n=256, scale_bits=26, num_scaling=58, dnum=8, seed=99)
D, KLIN, FFN, NCLS = 8, 4, 32, 5


@pytest.fixture(scope="module")
def setup():
    ctx = Context(CFG)
    pow2 = []
    s = 1
    while s < CFG.slots:
        pow2 += [s, -s]
        s *= 2
    keys = generate_keys(ctx, rotations=tuple(pow2))
    ev = Evaluator(ctx, keys)
    w = golden.random_weights(d=D, k_lin=KLIN, d_ffn=FFN, n_classes=NCLS,
                              max_seq=12, seed=5, scale=0.35)
    return ev, w


def _calibrated_params(w, emb):
    """Pick approximation ranges from golden intermediates — the automated
    version of the reference's print_min_max probing."""
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


def test_encrypted_linformer_matches_golden(setup):
    ev, w = setup
    rng = np.random.default_rng(11)
    emb = rng.normal(0, 0.3, (5, D))
    params = _calibrated_params(w, emb)
    circ = EncryptedLinformer(ev, w, params)
    out = circ.forward(emb)
    logits = circ.decrypt_logits(out)
    probs, inter = golden.forward(w, emb, return_intermediates=True)
    want = inter["logits"]
    assert np.argmax(logits) == np.argmax(want), (logits, want)
    np.testing.assert_allclose(logits, want, atol=0.05, rtol=0.05)


def test_encrypted_cls_only_path(setup):
    ev, w = setup
    rng = np.random.default_rng(12)
    emb = rng.normal(0, 0.3, (4, D))
    params = _calibrated_params(w, emb)
    circ = EncryptedLinformer(ev, w, params)
    out = circ.forward(emb, cls_only=True)
    logits = circ.decrypt_logits(out)
    # golden with cls_only attention
    probs, inter = golden.forward(w, emb, cls_only=True,
                                  return_intermediates=True)
    np.testing.assert_allclose(logits, inter["logits"], atol=0.05, rtol=0.05)

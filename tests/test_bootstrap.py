"""Homomorphic bootstrapping: refresh a depleted ciphertext and compare
against the numpy pipeline simulator and the original message.

(EvalBootstrap parity — FHEController.cpp:438-469 — small-ring config:
budget {2,2}, sine degree 59, 2 double-angles, sparse secret.)"""

import numpy as np
import pytest

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.boot.bootstrap import Bootstrapper, BootConfig

CFG = CKKSConfig(n=256, scale_bits=26, num_scaling=28, dnum=4, seed=7,
                 secret_hw=8)


@pytest.fixture(scope="module")
def boot_setup():
    ctx = Context(CFG)
    cfg = BootConfig(level_budget=(2, 2), K=8, sin_degree=119,
                     double_angles=1)
    rots = Bootstrapper.rotations_for(CFG.n, cfg)
    keys = generate_keys(ctx, rotations=rots, conj=True)
    ev = Evaluator(ctx, keys)
    booter = Bootstrapper(ev, cfg)
    assert booter.required_rotations() == rots
    return ev, booter


def test_bootstrap_refreshes(boot_setup):
    ev, booter = boot_setup
    rng = np.random.default_rng(3)
    m = rng.uniform(-0.9, 0.9, CFG.slots)
    ct = ev.encrypt(m)
    low = ev.drop_to(ct, 1)              # depleted ciphertext
    out = booter.bootstrap(low)
    assert out.nl >= 4, f"no usable levels left after boot: nl={out.nl}"
    got = np.asarray(ev.decrypt(out))
    np.testing.assert_allclose(np.real(got), m, atol=2e-2)
    # precision report in the reference's log2-inf-norm style
    from fhe_linformer_tpu.utils.timing import approx_error_log2
    prec = approx_error_log2(m, np.real(got))
    assert prec > 5.5, f"bootstrap precision too low: {prec} bits"


def test_bootstrap_two_iterations(boot_setup):
    """Precision-refined double bootstrap beats single-pass precision."""
    ev, booter = boot_setup
    rng = np.random.default_rng(5)
    m = rng.uniform(-0.9, 0.9, CFG.slots)
    low = ev.drop_to(ev.encrypt(m), 1)
    from fhe_linformer_tpu.utils.timing import approx_error_log2
    one = np.real(np.asarray(ev.decrypt(booter.bootstrap(low))))
    two = np.real(np.asarray(ev.decrypt(booter.bootstrap2(low))))
    p1 = approx_error_log2(m, one)
    p2 = approx_error_log2(m, two)
    assert p2 > p1 + 1.0, f"2-iter boot not more precise: {p1} -> {p2}"


def test_bootstrap_then_compute(boot_setup):
    """Refreshed ciphertexts must keep computing (the whole point)."""
    ev, booter = boot_setup
    rng = np.random.default_rng(4)
    m = rng.uniform(-0.9, 0.9, CFG.slots)
    ct = ev.drop_to(ev.encrypt(m), 1)
    out = booter.bootstrap(ct)
    sq = ev.mul(out, out)
    got = np.real(np.asarray(ev.decrypt(sq)))
    np.testing.assert_allclose(got, m * m, atol=4e-2)


def test_bootstrap_batch_chunking(boot_setup, monkeypatch):
    """FHE_BOOT_CHUNK caps the per-call batch (large-S HBM lever): a
    batch-3 bootstrap chunked 2+pad must equal the unchunked result."""
    ev, booter = boot_setup
    rng = np.random.default_rng(9)
    m = rng.uniform(-0.9, 0.9, (3, CFG.slots))
    low = ev.drop_to(ev.encrypt(m, batch=True), 1)
    full = booter.bootstrap(low)
    monkeypatch.setenv("FHE_BOOT_CHUNK", "2")
    chunked = booter.bootstrap(low)
    assert chunked.c0.shape == full.c0.shape
    assert chunked.nl == full.nl and chunked.scale == full.scale
    a = np.real(np.asarray(ev.decrypt(full)))
    b = np.real(np.asarray(ev.decrypt(chunked)))
    np.testing.assert_allclose(b, m, atol=2e-2)
    np.testing.assert_allclose(a, b, atol=2e-2)


def test_bootstrap_wide(boot_setup):
    """Round-4 wide (paired-scale) + scale-boost bootstrap: the internal
    pipeline at ~delta^2 with s_in boosted toward q0.  Must beat the
    narrow single pass by several bits (the structural precision fix —
    ROADMAP round-3 decomposition; 10.8 vs 2.4 bits at 2^12)."""
    ev, booter = boot_setup
    from fhe_linformer_tpu.utils.timing import approx_error_log2
    cfg_w = BootConfig(level_budget=(2, 2), K=8, sin_degree=119,
                       double_angles=1, wide=True, scale_boost=4)
    bw = Bootstrapper(ev, cfg_w)
    rng = np.random.default_rng(9)
    m = rng.uniform(-0.9, 0.9, CFG.slots)
    low = ev.drop_to(ev.encrypt(m), 1)
    narrow = np.real(np.asarray(ev.decrypt(booter.bootstrap(low))))
    wide = np.real(np.asarray(ev.decrypt(bw.bootstrap(low))))
    pn = approx_error_log2(m, narrow)
    pw = approx_error_log2(m, wide)
    # at n=256 BOTH paths sit near the EvalMod math floor (~9 bits at
    # this tiny K/da config) — the crypto-noise separation (2.4 -> 10.8
    # bits) only shows at 2^12+ (tools/prec_probe.py), so here we assert
    # the wide path reaches the floor and is not worse than narrow
    assert pw > 8.5 and pw > pn - 0.3, \
        f"wide boot regressed: narrow {pn} -> wide {pw}"
    # refresh() defaults to the single pass under a wide config
    out = bw.refresh(low)
    assert out.nl >= 1

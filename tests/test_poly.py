"""Polynomial evaluation layer tests (EvalPoly / Chebyshev parity)."""

import numpy as np
import pytest

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.poly import cheb_divmod, cheb_eval, chebyshev_fit
from fhe_linformer_tpu.poly.eval import PolyEvaluator
from fhe_linformer_tpu.poly.gadgets import Gadgets

CFG = CKKSConfig(n=256, scale_bits=26, num_scaling=14, dnum=3, seed=321)


@pytest.fixture(scope="module")
def ev():
    ctx = Context(CFG)
    keys = generate_keys(ctx, rotations=())
    return Evaluator(ctx, keys)


def test_cheb_divmod_identity():
    rng = np.random.default_rng(0)
    for deg, m in [(10, 4), (59, 16), (119, 32)]:
        c = rng.normal(size=deg + 1)
        q, r = cheb_divmod(c, m)
        x = np.linspace(-1, 1, 113)
        tm = np.polynomial.chebyshev.chebval(x, [0.0] * m + [1.0])
        np.testing.assert_allclose(
            cheb_eval(c, x), cheb_eval(q, x) * tm + cheb_eval(r, x), atol=1e-9)


def test_eval_poly_deg6(ev):
    coeffs = [0.3, -1.2, 0.5, 0.25, -0.125, 0.0625, 0.01]
    rng = np.random.default_rng(1)
    z = rng.uniform(-1, 1, CFG.slots)
    ct = ev.encrypt(z)
    pe = PolyEvaluator(ev)
    out = pe.eval_poly(ct, coeffs)
    want = np.polyval(coeffs[::-1], z)
    np.testing.assert_allclose(np.real(ev.decrypt(out)), want, atol=3e-3)


def test_eval_chebyshev_inverse(ev):
    rng = np.random.default_rng(2)
    z = rng.uniform(0.3, 2.0, CFG.slots)
    ct = ev.encrypt(z)
    g = Gadgets(ev)
    out = g.eval_inverse(ct, 0.25, 2.1, degree=59)
    np.testing.assert_allclose(np.real(ev.decrypt(out)), 1.0 / z,
                               atol=2e-2, rtol=2e-2)


def test_eval_tanh(ev):
    rng = np.random.default_rng(3)
    z = rng.uniform(-1, 1, CFG.slots)
    ct = ev.encrypt(z)
    g = Gadgets(ev)
    out = g.eval_tanh(ct, -1.0, 1.0, mult=1 / 3.0, degree=59)
    np.testing.assert_allclose(np.real(ev.decrypt(out)), np.tanh(3.0 * z),
                               atol=2e-2)


def test_eval_exp_gadget(ev):
    rng = np.random.default_rng(4)
    z = rng.uniform(-0.2, 0.2, CFG.slots)
    ct = ev.encrypt(z)
    g = Gadgets(ev)
    out = g.eval_exp(ct)
    np.testing.assert_allclose(np.real(ev.decrypt(out)), np.exp(8.0 * z),
                               atol=5e-2, rtol=5e-2)


def test_fused_cheb_nodes_match_unfused():
    """square_double_minus_one / mul_double_sub (the single-dispatch
    Chebyshev ladder nodes) match the unfused mul/scalar/const chains."""
    import numpy as np
    from fhe_linformer_tpu.ckks import (CKKSConfig, Context, Evaluator,
                                        generate_keys)
    cfg = CKKSConfig(n=256, scale_bits=26, num_scaling=12, dnum=2, seed=61)
    ctx = Context(cfg)
    ev = Evaluator(ctx, generate_keys(ctx, rotations=()))
    rng = np.random.default_rng(2)
    xa = rng.uniform(-0.9, 0.9, cfg.slots)
    xb = rng.uniform(-0.9, 0.9, cfg.slots)
    xc = rng.uniform(-0.9, 0.9, cfg.slots)
    a = ev.encrypt(xa)
    b = ev.encrypt(xb)
    c = ev.encrypt(xc)

    # narrow: 2a^2 - 1
    got = np.real(ev.decrypt(ev.square_double_minus_one(a)))
    np.testing.assert_allclose(got, 2 * xa * xa - 1, atol=2e-3)
    # narrow: 2ab - c (c sits one level above the output by construction)
    got = np.real(ev.decrypt(ev.mul_double_sub(a, b, c)))
    np.testing.assert_allclose(got, 2 * xa * xb - xc, atol=2e-3)

    # wide: operands must sit at the PAIRED scale ~delta^2 (the wide
    # chain's invariant; a narrow-scale input would quantize to ~1)
    wide_s = ctx.delta * ctx.delta
    aw = ev.encrypt(xa, scale=wide_s)
    bw = ev.encrypt(xb, scale=wide_s)
    cw = ev.encrypt(xc, scale=wide_s)
    got = np.real(ev.decrypt(ev.square_double_minus_one(aw, wide=True)))
    np.testing.assert_allclose(got, 2 * xa * xa - 1, atol=2e-3)
    got = np.real(ev.decrypt(ev.mul_double_sub(aw, bw, cw, wide=True)))
    np.testing.assert_allclose(got, 2 * xa * xb - xc, atol=2e-3)


def test_fused_cheb_nodes_batch_chunked(monkeypatch):
    """The fused Chebyshev nodes chunk large token batches through
    _batched_fused (config-5's 33-ct deep-chain batch OOM'd the shared
    chip when squared in one graph, campaign_r4).  Chunked output must be
    BIT-EXACT vs the single-graph path."""
    import jax.numpy as jnp
    from fhe_linformer_tpu.ckks import (CKKSConfig, Context, Evaluator,
                                        generate_keys)
    cfg = CKKSConfig(n=256, scale_bits=26, num_scaling=12, dnum=2, seed=62)
    ctx = Context(cfg)
    ev = Evaluator(ctx, generate_keys(ctx, rotations=()))
    rng = np.random.default_rng(5)
    xs = rng.uniform(-0.9, 0.9, (3, cfg.slots))
    cts = [ev.encrypt(x) for x in xs]
    bat = cts[0].with_data(jnp.stack([c.c0 for c in cts]),
                           jnp.stack([c.c1 for c in cts]))

    monkeypatch.setenv("FHE_FUSED_CHUNK", "8")
    whole_sq = ev.square_double_minus_one(bat)
    whole_ms = ev.mul_double_sub(bat, bat, bat)
    monkeypatch.setenv("FHE_FUSED_CHUNK", "1")
    chunk_sq = ev.square_double_minus_one(bat)
    chunk_ms = ev.mul_double_sub(bat, bat, bat)
    np.testing.assert_array_equal(np.asarray(whole_sq.c0),
                                  np.asarray(chunk_sq.c0))
    np.testing.assert_array_equal(np.asarray(whole_sq.c1),
                                  np.asarray(chunk_sq.c1))
    np.testing.assert_array_equal(np.asarray(whole_ms.c0),
                                  np.asarray(chunk_ms.c0))
    got = np.real(ev.decrypt(chunk_sq))
    np.testing.assert_allclose(got, 2 * xs * xs - 1, atol=2e-3)

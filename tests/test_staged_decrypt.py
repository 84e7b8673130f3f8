"""Staged (split-process) decrypt check: the forward process persists the
output ct + host sk; tools/decrypt_check.py replays the decrypt in a
fresh process with zero device involvement.  This is the S=700 fallback
for the post-layer arena high-water (rounds 3-4; VERDICT r4 missing #1).

Round-trips the exact file contract bench_layer.main_packed writes.
"""

import os

import numpy as np

from fhe_linformer_tpu.ckks import CKKSConfig, Context, Evaluator, generate_keys
from fhe_linformer_tpu.ckks.ciphertext import Ciphertext
from fhe_linformer_tpu.io.serialize import save_ciphertext

CFG = CKKSConfig(n=256, scale_bits=26, num_scaling=6, dnum=2, seed=123)


def test_staged_decrypt_roundtrip(tmp_path):
    ctx = Context(CFG)
    keys = generate_keys(ctx, rotations=(), conj=False)
    ev = Evaluator(ctx, keys)
    ev.prefetch_host_sk()
    stage = str(tmp_path)

    # the forward half's file contract (bench_layer.main_packed)
    np.savez(os.path.join(stage, "sk_host.npz"),
             eval_full=ev._sk_host[:4],
             qs=np.asarray(ctx.qs[:4], np.uint64))
    rng = np.random.default_rng(7)
    n_cls = 20
    want = rng.normal(0, 1.0, n_cls)
    z = np.zeros(CFG.slots)
    z[:n_cls] = want
    ct = ev.encrypt(z)
    o3 = ev.drop_to(ct, 3)
    save_ciphertext(os.path.join(stage, "out_S8.ct"),
                    Ciphertext(np.asarray(o3.c0), np.asarray(o3.c1),
                               o3.nl, o3.scale))
    np.savez(os.path.join(stage, "golden_S8.npz"), want=want, n_cls=n_cls)

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from decrypt_check import staged_decrypt
    logits, got_want, got_ncls = staged_decrypt(stage, "_S8")
    assert got_ncls == n_cls
    np.testing.assert_allclose(got_want, want)
    np.testing.assert_allclose(logits, want, atol=2e-4)
    assert np.argmax(logits) == np.argmax(want)

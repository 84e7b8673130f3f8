"""Full-scale encrypted Linformer layer timing on the real chip (d=128,
k_lin=32, S=128 tokens, N=2^15) — per-stage numbers behind the headline
(not driver-run; see bench.py for the one-line metric).

Measured (v5e-1, warm): attention 1.09 s for 128 tokens.
"""

import json
import sys
import time

import numpy as np


def main(S=128, num_scaling=44, full=True):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fhe_tpu_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from fhe_linformer_tpu.ckks import (CKKSConfig, Context, Evaluator,
                                        generate_keys)
    from fhe_linformer_tpu.models import golden
    from fhe_linformer_tpu.models.circuit import CircuitParams, EncryptedLinformer

    t0 = time.time()
    cfg = CKKSConfig(n=1 << 15, scale_bits=26, num_scaling=num_scaling, dnum=4)
    ctx = Context(cfg)
    print(f"context {time.time()-t0:.1f}s basis={len(ctx.basis)}", flush=True)

    rots = []
    s = 1
    while s < cfg.slots:
        rots += [s, -s]
        s *= 2
    t0 = time.time()
    keys = generate_keys(ctx, rotations=tuple(rots))
    print(f"keys {time.time()-t0:.1f}s ({len(rots)} rotations)", flush=True)
    ev = Evaluator(ctx, keys)

    w = golden.random_weights(d=128, k_lin=32, d_ffn=512, n_classes=20,
                              max_seq=S + 4, seed=3, scale=0.3)
    params = CircuitParams(inv_degree=27, gelu_degree=27, tanh_degree=27,
                           inv_range=(0.5, 64.0))
    circ = EncryptedLinformer(ev, w, params)
    rng = np.random.default_rng(0)
    emb = rng.normal(0, 0.3, (S - 1, 128))

    t0 = time.time()
    x_cts, xe, xf, S_total = circ.encrypt_inputs(emb)
    x_cts.c0.block_until_ready()
    print(f"encrypt_inputs {time.time()-t0:.1f}s S_total={S_total}", flush=True)

    results = {}

    def stage(name, f, *a, **k):
        t0 = time.time()
        out = f(*a, **k)
        out.c0.block_until_ready()
        t_first = time.time() - t0
        t0 = time.time()
        out2 = f(*a, **k)
        out2.c0.block_until_ready()
        t_warm = time.time() - t0
        results[name] = round(t_warm, 3)
        print(f"{name}: first {t_first:.1f}s warm {t_warm:.2f}s "
              f"(out nl={out2.nl})", flush=True)
        return out2

    attn = stage("attention", circ.attention, x_cts, xe, xf, S_total)
    if full:
        wrapped = stage("wrap1", circ.wrap_tokens, attn)
        wrapped = stage("affine1", circ.affine, wrapped, w.a1, w.b1, w.c1,
                        S_total)
        x2 = stage("unwrap1", circ.unwrap_tokens, wrapped, S_total)
        y = stage("ffn_gelu", circ.ffn, x2)
        x2m, ym = ev.match(x2, y)
        res = ev.add(x2m, ym)
        wrapped2 = circ.wrap_tokens(res)
        wrapped2 = circ.affine(wrapped2, w.a2, w.b2, w.c2, S_total)
        x3 = stage("unwrap2", circ.unwrap_tokens, wrapped2, S_total)
        cls_ct = x3.with_data(x3.c0[0], x3.c1[0])
        out = stage("pooler_classifier", circ.pooler_classifier, cls_ct)
        total = sum(results.values())
        results["layer_total_warm_s"] = round(total, 3)
        print(f"LAYER TOTAL (warm, single chip, S={S_total}): {total:.2f}s",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main(S=int(sys.argv[1]) if len(sys.argv) > 1 else 128)

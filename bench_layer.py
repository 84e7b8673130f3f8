"""Full-scale encrypted-attention stage timing on the real chip (d=128,
k_lin=32, S=128 tokens, N=2^15) — the per-stage numbers behind the
headline (not driver-run; see bench.py for the one-line metric)."""

import json
import sys
import time

import numpy as np


def main(S=128, num_scaling=30):
    import jax
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

    t0 = time.time()
    out = circ.attention(x_cts, xe, xf, S_total)
    out.c0.block_until_ready()
    t_first = time.time() - t0
    print(f"attention first (compile+run) {t_first:.1f}s", flush=True)

    t0 = time.time()
    out = circ.attention(x_cts, xe, xf, S_total)
    out.c0.block_until_ready()
    t_warm = time.time() - t0
    print(f"attention warm {t_warm:.2f}s for {S_total} tokens", flush=True)
    print(json.dumps({"attention_s128_d128_warm_s": round(t_warm, 3)}))


if __name__ == "__main__":
    main(S=int(sys.argv[1]) if len(sys.argv) > 1 else 128)

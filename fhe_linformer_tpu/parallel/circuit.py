"""SPMD execution of the FULL encrypted circuit over a device mesh.

The reference is strictly single-process (SURVEY.md §2.5); this module is
pure new TPU-native design.  Sharding strategy for the production circuit:

  * **dp (token batch)** — every per-token ciphertext array in the circuit
    carries tokens on its leading axis; sharding that axis over the `dp`
    mesh axis data-parallelizes matmuls, exp/GELU Chebyshev chains, and
    key switches with zero code changes in the circuit: XLA propagates the
    input sharding through every jitted composite and inserts collectives
    only where the packing tree actually mixes tokens (the log-tree
    interleave steps, which contract the batch axis pairwise).
  * **limb (RNS)** — keys/tables can additionally shard limbs (see
    parallel/sharded.py for the explicit shard_map + lazy-psum design);
    in the compiler-driven path below limbs stay replicated because the
    per-level limb slicing (rescale/drop_to) would force a reshard per
    level.

`run_encoder_forward_dp` builds a tiny-ring preset of the COMPLETE forward
(attention -> affine-norm -> FFN+GELU -> affine-norm -> pooler ->
classifier), shards the encrypted token batch over `dp`, executes it on
the mesh, and verifies the decrypted logits against the plaintext golden
model — the driver's multichip dry-run entry.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_ciphertext(ct, mesh: Mesh, axis: str = "dp"):
    """Commit a batched ciphertext's token axis to the mesh's `axis`.
    XLA's sharding propagation carries this through all downstream ops.
    Batches whose leading dim does not divide the axis (e.g. the k_lin=4
    compressed K/V rows on an 8-way mesh) are committed replicated —
    device_put requires even division; propagation still shards whatever
    they combine with."""
    if ct.c0.shape[0] % mesh.shape[axis] == 0:
        spec = P(axis, *([None] * (ct.c0.ndim - 1)))
    else:
        spec = P()
    sh = NamedSharding(mesh, spec)
    return ct.with_data(jax.device_put(ct.c0, sh), jax.device_put(ct.c1, sh))


def run_encoder_forward_dp(mesh: Mesh, S_total: int = 8, seed: int = 11,
                           degree: int = 13, check: bool = True,
                           num_scaling: int = 44, input_nl: int | None = None,
                           dnum: int = 8, atol: float = 0.05):
    """Full encrypted Linformer forward, token batch sharded over `dp`.

    Tiny ring (n=256) / d=8 model so the dry-run compiles in seconds per
    stage on CPU meshes; the identical circuit code runs the full
    d=128 / n=2^15 model on real chips (models/circuit.py is dimension-
    parameterized).  Returns (logits, golden_logits)."""
    from ..ckks import CKKSConfig, Context, Evaluator, generate_keys
    from ..models import golden
    from ..models.circuit import CircuitParams, EncryptedLinformer

    D, KLIN, FFN, NCLS = 8, 4, 32, 5
    cfg = CKKSConfig(n=256, scale_bits=26, num_scaling=num_scaling,
                     dnum=dnum, seed=42)
    ctx = Context(cfg)
    pow2 = []
    s = 1
    while s < cfg.slots:
        pow2 += [s, -s]
        s *= 2
    keys = generate_keys(ctx, rotations=tuple(pow2))
    ev = Evaluator(ctx, keys)
    w = golden.random_weights(d=D, k_lin=KLIN, d_ffn=FFN, n_classes=NCLS,
                              max_seq=S_total + 4, seed=5, scale=0.35)
    rng = np.random.default_rng(seed)
    emb = rng.normal(0, 0.3, (S_total - 1, D))

    # calibrate approximation ranges from golden intermediates (the
    # automated analogue of the reference's print_min_max probing)
    probs, inter = golden.forward(w, emb, return_intermediates=True)
    x1 = inter["norm1"]
    params = CircuitParams(
        inv_range=(0.5 * inter["exp"].sum(-1).min(),
                   1.5 * inter["exp"].sum(-1).max()),
        inv_degree=degree, gelu_degree=degree, tanh_degree=degree,
        gelu_clip=1.0 / (1.2 * np.abs(x1 @ w.W1.T + w.B1[None]).max()),
        tanh_scale=1.0 / (1.2 * np.abs(
            inter["norm2"][:1] @ w.Wp.T + w.bp[None]).max()),
        exp_pow8=False,
    )
    circ = EncryptedLinformer(ev, w, params)

    x_cts, xe, xf, S = circ.encrypt_inputs(emb, nl=input_nl)
    # the actual multichip step: token batches committed to the dp axis
    x_cts = shard_ciphertext(x_cts, mesh)
    xe = shard_ciphertext(xe, mesh)
    xf = shard_ciphertext(xf, mesh)

    x = circ.encoder_layer(x_cts, xe, xf, S)
    cls_ct = x.with_data(x.c0[0], x.c1[0])
    out = circ.pooler_classifier(cls_ct)
    import os as _os
    if _os.environ.get("FHE_DRYRUN_DEPTH"):
        print(f"[depth] full-circuit consumed {ctx.num_q - out.nl} "
              f"levels (out nl={out.nl} of {ctx.num_q})", flush=True)
    logits = circ.decrypt_logits(out)
    want = inter["logits"]
    if check:
        assert np.all(np.isfinite(logits)), logits
        np.testing.assert_allclose(logits, want, atol=atol, rtol=atol)
        assert int(np.argmax(logits)) == int(np.argmax(want))
    return logits, want

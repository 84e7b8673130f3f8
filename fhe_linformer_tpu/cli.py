"""Command-line interface.

Covers the reference binary's surface (main.cpp:40-143: --generate_keys
[--secure], inference on a sample index, --verbose) plus the client-side
scripts' roles, as subcommands:

  keygen   — context + public/relin/rotation keys to a key dir
  infer    — encrypted forward over a sample's exported embeddings
  golden   — plaintext golden forward (compute_20ng_linformer_forward.py)
  bench    — run the benchmark entry
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _build_context(preset_name: str):
    from .config import get
    from .ckks import Context
    p = get(preset_name)
    return p, Context(p.ckks)


def _preset_rotations(p, ctx) -> tuple:
    """Rotation shifts the preset's circuit needs: power-of-two trees both
    signs (rotsum/repeat/interleave) plus — when the preset bootstraps —
    the CtS/StC BSGS shifts from Bootstrapper.rotations_for (the
    reference's generate_bootstrapping_and_rotation_keys ordering,
    FHEController.cpp:265-273: rotation requirements are known before any
    key exists)."""
    rots = set()
    s = 1
    while s < ctx.cfg.slots:
        rots |= {s, -s}
        s *= 2
    # BSGS baby + giant shifts for the block-major packed circuit
    # (bs=16; dedicated giants feed the fused multi-rotate kernel)
    rots |= {j for j in range(1, 16) if j & (j - 1)}
    rots |= {16 * g for g in range(1, 8)} | \
        {16 * g - 128 for g in range(1, 8)}
    if p.bootstrap:
        from .boot.bootstrap import Bootstrapper
        rots |= set(Bootstrapper.rotations_for(ctx.cfg.n))
    return tuple(sorted(rots))


def cmd_keygen(args):
    from .ckks import Evaluator, generate_keys
    from .io.serialize import save_keys
    p, ctx = _build_context(args.preset)
    rots = _preset_rotations(p, ctx)
    t0 = time.time()
    keys = generate_keys(ctx, rotations=rots, conj=True,
                         keep_secret=not args.secure)
    save_keys(args.keys_dir, keys, include_secret=not args.secure)
    print(f"keys -> {args.keys_dir} in {time.time() - t0:.1f}s "
          f"({len(rots)} rotations, secret "
          f"{'withheld' if args.secure else 'retained'})")


def cmd_golden(args):
    from .models import golden
    from .io.weights import load_reference_weights
    from .client.pipeline import load_sample_embeddings, softmax_argmax
    p, _ = _build_context(args.preset)
    if args.weights_dir:
        w = load_reference_weights(args.weights_dir, d=p.d, k_lin=p.k_lin,
                                   d_ffn=p.d_ffn, n_classes=p.n_classes,
                                   max_seq=p.max_seq)
    else:
        w = golden.random_weights(d=p.d, k_lin=p.k_lin, d_ffn=p.d_ffn,
                                  n_classes=p.n_classes, max_seq=p.max_seq)
    emb = load_sample_embeddings(args.sample_dir)
    probs, inter = golden.forward(w, emb, return_intermediates=True)
    cls, p_ = softmax_argmax(inter["logits"])
    print(json.dumps({"pred": cls, "prob": float(p_[cls]),
                      "logits": inter["logits"].tolist()}))


def cmd_infer(args):
    from .ckks import Evaluator, generate_keys
    from .models import golden
    from .models.circuit import EncryptedLinformer
    from .io.weights import load_reference_weights
    from .client.pipeline import load_sample_embeddings, softmax_argmax
    p, ctx = _build_context(args.preset)
    if args.keys_dir:
        # persisted key store (the reference's load_context flow,
        # FHEController.cpp:184-235 + rotation keys :275-301): no key
        # generation happens on this path
        from .io.serialize import load_keys
        keys = load_keys(args.keys_dir, ctx)
    else:
        keys = generate_keys(ctx, rotations=_preset_rotations(p, ctx),
                             conj=p.bootstrap)
    ev = Evaluator(ctx, keys)
    if args.weights_dir:
        w = load_reference_weights(args.weights_dir, d=p.d, k_lin=p.k_lin,
                                   d_ffn=p.d_ffn, n_classes=p.n_classes,
                                   max_seq=p.max_seq)
    else:
        w = golden.random_weights(d=p.d, k_lin=p.k_lin, d_ffn=p.d_ffn,
                                  n_classes=p.n_classes, max_seq=p.max_seq)
    emb = load_sample_embeddings(args.sample_dir)
    booter = None
    if p.bootstrap:
        from .boot.bootstrap import Bootstrapper, BootConfig
        # wide presets (config.py linformer-boot-w) pair with the
        # paired-scale boot config
        bc = BootConfig.wide_production() if p.name.endswith("-w") \
            else None
        booter = Bootstrapper(ev, bc)
    if args.packed:
        # block-major matrix-packed path (round-3 performance circuit);
        # keys must include the BSGS baby shifts (cmd_keygen generates
        # them for every preset)
        from .models.circuit_packed import PackedLinformer
        ck = int(os.environ.get("FHE_CHUNK_TOKENS", "0")) or None
        pc = PackedLinformer(ev, w, p.circuit, d=p.d, chunk_tokens=ck)
        t0 = time.time()
        # input_nl=12: the measured pre-exp chain depth (bench_layer.py) —
        # 8 ran out inside the exp Taylor and leaned on the defensive
        # pre-Taylor bootstrap (round-3 lesson)
        out = pc.forward(emb, boot=booter,
                         input_nl=12 if p.bootstrap else None)
        logits = pc.decrypt_logits(out)
        cls, p_ = softmax_argmax(logits)
        print(json.dumps({"pred": cls, "prob": float(p_[cls]),
                          "latency_s": round(time.time() - t0, 3),
                          "packed": True, "logits": logits.tolist()}))
        return
    circ = EncryptedLinformer(ev, w, p.circuit)
    n_layers = args.layers or p.layers
    extra = [golden.random_weights(d=p.d, k_lin=p.k_lin, d_ffn=p.d_ffn,
                                   n_classes=p.n_classes, max_seq=p.max_seq,
                                   seed=100 + i)
             for i in range(n_layers - 1)]
    t0 = time.time()
    if args.resume_checkpoint:
        # resume from a saved encoder output (the reference's
        # checkpoint/encodered.bin flow, main.cpp:92-107)
        from .io.serialize import load_ciphertext
        x = load_ciphertext(args.resume_checkpoint)
    else:
        x_cts, xe, xf, S_total = circ.encrypt_inputs(
            emb, nl=10 if p.bootstrap else None)
        x = circ.encoder_layer(x_cts, xe, xf, S_total,
                               cls_only=args.cls_only, boot=booter)
        for lw in extra:
            xe2 = circ.ef_project(x, lw.E_w[:, :S_total], lw.E_b, S_total)
            xf2 = circ.ef_project(x, lw.F_w[:, :S_total], lw.F_b, S_total)
            saved = circ.w
            circ.w = lw
            try:
                x = circ.encoder_layer(x, xe2, xf2, S_total, boot=booter)
            finally:
                circ.w = saved
        if args.save_checkpoint:
            from .io.serialize import save_ciphertext
            save_ciphertext(args.save_checkpoint, x)
    cls_ct = x.with_data(x.c0[0], x.c1[0]) if x.c0.ndim > 2 else x
    out = circ.pooler_classifier(cls_ct, boot=booter)
    logits = circ.decrypt_logits(out)
    cls, p_ = softmax_argmax(logits)
    print(json.dumps({"pred": cls, "prob": float(p_[cls]),
                      "latency_s": round(time.time() - t0, 3),
                      "logits": logits.tolist()}))


def cmd_eval(args):
    """Batch accuracy over exported sample dirs (the reference's
    --eval_root mode, compute_20ng_linformer_forward.py:230-264).
    Layout: <root>/test_<i>/input_<t>.txt + <root>/labels.txt.

    --encrypted additionally runs every sample through the ENCRYPTED
    circuit (one keygen, reused) and reports encrypted accuracy plus the
    encrypted-vs-golden argmax agreement rate — the task-level parity
    number the reference only ever produced one sample at a time
    (main_2.cpp decrypt -> softmax -> argmax)."""
    from .models import golden
    from .io.weights import load_reference_weights
    from .client.pipeline import load_sample_embeddings, softmax_argmax
    p, ctx = _build_context(args.preset)
    if args.weights_dir:
        w = load_reference_weights(args.weights_dir, d=p.d, k_lin=p.k_lin,
                                   d_ffn=p.d_ffn, n_classes=p.n_classes,
                                   max_seq=p.max_seq)
    else:
        w = golden.random_weights(d=p.d, k_lin=p.k_lin, d_ffn=p.d_ffn,
                                  n_classes=p.n_classes, max_seq=p.max_seq)
    labels = [int(x) for x in
              open(os.path.join(args.eval_root, "labels.txt"))]
    dirs = sorted((d for d in os.listdir(args.eval_root)
                   if d.startswith("test_")), key=lambda d: int(d[5:]))
    circ = booter = None
    if args.encrypted:
        from .ckks import Evaluator, generate_keys
        from .models.circuit_packed import PackedLinformer
        keys = generate_keys(ctx, rotations=_preset_rotations(p, ctx),
                             conj=p.bootstrap)
        ev = Evaluator(ctx, keys)
        if p.bootstrap:
            from .boot.bootstrap import Bootstrapper, BootConfig
            bc = BootConfig.wide_production() if p.name.endswith("-w") \
                else None
            booter = Bootstrapper(ev, bc)
        ck = int(os.environ.get("FHE_CHUNK_TOKENS", "0")) or None
        circ = PackedLinformer(ev, w, p.circuit, d=p.d,
                               chunk_tokens=ck)
    correct = total = 0
    enc_correct = enc_agree = 0
    for d in dirs:
        idx = int(d[5:])
        emb = load_sample_embeddings(os.path.join(args.eval_root, d))
        probs = golden.forward(w, emb, cls_only=args.cls_only)
        pred, _ = softmax_argmax(np.log(np.maximum(probs, 1e-30)))
        correct += int(pred == labels[idx])
        total += 1
        if circ is not None:
            out = circ.forward(emb, boot=booter,
                               input_nl=12 if p.bootstrap else None)
            epred, _ = softmax_argmax(circ.decrypt_logits(out))
            enc_correct += int(epred == labels[idx])
            enc_agree += int(epred == pred)
    res = {"accuracy": correct / max(total, 1), "n": total}
    if circ is not None:
        res["encrypted_accuracy"] = enc_correct / max(total, 1)
        res["encrypted_golden_agreement"] = enc_agree / max(total, 1)
    print(json.dumps(res))


def cmd_security(args):
    from . import config, security
    names = [args.preset] if args.preset else sorted(config.PRESETS)
    for name in names:
        cfg = config.get(name).ckks
        print(f"{name:18s} {security.assess(cfg)}")
        print(f"{'':18s} estimator: {security.estimator_input(cfg)}")


def main(argv=None):
    ap = argparse.ArgumentParser("fhe-linformer-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("keygen")
    kg.add_argument("--preset", default="linformer-boot")
    kg.add_argument("--keys-dir", default="keys")
    kg.add_argument("--secure", action="store_true",
                    help="do not persist the secret key (unlike the "
                         "reference, whose --secure flag is ignored — "
                         "FHEController.cpp:3-90)")
    kg.set_defaults(fn=cmd_keygen)

    gd = sub.add_parser("golden")
    gd.add_argument("--preset", default="tiny")
    gd.add_argument("--weights-dir", default=None)
    gd.add_argument("--sample-dir", required=True)
    gd.set_defaults(fn=cmd_golden)

    inf = sub.add_parser("infer")
    inf.add_argument("--preset", default="tiny")
    inf.add_argument("--keys-dir", default=None,
                     help="load persisted keys from a keygen dir instead "
                          "of regenerating")
    inf.add_argument("--weights-dir", default=None)
    inf.add_argument("--sample-dir", required=True)
    inf.add_argument("--cls-only", action="store_true")
    inf.add_argument("--packed", action="store_true",
                     help="block-major matrix-packed circuit (one ct per "
                          "128 tokens; the round-3 performance path)")
    inf.add_argument("--layers", type=int, default=None,
                     help="total encoder layers (default: preset's; layers "
                          ">= 2 run K/V compression homomorphically — "
                          "config-5)")
    inf.add_argument("--save-checkpoint", default=None)
    inf.add_argument("--resume-checkpoint", default=None)
    inf.set_defaults(fn=cmd_infer)

    evp = sub.add_parser("eval")
    evp.add_argument("--preset", default="tiny")
    evp.add_argument("--weights-dir", default=None)
    evp.add_argument("--eval-root", required=True)
    evp.add_argument("--cls-only", action="store_true")
    evp.add_argument("--encrypted", action="store_true",
                     help="also run each sample through the encrypted "
                          "circuit; report encrypted accuracy + agreement")
    evp.set_defaults(fn=cmd_eval)

    bn = sub.add_parser("bench")
    bn.set_defaults(fn=lambda a: __import__("bench").main())

    sec = sub.add_parser("security", help="HE-standard security assessment")
    sec.add_argument("--preset", default=None,
                     help="preset name (default: assess every preset)")
    sec.set_defaults(fn=cmd_security)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

"""Finish (or independently cross-check) a staged decrypt check in a
FRESH process, with ZERO TPU involvement.

The forward half (bench_layer.py main_packed) persists the post-layer
output ciphertext (dropped to 3 CRT limbs), the host-side secret key
rows, and the golden logits to FHE_STAGE_DIR.  This tool replays the
decrypt entirely in numpy on the host — modular c0 + c1*s, reference
iNTT (NttPlan), centered CRT lift, canonical-embedding decode — so the
shared chip's post-layer arena high-water (which ResourceExhausted every
in-process d2h at S=700, rounds 3-4) cannot touch it.

Usage:
  python tools/decrypt_check.py <S> [artifact.json] [--tag _cK]

Patches `artifact.json` (atomically) with logits_max_err /
argmax_matches_golden / decrypt_path=staged_fresh_process when the
artifact path is given and the fields are absent or failed.

Reference bar: the decrypted-prediction check of
/root/reference/src/main_2.cpp:77-142.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pure-host tool: force CPU regardless of the ambient axon env (the
# tunnel plugin needs PYTHONPATH=/root/.axon_site which subprocesses of
# the campaign may not carry — and this check must not touch the device)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"

import numpy as np  # noqa: E402


def staged_decrypt(stage_dir: str, tag: str):
    """-> (logits ndarray, want ndarray, n_cls) from the staged files."""
    from fhe_linformer_tpu.io.serialize import load_ciphertext
    from fhe_linformer_tpu.ckks.encoding import Encoder
    from fhe_linformer_tpu.reference import NttPlan
    from fhe_linformer_tpu.io.native import crt_lift_center

    ct = load_ciphertext(os.path.join(stage_dir, f"out{tag}.ct"))
    z = np.load(os.path.join(stage_dir, "sk_host.npz"))
    g = np.load(os.path.join(stage_dir, f"golden{tag}.npz"))
    want, n_cls = g["want"], int(g["n_cls"])

    m = int(ct.nl)
    n = int(ct.c0.shape[-1])
    c0 = np.asarray(ct.c0).astype(np.uint64)
    c1 = np.asarray(ct.c1).astype(np.uint64)
    s = np.asarray(z["eval_full"])[:m].astype(np.uint64)
    qs = np.asarray(z["qs"])[:m].astype(np.uint64).reshape(-1, 1)
    m_eval = (c0 + c1 * s % qs) % qs
    flat = m_eval.reshape(-1, m, n)
    coeffs = np.empty_like(flat)
    for i in range(m):
        plan = NttPlan(n, int(qs[i, 0]))
        for b in range(flat.shape[0]):
            coeffs[b, i] = plan.inv(flat[b, i].astype(np.int64))
    qlist = [int(q) for q in qs[:, 0]]
    ints = crt_lift_center(
        np.moveaxis(coeffs.astype(np.uint32), 1, 0).reshape(m, -1), qlist
    ).reshape(flat.shape[0], n)
    enc = Encoder(n)
    vals = np.real(enc.decode(ints[0], float(ct.scale)))
    return vals[:n_cls], want, n_cls


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    S = args[0] if args else "700"
    artifact = args[1] if len(args) > 1 else None
    tag = f"_S{S}"
    if "--tag" in sys.argv:
        tag += sys.argv[sys.argv.index("--tag") + 1]
    stage_dir = os.environ.get("FHE_STAGE_DIR", "/tmp/fhe_stage")
    logits, want, n_cls = staged_decrypt(stage_dir, tag)
    err = float(np.max(np.abs(logits - want)))
    ok = bool((np.argmax(logits) == np.argmax(want)) and np.isfinite(err))
    out = {"logits_max_err": round(err, 5), "argmax_matches_golden": ok,
           "decrypt_path": "staged_fresh_process"}
    print(f"staged decrypt check (fresh process, S={S}{tag}): "
          f"argmax match={ok}, max|err|={err:.4g}", flush=True)
    if artifact and os.path.exists(artifact):
        rec = json.load(open(artifact))
        # never downgrade an in-process success; patch failures/absences,
        # and record the cross-check either way
        if not rec.get("argmax_matches_golden"):
            rec.update(out)
            rec.pop("decrypt_check_error", None)
        rec["staged_check_max_err"] = out["logits_max_err"]
        rec["staged_check_argmax_ok"] = ok
        tmp = artifact + ".tmp"
        json.dump(rec, open(tmp, "w"), indent=1)
        os.replace(tmp, artifact)
        print(f"artifact patched: {artifact}", flush=True)
    print(json.dumps(out))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

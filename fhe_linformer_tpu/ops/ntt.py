"""Negacyclic NTT/iNTT as four-step modular matmuls on the TPU MXU.

Instead of porting a butterfly network (the CPU-native shape OpenFHE uses
underneath /root/reference/src/FHEController.cpp's every EvalMult/EvalRotate),
the transform is factored for the 128x128 systolic array:

    N = n1*n2 (32768 = 128*256), x laid out as a matrix Y[j1][j2], j = j2*n1+j1
    fwd:  Z = W1f @ ((Y @ W2f) * Tf)          (negacyclic twist folded into
    inv:  x = ((W1i @ X) * Ti) @ W2i           W2/T tables)

Each modular matmul runs on the MXU exactly, with no integer-width tricks
left to chance:

  * the runtime operand is split into XDIG=6 planes of 5-bit digits,
    concatenated along the contraction axis (contraction m = (d, j));
  * the constant matrix entries are pre-scaled by 2**(5d) mod q, and those
    expanded matrices are split into WDIG=4 planes of 8-bit digits;
  * each of the 4 plane-matmuls runs in bfloat16 with fp32 accumulation:
    every partial product (<= 31*255) and every accumulated sum
    (<= 31*255*6*256 = 12.1e6 < 2**24) is exactly representable, so the
    integer results are bit-exact;
  * the 4 partials recombine as sum_e P_e * (2**(8e) mod q) with Shoup
    multiplications on the VPU.

No lane-crossing shuffles anywhere: the transposes are layout changes XLA
handles, and all stages are dense matmuls or elementwise passes.

Evaluation order convention: fwd returns X[k] = x(psi^(2k+1)) for
k = k1*n2 + k2 in natural order — identical to reference.NttPlan, which the
tests assert bit-exactly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..primes import root_of_unity
from . import modarith as ma

XDIG_BITS = 5           # runtime-operand digit width (bf16/XLA path)
XDIG = 6                # ceil(30 / 5)
WDIG_BITS = 8           # constant-matrix digit width
WDIG = 4                # ceil(30 / 8)
_XMASK = (1 << XDIG_BITS) - 1
XDIG8 = 4               # int8 path: balanced base-256 digits, both operands


@functools.lru_cache(maxsize=None)
def _digit_dtype():
    """bf16 feeds the TPU MXU at full rate; XLA:CPU's thunk runtime lacks
    bf16 dot support, so CPU (tests) uses f32 — both are exact for 8x5-bit
    digit products accumulated below 2**24."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def pow_range(base: int, count: int, q: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(count-1)] mod q, vectorized (int64)."""
    exps = np.arange(count, dtype=np.int64)
    out = np.ones(count, dtype=np.int64)
    b = base % q
    bit = 0
    while (1 << bit) < count:
        sel = (exps >> bit) & 1
        out = np.where(sel == 1, out * b % q, out)
        b = b * b % q
        bit += 1
    return out


def _expand_w_i8(w: np.ndarray, qs: np.ndarray, contract_axis: int) -> jnp.ndarray:
    """(L, a, b) int64 matrix -> (XDIG8, L, XDIG8*dim, ...) int8 planes.

    The int8-MXU variant of _expand_w: the contraction axis is expanded
    XDIG8-fold with entries pre-scaled by 2**(8d) mod q (matching the
    runtime operand's balanced base-256 digits), then each expanded entry
    is split into XDIG8 *balanced* signed digits in [-128, 127].  Products
    |x_d * w_e| <= 2**14 accumulated over <= XDIG8*n2 = 1024 terms stay
    below 2**24, exact in the MXU's s32 accumulator."""
    L = w.shape[0]
    qcol = qs.reshape(L, 1, 1)
    scaled = [(w * (1 << (8 * d))) % qcol for d in range(XDIG8)]
    ex = np.concatenate(scaled, axis=contract_axis)
    planes = []
    v = ex.copy()
    for _ in range(XDIG8):
        u = v & 255
        d = np.where(u >= 128, u - 256, u)
        planes.append(d.astype(np.int8))
        v = (v - d) >> 8
    assert (v == 0).all(), "balanced digit split must terminate"
    return jnp.asarray(np.stack(planes))


def _expand_w(w: np.ndarray, qs: np.ndarray, contract_axis: int) -> jnp.ndarray:
    """(L, a, b) int64 matrix -> (WDIG, L, XDIG*dim, ...) bf16 digit planes.

    The contraction axis is expanded XDIG-fold with entries pre-scaled by
    2**(XDIG_BITS*d) mod q, so a runtime operand decomposed into 5-bit digit
    planes along its contraction axis multiplies straight through.
    contract_axis: 1 -> rows are contracted (right-multiply, W[j][k]);
                   2 -> cols are contracted (left-multiply,  W[i][j]).
    """
    L = w.shape[0]
    qcol = qs.reshape(L, 1, 1)
    planes = []
    scaled = [(w * pow(2, XDIG_BITS * d, 1 << 62)) % qcol for d in range(XDIG)]
    ex = np.concatenate(scaled, axis=contract_axis)
    for e in range(WDIG):
        planes.append((ex >> (WDIG_BITS * e)) & ((1 << WDIG_BITS) - 1))
    return jnp.asarray(np.stack(planes).astype(np.float32), _digit_dtype())


def _x_digits(x, axis: int):
    """Split u32 x into XDIG 5-bit planes concatenated along `axis` (-1/-2).
    NB: constants stay numpy — trace-time jnp constants force a device
    round-trip inside MLIR lowering (observed multi-minute stalls on the
    virtual-multi-device CPU client)."""
    shifts = (np.arange(XDIG, dtype=np.uint32) * XDIG_BITS
              ).reshape((XDIG,) + (1,) * x.ndim)
    d = ((x[None] >> shifts) & np.uint32(_XMASK)).astype(_digit_dtype())
    d = jnp.moveaxis(d, 0, axis - 1 if axis == -1 else -3)
    if axis == -1:
        return d.reshape(*d.shape[:-2], XDIG * x.shape[-1])
    return d.reshape(*d.shape[:-3], XDIG * x.shape[-2], x.shape[-1])


@functools.partial(
    jax.tree_util.register_dataclass,
    meta_fields=("n", "n1", "n2", "qs_key", "rows"),
    data_fields=("q", "w2f", "w1f", "tf", "tf_s",
                 "w1i", "ti", "ti_s", "w2i", "comb_c", "comb_s",
                 "w2f8", "w1f8", "w1i8", "w2i8"))
@dataclass(frozen=True)
class LimbTables:
    """All per-basis NTT constants, stacked over a list of primes (axis 0).

    With `rows` set, the data arrays are the FULL-basis tables (shared
    device buffers) and `rows` names the limb subset — kernels slice at
    trace time (`rows_of`), so a level's table 'slice' costs zero resident
    HBM.  Eagerly materialized per-level slices measured 4.6 GiB per level
    at the production basis (60 limbs x ~18 MiB/limb x act+tgt+comp sets)
    — the round-3 bootstrap OOM."""
    n: int
    n1: int
    n2: int
    qs_key: tuple               # primes as a hashable static key
    q: jnp.ndarray              # (L,1,1) u32
    w2f: jnp.ndarray            # (WDIG, L, XDIG*n2, n2) bf16, twist folded
    w1f: jnp.ndarray            # (WDIG, L, n1, XDIG*n1) bf16
    tf: jnp.ndarray             # (L, n1, n2) u32
    tf_s: jnp.ndarray           # shoup of tf
    w1i: jnp.ndarray            # (WDIG, L, n1, XDIG*n1) bf16
    ti: jnp.ndarray             # (L, n1, n2) u32
    ti_s: jnp.ndarray
    w2i: jnp.ndarray            # (WDIG, L, XDIG*n2, n2) bf16, untwist+1/N folded
    comb_c: jnp.ndarray         # (WDIG, L, 1, 1) u32: 2**(8e) mod q
    comb_s: jnp.ndarray         # shoup of comb_c
    w2f8: jnp.ndarray           # (XDIG8, L, XDIG8*n2, n2) int8 balanced planes
    w1f8: jnp.ndarray           # (XDIG8, L, n1, XDIG8*n1) int8
    w1i8: jnp.ndarray           # (XDIG8, L, n1, XDIG8*n1) int8
    w2i8: jnp.ndarray           # (XDIG8, L, XDIG8*n2, n2) int8
    rows: tuple | None = None   # static limb subset (lazy slice)


def _build_tables(n: int, qs: tuple[int, ...]) -> LimbTables:
    n1 = 128 if n >= 16384 else 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    L = len(qs)

    w2f = np.empty((L, n2, n2), np.int64)
    w1f = np.empty((L, n1, n1), np.int64)
    tf = np.empty((L, n1, n2), np.int64)
    w1i = np.empty((L, n1, n1), np.int64)
    ti = np.empty((L, n1, n2), np.int64)
    w2i = np.empty((L, n2, n2), np.int64)
    combs = np.empty((WDIG, L), np.int64)

    j2k2 = np.arange(n2)[:, None] * np.arange(n2)[None, :] % n2
    k1j1 = np.arange(n1)[:, None] * np.arange(n1)[None, :] % n1
    # Tf[j1][k2] = psi^(j1*(2*k2+1)) ; exponent mod 2n
    tf_exp = np.arange(n1)[:, None] * (2 * np.arange(n2)[None, :] + 1) % (2 * n)

    for i, q in enumerate(qs):
        psi = root_of_unity(2 * n, q)
        psi_inv = pow(psi, 2 * n - 1, q)
        om_n2 = pow(psi, 2 * n1, q)          # omega^n1, order n2
        om_n1 = pow(psi, 2 * n2, q)          # omega^n2, order n1
        n_inv = pow(n, q - 2, q)

        p2 = pow_range(om_n2, n2, q)
        p1 = pow_range(om_n1, n1, q)
        p2i = pow_range(pow(om_n2, n2 - 1, q), n2, q)
        p1i = pow_range(pow(om_n1, n1 - 1, q), n1, q)
        ppsi = pow_range(psi, 2 * n, q)
        ppsi_i = pow_range(psi_inv, 2 * n, q)
        tw2 = pow_range(pow(psi, n1, q), n2, q)       # psi^(n1*j2)
        tw2_i = pow_range(pow(psi_inv, n1, q), n2, q)

        w2f[i] = tw2[:, None] * p2[j2k2] % q                   # [j2][k2]
        w1f[i] = p1[k1j1]                                      # [k1][j1]
        tf[i] = ppsi[tf_exp]                                   # [j1][k2]
        w1i[i] = p1i[k1j1]                                     # [j1][k1]
        ti[i] = ppsi_i[tf_exp]                                 # [j1][k2]
        w2i[i] = (p2i[j2k2] * tw2_i[None, :] % q) * n_inv % q  # [k2][j2]
        for e in range(WDIG):
            combs[e, i] = pow(2, WDIG_BITS * e, q)

    qs_np = np.asarray(qs, np.int64)
    qcol = qs_np.reshape(L, 1, 1)
    shoup = lambda w, qq: jnp.asarray(ma.shoup_precompute(w, qq))
    # Pallas-only builds elide the bf16/f32 digit-plane tables (15 of the
    # ~18 MiB/limb — ~0.9 GiB at the production basis): the int8 Pallas
    # kernels never read them, and _fwd/_inv assert if the XLA fallback is
    # ever reached with elided tables (FHE_NTT_PALLAS=0 forces full).
    import os
    elide = (n1 == 128 and jax.default_backend() == "tpu"
             and os.environ.get("FHE_NTT_PALLAS", "1") != "0")
    zf = jnp.zeros((WDIG, L, 1, 1), _digit_dtype())
    return LimbTables(
        n=n, n1=n1, n2=n2, qs_key=tuple(int(q) for q in qs),
        q=jnp.asarray(qcol.astype(np.uint32)),
        w2f=zf if elide else _expand_w(w2f, qs_np, 1),
        w1f=zf if elide else _expand_w(w1f, qs_np, 2),
        tf=jnp.asarray(tf.astype(np.uint32)),
        tf_s=shoup(tf, qcol),
        w1i=zf if elide else _expand_w(w1i, qs_np, 2),
        ti=jnp.asarray(ti.astype(np.uint32)),
        ti_s=shoup(ti, qcol),
        w2i=zf if elide else _expand_w(w2i, qs_np, 1),
        comb_c=jnp.asarray(combs.reshape(WDIG, L, 1, 1).astype(np.uint32)),
        comb_s=shoup(combs.reshape(WDIG, L, 1, 1), qs_np.reshape(1, L, 1, 1)),
        w2f8=_expand_w_i8(w2f, qs_np, 1),
        w1f8=_expand_w_i8(w1f, qs_np, 2),
        w1i8=_expand_w_i8(w1i, qs_np, 2),
        w2i8=_expand_w_i8(w2i, qs_np, 1),
    )


def _mod_matmul(x, w_planes, tbl: LimbTables, side: str):
    """Exact modular matmul of x (..., L, a, b) with expanded digit matrix.

    side='right': out[..,i,k] = sum_j x[..,i,j] * W[j,k]   (contract -1 axis)
    side='left':  out[..,i,k] = sum_j W[i,j] * x[..,j,k]   (contract -2 axis)

    """
    out = None
    if side == "right":
        xd = _x_digits(x, -1)               # (..., L, a, XDIG*b)
    else:
        xd = _x_digits(x, -2)               # (..., L, XDIG*a, b)
    for e in range(WDIG):
        if side == "right":
            p = jnp.einsum("...lim,lmk->...lik", xd, w_planes[e],
                           preferred_element_type=jnp.float32)
        else:
            p = jnp.einsum("lim,...lmk->...lik", w_planes[e], xd,
                           preferred_element_type=jnp.float32)
        term = ma.shoup_mulmod(p.astype(jnp.uint32),
                               tbl.comb_c[e], tbl.comb_s[e], tbl.q)
        out = term if out is None else ma.addmod(out, term, tbl.q)
    return out


def _use_pallas(t: LimbTables) -> bool:
    """Fused Pallas kernel on real TPU for the production decomposition
    (n1=128 keeps every MXU operand lane-aligned); plain XLA elsewhere
    (CPU tests, tiny rings).  FHE_NTT_PALLAS=0 forces the XLA path."""
    import os
    return (t.n1 == 128 and jax.default_backend() == "tpu"
            and os.environ.get("FHE_NTT_PALLAS", "1") != "0")


def _runs(rows):
    """Decompose a sorted index tuple into contiguous (start, stop)
    runs.  Every basis subset this framework uses is 1-2 runs (prefix of
    actives + the specials block), so slicing via runs turns per-kernel
    table materialization from a slow gather into plain DMA slices."""
    out = []
    start = prev = rows[0]
    for r in rows[1:]:
        if r == prev + 1:
            prev = r
            continue
        out.append((start, prev + 1))
        start = prev = r
    out.append((start, prev + 1))
    return out


def rows_of(t: LimbTables) -> LimbTables:
    """Materialize a lazy row subset — inside jit this lowers to 1-2
    contiguous slices + concat per field (DMA-speed; a fancy-index gather
    here measured several extra seconds per bootstrap), CSE'd per
    compiled kernel; outside jit it behaves like the old eager slice."""
    if t.rows is None:
        return t
    runs = _runs(tuple(t.rows))

    def sel(a, axis):
        parts = [jax.lax.slice_in_dim(a, lo, hi, axis=axis)
                 for lo, hi in runs]
        return parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=axis)

    return LimbTables(
        n=t.n, n1=t.n1, n2=t.n2, qs_key=t.qs_key, rows=None,
        q=sel(t.q, 0),
        w2f=sel(t.w2f, 1), w1f=sel(t.w1f, 1), tf=sel(t.tf, 0),
        tf_s=sel(t.tf_s, 0), w1i=sel(t.w1i, 1), ti=sel(t.ti, 0),
        ti_s=sel(t.ti_s, 0), w2i=sel(t.w2i, 1),
        comb_c=sel(t.comb_c, 1), comb_s=sel(t.comb_s, 1),
        w2f8=sel(t.w2f8, 1), w1f8=sel(t.w1f8, 1),
        w1i8=sel(t.w1i8, 1), w2i8=sel(t.w2i8, 1),
    )


@jax.jit
def _fwd(x, t: LimbTables):
    t = rows_of(t)
    if _use_pallas(t):
        from . import ntt_pallas
        return ntt_pallas.fwd(x, t)
    assert t.w2f.shape[-1] == t.n2, \
        "bf16 NTT tables were elided (Pallas-only build); " \
        "set FHE_NTT_PALLAS=0 BEFORE table construction"
    y = x.reshape(*x.shape[:-1], t.n2, t.n1)
    y = jnp.swapaxes(y, -1, -2)                       # [j1][j2]
    b = _mod_matmul(y, t.w2f, t, "right")
    c = ma.shoup_mulmod(b, t.tf, t.tf_s, t.q)
    z = _mod_matmul(c, t.w1f, t, "left")              # [k1][k2]
    return z.reshape(*x.shape[:-1], t.n)


@jax.jit
def _inv(X, t: LimbTables):
    t = rows_of(t)
    if _use_pallas(t):
        from . import ntt_pallas
        return ntt_pallas.inv(X, t)
    assert t.w2i.shape[-1] == t.n2, \
        "bf16 NTT tables were elided (Pallas-only build); " \
        "set FHE_NTT_PALLAS=0 BEFORE table construction"
    m = X.reshape(*X.shape[:-1], t.n1, t.n2)          # [k1][k2]
    d = _mod_matmul(m, t.w1i, t, "left")
    e = ma.shoup_mulmod(d, t.ti, t.ti_s, t.q)
    f = _mod_matmul(e, t.w2i, t, "right")             # [j1][j2]
    f = jnp.swapaxes(f, -1, -2)
    return f.reshape(*X.shape[:-1], t.n)


class NttContext:
    """NTT engine over a fixed full RNS basis; ops take static limb slices."""

    def __init__(self, n: int, qs: tuple[int, ...]):
        self.n = n
        self.qs = tuple(int(q) for q in qs)
        self.full = _build_tables(n, self.qs)
        self._slices: dict[tuple[int, ...], LimbTables] = {}

    def tables(self, limbs: tuple[int, ...] | None = None,
               dense: bool = False) -> LimbTables:
        """Limb-subset tables.  LAZY by default: the returned pytree
        shares the full-basis buffers and records the subset in `rows`
        (kernels slice at trace time via rows_of).  dense=True
        materializes eagerly — only for consumers that index table fields
        directly (the shard_map plans)."""
        if limbs is None or tuple(limbs) == tuple(range(len(self.qs))):
            return self.full
        key = tuple(limbs)
        if not dense:
            t = self.full
            return LimbTables(
                n=t.n, n1=t.n1, n2=t.n2,
                qs_key=tuple(self.qs[i] for i in key), rows=key,
                q=t.q, w2f=t.w2f, w1f=t.w1f, tf=t.tf, tf_s=t.tf_s,
                w1i=t.w1i, ti=t.ti, ti_s=t.ti_s, w2i=t.w2i,
                comb_c=t.comb_c, comb_s=t.comb_s,
                w2f8=t.w2f8, w1f8=t.w1f8, w1i8=t.w1i8, w2i8=t.w2i8)
        if key not in self._slices:
            self._slices[key] = rows_of(LimbTables(
                n=self.full.n, n1=self.full.n1, n2=self.full.n2,
                qs_key=tuple(self.qs[i] for i in key), rows=key,
                q=self.full.q, w2f=self.full.w2f, w1f=self.full.w1f,
                tf=self.full.tf, tf_s=self.full.tf_s, w1i=self.full.w1i,
                ti=self.full.ti, ti_s=self.full.ti_s, w2i=self.full.w2i,
                comb_c=self.full.comb_c, comb_s=self.full.comb_s,
                w2f8=self.full.w2f8, w1f8=self.full.w1f8,
                w1i8=self.full.w1i8, w2i8=self.full.w2i8))
        return self._slices[key]

    def fwd(self, x, limbs: tuple[int, ...] | None = None):
        """x: (..., L, N) u32 coefficients < q  ->  (..., L, N) eval values."""
        return _fwd(x, self.tables(limbs))

    def inv(self, X, limbs: tuple[int, ...] | None = None):
        return _inv(X, self.tables(limbs))

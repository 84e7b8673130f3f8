"""A/B the eval-domain Galois permutation on the real TPU.

The automorphism's eval-index map is AFFINE: s(k) = (t*k + (t-1)/2) mod n
(context.galois_perm).  Viewing the flat eval axis as (n2=256 rows, n1=128
lanes), k = 128 r + l:

    s(r, l) = 128 * ((t*r + beta(l)) mod 256) + gamma(l)
    with u(l) = (t*l + s0) mod n, beta = u // 128, gamma = u % 128

so the arbitrary 32768-entry lane gather (strategy A, the current
_galois_core implementation) factors into
  1. lane gather by gamma (shared 128-entry map)
  2. per-lane roll by rho(l) = t^{-1} beta(l) mod 256 (8 conditional rolls)
  3. shared stride row gather r -> t*r mod 256 (256-entry map)
(strategy B), or 1. + a take_along_axis row gather (strategy C), or with
steps 1/3 done as one-hot int8 MXU matmuls (strategy D).

Chained-marginal timing as in bench.py (tunnel dispatch excluded).
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 15
N1, N2 = 128, 256   # lanes, rows
B, L = 8, 24
T = pow(5, 7, 2 * N)   # a representative rotation's automorphism exponent


def perm_flat(t):
    k = np.arange(N, dtype=np.int64)
    return ((t * (2 * k + 1) % (2 * N)) - 1) // 2


def factored_maps(t):
    # out[r, l] = in[(t*r + beta(l)) % 256, gamma(l)]
    #           = stride_t( roll_rows_by_beta(l)( lane_gather_gamma(in) ) )
    s0 = (t - 1) // 2
    l = np.arange(N1, dtype=np.int64)
    u = (t * l + s0) % N
    beta, gamma = u // N1, u % N1
    rowmap = (t * np.arange(N2, dtype=np.int64)) % N2
    return gamma.astype(np.int32), beta.astype(np.int32), rowmap.astype(np.int32)


def one_hot_perm(m, size):
    P = np.zeros((size, size), np.int8)
    P[np.arange(size), m] = 1
    return P


def timed(name, fn, x, k=8, iters=6):
    @jax.jit
    def c1(a):
        return jax.lax.fori_loop(0, 1, lambda i, v: fn(v), a)

    @jax.jit
    def ck(a):
        return jax.lax.fori_loop(0, k, lambda i, v: fn(v), a)

    for c in (c1, ck):
        jax.block_until_ready(c(x))
    ts = []
    for c in (c1, ck):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = c(x)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    dt = max((ts[1] - ts[0]) / (k - 1), 1e-9)
    gbs = x.nbytes * 2 / dt / 1e9
    print(f"{name:24s} {dt*1e3:8.3f} ms  ({gbs:6.1f} GB/s eff)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 30, (B, L, N), np.int64)
                    .astype(np.uint32))
    # NB: every constant stays NUMPY — jnp constants captured at trace
    # time round-trip through the tunneled device during remote lowering
    # (multi-minute stalls; see ops/ntt.py:_x_digits note).
    pf = perm_flat(T).astype(np.int32)
    gamma, rho_np, rowmap = factored_maps(T)
    gamma_j = gamma
    rowmap_j = rowmap
    Pg = one_hot_perm(gamma, N1)          # lane perm (gather cols)
    Pr = one_hot_perm(rowmap, N2)         # row perm

    def strat_a(v):
        return jnp.take(v, pf, axis=-1)

    def strat_a2(v):
        return jnp.take(v, pf, axis=-1, mode="clip",
                        unique_indices=True, indices_are_sorted=False)

    def rolled(y):
        # per-lane roll by rho(l) along the row axis, 8 conditional stages
        for b in range(8):
            amt = 1 << b
            bit = ((rho_np >> b) & 1).astype(bool)
            y = jnp.where(bit, jnp.roll(y, -amt, axis=-2), y)
        return y

    def strat_b(v):
        y = v.reshape(B, L, N2, N1)
        y = jnp.take(y, gamma_j, axis=-1)
        y = rolled(y)
        y = jnp.take(y, rowmap_j, axis=-2)
        return y.reshape(B, L, N)

    # full 2-D row-index matrix for take_along_axis: R[r, l]
    R2 = (T * np.arange(N2, dtype=np.int64)[:, None]
          + rho_np[None, :].astype(np.int64)) % N2
    R2j = R2.astype(np.int32)

    def strat_c(v):
        y = v.reshape(B, L, N2, N1)
        y = jnp.take(y, gamma_j, axis=-1)
        idx = jnp.broadcast_to(R2j, y.shape)
        y = jnp.take_along_axis(y, idx, axis=-2)
        return y.reshape(B, L, N)

    def mm_rows(y, P):
        # out[r] = y[map[r]]  <=>  out = P @ y with P[r, map[r]] = 1
        lo = (y & 0xFFFF).astype(jnp.float32)
        hi = (y >> 16).astype(jnp.float32)
        Pf = P.astype(jnp.float32)
        olo = jnp.einsum("rs,blsn->blrn", Pf, lo,
                         preferred_element_type=jnp.float32, precision="highest")
        ohi = jnp.einsum("rs,blsn->blrn", Pf, hi,
                         preferred_element_type=jnp.float32, precision="highest")
        return olo.astype(jnp.uint32) | (ohi.astype(jnp.uint32) << 16)

    def mm_lanes(y, P):
        # out[., l] = y[., map[l]] <=> out = y @ P^T; P[l, map[l]] = 1
        lo = (y & 0xFFFF).astype(jnp.float32)
        hi = (y >> 16).astype(jnp.float32)
        Pf = P.astype(jnp.float32)
        olo = jnp.einsum("blrs,ts->blrt", lo, Pf,
                         preferred_element_type=jnp.float32, precision="highest")
        ohi = jnp.einsum("blrs,ts->blrt", hi, Pf,
                         preferred_element_type=jnp.float32, precision="highest")
        return olo.astype(jnp.uint32) | (ohi.astype(jnp.uint32) << 16)

    def strat_d(v):
        y = v.reshape(B, L, N2, N1)
        y = mm_lanes(y, Pg)
        y = rolled(y)
        y = mm_rows(y, Pr)
        return y.reshape(B, L, N)

    def _planes(y):
        # u32 -> 4 balanced base-256 int8 planes (exact, wraps mod 2^32)
        outs = []
        v = y
        for _ in range(4):
            u = (v & 255).astype(jnp.int32)
            d = jnp.where(u >= 128, u - 256, u)
            outs.append(d.astype(jnp.int8))
            v = (v - d.astype(jnp.uint32)) >> 8
        return jnp.stack(outs)

    def _recomb(p):
        o = p[0].astype(jnp.uint32)
        for i in range(1, 4):
            o = o + (p[i].astype(jnp.uint32) << (8 * i))
        return o

    def strat_d2(v):
        y = v.reshape(B, L, N2, N1)
        p = _planes(y)                                   # (4, B, L, N2, N1)
        p = jnp.einsum("dblrs,ts->dblrt", p, Pg,
                       preferred_element_type=jnp.int32)
        p = rolled(p)
        p = jnp.einsum("rs,dblsn->dblrn", Pr, p,
                       preferred_element_type=jnp.int32)
        return _recomb(p).reshape(B, L, N)

    ref = np.asarray(jax.jit(strat_a)(x))
    print("ref done", flush=True)
    for nm, f in [("B factored", strat_b),
                  ("D mxu+roll", strat_d), ("D2 int8mxu", strat_d2)]:
        got = np.asarray(jax.jit(f)(x))
        ok = np.array_equal(got, ref)
        print(f"{nm}: {'OK' if ok else 'MISMATCH'}", flush=True)
        assert ok, nm

    timed("A take(flat)", strat_a, x)
    timed("B gather+roll+gather", strat_b, x)
    timed("D mxu+roll+mxu", strat_d, x)
    timed("D2 int8 mxu+roll", strat_d2, x)


if __name__ == "__main__":
    main()

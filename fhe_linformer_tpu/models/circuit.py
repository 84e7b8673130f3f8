"""Encrypted Linformer forward circuit.

Re-design of the reference circuit (encoder1/pooler/classifier,
/root/reference/src/main_2.cpp:145-430 and main.cpp:145-475) with the same
packing calculus but TPU-batched execution:

  * per-token ciphertexts ride a leading batch axis — matmuls, exp, GELU
    and rotations process all tokens in single fused device ops;
  * the O(S) rotate(-1) interleave chains become log-tree batched Galois
    ops (linalg.packed.interleave_batch);
  * levels/scales are tracked automatically; weights encode lazily at the
    consuming level (the reference re-reads weight files per level).

Deliberate deviation: the affine-norm multiplies a/b in *expanded* layout
(per-dimension), matching the golden model
(compute_20ng_linformer_forward.py:211-221).  The reference's main_2.cpp
encodes them 'repeated' (per-token-lane), which does not implement the
plaintext model; we follow the math, not the bug.

The circuit is dimension-parameterized: d (block), k_lin, d_ffn, so the
identical code runs as a tiny CPU test model and the full d=128/k=32 model.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ckks.ciphertext import Ciphertext, Plaintext
from ..ckks.evaluator import Evaluator
from ..linalg.packed import PackedOps
from ..poly.gadgets import Gadgets
from .golden import LinformerWeights, client_preprocess


@dataclass
class CircuitParams:
    """Approximation knobs (reference values in comments)."""
    r: float = 1.0 / 8.0          # softmax temperature (main_2.cpp:1031)
    inv_range: tuple = (-1.0, 190000.0)   # eval_inverse_naive (main_2.cpp:210)
    inv_degree: int = 119
    gelu_clip: float = 1.0 / 8.0  # GELU_max_abs_value (main_2.cpp:290)
    gelu_degree: int = 119
    tanh_scale: float = 1.0 / 18.0  # main_2.cpp:385 (1/50 in main.cpp:430)
    tanh_degree: int = 300
    exp_pow8: bool = True         # Taylor(s/64)^8 (circuit) vs Taylor(s/8)


class EncryptedLinformer:
    def __init__(self, ev: Evaluator, w: LinformerWeights,
                 params: CircuitParams | None = None, d: int | None = None):
        self.ev = ev
        self.w = w
        self.p = params or CircuitParams()
        self.d = d or w.d
        self.ops = PackedOps(ev, self.d)
        self.g = Gadgets(ev)
        self._pt_cache: dict = {}

    # -- plaintext encodes, cached per (name, nl) ----------------------

    def _pt(self, name: str, slots: np.ndarray, nl: int,
            scale: float | None = None) -> Plaintext:
        key = (name, nl, scale)
        if key not in self._pt_cache:
            self._pt_cache[key] = self.ev.encode(slots, nl=nl, scale=scale)
        return self._pt_cache[key]

    # -- client-side input preparation ---------------------------------

    def encrypt_inputs(self, emb: np.ndarray, nl: int | None = None):
        """Token embeddings (S, d) -> encrypted (x, XE, XF) batches in
        expanded layout (read_expanded_input parity, batched).  `nl`
        encrypts at a reduced level — the reference's read_*_input level
        arguments (FHEController.cpp:501-698); with bootstrapping in the
        circuit this is also the HBM lever: at S=700 a full-chain token
        batch is ~7 GB, a 10-level one ~1.6 GB."""
        w, ops, ev = self.w, self.ops, self.ev
        x_in, X_E, X_F = client_preprocess(w, emb)
        xs = np.stack([ops.expanded_slots(row) for row in x_in])
        es = np.stack([ops.expanded_slots(row) for row in X_E])
        fs = np.stack([ops.expanded_slots(row) for row in X_F])
        return (ev.encrypt(xs, batch=True, nl=nl),
                ev.encrypt(es, batch=True, nl=nl),
                ev.encrypt(fs, batch=True, nl=nl), x_in.shape[0])

    # -- circuit stages -------------------------------------------------

    def _matmul_re_w(self, cts: Ciphertext, W: np.ndarray, b: np.ndarray,
                     name: str, w_scale: float = 1.0) -> Ciphertext:
        ops, ev = self.ops, self.ev
        w_pt = self._pt(name, ops.matrix_re_slots(W * w_scale), cts.nl)
        out = ev.mul_plain(cts, w_pt)
        out = ops.rotsum(out, ops.nb, ops.d)
        if b is not None:
            pt = ev.encode(ops.repeated_slots(b * w_scale),
                           nl=out.nl, scale=out.scale)
            out = ev.add_plain(out, pt)
        return out

    def attention(self, x_cts, xe_cts, xf_cts, S_total, cls_only=False,
                  boot=None):
        """Scores + poly-softmax + value mix + output proj (+ residual).
        Returns per-token expanded-dirty cts (lane 0 of block j = dim j).
        `boot` enables the reference's conditional mid-exp refresh
        (FHEController.cpp:1293-1295) when levels run short."""
        ev, ops, w, p = self.ev, self.ops, self.w, self.p
        d, nb = ops.d, ops.nb

        Q = self._matmul_re_w(x_cts, w.WQ, w.BQ, "WQ")         # (S,) repeated
        K = self._matmul_re_w(xe_cts, w.WK, w.BK, "WK")        # (k,) repeated
        V = self._matmul_re_w(xf_cts, w.WV, w.BV, "WV")

        # wrap K, V rows into single cts: block j = row j (batched tree)
        K_w = self._wrap_rows(K)
        V_w = self._wrap_rows(V)

        # scores per query chunk of <= d lanes
        m = 1 if cls_only else min(d, S_total)
        nchunk = 1 if cls_only else -(-S_total // m)
        Sq = 1 if cls_only else S_total
        Qb = Q.with_data(Q.c0[:Sq], Q.c1[:Sq])
        chunks = []
        for c in range(nchunk):
            qc = Qb.with_data(Qb.c0[c * m:(c + 1) * m], Qb.c1[c * m:(c + 1) * m])
            prod = ev.mul(qc, K_w)                  # ct x ct
            sc = ops.rotsum(prod, d, 1)             # dot at lane 0 per block
            mval = p.r / 8.0 if p.exp_pow8 else p.r
            mask = ops.mask_mod_n(d, value=mval)
            sc = ev.mul_plain(sc, ev.encode_cached(
                ("score_mask", d, mval), mask, nl=sc.nl))
            sc = ops.interleave_batch(sc, stride=1)  # lanes = queries
            chunks.append(sc)
        scores = _stack(chunks)                      # (nchunk, ...) batch
        # free the (S, limbs, n) query buffers before the raised-level
        # boot inside eval_exp — at S=700 they are ~1.7 GB the mid-exp
        # bootstrap's working set cannot spare
        del Q, Qb, chunks, prod, qc, sc

        # depth the rest of attention needs after the Taylor: power-raise
        # (3) + deg-d inverse Chebyshev + mix/proj/affine tail (~6)
        from ..poly.gadgets import relu_degree_depth
        need = 3 + relu_degree_depth(p.inv_degree) + 6
        scores = self.g.eval_exp(scores, pow8=p.exp_pow8, boot=boot,
                                 boot_below=need)  # exp(s*r), batched
        ssum = ops.rotsum(scores, self.w.k_lin, d)   # row sums over k blocks
        inv = self.g.eval_inverse(ssum, *p.inv_range, degree=p.inv_degree)
        attn = ev.mul(scores, inv)

        # back to per-query repeated cts: (nchunk, m, ...) -> flat (Sq, ...)
        outs = []
        for c in range(attn.c0.shape[0]):
            one = attn.with_data(attn.c0[c], attn.c1[c])
            mq = m if (c + 1) * m <= Sq else Sq - c * m
            outs.append(self.ops.unwrap_to_repeated(one, mq))
        attn_q = _stack_cat(outs)                    # (Sq, ...) repeated
        del outs, attn, scores, inv, ssum

        prod = ev.mul(attn_q, V_w)
        del attn_q
        O = ops.rotsum(prod, nb, d)                  # (Sq,) repeated = attn @ V
        del prod

        wo = self._pt("WO_cr", _cr_flat(w.WO, nb, d), O.nl)
        out = ev.mul_plain(O, wo)
        out = ops.rotsum(out, d, 1)                  # expanded-dirty
        bo = ev.encode(ops.expanded_slots(w.BO), nl=out.nl, scale=out.scale)
        out = ev.add_plain(out, bo)

        if cls_only and S_total > 1:
            import jax.numpy as jnp
            z0 = jnp.zeros((S_total - 1,) + out.c0.shape[1:], out.c0.dtype)
            out = out.with_data(jnp.concatenate([out.c0, z0]),
                                jnp.concatenate([out.c1, z0]))
        # residual with original inputs (expanded; lane-0 slots valid)
        x_adj, out = ev.match(x_cts, out)
        return ev.add(x_adj, out)

    def _wrap_rows(self, rows: Ciphertext) -> Ciphertext:
        """(k, ...) repeated batch -> one ct, block j = row j: mask block 0
        then interleave with stride d (log-tree; wrapUpRepeated parity)."""
        ev, ops = self.ev, self.ops
        pt = ev.encode_cached(("mask_block0", ops.d), ops.mask_block(0),
                              nl=rows.nl)
        masked = ev.mul_plain(rows, pt)
        return ops.interleave_batch(masked, stride=ops.d)

    def affine(self, wrapped: Ciphertext, a, b, c, S_total) -> Ciphertext:
        """Sequence-adaptive affine on wrapped (dim-major) cts — a/b in
        expanded layout (see module docstring on the reference deviation)."""
        ev, ops = self.ev, self.ops
        fL = c[0] + c[1] / np.sqrt(S_total) + c[2] / S_total
        a_pt = ev.encode(ops.expanded_slots(a * fL), nl=wrapped.nl)
        out = ev.mul_plain(wrapped, a_pt)
        b_pt = ev.encode(ops.expanded_slots(b * fL), nl=out.nl, scale=out.scale)
        return ev.add_plain(out, b_pt)

    def wrap_tokens(self, dirty: Ciphertext) -> Ciphertext:
        """(S, ...) expanded-dirty -> chunked wrapped cts (lane t = token t,
        block j = dim j): mask lane 0 + log-tree interleave per <=d chunk."""
        ev, ops = self.ev, self.ops
        S = dirty.c0.shape[0]
        m = min(ops.d, S)
        pt = ev.encode_cached(("mask_mod_n", ops.d, 0),
                              ops.mask_mod_n(ops.d), nl=dirty.nl)
        masked = ev.mul_plain(dirty, pt)
        outs = []
        for c in range(-(-S // m)):
            part = masked.with_data(masked.c0[c * m:(c + 1) * m],
                                    masked.c1[c * m:(c + 1) * m])
            outs.append(ops.interleave_batch(part, stride=1))
        return _stack(outs)

    def unwrap_tokens(self, wrapped: Ciphertext, S_total: int,
                      count: int | None = None) -> Ciphertext:
        """Chunked wrapped cts -> (S, ...) expanded batch.  `count` unwraps
        only the first `count` tokens (e.g. count=1 extracts just the CLS
        ct for the pooler — at S=700 a full unwrap is a ~4 GB batch the
        classifier never reads)."""
        ops = self.ops
        outs = []
        left = S_total if count is None else min(count, S_total)
        for c in range(wrapped.c0.shape[0]):
            if left <= 0:
                break
            one = wrapped.with_data(wrapped.c0[c], wrapped.c1[c])
            mq = min(ops.d, left)
            ev = self.ev
            batch = ops.deinterleave_batch(one, mq, 1)
            pt = ev.encode_cached(("mask_mod_n", ops.d, 0),
                                  ops.mask_mod_n(ops.d), nl=batch.nl)
            masked = ev.mul_plain(batch, pt)
            outs.append(ops.repeat(masked, ops.d, 1))  # expanded per token
            left -= mq
        return _stack_cat(outs)

    def ffn(self, x_cts: Ciphertext, use_containers: bool = True,
            boot=None, token_chunk: int | None = None,
            _force_containers: bool = False) -> Ciphertext:
        """FFN up (d->d_ffn in d-blocks) + GELU + down (d_ffn->d).
        x_cts: (S, ...) expanded.  Returns (S, ...) expanded-dirty.

        With use_containers the (nblk*S) FFN activations pack into
        ceil(nblk*S*d/slots) container ciphertexts before GELU — the
        reference's 32-token/512-wide containers
        (FHEController.cpp:1164-1205), built here with the batched log-tree
        instead of per-token rotate chains.  The deg-119 Chebyshev then
        touches ~d/nblk times fewer ciphertexts.

        `boot` refreshes the containers right after GELU (the reference's
        per-container bootstrap, main_2.cpp:315-319) — here ONE batched
        bootstrap call over all ceil(nblk*S*d/slots) containers.

        `token_chunk` processes the token batch in chunks of that size:
        the up-projection holds nblk cts per token at high level, which at
        S=700 would be a ~14 GB live array — chunking caps peak HBM at
        ~nblk*chunk cts while leaving per-token math identical (the
        reference's two-stream Q chunking, main_2.cpp:187-221, applied to
        the FFN)."""
        ev, ops, w, p = self.ev, self.ops, self.w, self.p
        d, nb = ops.d, ops.nb
        S_in = x_cts.c0.shape[0]
        if token_chunk and S_in > token_chunk:
            # every chunk must take the same (container) path so outputs
            # land on identical (nl, scale) — forced even for a small
            # remainder chunk (zero-padded to one container)
            assert token_chunk * (w.W1.shape[0] // d) > ops.slots // d
            outs = []
            for s in range(0, S_in, token_chunk):
                part = x_cts.with_data(x_cts.c0[s: s + token_chunk],
                                       x_cts.c1[s: s + token_chunk])
                outs.append(self.ffn(part, use_containers, boot,
                                     _force_containers=True))
            return _stack_cat(outs)
        nblk = w.W1.shape[0] // d
        import jax.numpy as jnp
        # up-projection: batch over (nblk, S)
        ups = []
        for bkt in range(nblk):
            Wb = w.W1[bkt * d:(bkt + 1) * d]
            Bb = w.B1[bkt * d:(bkt + 1) * d]
            ups.append(self._matmul_re_w(x_cts, Wb, Bb, f"W1_{bkt}",
                                         w_scale=p.gelu_clip))
        h = _stack(ups)                        # (nblk, S, ...) repeated
        S = h.c0.shape[1]

        G = ops.slots // d                     # pieces per container
        if use_containers and (nblk * S > G or _force_containers):
            # flatten to (S*nblk) in container order: piece j = u*nblk + b
            c0 = jnp.swapaxes(h.c0, 0, 1).reshape((S * nblk,) + h.c0.shape[2:])
            c1 = jnp.swapaxes(h.c1, 0, 1).reshape((S * nblk,) + h.c1.shape[2:])
            flat = h.with_data(c0, c1)
            ncont = -(-S * nblk // G)
            pad = ncont * G - S * nblk
            if pad:
                z = jnp.zeros((pad,) + c0.shape[1:], c0.dtype)
                flat = flat.with_data(jnp.concatenate([c0, z]),
                                      jnp.concatenate([c1, z]))
            pt = ev.encode_cached(("mask_block0", ops.d),
                                  ops.mask_block(0), nl=flat.nl)
            masked = ev.mul_plain(flat, pt)
            groups = masked.with_data(
                masked.c0.reshape((ncont, G) + masked.c0.shape[1:]),
                masked.c1.reshape((ncont, G) + masked.c1.shape[1:]))
            # merge the G axis into block offsets: log-tree over axis 1
            conts = []
            for c in range(ncont):
                one = groups.with_data(groups.c0[c], groups.c1[c])
                conts.append(ops.interleave_batch(one, stride=d))
            packed = _stack(conts)             # (ncont, ...) containers
            packed = self.g.eval_gelu(packed, -1.0, 1.0, mult=p.gelu_clip,
                                      degree=p.gelu_degree)
            if boot is not None:
                packed = boot.refresh(packed)
            # unpack: batch j of container c = piece c*G + j
            outs = []
            for c in range(packed.c0.shape[0]):
                one = packed.with_data(packed.c0[c], packed.c1[c])
                batch = ops.deinterleave_batch(one, G, stride=d)
                outs.append(batch)
            flat2 = _stack_cat(outs)
            flat2 = flat2.with_data(flat2.c0[: S * nblk], flat2.c1[: S * nblk])
            pt2 = ev.encode_cached(("mask_block0", ops.d),
                                   ops.mask_block(0), nl=flat2.nl)
            rep = ev.mul_plain(flat2, pt2)
            rep = ops.repeat(rep, nb, d)       # back to repeated layout
            h = rep.with_data(
                jnp.swapaxes(rep.c0.reshape((S, nblk) + rep.c0.shape[1:]), 0, 1),
                jnp.swapaxes(rep.c1.reshape((S, nblk) + rep.c1.shape[1:]), 0, 1))
        else:
            h = self.g.eval_gelu(h, -1.0, 1.0, mult=p.gelu_clip,
                                 degree=p.gelu_degree)
            if boot is not None:
                h = boot.refresh(h)
        # down-projection: sum_b W2[:, b-block] @ h_b  (CR layout per block)
        acc = None
        for bkt in range(nblk):
            hb = h.with_data(h.c0[bkt], h.c1[bkt])
            W2b = w.W2[:, bkt * d:(bkt + 1) * d]
            pt = self._pt(f"W2_{bkt}", _cr_flat(W2b, nb, d), hb.nl)
            t = ev.mul_plain(hb, pt, rescale=False)
            acc = t if acc is None else ev.add(acc, t)
        acc = ev.rescale(acc)
        out = ops.rotsum(acc, d, 1)                    # expanded-dirty
        b2 = ev.encode(ops.expanded_slots(w.B2), nl=out.nl, scale=out.scale)
        return ev.add_plain(out, b2)

    def pooler_classifier(self, cls_ct: Ciphertext,
                          boot=None) -> Ciphertext:
        """tanh pooler on CLS + linear head (main_2.cpp:382-427).  `boot`
        refreshes before the deg-300 tanh when levels run short (the
        reference bootstraps unconditionally here, main_2.cpp:390)."""
        ev, ops, w, p = self.ev, self.ops, self.w, self.p
        pooled = self._matmul_re_w(cls_ct, w.Wp, w.bp, "Wp",
                                   w_scale=p.tanh_scale)
        from ..poly.gadgets import relu_degree_depth
        if boot is not None and \
                pooled.nl - 1 < relu_degree_depth(p.tanh_degree) + 3:
            pooled = boot.refresh(pooled)
        pooled = self.g.eval_tanh(pooled, -1.0, 1.0, mult=p.tanh_scale,
                                  degree=p.tanh_degree)
        # classifier: CR layout (n_classes rows)
        fc = self._pt("Wc_cr", _cr_flat(w.Wc, ops.nb, ops.d), pooled.nl)
        out = ev.mul_plain(pooled, fc)
        out = ops.rotsum(out, ops.d, 1)
        ncls = w.Wc.shape[0]
        bias = np.zeros(ops.slots)
        bias[: ncls * ops.d: ops.d] = w.bc
        out = ev.add_plain(out, ev.encode(bias, nl=out.nl, scale=out.scale))
        mask = ops.mask_mod_n(ops.d)
        mask[ncls * ops.d:] = 0.0
        return ev.mul_plain(out, ev.encode(mask, nl=out.nl))

    # -- homomorphic E/F projection (multi-layer support) ---------------

    def ef_project(self, x_cts: Ciphertext, E: np.ndarray, b: np.ndarray,
                   S_total: int) -> Ciphertext:
        """XE_r = sum_t E[r, t] * x_t + b_r computed *homomorphically* —
        required for layers >= 2, where the sequence compression can no
        longer run client-side (the reference is single-layer and never
        needs this; dimReduce.py:148-156 does it in plaintext)."""
        ev, ops = self.ev, self.ops
        wrapped = self.wrap_tokens(x_cts)        # (chunks, ...) lane=token
        k_lin = E.shape[0]
        m = min(ops.d, S_total)
        rows = []
        for r in range(k_lin):
            acc = None
            for c in range(wrapped.c0.shape[0]):
                one = wrapped.with_data(wrapped.c0[c], wrapped.c1[c])
                coefs = np.zeros(ops.slots)
                nt = min(m, S_total - c * m)
                for t in range(nt):
                    coefs[t::ops.d] = E[r, c * m + t]
                pt = ev.encode(coefs, nl=one.nl)
                term = ev.mul_plain(one, pt, rescale=False)
                acc = term if acc is None else ev.add(acc, term)
            acc = ev.rescale(acc)
            mp = 1 << (m - 1).bit_length()       # lanes >= m hold zeros
            row = ops.rotsum(acc, mp, 1)         # lane 0 of block j = XE_r[j]
            rows.append(row)
        out = _stack(rows)                       # (k_lin, ...) expanded-dirty
        # clean to full expanded: mask lane 0 + repeat
        pt = ev.encode(ops.mask_mod_n(ops.d), nl=out.nl)
        out = ev.mul_plain(out, pt)
        out = ops.repeat(out, ops.d, 1)
        # bias: b_r adds to every dim of row r (dimReduce adds E_b per row)
        bias = np.stack([np.full(ops.slots, float(bb)) for bb in b])
        pt_b = ev.encode(bias, nl=out.nl, scale=out.scale, batch=True)
        return ev.add_plain(out, pt_b)

    def encoder_layer(self, x_cts, xe, xf, S_total, w=None,
                      cls_only=False, boot=None):
        """One full encoder layer: attention + affine1 + FFN + affine2.
        Returns per-token expanded cts.  `boot` (a boot.Bootstrapper) is
        applied at the reference's refresh points (main_2.cpp:274-275,318)."""
        w = w or self.w
        attn = self.attention(x_cts, xe, xf, S_total, cls_only, boot=boot)
        wrapped = self.wrap_tokens(attn)
        wrapped = self.affine(wrapped, w.a1, w.b1, w.c1, S_total)
        if boot is not None:
            wrapped = boot.refresh(wrapped)
        x2 = self.unwrap_tokens(wrapped, S_total)
        y = self.ffn(x2, boot=boot)
        x2m, ym = self.ev.match(x2, y)
        res = self.ev.add(x2m, ym)
        wrapped2 = self.wrap_tokens(res)
        wrapped2 = self.affine(wrapped2, w.a2, w.b2, w.c2, S_total)
        if boot is not None:
            wrapped2 = boot.refresh(wrapped2)
        return self.unwrap_tokens(wrapped2, S_total)

    # -- full forward ---------------------------------------------------

    def forward(self, emb: np.ndarray, cls_only: bool = False,
                extra_layers: list | None = None, boot=None,
                input_nl: int | None = None) -> Ciphertext:
        """End-to-end encrypted forward.  extra_layers: LinformerWeights
        for layers 2..N — their K/V compression runs homomorphically via
        ef_project (config-5 multi-layer path)."""
        x_cts, xe, xf, S_total = self.encrypt_inputs(emb, nl=input_nl)
        x = self.encoder_layer(x_cts, xe, xf, S_total, cls_only=cls_only,
                               boot=boot)
        for lw in (extra_layers or []):
            xe2 = self.ef_project(x, lw.E_w[:, :S_total], lw.E_b, S_total)
            xf2 = self.ef_project(x, lw.F_w[:, :S_total], lw.F_b, S_total)
            # the finished layer's encoded diagonals/masks (~GBs of eval
            # rows at production) are dead weight for the next layer's
            # HBM budget — re-encoding shared masks is seconds, an OOM
            # mid-GELU kills the run (cfg5, round-4 campaign)
            self.ev._enc_cache.clear()
            self._pt_cache.clear()
            import gc
            gc.collect()
            saved = self.w
            self.w = lw
            try:
                x = self.encoder_layer(x, xe2, xf2, S_total, boot=boot)
            finally:
                self.w = saved
        cls_ct = x.with_data(x.c0[0], x.c1[0])
        return self.pooler_classifier(cls_ct, boot=boot)

    def decrypt_logits(self, out: Ciphertext) -> np.ndarray:
        """Client decode: stride-d logits -> softmax-able vector
        (main.cpp:115-142)."""
        vals = np.real(np.asarray(self.ev.decrypt(out)))
        ncls = self.w.Wc.shape[0]
        return vals[: ncls * self.ops.d: self.ops.d]


def _cr_flat(W: np.ndarray, nb: int, d: int) -> np.ndarray:
    """CR weight layout: slot[d*j + i] = W[j][i] (rows over blocks)."""
    out = np.zeros((nb, d))
    out[: W.shape[0], : W.shape[1]] = W
    return out.reshape(-1)


def _stack(cts: list[Ciphertext]) -> Ciphertext:
    import jax.numpy as jnp
    return cts[0].with_data(jnp.stack([c.c0 for c in cts]),
                            jnp.stack([c.c1 for c in cts]))


def _stack_cat(cts: list[Ciphertext]) -> Ciphertext:
    import jax.numpy as jnp
    return cts[0].with_data(jnp.concatenate([c.c0 for c in cts]),
                            jnp.concatenate([c.c1 for c in cts]))

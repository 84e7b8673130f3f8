"""Packed homomorphic linear algebra over CKKS slots.

Re-implements the reference's packing calculus — expanded / repeated
layouts, rotate-accumulate trees, the RE/CR matmul families, masks, and
wrap/unwrap (/root/reference/src/FHEController.cpp:829-1357) — with two
TPU-native differences:

  * every op accepts ciphertexts with leading batch dims, so "loop over
    all S tokens" in the reference (e.g. main_2.cpp:182) becomes one fused
    batched TPU op here;
  * rotation keys are pure powers of two chosen deliberately (the reference
    ships a buggy ad-hoc set, see SURVEY.md §2.1 rotation-key note).

Layout conventions over `slots = nb * d` (reference: 16384 = 128 * 128):
  expanded:  slot[d*j + i] = v[j]   (value j fills block j)
  repeated:  slot[d*j + i] = v[i]   (d-vector tiled nb times)

A BSGS diagonal ct x pt-matrix multiply (matmul_bsgs) is provided as the
high-throughput alternative for matrix-packed ciphertexts.
"""

from __future__ import annotations

import math

import numpy as np

from ..ckks.ciphertext import Ciphertext, Plaintext
from ..ckks.evaluator import Evaluator


def _log2(x: int) -> int:
    l = x.bit_length() - 1
    assert 1 << l == x, f"{x} not a power of two"
    return l


class PackedOps:
    def __init__(self, ev: Evaluator, d: int = 128):
        self.ev = ev
        self.d = d
        self.slots = ev.ctx.cfg.slots
        self.nb = self.slots // d

    # -- rotation-key requirements ------------------------------------

    def required_rotations(self) -> tuple[int, ...]:
        """Power-of-two shifts (both signs) covering rotsum/repeat trees."""
        out = set()
        s = 1
        while s < self.slots:
            out.add(s)
            out.add(-s)
            s *= 2
        return tuple(sorted(out))

    # -- slot pattern builders (host numpy) ---------------------------

    def expanded_slots(self, v: np.ndarray) -> np.ndarray:
        full = np.zeros(self.nb)
        full[: len(v)] = v
        return np.repeat(full, self.d)

    def repeated_slots(self, v: np.ndarray) -> np.ndarray:
        full = np.zeros(self.d)
        full[: len(v)] = v
        return np.tile(full, self.nb)

    def matrix_re_slots(self, W: np.ndarray) -> np.ndarray:
        """Weight layout for matmul_re: slot[d*j + i] = W[i][j].
        (The reason the reference pipeline pre-transposes weights —
        transpose_w.py:10-37.)"""
        d = self.d
        out = np.zeros(self.slots)
        out[: W.shape[1] * d] = np.asarray(W).T.reshape(-1)[: W.shape[1] * d] \
            if W.shape[0] == d else np.pad(np.asarray(W).T, ((0, 0), (0, d - W.shape[0]))).reshape(-1)
        return out

    def matrix_cr_slots(self, W: np.ndarray) -> np.ndarray:
        """Weight layout for matmul_cr: slot[d*j + i] = W[j][i]."""
        d = self.d
        Wp = np.zeros((self.nb, d))
        Wp[: W.shape[0], : W.shape[1]] = W
        return Wp.reshape(-1)

    # -- mask library (FHEController.cpp:1207-1286) --------------------

    def mask_block(self, j: int, value: float = 1.0) -> np.ndarray:
        m = np.zeros(self.slots)
        m[j * self.d: (j + 1) * self.d] = value
        return m

    def mask_mod_n(self, n: int, value: float = 1.0, offset: int = 0) -> np.ndarray:
        m = np.zeros(self.slots)
        m[offset::n] = value
        return m

    def mask_first_n(self, n: int, value: float = 1.0) -> np.ndarray:
        m = np.zeros(self.slots)
        m[:n] = value
        return m

    def mask_heads(self, stride: int, value: float = 1.0) -> np.ndarray:
        """1 on the first `stride` lanes of every block (reference
        mask_heads with stride 64 / mask_heads_128)."""
        m = np.zeros(self.slots)
        for j in range(self.nb):
            m[j * self.d: j * self.d + stride] = value
        return m

    # -- rotate-accumulate trees (FHEController.cpp:829-867) -----------

    def rotsum(self, ct: Ciphertext, count: int, padding: int) -> Ciphertext:
        """slot[s] += sum over count strided copies: log-depth tree.
        With dedicated keys the whole tree runs as ONE scanned dispatch
        (Evaluator.rotate_accumulate_tree — the round-3 packed layer spent
        seconds of tunnel launch latency on these log-trees)."""
        ev = self.ev
        shifts = [padding * (1 << i) for i in range(_log2(count))]
        return self._acc_tree(ct, shifts)

    def repeat(self, ct: Ciphertext, count: int, padding: int = 1) -> Ciphertext:
        """Broadcast by negative-rotation tree."""
        shifts = [-padding * (1 << i) for i in range(_log2(count))]
        return self._acc_tree(ct, shifts)

    def _acc_tree(self, ct: Ciphertext, shifts) -> Ciphertext:
        ev = self.ev
        if ev.has_rotation_keys(shifts) and \
                getattr(ev, "_shard_mesh", None) is None:
            return ev.rotate_accumulate_tree(ct, shifts)
        for s in shifts:
            ct = ev.add(ct, ev.rotate(ct, s))
        return ct

    # -- matmul families (FHEController.cpp:869-1058) -------------------

    def matmul_re(self, ct_exp: Ciphertext, w_pt: Plaintext,
                  bias_slots: np.ndarray | None = None) -> Ciphertext:
        """expanded x (matrix in RE layout) -> repeated y = W x (+ b).
        Bias arrives as raw slots and is encoded at the post-rescale scale
        (the reference threads ct levels by hand for the same purpose)."""
        out = self.ev.mul_plain(ct_exp, w_pt)
        out = self.rotsum(out, self.nb, self.d)
        if bias_slots is not None:
            pt = self.ev.encode(bias_slots, nl=out.nl, scale=out.scale)
            out = self.ev.add_plain(out, pt)
        return out

    def matmul_cr(self, ct_rep: Ciphertext, w_pt: Plaintext,
                  width: int | None = None) -> Ciphertext:
        """repeated x (matrix in CR layout) -> expanded-dirty y = W x:
        slot[d*j] = y_j, other lanes hold partial garbage (masked later,
        exactly as the reference consumes it)."""
        out = self.ev.mul_plain(ct_rep, w_pt)
        return self.rotsum(out, width or self.d, 1)

    # -- BSGS diagonal matmul (the TPU-first path; north-star item) -----

    def matmul_bsgs(self, ct: Ciphertext, W: np.ndarray,
                    scale: float | None = None) -> Ciphertext:
        """y = W @ x for x packed plainly in the first dim slots
        (x in slots [0, dim)), W (dim x dim), dim a power of two dividing
        slots.  Baby-step/giant-step over generalized diagonals:
        dim rotations become ~2*sqrt(dim).

        For a matrix-packed ciphertext (nb tokens, one per block, each
        block a d-vector) pass W block-diagonalized: the same diagonal
        structure applies per block as long as rotations stay intra-block
        multiples — handled by diag construction below when wrap=d.
        """
        ev = self.ev
        dim = W.shape[0]
        assert W.shape == (dim, dim)
        bs = 1 << (int(math.ceil(_log2_f(dim) / 2)))
        gs = dim // bs
        # generalized diagonals over a wrap of `dim` replicated across slots
        diags = {}
        for k in range(dim):
            dk = np.array([W[i % dim][(i + k) % dim] for i in range(dim)])
            diags[k] = np.tile(dk, self.slots // dim)
        baby = ev.rotate_hoisted(ct, range(bs))   # shared decomposition
        acc = None
        for g in range(gs):
            inner = None
            for j in range(bs):
                k = g * bs + j
                if k >= dim:
                    break
                dk = np.roll(diags[k], g * bs)
                pt = ev.encode(dk, nl=ct.nl, scale=scale or ev.ctx.delta)
                term = ev.mul_plain(baby[j], pt, rescale=False)
                inner = term if inner is None else ev.add(inner, term)
            if inner is None:
                continue
            rot = ev.rotate(inner, g * bs) if g else inner
            acc = rot if acc is None else ev.add(acc, rot)
        return ev.rescale(acc)

    # -- batched log-tree interleave (TPU-native wrap/unwrap) -----------
    # The reference builds wrapped ciphertexts with an O(m) chain of
    # single-ct rotate(-1) ops (wrapUpExpanded, matmulScores interleave).
    # Here the same packing runs as log2(m) *batched* Galois ops: each
    # step merges ciphertext pairs, so the keyswitch work rides large
    # batch dims on the MXU instead of m sequential launches.

    def interleave_batch(self, ct: Ciphertext, stride: int = 1) -> Ciphertext:
        """(m, ...) batch -> single ct; batch index t lands at lane offset
        t*stride.  Caller pre-masks so merged slots don't collide."""
        ev = self.ev
        m = ct.c0.shape[0]
        mp = 1 << (m - 1).bit_length()
        if mp != m:
            import jax.numpy as jnp
            pad = [(0, mp - m)] + [(0, 0)] * (ct.c0.ndim - 1)
            ct = ct.with_data(jnp.pad(ct.c0, pad), jnp.pad(ct.c1, pad))
        step = 1
        while ct.c0.shape[0] > 1:
            even = ct.with_data(ct.c0[0::2], ct.c1[0::2])
            odd = ct.with_data(ct.c0[1::2], ct.c1[1::2])
            odd = ev.rotate(odd, -step * stride)
            ct = ev.add(even, odd)
            step *= 2
        return ct.with_data(ct.c0[0], ct.c1[0])

    def deinterleave_batch(self, ct: Ciphertext, m: int,
                           stride: int = 1) -> Ciphertext:
        """Single ct -> (m, ...) batch with batch element t = rotate(ct,
        t*stride) (callers then mask+repeat).

        When dedicated keys cover a prefix of the shifts, that prefix
        builds via ONE hoisted multi-rotate (one decomposition, one
        dispatch — Evaluator.multi_rotate_stack); remaining doublings use
        the batched-rotation tree (each step re-decomposes its whole
        accumulated batch)."""
        import jax.numpy as jnp
        ev = self.ev
        p = 1
        if getattr(ev, "_shard_mesh", None) is None:
            while p * 2 <= m and ev.has_rotation_keys(
                    [t * stride for t in range(1, p * 2)]):
                p *= 2
        if p > 1:
            stk = ev.multi_rotate_stack(ct, [t * stride
                                             for t in range(1, p)])
            out = ct.with_data(jnp.concatenate([ct.c0[None], stk.c0]),
                               jnp.concatenate([ct.c1[None], stk.c1]))
            k = p
        else:
            out = ct.with_data(ct.c0[None], ct.c1[None])
            k = 1
        while out.c0.shape[0] < m:
            rot = ev.rotate(out, k * stride)
            out = out.with_data(jnp.concatenate([out.c0, rot.c0]),
                                jnp.concatenate([out.c1, rot.c1]))
            k *= 2
        return out.with_data(out.c0[:m], out.c1[:m])

    def unwrap_to_repeated(self, ct: Ciphertext, m: int) -> Ciphertext:
        """Inverse of an interleaved wrap: produce an (m, ...) batch of
        repeated-layout cts, one per interleaved lane (reference
        unwrapExpanded, cpp:1086-1100, batched)."""
        ev = self.ev
        batch = self.deinterleave_batch(ct, m, 1)
        pt = ev.encode_cached(("mask_mod_n", self.d, 0),
                              self.mask_mod_n(self.d), nl=batch.nl)
        masked = ev.mul_plain(batch, pt)
        return self.repeat(masked, self.d, 1)

    # -- generic BSGS linear transform over sparse diagonals -----------

    def bsgs_diag_transform(self, ct: Ciphertext,
                            diags: dict[int, np.ndarray],
                            bs: int, scale: float | None = None,
                            double_rescale: bool = False,
                            rescale_mode: str | None = None) -> Ciphertext:
        """y_i = sum_k diags[k][i] * x[(i+k) mod slots]: BSGS over an
        arbitrary sparse diagonal set (complex diagonals allowed).  Used by
        bootstrapping CtS/StC group matrices and any dense linear layer.
        Rotation keys needed: {k % bs} ∪ {bs*(k//bs)} over the offsets.

        double_rescale: encode diagonals at the exact product of the two
        top primes and drop both after accumulation — the output scale
        returns to the input scale *exactly* and plaintext quantization
        drops from 2^-26 to ~2^-52 (costs one extra level; bootstrapping
        precision depends on this).

        rescale_mode generalizes it for the WIDE-scale bootstrap pipeline
        (boot/bootstrap.py wide mode — noise relative to a ~2^52 working
        scale instead of 2^26):
          "single" — pt at delta, drop 1 (the plain matmul path)
          "double" — pt at qd*qd2, drop 2, scale out == scale in (exact)
          "raise"  — pt at qd*qd2, drop 1: scale out = scale in * qd2,
                     entering the paired working scale
          "lower"  — pt at qd, drop 2: scale out = scale in / qd2,
                     exiting the paired working scale

        Offsets are decomposed STRIDE-AWARE: k = stride*(g*bs + j) with
        stride = gcd of all offsets.  Grouped butterfly-stage matrices
        (bootstrapping CtS/StC) have offsets on coarse strides (multiples
        of 512/16/... at M=16384); decomposing in stride units keeps the
        rotation-key set at ~bs + #giants per stride instead of one giant
        key per distinct offset (134 -> ~50 keys for the production
        bootstrap)."""
        import os
        ev = self.ev
        mode = rescale_mode or ("double" if double_rescale else "single")
        qd = float(ev.ctx.qs[ct.nl - 1])
        qd2 = float(ev.ctx.qs[ct.nl - 2]) if ct.nl >= 2 else 1.0
        if mode in ("double", "raise"):
            scale = qd * qd2
        elif mode == "lower":
            scale = qd
        else:
            scale = scale or ev.ctx.delta
        stride = self._diag_stride(diags.keys(), self.slots)
        by_giant: dict[int, dict[int, np.ndarray]] = {}
        for k, d in diags.items():
            g, j = divmod((k % self.slots) // stride, bs)
            by_giant.setdefault(g, {})[j] = d
        if os.environ.get("FHE_BSGS_COMBO", "1") == "1":
            # double-hoisted path: decompose once, and per giant group run
            # ONE fused rotate-combo (permutation + inner products only;
            # a single lazy mod-down) — the per-baby NTT work of the
            # hoisted path disappears.  Giant shifts without a dedicated
            # key compose from the +/- pow2 set (rotate_any).
            from ..ckks.evaluator import _hoist_decompose_core
            ks = ev.ctx.ks_tables(ct.nl)
            y_e = _hoist_decompose_core(ct.c1, ks)
            # stage 1 ONCE per transform: per-baby permutations + key
            # inner products, shared by every giant group (recomputing
            # them per (giant, baby) pair was a 10x bootstrap slowdown)
            baby_shifts = sorted({j * stride
                                  for js in by_giant.values() for j in js
                                  if j})
            stage1 = ev.combo_stage1(ct, y_e, baby_shifts, ks) \
                if baby_shifts else None
            # compressed level-independent plaintexts: one pair of 32-bit
            # coefficient planes per diagonal instead of per-level eval
            # rows — the cache-size lever that fits ~3k matmul + ~270
            # bootstrap diagonals in HBM
            groups = []
            for g, js in sorted(by_giant.items()):
                items = []
                for j, d in sorted(js.items()):
                    dk = np.roll(np.asarray(d), g * bs * stride)
                    cp = ev.encode_coeff_cached((id(diags), g, j), dk,
                                                scale=scale)
                    items.append((j * stride, cp))
                groups.append((g * bs * stride, items))
            fused = stage1 is not None and ev.has_rotation_keys(
                gs for gs, _ in groups)
            if fused:
                # every giant group in ONE scanned kernel + ONE batched
                # mod-down + ONE multi-rotate — ~9 dispatches per matmul
                # instead of ~60 (the tunneled chip's 20-35 ms dispatch
                # latency dominated the packed layer's wall time)
                gshifts, stacked = ev.combo_stage2_all(
                    ct, stage1, groups, baby_shifts, ks)
                acc = ev.multi_rotate_sum(stacked, gshifts)
            else:
                acc = None
                for gshift, items in groups:
                    inner = ev.combo_stage2(ct, stage1, items,
                                            baby_shifts, ks)
                    rot = ev.rotate_any(inner, gshift) if gshift else inner
                    acc = rot if acc is None else ev.add(acc, rot)
        else:
            baby_shifts = sorted({j * stride
                                  for js in by_giant.values() for j in js})
            babies = ev.rotate_hoisted(ct, baby_shifts)  # shared decomp
            acc = None
            for g, js in sorted(by_giant.items()):
                inner = None
                for j, d in sorted(js.items()):
                    dk = np.roll(np.asarray(d), g * bs * stride)
                    key = (id(diags), g, j)
                    pt = ev.encode_cached(key, dk, nl=ct.nl, scale=scale)
                    t = ev.mul_plain(babies[j * stride], pt, rescale=False)
                    inner = t if inner is None else ev.add(inner, t)
                rot = ev.rotate(inner, g * bs * stride) if g else inner
                acc = rot if acc is None else ev.add(acc, rot)
        acc = ev.rescale(acc)
        if mode == "double":
            acc = ev.rescale(acc)
            acc.scale = ct.scale        # exact by construction
        elif mode == "raise":
            acc.scale = ct.scale * qd2  # qd cancelled by the one rescale
        elif mode == "lower":
            acc = ev.rescale(acc)
            acc.scale = ct.scale / qd2
        return acc

    @staticmethod
    def _diag_stride(offsets, slots: int) -> int:
        g = slots
        for k in offsets:
            if k % slots:
                g = math.gcd(g, k % slots)
        return max(g, 1)

    @staticmethod
    def bsgs_required_rotations(offsets, bs: int, slots: int):
        stride = PackedOps._diag_stride(offsets, slots)
        need = set()
        for k in offsets:
            g, j = divmod((k % slots) // stride, bs)
            if j:
                need.add(j * stride)
            if g:
                need.add(g * bs * stride)
        return need

    # -- wrap / unwrap (FHEController.cpp:1060-1162) --------------------

    def wrap_up_repeated(self, cts: list[Ciphertext],
                         scale: float | None = None) -> Ciphertext:
        """Mask block j of ct j and sum: n repeated cts -> one ct whose
        block j holds ct j's d-vector."""
        ev = self.ev
        out = None
        for j, ct in enumerate(cts):
            pt = ev.encode(self.mask_block(j), nl=ct.nl,
                           scale=scale or ev.ctx.delta)
            t = ev.mul_plain(ct, pt, rescale=False)
            out = t if out is None else ev.add(out, t)
        return ev.rescale(out)

    def wrap_up_expanded(self, cts: list[Ciphertext]) -> Ciphertext:
        """Stride-mask + interleave n expanded-dirty cts into one ct:
        result slot[d*j + t] = ct_t's y_j (reference wrapUpExpanded)."""
        ev = self.ev
        out = None
        for t, ct in enumerate(cts):
            pt = ev.encode(self.mask_mod_n(self.d), nl=ct.nl)
            m = ev.mul_plain(ct, pt, rescale=False)
            if t:
                m = ev.rotate(m, -t)
            out = m if out is None else ev.add(out, m)
        return ev.rescale(out)

    def unwrap_expanded(self, ct: Ciphertext, index: int) -> Ciphertext:
        """Extract interleaved column `index` back to a repeated ct."""
        ev = self.ev
        pt = ev.encode(self.mask_mod_n(self.d, offset=index), nl=ct.nl)
        m = ev.mul_plain(ct, pt, rescale=False)
        if index:
            m = ev.rotate(m, index)
        m = ev.rescale(m)
        return self.repeat(m, self.d, 1)


def _log2_f(x: int) -> int:
    return x.bit_length() - 1

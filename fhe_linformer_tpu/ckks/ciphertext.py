"""Ciphertext / Plaintext host wrappers.

Unlike the reference, which tracks levels by hand at every call site
(/root/reference/src/main.cpp:231-232,311-312 pass GetLevel() around), the
wrapper owns (nl, scale) bookkeeping and the evaluator auto-inserts
rescales.  The wrapper is *not* a pytree: jitted kernels only ever see the
raw u32 arrays, so retraces key on shapes — never on the running scale.

Arrays may carry arbitrary leading batch dims (..., nl, N): the whole
framework is built to evaluate batches of ciphertexts (e.g. all sequence
tokens) in single fused TPU ops — the TPU-native replacement for the
reference's per-token C++ loops (e.g. main_2.cpp:182-245).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass
class Ciphertext:
    c0: jnp.ndarray          # (..., nl, N) u32, eval domain
    c1: jnp.ndarray
    nl: int                  # active q-limb count
    scale: float

    @property
    def batch_shape(self):
        return self.c0.shape[:-2]

    def with_data(self, c0, c1, nl=None, scale=None) -> "Ciphertext":
        return Ciphertext(c0, c1, self.nl if nl is None else nl,
                          self.scale if scale is None else scale)


@dataclass
class Plaintext:
    data: jnp.ndarray        # (..., nl, N) u32, eval domain
    shoup: jnp.ndarray | None  # optional Shoup precompute (consts only)
    nl: int
    scale: float

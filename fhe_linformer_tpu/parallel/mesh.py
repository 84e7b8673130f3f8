"""Device-mesh construction and sharding layouts.

The reference has no distributed backend at all (SURVEY.md §2.5); this is
pure new TPU-native design.  The natural axes for CKKS workloads:

  * `dp`   — ciphertext-batch axis (sequence tokens / samples).  All eval-
             domain ops are embarrassingly parallel here.
  * `limb` — RNS limb axis.  NTT, elementwise mult, rescale are limb-local
             (the NTT factorization never mixes limbs), so limb sharding is
             communication-free until base conversion / key switching,
             where limb-partial sums reduce with a single lazy-u32 psum
             (exact while alpha * q < 2**32, i.e. digit groups <= 4 limbs).

Collectives therefore ride ICI only at digit boundaries — the design the
north-star spec asks for (BASELINE.json: "RNS limbs and slot blocks
sharded over chips, rotation/key-switch partial sums via psum").
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, limb: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * limb
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, limb)
    return Mesh(arr, ("dp", "limb"))


def ct_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, L, N) ciphertext arrays: batch over dp, limbs over limb."""
    return NamedSharding(mesh, P("dp", "limb", None))


def limb_sharding(mesh: Mesh) -> NamedSharding:
    """(L, N) key/table arrays: limbs over limb axis, replicated over dp."""
    return NamedSharding(mesh, P("limb", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""fhe_linformer_tpu — a TPU-native CKKS homomorphic-encryption framework.

Built from scratch in JAX/XLA (MXU modular matmuls, batched ciphertext
ops, mesh-sharded RNS limbs) with the full capability surface of the
Hansard-T/FHE-Linformer reference stack: the CKKS primitive layer its
OpenFHE dependency provided, and the encrypted-Linformer application layer
the reference implements itself.  See SURVEY.md for the blueprint and
README.md for the layer map.
"""

__version__ = "0.1.0"

from . import primes  # noqa: F401

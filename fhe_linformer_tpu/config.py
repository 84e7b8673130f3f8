"""Config presets: one per driver benchmark config (BASELINE.json) plus
test-scale variants.

Replaces the reference's hard-coded parameter style (generate_context's
constants, FHEController.cpp:3-35; magic scales strewn through mains —
SURVEY.md §5 config notes) with declarative presets.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .ckks.context import CKKSConfig
from .models.circuit import CircuitParams


@dataclass(frozen=True)
class Preset:
    name: str
    desc: str
    ckks: CKKSConfig
    circuit: CircuitParams = field(default_factory=CircuitParams)
    d: int = 128
    k_lin: int = 32
    d_ffn: int = 512
    n_classes: int = 20
    max_seq: int = 700
    layers: int = 1
    bootstrap: bool = False


PRESETS: dict[str, Preset] = {}


def _reg(p: Preset) -> Preset:
    PRESETS[p.name] = p
    return p


# config 1: CKKS encrypt -> ct-pt linear projection -> decrypt roundtrip
_reg(Preset(
    name="roundtrip",
    desc="encrypt -> ct-pt linear projection -> decrypt (IMDB fasttext d128)",
    ckks=CKKSConfig(n=1 << 15, scale_bits=26, num_scaling=4, dnum=2),
))

# config 2: Galois rotations + BSGS ciphertext matmul (Linformer E/F, k=64)
_reg(Preset(
    name="bsgs-projection",
    desc="Galois rotations + BSGS ct matmul for E/F low-rank projection",
    ckks=CKKSConfig(n=1 << 15, scale_bits=26, num_scaling=8, dnum=2),
))

# config 3: encrypted attention scores + poly softmax + value matmul,
# single layer, no bootstrap (depth bought with a long chain, like the
# reference's HEStd_NotSet security stance)
_reg(Preset(
    name="attention-noboot",
    desc="encrypted attention + poly softmax + value matmul, no bootstrap",
    ckks=CKKSConfig(n=1 << 15, scale_bits=26, num_scaling=30, dnum=5),
))

# config 4: full single-layer Linformer forward with bootstrapping.
# dnum=3 measured ~1.5x keyswitch throughput of the reference's 4
# (tools/ab_dnum.py) with unchanged bootstrap precision.
# num_scaling=44: the production bootstrap (budget {3,3}, deg-119 sine,
# 3 double angles) consumes 24 levels (measured, tools/boot_full.py),
# leaving ~20 usable between refreshes — enough for the deepest circuit
# segment (post-mid-exp-boot: pow8 + deg-119 inverse + value mix + WO +
# affine, ~19 levels).  The reference runs 12 usable levels at 52-bit
# primes (FHEController.cpp:29); ours are 26-bit, so more/shallower limbs.
_reg(Preset(
    name="linformer-boot",
    desc="full single-layer encrypted Linformer with bootstrapping (R8)",
    ckks=CKKSConfig(n=1 << 15, scale_bits=26, num_scaling=44, dnum=3,
                    secret_hw=32),
    bootstrap=True,
))

# config 4w: the WIDE-bootstrap variant (round 4).  The boot's internal
# pipeline runs at the paired ~2^52 working scale with the input scale
# boosted toward q0 (BootConfig(wide=True, scale_boost=4)): single-pass
# precision 10.8 bits at 2^12 vs 2.4 for the 2^26-scale pipeline
# (tools/prec_probe.py) — the same mechanism as OpenFHE's 52-bit
# ScalingModSize (FHEController.cpp:20-21), paid in chain length instead
# of 64-bit limbs: the wide boot consumes ~35 limbs (measured), so the
# chain grows to num_scaling=56 to keep ~20 usable levels after refresh.
_reg(Preset(
    name="linformer-boot-w",
    desc="single-layer encrypted Linformer, wide (paired-scale) bootstrap",
    ckks=CKKSConfig(n=1 << 15, scale_bits=26, num_scaling=58, dnum=3,
                    secret_hw=32),
    bootstrap=True,
))

# config 5: multi-layer end-to-end classification.  num_scaling follows
# the wide-bootstrap chain (see linformer-boot-w): the circuit's
# inter-refresh segments are the same as the single-layer preset's.
_reg(Preset(
    name="multi-layer",
    desc="multi-layer encrypted Linformer classification end-to-end",
    ckks=CKKSConfig(n=1 << 15, scale_bits=26, num_scaling=58, dnum=3,
                    secret_hw=32),
    layers=2,
    bootstrap=True,
))

# security-calibrated variant: same circuit as linformer-boot but with a
# uniform ternary secret (the HE-standard table's assumption) and the QP
# budget inside the 128-bit classical bound — see security.assess().
# Ring 2^16: the production bootstrap consumes ~25 of the scaling levels,
# and holding 44 scaling limbs (25 boot + ~19 circuit) inside the
# 128-bit bound needs the larger ring (at 2^15 the bound is ~881 bits of
# QP — enough for only ~31 limbs total, which cannot even bootstrap).
# This mirrors standard practice: production CKKS bootstrapping at
# 128-bit runs at ring 2^16.
_reg(Preset(
    name="linformer-128c",
    desc="full bootstrapped Linformer at >=128-bit classical security",
    # num_scaling=46: the uniform-secret wide bootstrap (K=512, deg-201
    # Chebyshev, 6 double angles — see tools/ring128c_run.py) consumes
    # ~42 limbs at dense-prime rings plus a ring-2^16 drift tax (the
    # sparse 2^17-friendly prime pool spreads 2.36x; the magnitude-
    # matched pair interleave in primes.scaling_primes bounds the
    # wide-section drift).  48 limbs would breach the classical-128
    # modulus budget (headroom -25 bits); 46 leaves +57.  The QUANTUM
    # table bound is exceeded past 44 limbs — recorded in the artifact;
    # the preset's claim is classical, per its name.
    ckks=CKKSConfig(n=1 << 16, scale_bits=26, num_scaling=46, dnum=3),
    bootstrap=True,
))

# CPU-scale test variants (same code paths, tiny ring, shallow degrees)
_reg(Preset(
    name="tiny",
    desc="test-scale model: d=8, k=4, slots=128",
    ckks=CKKSConfig(n=256, scale_bits=26, num_scaling=58, dnum=8),
    circuit=CircuitParams(inv_range=(0.5, 40.0), inv_degree=13,
                          gelu_clip=1.0 / 4, gelu_degree=13,
                          tanh_scale=1.0 / 4, tanh_degree=13),
    d=8, k_lin=4, d_ffn=32, n_classes=5, max_seq=12,
))


def get(name: str) -> Preset:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]

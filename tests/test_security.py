"""Security calibration (security.py): HE-standard table lookups and the
preset claims.  The reference makes no security claim at all (HEStd_NotSet,
FHEController.cpp:10; --secure parsed but ignored, main.cpp:49-51) — these
tests pin down ours."""

import math

from fhe_linformer_tpu import config, security
from fhe_linformer_tpu.ckks.context import modulus_chain


def test_he_std_table_lookup():
    assert security.max_log_qp(32768, 128) == 881
    assert security.max_log_qp(16384, 256) == 237
    assert security.max_log_qp(32768, 128, "quantum") == 827
    # extrapolation beyond the table scales ~linearly in n
    assert abs(security.max_log_qp(65536, 128) - 2 * 881) < 1e-9


def test_assess_counts_specials():
    cfg = config.get("linformer-128c").ckks
    rep = security.assess(cfg)
    qs, ps, _ = modulus_chain(cfg)
    exact = sum(math.log2(q) for q in qs + ps)
    assert abs(rep.log_qp - exact) < 1e-9
    assert rep.log_qp > rep.log_q          # specials included


def test_hardened_preset_is_128_classical():
    cfg = config.get("linformer-128c").ckks
    rep = security.assess(cfg)
    assert rep.classical_bits >= 128
    assert not rep.sparse_secret
    assert "UniformMod" in security.estimator_input(cfg)


def test_noboot_preset_is_flagged_insecure():
    # the long-chain no-bootstrap preset mirrors the reference's
    # HEStd_NotSet stance and must NOT claim 128-bit
    rep = security.assess(config.get("attention-noboot").ckks)
    assert rep.classical_bits == 0
    assert rep.headroom_bits < 0


def test_sparse_secret_is_flagged():
    cfg = config.get("linformer-boot").ckks
    rep = security.assess(cfg)
    assert rep.sparse_secret
    assert "SparseTernary" in security.estimator_input(cfg)

"""Tests for the comm stack: LCM type fingerprints/codec + native transport."""
import os

import numpy as np
import pytest

from hkdmpc_tpu.comm.lcm_types import (LCMType, load_reference_types,
                                       parse_lcm_file, parse_lcm_text)

REF_LCMTYPES = "/root/reference/lcmtypes"


def test_fingerprint_matches_lcm_gen():
    # oracle: lcm-gen generated fingerprint for mc_towr_data_t
    # (reference: scripts/PyBullet/lcmtypes/mc_towr_data_t.py:89)
    path = "/root/reference/scripts/PyBullet/lcmtypes/mc_towr_data_t.lcm"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    t = parse_lcm_file(path)["mc_towr_data_t"]
    assert t.base_hash == 0x48A6694B91AB877


def test_parse_reference_types():
    if not os.path.isdir(REF_LCMTYPES):
        pytest.skip("reference not available")
    types = load_reference_types(REF_LCMTYPES)
    for name in ("hkd_data_lcmt", "hkd_command_lcmt", "solver_info_lcmt",
                 "opt_sol_lcmt"):
        assert name in types


def test_encode_decode_roundtrip():
    types = load_reference_types(REF_LCMTYPES)
    cmd = types["hkd_command_lcmt"]
    rng = np.random.default_rng(0)
    msg = {
        "N_mpcsteps": 8,
        "mpc_times": rng.random(10),
        "hkd_controls": rng.random((10, 24)).astype(np.float32),
        "des_body_state": rng.random((10, 12)).astype(np.float32),
        "contacts": rng.integers(0, 2, (10, 4)),
        "statusTimes": rng.random((10, 4)),
        "foot_placement": rng.random(12).astype(np.float32),
        "feedback": rng.random((10, 12, 12)).astype(np.float32),
        "solve_time": np.float32(1.5),
    }
    buf = cmd.encode(msg)
    out = cmd.decode(buf)
    assert out["N_mpcsteps"] == 8
    np.testing.assert_allclose(out["hkd_controls"],
                               msg["hkd_controls"].astype(np.float32))
    np.testing.assert_allclose(out["feedback"],
                               msg["feedback"].astype(np.float32))
    np.testing.assert_allclose(out["statusTimes"], msg["statusTimes"])


def test_variable_length_type():
    t = parse_lcm_text("""
        struct solver_info_lcmt {
            int32_t n_iter;
            float cost[n_iter];
            float dyn_feas[n_iter];
            float eqn_feas[n_iter];
            float ineq_feas[n_iter];
        }""")["solver_info_lcmt"]
    msg = {"n_iter": 3, "cost": [1, 2, 3], "dyn_feas": [4, 5, 6],
           "eqn_feas": [0, 0, 0], "ineq_feas": [-1, -2, -3]}
    out = t.decode(t.encode(msg))
    assert out["n_iter"] == 3
    np.testing.assert_allclose(out["ineq_feas"], [-1, -2, -3])


def test_native_transport_loopback():
    from hkdmpc_tpu.comm.transport import LCMTransport
    try:
        tx = LCMTransport("udpm://239.255.76.67:7667?ttl=0")
    except Exception as e:  # no multicast in sandbox
        pytest.skip(f"multicast unavailable: {e}")
    types = load_reference_types(REF_LCMTYPES)
    data_t = types["hkd_data_lcmt"]
    msg = {
        "reset_mpc": False, "MS": True, "mpctime": 1.25,
        "contact": [1, 0, 0, 1], "p": [0.0, 0.0, 0.25],
        "vWorld": [0.1, 0, 0], "rpy": [0, 0, 0], "omegaBody": [0, 0, 0],
        "qJ": np.tile([0, -0.8, 1.6], 4).astype(np.float32),
        "foot_placements": np.zeros(12, np.float32),
    }
    tx.subscribe("mpc_data")
    tx.publish("mpc_data", data_t.encode(msg))
    got = tx.receive(timeout_ms=2000)
    if got is None:
        pytest.skip("multicast loopback unavailable in sandbox")
    chan, buf = got
    assert chan == "mpc_data"
    out = data_t.decode(buf)
    assert out["MS"] is True
    assert abs(out["mpctime"] - 1.25) < 1e-12
    np.testing.assert_allclose(out["contact"], [1, 0, 0, 1])
    tx.close()


def test_native_transport_fragmented_loopback():
    """A message larger than one datagram rides the LC03 fragment path
    (csrc/hkdcomm.cpp handle_frag): reassembly keyed by (sender, seq) must
    reproduce the payload byte-exactly."""
    from hkdmpc_tpu.comm.transport import LCMTransport
    try:
        tx = LCMTransport("udpm://239.255.76.67:7668?ttl=0")
    except Exception as e:  # no multicast in sandbox
        pytest.skip(f"multicast unavailable: {e}")
    payload = bytes(range(256)) * 120  # ~30 KB -> ~22 fragments
    tx.subscribe("big")
    tx.publish("big", payload)
    got = tx.receive(timeout_ms=3000)
    if got is None:
        pytest.skip("multicast loopback unavailable in sandbox")
    chan, buf = got
    assert chan == "big"
    assert bytes(buf) == payload

    # interleave two fragmented messages on different sequence phases:
    # delivery must keep them intact and ordered
    p2 = b"\xAB" * 20000
    tx.publish("big", payload)
    tx.publish("big", p2)
    a = tx.receive(timeout_ms=3000)
    b = tx.receive(timeout_ms=3000)
    assert a is not None and b is not None
    assert bytes(a[1]) == payload and bytes(b[1]) == p2
    tx.close()

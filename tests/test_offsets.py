"""CFO/STO estimation and compensation against injected impairments —
the reference's fault-injection surface (SURVEY.md §5.3) closed into a
loop: inject (apply_offsets semantics) -> estimate_offsets ->
compensate_offsets -> demodulate."""

import numpy as np
import pytest
import jax

from lora_phy_tpu.models import modem
from lora_phy_tpu.ops.impair import (
    apply_awgn,
    apply_cfo,
    apply_cfo_continuous,
    apply_time_shift,
)
from lora_phy_tpu.utils.params import LoraParams


def _dechirped(p, payload_len=16, seed=0):
    rng = np.random.RandomState(seed)
    payload = rng.randint(0, 256, payload_len).astype(np.uint8)
    syms = modem.encode(payload)
    iq = modem.modulate(syms, p)
    return payload, np.asarray(modem.dechirp(iq, p))


def test_estimate_offsets_clean():
    p = LoraParams(sf=7)
    _, dech = _dechirped(p)
    cfo, to = modem.estimate_offsets(dech[: 2 * p.step], p)
    # clean sync symbols: estimate dominated by the sync bins
    # (sw0=8, sw1=16 at SF7 -> avg 12/128 = 0.094, the reference's own
    # measured value on clean loopback)
    np.testing.assert_allclose(float(cfo), 0.0903, atol=5e-3)
    assert abs(float(to)) < 1.0


# 0.45 bins sits at the argmax half-bin decision boundary, where symbol
# flips are expected (same in the reference); stay inside the pull-in range
@pytest.mark.parametrize("cfo_frac", [-0.3, 0.2])
def test_cfo_estimate_compensate_loop(cfo_frac):
    """The estimator's coarse and fine terms interact (the reference adds
    both, double-counting continuous rotations), so its absolute value is
    not linear in the injection — but closed-loop behaviour must hold:
    estimate -> compensate -> the residual estimate returns to the clean
    baseline within a fraction of a bin, and the payload decodes."""
    p = LoraParams(sf=7)
    payload, dech = _dechirped(p)
    base_cfo, _ = modem.estimate_offsets(dech[: 2 * p.step], p)
    rotated = np.asarray(apply_cfo_continuous(dech, cfo_frac, p.n, p.osr))

    cfo, to = modem.estimate_offsets(rotated[: 2 * p.step], p)
    fixed = np.asarray(modem.compensate_offsets(rotated, p, cfo - base_cfo, to))
    resid, _ = modem.estimate_offsets(fixed[: 2 * p.step], p)
    assert abs(float(resid) - float(base_cfo)) <= abs(float(cfo) - float(base_cfo)) + 0.3 / p.n

    res = modem.demodulate(rotated, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)


def test_compensate_inverts_cfo():
    p = LoraParams(sf=7)
    payload, dech = _dechirped(p)
    impaired = np.asarray(apply_cfo_continuous(dech, 0.3, p.n, p.osr))
    # compensate with the known injected offset
    fixed = np.asarray(modem.compensate_offsets(impaired, p, 0.3, 0.0))
    np.testing.assert_allclose(fixed, dech, atol=1e-4)


def test_compensate_inverts_time_shift():
    p = LoraParams(sf=7)
    payload, dech = _dechirped(p)
    shifted = np.asarray(apply_time_shift(dech, 5))
    fixed = np.asarray(modem.compensate_offsets(shifted, p, 0.0, 5.0))
    # interior samples restored exactly (edges zero-filled)
    np.testing.assert_allclose(fixed[8:-8], dech[8:-8], atol=1e-6)


@pytest.mark.parametrize("shift", [-3, 2, 6])
def test_demod_resilient_to_small_timing_shift(shift):
    """The demodulator's own TO estimate + guarded shift recovers payloads
    under small injected timing offsets (reference apply_offsets range)."""
    p = LoraParams(sf=7)
    payload, dech = _dechirped(p, payload_len=12)
    impaired = np.asarray(apply_time_shift(dech, shift))
    res = modem.demodulate(impaired, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)


def test_demod_resilient_to_fractional_cfo_with_noise():
    p = LoraParams(sf=8)
    payload, dech = _dechirped(p, payload_len=12)
    impaired = np.asarray(apply_cfo_continuous(dech, 0.25, p.n, p.osr))
    impaired = np.asarray(apply_awgn(jax.random.PRNGKey(3), impaired, 15.0))
    res = modem.demodulate(impaired, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)


def test_per_symbol_cfo_wrap_matches_reference_injector():
    """apply_cfo (per-symbol phase wrap, lora_phy_vector_generate.cpp:101-107)
    differs from the continuous injector only at symbol boundaries."""
    p = LoraParams(sf=7)
    _, dech = _dechirped(p, payload_len=4)
    a = np.asarray(apply_cfo(dech, 1.5, p.n, p.osr))
    b = np.asarray(apply_cfo_continuous(dech, 1.5, p.n, p.osr))
    np.testing.assert_allclose(a[: p.step], b[: p.step], atol=1e-5)
    assert not np.allclose(a[p.step: 2 * p.step], b[p.step: 2 * p.step])
